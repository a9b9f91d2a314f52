package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Match-weight histogram (exact power-of-2 binning) and candidate-pair
  * provenance across blocking families. */
class ProvenanceHistSpec extends SparkFunSuite {

  test("matchWeightHistogram bins by floor(log2) with exact boundaries") {
    import spark.implicits._
    val lrs = Seq(0.0, 0.05, 0.25, 0.999, 1.0, 1.5, 2.0, 3.99, 4.0, 1e9)
    val scored = lrs.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "lr")
    val got = FellegiSunter.matchWeightHistogram(scored, minExp = -2,
        maxExp = 2)
      .orderBy("bin_exp")
      .select("bin_exp", "n_pairs").as[(Long, Long)].collect().toSeq
    // bins: -3 = below 0.25 (0.0, 0.05); -2 = [0.25, 0.5) (0.25);
    // -1 = [0.5, 1) (0.999); 0 = [1, 2) (1.0, 1.5); 1 = [2, 4) (2.0,
    // 3.99); 2 = >= 4 (4.0, 1e9)
    assert(got == Seq((-3L, 2L), (-2L, 1L), (-1L, 1L), (0L, 2L), (1L, 2L),
      (2L, 2L)))
    // boundary columns: exact powers of two, open tails NULL
    val rows = FellegiSunter.matchWeightHistogram(scored, minExp = -2,
      maxExp = 2).orderBy("bin_exp").collect()
    assert(rows.head.isNullAt(1) && rows.last.isNullAt(2))
    assert(rows(1).getDouble(1) == 0.25 && rows(1).getDouble(2) == 0.5)
  }

  test("matchWeightHistogram emits zero bins and is total over the frame") {
    import spark.implicits._
    val scored = Seq((1L, 1.0)).toDF("id", "lr")
    val h = FellegiSunter.matchWeightHistogram(scored, minExp = -3,
      maxExp = 3)
    assert(h.count() == 8) // -4..3 inclusive
    assert(h.agg(sum("n_pairs")).head().getLong(0) == 1L)
  }

  test("pairProvenance: sorted family sets, per-family cap") {
    import spark.implicits._
    val keys = Seq(
      // family A blocks {1,2} and {3}; family B blocks {1,2,3} (capped
      // out at bucketCap = 2); family C block {2,1}
      ("A", "k1", 1L), ("A", "k1", 2L), ("A", "k2", 3L),
      ("B", "kx", 1L), ("B", "kx", 2L), ("B", "kx", 3L),
      ("C", "kz", 2L), ("C", "kz", 1L))
      .toDF("family", "key", "url")
    val got = Linkage.pairProvenance(keys, bucketCap = 2)
      .orderBy("url_a", "url_b")
      .select("url_a", "url_b", "families", "n_keys")
      .as[(Long, Long, String, Long)].collect().toSeq
    // B's block exceeds the cap -> contributes nothing; (1,2) found by A
    // and C (2 blocks), sorted "A,C"
    assert(got == Seq((1L, 2L, "A,C", 2L)))
  }

  test("pairProvenance counts multi-key co-occurrence within one family") {
    import spark.implicits._
    val keys = Seq(
      ("A", "k1", 1L), ("A", "k1", 2L),
      ("A", "k2", 1L), ("A", "k2", 2L))
      .toDF("family", "key", "url")
    val got = Linkage.pairProvenance(keys, bucketCap = 10)
      .select("families", "n_keys").as[(String, Long)].collect().toSeq
    assert(got == Seq(("A", 2L)))
  }
}
