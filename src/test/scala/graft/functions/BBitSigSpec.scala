package graft.functions

import org.apache.spark.sql.functions.{array_distinct, col, sort_array, split}

import graft.SparkFunSuite

/** b-bit MinHash (Li & König): packing layout for both hash families,
  * match counting vs a naive unpacked reference, the unbiased estimator,
  * null propagation, and the SQL path. */
class BBitSigSpec extends SparkFunSuite {

  import spark.implicits._

  /** naive low-b lanes of an xx signature */
  private def lowBits(sig: Seq[Long], b: Int): Seq[Long] =
    sig.map(_ & ((1L << b) - 1L))

  private def naivePack(lanes: Seq[Long], b: Int): Seq[Long] = {
    val lpw = 64 / b
    lanes.grouped(lpw).map { grp =>
      grp.zipWithIndex.map { case (v, i) => v << (i * b) }
        .foldLeft(0L)(_ | _)
    }.toSeq
  }

  test("xx packing: words equal the naive layout; round-trips every lane") {
    val rng = new scala.util.Random(61)
    for (b <- Seq(4, 8, 16, 32); _ <- 0 until 50) {
      val k = (64 / b) * (1 + rng.nextInt(3))
      val sig = Seq.fill(k)(rng.nextLong())
      val df = Seq(Tuple1(sig)).toDF("sig")
      val packed = df.select(bbit_sig(col("sig"), b)).collect()(0)
        .getSeq[Long](0)
      assert(packed == naivePack(lowBits(sig, b), b), s"b=$b sig=$sig")
    }
  }

  test("sha packing parses the low b bits of the digest hex") {
    // digest ending in ...ff2a: low 8 bits = 0x2a, low 16 = 0xff2a
    val h = "0" * 60 + "ff2a"
    val df = Seq(Tuple1(Seq.fill(8)(h))).toDF("sig")
    assert(df.select(bbit_sig(col("sig"), 8)).collect()(0).getSeq[Long](0)
      == naivePack(Seq.fill(8)(0x2aL), 8))
    assert(df.select(bbit_sig(col("sig"), 16)).collect()(0)
      .getSeq[Long](0).take(2) == naivePack(Seq.fill(8)(0xff2aL), 16).take(2))
  }

  test("match count and estimator vs naive over random signatures") {
    val rng = new scala.util.Random(67)
    for (b <- Seq(4, 8, 16); _ <- 0 until 40) {
      val k = (64 / b) * 2
      val sa = Seq.fill(k)(rng.nextLong())
      // force some agreeing lanes
      val sb = sa.zipWithIndex.map { case (v, i) =>
        if (rng.nextBoolean()) v else rng.nextLong()
      }
      val expectM = lowBits(sa, b).zip(lowBits(sb, b)).count(p => p._1 == p._2)
      val c = 1.0 / (1L << b).toDouble
      val expectEst = (expectM.toDouble / k.toDouble - c) / (1.0 - c)
      val row = Seq((sa, sb)).toDF("a", "b")
        .select(bbit_match_count(bbit_sig(col("a"), b), bbit_sig(col("b"), b), b),
          bbit_jaccard_est(bbit_sig(col("a"), b), bbit_sig(col("b"), b), b))
        .collect()(0)
      assert(row.getInt(0) == expectM, s"b=$b")
      assert(row.getDouble(1) == expectEst, s"b=$b")
    }
  }

  test("identical signatures estimate exactly 1.0; null propagates") {
    val df = Seq(
      (Option(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
       Option(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))),
      (None, Option(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)))
    ).toDF("a", "b")
    val rows = df.select(
      bbit_jaccard_est(bbit_sig(col("a"), 8), bbit_sig(col("b"), 8), 8))
      .collect()
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).isNullAt(0))
  }

  test("SQL path and the end-to-end sig pipeline agree with the Column path") {
    graft.functions.registerAll(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over a lazy dog"),
      (3L, "completely different text with no overlap at all")
    ).toDF("id", "text")
    docs.createOrReplaceTempView("bbit_docs")
    val toks = sort_array(array_distinct(split(col("text"), "\\s+")))
    val viaColumn = docs.select(col("id"),
      bbit_sig(minhash_sig(toks, 16, "sha256"), 8).as("pk"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaSql = spark.sql(
      """SELECT id, bbit_sig(minhash_sig(
        |  sort_array(array_distinct(split(text, '\\s+'))), 16, 'sha256'), 8)
        |FROM bbit_docs""".stripMargin)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaColumn == viaSql)
    // near-dup docs 1-2 estimate far above the disjoint pair 1-3
    val est = (a: Long, b: Long) => {
      val pa = viaColumn(a)
      val pb = viaColumn(b)
      Seq((pa, pb)).toDF("a", "b")
        .select(bbit_jaccard_est(col("a"), col("b"), 8))
        .collect()(0).getDouble(0)
    }
    assert(est(1L, 2L) > est(1L, 3L))
  }

  test("bad b and unpackable lane counts fail loudly") {
    val df = Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("sig")
    intercept[IllegalArgumentException] {
      df.select(bbit_sig(col("sig"), 7))
    }
    val e = intercept[Exception] {
      df.select(bbit_sig(col("sig"), 8)).collect() // 3 lanes, 8 per word
    }
    assert(e.getMessage.contains("divisible") ||
      e.getCause != null && e.getCause.getMessage.contains("divisible"),
      e.getMessage)
  }
}
