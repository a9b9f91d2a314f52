package graft.operators

import graft.SparkFunSuite

class TfidfCosineSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b c"), (2L, "a b c"), (3L, "c d e e"), (4L, "a a a b"), (5L, "z"),
    (6L, "   ")).toDF("doc_id", "text")

  /** Independent reference with the operator's pinned semantics. */
  private def ref(corpus: Seq[(Long, String)], a: Long, b: Long): Double = {
    val n = corpus.size
    val tf = corpus.flatMap { case (i, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(w => (i, w))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size).toMap
    def vec(i: Long) = tf.keys.filter(_._1 == i).map(_._2).toSeq.sorted
      .map(w => (w, (tf((i, w)) * (n + 1)).toDouble / (df(w) + 1).toDouble))
    def norm(v: Seq[(String, Double)]) =
      math.sqrt(v.foldLeft(0.0)((acc, s) => acc + s._2 * s._2))
    val (va, vb) = (vec(a), vec(b))
    val mb = vb.toMap
    val dot = va.foldLeft(0.0)((acc, s) => acc + mb.getOrElse(s._1, 0.0) * s._2)
    dot / (norm(va) * norm(vb))
  }

  test("matches the independent reference bit-for-bit on all pairs") {
    val corpus = Seq((1L, "a b b c"), (2L, "a b c"), (3L, "c d e e"),
      (4L, "a a a b"), (5L, "z"), (6L, "   "))
    val pairs = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
      .toDF("ia", "ib")
    val got = Linkage.tfidfCosinePairs(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (a <- 1L to 5L; b <- (a + 1) to 5L) {
      assert(got((a, b)) == ref(corpus, a, b), s"pair ($a,$b)")
    }
    // disjoint docs → exactly 0.0; identical-distribution docs → high
    assert(got((3L, 5L)) == 0.0)
    assert(got((1L, 2L)) > 0.9)
  }

  test("pairs touching token-less docs are dropped, not NaN") {
    val pairs = Seq((1L, 6L), (6L, 5L), (1L, 2L)).toDF("ia", "ib")
    val got = Linkage.tfidfCosinePairs(docs, "doc_id", "text", pairs).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
    assert(!got.head.getDouble(2).isNaN)
  }

  test("score is partitioning-independent") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("ia", "ib")
    val one = Linkage.tfidfCosinePairs(docs.repartition(1), "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val many = Linkage.tfidfCosinePairs(docs.repartition(7), "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(one == many)
  }

  test("idf dominance: rare-token agreement outscores stopword agreement") {
    // docs sharing a RARE token score above docs sharing only the token
    // every document contains, even with equal token counts
    val corpus = ((1L to 20L).map(i => (i, s"common filler$i")) ++
      Seq((101L, "common rare"), (102L, "common rare"),
          (103L, "common alpha"), (104L, "common beta"))).toDF("doc_id", "text")
    val pairs = Seq((101L, 102L), (103L, 104L)).toDF("ia", "ib")
    val got = Linkage.tfidfCosinePairs(corpus, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((101L, 102L)) > 0.9)            // rare "rare" dominates
    assert(got((103L, 104L)) < got((101L, 102L))) // only "common" shared
  }
}
