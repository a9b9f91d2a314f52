package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Pins [[Linkage.softTfIdfPairs]]: degenerates to exact TF-IDF cosine
  * when every matched token is exact; recovers typo'd tokens cosine
  * misses; the per-token argmax takes the best partner, not the first;
  * pairs with nothing above θ emit no row. */
class SoftTfIdfSpec extends SparkFunSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("id", "text")
  private def pair(a: Long, b: Long) = Seq((a, b)).toDF("ia", "ib")

  private def score(d: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame, theta: Double = 0.85): Map[(Long, Long), Double] =
    Linkage.softTfIdfPairs(d, "id", "text", p, theta)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("all-exact matches reduce to TF-IDF cosine") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta delta",
      3L -> "epsilon zeta", 4L -> "unrelated words here")
    val p = pair(1L, 2L)
    val soft = score(d, p)((1L, 2L))
    val cos = Linkage.tfidfCosinePairs(d, "id", "text", p)
      .collect().head.getDouble(2)
    // identical shared tokens → jw = 1 on every match → soft == cosine
    assert(math.abs(soft - cos) < 1e-12)
  }

  test("typo'd token contributes where cosine sees nothing") {
    val d = docs(1L -> "jonathan smith", 2L -> "jonathon smyth",
      3L -> "filler one", 4L -> "filler two")
    val p = pair(1L, 2L)
    val soft = score(d, p)
    val cos = Linkage.tfidfCosinePairs(d, "id", "text", p)
      .collect().head.getDouble(2)
    assert(cos == 0.0) // no exact shared token
    assert(soft((1L, 2L)) > 0.7) // both tokens match softly with high jw
    assert(soft((1L, 2L)) <= 1.0 + 1e-12)
  }

  test("argmax picks the best partner, not an arbitrary one") {
    // a's token "smith" has two close partners in b: "smyth" (closer)
    // and "smithe"; the contribution must use the higher-jw partner
    val d = docs(1L -> "smith", 2L -> "smith smithee", 3L -> "pad pad2")
    val s = score(d, pair(1L, 2L), theta = 0.8)((1L, 2L))
    // exact partner exists → argmax jw = 1 for the single a-token, so the
    // contribution is v_a("smith") · v_b("smith") · 1 exactly:
    // v_a = 1 (single-token doc); w = tf·(n+1)/(df+1) with n = 3 docs,
    // df(smith) = 2, df(smithee) = 1 → w_s = 4/3, w_e = 2
    val wS = 4.0 / 3.0
    val wE = 2.0
    val expected = wS / math.sqrt(wS * wS + wE * wE)
    assert(math.abs(s - expected) < 1e-9)
  }

  test("no token pair above theta → no output row") {
    val d = docs(1L -> "aaaa", 2L -> "zzzz", 3L -> "pad one")
    assert(score(d, pair(1L, 2L), theta = 0.9).isEmpty)
  }
}
