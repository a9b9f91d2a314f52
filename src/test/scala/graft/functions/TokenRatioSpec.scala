package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite
import graft.functions.{token_set_ratio, token_sort_ratio}
import graft.strsim.StrSimKernels

/** Token-sort / token-set ratios (the fuzzywuzzy pair) — compositions of
  * stock expressions, checked against a naive Scala re-derivation, pinned
  * vectors, the null/empty contract, and the SQL registration path. */
class TokenRatioSpec extends SparkFunSuite {

  import spark.implicits._

  private def naiveSort(s: String): String =
    s.trim.split("\\s+").sorted.mkString(" ")

  private def naiveSortRatio(a: String, b: String): Double =
    StrSimKernels.levenshtein(naiveSort(a), naiveSort(b))

  private def naiveSetRatio(a: String, b: String): Double = {
    val ta = a.trim.split("\\s+").distinct.sorted
    val tb = b.trim.split("\\s+").distinct.sorted
    val s0 = ta.intersect(tb).mkString(" ")
    val s1 = (s0 + " " + ta.diff(tb).mkString(" ")).trim
    val s2 = (s0 + " " + tb.diff(ta).mkString(" ")).trim
    Seq(StrSimKernels.levenshtein(s0, s1), StrSimKernels.levenshtein(s0, s2),
      StrSimKernels.levenshtein(s1, s2)).max
  }

  private def run(pairs: Seq[(String, String)]): Seq[(Double, Double)] =
    pairs.toDF("a", "b")
      .select(token_sort_ratio(col("a"), col("b")),
        token_set_ratio(col("a"), col("b")))
      .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))

  test("matches the naive re-derivation on mixed token shapes") {
    val pairs = Seq(
      ("john smith", "smith john"),
      ("john smith", "john smith"),
      ("new york mets", "the new york mets"),
      ("a b c", "c b a d"),
      ("alpha beta beta", "beta alpha"), // duplicate token on one side
      ("x", "y"),
      ("spring green lace", "green spring lace peru"))
    val got = run(pairs)
    pairs.zip(got).foreach { case ((a, b), (tsr, tstr)) =>
      assert(tsr == naiveSortRatio(a, b), s"sort($a,$b)")
      assert(tstr == naiveSetRatio(a, b), s"set($a,$b)")
    }
  }

  test("pinned semantics") {
    // word order invariant: sort ratio = 1.0
    assert(run(Seq(("john smith", "smith   john"))).head == ((1.0, 1.0)))
    // one side contained in the other: set ratio = 1.0 (s0 == s1)
    val (tsr, tstr) = run(Seq(("york new", "the new york mets"))).head
    assert(tstr == 1.0 && tsr < 1.0)
    // disjoint token sets: s0 empty → two legs 0, third = plain lev sim
    val (_, d) = run(Seq(("aa bb", "cc dd"))).head
    assert(d == StrSimKernels.levenshtein("aa bb", "cc dd"))
  }

  test("null and empty contract") {
    val df = Seq[(String, String)](("", ""), (null, "x"), ("x", null))
      .toDF("a", "b")
      .select(token_sort_ratio(col("a"), col("b")).as("tsr"),
        token_set_ratio(col("a"), col("b")).as("tstr"))
      .collect()
    assert(df(0).getDouble(0) == 1.0 && df(0).getDouble(1) == 1.0)
    assert(df(1).isNullAt(0) && df(1).isNullAt(1))
    assert(df(2).isNullAt(0) && df(2).isNullAt(1))
  }

  test("SQL registration path matches the Column path") {
    val df = Seq(("new york mets", "the mets of new york")).toDF("a", "b")
    df.createOrReplaceTempView("trpairs")
    val sql = spark.sql(
      "SELECT token_sort_ratio(a, b), token_set_ratio(a, b) FROM trpairs")
      .head()
    val colPath = df.select(token_sort_ratio(col("a"), col("b")),
      token_set_ratio(col("a"), col("b"))).head()
    assert(sql.getDouble(0) == colPath.getDouble(0))
    assert(sql.getDouble(1) == colPath.getDouble(1))
  }
}
