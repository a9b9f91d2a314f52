package graft.strsim

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Q-gram profile similarity and the token-level set scorers (round 5):
  * naive re-derivations, the Ukkonen lower-bound property, pinned edge
  * semantics, and codegen/SQL agreement. */
class QgramTokenSpec extends SparkFunSuite {

  /** Naive q-gram profile similarity over code points via hash maps. */
  private def qgramRef(a: String, b: String, q: Int): Double = {
    if (a == b) return 1.0
    def grams(s: String): Map[Seq[Int], Int] = {
      val cp = s.codePoints().toArray.toSeq
      if (cp.length < q) Map.empty
      else cp.sliding(q).toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    }
    val ga = grams(a); val gb = grams(b)
    val na = ga.values.sum; val nb = gb.values.sum
    if (na == 0 || nb == 0) return 0.0
    val d = (ga.keySet ++ gb.keySet).toSeq
      .map(g => math.abs(ga.getOrElse(g, 0) - gb.getOrElse(g, 0))).sum
    1.0 - d.toDouble / (na + nb).toDouble
  }

  test("qgram: random Unicode vs naive profile for q = 1, 2, 3") {
    val rng = new scala.util.Random(17)
    val pool = "abcdexyz中é🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(pool(rng.nextInt(pool.length))))).mkString
    for (_ <- 0 until 2000; q <- 1 to 3) {
      val a = randStr(rng.nextInt(14))
      val b = randStr(rng.nextInt(14))
      assert(StrSimKernels.qgram(a, b, q) == qgramRef(a, b, q),
        s"q=$q a='$a' b='$b'")
    }
  }

  test("qgram: Ukkonen lower bound — lev distance >= profile distance / (2q)") {
    val rng = new scala.util.Random(19)
    def randStr(n: Int): String =
      (0 until n).map(_ => ('a' + rng.nextInt(5)).toChar).mkString
    for (_ <- 0 until 2000; q <- 2 to 3) {
      val a = randStr(2 + rng.nextInt(12))
      val b = randStr(2 + rng.nextInt(12))
      val maxLen = math.max(a.length, b.length)
      val lev = math.round((1.0 - StrSimKernels.levenshtein(a, b)) * maxLen)
      val na = math.max(a.length - q + 1, 0)
      val nb = math.max(b.length - q + 1, 0)
      if (na > 0 && nb > 0) {
        val d = (1.0 - StrSimKernels.qgram(a, b, q)) * (na + nb)
        assert(lev + 1e-9 >= d / (2.0 * q), s"q=$q a='$a' b='$b' lev=$lev d=$d")
      }
    }
  }

  test("qgram: pinned edges and q validation") {
    assert(StrSimKernels.qgram("", "", 2) == 1.0)      // byte-equal
    assert(StrSimKernels.qgram("a", "a", 2) == 1.0)
    assert(StrSimKernels.qgram("a", "b", 2) == 0.0)    // both gramless, unequal
    assert(StrSimKernels.qgram("a", "abc", 2) == 0.0)  // one side gramless
    assert(StrSimKernels.qgram("abcd", "bcda", 2) ==
      1.0 - 2.0 / 6.0) // grams differ only in ab vs da
    intercept[IllegalArgumentException](StrSimKernels.qgram("x", "y", 4))
    intercept[IllegalArgumentException](StrSimKernels.qgram("x", "y", 0))
  }

  private def tokJacRef(a: String, b: String): Double = {
    val ta = a.trim.split("\\s+", -1).distinct.toSet
    val tb = b.trim.split("\\s+", -1).distinct.toSet
    ta.intersect(tb).size.toDouble / ta.union(tb).size.toDouble
  }

  private def tokOvRef(a: String, b: String): Double = {
    val ta = a.trim.split("\\s+", -1).distinct.toSet
    val tb = b.trim.split("\\s+", -1).distinct.toSet
    ta.intersect(tb).size.toDouble / math.min(ta.size, tb.size).toDouble
  }

  test("token jaccard/overlap: naive re-derivation + empty/null contract") {
    import spark.implicits._
    val pairs = Seq(
      ("john smith", "smith john jr"),
      ("new york", "york new new"),
      ("a b c d", "c d e"),
      ("one", "two"),
      ("", ""), ("", "xyz"), ("  \t ", " "))
    val rows = pairs.toDF("a", "b").select(
        graft.functions.token_jaccard_sim(col("a"), col("b")).as("j"),
        graft.functions.token_overlap_sim(col("a"), col("b")).as("o"))
      .collect()
    for (((a, b), r) <- pairs.zip(rows)) {
      assert(r.getDouble(0) == tokJacRef(a, b), s"jac($a,$b)")
      assert(r.getDouble(1) == tokOvRef(a, b), s"ov($a,$b)")
    }
    // the [""]-token artifact gives the pinned empty contract for free
    assert(rows(4).getDouble(0) == 1.0 && rows(4).getDouble(1) == 1.0)
    assert(rows(5).getDouble(0) == 0.0 && rows(5).getDouble(1) == 0.0)
    assert(rows(6).getDouble(0) == 1.0) // whitespace-only ≡ empty
    // containment → overlap 1.0 while jaccard < 1.0
    val c = Seq(("york new", "the new york mets")).toDF("a", "b").select(
      graft.functions.token_overlap_sim(col("a"), col("b")),
      graft.functions.token_jaccard_sim(col("a"), col("b"))).head()
    assert(c.getDouble(0) == 1.0 && c.getDouble(1) == 0.5)
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b").select(
      graft.functions.token_jaccard_sim(col("a"), col("b")),
      graft.functions.token_overlap_sim(col("a"), col("b"))).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("qgram/token codegen and SQL paths agree") {
    import spark.implicits._
    val df = Seq(("phillips", "philips"), ("abcd", "bcda"),
      ("john smith", "smith john")).toDF("a", "b")
    df.createOrReplaceTempView("qt_pairs")
    val viaCol = df.select(
        graft.functions.qgram_sim(col("a"), col("b"), 2).as("q"),
        graft.functions.token_jaccard_sim(col("a"), col("b")).as("j"),
        graft.functions.token_overlap_sim(col("a"), col("b")).as("o"))
      .collect()
    val viaSql = spark.sql(
      """SELECT qgram_sim(a, b, 2) AS q, token_jaccard_sim(a, b) AS j,
        |       token_overlap_sim(a, b) AS o FROM qt_pairs""".stripMargin)
      .collect()
    assert(viaCol.toSeq == viaSql.toSeq)
    for ((r, (a, b)) <- viaCol.zip(Seq(("phillips", "philips"),
        ("abcd", "bcda"), ("john smith", "smith john")))) {
      assert(r.getDouble(0) == qgramRef(a, b, 2))
      assert(r.getDouble(1) == tokJacRef(a, b))
    }
    // non-literal q is a clear analysis error, not an obscure cast failure
    val e = intercept[Exception] {
      spark.sql("SELECT qgram_sim(a, b, length(a)) FROM qt_pairs").collect()
    }
    assert(e.getMessage.contains("qgram_sim"))
  }
}
