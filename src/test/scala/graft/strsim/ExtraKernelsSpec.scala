package graft.strsim

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Specs for the round-4 kernel additions: banded capped Levenshtein
  * (pre-filter tier) and Monge-Elkan/Jaro-Winkler (hybrid token scorer). */
class ExtraKernelsSpec extends SparkFunSuite {

  // ---------------------------------------------------------- levenshteinCapped

  /** Reference distance recovered from the normalized kernel (exact: the
    * division by maxLen is inverted by multiplying back and rounding —
    * both are ≤ 2^31 so the double round-trip is exact). */
  private def fullDist(a: String, b: String): Int = {
    val maxLen = math.max(a.codePointCount(0, a.length), b.codePointCount(0, b.length))
    if (maxLen == 0) 0
    else math.round((1.0 - StrSimKernels.levenshtein(a, b)) * maxLen).toInt
  }

  test("levenshteinCapped equals the full distance when <= k, else k+1") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcdexyz中é🙂"
    val cps = alphabet.codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(cps(rng.nextInt(cps.length))))).mkString
    for (_ <- 0 until 2000) {
      val a = randStr(rng.nextInt(12))
      val b = randStr(rng.nextInt(12))
      for (k <- 0 to 5) {
        val full = fullDist(a, b)
        val capped = StrSimKernels.levenshteinCapped(a, b, k)
        val expected = if (full <= k) full else k + 1
        assert(capped == expected, s"a='$a' b='$b' k=$k full=$full capped=$capped")
      }
    }
  }

  test("levenshteinCapped edges: equality, empties, length gap, k=0") {
    assert(StrSimKernels.levenshteinCapped("", "", 0) == 0)
    assert(StrSimKernels.levenshteinCapped("abc", "abc", 0) == 0)
    assert(StrSimKernels.levenshteinCapped("abc", "abd", 0) == 1) // >k → k+1
    assert(StrSimKernels.levenshteinCapped("", "abc", 2) == 3)    // |a|-|b|>k
    assert(StrSimKernels.levenshteinCapped("", "ab", 2) == 2)     // exact
    assert(StrSimKernels.levenshteinCapped("kitten", "sitting", 3) == 3)
    assert(StrSimKernels.levenshteinCapped("kitten", "sitting", 2) == 3) // >2 → 3
    // long shared affixes collapse the band
    val base = "x" * 5000
    assert(StrSimKernels.levenshteinCapped(base + "a", base + "b", 2) == 1)
  }

  test("levenshtein_capped / levenshtein_within codegen and SQL paths agree") {
    import spark.implicits._
    val df = Seq(("phillips", "philips"), ("kitten", "sitting"), ("", ""),
      ("abc", "xyzabc"), (null, "x")).toDF("a", "b")
    val viaCol = df.select(
        graft.functions.levenshtein_capped(col("a"), col("b"), 2).as("d"),
        graft.functions.levenshtein_within(col("a"), col("b"), 2).as("w"))
      .collect()
    df.createOrReplaceTempView("lc_pairs")
    val viaSql = spark.sql(
      "SELECT levenshtein_capped(a, b, 2) AS d, levenshtein_within(a, b, 2) AS w FROM lc_pairs")
      .collect()
    val expected = Seq(Row(1, true), Row(3, false), Row(0, true), Row(3, false), Row(null, null))
    assert(viaCol.toSeq == expected)
    assert(viaSql.toSeq == expected)
  }

  // ------------------------------------------------------ mongeElkanJaroWinkler

  private def me(a: String, b: String): Double = StrSimKernels.mongeElkanJaroWinkler(a, b)

  test("monge-elkan: hand vectors and pinned edge rules") {
    // (1.0 + 1.0 + jw(inc, incorporated)) / 3 — jw = 0.75 + 3·0.1·0.25
    val expected = (1.0 + 1.0 + 0.825) / 3.0
    assert(math.abs(me("acme widgets inc", "widgets  acme incorporated") - expected) < 1e-12)
    assert(me("", "") == 1.0)
    assert(me(" \t\n", "\r ") == 1.0)   // whitespace-only → tokenless both
    assert(me("", "acme") == 0.0)
    assert(me("acme", " \t ") == 0.0)
    assert(me("acme", "acme") == 1.0)
    // single tokens degrade to plain Jaro-Winkler
    assert(me("phillips", "philips") == StrSimKernels.jaroWinkler("phillips", "philips"))
    // \x0B is a separator (the shared whitespace class)
    assert(me("acmeinc", "acme inc") == 1.0)
  }

  test("monge-elkan: >16 tokens per side survives scratch-array growth") {
    // Regression: the token-span scratch arrays seed at 16 and grow
    // geometrically; growth must COPY the already-stored spans (a zeroing
    // grow turned tokens 0..15 into empty strings → jw=0 → wrong mean,
    // intermittently per thread since capacity persists).
    val toks = (1 to 40).map(i => s"token$i")
    val a = toks.mkString(" ")
    assert(me(a, a) == 1.0)                       // every token finds itself
    val b = toks.reverse.mkString(" ")
    assert(me(a, b) == 1.0)                       // order-free best-match
    // Reference fold computed WITHOUT scratch reuse: one token perturbed.
    val b2 = (toks.dropRight(1) :+ "tokenXX").mkString(" ")
    val expected = toks.map { t =>
      toks.dropRight(1).:+("tokenXX").map(u => StrSimKernels.jaroWinkler(t, u)).max
    }.foldLeft(0.0)(_ + _) / toks.size
    assert(math.abs(me(a, b2) - expected) < 1e-15)
    // Growth happened on the LEFT scratch above; force right-side growth on
    // the same thread and a fresh-vs-reused capacity comparison.
    assert(me("token7", a) == 1.0)
  }

  test("monge-elkan is asymmetric by design") {
    val ab = me("acme", "acme incorporated")   // 1 token, best match 1.0
    val ba = me("acme incorporated", "acme")   // mean(1.0, jw(incorporated, acme))
    assert(ab == 1.0)
    assert(ba < 1.0)
  }

  test("monge_elkan_jw codegen and SQL paths equal the kernel") {
    import spark.implicits._
    val rows = Seq(
      ("golden lavender spring", "lavender golden sprang"),
      ("a b c", "c a b"),
      ("one", "two three"),
      ("", "x y"))
    val df = rows.toDF("a", "b")
    val got = df.select(graft.functions.monge_elkan_jw(col("a"), col("b")).as("m")).collect()
    df.createOrReplaceTempView("me_pairs")
    val sql = spark.sql("SELECT monge_elkan_jw(a, b) AS m FROM me_pairs").collect()
    rows.zip(got.zip(sql)).foreach { case ((a, b), (g, q)) =>
      val k = me(a, b)
      assert(g.getDouble(0) == k, s"codegen diverges on ($a, $b)")
      assert(q.getDouble(0) == k, s"SQL path diverges on ($a, $b)")
    }
  }

  // --------------------------------------------------- confusionLevDist/Sim

  /** Reference weighted DP, straightforward full-matrix implementation. */
  private def refConfusion(a: String, b: String): Long = {
    val xa = a.codePoints().toArray
    val xb = b.codePoints().toArray
    val n = xa.length; val m = xb.length
    val dp = Array.tabulate(n + 1, m + 1)((i, j) =>
      if (i == 0) 2L * j else if (j == 0) 2L * i else 0L)
    for (i <- 1 to n; j <- 1 to m) {
      dp(i)(j) = math.min(
        dp(i - 1)(j - 1) + StrSimKernels.confusionCost(xa(i - 1), xb(j - 1)),
        math.min(dp(i - 1)(j) + 2L, dp(i)(j - 1) + 2L))
    }
    dp(n)(m)
  }

  test("confusionLevDist: hand vectors — half-cost confusables, 2x plain edits") {
    // pure confusable substitutions cost 1 each
    assert(StrSimKernels.confusionLevDist("O0", "00") == 1L)
    assert(StrSimKernels.confusionLevDist("Il5", "1l5") == 1L)
    assert(StrSimKernels.confusionLevDist("B1ll", "Bill") == 1L)
    // a non-confusable substitution costs 2 (== 2x Levenshtein)
    assert(StrSimKernels.confusionLevDist("cat", "cut") == 2L)
    // indel costs 2
    assert(StrSimKernels.confusionLevDist("cat", "cats") == 2L)
    assert(StrSimKernels.confusionLevDist("", "ab") == 4L)
    assert(StrSimKernels.confusionLevDist("x", "x") == 0L)
    // cheaper to substitute 2 confusables than delete+insert
    assert(StrSimKernels.confusionLevDist("O1", "0I") == 2L)
    // sim normalization: all-confusable bottoms out at 0.5
    assert(StrSimKernels.confusionLevSim("O1S", "0I5") == 0.5)
    assert(StrSimKernels.confusionLevSim("", "") == 1.0)
    assert(StrSimKernels.confusionLevSim("ab", "") == 0.0)
  }

  test("confusionLevDist matches the full-matrix reference on random noise") {
    val rng = new scala.util.Random(7)
    val alphabet = "ABEGIOSTUZabcegilopqsuvz0123456789é中"
    val cps = alphabet.codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(cps(rng.nextInt(cps.length))))).mkString
    for (_ <- 0 until 1500) {
      val a = randStr(rng.nextInt(14))
      val b = randStr(rng.nextInt(14))
      assert(StrSimKernels.confusionLevDist(a, b) == refConfusion(a, b),
        s"a='$a' b='$b'")
    }
  }

  test("confusion_lev codegen and SQL paths equal the kernel") {
    import spark.implicits._
    val rows = Seq(("O0Il", "00I1"), ("Customer#0O1", "Customer#001"),
      ("", "x"), ("same", "same"))
    graft.functions.registerAll(spark)
    rows.toDF("a", "b").createOrReplaceTempView("cl_t")
    rows.foreach { case (a, b) =>
      val kd = StrSimKernels.confusionLevDist(a, b)
      val ks = StrSimKernels.confusionLevSim(a, b)
      val g = Seq((a, b)).toDF("a", "b").select(
        graft.functions.confusion_lev_dist(col("a"), col("b")),
        graft.functions.confusion_lev_sim(col("a"), col("b"))).head()
      assert(g.getLong(0) == kd && g.getDouble(1) == ks)
    }
    val q = spark.sql(
      "SELECT confusion_lev_dist(a, b), confusion_lev_sim(a, b) FROM cl_t")
      .collect()
    rows.zip(q).foreach { case ((a, b), r) =>
      assert(r.getLong(0) == StrSimKernels.confusionLevDist(a, b))
      assert(r.getDouble(1) == StrSimKernels.confusionLevSim(a, b))
    }
  }
}
