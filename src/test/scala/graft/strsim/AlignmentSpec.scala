package graft.strsim

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Alignment-family kernels (round 5): LCS, Needleman-Wunsch, and
  * Smith-Waterman similarities — naive full-matrix (UNtrimmed) references,
  * exhaustive affix-trim safety, Unicode randoms, pinned vectors, and
  * codegen/SQL agreement. */
class AlignmentSpec extends SparkFunSuite {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  /** Untrimmed full-matrix LCS, same normalization order as the kernel. */
  private def lcsRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val x = cps(a); val y = cps(b)
    val n = x.length; val m = y.length
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = if (x(i - 1) == y(j - 1)) d(i - 1)(j - 1) + 1
        else math.max(d(i - 1)(j), d(i)(j - 1))
    2.0 * d(n)(m).toDouble / (n + m).toDouble
  }

  /** Untrimmed full-matrix NW (+1/−1/−1), kernel's normalization order. */
  private def nwRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val x = cps(a); val y = cps(b)
    val n = x.length; val m = y.length
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 0 to n) d(i)(0) = -i
    for (j <- 0 to m) d(0)(j) = -j
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = math.max(
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 1 else -1),
        math.max(d(i - 1)(j) - 1, d(i)(j - 1) - 1))
    0.5 + d(n)(m).toDouble / (2.0 * math.max(n, m).toDouble)
  }

  /** Full-matrix SW (+1/−1/−1, floored), kernel's normalization order. */
  private def swRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val x = cps(a); val y = cps(b)
    val n = x.length; val m = y.length
    val d = Array.ofDim[Int](n + 1, m + 1)
    var best = 0
    for (i <- 1 to n; j <- 1 to m) {
      val h = math.max(0, math.max(
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 1 else -1),
        math.max(d(i - 1)(j) - 1, d(i)(j - 1) - 1)))
      d(i)(j) = h
      if (h > best) best = h
    }
    best.toDouble / math.min(n, m).toDouble
  }

  test("lcs/nw: exhaustive over |sigma|=3 strings up to length 5 (affix-trim safety)") {
    val sigma = "abc"
    def strings(maxLen: Int): Seq[String] = {
      var acc = Vector("")
      var frontier = Vector("")
      for (_ <- 1 to maxLen) {
        frontier = frontier.flatMap(s => sigma.map(c => s + c))
        acc ++= frontier
      }
      acc
    }
    val all = strings(5)
    for (a <- all.zipWithIndex.collect { case (s, i) if i % 3 == 0 => s }; b <- all) {
      assert(StrSimKernels.lcs(a, b) == lcsRef(a, b), s"lcs a='$a' b='$b'")
      assert(StrSimKernels.needlemanWunsch(a, b) == nwRef(a, b), s"nw a='$a' b='$b'")
    }
  }

  test("all three: random Unicode incl. supplementary plane vs naive recurrence") {
    val rng = new scala.util.Random(13)
    val pool = "abcdexyz中é🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(pool(rng.nextInt(pool.length))))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(rng.nextInt(14))
      val b = randStr(rng.nextInt(14))
      assert(StrSimKernels.lcs(a, b) == lcsRef(a, b), s"lcs a='$a' b='$b'")
      assert(StrSimKernels.needlemanWunsch(a, b) == nwRef(a, b), s"nw a='$a' b='$b'")
      assert(StrSimKernels.smithWaterman(a, b) == swRef(a, b), s"sw a='$a' b='$b'")
    }
  }

  test("pinned vectors and the family's characteristic orderings") {
    // classic LCS: |LCS(GAC, AGCAT)| = 2 → 2·2/8
    assert(StrSimKernels.lcs("GAC", "AGCAT") == 0.5)
    // NW: aab/aba — best global alignment matches both a's through one gap
    // each: S = 0 → 0.5 (the midpoint; as many rewards as penalties)
    assert(StrSimKernels.needlemanWunsch("aab", "aba") == 0.5)
    // SW substring containment → 1.0, where global scorers punish length
    assert(StrSimKernels.smithWaterman("bcd", "abcdefgh") == 1.0)
    assert(StrSimKernels.lcs("bcd", "abcdefgh") < 1.0)
    assert(StrSimKernels.needlemanWunsch("bcd", "abcdefgh") < 1.0)
    // empty/equal contract
    for (k <- Seq[(String, String) => Double](StrSimKernels.lcs,
        StrSimKernels.needlemanWunsch, StrSimKernels.smithWaterman)) {
      assert(k("", "") == 1.0)
      assert(k("x", "") == 0.0)
      assert(k("", "x") == 0.0)
      assert(k("same", "same") == 1.0)
    }
    // interleaved insertions: LCS forgives what edit distance charges
    assert(StrSimKernels.lcs("john smith", "john q smith") >
      StrSimKernels.levenshtein("john smith", "john q smith"))
  }

  test("lcs/nw/sw codegen and SQL paths agree with the kernels (incl. nulls)") {
    import spark.implicits._
    val df = Seq(("phillips", "philips"), ("GAC", "AGCAT"), ("", ""),
      ("bcd", "abcdefgh"), (null, "x"), ("x", null)).toDF("a", "b")
    val viaCol = df.select(
        graft.functions.lcs_sim(col("a"), col("b")).as("l"),
        graft.functions.needleman_wunsch_sim(col("a"), col("b")).as("n"),
        graft.functions.smith_waterman_sim(col("a"), col("b")).as("s"))
      .collect()
    df.createOrReplaceTempView("al_pairs")
    val viaSql = spark.sql(
      """SELECT lcs_sim(a, b) AS l, needleman_wunsch_sim(a, b) AS n,
        |       smith_waterman_sim(a, b) AS s FROM al_pairs""".stripMargin)
      .collect()
    for ((rows, label) <- Seq((viaCol, "col"), (viaSql, "sql"))) {
      for ((r, i) <- rows.zipWithIndex) {
        val (a, b) = (df.collect()(i).getString(0), df.collect()(i).getString(1))
        if (a == null || b == null)
          assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2), s"$label row $i")
        else {
          assert(r.getDouble(0) == lcsRef(a, b), s"$label lcs row $i")
          assert(r.getDouble(1) == nwRef(a, b), s"$label nw row $i")
          assert(r.getDouble(2) == swRef(a, b), s"$label sw row $i")
        }
      }
    }
  }
}
