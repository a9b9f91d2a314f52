package graft.strsim

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Specs for the round-5 kernel additions: OSA (restricted
  * Damerau-Levenshtein) and the token-set extras (overlap, Tversky,
  * bag-cosine). Every kernel is checked three ways: against a naive
  * reference implementation written independently here, on pinned hand
  * vectors, and through the Column/SQL expression paths.
  */
class OsaTokenSetSpec extends SparkFunSuite {

  // ---------------------------------------------------------------- OSA

  /** Naive untrimmed full-matrix OSA recurrence over code points — the
    * textbook definition, no affix trim, no rolling rows. */
  private def osaRef(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val n = x.length
    val m = y.length
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 0 to n) d(i)(0) = i
    for (j <- 0 to m) d(0)(j) = j
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (x(i - 1) == y(j - 1)) 0 else 1
      var best = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && x(i - 1) == y(j - 2) && x(i - 2) == y(j - 1))
        best = math.min(best, d(i - 2)(j - 2) + 1)
      d(i)(j) = best
    }
    d(n)(m)
  }

  private def osaSimRef(a: String, b: String): Double = {
    if (a == b) 1.0
    else if (a.isEmpty || b.isEmpty) 0.0
    else {
      val maxLen = math.max(a.codePointCount(0, a.length), b.codePointCount(0, b.length))
      1.0 - osaRef(a, b).toDouble / maxLen.toDouble
    }
  }

  test("osa: exhaustive over all |sigma|=3 strings up to length 5 (affix-trim safety)") {
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
    val all = strings(5) // 1 + 3 + 9 + 27 + 81 + 243 = 364
    // all-pairs would be 132k; stride the left side to keep the suite fast
    // while still covering every right string against 1-in-3 lefts
    for (a <- all.zipWithIndex.collect { case (s, i) if i % 3 == 0 => s }; b <- all) {
      assert(StrSimKernels.osa(a, b) == osaSimRef(a, b), s"a='$a' b='$b'")
    }
  }

  test("osa: random Unicode incl. supplementary plane vs naive recurrence") {
    val rng = new scala.util.Random(7)
    val cps = "abcdexyz中é🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(cps(rng.nextInt(cps.length))))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(rng.nextInt(14))
      val b = randStr(rng.nextInt(14))
      assert(StrSimKernels.osa(a, b) == osaSimRef(a, b), s"a='$a' b='$b'")
    }
  }

  test("osa: pinned vectors — restriction vs unrestricted DL, classic swaps") {
    // the canonical restriction witness: OSA(CA, ABC) = 3 but DL = 2
    assert(StrSimKernels.osa("CA", "ABC") == 0.0) // 1 - 3/3
    assert(StrSimKernels.damerauLevenshtein("CA", "ABC") == 1.0 - 2.0 / 3.0)
    // adjacent swap costs 1 (Levenshtein would pay 2)
    assert(StrSimKernels.osa("abcd", "abdc") == 0.75)
    assert(StrSimKernels.levenshtein("abcd", "abdc") == 0.5)
    // OSA never beats unrestricted DL, never loses to Levenshtein
    val rng = new scala.util.Random(11)
    def randStr(n: Int): String = (0 until n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    for (_ <- 0 until 2000) {
      val a = randStr(rng.nextInt(9))
      val b = randStr(rng.nextInt(9))
      val osa = StrSimKernels.osa(a, b)
      assert(osa >= StrSimKernels.levenshtein(a, b) - 1e-12, s"a='$a' b='$b' vs lev")
      assert(osa <= StrSimKernels.damerauLevenshtein(a, b) + 1e-12, s"a='$a' b='$b' vs dl")
    }
  }

  // --------------------------------------------------------- token-set extras

  /** Naive bag intersection via sorted code-point multiset merge. */
  private def bags(a: String, b: String): (Map[Int, Int], Map[Int, Int]) = {
    def bag(s: String): Map[Int, Int] =
      s.codePoints().toArray.groupBy(identity).map { case (c, r) => c -> r.length }
    (bag(a), bag(b))
  }

  private def interSize(a: String, b: String): Int = {
    val (ba, bb) = bags(a, b)
    ba.map { case (c, n) => math.min(n, bb.getOrElse(c, 0)) }.sum
  }

  test("overlap: naive equality, containment, edges") {
    val rng = new scala.util.Random(3)
    val cps = "aabbccdz中🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(cps(rng.nextInt(cps.length))))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(1 + rng.nextInt(10))
      val b = randStr(1 + rng.nextInt(10))
      val expected =
        if (a == b) 1.0
        else interSize(a, b).toDouble /
          math.min(a.codePointCount(0, a.length), b.codePointCount(0, b.length)).toDouble
      assert(StrSimKernels.overlap(a, b) == expected, s"a='$a' b='$b'")
    }
    assert(StrSimKernels.overlap("ibm", "ibm corp international") == 1.0) // sub-bag
    assert(StrSimKernels.overlap("", "") == 1.0)
    assert(StrSimKernels.overlap("", "x") == 0.0)
  }

  test("tversky: reduces to jaccard at (1,1) and dice at (0.5,0.5); asymmetry") {
    val rng = new scala.util.Random(5)
    def randStr(n: Int): String = (0 until n).map(_ => ('a' + rng.nextInt(5)).toChar).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(1 + rng.nextInt(12))
      val b = randStr(1 + rng.nextInt(12))
      assert(math.abs(StrSimKernels.tversky(a, b, 1.0, 1.0) -
        StrSimKernels.jaccard(a, b)) < 1e-15, s"jaccard a='$a' b='$b'")
      assert(math.abs(StrSimKernels.tversky(a, b, 0.5, 0.5) -
        StrSimKernels.sorensenDice(a, b)) < 1e-15, s"dice a='$a' b='$b'")
      // alpha=1, beta=0: containment of a in b (denominator ignores b-only)
      val inter = interSize(a, b)
      val n = a.codePointCount(0, a.length)
      val expected = if (a == b) 1.0 else inter.toDouble / n.toDouble
      assert(math.abs(StrSimKernels.tversky(a, b, 1.0, 0.0) - expected) < 1e-15)
    }
    // asymmetric weights: swapping sides swaps alpha/beta roles
    assert(StrSimKernels.tversky("aab", "abb", 0.25, 0.75) ==
      StrSimKernels.tversky("abb", "aab", 0.75, 0.25))
  }

  test("cosineBag: naive count-vector cosine; length-ratio invariance") {
    val rng = new scala.util.Random(9)
    val cps = "aabbcxyz中é".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(cps(rng.nextInt(cps.length))))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(1 + rng.nextInt(12))
      val b = randStr(1 + rng.nextInt(12))
      val (ba, bb) = bags(a, b)
      val dot = ba.map { case (c, n) => n.toLong * bb.getOrElse(c, 0).toLong }.sum
      val na2 = ba.values.map(n => n.toLong * n.toLong).sum
      val nb2 = bb.values.map(n => n.toLong * n.toLong).sum
      val expected =
        if (a == b) 1.0
        else math.min(1.0,
          dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)))
      assert(StrSimKernels.cosineBag(a, b) == expected, s"a='$a' b='$b'")
    }
    // doubling the string doubles every count: cosine is exactly 1
    assert(StrSimKernels.cosineBag("abca", "abcaabca") == 1.0)
    assert(StrSimKernels.cosineBag("", "") == 1.0)
    assert(StrSimKernels.cosineBag("", "x") == 0.0)
  }

  // --------------------------------------------------- expression / SQL paths

  test("column and SQL paths agree with the kernels (incl. nulls)") {
    import spark.implicits._
    val df = Seq(("phillips", "philips"), ("CA", "ABC"), ("abcd", "abdc"),
      ("", ""), ("", "xyz"), (null, "x")).toDF("a", "b")
    df.createOrReplaceTempView("r5_pairs")
    val viaCol = df.select(
        graft.functions.osa_sim(col("a"), col("b")).as("o"),
        graft.functions.overlap_sim(col("a"), col("b")).as("ov"),
        graft.functions.tversky_sim(col("a"), col("b"), 0.25, 0.75).as("tv"),
        graft.functions.cosine_bag_sim(col("a"), col("b")).as("cb"))
      .collect()
    val viaSql = spark.sql(
      """SELECT osa_sim(a, b) AS o, overlap_sim(a, b) AS ov,
        |       tversky_sim(a, b, 0.25, 0.75) AS tv, cosine_bag_sim(a, b) AS cb
        |FROM r5_pairs""".stripMargin).collect()
    val expected = Seq(("phillips", "philips"), ("CA", "ABC"), ("abcd", "abdc"),
      ("", ""), ("", "xyz"), (null, "x")).map {
      case (null, _) => Row(null, null, null, null)
      case (a, b) => Row(StrSimKernels.osa(a, b), StrSimKernels.overlap(a, b),
        StrSimKernels.tversky(a, b, 0.25, 0.75), StrSimKernels.cosineBag(a, b))
    }
    assert(viaCol.toSeq == expected)
    assert(viaSql.toSeq == expected)
  }

  test("tversky_sim SQL arg validation: non-literal alpha raises a clear error") {
    import spark.implicits._
    Seq(("a", "b", 0.5)).toDF("a", "b", "w").createOrReplaceTempView("tv_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT tversky_sim(a, b, w, 0.5) FROM tv_bad").collect()
    }
    assert(e.getMessage.contains("NON_FOLDABLE_ARGUMENT") ||
      e.getMessage.toLowerCase.contains("literal"))
  }
}
