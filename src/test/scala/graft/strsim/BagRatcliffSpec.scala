package graft.strsim

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Bag similarity and Ratcliff-Obershelp (gestalt) kernels (round 5):
  * independent naive references (hash-map counting vs the kernel's
  * sort-merge; brute-force block scan + Vector recursion vs the kernel's
  * suffix-DP + worklist), exhaustive small-alphabet cross-checks, Unicode
  * randoms, the pre-filter ordering properties that justify bag_sim's
  * place in the admission stack, pinned difflib vectors, and codegen/SQL
  * agreement. */
class BagRatcliffSpec extends SparkFunSuite {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  /** Naive bag similarity: per-code-point count maps (independent of the
    * kernel's sorted-bag merge). Also re-derives the Bartolini bag
    * DISTANCE max(|a−b|, |b−a|) to pin the Σmin/max collapse. */
  private def bagRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val xa = cps(a); val xb = cps(b)
    val ca = xa.groupBy(identity).map { case (k, v) => k -> v.length }
    val cb = xb.groupBy(identity).map { case (k, v) => k -> v.length }
    val inter = ca.map { case (k, v) => math.min(v, cb.getOrElse(k, 0)) }.sum
    val aOnly = ca.map { case (k, v) => math.max(0, v - cb.getOrElse(k, 0)) }.sum
    val bOnly = cb.map { case (k, v) => math.max(0, v - ca.getOrElse(k, 0)) }.sum
    val maxLen = math.max(xa.length, xb.length)
    // the collapse the kernel relies on: bagdist = max(n,m) − Σmin
    assert(math.max(aOnly, bOnly) == maxLen - inter)
    inter.toDouble / maxLen.toDouble
  }

  /** Naive Ratcliff-Obershelp: brute-force longest-match scan (earliest
    * in a, then in b, among maximal) + Vector recursion — structurally
    * unlike the kernel's one-row suffix DP + explicit worklist. */
  private def roRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    def longestMatch(x: Vector[Int], y: Vector[Int]): (Int, Int, Int) = {
      var best = (0, 0, 0)
      for (i <- x.indices; j <- y.indices) {
        var l = 0
        while (i + l < x.length && j + l < y.length && x(i + l) == y(j + l)) l += 1
        if (l > best._1) best = (l, i, j)
      }
      best
    }
    def matchTotal(x: Vector[Int], y: Vector[Int]): Int =
      if (x.isEmpty || y.isEmpty) 0
      else {
        val (l, i, j) = longestMatch(x, y)
        if (l == 0) 0
        else l + matchTotal(x.take(i), y.take(j)) +
          matchTotal(x.drop(i + l), y.drop(j + l))
      }
    val x = cps(a).toVector; val y = cps(b).toVector
    2.0 * matchTotal(x, y).toDouble / (x.length + y.length).toDouble
  }

  test("bag/ratcliff: exhaustive over |sigma|=3 up to length 5") {
    val sigma = "abc"
    var acc = Vector("")
    var frontier = Vector("")
    for (_ <- 1 to 5) {
      frontier = frontier.flatMap(s => sigma.map(c => s + c))
      acc ++= frontier
    }
    for (a <- acc; b <- acc) {
      assert(StrSimKernels.bag(a, b) == bagRef(a, b), s"bag a='$a' b='$b'")
      assert(StrSimKernels.ratcliffObershelp(a, b) == roRef(a, b),
        s"ratcliff a='$a' b='$b'")
    }
  }

  test("bag/ratcliff: random Unicode incl. supplementary plane vs references") {
    val rng = new scala.util.Random(31)
    val pool = "abcdeZ 中é🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ =>
        new String(Character.toChars(pool(rng.nextInt(pool.length))))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(rng.nextInt(16))
      val b = randStr(rng.nextInt(16))
      assert(StrSimKernels.bag(a, b) == bagRef(a, b), s"bag a='$a' b='$b'")
      assert(StrSimKernels.ratcliffObershelp(a, b) == roRef(a, b),
        s"ratcliff a='$a' b='$b'")
    }
  }

  test("pre-filter ordering: bag bounds levenshtein; ratcliff bracketed by lcsstr/lcs") {
    val rng = new scala.util.Random(37)
    val pool = "abcdef".toCharArray
    def randStr(n: Int): String =
      (0 until n).map(_ => pool(rng.nextInt(pool.length))).mkString
    for (_ <- 0 until 2000) {
      val a = randStr(rng.nextInt(12))
      val b = randStr(rng.nextInt(12))
      // bag distance lower-bounds edit distance ⇒ bag_sim is an upper
      // bound on levenshtein_sim (the soundness of the admission filter).
      // The bound is exact in the reals; the two kernels round through
      // different expressions (inter/max vs 1 − dist/max), so equality
      // cases can land 1 ulp apart — hence the epsilon.
      assert(StrSimKernels.bag(a, b) >= StrSimKernels.levenshtein(a, b) - 1e-15,
        s"bag>=lev a='$a' b='$b'")
      // and on multiset Jaccard (max(n,m) ≤ |union|)
      assert(StrSimKernels.bag(a, b) >= StrSimKernels.jaccard(a, b) - 1e-15,
        s"bag>=jaccard a='$a' b='$b'")
      // RO's matched blocks form a common subsequence (≤ LCS), and its
      // first block IS the longest common substring (≥ lcsstr mass)
      val ro = StrSimKernels.ratcliffObershelp(a, b)
      assert(ro <= StrSimKernels.lcs(a, b) + 1e-15, s"ro<=lcs a='$a' b='$b'")
      if (a.nonEmpty || b.nonEmpty) {
        val n = a.length; val m = b.length
        val lcsstrMass =
          2.0 * (StrSimKernels.lcsstr(a, b) * math.max(n, m)) / (n + m).toDouble
        assert(ro >= lcsstrMass - 1e-12, s"ro>=lcsstr-mass a='$a' b='$b'")
      }
    }
  }

  test("pinned vectors document the variant") {
    // the difflib docstring example: SequenceMatcher(None,'abcd','bcde')
    assert(StrSimKernels.ratcliffObershelp("abcd", "bcde") == 0.75)
    // the reference README pair: block 'phil' (earliest maximal), then
    // 'ips' on the right remainder → M=7, ratio 14/15
    assert(StrSimKernels.ratcliffObershelp("phillips", "philips") == 14.0 / 15.0)
    // tie-break: both 'ab' and 'ba' maximal in ('aba','bab') — earliest
    // in a picks 'ab' at i=0 (j=1); remainders 'a'/'b' left empty-cross,
    // right 'a' vs '' → M=2, ratio 4/6
    assert(StrSimKernels.ratcliffObershelp("aba", "bab") == 4.0 / 6.0)
    // transposed halves: gestalt keeps the larger block + recursion
    assert(StrSimKernels.ratcliffObershelp("hello world", "world hello") ==
      roRef("hello world", "world hello"))
    // bag: anagrams are bag-identical but edit-distant
    assert(StrSimKernels.bag("listen", "silent") == 1.0)
    assert(StrSimKernels.levenshtein("listen", "silent") < 1.0)
    // bag on the README pair: inter=7, max=8
    assert(StrSimKernels.bag("phillips", "philips") == 7.0 / 8.0)
    // empty/equal contract
    for (k <- Seq[(String, String) => Double](
        (a, b) => StrSimKernels.bag(a, b),
        (a, b) => StrSimKernels.ratcliffObershelp(a, b))) {
      assert(k("", "") == 1.0)
      assert(k("x", "") == 0.0)
      assert(k("", "x") == 0.0)
      assert(k("same", "same") == 1.0)
    }
  }

  /** Naive partial ratio: explicit window loop over Vector slices with the
    * brute-force RO reference per window. */
  private def partialRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val xa = cps(a); val xb = cps(b)
    val (pat, txt) =
      if (xa.length <= xb.length) (xa, xb) else (xb, xa)
    def str(cp: Array[Int]): String = cp.flatMap(Character.toChars).mkString
    (0 to txt.length - pat.length).map { off =>
      roRef(str(pat), str(txt.slice(off, off + pat.length)))
    }.max
  }

  /** Naive bag distance: max(|a−b|, |b−a|) from count maps. */
  private def bagDistRef(a: String, b: String): Int = {
    if (a == b) return 0
    val ca = cps(a).groupBy(identity).map { case (k, v) => k -> v.length }
    val cb = cps(b).groupBy(identity).map { case (k, v) => k -> v.length }
    val aOnly = ca.map { case (k, v) => math.max(0, v - cb.getOrElse(k, 0)) }.sum
    val bOnly = cb.map { case (k, v) => math.max(0, v - ca.getOrElse(k, 0)) }.sum
    math.max(aOnly, bOnly)
  }

  test("partial/bagDist: exhaustive over |sigma|=3 up to length 5") {
    val sigma = "abc"
    var acc = Vector("")
    var frontier = Vector("")
    for (_ <- 1 to 5) {
      frontier = frontier.flatMap(s => sigma.map(c => s + c))
      acc ++= frontier
    }
    for (a <- acc; b <- acc) {
      assert(StrSimKernels.partialRatcliff(a, b) == partialRef(a, b),
        s"partial a='$a' b='$b'")
      assert(StrSimKernels.bagDist(a, b) == bagDistRef(a, b),
        s"bagDist a='$a' b='$b'")
    }
  }

  test("partial/bagDist: random Unicode incl. supplementary plane vs references") {
    val rng = new scala.util.Random(41)
    val pool = "abcdeZ 中é🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ =>
        new String(Character.toChars(pool(rng.nextInt(pool.length))))).mkString
    for (_ <- 0 until 2000) {
      val a = randStr(rng.nextInt(14))
      val b = randStr(rng.nextInt(20))
      assert(StrSimKernels.partialRatcliff(a, b) == partialRef(a, b),
        s"partial a='$a' b='$b'")
      assert(StrSimKernels.bagDist(a, b) == bagDistRef(a, b),
        s"bagDist a='$a' b='$b'")
    }
  }

  test("partial ratio: containment, dominance, and pinned vectors") {
    // verbatim containment → 1.0 (the scorer's reason to exist)
    assert(StrSimKernels.partialRatcliff("ibm", "ibm corporation") == 1.0)
    assert(StrSimKernels.partialRatcliff("ibm corporation", "ibm") == 1.0)
    // partial ≥ plain RO when lengths are equal (single window IS RO) and
    // in general partial(a,b) ≥ ro over any window incl. a best-aligned one
    val rng = new scala.util.Random(43)
    val pool = "abcdef".toCharArray
    def randStr(n: Int): String =
      (0 until n).map(_ => pool(rng.nextInt(pool.length))).mkString
    for (_ <- 0 until 1000) {
      val a = randStr(1 + rng.nextInt(8))
      val b = randStr(1 + rng.nextInt(12))
      val p = StrSimKernels.partialRatcliff(a, b)
      assert(p >= 0.0 && p <= 1.0)
      if (a.length == b.length)
        assert(p == StrSimKernels.ratcliffObershelp(a, b),
          s"equal-length partial != ro a='$a' b='$b'")
    }
    // thefuzz's canonical demo: similar strings with a long tail
    assert(StrSimKernels.partialRatcliff(
      "fuzzy wuzzy", "fuzzy wuzzy was a bear") == 1.0)
    // edges
    assert(StrSimKernels.partialRatcliff("", "") == 1.0)
    assert(StrSimKernels.partialRatcliff("x", "") == 0.0)
    assert(StrSimKernels.partialRatcliff("", "x") == 0.0)
  }

  test("bag tier-0 soundness: bag_dist lower-bounds levenshtein distance") {
    val rng = new scala.util.Random(47)
    val pool = "abcde".toCharArray
    def randStr(n: Int): String =
      (0 until n).map(_ => pool(rng.nextInt(pool.length))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(rng.nextInt(12))
      val b = randStr(rng.nextInt(12))
      val bd = StrSimKernels.bagDist(a, b)
      for (k <- 0 to 6) {
        val levWithin = StrSimKernels.levenshteinCapped(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.unsafe.types.UTF8String.fromString(b), k) <= k
        // superset property: every edit-admitted pair is bag-admitted
        if (levWithin) assert(bd <= k,
          s"bag tier rejected an edit-admitted pair a='$a' b='$b' k=$k")
      }
    }
  }

  test("ratcliff: deep recursion (alternating blocks) exercises worklist growth") {
    // 64 interleaved 1-char blocks force ~64 segments through the stack —
    // regression for ensureCopy on the worklist array
    val a = (0 until 64).map(i => s"${('a' + (i % 26)).toChar}x").mkString
    val b = (0 until 64).map(i => s"${('a' + (i % 26)).toChar}y").mkString
    assert(StrSimKernels.ratcliffObershelp(a, b) == roRef(a, b))
  }

  test("bag/ratcliff codegen and SQL paths agree with the kernels (incl. nulls)") {
    import spark.implicits._
    val df = Seq(("phillips", "philips"), ("abcd", "bcde"), ("", ""),
      ("listen", "silent"), (null, "x"), ("x", null)).toDF("a", "b")
    val viaCol = df.select(
        graft.functions.bag_sim(col("a"), col("b")).as("g"),
        graft.functions.ratcliff_obershelp_sim(col("a"), col("b")).as("r"))
      .collect()
    df.createOrReplaceTempView("br_pairs")
    val viaSql = spark.sql(
      "SELECT bag_sim(a, b) AS g, ratcliff_obershelp_sim(a, b) AS r FROM br_pairs")
      .collect()
    val in = df.collect()
    for ((rows, label) <- Seq((viaCol, "col"), (viaSql, "sql"))) {
      for ((r, i) <- rows.zipWithIndex) {
        val (a, b) = (in(i).getString(0), in(i).getString(1))
        if (a == null || b == null)
          assert(r.isNullAt(0) && r.isNullAt(1), s"$label row $i")
        else {
          assert(r.getDouble(0) == bagRef(a, b), s"$label bag row $i")
          assert(r.getDouble(1) == roRef(a, b), s"$label ratcliff row $i")
        }
      }
    }
  }
}
