package graft.strsim

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Editex and longest-common-substring kernels (round 5): naive
  * full-matrix / brute-force references, exhaustive small-alphabet
  * cross-checks over the cost-rule-sensitive characters (h/w, vowels,
  * overlapping groups, doubles), Unicode randoms, pinned vectors
  * documenting the variant, and codegen/SQL agreement. */
class EditexLcsStrSpec extends SparkFunSuite {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private def mask(cp0: Int): Int = {
    val cp = if (cp0 >= 'a' && cp0 <= 'z') cp0 - 32 else cp0
    var m = 0
    if ("AEIOUY".indexOf(cp) >= 0) m |= 1
    if ("BP".indexOf(cp) >= 0) m |= 2
    if ("CKQ".indexOf(cp) >= 0) m |= 4
    if ("DT".indexOf(cp) >= 0) m |= 8
    if ("LR".indexOf(cp) >= 0) m |= 16
    if ("MN".indexOf(cp) >= 0) m |= 32
    if ("GJ".indexOf(cp) >= 0) m |= 64
    if ("FPV".indexOf(cp) >= 0) m |= 128
    if ("SXZ".indexOf(cp) >= 0) m |= 256
    if ("CSZ".indexOf(cp) >= 0) m |= 512
    m
  }

  /** Naive full-matrix Editex with the kernel's pinned rules, written
    * independently (group masks from membership strings, not the kernel's
    * match table). */
  private def editexRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    val fold = (cp: Int) => if (cp >= 'a' && cp <= 'z') cp - 32 else cp
    val x = cps(a).map(fold); val y = cps(b).map(fold)
    val n = x.length; val m = y.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    def r(p: Int, q: Int): Int =
      if (p == q) 0 else if ((mask(p) & mask(q)) != 0) 1 else 2
    def dCost(prev: Int, cur: Int): Int =
      if (prev == cur) 0 else if (prev == 'H' || prev == 'W') 1 else r(prev, cur)
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 1 to n) d(i)(0) = d(i - 1)(0) + (if (i == 1) 2 else dCost(x(i - 2), x(i - 1)))
    for (j <- 1 to m) d(0)(j) = d(0)(j - 1) + (if (j == 1) 2 else dCost(y(j - 2), y(j - 1)))
    for (i <- 1 to n; j <- 1 to m) {
      val del = d(i - 1)(j) + (if (i == 1) 2 else dCost(x(i - 2), x(i - 1)))
      val ins = d(i)(j - 1) + (if (j == 1) 2 else dCost(y(j - 2), y(j - 1)))
      val sub = d(i - 1)(j - 1) + r(x(i - 1), y(j - 1))
      d(i)(j) = math.min(sub, math.min(del, ins))
    }
    1.0 - d(n)(m).toDouble / (2.0 * math.max(n, m).toDouble)
  }

  /** Brute-force longest common substring: every substring of the shorter
    * side, longest first, `contains` on the other. */
  private def lcsstrRef(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    // operate on code-point vectors so supplementary-plane chars count as 1
    val x = cps(a).toVector; val y = cps(b).toVector
    val (s, t) = if (x.length <= y.length) (x, y) else (y, x)
    var best = 0
    for (i <- s.indices; l <- 1 to (s.length - i)) {
      if (l > best && t.indexOfSlice(s.slice(i, i + l)) >= 0) best = l
    }
    best.toDouble / math.max(x.length, y.length).toDouble
  }

  test("editex: exhaustive over cost-rule-sensitive alphabet up to length 4") {
    // h/w trigger the silent-context rule, a/e the vowel group, s the
    // double-group overlap (sxz AND csz), x a no-group consonant pairing
    // with s; repeats exercise the free-double rule
    val sigma = "haews"
    def strings(maxLen: Int): Seq[String] = {
      var acc = Vector("")
      var frontier = Vector("")
      for (_ <- 1 to maxLen) {
        frontier = frontier.flatMap(s => sigma.map(c => s + c))
        acc ++= frontier
      }
      acc
    }
    val all = strings(4)
    for (a <- all; b <- all) {
      assert(StrSimKernels.editex(a, b) == editexRef(a, b), s"editex a='$a' b='$b'")
      assert(StrSimKernels.lcsstr(a, b) == lcsstrRef(a, b), s"lcsstr a='$a' b='$b'")
    }
  }

  test("editex/lcsstr: random Unicode incl. supplementary plane vs references") {
    val rng = new scala.util.Random(29)
    val pool = "abchwspzAEZ 中é🙂".codePoints().toArray
    def randStr(n: Int): String =
      (0 until n).map(_ => new String(Character.toChars(pool(rng.nextInt(pool.length))))).mkString
    for (_ <- 0 until 3000) {
      val a = randStr(rng.nextInt(14))
      val b = randStr(rng.nextInt(14))
      assert(StrSimKernels.editex(a, b) == editexRef(a, b), s"editex a='$a' b='$b'")
      assert(StrSimKernels.lcsstr(a, b) == lcsstrRef(a, b), s"lcsstr a='$a' b='$b'")
    }
  }

  test("pinned vectors document the variant") {
    // free tapering double: deleting the repeated 'a' costs 0
    assert(StrSimKernels.editex("aa", "a") == 1.0)
    // H/W silent context: deleting 'h' after 'w' costs 1 (max len 3 → 1-1/6)
    assert(StrSimKernels.editex("who", "wo") == 1.0 - 1.0 / 6.0)
    // vowel-group substitution costs 1 where lev charges a full edit
    assert(StrSimKernels.editex("beat", "bet") > StrSimKernels.levenshtein("beat", "bet"))
    // overlapping groups: c~k (ckq) and c~s (csz) both cost 1, k!~s costs 2
    assert(StrSimKernels.editex("cat", "kat") == StrSimKernels.editex("cat", "sat"))
    assert(StrSimKernels.editex("kat", "sat") < StrSimKernels.editex("cat", "kat"))
    // ASCII case fold pinned
    assert(StrSimKernels.editex("SMITH", "smith") == 1.0)
    // first-char deletion carries the sentinel rate 2, even for h/w
    assert(StrSimKernels.editex("hat", "at") == 1.0 - 2.0 / 6.0)
    // lcsstr: proper containment stays strict (SW saturates)
    assert(StrSimKernels.lcsstr("bcd", "abcdefgh") == 3.0 / 8.0)
    assert(StrSimKernels.smithWaterman("bcd", "abcdefgh") == 1.0)
    // contiguity: interleaving breaks the run where LCS (subsequence) forgives
    assert(StrSimKernels.lcsstr("abcd", "axbxcxd") == 1.0 / 7.0)
    assert(StrSimKernels.lcs("abcd", "axbxcxd") > StrSimKernels.lcsstr("abcd", "axbxcxd"))
    // empty/equal contract
    for (k <- Seq[(String, String) => Double](
        (a, b) => StrSimKernels.editex(a, b), (a, b) => StrSimKernels.lcsstr(a, b))) {
      assert(k("", "") == 1.0)
      assert(k("x", "") == 0.0)
      assert(k("", "x") == 0.0)
      assert(k("same", "same") == 1.0)
    }
  }

  test("editex/lcsstr codegen and SQL paths agree with the kernels (incl. nulls)") {
    import spark.implicits._
    val df = Seq(("phillips", "philips"), ("who", "wo"), ("", ""),
      ("bcd", "abcdefgh"), (null, "x"), ("x", null)).toDF("a", "b")
    val viaCol = df.select(
        graft.functions.editex_sim(col("a"), col("b")).as("e"),
        graft.functions.lcsstr_sim(col("a"), col("b")).as("l"))
      .collect()
    df.createOrReplaceTempView("ed_pairs")
    val viaSql = spark.sql(
      "SELECT editex_sim(a, b) AS e, lcsstr_sim(a, b) AS l FROM ed_pairs")
      .collect()
    val in = df.collect()
    for ((rows, label) <- Seq((viaCol, "col"), (viaSql, "sql"))) {
      for ((r, i) <- rows.zipWithIndex) {
        val (a, b) = (in(i).getString(0), in(i).getString(1))
        if (a == null || b == null)
          assert(r.isNullAt(0) && r.isNullAt(1), s"$label row $i")
        else {
          assert(r.getDouble(0) == editexRef(a, b), s"$label editex row $i")
          assert(r.getDouble(1) == lcsstrRef(a, b), s"$label lcsstr row $i")
        }
      }
    }
  }
}
