package graft.operators

import scala.util.Random

import graft.SparkFunSuite

class SetSimJoinSpec extends SparkFunSuite {
  import spark.implicits._

  /** Brute-force distinct-token Jaccard >= tau over all pairs — the
    * completeness reference the prefix filter must exactly reproduce. */
  private def bruteForce(docs: Seq[(Long, String)], tau: Double) = {
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSet
    (for {
      (ia, ta) <- docs.map { case (i, t) => (i, toks(t)) } if ta.nonEmpty
      (ib, tb) <- docs.map { case (i, t) => (i, toks(t)) } if ib > ia && tb.nonEmpty
      j = (ta & tb).size.toDouble / (ta | tb).size.toDouble if j >= tau
    } yield (ia, ib, j)).toSet
  }

  private def run(docs: Seq[(Long, String)], tau: Double,
      bucketCap: Int = 10000, hardCap: Int = Int.MaxValue,
      saltGroups: Int = 16) =
    SetSimJoin.prefixJaccardPairs(docs.toDF("id", "text"), "id", "text",
      tau, bucketCap, hardCap, saltGroups)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix join equals brute force on random corpora at several taus") {
    val rnd = new Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    for (tau <- Seq(0.3, 0.5, 0.75, 0.95, 1.0)) {
      val expected = bruteForce(docs, tau)
      assert(run(docs, tau) == expected, s"tau=$tau")
    }
  }

  test("edge shapes: empty text excluded, exact dups, singleton tokens") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),   // jaccard 1.0 with 1
      (3L, "  "),                 // token-less: excluded entirely
      (4L, "alpha"),              // singleton; 1/3 vs doc 1
      (5L, "zeta"))               // singleton, disjoint
    val got = run(docs, 0.5)
    assert(got == bruteForce(docs, 0.5))
    assert(got.contains((1L, 2L, 1.0)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("salted hot-token tier is lossless: identical pair set as plain") {
    // boilerplate corpus: every doc shares the SAME rare-ish tokens, so
    // prefix buckets go hot — bucketCap=5 routes them through the grid
    val rnd = new Random(7)
    val docs = (1L to 40L).map { i =>
      val extra = if (rnd.nextBoolean()) " unique" + (i % 4) else ""
      (i, s"shared boiler plate$extra")
    }
    val plain = run(docs, 0.6)
    val salted = run(docs, 0.6, bucketCap = 5, saltGroups = 4)
    assert(salted == plain)
    assert(plain == bruteForce(docs, 0.6))
    assert(plain.nonEmpty)
  }

  test("hardCap drops are opt-in and observable, never silent") {
    val docs = (1L to 30L).map(i => (i, "common token everywhere")) ++
      Seq((101L, "rare pair one"), (102L, "rare pair one"))
    // default: no drop — hot bucket still fully paired via the salt tier
    assert(run(docs, 0.9, bucketCap = 5, saltGroups = 4) ==
      bruteForce(docs, 0.9))
    // finite hardCap: the 30-member buckets are cut; the companion frame
    // reports exactly those prefix tokens with their sizes
    val capped = run(docs, 0.9, bucketCap = 5, hardCap = 10, saltGroups = 4)
    assert(capped.contains((101L, 102L, 1.0)))
    assert(!capped.exists(p => p._1 <= 30L))
    val dropped = SetSimJoin.droppedPrefixTokens(
      docs.toDF("id", "text"), "id", "text", tau = 0.9, hardCap = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dropped.nonEmpty && dropped.values.forall(_ > 10L))
  }

  test("prefix bound survives integral tau*len binary rounding") {
    // len=20, tau=0.95: tau*len = 19 exactly in the reals; a naive
    // ceil(0.95*20) in binary gives 20 and would shave the prefix to 1
    // token — these two docs differ in their FIRST-ranked token, so a
    // too-short prefix loses the pair (jaccard = 19/21 < 0.95 is below,
    // so use 0.9: prefix p = 20 - 18 + 1 = 3 under the bound, 2 if shaved)
    val base = (1 to 19).map(i => f"tok$i%02d")
    val docs = Seq(
      (1L, (base :+ "onlya").mkString(" ")),
      (2L, (base :+ "onlyb").mkString(" ")))
    for (tau <- Seq(0.9, 0.95)) {
      assert(run(docs, tau) == bruteForce(docs, tau), s"tau=$tau")
    }
  }
}
