package graft.operators

import graft.SparkFunSuite

/** Pins [[Canopy.canopies]] to the sequential canopy pass it claims to
  * equal: visit records by LCG rank; an unremoved record becomes a
  * center, tight neighbors leave the list, loose neighbors STILL ON THE
  * LIST join the canopy (overlap). */
class CanopySpec extends SparkFunSuite {
  import scala.collection.mutable

  private def rank(id: Long): (Long, Long) =
    ((id * 1103515245L + 12345L) % 2147483648L, id)

  private def sequentialCanopy(pairs: Seq[(Long, Long, Double)],
      t1: Double, t2: Double): Set[(Long, Long)] = {
    val sim = mutable.Map.empty[(Long, Long), Double]
    val nbrs = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b, s) =>
      if (a != b && s >= t1) {
        val k1 = (a, b); val k2 = (b, a)
        sim(k1) = math.max(s, sim.getOrElse(k1, 0.0))
        sim(k2) = math.max(s, sim.getOrElse(k2, 0.0))
        nbrs.getOrElseUpdate(a, mutable.Set.empty) += b
        nbrs.getOrElseUpdate(b, mutable.Set.empty) += a
      }
    }
    val listed = mutable.LinkedHashSet(nbrs.keys.toSeq.sortBy(rank): _*)
    val out = mutable.Set.empty[(Long, Long)]
    while (listed.nonEmpty) {
      val c = listed.head
      listed -= c
      out += ((c, c))
      nbrs(c).foreach { p =>
        if (listed.contains(p)) {
          if (sim((p, c)) >= t1) out += ((p, c))
          if (sim((p, c)) >= t2) listed -= p
        }
      }
      // centers can also belong to later canopies? No: a center leaves
      // the list when picked — later centers never include it. But THIS
      // center may already belong to EARLIER canopies (handled above in
      // earlier iterations, since it was still listed then).
    }
    out.toSet
  }

  private def run(pairs: Seq[(Long, Long, Double)], t1: Double,
      t2: Double): Set[(Long, Long)] = {
    import spark.implicits._
    Canopy.canopies(pairs.toDF("ia", "ib", "sim"), t1, t2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("parallel replay equals the sequential canopy pass") {
    for (seed <- Seq(1, 5, 9)) {
      val rnd = new scala.util.Random(seed)
      val pairs = (for {
        a <- 0L until 50L; b <- (a + 1) until 50L
        if rnd.nextDouble() < 0.08
      } yield (a, b, math.rint(rnd.nextDouble() * 100) / 100.0)).toSeq
      assert(run(pairs, 0.3, 0.7) == sequentialCanopy(pairs, 0.3, 0.7),
        s"seed $seed")
    }
  }

  test("overlap: a record within loose range of two centers joins both") {
    // ranks: rank(1) < rank(2)? LCG order decides; build symmetric case:
    // 1 and 3 are FAR from each other (no pair), both loosely near 2
    val pairs = Seq((1L, 2L, 0.5), (2L, 3L, 0.5))
    val got = run(pairs, 0.4, 0.9)
    // no tight edges → all three are centers; 2 joins both neighbors'
    // canopies picked before its own removal (its own pick), and 1, 3
    // join 2's canopy only if 2 is picked before their removal (their
    // own picks) — exactly the sequential semantics:
    assert(got == sequentialCanopy(pairs, 0.4, 0.9))
    // overlap exists: some record belongs to two canopies (whichever of
    // 1/2/3 the rank order picks later still joined the earlier canopy)
    assert(got.groupBy(_._1).exists(_._2.size >= 2))
  }

  test("tight removal prevents later centerhood") {
    val pairs = Seq((1L, 2L, 0.95), (2L, 3L, 0.95), (3L, 4L, 0.95))
    val got = run(pairs, 0.5, 0.9)
    assert(got == sequentialCanopy(pairs, 0.5, 0.9))
    val centers = got.collect { case (a, b) if a == b => a }
    // tight chain → centers form an independent set of the tight graph
    centers.foreach { c =>
      assert(!centers.exists(d => math.abs(d - c) == 1))
    }
  }

  test("thresholds validated") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Canopy.canopies(Seq((1L, 2L, 0.5)).toDF("ia", "ib", "sim"), 0.8, 0.4)
    }
  }
}
