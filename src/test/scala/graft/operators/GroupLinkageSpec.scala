package graft.operators

import scala.collection.mutable

import graft.SparkFunSuite

/** Group linkage (On et al. ICDE'07): per-group-pair greedy matching must
  * equal the sequential greedy reference scoped to each group pair, and
  * the normalized similarity must equal the hand formula with the ordered
  * matched-weight fold. */
class GroupLinkageSpec extends SparkFunSuite {

  import spark.implicits._

  /** sequential greedy within ONE group pair (score DESC, rl, rr). */
  private def seqGreedy(pairs: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] = {
    val sorted = pairs.sortBy { case (l, r, s) => (-s, l, r) }
    val takenL = mutable.Set.empty[Long]
    val takenR = mutable.Set.empty[Long]
    val out = mutable.ArrayBuffer.empty[(Long, Long, Double)]
    sorted.foreach { case (l, r, s) =>
      if (!takenL(l) && !takenR(r)) { takenL += l; takenR += r; out += ((l, r, s)) }
    }
    out.toSeq
  }

  private def refSim(groupsL: Map[Long, Seq[Long]], groupsR: Map[Long, Seq[Long]],
      scores: Seq[(Long, Long, Double)]): Map[(Long, Long), (Long, Double, Double)] = {
    val byPair = scores.flatMap { case (rl, rr, s) =>
      for {
        ga <- groupsL.collect { case (g, ms) if ms.contains(rl) => g }
        gb <- groupsR.collect { case (g, ms) if ms.contains(rr) => g }
      } yield ((ga, gb), (rl, rr, s))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byPair.map { case ((ga, gb), cand) =>
      val m = seqGreedy(cand)
      // ordered left fold over (rl, rr)-sorted matched list
      val msum = m.sortBy(x => (x._1, x._2)).foldLeft(0.0)(_ + _._3)
      val sim = msum / (groupsL(ga).size + groupsR(gb).size - m.size).toDouble
      (ga, gb) -> ((m.size.toLong, msum, sim))
    }
  }

  test("matches the sequential per-group-pair reference on random input") {
    val rng = new scala.util.Random(97)
    val groupsL = (0L until 4L).map(g =>
      g -> (0 until 6).map(i => g * 100 + i.toLong)).toMap
    val groupsR = (0L until 4L).map(g =>
      g -> (0 until 5).map(i => 1000 + g * 100 + i.toLong)).toMap
    val allL = groupsL.values.flatten.toSeq
    val allR = groupsR.values.flatten.toSeq
    val scores = (for {
      l <- allL; r <- allR
      if rng.nextDouble() < 0.3
    } yield (l, r, math.rint(rng.nextDouble() * 50) / 10.0)).toSeq

    val left = groupsL.toSeq.flatMap { case (g, ms) => ms.map(m => (g, m)) }
      .toDF("gid", "rid")
    val right = groupsR.toSeq.flatMap { case (g, ms) => ms.map(m => (g, m)) }
      .toDF("gid", "rid")
    val scored = scores.toDF("id_l", "id_r", "score")

    val got = Linkage.groupLinkage(left, right, scored)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val ref = refSim(groupsL.view.mapValues(_.toSeq).toMap,
      groupsR.view.mapValues(_.toSeq).toMap, scores)
    assert(got.keySet == ref.keySet)
    for (k <- ref.keys) assert(got(k) == ref(k), s"group pair $k")
  }

  test("hand case: perfect sub-match and the normalization formula") {
    // A = {1,2,3}, B = {11,12}: matches (1,11,1.0), (2,12,0.8)
    // sim = 1.8 / (3 + 2 - 2) = 0.6
    val left = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("gid", "rid")
    val right = Seq((9L, 11L), (9L, 12L)).toDF("gid", "rid")
    val scored = Seq((1L, 11L, 1.0), (2L, 12L, 0.8), (3L, 11L, 0.9))
      .toDF("id_l", "id_r", "score")
    val row = Linkage.groupLinkage(left, right, scored).collect()(0)
    assert(row.getLong(2) == 3L && row.getLong(3) == 2L) // n_l, n_r
    assert(row.getLong(4) == 2L)                          // n_matched
    assert(row.getDouble(5) == 1.8)
    assert(row.getDouble(6) == 1.8 / 3.0)
  }

  test("a record in two group pairs matches independently per pair") {
    // rl=1 is in group A7 vs B9 and A7 vs B8 — greedy runs per pair
    val left = Seq((7L, 1L)).toDF("gid", "rid")
    val right = Seq((9L, 11L), (8L, 21L)).toDF("gid", "rid")
    val scored = Seq((1L, 11L, 0.9), (1L, 21L, 0.7)).toDF("id_l", "id_r", "score")
    val got = Linkage.groupLinkage(left, right, scored)
      .collect().map(r => (r.getLong(1), r.getDouble(6))).toMap
    assert(got(9L) == 0.9 / 1.0 && got(8L) == 0.7 / 1.0)
  }
}
