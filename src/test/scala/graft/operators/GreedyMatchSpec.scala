package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Pins [[Linkage.greedyMatches]] — the parallel locally-dominant rounds —
  * to the SEQUENTIAL greedy matching it claims to equal: sort all pairs by
  * (score DESC, id_l, id_r), accept a pair iff both endpoints are still
  * free. Random inputs catch tie-break drift; the adversarial descending
  * chain catches any formulation that accepts more than the dominant layer
  * per round (a chain's greedy matching alternates pairs, so eagerness
  * shows up immediately). */
class GreedyMatchSpec extends SparkFunSuite {
  import scala.collection.mutable

  private def sequentialGreedy(
      pairs: Seq[(Long, Long, Double)]): Set[(Long, Long)] = {
    val sorted = pairs.sortBy { case (l, r, s) => (-s, l, r) }
    val takenL = mutable.Set.empty[Long]
    val takenR = mutable.Set.empty[Long]
    val out = mutable.Set.empty[(Long, Long)]
    sorted.foreach { case (l, r, _) =>
      if (!takenL(l) && !takenR(r)) { takenL += l; takenR += r; out += ((l, r)) }
    }
    out.toSet
  }

  private def run(pairs: Seq[(Long, Long, Double)]): Set[(Long, Long)] = {
    import spark.implicits._
    val df = pairs.toDF("id_l", "id_r", "score")
    Linkage.greedyMatches(df).select(col("id_l"), col("id_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("parallel rounds equal sequential greedy on random scores") {
    val rnd = new scala.util.Random(7)
    val pairs = (for {
      l <- 0L until 40L
      r <- 0L until 40L
      if rnd.nextDouble() < 0.2
    } yield (l, r, math.rint(rnd.nextDouble() * 100) / 10.0)).toSeq
    assert(run(pairs) == sequentialGreedy(pairs))
  }

  test("adversarial descending chain serializes but stays exact") {
    // a1-b1 10, b1-a2 9, a2-b2 8, ... greedy takes every OTHER pair
    val pairs = (0 until 20).flatMap { i =>
      Seq((i.toLong, i.toLong, 100.0 - 2 * i),
        ((i + 1).toLong, i.toLong, 99.0 - 2 * i))
    }
    val expected = sequentialGreedy(pairs)
    assert(run(pairs) == expected)
    // the chain's greedy matching is exactly the even layer
    assert(expected == (0 until 20).map(i => (i.toLong, i.toLong)).toSet)
  }

  test("score ties break by (id_l, id_r) like the sequential order") {
    val pairs = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (2L, 1L, 5.0),
      (2L, 2L, 5.0), (3L, 1L, 5.0), (3L, 3L, 4.0))
    assert(run(pairs) == sequentialGreedy(pairs))
  }

  test("one-to-one: no endpoint appears twice, empty input drains") {
    val rnd = new scala.util.Random(13)
    val pairs = (for {
      l <- 0L until 25L; r <- 0L until 15L
      if rnd.nextDouble() < 0.5
    } yield (l, r, rnd.nextInt(5).toDouble)).toSeq
    val got = run(pairs)
    assert(got == sequentialGreedy(pairs))
    assert(got.map(_._1).size == got.size && got.map(_._2).size == got.size)
    assert(run(Seq.empty) == Set.empty)
  }
}
