package graft.operators

import graft.SparkFunSuite

class ConnectedComponentsSpec extends SparkFunSuite {
  import org.apache.spark.sql.functions._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find for cross-checking. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // component id = min node of component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("chain collapses to one component (O(log n) rounds exercise)") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 63L).toSet)
  }

  test("two stars + separate pair") {
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 11L), (20L, 12L), (30L, 31L))
    val got = cc(edges)
    assert(got(10L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(20L) == 11L && got(12L) == 11L)
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("empty edge set") {
    import spark.implicits._
    val out = ConnectedComponents.run(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.count() == 0)
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = cc(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graph matches union-find") {
    val rng = new scala.util.Random(42)
    val edges = Seq.fill(300)((rng.nextInt(200).toLong, rng.nextInt(200).toLong))
      .filter(e => e._1 != e._2)
    assert(cc(edges) == unionFind(edges))
  }

  test("negative ids (xxhash64 output range) work") {
    val edges = Seq((-5L, 3L), (3L, -9L), (100L, 200L))
    assert(cc(edges) == unionFind(edges))
  }
}
