package graft.operators

import scala.collection.mutable

import graft.SparkFunSuite

/** Cluster repair from must/cannot-link review decisions: pinned
  * merge-evict-relabel semantics vs a union-find reference, plus the loud
  * contradiction guards. */
class ClusterRepairSpec extends SparkFunSuite {

  import spark.implicits._

  private def ref(asg: Map[Long, Long], must: Seq[(Long, Long)],
      cannot: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    asg.foreach { case (id, c) => union(id, c) }
    must.foreach { case (a, b) => union(a, b) }
    val merged = asg.keys.map(id => id -> find(id)).toMap
    val evicted = cannot.collect {
      case (a, b) if merged(math.min(a, b)) == merged(math.max(a, b)) =>
        math.max(a, b)
    }.toSet
    val byCluster = merged.toSeq.filterNot(kv => evicted(kv._1))
      .groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    asg.keys.map { id =>
      id -> (if (evicted(id)) id else byCluster(merged(id)))
    }.toMap
  }

  private def run(asg: Map[Long, Long], must: Seq[(Long, Long)],
      cannot: Seq[(Long, Long)]): Map[Long, Long] = {
    val a = asg.toSeq.toDF("id", "cluster_id")
    val m = (must :+ (-1L, -2L)).toDF("id_a", "id_b") // keep frame non-empty
      .where($"id_a" >= 0)
    val c = (cannot :+ (-1L, -2L)).toDF("id_a", "id_b").where($"id_a" >= 0)
    Linkage.clusterRepair(a, m, c).as[(Long, Long)].collect().toMap
  }

  test("hand case: merge via must, evict via cannot, relabel to min") {
    // clusters {1,2,3} (root 1), {10,11} (root 10)
    val asg = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // must 3-10 merges both; cannot 2-11 evicts 11
    val got = run(asg, Seq((3L, 10L)), Seq((2L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 11L))
  }

  test("evicting the old root relabels survivors to the next min id") {
    val asg = Map(5L -> 5L, 6L -> 5L, 7L -> 5L)
    // cannot (5,6): 6 evicted (larger side); root 5 stays
    assert(run(asg, Nil, Seq((5L, 6L))) ==
      Map(5L -> 5L, 6L -> 6L, 7L -> 5L))
    // cannot (6,5) canonicalizes the same way
    assert(run(asg, Nil, Seq((6L, 5L))) ==
      Map(5L -> 5L, 6L -> 6L, 7L -> 5L))
  }

  test("random agreement with the union-find reference") {
    val rng = new scala.util.Random(103)
    for (trial <- 0 until 4) {
      val n = 40
      val asg = (0L until n).map(i => i -> (i - (i % 4))).toMap // 4-clusters
      val must = (0 until 6).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(p => p._1 != p._2)
      // cannot pairs chosen to avoid transitive must contradictions:
      // use ids from disjoint ranges of the must graph when colliding
      val mergedRef = {
        val parent = mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        must.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        (x: Long) => find(x)
      }
      val cannot = (0 until 8).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2 && mergedRef(p._1) != mergedRef(p._2))
      assert(run(asg, must, cannot) == ref(asg, must, cannot), s"trial $trial")
    }
  }

  test("contradictions fail loudly") {
    val asg = Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
    val e1 = intercept[IllegalArgumentException] {
      run(asg, Seq((1L, 3L)), Seq((3L, 1L)))
    }
    assert(e1.getMessage.contains("mustLink AND cannotLink"))
    val e2 = intercept[IllegalArgumentException] {
      run(asg, Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L)))
    }
    assert(e2.getMessage.contains("transitively must-linked"))
  }
}
