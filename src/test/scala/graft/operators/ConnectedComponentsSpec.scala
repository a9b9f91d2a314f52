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

  test("round count stays O(log n) on chains (the web-scale shape)") {
    import spark.implicits._
    // force the distributed loop: this test is ABOUT the round telemetry,
    // which the bounded driver finish (correctly) short-circuits
    spark.conf.set("graft.cc.driverFinishEdges", "0")
    try {
    // a diameter-n chain is the adversarial input: label propagation would
    // need n rounds; large-star/small-star must stay logarithmic
    for (n <- Seq(64, 256)) {
      val edges = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("a", "b")
      val r = ConnectedComponents.runWithStats(edges)
      assert(r.assignment.agg(max(col("component"))).head().getLong(0) == 0L)
      val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
      assert(r.iterations <= bound,
        s"chain n=$n took ${r.iterations} rounds (> $bound = 2·log2 n)")
      // convergence telemetry: one edge count per round, final two equal
      // (the convergence signature), and maxIterFor covers the run
      assert(r.roundEdges.length == r.iterations)
      assert(r.roundEdges.takeRight(2).distinct.length == 1)
      assert(ConnectedComponents.maxIterFor(n.toLong) >= r.iterations)
    }
    } finally spark.conf.unset("graft.cc.driverFinishEdges")
  }

  test("driver finish (round-0 and mid-loop) equals the distributed loop") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val edges = (Seq.fill(400)((rng.nextInt(250).toLong, rng.nextInt(250).toLong))
      ++ (300L until 363L).map(i => (i, i + 1))) // a chain tail for rounds
      .filter(e => e._1 != e._2)
    val want = unionFind(edges)
    def runWithCap(cap: Long): (Map[Long, Long], Int) = {
      spark.conf.set("graft.cc.driverFinishEdges", cap.toString)
      try {
        val r = ConnectedComponents.runWithStats(edges.toDF("a", "b"))
        (r.assignment.collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap,
          r.iterations)
      } finally spark.conf.unset("graft.cc.driverFinishEdges")
    }
    val (dist, itersDist) = runWithCap(0L) // pure distributed
    val (immediate, iters0) = runWithCap(1000000L) // finishes at round 0
    // a cap below the initial frontier but above the shrunk one → the
    // loop runs distributed rounds, then the MID-LOOP finish fires
    val (hybrid, itersH) = runWithCap(edges.distinct.size.toLong / 2)
    assert(dist == want && immediate == want && hybrid == want)
    assert(iters0 == 0 && itersDist > 0)
    assert(itersH > 0 && itersH <= itersDist,
      s"expected a mid-loop finish, got $itersH vs distributed $itersDist")
  }

  test("reliable checkpoint mode (parquet rounds) returns identical clusters") {
    import spark.implicits._
    // force the distributed loop so the parquet round dirs actually land
    spark.conf.set("graft.cc.driverFinishEdges", "0")
    try {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(200)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val local = cc(edges)
    val reliable = ConnectedComponents
      .run(edges.toDF("a", "b"), checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
    // and the rounds actually landed on durable storage
    val rounds = new java.io.File(dir).list().count(_.startsWith("cc_round_"))
    assert(rounds >= 2, s"expected parquet round dirs, found $rounds")

    // conf-driven spelling (what spark-submit --conf reaches)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-cc-ckpt2").toString
    spark.conf.set("spark.graft.cc.checkpointDir", dir2)
    try {
      val viaConf = ConnectedComponents.run(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaConf == local)
      assert(new java.io.File(dir2).list().exists(_.startsWith("cc_round_")))
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
    } finally spark.conf.unset("graft.cc.driverFinishEdges")
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

  private def incr(base: Seq[(Long, Long)],
      batch: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val asg = ConnectedComponents.run(base.toDF("a", "b"))
    ConnectedComponents.addEdges(asg, batch.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("addEdges: incremental equals full re-run on chains/stars/merges") {
    // chain extended at the tail, and bridged to a star
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L))
    val batch = Seq((3L, 4L), (4L, 10L))
    assert(incr(base, batch) == unionFind(base ++ batch))
    // batch that merges many existing components through one new node
    val base2 = Seq((1L, 2L), (5L, 6L), (8L, 9L))
    val batch2 = Seq((100L, 2L), (100L, 6L), (100L, 9L))
    assert(incr(base2, batch2) == unionFind(base2 ++ batch2))
    // batch entirely inside one existing component: nothing moves
    val batch3 = Seq((1L, 3L))
    val base3 = Seq((1L, 2L), (2L, 3L))
    assert(incr(base3, batch3) == unionFind(base3 ++ batch3))
    // batch of brand-new nodes only (disjoint new component + a self-loop)
    val batch4 = Seq((50L, 51L), (60L, 60L))
    assert(incr(base3, batch4) ==
      unionFind(base3 ++ batch4) ++ Map(60L -> 60L))
    // root relabeling: new edge connects two components via their ROOTS
    val base5 = Seq((2L, 7L), (1L, 9L))
    val batch5 = Seq((2L, 1L))
    assert(incr(base5, batch5) == unionFind(base5 ++ batch5))
  }

  /** Brute-force synchronous LPA with the operator's pinned rules:
    * neighbor-majority, min-label ties, self excluded, isolated keep. */
  private def lpaRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = sym.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    var lbl = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = lbl.map { case (n, l) =>
        val votes = nbrs(n).map(lbl)
        if (votes.isEmpty) n -> l
        else {
          val byLabel = votes.groupBy(identity).view.mapValues(_.size)
          val best = byLabel.toSeq.minBy { case (v, c) => (-c, v) }._1
          n -> best
        }
      }
    }
    lbl
  }

  test("labelPropagation: barbell splits at the bridge where CC merges") {
    import spark.implicits._
    // two triangles joined by one bridge edge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = ConnectedComponents.labelPropagation(edges.toDF("a", "b"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lpaRef(edges, 3))
    // the two triangles carry different labels (community split) even
    // though CC puts all six nodes in one component
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L))
    assert(ConnectedComponents.run(edges.toDF("a", "b"))
      .select("component").distinct().count() == 1L)
  }

  test("labelPropagation: matches brute force on random graphs, all budgets") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val edges = Seq.fill(120)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    for (r <- Seq(1, 2, 4)) {
      val got = ConnectedComponents
        .labelPropagation(edges.toDF("a", "b"), r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == lpaRef(edges, r), s"rounds=$r")
    }
    // partitioning independence + self-loop-only nodes excluded
    val withLoop = edges ++ Seq((99L, 99L))
    val a = ConnectedComponents
      .labelPropagation(withLoop.toDF("a", "b").repartition(7), 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == lpaRef(edges, 2) && !a.contains(99L))
    intercept[IllegalArgumentException](
      ConnectedComponents.labelPropagation(edges.toDF("a", "b"), 0))
  }

  test("addEdges: random incremental batches match full union-find") {
    val rng = new scala.util.Random(7)
    val all = Seq.fill(300)((rng.nextInt(150).toLong, rng.nextInt(150).toLong))
      .filter(e => e._1 != e._2)
    val (base, batch) = all.splitAt(200)
    assert(incr(base, batch) == unionFind(all))
    // chained increments: apply the batch in two waves
    import spark.implicits._
    val (w1, w2) = batch.splitAt(50)
    val asg0 = ConnectedComponents.run(base.toDF("a", "b"))
    val asg1 = ConnectedComponents.addEdges(asg0, w1.toDF("a", "b"))
    val got = ConnectedComponents.addEdges(asg1, w2.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(all))
  }
}
