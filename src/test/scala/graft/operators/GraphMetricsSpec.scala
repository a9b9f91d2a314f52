package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Splink-style graph QA (node degrees, cluster density/centralisation)
  * and the unlinkables curve, on hand-computed fixtures plus brute-force
  * random cross-checks and the edge-normalization/null contracts. */
class GraphMetricsSpec extends SparkFunSuite {

  import spark.implicits._

  // clusters: A = {1,2,3,4}, B = {5,6}, C = {7} (singleton)
  private lazy val asg = Seq(
    (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
    (5L, "B"), (6L, "B"), (7L, "C")).toDF("id", "cluster_id")

  // intra-A edges (1,2),(2,3),(3,4),(1,3); intra-B edge (5,6);
  // noise that must be normalized away: duplicate (1,2), reversed (3,2),
  // self-loop (4,4), and a CROSS-cluster edge (4,5).
  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 6L),
    (1L, 2L), (3L, 2L), (4L, 4L), (4L, 5L)).toDF("url_a", "url_b")

  test("nodeDegrees: normalization, cross-cluster exclusion, zero rows") {
    val got = Evaluation.nodeDegrees(asg, edges)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "A", 2L), (2L, "A", 2L), (3L, "A", 3L),
      (4L, "A", 1L), (5L, "B", 1L), (6L, "B", 1L), (7L, "C", 0L)))
  }

  test("graphMetrics: density/centralisation and their NULL floors") {
    val rows = Evaluation.graphMetrics(asg, edges)
      .orderBy("cluster_id").collect()
    assert(rows.length == 3)
    // A: n=4, E=4, Σdeg=8, max=3
    assert(rows(0).getLong(1) == 4L && rows(0).getLong(2) == 4L &&
      rows(0).getLong(3) == 3L)
    assert(rows(0).getDouble(4) == 8.0 / (4.0 * 3.0))
    assert(rows(0).getDouble(5) == (4.0 * 3.0 - 8.0) / (3.0 * 2.0))
    // B: n=2, E=1 — a verified pair is a clique of 2; centralisation
    // undefined below n=3
    assert(rows(1).getLong(1) == 2L && rows(1).getLong(2) == 1L)
    assert(rows(1).getDouble(4) == 1.0 && rows(1).isNullAt(5))
    // C: singleton — no pair slots, both ratios NULL, row still present
    assert(rows(2).getLong(1) == 1L && rows(2).getLong(2) == 0L &&
      rows(2).getLong(3) == 0L)
    assert(rows(2).isNullAt(4) && rows(2).isNullAt(5))
  }

  test("graphMetrics: edgeless cluster set — all zero/NULL, no absences") {
    val none = Seq.empty[(Long, Long)].toDF("url_a", "url_b")
    val rows = Evaluation.graphMetrics(asg, none).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("nodeDegrees matches brute force on a random graph") {
    val rng = new scala.util.Random(7)
    val n = 40
    val asgSeq = (1 to n).map(i => (i.toLong, s"c${i % 4}"))
    val edgeSeq = Seq.fill(120)((rng.nextInt(n) + 1L, rng.nextInt(n) + 1L))
    // reference: canonical intra-cluster edge set, then count partners
    val cluster = asgSeq.toMap
    val canon = edgeSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b && cluster(a) == cluster(b) }
      .distinct
    val refDeg = (1 to n).map { i =>
      (i.toLong, canon.count { case (a, b) => a == i || b == i }.toLong)
    }.toMap
    val got = Evaluation.nodeDegrees(
        asgSeq.toDF("id", "cluster_id").repartition(5),
        edgeSeq.toDF("url_a", "url_b").repartition(7))
      .select("id", "degree").as[(Long, Long)].collect().toMap
    assert(got == refDeg)
    // and Σdeg = 2E per cluster, folded through graphMetrics
    val gm = Evaluation.graphMetrics(asgSeq.toDF("id", "cluster_id"),
        edgeSeq.toDF("url_a", "url_b"))
      .select("cluster_id", "n_edges").as[(String, Long)].collect().toMap
    val refE = canon.groupBy(e => cluster(e._1)).map { case (c, es) =>
      (c, es.size.toLong) }
    assert(gm == refE)
  }

  test("unlinkables: hand-computed curve incl. the no-pair NULL path") {
    val recs = (1L to 5L).toDF("url")
    val scored = Seq((1L, 2L, 0.9), (2L, 3L, 0.5))
      .toDF("url_a", "url_b", "score")
    val got = Linkage.unlinkables(recs, scored, Seq(0.4, 0.6, 0.95))
      .orderBy("theta").as[(Double, Long, Long, Double)].collect().toSeq
    // best: 1→0.9, 2→0.9, 3→0.5, 4/5→no evidence (count everywhere)
    assert(got == Seq((0.4, 5L, 2L, 0.4), (0.6, 5L, 3L, 0.6),
      (0.95, 5L, 5L, 1.0)))
  }

  test("unlinkables: empty pair frame strands every record at every θ") {
    val recs = (1L to 4L).toDF("url")
    val scored = Seq.empty[(Long, Long, Double)]
      .toDF("url_a", "url_b", "score")
    val got = Linkage.unlinkables(recs, scored, Seq(0.1, 0.9))
      .orderBy("theta").as[(Double, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0.1, 4L, 4L, 1.0), (0.9, 4L, 4L, 1.0)))
  }

  test("unlinkables: boundary is strict (best == θ is linkable)") {
    val recs = (1L to 2L).toDF("url")
    val scored = Seq((1L, 2L, 0.7)).toDF("url_a", "url_b", "score")
    val got = Linkage.unlinkables(recs, scored, Seq(0.7))
      .as[(Double, Long, Long, Double)].head()
    assert(got == ((0.7, 2L, 0L, 0.0)))
  }
}
