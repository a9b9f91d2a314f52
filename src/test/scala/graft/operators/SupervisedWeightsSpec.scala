package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Supervised match-weight learning: rational-link GD over (pattern,
  * label) sufficient cells, bit-reproducible fit + literal-folded
  * scoring. */
class SupervisedWeightsSpec extends SparkFunSuite {

  /** Independent scalar reference: plain GD over the raw (not
    * cell-aggregated) rows in the SAME pinned cell order. */
  private def refFit(rows: Seq[(Array[Long], Long)], eta: Double,
      iters: Int): Array[Double] = {
    val k = rows.head._1.length
    val cells = rows.map { case (gs, t) => (gs.toSeq, t) }
      .groupBy(identity).view.mapValues(_.size.toDouble).toSeq
      .map { case ((gs, t), n) => (gs, t, n) }
      .sortBy { case (gs, t, _) => (gs.mkString, t) }
    val tot = cells.map(_._3).sum
    val w = Array.fill(k + 1)(0.0)
    for (_ <- 1 to iters) {
      val grad = Array.fill(k + 1)(0.0)
      for ((gs, t, n) <- cells) {
        var z = w(0)
        for (j <- 0 until k) if (gs(j) == 1L) z += w(j + 1) else z += 0.0
        val p = 0.5 + 0.5 * (z / (1.0 + math.abs(z)))
        grad(0) += n * (p - t.toDouble)
        for (j <- 0 until k)
          grad(j + 1) += (if (gs(j) == 1L) n * (p - t.toDouble) else 0.0)
      }
      for (j <- 0 to k) w(j) = w(j) - eta * (grad(j) / tot)
    }
    w
  }

  private def toDf(rows: Seq[(Array[Long], Long)]) = {
    import spark.implicits._
    rows.map { case (gs, t) => (gs(0), gs(1), gs(2), t) }
      .toDF("g0", "g1", "g2", "t")
  }

  private def synth(seed: Int, n: Int): Seq[(Array[Long], Long)] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val t = if (rng.nextInt(4) == 0) 1L else 0L
      // gammas correlate with the label but keep noise
      val gs = Array.tabulate(3) { _ =>
        val agree = if (t == 1L) rng.nextInt(10) < 8 else rng.nextInt(10) < 2
        if (agree) 1L else 0L
      }
      (gs, t)
    }
  }

  test("fit matches the scalar reference bit-for-bit") {
    val rows = synth(13, 2000)
    val m = SupervisedWeights.fit(toDf(rows), Seq("g0", "g1", "g2"), "t",
      eta = 0.5, iters = 20)
    val ref = refFit(rows, 0.5, 20)
    assert(m.bias == ref(0))
    assert(m.weights.toSeq == ref.drop(1).toSeq)
  }

  test("fit is partitioning-independent") {
    val rows = synth(7, 1500)
    val a = SupervisedWeights.fit(toDf(rows).repartition(13),
      Seq("g0", "g1", "g2"), "t", eta = 0.3, iters = 15)
    val b = SupervisedWeights.fit(toDf(rows).repartition(2),
      Seq("g0", "g1", "g2"), "t", eta = 0.3, iters = 15)
    assert(a.bias == b.bias && a.weights.toSeq == b.weights.toSeq)
  }

  test("fit separates an easy signal and score classifies it") {
    import spark.implicits._
    val rows = synth(99, 4000)
    val m = SupervisedWeights.fit(toDf(rows), Seq("g0", "g1", "g2"), "t",
      eta = 0.5, iters = 60)
    // all-agree patterns should pull positive weight on every gamma
    assert(m.weights.forall(_ > 0.0))
    val scored = SupervisedWeights.score(toDf(rows), Seq("g0", "g1", "g2"), m)
    val acc = scored
      .select(when((col("p") >= 0.5) === (col("t") === 1), 1.0)
        .otherwise(0.0).as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    // ~0.885 is the plateau for this noise level (gammas flip with
    // p = 0.2 against a 25% prior); the bar checks separation, not Bayes
    assert(acc > 0.85, s"train accuracy $acc")
    // decision column is exactly the 0.5 cut
    val mismatch = scored.where(
      (col("p") >= 0.5 && col("decision") =!= "link") ||
        (col("p") < 0.5 && col("decision") =!= "non_link")).count()
    assert(mismatch == 0L)
  }

  test("softsign column matches the scalar on both sides of zero") {
    import spark.implicits._
    val zs = Seq(-3.7, -1.0, -0.25, 0.0, 0.25, 1.0, 3.7)
    val got = zs.toDF("z")
      .select(SupervisedWeights.softsignCol(col("z")).as("p"))
      .as[Double].collect().toSeq
    assert(got == zs.map(SupervisedWeights.softsign))
  }

  test("null or non-binary gammas/labels fail loudly") {
    import spark.implicits._
    val nullG = Seq((Some(1L), 0L, 1L, 0L), (None, 1L, 0L, 1L))
      .toDF("g0", "g1", "g2", "t")
    val e1 = intercept[IllegalArgumentException] {
      SupervisedWeights.fit(nullG, Seq("g0", "g1", "g2"), "t")
    }
    assert(e1.getMessage.contains("g0"))
    val badT = Seq((1L, 0L, 1L, 2L)).toDF("g0", "g1", "g2", "t")
    val e2 = intercept[IllegalArgumentException] {
      SupervisedWeights.fit(badT, Seq("g0", "g1", "g2"), "t")
    }
    assert(e2.getMessage.contains("0/1"))
  }

  test("a high-cardinality column passed as a gamma fails before collect") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i % 2, 1L % 2, i % 2))
      .toDF("g0", "g1", "g2", "t") // g0 continuous: 500 distinct cells
    val e = intercept[IllegalArgumentException] {
      SupervisedWeights.fit(df, Seq("g0", "g1", "g2"), "t")
    }
    assert(e.getMessage.contains("cells"))
  }

  test("weightsFrame exposes the literal weights") {
    val rows = synth(5, 800)
    val m = SupervisedWeights.fit(toDf(rows), Seq("g0", "g1", "g2"), "t")
    val r = SupervisedWeights.weightsFrame(spark, Seq("g0", "g1", "g2"), m)
      .head()
    assert(r.getAs[Double]("bias") == m.bias)
    assert(r.getAs[Double]("w_g1") == m.weights(1))
  }
}
