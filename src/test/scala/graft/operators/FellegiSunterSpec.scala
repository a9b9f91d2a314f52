package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Fellegi-Sunter EM fit + scoring: parameter recovery on planted match
  * structure, determinism, and the posterior/lr contract. */
class FellegiSunterSpec extends SparkFunSuite {

  private val gs = Seq("g0", "g1", "g2")

  /** 3-field synthetic pattern population with planted structure: 10% are
    * matches agreeing on each field with p=0.95, the rest agree with p=0.1
    * per field (independent). Deterministic hash-derived draws. Three
    * fields because the 2-field model is under-identified (4 patterns =
    * 3 data dof vs 5 parameters) — the k >= 3 case is what EM is for. */
  private lazy val planted = {
    import spark.implicits._
    (1 to 4000).map { i =>
      val isMatch = i % 10 == 0
      def draw(salt: Int): Long = {
        val h = scala.util.hashing.MurmurHash3.productHash((i, salt)) & 0x7fffffff
        val p = h.toDouble / 0x7fffffff.toDouble
        if (isMatch) { if (p < 0.95) 1L else 0L } else { if (p < 0.1) 1L else 0L }
      }
      (i.toLong, draw(1), draw(2), draw(3))
    }.toDF("id", "g0", "g1", "g2")
  }

  test("fit recovers planted m >> u structure and a sane prior") {
    val model = FellegiSunter.fit(planted, gs, iters = 40)
    for (j <- gs.indices) {
      assert(model.m(j) > 0.8, s"m($j) = ${model.m(j)}")
      assert(model.u(j) < 0.2, s"u($j) = ${model.u(j)}")
      assert(model.m(j) > model.u(j))
    }
    assert(model.lambda > 0.03 && model.lambda < 0.3, s"lambda = ${model.lambda}")
  }

  test("fit is deterministic (bit-identical across runs and partitionings)") {
    val m1 = FellegiSunter.fit(planted, gs, iters = 15)
    val m2 = FellegiSunter.fit(planted.repartition(7), gs, iters = 15)
    assert(m1 == m2)
  }

  test("score: posterior orders patterns by agreement when m > u, and lr/(1+lr) = posterior") {
    val model = FellegiSunter.fit(planted, gs, iters = 40)
    val scored = FellegiSunter.score(planted, gs, model)
      .select(col("g0"), col("g1"), col("g2"), col("posterior"), col("lr"))
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getDouble(3), r.getDouble(4)))).toMap
    assert(scored((1L, 1L, 1L))._1 > scored((1L, 1L, 0L))._1)
    assert(scored((1L, 1L, 0L))._1 > scored((1L, 0L, 0L))._1)
    assert(scored((1L, 0L, 0L))._1 > scored((0L, 0L, 0L))._1)
    scored.values.foreach { case (post, lr) =>
      assert(post >= 0.0 && post <= 1.0)
      assert(math.abs(lr / (1.0 + lr) - post) < 1e-12)
    }
  }

  test("classify bands lr into link / possible / non_link") {
    import spark.implicits._
    val scored = Seq((1L, 5.0), (2L, 1.0), (3L, 0.5), (4L, 0.1), (5L, 0.01))
      .toDF("id", "lr")
    val got = FellegiSunter.classify(scored, upperLr = 1.0, lowerLr = 0.1)
      .select("id", "decision").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "link", 2L -> "link", 3L -> "possible",
      4L -> "non_link", 5L -> "non_link"))
    intercept[IllegalArgumentException](
      FellegiSunter.classify(scored, upperLr = 0.1, lowerLr = 1.0))
  }

  test("fitLevels recovers planted 3-level structure (3 fields: identifiable)") {
    import spark.implicits._
    // planted: matches concentrate at level 2, non-matches at level 0;
    // three fields because fewer leaves the model under-identified
    // (free params must not exceed pattern dof), like the binary case
    val df = (1 to 4000).map { i =>
      val isMatch = i % 10 == 0
      def draw(salt: Int): Long = {
        val h = scala.util.hashing.MurmurHash3.productHash((i, salt)) & 0x7fffffff
        val p = h.toDouble / 0x7fffffff.toDouble
        if (isMatch) { if (p < 0.8) 2L else if (p < 0.95) 1L else 0L }
        else { if (p < 0.8) 0L else if (p < 0.95) 1L else 2L }
      }
      (i.toLong, draw(1), draw(2), draw(3))
    }.toDF("id", "g0", "g1", "g2")
    val cols = Seq("g0", "g1", "g2")
    val model = FellegiSunter.fitLevels(df, cols, Seq(3, 3, 3), iters = 40)
    for (j <- 0 to 2) {
      assert(model.m(j)(2) > 0.6, s"m($j)(2) = ${model.m(j)(2)}")
      assert(model.u(j)(0) > 0.6, s"u($j)(0) = ${model.u(j)(0)}")
      assert(math.abs(model.m(j).sum - 1.0) < 1e-9)
      assert(math.abs(model.u(j).sum - 1.0) < 1e-9)
    }
    assert(model.lambda > 0.03 && model.lambda < 0.3)
    val scored = FellegiSunter.scoreLevels(df, cols, model)
      .select(col("g0"), col("g1"), col("g2"), col("posterior"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(scored((2L, 2L, 2L)) > scored((1L, 1L, 1L)))
    assert(scored((1L, 1L, 1L)) > scored((0L, 0L, 0L)))
    // determinism across partitionings
    assert(model == FellegiSunter.fitLevels(df.repartition(7), cols,
      Seq(3, 3, 3), iters = 40))
    intercept[IllegalArgumentException](
      FellegiSunter.fitLevels(df, cols, Seq(3, 3)))
    intercept[IllegalArgumentException](
      FellegiSunter.fitLevels(df, cols, Seq(3, 3, 1)))
  }

  test("term-frequency adjustment scales agreeing pairs by u/tf, leaves the rest") {
    import spark.implicits._
    // 4 records: value "x" appears 3/4 (common), "y" 1/4 (rare)
    val records = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("id", "v")
    val tf = FellegiSunter.termFrequencies(records, "v")
      .as[(String, Double)].collect().toMap
    assert(tf == Map("x" -> 0.75, "y" -> 0.25))
    val model = FellegiSunter.Model(0.5, IndexedSeq(0.9), IndexedSeq(0.5))
    val scored = Seq(
      (1L, 2L, 1L, "x", 2.0),   // agree on common value
      (1L, 4L, 1L, "y", 2.0),   // agree on rare value -> bigger boost
      (2L, 3L, 0L, "x", 0.5),   // disagree -> untouched
      (5L, 6L, 1L, "z", 2.0))   // agree on value missing from tf -> untouched
      .toDF("ka", "kb", "g0", "val_a", "lr")
    val got = FellegiSunter.tfAdjustLr(scored, model, 0, "g0", "val_a",
        FellegiSunter.termFrequencies(records, "v"))
      .select("ka", "kb", "lr_tf").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 2.0 * (0.5 / 0.75))
    assert(got((1L, 4L)) == 2.0 * (0.5 / 0.25))
    assert(got((2L, 3L)) == 0.5)
    assert(got((5L, 6L)) == 2.0)
    assert(got((1L, 4L)) > got((1L, 2L)))  // rare agreement outweighs common
    intercept[IllegalArgumentException](
      FellegiSunter.tfAdjustLr(scored, model, 5, "g0", "val_a", tfFrameOf(records)))
  }

  private def tfFrameOf(records: org.apache.spark.sql.DataFrame) =
    FellegiSunter.termFrequencies(records, "v")

  test("model save/load round-trips bit-exactly (binary and level models)") {
    val model = FellegiSunter.fit(planted, gs, iters = 15)
    val dir = java.nio.file.Files.createTempDirectory("fs_model_spec").toString
    FellegiSunter.saveModel(spark, model, dir)
    val back = FellegiSunter.loadModel(spark, dir)
    assert(back == model) // case-class equality over the exact doubles
    // scoring with the reloaded model is bit-identical to in-memory
    val a = FellegiSunter.score(planted, gs, model)
      .select("id", "posterior", "lr").collect().toSeq
    val b = FellegiSunter.score(planted, gs, back)
      .select("id", "posterior", "lr").collect().toSeq
    assert(a == b)
    // level model: reuse the planted 0/1 gammas as 2-level fields
    val lm = FellegiSunter.fitLevels(planted, gs, Seq(2, 2, 2), iters = 15)
    val dir2 = java.nio.file.Files.createTempDirectory("fs_lmodel_spec").toString
    FellegiSunter.saveLevelModel(spark, lm, dir2)
    assert(FellegiSunter.loadLevelModel(spark, dir2) == lm)
    // loading the wrong shape fails loudly, not silently
    intercept[IllegalArgumentException](FellegiSunter.loadLevelModel(spark, dir))
    intercept[IllegalArgumentException](FellegiSunter.loadModel(spark, dir2))
  }

  test("calibrate derives FS error-rate thresholds from the model") {
    // hand model: k=1, m=0.9, u=0.1, lambda=0.5 -> two patterns:
    //   g=1: pM=0.9 pU=0.1 lr=9 ; g=0: pM=0.1 pU=0.9 lr=1/9
    val m = FellegiSunter.Model(0.5, IndexedSeq(0.9), IndexedSeq(0.1))
    // mu=0.2 admits the lr=9 pattern (cumU 0.1 <= 0.2); lambdaErr=0.2
    // admits the lr=1/9 pattern (cumM 0.1 <= 0.2)
    val (up, lo) = FellegiSunter.calibrate(m, mu = 0.2, lambdaErr = 0.2)
    // expectations mirror the kernel's exact arithmetic: disagreement
    // probabilities are computed as 1.0 - p (0.1 written literally is a
    // DIFFERENT double than 1.0 - 0.9)
    assert(up == (0.5 * 0.9) / ((1.0 - 0.5) * 0.1))
    assert(lo == (0.5 * (1.0 - 0.9)) / ((1.0 - 0.5) * 0.9))
    // tighter targets admit nothing: empty bands, not wrong bands
    val (up2, lo2) = FellegiSunter.calibrate(m, mu = 0.05, lambdaErr = 0.05)
    assert(up2.isPosInfinity && lo2 == 0.0)
    // fitted-model path: thresholds are monotone in the targets
    val fitted = FellegiSunter.fit(planted, gs, iters = 15)
    val (uA, lA) = FellegiSunter.calibrate(fitted, mu = 0.01, lambdaErr = 0.05)
    val (uB, lB) = FellegiSunter.calibrate(fitted, mu = 0.10, lambdaErr = 0.20)
    assert(uB <= uA) // looser mu -> link region widens (threshold drops)
    assert(lB >= lA) // looser lambda -> non-link region widens
    intercept[IllegalArgumentException](FellegiSunter.calibrate(m, 0.0, 0.1))
    intercept[IllegalArgumentException](FellegiSunter.calibrate(m, 0.1, 1.0))
  }

  test("score treats a NULL gamma as evidence-free (factor 1 both sides)") {
    import spark.implicits._
    val m = FellegiSunter.Model(0.2, IndexedSeq(0.9, 0.8), IndexedSeq(0.1, 0.3))
    val rows = Seq(
      (1L, Some(1L), Some(1L)),
      (2L, Some(1L), None),      // g1 unobserved
      (3L, Option.empty[Long], Option.empty[Long])) // nothing observed
      .toDF("id", "g0", "g1")
    val got = FellegiSunter.score(rows, Seq("g0", "g1"), m)
      .orderBy("id").collect()
    def lr(w: Double, v: Double) = w / v
    assert(got(0).getAs[Double]("lr") == lr(0.2 * 0.9 * 0.8, 0.8 * 0.1 * 0.3))
    // missing g1 drops its factor entirely
    assert(got(1).getAs[Double]("lr") == lr(0.2 * 0.9, 0.8 * 0.1))
    // nothing observed -> prior odds
    assert(got(2).getAs[Double]("lr") == lr(0.2, 0.8))
    assert(got(2).getAs[Double]("posterior") == 0.2 / (0.2 + 0.8))
  }

  test("uncertaintySample picks the k pairs nearest posterior 1/2, deterministically") {
    import spark.implicits._
    val model = FellegiSunter.fit(planted, gs, iters = 15)
    val scored = FellegiSunter.score(planted, gs, model)
      .withColumn("ka", col("id")).withColumn("kb", col("id"))
    val got = FellegiSunter.uncertaintySample(scored, k = 50)
    val rows = got.collect()
    assert(rows.length == 50)
    // margin column is |posterior - 1/2| and the cutoff is exact: every
    // selected margin <= every rejected margin (ties broken by id)
    rows.foreach { r =>
      assert(r.getAs[Double]("margin") ==
        math.abs(r.getAs[Double]("posterior") - 0.5))
    }
    val maxSel = rows.map(_.getAs[Double]("margin")).max
    val all = scored.withColumn("margin", abs(col("posterior") - 0.5))
      .select("margin").as[Double].collect().sorted
    assert(maxSel == all(49))
    // deterministic across partitionings
    val again = FellegiSunter.uncertaintySample(scored.repartition(13), k = 50)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == rows.map(_.getAs[Long]("id")).toSet)
    // plans as a bounded top-k, not a global sort or window
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    intercept[IllegalArgumentException](
      FellegiSunter.uncertaintySample(scored, k = 0))
  }

  test("fit validates gamma arity and iteration count") {
    intercept[IllegalArgumentException](FellegiSunter.fit(planted, Nil))
    intercept[IllegalArgumentException](
      FellegiSunter.fit(planted, (0 to 16).map(i => s"g$i")))
    intercept[IllegalArgumentException](FellegiSunter.fit(planted, gs, iters = 0))
    intercept[IllegalArgumentException](
      FellegiSunter.score(planted, gs, FellegiSunter.Model(0.5, IndexedSeq(0.9), IndexedSeq(0.1))))
  }

  test("waterfall: prior_odds times per-field factors reproduces lr exactly on every pair") {
    val model = FellegiSunter.fit(planted, gs, iters = 15)
    val scored = FellegiSunter.score(planted, gs, model)
    val wf = FellegiSunter.waterfall(scored, gs, model)
    val rows = wf.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rebuilt = gs.foldLeft(r.getAs[Double]("prior_odds")) { (acc, g) =>
        acc * r.getAs[Double](s"bf_$g")
      }
      val lr = r.getAs[Double]("lr")
      // same factors, possibly different multiply order -> tiny tolerance
      assert(math.abs(rebuilt - lr) <= 1e-12 * math.max(1.0, lr.abs),
        s"lr=$lr rebuilt=$rebuilt at $r")
    }
    // null gamma -> factor exactly 1.0
    val withNull = planted.withColumn("g1",
      when(col("id") % 3 === 0, col("g1")))
    val wfn = FellegiSunter.waterfall(withNull, gs, model)
    assert(wfn.where(col("g1").isNull && col("bf_g1") =!= 1.0).count() == 0)
    intercept[IllegalArgumentException](
      FellegiSunter.waterfall(planted, gs,
        FellegiSunter.Model(0.5, IndexedSeq(0.9), IndexedSeq(0.1))))
  }

  test("randomPairs: deterministic hash sample, all C(s,2) pairs, id_a < id_b") {
    import spark.implicits._
    val recs = (1 to 200).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val rp = FellegiSunter.randomPairs(recs, "id", rate = 0.3, seed = 5L)
    val got = rp.collect()
    val sampled = got.flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).distinct.sorted
    val s = sampled.length
    assert(got.length == s * (s - 1) / 2, s"expected C($s,2), got ${got.length}")
    assert(got.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(got.forall(r => r.getAs[String]("name_a") ==
      s"name${r.getAs[Long]("id_a")}"))
    // partition-independent replay
    val again = FellegiSunter.randomPairs(recs.repartition(13), "id", 0.3, 5L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).sorted
    assert(again.toSeq ==
      got.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).sorted.toSeq)
    intercept[IllegalArgumentException](
      FellegiSunter.randomPairs(recs, "id", rate = 0.0))
  }

  test("estimateU: per-field agreement rate, nulls excluded, exact count ratio") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 0L, Some(1L)), (1L, 1L, Some(0L)), (0L, 1L, None),
      (1L, 0L, Some(1L)), (0L, 0L, Some(0L))
    ).toDF("g0", "g1", "g2")
    val u = FellegiSunter.estimateU(pairs, Seq("g0", "g1", "g2"))
    assert(u == IndexedSeq(3.0 / 5.0, 2.0 / 5.0, 2.0 / 4.0))
    val frame = FellegiSunter.estimateUFrame(spark, pairs, Seq("g2")).collect()
    assert(frame.length == 1)
    assert(frame(0).getAs[String]("field") == "g2" &&
      frame(0).getAs[Long]("n_obs") == 4L &&
      frame(0).getAs[Long]("n_agree") == 2L &&
      frame(0).getAs[Double]("u") == 0.5)
    // all-null column raises loudly instead of dividing by zero
    val allNull = pairs.withColumn("g3", lit(null).cast("long"))
    intercept[IllegalArgumentException](
      FellegiSunter.estimateU(allNull, Seq("g3")))
  }

  test("estimateM: agreement rates among labeled matches; supervised Model composes") {
    import spark.implicits._
    val matches = Seq(
      (1L, 1L, Some(1L)), (1L, 0L, Some(1L)), (1L, 1L, None), (0L, 1L, Some(0L))
    ).toDF("g0", "g1", "g2")
    val m = FellegiSunter.estimateM(matches, Seq("g0", "g1", "g2"))
    assert(m == IndexedSeq(3.0 / 4.0, 3.0 / 4.0, 2.0 / 3.0))
    val frame = FellegiSunter.estimateMFrame(spark, matches, Seq("g0")).collect()
    assert(frame(0).getAs[String]("field") == "g0" &&
      frame(0).getAs[Long]("n_obs") == 4L &&
      frame(0).getAs[Long]("n_agree") == 3L &&
      frame(0).getAs[Double]("m") == 0.75)
    // the EM-free supervised path: Model(λ, m, u) from the 3 estimators
    // scores like any fitted model
    val u = IndexedSeq(0.2, 0.3, 0.4)
    val model = FellegiSunter.Model(0.01, m, u)
    val scored = FellegiSunter.score(matches.na.fill(0L),
      Seq("g0", "g1", "g2"), model)
    assert(scored.columns.contains("posterior") && scored.count() == 4)
  }

  test("histogramDrift: bin-joined counts, exact shares, null ratio on empty bins") {
    import spark.implicits._
    val a = Seq(0.5, 0.5, 3.0, 3.0, 3.0, 300.0).toDF("lr")
    val b = Seq(0.5, 3.0, 3.0, 5000.0).toDF("lr")
    val drift = FellegiSunter.histogramDrift(
      FellegiSunter.matchWeightHistogram(a, minExp = -2, maxExp = 4),
      FellegiSunter.matchWeightHistogram(b, minExp = -2, maxExp = 4))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(drift.size == 8) // bins -3..4 (both open tails included)
    val bin1 = drift(1L) // lr in [2,4): 3 in a, 2 in b
    assert(bin1.getAs[Long]("n_a") == 3L && bin1.getAs[Long]("n_b") == 2L)
    assert(bin1.getAs[Double]("share_a") == 0.5 &&
      bin1.getAs[Double]("share_b") == 0.5)
    assert(bin1.getAs[Double]("share_ratio") == 1.0)
    // 300 lands in a's open upper tail; 5000 in b's — ratio defined there
    val tail = drift(4L)
    assert(tail.getAs[Long]("n_a") == 1L && tail.getAs[Long]("n_b") == 1L &&
      tail.getAs[Double]("share_ratio") == (1.0 / 6.0) / (1.0 / 4.0))
    // bin empty on one side → NULL ratio, zero count, zero share
    val empty = drift(2L) // lr in [4,8): none in either
    assert(empty.getAs[Long]("n_a") == 0L &&
      empty.isNullAt(empty.fieldIndex("share_ratio")))
  }

  test("patternTable: one row per pattern, counts sum to pairs, scores match score()") {
    val model = FellegiSunter.fit(planted, gs, iters = 15)
    val pt = FellegiSunter.patternTable(planted, gs, model).collect()
    assert(pt.length <= 8 && pt.nonEmpty)
    assert(pt.map(_.getAs[Long]("n_pairs")).sum == planted.count())
    // each pattern row scores identically to a pair with those gammas
    val scored = FellegiSunter.score(planted, gs, model)
      .select(col("g0"), col("g1"), col("g2"), col("posterior"), col("lr"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    pt.foreach { r =>
      val k = (r.getAs[Long]("g0"), r.getAs[Long]("g1"), r.getAs[Long]("g2"))
      assert(scored(k) ==
        (r.getAs[Double]("posterior"), r.getAs[Double]("lr")), s"at $k")
    }
  }

  test("fitFromCounts: unioned per-batch counts refit bit-identically") {
    val model = FellegiSunter.fit(planted, gs, iters = 15)
    // three disjoint batches, counts unioned with repeated patterns
    val parts = (0 to 2).map(i =>
      FellegiSunter.patternCounts(
        planted.where(pmod(col("id"), lit(3)) === i), gs))
    val merged = parts.reduce(_ unionByName _)
    val inc = FellegiSunter.fitFromCounts(merged, gs, iters = 15)
    assert(inc == model) // case-class equality over IEEE doubles: bit-exact
    // and a count frame with a custom count column name works
    val renamed = FellegiSunter.patternCounts(planted, gs)
      .withColumnRenamed("n_pairs", "cnt")
    assert(FellegiSunter.fitFromCounts(renamed, gs, countCol = "cnt",
      iters = 15) == model)
  }

  test("patternExamples: k per pattern, pinned order, short patterns kept") {
    import spark.implicits._
    // pattern (1,0): pairs (5,6),(1,2),(3,4); pattern (0,0): one pair
    val pairs = Seq(
      (5L, 6L, 1L, 0L), (1L, 2L, 1L, 0L), (3L, 4L, 1L, 0L),
      (9L, 10L, 0L, 0L)).toDF("ka", "kb", "g0", "g1")
    val got = FellegiSunter.patternExamples(pairs, Seq("g0", "g1"), k = 2)
      .orderBy("g0", "example_rank")
      .select("g0", "g1", "ka", "kb", "example_rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    // (0,0) has fewer than k pairs — it keeps what it has; (1,0) keeps
    // the two smallest (ka, kb), ranked in that order
    assert(got == Seq((0L, 0L, 9L, 10L, 1),
      (1L, 0L, 1L, 2L, 1), (1L, 0L, 3L, 4L, 2)))
    intercept[IllegalArgumentException](
      FellegiSunter.patternExamples(pairs, Seq("g0"), k = 0))
  }

  test("patternExamples plan bounds hot patterns map-side (WindowGroupLimit)") {
    import spark.implicits._
    val pairs = (1L to 400L).map(i => (i, i + 1000L, i % 2, 0L))
      .toDF("ka", "kb", "g0", "g1").repartition(4)
    val q = FellegiSunter.patternExamples(pairs, Seq("g0", "g1"), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no partial group limit in:\n$plan")
  }

  test("estimateLambdaFrame: rule pairs counted per key, null keys out, pinned division") {
    import spark.implicits._
    // keys: a×3 (3 pairs), b×2 (1 pair), one null → 4 rule pairs over
    // n = 6 records; recall 0.5 → λ = 4 / (0.5 · 15)
    val recs = Seq(Some("a"), Some("a"), Some("a"), Some("b"), Some("b"),
      None).toDF("k")
    val got = FellegiSunter.estimateLambdaFrame(spark, recs, col("k"), 0.5)
      .collect().head
    assert(got.getAs[Long]("n_records") == 6L)
    assert(got.getAs[Long]("n_rule_pairs") == 4L)
    assert(got.getAs[Double]("lambda_est") == 4.0 / (0.5 * (6.0 * 5.0 / 2.0)))
    // no key collisions at all → λ = 0, not an error
    val uniq = Seq("x", "y", "z").toDF("k")
    assert(FellegiSunter.estimateLambdaFrame(spark, uniq, col("k"), 1.0)
      .collect().head.getAs[Double]("lambda_est") == 0.0)
    intercept[IllegalArgumentException](
      FellegiSunter.estimateLambdaFrame(spark, recs, col("k"), 0.0))
    intercept[IllegalArgumentException](
      FellegiSunter.estimateLambdaFrame(spark, Seq("x").toDF("k"), col("k"), 1.0))
  }
}
