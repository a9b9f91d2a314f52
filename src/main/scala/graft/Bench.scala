package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR plus
  * the headline record-linkage throughput (candidate-pairs-scored/sec on a
  * generated pages corpus). Prints exactly ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "pairs_scored":N,"pairs_scored_per_sec":N,"corpus_pages":N}
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failed query must be distinguishable from a slow one: record the
    // error per query and report it in the JSON (never silently time a -1)
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failures(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: pairs scored/sec through blocking + composite kernel scoring
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "40000").toInt
    val (pages, _) = sources.PagesCorpus.generate(spark, nPages, 42L, cpus.toInt)
    val pagesDF = pages.toDF().cache()
    pagesDF.count() // materialize corpus outside the timed section
    val ex = operators.Linkage.extract(pagesDF).cache()
    ex.count()
    val t0 = System.nanoTime()
    val keys = operators.Linkage.candidateKeys(ex)
    val pairs = operators.Linkage.candidatePairs(keys)
    val scored = operators.Linkage.score(pairs, ex)
    val nScored = scored.count()
    val scoreSec = (System.nanoTime() - t0) / 1e9
    val pairsPerSec = nScored / scoreSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fails = failures.map { case (k, v) => s"${JsonStr(k)}:${JsonStr(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + scoreSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"sf":"$sfDir","pairs_scored":$nScored,"pairs_scored_sec":$scoreSec,"pairs_scored_per_sec":$pairsPerSec,"corpus_pages":$nPages,"cpus":$cpus}""")
    spark.stop()
  }
}

/** Scaling-evidence runner (BASELINE.md criterion: throughput efficiency
  * ≥ 0.8 from N → 4N parallelism, evidenced in-sandbox by running the SAME
  * scoring job on the SAME input at local[N] and local[4N]).
  *
  * The timed section is the pairwise-scoring core — all seven strsim
  * kernels over materialized candidate pairs (cached columnar, so the
  * measurement is kernel-compute-bound, the regime a 1000-executor run at
  * 10^12 pairs actually lives in). Candidate generation (shuffle-bound) is
  * measured separately end-to-end in [[Bench]]; at sandbox data sizes the
  * shuffles are fixed-overhead-dominated and say nothing about 100 TB
  * behavior. `repeat` multiplies scored pairs via an exploded sequence
  * (no extra cache memory) to make the timed region long enough to
  * measure cleanly.
  *
  * This sandbox VM shares its host, so effective CPU drifts over tens of
  * minutes (CPU steal) — two measurements taken far apart are NOT
  * comparable. The bench therefore splits into a one-time PREPARE step
  * (generate corpus, block, materialize candidate pairs to parquet) and a
  * fast MEASURE step (~seconds of setup), so N and 4N runs can be
  * interleaved back-to-back and compared within the same drift window
  * (tools/scaling_curve.sh drives the interleaving and takes per-level
  * bests).
  *
  * Usage:
  *   runMain graft.ScalingBench prepare <pairsDir> [nPages]
  *   runMain graft.ScalingBench <cpus> <pairsDir> [repeat]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions._
    if (args.headOption.contains("prepare")) {
      val pairsDir = args(1)
      val nPages = args.lift(2).getOrElse("250000").toInt
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val (pages, _) = sources.PagesCorpus.generate(spark, nPages, 42L, 64)
      val ex = operators.Linkage.extract(pages.toDF())
      val names = ex.select(col("url"), col("name_norm"))
      val pairs = operators.Linkage.candidatePairs(
          operators.Linkage.candidateKeys(ex))
        .join(names.withColumnRenamed("url", "url_a")
          .withColumnRenamed("name_norm", "name_a"), "url_a")
        .join(names.withColumnRenamed("url", "url_b")
          .withColumnRenamed("name_norm", "name_b"), "url_b")
        .select(col("name_a"), col("name_b"))
        // 8+ waves even at the widest parallelism measured: per-partition
        // cost varies with string length, and coarse tasks (2 waves at 32
        // cores) turn that variance into a straggler tail that reads as
        // fake scaling loss. Granularity ≫ cores is the same rule a
        // 1000-executor job lives by.
        .repartition(256)
      pairs.write.mode("overwrite").parquet(pairsDir)
      println(s"""{"prepared":"$pairsDir","pages":$nPages,"candidate_pairs":${spark.read.parquet(pairsDir).count()}}""")
      spark.stop()
      return
    }
    val cpus = args.headOption.getOrElse("8").toInt
    val pairsDir = args.lift(1).getOrElse("/tmp/graft_scaling_pairs")
    val repeat = args.lift(2).getOrElse("4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // repartition(256) pins the cached partition count regardless of
    // file-source split planning (which varies with local[N] parallelism):
    // every measured level runs the identical 256-task layout, 8+ waves
    // even at 32 cores. The shuffle happens here, outside the timed region.
    val pairs = spark.read.parquet(pairsDir).repartition(256).cache()
    val nPairs = pairs.count() // materialize outside the timed section
    val nParts = pairs.rdd.getNumPartitions

    def scoredCount(): Long = pairs
      .withColumn("r", explode(sequence(lit(1), lit(repeat))))
      .select(
        (levenshtein_sim(col("name_a"), col("name_b")) +
          damerau_levenshtein_sim(col("name_a"), col("name_b")) +
          hamming_sim(col("name_a"), col("name_b")) +
          jaro_sim(col("name_a"), col("name_b")) +
          jaro_winkler_sim(col("name_a"), col("name_b")) +
          jaccard_sim(col("name_a"), col("name_b")) +
          sorensen_dice_sim(col("name_a"), col("name_b"))).as("s"))
      .where(col("s") > 0.0)
      .count()
    scoredCount() // warm-up: JIT-compile the generated code, touch the cache
    var best = Double.MaxValue
    var n = 0L
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      n = scoredCount()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(s"""{"cpus":$cpus,"candidate_pairs":$nPairs,"partitions":$nParts,"pairs_scored":$n,"sec":$best,"pairs_per_sec":${n / best}}""")
    spark.stop()
  }
}
