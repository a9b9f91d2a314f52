package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy blocking-scheme recommendation: pick the SET of blocking-key
  * families that covers the most labeled true pairs within a total
  * candidate-pair budget — the capacity-planning decision
  * [[Linkage.blockingQuality]] (one scheme's PC/RR) and
  * [[Linkage.blockingQualitySweep]] (one scheme across caps) inform but
  * don't make. Budgeted maximum coverage is NP-hard; the standard greedy
  * (highest marginal coverage among families that still fit the budget)
  * carries the classic (1 − 1/e)-style guarantee and — crucially here —
  * is DETERMINISTIC, so an ANSI-SQL oracle can replay it step by step.
  *
  * Inputs: `keyed` = (family, id, key) — one row per record per candidate
  * family (union the families, or explode a key array); `truePairs` =
  * distinct labeled pairs (first two columns). A family's COST is its
  * exact pair volume Σ_blocks C(n, 2) (decimal — n can be 10^12); its
  * GAIN is the count of still-uncovered true pairs it co-blocks.
  * Selection stops at `maxSchemes`, at budget exhaustion, or when no
  * remaining family covers anything new (zero-marginal families are
  * never picked).
  *
  * Scale shape: volumes are one map-side-combinable (family, key) count
  * + one decimal fold per family; coverage is two id-equi-joins hanging
  * each true pair's keys on it (cost ∝ |truth| × families, never corpus
  * pairs) — cached once. Each greedy step is ONE distributed anti-join +
  * count over that truth-sized table; the argmax itself runs on the
  * driver over ≤ |families| rows (the FS/IVF bounded-collect pattern).
  *
  * @return one row per selected family, in selection order:
  *         (step, family, marginal_covered, cumulative_covered,
  *          volume, cumulative_volume, total_truth). */
object BlockingSelection {

  def greedySelection(keyed: DataFrame, truePairs: DataFrame,
      budget: BigDecimal, maxSchemes: Int): DataFrame = {
    require(maxSchemes > 0, "maxSchemes must be positive")
    val spark = keyed.sparkSession
    val k = keyed.select(col(keyed.columns(0)).as("family"),
      col(keyed.columns(1)).as("__id"), col(keyed.columns(2)).as("__key"))
    val truth = truePairs.select(col(truePairs.columns(0)).as("pa"),
      col(truePairs.columns(1)).as("pb")).distinct()

    // cost: Σ C(block, 2) per family, decimal(38,0) (n can be 10^12)
    val volumes = k.groupBy("family", "__key")
      .agg(count(lit(1)).as("n"))
      .groupBy("family")
      .agg((sum(col("n").cast("decimal(38,0)") *
        (col("n") - 1).cast("decimal(38,0)")) / lit(2))
        .cast("decimal(38,0)").as("volume"))
      .collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1)))
      .toMap

    // gain table: (family, pa, pb) = this family co-blocks that true pair
    val cov = truth
      .join(k.select(col("family"), col("__id").as("pa"), col("__key")),
        Seq("pa"))
      .join(k.select(col("family"), col("__id").as("pb"), col("__key")),
        Seq("family", "pb", "__key"))
      .select("family", "pa", "pb").distinct()
      .cache()
    val totalTruth = truth.count()

    var selected = Vector.empty[(Int, String, Long, Long, BigDecimal, BigDecimal)]
    var spent = BigDecimal(0)
    var coveredSoFar = 0L
    var step = 1
    var done = false
    while (!done && step <= maxSchemes) {
      val picked = selected.map(_._2)
      val coveredPairs = if (picked.isEmpty) null
        else cov.where(col("family").isin(picked: _*))
          .select("pa", "pb").distinct()
      val remaining0 = cov.where(!col("family").isin(picked: _*))
      val remaining = if (coveredPairs == null) remaining0
        else remaining0.join(coveredPairs, Seq("pa", "pb"), "left_anti")
      val marginals = remaining.groupBy("family").count().collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .filter { case (f, _) => spent + volumes(f) <= budget }
      if (marginals.isEmpty) done = true
      else {
        val (f, m) = marginals.minBy { case (name, cnt) => (-cnt, name) }
        spent += volumes(f)
        coveredSoFar += m
        selected :+= ((step, f, m, coveredSoFar, volumes(f), spent))
        step += 1
      }
    }
    cov.unpersist()

    val schema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("family", StringType, nullable = false),
      StructField("marginal_covered", LongType, nullable = false),
      StructField("cumulative_covered", LongType, nullable = false),
      StructField("volume", DecimalType(38, 0), nullable = true),
      StructField("cumulative_volume", DecimalType(38, 0), nullable = true),
      StructField("total_truth", LongType, nullable = false)))
    val rows = selected.map { case (s, f, m, c, v, cv) =>
      Row(s, f, m, c, v.bigDecimal, cv.bigDecimal, totalTruth)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
