package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting operators for a training-data
  * pipeline. Everything here is HASH-derived, never RNG-derived: a
  * training corpus split must be reproducible across reruns, cluster
  * sizes, and partitionings (Spark's `randomSplit` is none of those — it
  * reseeds per partition, so adding an executor reshuffles the split).
  *
  *  - [[splitAssign]] — train/val/test assignment as a pure per-row
  *    projection (zero shuffle at any scale: the label is a function of
  *    the row's id alone).
  *  - [[stratifiedSample]] — per-stratum quota sample in deterministic
  *    hash order (per-language/per-source caps, the "balance the corpus"
  *    operation).
  *
  * Both use sha256-derived order, so the DuckDB driver oracle re-derives
  * the exact same assignment/sample in ANSI SQL (same trick as the LSH
  * sha families).
  */
object Sampling {

  /** Uniform [0, 1) fraction from the first 8 hex chars of
    * sha256(id ":" seed) — 32 bits of the digest over 2^32. Exactly
    * reproducible in SQL from the digest hex, and exact in double
    * (32-bit integer over a power of two). */
  private[operators] def hashFraction(id: Column, seed: Long): Column =
    conv(substring(sha2(concat(id.cast("string"), lit(s":$seed")), 256), 1, 8),
      16, 10).cast("double") / lit(4294967296.0)

  /** Deterministic split assignment: appends `split_name` chosen by where
    * the row's hash fraction falls in the cumulative `weights` intervals
    * (e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1); weights must
    * sum to 1 — the last split takes any remainder). A pure projection:
    * no shuffle, no state, no dependence on partitioning or cluster size;
    * adding data later never reassigns existing rows (the property
    * `randomSplit` lacks). */
  def splitAssign(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    df.withColumn("split_name", splitLabel(hashFraction(col(idCol), seed), weights))
  }

  /** Cumulative-interval split label shared by [[splitAssign]] and
    * [[splitByCluster]]. */
  private def splitLabel(frac: Column, weights: Seq[(String, Double)]): Column = {
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
    weights.init.zip(cuts.init)
      .foldRight(lit(weights.last._1): Column) { case (((name, _), cut), rest) =>
        when(frac < cut, name).otherwise(rest)
      }
  }

  /** Leakage-safe (cluster-aware) split assignment: like [[splitAssign]],
    * but the hash is taken over the row's CLUSTER id, so every member of
    * a duplicate/entity cluster lands in the same split. Splitting a
    * deduplicated web corpus by row id leaks: a near-duplicate of a test
    * document sits in train and the eval is contaminated — the split unit
    * must be the entity, not the record. Rows absent from `assignment`
    * (never clustered) hash over a disjoint `"s:" + id` singleton key, so
    * they split independently without colliding with cluster keys.
    *
    * Scale shape: one id-equi-join against the assignment (broadcast-able
    * when the assignment is the small side) + the same pure hash
    * projection as [[splitAssign]] — no extra shuffle, subset-stable
    * (a cluster's split never changes as the corpus grows, unless its
    * cluster id itself changes — pair with [[EntityIds.stabilize]] to
    * keep ids, and therefore splits, stable across runs). */
  def splitByCluster(df: DataFrame, idCol: String, assignment: DataFrame,
      weights: Seq[(String, Double)], clusterCol: String = "component",
      seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    val asg = assignment.select(col(idCol), col(clusterCol).as("__cluster"))
    val key = coalesce(col("__cluster").cast("string"),
      concat(lit("s:"), col(idCol).cast("string")))
    df.join(asg, Seq(idCol), "left")
      .withColumn("split_name", splitLabel(hashFraction(key, seed), weights))
      .drop("__cluster")
  }

  /** Per-stratum quota sample: keeps at most `quota` rows per distinct
    * value of `strataCols`, chosen in sha256(id ":" seed) order (ties by
    * id) — deterministic, reproducible, and SQL-re-derivable.
    *
    * Scale shape: the row_number window partitions by the strata key,
    * which on Zipfian strata would buffer a giant stratum in one task —
    * but Spark inserts WindowGroupLimit(Partial) below the exchange, so
    * each MAP task forwards at most `quota` rows per stratum and the
    * final window task receives ≤ quota × numMapPartitions rows per
    * stratum, bounded regardless of stratum size. (This is the one place
    * a window beats groupBy+join-back: the partial limit prunes BEFORE
    * the shuffle, which a count-aggregate cannot.) */
  def stratifiedSample(df: DataFrame, idCol: String, strataCols: Seq[String],
      quota: Int, seed: Long = 42L): DataFrame = {
    require(quota > 0 && strataCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(sha2(concat(col(idCol).cast("string"), lit(s":$seed")), 256).asc,
        col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= quota)
  }

  /** Domain-reweighting (mixture) sample: keeps each row with its
    * domain's target rate — the "upsample books, downsample boilerplate
    * web" step when composing a pretraining mixture. The keep decision is
    * the row's own [[hashFraction]] against the domain rate, so it is a
    * pure projection + filter: zero shuffle, partition-independent,
    * subset-stable (re-running over a grown corpus never flips existing
    * rows), and exactly re-derivable in SQL. Domains absent from `rates`
    * keep `defaultRate`. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1))
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate)) { case (acc, (dom, r)) =>
        when(col(domainCol) === dom, lit(r)).otherwise(acc)
      }
    df.where(hashFraction(col(idCol), seed) < rate)
  }
}
