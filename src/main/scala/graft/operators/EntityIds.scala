package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable entity-id assignment across linkage runs.
  *
  * Connected-components labels are ANONYMOUS (the min member id of the
  * cluster), so re-running linkage after a crawl batch renames clusters
  * wholesale even when their membership barely moved — and every
  * downstream consumer keyed on the cluster id (golden records, served
  * entity pages, feedback labels) churns with them. The production fix
  * is an id-carry step: each new cluster inherits the previous run's
  * entity id when it is clearly "the same entity", and mints a fresh id
  * otherwise. This completes the incremental chain
  * ([[Dedup.bandIndex]] → [[ConnectedComponents.addEdges]] → THIS →
  * [[Canonicalize.goldenRecordsIncremental]]).
  *
  * Carry rule (deterministic, order-insensitive):
  *  1. overlap(c, e) = number of records in current cluster c that held
  *     previous entity id e;
  *  2. each cluster's CANDIDATE entity = its max-overlap e (ties → the
  *     smallest e);
  *  3. each previous entity may be carried by AT MOST ONE cluster — among
  *     clusters whose candidate is e, the largest overlap wins (ties →
  *     the smallest cluster); so a SPLIT keeps the id on its biggest
  *     fragment and the rest mint;
  *  4. losers, and clusters with no overlap at all, mint
  *     `"new:" + min member id` — deterministic and collision-free
  *     against carried ids (entity ids are emitted as strings).
  *
  * Scale shape: the overlap table is ≤ one row per RECORD (built by one
  * id-equi-join + one map-side-combinable groupBy); both argmax steps
  * are row_number windows carrying their top-1 filter directly, so
  * InferWindowGroupLimit inserts per-group partial limits below the
  * exchanges; sizes/min-ids are one combinable groupBy. Nothing touches
  * pairs; a hot cluster costs its row count.
  */
object EntityIds {

  /** @param previous (idCol, entityCol) from the last run — entity ids of
    *                 any castable-to-string type.
    * @param current  (idCol, clusterCol) from this run's clustering.
    * @return one row per current cluster:
    *         (clusterCol, entity_id, n_members, n_overlap, is_new). */
  def stabilize(previous: DataFrame, current: DataFrame,
      idCol: String, entityCol: String = "entity_id",
      clusterCol: String = "component"): DataFrame = {
    val cur = current.select(col(idCol).as("__id"),
      col(clusterCol).as(clusterCol))
    val prev = previous.select(col(idCol).as("__id"),
      col(entityCol).cast("string").as("__prev"))

    val sizes = cur.groupBy(clusterCol)
      .agg(count(lit(1)).as("n_members"), min(col("__id")).as("__min_id"))

    val overlap = cur.join(prev, "__id")
      .groupBy(col(clusterCol), col("__prev"))
      .agg(count(lit(1)).as("n_overlap"))

    // per-cluster candidate: the entity covering most of its members
    val byCluster = Window.partitionBy(clusterCol)
      .orderBy(col("n_overlap").desc, col("__prev").asc)
    val candidate = overlap
      .withColumn("__rn", row_number().over(byCluster))
      .where(col("__rn") === 1).drop("__rn")

    // per-entity winner: only one cluster may carry each previous id
    val byEntity = Window.partitionBy(col("__prev"))
      .orderBy(col("n_overlap").desc, col(clusterCol).asc)
    val winner = candidate
      .withColumn("__rn", row_number().over(byEntity))
      .where(col("__rn") === 1)
      .select(col(clusterCol), lit(true).as("__carried"))

    // n_overlap reports the cluster's BEST overlap even when it loses the
    // carry (n_overlap > 0 && is_new = "lost a contested id" — the split
    // audit a reviewer wants), so candidates and winners join separately.
    sizes.join(candidate, Seq(clusterCol), "left")
      .join(winner, Seq(clusterCol), "left")
      .select(col(clusterCol),
        when(col("__carried"), col("__prev"))
          .otherwise(concat(lit("new:"), col("__min_id").cast("string")))
          .as("entity_id"),
        col("n_members"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("__carried"), lit(false)) === false as "is_new")
  }
}
