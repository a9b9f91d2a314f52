package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-linkage data profiling (the Splink `profile_columns` step): before
  * choosing comparison fields and blocking keys, measure each candidate
  * column's completeness, cardinality, and skew. The reading:
  *
  *  - high null rate → the field needs missing-data scoring
  *    ([[FellegiSunter]] gamma = -1), or isn't worth a comparison;
  *  - cardinality near n_rows → great blocking key, useless m/u field;
  *  - a dominant top value (top_count ≫ n_rows / n_distinct) → a hot
  *    block that the cap/salt tiers will hit, and a term-frequency
  *    adjustment candidate for scoring.
  *
  * Scale shape: one map-side-combinable (value → count) groupBy per
  * column, then a 1-row fold over that distinct-value table — the
  * distinct count is the TABLE'S row count, so no countDistinct
  * expansion; the top value is a min(struct(-count, value)) fold (ties →
  * smallest value, partitioning-independent). `approxDistinct` swaps the
  * exact distinct-value table for approx_count_distinct when even the
  * distinct table is too large to fold (corpus-scale free-text columns).
  */
object Profiling {

  /** One row per profiled column:
    * (col_name, n_rows, n_null, n_distinct, top_value, top_count).
    * Values are profiled AS STRINGS (cast) so mixed-type frames profile
    * uniformly; top_value is NULL iff the column is entirely NULL. */
  def profileColumns(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    if (approxDistinct) {
      // corpus-scale path: no distinct-value table at all — one combined
      // fold per column over the raw frame (HLL++ sketch for cardinality;
      // top_value is not derivable without the value table and is NULL).
      return cols.map { c =>
        df.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          approx_count_distinct(col(c).cast("string")).as("n_distinct"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), lit(null).cast("string").as("top_value"),
            lit(0L).as("top_count"))
      }.reduce(_ unionAll _)
    }
    cols.map { c =>
      val vc = df.groupBy(col(c).cast("string").as("__v"))
        .agg(count(lit(1)).as("__cnt"))
      val top = min(when(col("__v").isNotNull,
        struct((-col("__cnt")).as("nc"), col("__v").as("v"))))
      vc.agg(
        sum(col("__cnt")).as("n_rows"),
        coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L))
          .as("n_null"),
        count(when(col("__v").isNotNull, lit(1))).as("n_distinct"),
        top.getField("v").as("top_value"),
        (-top.getField("nc")).as("top_count"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("top_value"),
          coalesce(col("top_count"), lit(0L)).as("top_count"))
    }.reduce(_ unionAll _)
  }

  /** Top-k most frequent non-null values per column (ties → smallest
    * value): (col_name, value, cnt, rank). The rank window partitions by
    * col_name over the DISTINCT-value table, so InferWindowGroupLimit
    * bounds a high-cardinality column to k rows per map task before the
    * exchange. */
  def topValues(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty && k > 0)
    val counted = cols.map { c =>
      df.where(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(c).as("col_name"), col("value"), col("cnt"))
    }.reduce(_ unionAll _)
    val w = Window.partitionBy("col_name")
      .orderBy(col("cnt").desc, col("value").asc)
    counted.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
