package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log sessionization — the standard gap-based session assignment a
  * training-data pipeline runs over interaction/crawl logs:
  * a new session starts when the gap to the previous event of the same
  * user exceeds `gapSeconds`.
  *
  * Plan shape: ONE shuffle (hash by user_id), then two window passes over
  * the same (user_id × ts) sort order — Catalyst reuses the single sort —
  * and a final partial-aggregated groupBy on (user, session). Scale note:
  * per-user windows shard by user_id, so skew only arises from single
  * hyperactive users; those stay within one partition by definition of
  * the operator (bounded by per-user event counts, not corpus size).
  */
object Sessionize {

  /** @param events frame with (userCol, tsCol) columns (+ anything else)
    * @param orderCols extra tie-break columns appended after tsCol in the
    *        per-user sort, making the lag() pass deterministic when two
    *        events share a timestamp. Default `Seq("event_id")` matches
    *        the events-log schema; pass your own unique column(s), or
    *        `Seq.empty` when no tie-break column exists (same-timestamp
    *        order is then nondeterministic, but session ASSIGNMENT is
    *        unaffected — a zero gap never splits a session).
    * @return one row per session:
    *         (user_id, session_id, n_events, session_start, session_end) */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long = 1800L,
      orderCols: Seq[String] = Seq("event_id")): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: orderCols.map(col): _*)
    val withGap = events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      // double epoch seconds keep sub-second precision (unix_timestamp
      // truncates to seconds — a 1800.4s gap must not read as 1800s);
      // the hop through TIMESTAMP handles TIMESTAMP_NTZ inputs (identity
      // under the UTC session timezone the engine pins)
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col(tsCol).cast("timestamp").cast("double") -
            col("prev_ts").cast("timestamp").cast("double") > gapSeconds,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }
}
