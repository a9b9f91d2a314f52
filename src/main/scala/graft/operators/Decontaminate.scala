package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share at least
  * one word n-gram with an evaluation/benchmark set (the standard
  * n-gram-overlap decontamination pass run before pretraining — GPT-3
  * appendix C / PaLM-style 8-gram rule).
  *
  * Shape at 100 TB: the benchmark side is benchmark-sized (MBs), so its
  * distinct gram set BROADCASTS; the corpus side explodes its per-doc
  * distinct grams map-side and hash-joins with no corpus shuffle at all —
  * the only Exchange is the final partial-combined count per doc_id.
  */
object Decontaminate {

  /** Distinct space-joined word n-grams of a text column (empty array when
    * the text has fewer than n tokens — never a descending `sequence`). */
  def wordNGrams(text: Column, n: Int): Column = {
    val tk = TextAnalysis.tokens(text)
    when(size(tk) >= n,
      array_distinct(transform(
        sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc id, n_hits) for every training document sharing ≥ 1 word n-gram
    * with any benchmark document; n_hits = number of DISTINCT grams of the
    * doc that appear anywhere in the benchmark set. Documents with zero
    * hits are absent (the common case — keep the output contamination-
    * sized, not corpus-sized).
    *
    * `broadcastBench` (default true) hints the benchmark gram set for a
    * broadcast hash join — right for the normal case (an eval suite's
    * distinct 8-gram set is MBs). SIZE CONTRACT: the hint forces the gram
    * set through the driver and every executor, so it must fit Spark's
    * broadcast limits (spark.sql.autoBroadcastJoinThreshold semantics do
    * not apply to explicit hints — an 8 GB gram set would OOM the driver
    * rather than degrade). For a very large combined suite pass
    * `broadcastBench = false`: the unhinted plan shuffles both sides on
    * `gram` — slower, but it degrades gracefully at any benchmark size
    * (and AQE still promotes it back to broadcast when the bench side
    * turns out small). */
  def flaggedDocs(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, broadcastBench: Boolean = true): DataFrame = {
    val docGrams = docs.select(col(idCol).as("id"),
      explode(wordNGrams(col(textCol), n)).as("gram"))
    val benchGrams = bench
      .select(explode(wordNGrams(col(textCol), n)).as("gram")).distinct()
    val hinted = if (broadcastBench) broadcast(benchGrams) else benchGrams
    docGrams.join(hinted, "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}
