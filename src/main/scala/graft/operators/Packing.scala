package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: pretraining consumes fixed-length token
  * sequences built by concatenating documents in a pinned order and
  * chopping every `seqLen` tokens. This operator computes each document's
  * place in that layout — shard, token offset, and the first/last
  * sequence indices it lands in — WITHOUT materializing the sequences
  * (the actual tensor write is a downstream per-shard pass).
  *
  * Determinism/scale contract (same sha256-order trick as
  * [[Sampling.stratifiedSample]]): concatenation order is
  * sha256(id ":pack" seed) within a shard, so the layout is independent
  * of partitioning, cluster size, and insertion order. The prefix-sum
  * window partitions by shard — shard count is the parallelism knob, and
  * each shard's window is one task, so size `shards` ≈ corpus tokens /
  * (a few hundred M) at 100 TB; shards are mutually independent, so this
  * scales out linearly.
  */
object Packing {

  /** (id, shard, n_tokens, start_off, first_seq, last_seq) per document.
    * `start_off` = tokens preceding the doc within its shard; a document
    * spans sequences `first_seq..last_seq` (inclusive; a token-less doc
    * is pinned to the sequence containing its offset). All columns are
    * exact integers — the DuckDB oracle re-derives the full layout. */
  def packAssignments(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int, seed: Long = 42L): DataFrame = {
    require(seqLen > 0 && shards > 0)
    val key = sha2(concat(col(idCol).cast("string"), lit(s":pack$seed")), 256)
    val shard = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"),
      lit(shards.toLong))
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      key.as("k"), shard.as("shard"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("k").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .select(col("id"), col("shard"), col("n_tokens"),
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("start_off"))
      .select(col("id"), col("shard"), col("n_tokens"), col("start_off"),
        floor(col("start_off") / seqLen).as("first_seq"),
        floor((col("start_off") + greatest(col("n_tokens"), lit(1L)) - 1)
          / seqLen).as("last_seq"))
  }
}
