package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity self-join — the sub-quadratic scale path
  * for token-set Jaccard candidate generation, complementing
  * [[Dedup.minhashLshPairs]] (probabilistic, tunable recall) with an EXACT
  * join: every pair with Jaccard >= tau is returned, none missed.
  *
  * The algorithm is the published prefix-filter family (Chaudhuri, Ganti &
  * Kaushik, ICDE'06; Bayardo et al. "All Pairs", WWW'07; distributed
  * formulation: Vernica, Carey & Li, SIGMOD'10): order every record's
  * distinct tokens by ascending global document frequency (rarest first,
  * ties by token string — a deterministic total order), keep only the
  * first |x| - ceil(tau*|x|) + 1 tokens as the record's PREFIX, and join
  * records on shared prefix tokens. Any pair with Jaccard >= tau must
  * share at least ceil(tau*max(|x|,|y|)) tokens, so its prefixes cannot be
  * disjoint — candidates outside the prefix join are provably below tau.
  * Rarest-first ordering is what makes the join sub-quadratic: prefix
  * buckets are keyed by the corpus's RARE tokens, so bucket sizes track
  * token rarity, not corpus size.
  *
  * 100 TB shape: one map-side-combinable groupBy for token frequencies,
  * one AQE-skew-splittable equi-join to attach them, one groupBy(id) to
  * order each record's tokens, an equi-self-join on prefix tokens (small
  * buckets by construction), a distinct over surviving candidates, and two
  * primary-key joins back to the token sets for exact verification.
  * Nothing collects to the driver; no step is quadratic in the corpus.
  * Residual hot prefix tokens (degenerate corpora — e.g. near-duplicate
  * boilerplate where even the "rarest" token of many records is shared)
  * get the same 3-tier policy as every other pair generator here:
  * plain join <= bucketCap < salted grid <= hardCap < dropped (opt-in,
  * observable via [[droppedPrefixTokens]]).
  */
object SetSimJoin {

  /** (id, sorted distinct tokens, len) base frame shared by the join and
    * its dropped-token companion. Token-less records carry no signal and
    * are excluded (exact dedup owns them). */
  private def base(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(
      col(idCol).as("id"),
      array_sort(array_distinct(TextAnalysis.tokens(col(textCol)))).as("toks"))
      .withColumn("len", size(col("toks")))
      .where(col("len") > 0)

  /** (tok, id, len) prefix rows: each record's |x| - ceil(tau*|x|) + 1
    * globally-rarest tokens. The ceil subtracts 1e-9 first so a tau*len
    * that is mathematically integral but rounds a hair high in binary
    * (e.g. 0.95*20) cannot shorten the prefix below the provable bound —
    * the slack only ever ADMITS candidates, never loses one. */
  private def prefixRows(b: DataFrame, tau: Double): DataFrame = {
    val exploded = b.select(col("id"), col("len"), explode(col("toks")).as("tok"))
    val freq = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = exploded.join(freq, "tok")
      .groupBy(col("id"), col("len"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
    val pLen = (col("len") - ceil(col("len") * lit(tau) - lit(1e-9)) + 1).cast("int")
    ordered
      .select(col("id"), col("len"),
        explode(slice(transform(col("ord"), s => s.getField("tok")), lit(1), pLen))
          .as("tok"))
  }

  /** Exact token-set Jaccard >= tau self-join: (ia, ib, jaccard) with
    * ia < ib, complete (no pair >= tau missed) unless a finite `hardCap`
    * is set — in which case [[droppedPrefixTokens]] with the same
    * arguments records exactly which prefix buckets were excluded.
    *
    * The length filter (min len >= tau * max len, a necessary condition
    * for Jaccard >= tau) prunes candidates BEFORE the distinct, so the
    * dedup shuffle never carries pairs the verifier would discard on
    * cardinality alone; like the prefix bound it is epsilon-relaxed so
    * binary rounding can only admit, never prune, a qualifying pair. */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      tau: Double, bucketCap: Int = 10000, hardCap: Int = Int.MaxValue,
      saltGroups: Int = 16): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val b = base(docs, idCol, textCol)
    val pre = prefixRows(b, tau)
    val sized = pre.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val keyed = pre.join(sized, "tok")
    val lenOk = least(col("la"), col("lb")).cast("double") >=
      lit(tau) * greatest(col("la"), col("lb")).cast("double") - lit(1e-9)
    val good = keyed.where(col("n") <= bucketCap)
    val cold = good.select(col("tok"), col("id").as("ia"), col("len").as("la"))
      .join(good.select(col("tok"), col("id").as("ib"), col("len").as("lb")), "tok")
      .where(col("ia") < col("ib") && lenOk)
      .select(col("ia"), col("ib"))
    val hot = keyed.where(col("n") > bucketCap && col("n") <= hardCap)
      .select(col("tok").as("key"), col("id").as("url"), col("len"))
    val hotPairs = Linkage.saltedSelfJoin(hot, saltGroups, payload = Seq("len"))
      .select(col("url_a").as("ia"), col("url_b").as("ib"),
        col("len_a").as("la"), col("len_b").as("lb"))
      .where(lenOk)
      .select(col("ia"), col("ib"))
    // A pair can share SEVERAL prefix tokens (and meet in both tiers via
    // different tokens), so unlike the one-block-per-record generators the
    // tier union is NOT disjoint — one distinct pass dedups candidates
    // before the verification joins.
    cold.union(hotPairs).distinct()
      .join(b.select(col("id").as("ia"), col("toks").as("ta")), "ia")
      .join(b.select(col("id").as("ib"), col("toks").as("tb")), "ib")
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  /** Prefix-token buckets excluded by `hardCap` with their sizes — the
    * non-silent record of what [[prefixJaccardPairs]] dropped (same
    * contract as [[Linkage.droppedBuckets]] / [[Dedup.droppedNgramBuckets]]). */
  def droppedPrefixTokens(docs: DataFrame, idCol: String, textCol: String,
      tau: Double, hardCap: Int): DataFrame =
    prefixRows(base(docs, idCol, textCol), tau)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .where(col("n") > hardCap)
}
