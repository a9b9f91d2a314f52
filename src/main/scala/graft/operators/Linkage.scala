package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.functions.{bag_within, jaro_winkler_sim, levenshtein_within, sorensen_dice_sim}

/** Record-linkage pipeline stages (north rule: blocking → pairwise scoring
  * → transitive clustering over Common-Crawl-style pages).
  *
  * Every stage is a pure `DataFrame → DataFrame` function built from stock
  * Catalyst operators (scan/filter/project/groupBy/equi-join) so predicate
  * pushdown, column pruning, partial aggregation, broadcast selection, and
  * AQE skew-join splitting all apply for free (SURVEY.md §4.2). The only
  * custom expressions in the hot path are the codegen'd strsim kernels.
  *
  * Scale notes (10^12 pages):
  *  - Blocking keys are Zipfian. Ultra-hot buckets are dropped (standard
  *    LSH practice — a bucket holding thousands of pages carries no
  *    discriminative signal and would quadratically explode the pair
  *    count); the drop is observable in the metrics output, never silent.
  *  - The pair self-join is an equi-join on the bucket key with AQE skew
  *    handling; pair dedup is a groupBy on (url_a, url_b), partial
  *    aggregation makes it map-side combining.
  *  - html (BINARY) is never read by any stage after extraction — column
  *    pruning keeps it out of every shuffle (verified in PipelinePlanSpec).
  */
object Linkage {

  /** Stage 1 — text extraction + normalization.
    * Recovers `text` from the raw `html` bytes (byte-identical per url —
    * the BASELINE.json:15 invariant, checked in [[textInvariantViolations]]),
    * derives the display title, the normalized entity name, and the
    * normalized-url blocking key. */
  def extract(pages: DataFrame): DataFrame = {
    val textFromHtml = regexp_replace(
      regexp_extract(decode(col("html"), "UTF-8"), "(?s)<body>\n(.*)\n</body>", 1),
      "</?p>", "")
    pages.select(
      col("url"),
      textFromHtml.as("text"),
      col("lang"),
      regexp_extract(col("url"), "^https?://([^/?]+)", 1).as("host"))
      .withColumn("title", substring_index(col("text"), "\n", 1))
      .withColumn("name_norm", regexp_replace(lower(col("title")), "[^a-z0-9]", ""))
      .withColumn("block_key",
        regexp_replace(
          regexp_replace(col("host"), "^(www|m|en|web)\\.", ""),
          "\\.(com|org|net|example)$", ""))
  }

  /** Count of urls whose extracted text differs byte-wise from the stored
    * `text` column — must be 0 (per-row invariant vs the reference). */
  def textInvariantViolations(pages: DataFrame): Long = {
    val extracted = extract(pages).select(col("url"), col("text").as("text_ex"))
    pages.select(col("url"), col("text"))
      .join(extracted, "url")
      .where(sha2(encode(col("text"), "UTF-8"), 256) =!=
        sha2(encode(col("text_ex"), "UTF-8"), 256))
      .count()
  }

  /** Stage 2 — MinHash band keys over char k-shingles of the normalized
    * name (secondary blocking key; catches host misspellings the
    * normalized-url key misses). The whole signature is ONE fused codegen
    * expression per row ([[graft.functions.MinHashSigChars]]) — the old
    * explode → k-column min-agg form paid a full shuffle of every shingle
    * row for nothing. `hashFamily` as in [[Dedup.minhashLshPairs]]:
    * `xxhash64` for production, `sha256` for the ANSI-SQL-reproducible
    * variant the driver gate hash-checks against DuckDB. */
  def minhashBandKeys(extracted: DataFrame, numHashes: Int = 12,
      bands: Int = 6, shingleK: Int = 3,
      hashFamily: String = "xxhash64"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = extracted.select(col("url"),
      graft.functions.minhash_sig_chars(col("name_norm"), shingleK, numHashes,
        hashFamily).as("sig"))
    val bandKeys = (0 until bands).map { b =>
      val elems = (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))
      val h =
        if (hashFamily == "sha256") sha2(concat_ws("|", elems: _*), 256)
        else xxhash64(elems: _*)
      concat(lit(s"mh$b:"), h).as(s"band$b")
    }
    sig.select(col("url") +: bandKeys: _*)
      .select(col("url"), explode(array((0 until bands).map(b => col(s"band$b")): _*)).as("key"))
  }

  /** Stage 2b — full candidate key set: normalized-url key ∪ MinHash band
    * keys. Output: (url, key). */
  def candidateKeys(extracted: DataFrame, numHashes: Int = 12, bands: Int = 6,
      shingleK: Int = 3): DataFrame = {
    val urlKeys = extracted.select(col("url"), concat(lit("host:"), col("block_key")).as("key"))
    urlKeys.union(minhashBandKeys(extracted, numHashes, bands, shingleK))
  }

  /** Stage 3 — candidate pairs: urls sharing any key, url_a < url_b,
    * deduped. Three-tier skew policy (web blocking keys are Zipfian):
    *
    *  1. buckets ≤ `bucketCap`: plain equi-self-join on `key` (AQE
    *     skew-join splits residual stragglers);
    *  2. `bucketCap` < n ≤ `hardCap`: SALTED grid self-join
    *     ([[saltedSelfJoin]]) — a hot bucket's quadratic pair work is
    *     sharded across `saltGroups`² tasks instead of landing on one
    *     reducer (the "salted repartitioning" the north rule mandates);
    *  3. n > `hardCap`: dropped, never silently — [[droppedBuckets]] and
    *     the pipeline metrics record them (an ultra-hot key carries no
    *     discriminative signal and would emit ~n²/2 junk pairs).
    */
  def candidatePairs(keys: DataFrame, bucketCap: Int = 200,
      hardCap: Int = 100000, saltGroups: Int = 16,
      distinctPairs: Boolean = true): DataFrame = {
    // bucket sizing: groupBy (map-side partial combine) + join-back, NOT
    // a window count — a window buffers each key's rows in one
    // unsplittable task, which is a straggler on exactly the Zipfian hot
    // keys this function's tier policy exists for; the join-back is a
    // plain equi-join AQE can skew-split
    // the key frame feeds the sizing aggregate AND the join-back: callers
    // often derive it from an expensive pass (sha256 MinHash band keys),
    // so materialize it once unless it already IS a materialized
    // checkpoint (adaptive-SNM segments arrive as one)
    val k = keys.queryExecution.logical match {
      case _: org.apache.spark.sql.execution.LogicalRDD => keys
      case _ => keys.localCheckpoint(eager = false)
    }
    val sized = k.groupBy(col("key")).agg(count(lit(1)).as("bucket_n"))
    val keyed = k.join(sized, "key")
    val good = keyed.where(col("bucket_n") <= bucketCap)
    val a = good.select(col("key"), col("url").as("url_a"))
    val b = good.select(col("key"), col("url").as("url_b"))
    val coldPairs = a.join(b, "key")
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"))
    val hot = keyed
      .where(col("bucket_n") > bucketCap && col("bucket_n") <= hardCap)
      .select(col("key"), col("url"))
    val all = coldPairs.union(saltedSelfJoin(hot, saltGroups))
    // `distinctPairs = false` is for callers whose key frame is FUNCTIONAL
    // (each url carries exactly one key — e.g. adaptive-SNM segment ids):
    // within a bucket each unordered pair meets exactly once (cold join by
    // url_a < url_b; salted grid by construction) and no pair can span two
    // buckets, so the dedup shuffle would re-hash the full pair volume to
    // remove nothing (guide §2.4: a distinct on already-unique data).
    if (distinctPairs) all.distinct() else all
  }

  /** Salted (fragment-replicate grid) self-join: member u of bucket k with
    * salt g = hash(u) mod G is replicated to grid cells (k, g, j≥g) on the
    * left and (k, i≤g, g) on the right; cell (k, i, j) joins fragment i ×
    * fragment j, so each unordered pair meets in exactly one cell and the
    * bucket's n²/2 work spreads over G(G+1)/2 reducers at replication
    * cost G. Equi-join on the salted composite key — no reducer ever sees
    * a whole hot bucket.
    *
    * `payload`: extra SCALAR columns of `hot` carried through the grid and
    * emitted as `<p>_a`/`<p>_b` aligned with the (url_a, url_b) ordering —
    * replication cost G × the scalar, which beats re-deriving or re-joining
    * the value per side afterwards (e.g. SimHash signatures in
    * Dedup.simhashPairs tier 2). */
  private[operators] def saltedSelfJoin(hot: DataFrame, saltGroups: Int,
      payload: Seq[String] = Nil): DataFrame = {
    val g = pmod(xxhash64(col("url")), lit(saltGroups)).cast("int")
    val pa = payload.map(p => col(p).as(s"${p}_a"))
    val pb = payload.map(p => col(p).as(s"${p}_b"))
    val left = hot.select(col("key") +: col("url") +: g.as("g") +: pa: _*)
      .withColumn("j", explode(sequence(col("g"), lit(saltGroups - 1))))
      .select(col("key") +: col("g").as("gi") +: col("j").as("gj") +:
        col("url").as("url_a") +: payload.map(p => col(s"${p}_a")): _*)
    val right = hot.select(col("key") +: col("url") +: g.as("g") +: pb: _*)
      .withColumn("i", explode(sequence(lit(0), col("g"))))
      .select(col("key") +: col("i").as("gi") +: col("g").as("gj") +:
        col("url").as("url_b") +: payload.map(p => col(s"${p}_b")): _*)
    val swap = col("url_a") > col("url_b")
    left.join(right, Seq("key", "gi", "gj"))
      // same-fragment cell (i == j) holds both sides of every intra-fragment
      // pair: order by url; cross-fragment pairs meet exactly once
      .where((col("gi") =!= col("gj") && col("url_a") =!= col("url_b")) ||
        col("url_a") < col("url_b"))
      .select(least(col("url_a"), col("url_b")).as("url_a") +:
        greatest(col("url_a"), col("url_b")).as("url_b") +:
        payload.flatMap(p => Seq(
          when(swap, col(s"${p}_b")).otherwise(col(s"${p}_a")).as(s"${p}_a"),
          when(swap, col(s"${p}_a")).otherwise(col(s"${p}_b")).as(s"${p}_b"))): _*)
  }

  /** Buckets excluded by `hardCap` with their sizes — the non-silent
    * record of what blocking dropped. */
  def droppedBuckets(keys: DataFrame, hardCap: Int = 100000): DataFrame =
    keys.groupBy(col("key")).agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > hardCap)

  /** Stage 4 — pairwise scoring: composite Jaro-Winkler + Sørensen-Dice on
    * the normalized names (the north-star composite). Pure projection over
    * the candidate pairs joined with the (url → name) side — both joins are
    * equi-joins on url. */
  def score(pairs: DataFrame, extracted: DataFrame): DataFrame = {
    val names = extracted.select(col("url"), col("name_norm"))
    pairs
      .join(names.withColumnRenamed("url", "url_a").withColumnRenamed("name_norm", "name_a"), "url_a")
      .join(names.withColumnRenamed("url", "url_b").withColumnRenamed("name_norm", "name_b"), "url_b")
      .select(col("url_a"), col("url_b"),
        jaro_winkler_sim(col("name_a"), col("name_b")).as("jw"),
        sorensen_dice_sim(col("name_a"), col("name_b")).as("dice"))
      .withColumn("score", col("jw") + col("dice"))
  }

  /** Stage 4 (alternative) — Fellegi-Sunter comparison vectors for the
    * candidate pairs: banded similarity indicators over the normalized
    * entity name — g0 = JW ≥ 0.95 (strict), g1 = JW ≥ 0.88 (loose),
    * g2 = Sørensen-Dice ≥ 0.85. Name-similarity bands rather than
    * block/lang equality because candidate pairs COME from blocking —
    * fields the blocker already conditioned on carry almost no
    * discriminative signal among candidates (their u ≈ 1), while banded
    * name agreement is exactly the "agreement levels" evidence FS is
    * built on. Monotone bands are conditionally dependent (strict
    * agreement implies loose), which the naive-FS independence
    * assumption tolerates: EM still drives every u toward 0 and the
    * posterior split survives (LinkageSpec pins F1 ≥ 0.9 on the planted
    * corpus). Same two equi-joins as [[score]]; gammas are
    * null-absorbing by construction (every `when` carries an
    * `otherwise(0)`), which [[FellegiSunter.fit]] requires.
    * Output: (url_a, url_b, g0, g1, g2). */
  val fsGammaCols: Seq[String] = Seq("g0", "g1", "g2")
  def fsComparisonVectors(pairs: DataFrame, extracted: DataFrame): DataFrame = {
    val names = extracted.select(col("url"), col("name_norm"))
    pairs
      .join(names.withColumnRenamed("url", "url_a")
        .withColumnRenamed("name_norm", "name_a"), "url_a")
      .join(names.withColumnRenamed("url", "url_b")
        .withColumnRenamed("name_norm", "name_b"), "url_b")
      .select(col("url_a"), col("url_b"),
        jaro_winkler_sim(col("name_a"), col("name_b")).as("__jw"),
        sorensen_dice_sim(col("name_a"), col("name_b")).as("__dice"))
      .select(col("url_a"), col("url_b"),
        when(col("__jw") >= 0.95, lit(1L)).otherwise(lit(0L)).as("g0"),
        when(col("__jw") >= 0.88, lit(1L)).otherwise(lit(0L)).as("g1"),
        when(col("__dice") >= 0.85, lit(1L)).otherwise(lit(0L)).as("g2"))
  }

  /** Stage 4 (pre-filtered) — [[score]] behind a TWO-tier admission
    * filter at the same `maxDist`:
    *   tier 0 `bag_within(k)` — bag distance lower-bounds Levenshtein
    *     distance, so a bag rejection is a sound edit rejection at one
    *     sorted-bag-merge cost (no DP at all);
    *   tier 1 `levenshtein_within(k)` — the banded Ukkonen kernel,
    *     O((2k+1)·min(n,m)) with early exit, runs only on bag survivors.
    * Only tier-1 survivors pay the O(n·m) Jaro scan + the Dice sort of
    * the composite projection. Semantics: the output IS [[score]]
    * restricted to pairs within edit distance `maxDist` — tier 0 never
    * changes the result (BagRatcliffSpec pins the superset property; the
    * q_match_pairs_prefiltered oracle applies only the edit cut), the
    * stack as a whole is lossy-by-contract (pick maxDist from the
    * name-length distribution so true matches survive). Physically both
    * tiers sit BELOW the scoring projection in the same
    * whole-stage-codegen stage, short-circuit-ordered tier 0 first
    * (PipelinePlanSpec asserts the plan order), so pruned pairs never
    * evaluate a kernel beyond their rejection tier. */
  def scoreWithPrefilter(pairs: DataFrame, extracted: DataFrame,
      maxDist: Int): DataFrame = {
    val names = extracted.select(col("url"), col("name_norm"))
    pairs
      .join(names.withColumnRenamed("url", "url_a")
        .withColumnRenamed("name_norm", "name_a"), "url_a")
      .join(names.withColumnRenamed("url", "url_b")
        .withColumnRenamed("name_norm", "name_b"), "url_b")
      .where(bag_within(col("name_a"), col("name_b"), maxDist) &&
        levenshtein_within(col("name_a"), col("name_b"), maxDist))
      .select(col("url_a"), col("url_b"),
        jaro_winkler_sim(col("name_a"), col("name_b")).as("jw"),
        sorensen_dice_sim(col("name_a"), col("name_b")).as("dice"))
      .withColumn("score", col("jw") + col("dice"))
  }

  /** Stage 5 — matched pairs at threshold θ. */
  def matches(scored: DataFrame, theta: Double): DataFrame =
    scored.where(col("score") >= theta).select(col("url_a"), col("url_b"))

  /** Stage 6 — transitive clustering: hash urls to 64-bit node ids, run
    * large-star/small-star CC, map back. Output: (url, cluster_id) for every
    * url in `extracted` (singletons get their own id). */
  def cluster(matched: DataFrame, extracted: DataFrame): DataFrame =
    clusterWithStats(matched, extracted)._1

  /** [[cluster]] plus the CC convergence telemetry (round count +
    * per-round surviving edge counts) so the pipeline metrics can expose
    * it — on a 10^12-edge graph a stalling round series is the early
    * warning before maxIter job death. */
  def clusterWithStats(matched: DataFrame,
      extracted: DataFrame): (DataFrame, ConnectedComponents.Result) = {
    val nodes = extracted.select(col("url"), xxhash64(col("url")).as("id"))
    val edges = matched
      .select(xxhash64(col("url_a")).as("src"), xxhash64(col("url_b")).as("dst"))
    val cc = ConnectedComponents.runWithStats(edges)
    val clusters = nodes.join(cc.assignment, Seq("id"), "left")
      .select(col("url"), coalesce(col("component"), col("id")).as("cluster_id"))
    (clusters, cc)
  }

  /** Sorted-neighborhood blocking (Hernández-Stolfo): order records by a
    * sort key and emit every pair within `window` consecutive positions —
    * the classic complement to hash blocking (equi-key buckets miss pairs
    * whose keys differ in a low-order character; a sorted neighborhood
    * catches them, at O(n·w) candidate cost).
    *
    * Scale design — NO single-partition window anywhere:
    *  1. global order is established by `repartitionByRange` on
    *     (sortKey, id) (range exchange, the same shape as a distributed
    *     sort) + per-partition sort;
    *  2. the global rank is `per-partition row_number + partition offset`,
    *     where the offsets come from a P-row count aggregate prefix-summed
    *     by a window over partition IDs — P rows is planner-metadata-sized,
    *     and the offset frame is broadcast back (never collected);
    *  3. neighborhood pairs are a BANDED EQUI-JOIN on `rank div (w-1)`:
    *     each right row also offers its predecessor bucket, so a pair at
    *     rank distance ≤ w-1 meets in exactly one bucket cell — candidate
    *     generation is a plain shuffle join, never a cross product and
    *     never a giant window state.
    *
    * `idCol` must be unique per record (it is the rank tie-break, making
    * the rank — and therefore the pair set — deterministic and
    * partitioning-independent). Output: (<id>_a, <id>_b, rank_a, rank_b)
    * with rank_a < rank_b; ranks are 1-based in (sortKey, id) order. */
  /** Suffix-array blocking keys (Aizawa & Oyama 2005): every suffix of the
    * normalized key value with length >= `minLen` becomes a blocking key,
    * so records agreeing on any TAIL of the key ("1 Main St Apt 4" vs
    * "Main St Apt 4", OCR'd leading characters, titles glued to names)
    * share a block — variation the equi-key and phonetic families both
    * miss. Blocks larger than `maxBlockSize` are REMOVED, which is part of
    * the published method, not a skew workaround: a suffix shared by that
    * many records (e.g. a common street designator) carries no linkage
    * signal, and dropping it bounds every block's pair cost at
    * maxBlockSize²/2 by construction. Keys shorter than `minLen` emit
    * just themselves (the standard degenerate case).
    *
    * Plan shape: one codegen projection exploding <= len-minLen+1 suffixes
    * per record, one map-side-combinable sizing groupBy, one equi-join
    * back — no window, no driver state; pairs from the keys go through
    * [[crossCandidatePairs]]/[[candidatePairs]] like any other key frame.
    * Output: (id, suffix), deduped by construction (suffixes of one value
    * all differ in length). */
  def suffixBlockKeys(records: DataFrame, idCol: String, keyCol: String,
      minLen: Int = 4, maxBlockSize: Int = 50): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    require(maxBlockSize >= 1, s"maxBlockSize must be >= 1, got $maxBlockSize")
    val base = records.select(col(idCol).as("id"), lower(trim(col(keyCol))).as("k"))
      .where(length(col("k")) > 0)
    val sufs = base.select(col("id"),
      explode(transform(
        sequence(lit(1), greatest(length(col("k")) - lit(minLen) + 1, lit(1))),
        i => col("k").substr(i, length(col("k"))))).as("suffix"))
    val sized = sufs.groupBy(col("suffix")).agg(count(lit(1)).as("n"))
      .where(col("n") <= maxBlockSize)
    sufs.join(sized, "suffix").select(col("id"), col("suffix"))
  }

  /** Token blocking (the schema-agnostic ER baseline — Papadakis et al.):
    * every DISTINCT whitespace token of `textCol` that is at least
    * `minLen` characters long becomes a block key. The highest-recall /
    * lowest-precision member of the blocking family: two records block
    * together iff they share ANY qualifying token, so it catches matches
    * every structured key misses, at the cost of Zipfian token buckets —
    * which is exactly what the downstream caps exist for: feed the keys
    * to [[candidatePairs]] (3-tier salted/dropped skew policy) or to
    * [[MetaBlocking.blockingGraph]]/[[MetaBlocking.blockFilter]] for
    * weight-based pruning. Callers normalize `textCol` first
    * (`functions.normalize_match`) so case/accent/punctuation variants
    * share tokens.
    *
    * Plan shape: one codegen projection exploding tokens + one distinct
    * (multiplicity carries no blocking signal — a record is in a token's
    * block once). Output: (key = "tok:<token>", url = idCol), the
    * [[candidatePairs]] input schema. */
  def tokenBlockKeys(records: DataFrame, idCol: String, textCol: String,
      minLen: Int = 2): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    records
      .select(col(idCol).as("url"),
        explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .where(length(col("tok")) >= minLen)
      .select(concat(lit("tok:"), col("tok")).as("key"), col("url"))
      .distinct()
  }

  /** Blocking-scheme profile — the capacity-planning pass a 100 TB linkage
    * job runs BEFORE committing to a key scheme: how many blocks, how hot
    * is the hottest, and exactly how many candidate pairs each tier of
    * [[candidatePairs]]' skew policy would generate at the given caps
    * (cold ≤ bucketCap < salted ≤ hardCap < dropped). Pair counts are
    * Σ n(n−1)/2 per block in decimal(38,0) — integer-exact far past the
    * 2^63 pair counts a Zipfian web key can hit, the
    * [[adjustedRandStats]] overflow lesson applied. One map-side-combined
    * sizing groupBy + one global aggregate; input is the
    * [[candidatePairs]] key schema (key, url). */
  def blockingProfile(keys: DataFrame, bucketCap: Int = 200,
      hardCap: Int = 100000): DataFrame = {
    val sized = keys.groupBy(col("key")).agg(count(lit(1)).as("n"))
    val pairs2 = col("n").cast("decimal(38,0)") *
      (col("n") - 1).cast("decimal(38,0)")
    sized.agg(
      count(lit(1)).as("n_blocks"),
      sum(col("n")).as("n_assignments"),
      max(col("n")).as("max_block"),
      sum(when(col("n") <= bucketCap, 1L).otherwise(0L)).as("blocks_cold"),
      sum(when(col("n") > bucketCap && col("n") <= hardCap, 1L)
        .otherwise(0L)).as("blocks_salted"),
      sum(when(col("n") > hardCap, 1L).otherwise(0L)).as("blocks_dropped"),
      (sum(when(col("n") <= bucketCap, pairs2).otherwise(lit(0)))
        / lit(2)).cast("decimal(38,0)").as("pairs_cold"),
      (sum(when(col("n") > bucketCap && col("n") <= hardCap, pairs2)
        .otherwise(lit(0))) / lit(2)).cast("decimal(38,0)").as("pairs_salted"),
      (sum(when(col("n") > hardCap, pairs2).otherwise(lit(0)))
        / lit(2)).cast("decimal(38,0)").as("pairs_dropped"))
  }

  /** Distributed global rank over (sortKeyCol, idCol) order WITHOUT a
    * single-partition window: range partition, rank within partition, add
    * broadcast per-partition offsets (a P-row exclusive prefix sum — the
    * only single-partition window runs over ≤ P metadata rows).
    * Returns (idCol, sortKeyCol, __rnk) with __rnk contiguous from 1. */
  private[graft] def globalRanked(df: DataFrame, idCol: String,
      sortKeyCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val sorted = df.select(col(idCol), col(sortKeyCol))
      .repartitionByRange(p, col(sortKeyCol), col(idCol))
      .sortWithinPartitions(col(sortKeyCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    val offsets = counts.withColumn("__offset",
      coalesce(sum(col("__n")).over(
        W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    sorted.join(broadcast(offsets), "__pid")
      .withColumn("__rnk", col("__offset") +
        row_number().over(W.partitionBy("__pid").orderBy(col(sortKeyCol), col(idCol))))
      .select(col(idCol), col(sortKeyCol), col("__rnk"))
  }

  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, sortKeyCol: String,
      window: Int, partitions: Int = 0): DataFrame = {
    require(window >= 2, s"sorted-neighborhood window must be >= 2, got $window")
    val ranked = globalRanked(df, idCol, sortKeyCol, partitions)
      .select(col(idCol), col("__rnk"))
    val b = window - 1
    val l = ranked.select(col(idCol).as(s"${idCol}_a"), col("__rnk").as("rank_a"),
      expr(s"__rnk div $b").as("__bucket"))
    val r = ranked.select(col(idCol).as(s"${idCol}_b"), col("__rnk").as("rank_b"),
      explode(array(expr(s"__rnk div $b"), expr(s"__rnk div $b - 1"))).as("__bucket"))
    l.join(r, "__bucket")
      .where(col("rank_b") > col("rank_a") && col("rank_b") - col("rank_a") <= b)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"), col("rank_a"), col("rank_b"))
  }

  /** ADAPTIVE sorted neighborhood (Yan et al., "Adaptive sorting-based
    * blocking"): instead of a fixed window sliding over the sort order, cut
    * the order into SEGMENTS at every adjacency whose sort keys are not
    * similar enough (`sim(prev, cur) < theta`), and pair all records
    * within a segment. A fixed window both misses duplicates straddling a
    * dense run longer than the window AND wastes comparisons across
    * obvious discontinuities; the adaptive cut spends the pair budget
    * exactly where the sort order says records cluster. Equal keys can
    * never be split (sim = 1 ≥ θ for any valid θ).
    *
    * Scale shape: one [[globalRanked]] pass, ONE equi-self-join on rank
    * (rank = rank+1) for adjacency — no corpus-sized window — then a
    * second broadcast-offset prefix sum turns boundary flags into segment
    * ids, and the within-segment pairing is delegated to
    * [[candidatePairs]], inheriting the full 3-tier (plain / salted-grid /
    * observable-drop) skew contract: a degenerate sort key that lumps the
    * corpus into one segment becomes a salted grid or an observable drop,
    * never a silent quadratic reducer.
    *
    * @param sim similarity between ADJACENT SORT KEYS (not records);
    *            default Jaro-Winkler. θ in (0,1].
    * @return (idCol_a, idCol_b) distinct candidate pairs. */
  def adaptiveSortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sortKeyCol: String, theta: Double,
      sim: (Column, Column) => Column = jaro_winkler_sim(_, _),
      bucketCap: Int = 200, hardCap: Int = 100000, saltGroups: Int = 16,
      partitions: Int = 0): DataFrame = {
    val segments = adaptiveSegmentKeysForProbe(df, idCol, sortKeyCol, theta,
      sim, partitions)
    // segment keys are FUNCTIONAL (each record belongs to exactly one
    // segment), so candidate pairs are unique by construction — skip the
    // pair-volume dedup shuffle (guide §2.4)
    candidatePairs(segments, bucketCap, hardCap, saltGroups,
      distinctPairs = false)
      .select(col("url_a").as(s"${idCol}_a"), col("url_b").as(s"${idCol}_b"))
  }

  /** The segment-key derivation of [[adaptiveSortedNeighborhoodPairs]]
    * exposed for sub-stage probing/tests (same contract, returns the
    * (url, key) frame fed to [[candidatePairs]]). */
  private[graft] def adaptiveSegmentKeysForProbe(df: DataFrame, idCol: String,
      sortKeyCol: String, theta: Double,
      sim: (Column, Column) => Column = jaro_winkler_sim(_, _),
      partitions: Int = 0): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1], got $theta")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val ranked = globalRanked(df, idCol, sortKeyCol, partitions)
      .localCheckpoint(eager = false)
    val prev = ranked.select((col("__rnk") + 1).as("__rnk"),
      col(sortKeyCol).as("__prev"))
    val flagged = ranked.join(prev, Seq("__rnk"), "left")
      .withColumn("__b",
        when(col("__prev").isNull, lit(1L)) // rank 1 opens segment 1
          .otherwise(when(sim(col("__prev"), col(sortKeyCol)) < theta, lit(1L))
            .otherwise(lit(0L))))
    // distributed prefix sum of the boundary flags = segment id per row
    val parts = flagged
      .repartitionByRange(p, col("__rnk"))
      .sortWithinPartitions(col("__rnk"))
      .withColumn("__pid", spark_partition_id())
      // same shape as [[globalRanked]]: counts + offset join-back — run
      // the adjacency-similarity flags and the range sort once
      .localCheckpoint(eager = false)
    val counts = parts.groupBy(col("__pid")).agg(sum(col("__b")).as("__n"))
    val offsets = counts.withColumn("__offset",
      coalesce(sum(col("__n")).over(
        W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val segments = parts.join(broadcast(offsets), "__pid")
      .withColumn("__seg", col("__offset") +
        sum(col("__b")).over(W.partitionBy("__pid").orderBy(col("__rnk"))))
      .select(col(idCol).as("url"),
        concat(lit("seg:"), col("__seg")).as("key"))
      // candidatePairs consumes its key frame twice (sizing + join-back);
      // materialize the segment derivation once (the contract its doc
      // comment assumes of callers)
      .localCheckpoint(eager = false)
    segments
  }

  /** DYNAMIC BLOCKING (hierarchical key extension — the McNeill-Kardes-
    * Borthwick remedy): a block bigger than `cap` is not dropped and not
    * salted — its key is EXTENDED with the next key part, splitting it
    * into child blocks, recursively until every block fits or the parts
    * run out. Where [[candidatePairs]]' tier policy trades recall for
    * boundedness on ultra-hot keys, dynamic blocking keeps recall
    * whenever a finer signal exists, and only the records whose FULL key
    * chain is still over `cap` fall out (observably —
    * [[droppedDynamicRecords]]).
    *
    * Because depth-d keys are prefixes, all members of an over-cap block
    * share every ancestor key, so the whole block descends together —
    * which makes the recursion evaporate into |parts| map-side-combining
    * groupBys over the full population plus |parts| equi-joins (the size
    * frames are block-count-sized, usually broadcast): a record settles
    * at the FIRST depth whose block count fits. No driver loop, no
    * generated shuffles beyond the D sizing joins.
    *
    * @param parts ordered key parts, coarse → fine (e.g. segment, nation,
    *              name prefix). Depth-d key = parts(0..d) joined by ':'.
    * @return (id, block_key, depth) for every record that settles. */
  def dynamicBlockKeys(records: DataFrame, idCol: String,
      parts: Seq[Column], cap: Long): DataFrame = {
    require(parts.nonEmpty, "dynamicBlockKeys needs at least one key part")
    val keyed = records.select(
      col(idCol) +: parts.indices.map(d =>
        concat_ws(":", parts.take(d + 1).map(_.cast("string")): _*)
          .as(s"__k$d")): _*)
    val sized = parts.indices.foldLeft(keyed) { (acc, d) =>
      val s = keyed.groupBy(col(s"__k$d")).agg(count(lit(1)).as(s"__n$d"))
      acc.join(s, s"__k$d")
    }
    // first (coarsest) fitting depth wins: fold fine → coarse so shallower
    // WHEN branches overwrite deeper ones
    val depth = parts.indices.reverse.foldLeft(lit(-1)) { (acc, d) =>
      when(col(s"__n$d") <= cap, lit(d)).otherwise(acc)
    }
    sized.withColumn("__d", depth)
      .where(col("__d") >= 0)
      .withColumn("block_key",
        parts.indices.foldLeft(lit(null).cast("string")) { (acc, d) =>
          when(col("__d") === d, col(s"__k$d")).otherwise(acc)
        })
      .select(col(idCol), col("block_key"), col("__d").as("depth"))
  }

  /** Records whose FULL dynamic key chain is still over `cap` — the
    * non-silent record of what [[dynamicBlockKeys]] excluded. */
  def droppedDynamicRecords(records: DataFrame, idCol: String,
      parts: Seq[Column], cap: Long): DataFrame = {
    val full = records.select(col(idCol),
      concat_ws(":", parts.map(_.cast("string")): _*).as("__kf"))
    val sized = full.groupBy(col("__kf")).agg(count(lit(1)).as("block_n"))
    full.join(sized.where(col("block_n") > cap), "__kf")
      .select(col(idCol), col("__kf").as("block_key"), col("block_n"))
  }

  /** Two-corpus candidate pairs: records of LEFT and RIGHT sharing a
    * blocking key (the A-vs-B linkage shape — most production ER links two
    * tables, e.g. crawl vs registry; [[candidatePairs]] is the self-join
    * special case). Keys frames are (id, key) like [[candidateKeys]]'s
    * output. Skew policy: the per-key pair product `n_l · n_r` is capped at
    * `bucketPairCap` — an over-cap key is dropped, never silently
    * ([[droppedCrossBuckets]]); under the cap, AQE skew-join splitting
    * handles residual imbalance (a two-sided join has no quadratic
    * self-blowup — each key's cost is the product, which the cap bounds).
    * Output: (id_l, id_r, key), distinct on (id_l, id_r). */
  def crossCandidatePairs(leftKeys: DataFrame, rightKeys: DataFrame,
      bucketPairCap: Long = 1000000L): DataFrame = {
    val nl = leftKeys.groupBy(col("key")).agg(count(lit(1)).as("__nl"))
    val nr = rightKeys.groupBy(col("key")).agg(count(lit(1)).as("__nr"))
    val good = nl.join(nr, "key")
      .where(col("__nl") * col("__nr") <= bucketPairCap)
      .select(col("key"))
    leftKeys.toDF("id_l", "key").join(good, "key")
      .join(rightKeys.toDF("id_r", "key"), "key")
      .select(col("id_l"), col("id_r"))
      .distinct()
  }

  /** Keys whose cross pair product exceeds the cap, with both sizes —
    * the non-silent record of what two-corpus blocking dropped. */
  def droppedCrossBuckets(leftKeys: DataFrame, rightKeys: DataFrame,
      bucketPairCap: Long = 1000000L): DataFrame =
    leftKeys.groupBy(col("key")).agg(count(lit(1)).as("n_l"))
      .join(rightKeys.groupBy(col("key")).agg(count(lit(1)).as("n_r")), "key")
      .where(col("n_l") * col("n_r") > bucketPairCap)

  /** Two-corpus record linkage end-to-end: blocking join on `keyCol` +
    * composite JW+Dice scoring of `nameCol`, thresholded at `theta`.
    * Both inputs carry (idCol, nameCol, keyCol); ids need only be unique
    * within their own table. Output: (id_l, id_r, jw, dice, score ≥ θ). */
  /** TF-IDF-weighted cosine scoring of candidate pairs (Cohen, Ravikumar
    * & Fienberg 2003's baseline hybrid scorer): tokens weighted by
    * tf · (N+1)/(df+1) — the same log-free RATIONAL idf as
    * [[TextAnalysis.topTfidfTerms]], one exact int product and one IEEE
    * division, so the oracle reproduces every weight bit-for-bit — then
    * cosine over the weighted token vectors. Where plain token Jaccard
    * treats "the" and a rare surname alike, idf makes agreement on rare
    * tokens dominate.
    *
    * Determinism contract: each document's vector is its token-SORTED
    * (term, w) array; norms and dot products are ORDERED left folds over
    * that array (`aggregate` with a 0.0 seed — IEEE summation order is
    * part of the operator's definition, like Jaro's pinned sum order), so
    * the score is independent of partitioning and join order.
    *
    * 100 TB shape: tf and df are map-side-combinable groupBys, the weight
    * attach is one AQE-skew-splittable equi-join, vectors are one
    * groupBy(id) bounded by per-document token counts, and scoring is two
    * primary-key joins of `pairs` to the vector frame — per-pair cost is
    * O(|tokens_a|) map lookups inside the row, no shuffle beyond the
    * joins, nothing driver-sized. Token-less documents have no vector
    * (norm 0 is undefined); pairs touching them are dropped by the inner
    * joins. `pairs` carries (iaCol, ibCol); output (iaCol, ibCol, cosine). */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, iaCol: String = "ia", ibCol: String = "ib"): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val weighted = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"),
        ((col("tf") * (col("n_docs") + 1)).cast("double") /
          (col("df") + 1).cast("double")).as("w"))
    val vecs = weighted.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("v"))
      .select(col("id"), col("v"),
        sqrt(aggregate(col("v"), lit(0.0),
          (acc, s) => acc + s.getField("w") * s.getField("w"))).as("nrm"))
    val va = vecs.select(col("id").as(iaCol), col("v").as("__va"),
      col("nrm").as("__na"))
    val vb = vecs.select(col("id").as(ibCol),
      map_from_entries(col("v")).as("__mb"), col("nrm").as("__nb"))
    pairs.select(col(iaCol), col(ibCol))
      .join(va, iaCol).join(vb, ibCol)
      .select(col(iaCol), col(ibCol),
        (aggregate(col("__va"), lit(0.0), (acc, s) =>
          acc + coalesce(element_at(col("__mb"), s.getField("term")), lit(0.0)) *
            s.getField("w")) / (col("__na") * col("__nb"))).as("cosine"))
  }

  /** SoftTFIDF (Cohen-Ravikumar-Fienberg 2003) hybrid pair scorer — the
    * classic record-linkage compromise between token-level TF-IDF cosine
    * (brittle to typos: "smyth" ≠ "smith" contributes nothing) and
    * char-level Jaro-Winkler (blind to token importance): for every
    * a-token whose BEST Jaro-Winkler match among b's tokens clears θ, add
    * `v(t_a,a) · v(t_b,b) · jw(t_a,t_b)` where v is the L2-normalized
    * TF-IDF weight. Degenerates to exact TF-IDF cosine when all matches
    * are exact (jw = 1), and to 0 when no token pair clears θ (such pairs
    * emit NO row — absence of evidence, mirrored by the oracle).
    *
    * Weights reuse [[tfidfCosinePairs]]' log-free rational idf
    * `tf·(n+1)/(df+1)` so both scorers share one hash-exact weighting and
    * the oracle replays it without transcendental drift; the only
    * rounding is the norm sqrt, the v divisions, and the pinned
    * `(v_a · v_b) · jw` + term-ordered fold.
    *
    * Scale shape: corpus passes are the same map-side-combining tf/df
    * aggregates as [[tfidfCosinePairs]]; the per-pair token cross is
    * bounded by name length (|T_a|·|T_b| rows per candidate pair, ~25 for
    * person/org names — NOT corpus-quadratic); the argmax is a window
    * whose `= 1` filter sits directly above it (InferWindowGroupLimit
    * inserts the per-group top-1 limit before the shuffle). */
  def softTfIdfPairs(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, theta: Double, iaCol: String = "ia",
      ibCol: String = "ib"): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, s"theta must be in (0,1], got $theta")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val weighted = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"),
        ((col("tf") * (col("n_docs") + 1)).cast("double") /
          (col("df") + 1).cast("double")).as("w"))
    // norm folded in the same term-sorted order as tfidfCosinePairs
    val norms = weighted
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("v"))
      .select(col("id"),
        sqrt(aggregate(col("v"), lit(0.0),
          (acc, s) => acc + s.getField("w") * s.getField("w"))).as("nrm"))
    val unit = weighted.join(norms, "id")
      .select(col("id"), col("term"), (col("w") / col("nrm")).as("v"))
    val ta = unit.select(col("id").as(iaCol), col("term").as("__ta"),
      col("v").as("__va"))
    val tb = unit.select(col("id").as(ibCol), col("term").as("__tb"),
      col("v").as("__vb"))
    val close = pairs.select(col(iaCol), col(ibCol))
      .join(ta, iaCol).join(tb, ibCol)
      .withColumn("__jw", when(col("__ta") === col("__tb"), lit(1.0))
        .otherwise(jaro_winkler_sim(col("__ta"), col("__tb"))))
      .where(col("__jw") >= lit(theta))
    val wBest = W.partitionBy(col(iaCol), col(ibCol), col("__ta"))
      .orderBy(col("__jw").desc, col("__tb"))
    val best = close.withColumn("__rn", row_number().over(wBest))
      .where(col("__rn") === 1)
      .select(col(iaCol), col(ibCol), col("__ta"),
        (col("__va") * col("__vb") * col("__jw")).as("__c"))
    best.groupBy(col(iaCol), col(ibCol))
      .agg(aggregate(sort_array(collect_list(struct(col("__ta"), col("__c")))),
        lit(0.0), (acc, s) => acc + s.getField("__c")).as("soft_tfidf"))
  }

  def linkTables(left: DataFrame, right: DataFrame, idCol: String,
      nameCol: String, keyCol: String, theta: Double,
      bucketPairCap: Long = 1000000L): DataFrame = {
    val lk = left.select(col(idCol).as("id"), col(keyCol).as("key"))
    val rk = right.select(col(idCol).as("id"), col(keyCol).as("key"))
    val pairs = crossCandidatePairs(lk, rk, bucketPairCap)
    val ln = left.select(col(idCol).as("id_l"), col(nameCol).as("__name_l"))
    val rn = right.select(col(idCol).as("id_r"), col(nameCol).as("__name_r"))
    pairs.join(ln, "id_l").join(rn, "id_r")
      .select(col("id_l"), col("id_r"),
        jaro_winkler_sim(col("__name_l"), col("__name_r")).as("jw"),
        sorensen_dice_sim(col("__name_l"), col("__name_r")).as("dice"))
      .withColumn("score", col("jw") + col("dice"))
      .where(col("score") >= theta)
  }

  /** Symmetric best match over scored two-corpus pairs: keep (l, r) iff r
    * is l's highest-scoring candidate AND l is r's — the standard
    * one-to-one-leaning post-filter for A-vs-B linkage (a registry record
    * should not link to ten crawl pages just because ten cleared θ). Both
    * argmaxes are taken over the ORIGINAL scored set (not sequentially),
    * so the result is order-independent; ties break deterministically by
    * the opposite id, making the output partitioning-stable.
    *
    * Scale shape: each side is a `row_number` window with its `= 1`
    * filter directly above it, so InferWindowGroupLimit inserts a
    * per-group top-1 limit BEFORE each shuffle (one surviving row per key
    * leaves each map task); the final left-semi join is key-only. */
  def symmetricBestMatches(scored: DataFrame, leftId: String = "id_l",
      rightId: String = "id_r", scoreCol: String = "score"): DataFrame = {
    val wl = W.partitionBy(col(leftId))
      .orderBy(col(scoreCol).desc, col(rightId))
    val wr = W.partitionBy(col(rightId))
      .orderBy(col(scoreCol).desc, col(leftId))
    val bestPerLeft = scored.withColumn("__rn", row_number().over(wl))
      .where(col("__rn") === 1).drop("__rn")
    val bestPerRight = scored.withColumn("__rn", row_number().over(wr))
      .where(col("__rn") === 1)
      .select(col(leftId), col(rightId))
    bestPerLeft.join(bestPerRight, Seq(leftId, rightId), "left_semi")
  }

  /** Greedy one-to-one matching over scored two-corpus pairs — the full
    * unique-mapping assignment, strictly stronger than
    * [[symmetricBestMatches]] (which keeps only the FIRST mutual-best
    * layer and discards every record whose best candidate was claimed by
    * someone better). Semantically: sort all pairs by
    * (score DESC, leftId, rightId) and accept each pair whose endpoints
    * are both still free — the classic sequential greedy weighted
    * bipartite matching every record-linkage toolkit ships as its 1:1
    * decision rule.
    *
    * Distributed formulation: a pair is LOCALLY DOMINANT when it is the
    * best surviving pair for BOTH its endpoints under the same total
    * order; accepting all locally-dominant pairs simultaneously, removing
    * their endpoints, and repeating yields EXACTLY the sequential greedy
    * matching (the locally-dominant-edge theorem: the order pairs are
    * accepted in never changes the greedy result, only the round they
    * land in). Each round is one [[symmetricBestMatches]] call — whose
    * per-partition tie-breaks (score DESC, opposite id) coincide with the
    * global total order within each endpoint partition — plus two
    * key-only anti-joins; rounds shrink geometrically on real score
    * distributions (expected O(log n)), while an adversarial descending
    * chain a₁>b₁>a₂>b₂>… serializes to O(chain length) rounds — that cost
    * is inherent to greedy semantics, not this formulation (each accepted
    * pair must be known before the next domino falls). GreedyMatchSpec
    * pins parallel ≡ sequential on random and adversarial inputs.
    *
    * Scale shape: every round's windows carry InferWindowGroupLimit
    * per-group top-1 limits before their shuffles (inherited from
    * [[symmetricBestMatches]]); survivors shrink monotonically and each
    * round is lineage-truncated, so cost ∝ surviving pairs, never the
    * original corpus. Scores must be non-null and non-NaN.
    *
    * @return (leftId, rightId, scoreCol) — the greedy matching. */
  def greedyMatches(scored: DataFrame, leftId: String = "id_l",
      rightId: String = "id_r", scoreCol: String = "score",
      maxIter: Int = 1000): DataFrame = {
    val spark = scored.sparkSession
    var cur = scored.select(col(leftId), col(rightId), col(scoreCol))
      .localCheckpoint(eager = false)
    var matched = cur.limit(0)

    // Scale-adaptive DRIVER FINISH (the [[CenterClustering]] /
    // [[ConnectedComponents]] pattern): the distributed rounds are proven
    // ≡ the sequential greedy scan, so once the surviving pair set fits a
    // bounded driver buffer, ONE in-process replay of the pinned order
    // (score DESC, leftId, rightId; accept when both endpoints free)
    // computes the identical matching — replacing the O(log) tail of
    // per-round fixed costs (two windows + two anti-joins + a probe
    // action each). Bounded collect, 0 disables, exotic types fall back.
    val driverCap = spark.conf.getOption("graft.greedy.driverFinishEdges")
      .orElse(spark.conf.getOption("spark.graft.greedy.driverFinishEdges"))
      .map(_.toLong).getOrElse(1000000L)
    def cmpOf(dt: org.apache.spark.sql.types.DataType): Option[(Any, Any) => Int] = {
      import org.apache.spark.sql.types._
      dt match {
        case LongType | IntegerType | ShortType | ByteType => Some(
          (x, y) => java.lang.Long.compare(
            x.asInstanceOf[Number].longValue, y.asInstanceOf[Number].longValue))
        case StringType => Some(
          (x, y) => x.asInstanceOf[String].compareTo(y.asInstanceOf[String]))
        case DoubleType | FloatType => Some(
          (x, y) => java.lang.Double.compare(
            x.asInstanceOf[Number].doubleValue, y.asInstanceOf[Number].doubleValue))
        case _ => None
      }
    }
    val cmpL = cmpOf(cur.schema(leftId).dataType)
    val cmpR = cmpOf(cur.schema(rightId).dataType)
    val cmpS = cmpOf(cur.schema(scoreCol).dataType)
    val driverOk = cmpL.isDefined && cmpR.isDefined && cmpS.isDefined

    def sequentialFinish(df: DataFrame): DataFrame = {
      val (cl, cr, cs) = (cmpL.get, cmpR.get, cmpS.get)
      val rows = df.collect()
      val sorted = rows.sortWith { (x, y) =>
        val c0 = cs(y.get(2), x.get(2)) // score DESC
        if (c0 != 0) c0 < 0
        else {
          val c1 = cl(x.get(0), y.get(0))
          if (c1 != 0) c1 < 0 else cr(x.get(1), y.get(1)) < 0
        }
      }
      val usedL = new java.util.HashSet[Any]()
      val usedR = new java.util.HashSet[Any]()
      val fired = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row]()
      sorted.foreach { r =>
        if (!usedL.contains(r.get(0)) && !usedR.contains(r.get(1))) {
          usedL.add(r.get(0)); usedR.add(r.get(1)); fired += r
        }
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(fired.toSeq,
          math.max(1, spark.sparkContext.defaultParallelism)), df.schema)
    }

    var iter = 0
    var drained = false
    var finished = false
    while (!drained && !finished && iter < maxIter) {
      val n = cur.count() // doubles as the drain probe and the cap check
      if (n == 0L) drained = true
      else if (driverOk && driverCap > 0 && n <= driverCap) {
        matched = matched.union(sequentialFinish(cur))
        finished = true
      } else {
        val best = symmetricBestMatches(cur, leftId, rightId, scoreCol)
          .localCheckpoint(eager = false)
        matched = matched.union(best)
        cur = cur
          .join(best.select(col(leftId)), Seq(leftId), "left_anti")
          .join(best.select(col(rightId)), Seq(rightId), "left_anti")
          .localCheckpoint(eager = false)
        iter += 1
      }
    }
    // progress is guaranteed (the globally best surviving pair is always
    // locally dominant), so non-drained means maxIter was undersized for
    // an adversarial chain — fail loudly rather than return a partial
    // matching that silently violates the greedy contract
    require(drained || finished,
      s"greedyMatches did not drain in $maxIter rounds")
    matched
  }

  /** Group linkage (On, Koudas, Srivastava, Velegrakis — "Group Linkage",
    * ICDE 2007): similarity between two GROUPS of records (households,
    * author publication sets, product listings) = the normalized weight
    * of a one-to-one matching between their members,
    *
    *   sim(A, B) = Σ_{(a,b) ∈ M} s(a, b) / (|A| + |B| − |M|)
    *
    * — Jaccard with a fractional intersection: the matched mass replaces
    * |A ∩ B|. The paper's exact form uses the MAXIMUM bipartite matching;
    * this implementation pins the GREEDY matching (the paper's own
    * scalable approximation, ≥ 1/2 the optimal weight), computed per
    * group pair with [[greedyMatches]]' locally-dominant rounds on
    * (ga, gb)-scoped keys — parallel ≡ sequential per group pair, all
    * group pairs progress concurrently.
    *
    * @param left    (gidCol, ridCol) group membership, side A
    * @param right   (gidCol, ridCol) group membership, side B
    * @param scored  (leftIdCol, rightIdCol, scoreCol) member-pair scores —
    *                the CANDIDATE set (a record pair absent here
    *                contributes nothing and cannot match); pre-threshold
    *                it so scores are meaningful
    * @return one row per group pair with ≥ 1 candidate:
    *         (ga, gb, n_l, n_r, n_matched, matched_sum, sim).
    *         `matched_sum` is an ORDERED left fold over the
    *         (rl, rr)-sorted matched list — partition-independent, so the
    *         frame is hash-reproducible. */
  def groupLinkage(left: DataFrame, right: DataFrame, scored: DataFrame,
      gidCol: String = "gid", ridCol: String = "rid",
      leftIdCol: String = "id_l", rightIdCol: String = "id_r",
      scoreCol: String = "score", maxIter: Int = 1000): DataFrame = {
    val l = left.select(col(gidCol).as("ga"), col(ridCol).as("rl"))
    val r = right.select(col(gidCol).as("gb"), col(ridCol).as("rr"))
    val cand = scored.select(col(leftIdCol).as("rl"),
        col(rightIdCol).as("rr"), col(scoreCol).cast("double").as("s"))
      .join(l, "rl").join(r, "rr")
      .select(col("ga"), col("gb"), col("rl"), col("rr"), col("s"))

    // greedy 1:1 rounds, scoped per (ga, gb): accept edges that are the
    // best surviving edge of BOTH endpoints within their group pair
    // (score DESC, opposite-rid ASC tie-break — greedyMatches' contract),
    // then drop every edge touching an accepted endpoint. materialize()
    // (CenterClustering's) truncates lineage AND resets carried stats so
    // rounds don't compound plan statistics.
    var cur = CenterClustering.materialize(cand)
    var matched = cand.limit(0)

    // Scale-adaptive DRIVER FINISH ([[greedyMatches]]' pattern, scoped
    // per group pair): within each (ga, gb) the rounds ≡ the sequential
    // greedy scan in (s DESC, rl, rr) order with per-group endpoint
    // bookkeeping; groups are independent, so one pass over the globally
    // (s DESC, rl, rr)-sorted candidates with per-group used-sets
    // reproduces every group's matching exactly. Bounded collect; 0
    // disables; exotic rid types fall back to the distributed loop.
    val spark = scored.sparkSession
    val glCap = spark.conf.getOption("graft.greedy.driverFinishEdges")
      .orElse(spark.conf.getOption("spark.graft.greedy.driverFinishEdges"))
      .map(_.toLong).getOrElse(1000000L)
    def glCmpOf(dt: org.apache.spark.sql.types.DataType): Option[(Any, Any) => Int] = {
      import org.apache.spark.sql.types._
      dt match {
        case LongType | IntegerType | ShortType | ByteType => Some(
          (x, y) => java.lang.Long.compare(
            x.asInstanceOf[Number].longValue, y.asInstanceOf[Number].longValue))
        case StringType => Some(
          (x, y) => x.asInstanceOf[String].compareTo(y.asInstanceOf[String]))
        case DoubleType | FloatType => Some(
          (x, y) => java.lang.Double.compare(
            x.asInstanceOf[Number].doubleValue, y.asInstanceOf[Number].doubleValue))
        case _ => None
      }
    }
    val cmpRl = glCmpOf(cur.schema("rl").dataType)
    val cmpRr = glCmpOf(cur.schema("rr").dataType)
    var finished = false
    if (glCap > 0 && cmpRl.isDefined && cmpRr.isDefined &&
        cur.count() <= glCap) {
      val (crl, crr) = (cmpRl.get, cmpRr.get)
      // rows: (ga, gb, rl, rr, s)
      val sorted = cur.collect().sortWith { (x, y) =>
        val c0 = java.lang.Double.compare(y.getDouble(4), x.getDouble(4))
        if (c0 != 0) c0 < 0
        else {
          val c1 = crl(x.get(2), y.get(2))
          if (c1 != 0) c1 < 0 else crr(x.get(3), y.get(3)) < 0
        }
      }
      val usedL = new java.util.HashSet[(Any, Any, Any)]()
      val usedR = new java.util.HashSet[(Any, Any, Any)]()
      val fired = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row]()
      sorted.foreach { r =>
        val kl = (r.get(0), r.get(1), r.get(2))
        val kr = (r.get(0), r.get(1), r.get(3))
        if (!usedL.contains(kl) && !usedR.contains(kr)) {
          usedL.add(kl); usedR.add(kr); fired += r
        }
      }
      matched = spark.createDataFrame(
        spark.sparkContext.parallelize(fired.toSeq,
          math.max(1, spark.sparkContext.defaultParallelism)), cur.schema)
      finished = true
    }

    var iter = 0
    var drained = finished || cur.isEmpty
    while (!drained && iter < maxIter) {
      val best = cur
        .withColumn("rn_l", row_number().over(
          W.partitionBy(col("ga"), col("gb"), col("rl"))
            .orderBy(col("s").desc, col("rr"))))
        .withColumn("rn_r", row_number().over(
          W.partitionBy(col("ga"), col("gb"), col("rr"))
            .orderBy(col("s").desc, col("rl"))))
        .where(col("rn_l") === 1 && col("rn_r") === 1)
        .select(col("ga"), col("gb"), col("rl"), col("rr"), col("s"))
      val bestCk = CenterClustering.materialize(best)
      matched = CenterClustering.materialize(matched.union(bestCk))
      cur = CenterClustering.materialize(cur
        .join(bestCk.select(col("ga"), col("gb"), col("rl")),
          Seq("ga", "gb", "rl"), "left_anti")
        .join(bestCk.select(col("ga"), col("gb"), col("rr")),
          Seq("ga", "gb", "rr"), "left_anti"))
      drained = cur.isEmpty
      iter += 1
    }
    require(drained, s"groupLinkage did not drain in $maxIter rounds")

    val sizesL = l.groupBy(col("ga")).agg(count(lit(1)).as("n_l"))
    val sizesR = r.groupBy(col("gb")).agg(count(lit(1)).as("n_r"))
    val perPair = matched.groupBy(col("ga"), col("gb")).agg(
      count(lit(1)).as("n_matched"),
      aggregate(
        array_sort(collect_list(struct(col("rl"), col("rr"), col("s")))),
        lit(0.0),
        (acc, x) => acc + x.getField("s")).as("matched_sum"))
    perPair.join(sizesL, "ga").join(sizesR, "gb")
      .select(col("ga"), col("gb"), col("n_l"), col("n_r"),
        col("n_matched"), col("matched_sum"),
        (col("matched_sum") /
          (col("n_l") + col("n_r") - col("n_matched")).cast("double"))
          .as("sim"))
  }

  /** Blocking quality metrics, the standard pair before committing a
    * blocking scheme at scale: REDUCTION RATIO (how much of the n(n−1)/2
    * all-pairs space blocking pruned) and PAIRS COMPLETENESS (what fraction
    * of known true pairs survive blocking — the recall ceiling every
    * downstream scorer inherits). One output row; every input reduces to a
    * count aggregate or a semi-join + count, then three 1-row broadcast
    * cross joins — nothing here scales with the corpus beyond the
    * already-materialized inputs. `truePairs` empty → pairs_completeness
    * null (no evidence, not 100%). */
  def blockingQuality(records: DataFrame, candidates: DataFrame,
      truePairs: DataFrame, aCol: String = "url_a",
      bCol: String = "url_b"): DataFrame = {
    val n = records.agg(count(lit(1)).as("n_records"))
    val cand = candidates.agg(count(lit(1)).as("n_candidates"))
    val tp = truePairs.agg(count(lit(1)).as("n_true"))
    val covered = truePairs.join(candidates, Seq(aCol, bCol), "left_semi")
      .agg(count(lit(1)).as("n_true_covered"))
    n.crossJoin(cand).crossJoin(tp).crossJoin(covered)
      // n/2.0 first (exact in double — n/2 has <= 52 significant bits for
      // any realistic corpus), THEN times (n-1): a long n*(n-1) overflows
      // negative past n ~ 3.04e9, well inside the 10^12-record design
      // range. The double product rounds above 2^53 total pairs — a
      // documented, sign-correct rounding, vs. garbage from overflow.
      // Exact (bit-identical to the old integer path) up to n ~ 9.4e7.
      .withColumn("total_pairs",
        (col("n_records").cast("double") / lit(2.0) *
          (col("n_records") - 1).cast("double")).cast("long"))
      .withColumn("reduction_ratio",
        lit(1.0) - col("n_candidates").cast("double") / col("total_pairs").cast("double"))
      .withColumn("pairs_completeness",
        when(col("n_true") > 0,
          col("n_true_covered").cast("double") / col("n_true").cast("double")))
  }

  /** Dual-system (capture-recapture) estimate of the TRUE match-pair
    * count from two independently-designed blocking passes — the
    * label-free complement to [[blockingQuality]] (which needs
    * `truePairs`): run two blocking schemes built on unrelated evidence
    * (say phonetic name keys vs address q-grams), score both candidate
    * sets with the same matcher, and treat each scheme's accepted pairs
    * as one "capture" of the unknown duplicate population. Under the
    * standard independence assumption (a pair's chance of being caught by
    * scheme A doesn't depend on being caught by B — the Lincoln-Petersen
    * model, the same estimator census coverage evaluation uses), the
    * overlap pins the population size:
    *
    *  - `lincoln_petersen` = n_a·n_b / n_both (NULL when the captures are
    *    disjoint — no evidence, not infinity);
    *  - `chapman` = (n_a+1)(n_b+1)/(n_both+1) − 1 — the bias-corrected
    *    small-overlap variant, always defined;
    *  - `est_missed` = chapman − n_union — the estimated count of true
    *    pairs NEITHER scheme surfaced (the number that decides whether a
    *    third blocking family is worth its candidate volume);
    *  - `coverage_a` = n_both/n_b, `coverage_b` = n_both/n_a — each
    *    scheme's estimated recall, measured by the other's capture.
    *
    * Correlated schemes (two spellings of the same key) violate
    * independence and bias the estimate LOW on missed pairs — pick
    * evidence-disjoint families, and read est_missed as a floor.
    *
    * Shapes: each side is normalized once (least/greatest + distinct,
    * self-loops out), then ONE pair-keyed groupBy folds the side flags
    * and ONE global aggregate reduces to the 1-row output — counts in
    * long, every estimate a pinned-order double expression over them, so
    * the oracle reproduces each value bit-for-bit. Nothing scales past
    * the candidate sets themselves. */
  def captureRecapture(pairsA: DataFrame, pairsB: DataFrame,
      aCol: String = "url_a", bCol: String = "url_b"): DataFrame = {
    def norm(df: DataFrame): DataFrame = df
      .select(least(col(aCol), col(bCol)).as("__cru"),
        greatest(col(aCol), col(bCol)).as("__crv"))
      .where(col("__cru") =!= col("__crv"))
      .distinct()
    val tagged = norm(pairsA)
      .select(col("__cru"), col("__crv"), lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionAll(norm(pairsB)
        .select(col("__cru"), col("__crv"), lit(0L).as("__ca"), lit(1L).as("__cb")))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val m = col("n_both").cast("double")
    tagged.groupBy(col("__cru"), col("__crv"))
      .agg(max(col("__ca")).as("__ca"), max(col("__cb")).as("__cb"))
      .agg(coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
        coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("n_both"),
        count(lit(1)).as("n_union"))
      .select(col("n_a"), col("n_b"), col("n_both"), col("n_union"),
        when(col("n_both") > 0, na * nb / m).as("lincoln_petersen"),
        ((na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0).as("chapman"),
        ((na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0 -
          col("n_union").cast("double")).as("est_missed"),
        when(col("n_b") > 0, m / nb).as("coverage_a"),
        when(col("n_a") > 0, m / na).as("coverage_b"))
  }

  /** Common-neighbor link prediction over BIPARTITE evidence — the
    * collective-linkage signal textual comparators can't see: two entity
    * records that share many relational neighbors (suppliers shipping the
    * same parts, accounts touching the same devices, authors on the same
    * papers) are match candidates even when their names disagree. Input is
    * the (entity, neighbor) edge table; output is one row per entity pair
    * with ≥ `minCommon` shared neighbors:
    *
    *  - `common_neighbors` — |Γ(a) ∩ Γ(b)|, the raw count;
    *  - `neighborhood_jaccard` — |Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)|, the
    *    degree-normalized variant (a pair sharing 5 of 6 neighbors
    *    outranks one sharing 5 of 500).
    *
    * Scale shape: edges are distinct-ed once, then pairs are generated BY
    * NEIGHBOR with the house 3-tier skew contract — a hub neighbor (a
    * commodity part every supplier ships) is exactly the hot-bucket shape
    * that melts a reducer, so neighbors over `bucketCap` route through the
    * salted grid ([[saltedSelfJoin]], lossless) and neighbors over
    * `hardCap` are dropped (opt-in, default lossless; a finite cap
    * requires evaluating [[droppedBuckets]] on the (neighbor → key) frame
    * alongside — hubs carry little identity signal anyway, which is why
    * capping them is the standard move). The per-pair count then needs NO
    * intersection recomputation: each surviving (neighbor, pair) row
    * contributes 1 to one map-side-combinable groupBy, and degrees join
    * back on the entity key. Σ common over all pairs = Σ_nb n·(n−1)/2, so
    * hub capping is also the volume-observability story. */
  def commonNeighborPairs(edges: DataFrame, entityCol: String,
      neighborCol: String, minCommon: Long = 1L, bucketCap: Int = 1000,
      hardCap: Int = Int.MaxValue, saltGroups: Int = 16): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    // The distinct edge frame fans out to FIVE consumers (deg, sized, the
    // eligibility join, and the two final degree joins) — without a
    // materialization each one re-evaluates the whole upstream pipeline
    // (for winnowing/CDC callers that is the full sha256 fingerprint
    // pass, measured 4 extra recomputes in the physical plan). One lazy
    // localCheckpoint computes it exactly once (guide §5 "cut lineage" /
    // §1.2 step 1: don't compute things twice).
    val e = edges
      .select(col(entityCol).as("id"), col(neighborCol).as("nb"))
      .where(col("id").isNotNull && col("nb").isNotNull)
      .distinct()
      .localCheckpoint(eager = false)
    val deg = e.groupBy(col("id")).agg(count(lit(1)).as("__deg"))
    val sized = e.groupBy(col("nb")).agg(count(lit(1)).as("__n"))
    // A pair's common-neighbor count is bounded by min(deg_a, deg_b), so
    // entities with deg < minCommon cannot appear in the output: drop them
    // BEFORE pair generation (provably lossless — the final
    // `common_neighbors >= minCommon` filter would discard every pair they
    // touch anyway). Tier routing and the dropped-bucket record stay on the
    // UNFILTERED bucket sizes (`sized` above), so which buckets are
    // cold/salted/dropped is unchanged — only ineligible members leave the
    // buckets. On high-minCommon workloads (shared-span winnowing) this
    // shrinks the quadratic bucket explosion by orders of magnitude.
    val eligible =
      if (minCommon > 1L)
        e.join(deg.where(col("__deg") >= minCommon).select(col("id")), "id")
      else e
    val keyed = eligible.join(sized, "nb")
    val good = keyed.where(col("__n") <= bucketCap)
    val cold = good.select(col("nb"), col("id").as("url_a"))
      .join(good.select(col("nb"), col("id").as("url_b")), "nb")
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"))
    val hot = keyed.where(col("__n") > bucketCap && col("__n") <= hardCap)
      .select(col("nb").as("key"), col("id").as("url"))
    val hotPairs = saltedSelfJoin(hot, saltGroups)
      .select(col("url_a"), col("url_b"))
    cold.union(hotPairs)
      .groupBy(col("url_a"), col("url_b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .where(col("common_neighbors") >= minCommon)
      .join(deg.select(col("id").as("url_a"), col("__deg").as("__da")), "url_a")
      .join(deg.select(col("id").as("url_b"), col("__deg").as("__db")), "url_b")
      .select(col("url_a"), col("url_b"), col("common_neighbors"),
        (col("common_neighbors").cast("double") /
          (col("__da") + col("__db") - col("common_neighbors"))
            .cast("double")).as("neighborhood_jaccard"))
  }

  /** Adamic-Adar weighting for the same pairs — Σ_{z ∈ Γ(a)∩Γ(b)}
    * 1/ln(deg z): rare shared neighbors count more than hubs. ln() is
    * libm-dependent across engines, so this face is spec-pinned in sbt
    * (vs hand-computed fixtures), never hash-gate-faced — gate on
    * [[commonNeighborPairs]] instead. Neighbors of degree 1 appear in no
    * pair; degree-2+ gives ln ≥ ln 2 > 0, so the division is safe. */
  def adamicAdarPairs(edges: DataFrame, entityCol: String,
      neighborCol: String, minCommon: Long = 1L, bucketCap: Int = 1000,
      hardCap: Int = Int.MaxValue, saltGroups: Int = 16): DataFrame = {
    require(minCommon >= 1)
    // same single-materialization rationale as [[commonNeighborPairs]]
    val e = edges
      .select(col(entityCol).as("id"), col(neighborCol).as("nb"))
      .where(col("id").isNotNull && col("nb").isNotNull)
      .distinct()
      .localCheckpoint(eager = false)
    val sized = e.groupBy(col("nb")).agg(count(lit(1)).as("__n"))
    // same lossless min(deg) prefilter as [[commonNeighborPairs]]: tier
    // routing stays on unfiltered sizes, only ineligible members leave
    val deg0 = e.groupBy(col("id")).agg(count(lit(1)).as("__deg"))
    val eligible =
      if (minCommon > 1L)
        e.join(deg0.where(col("__deg") >= minCommon).select(col("id")), "id")
      else e
    val keyed = eligible.join(sized, "nb")
    val good = keyed.where(col("__n") <= bucketCap)
    val cold = good.select(col("nb"), col("__n"), col("id").as("url_a"))
      .join(good.select(col("nb"), col("id").as("url_b")), "nb")
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"), col("__n"))
    // carry the neighbor degree through the grid as payload
    val hot = keyed.where(col("__n") > bucketCap && col("__n") <= hardCap)
      .select(col("nb").as("key"), col("id").as("url"), col("__n"))
    val hotPairs = saltedSelfJoin(hot, saltGroups, payload = Seq("__n"))
      .select(col("url_a"), col("url_b"), col("__n_a").as("__n"))
    cold.union(hotPairs)
      .groupBy(col("url_a"), col("url_b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(lit(1.0) / log(col("__n").cast("double"))).as("adamic_adar"))
      .where(col("common_neighbors") >= minCommon)
  }

  /** Candidate-pair PROVENANCE across blocking key families — the audit
    * answering "which scheme found this pair": given multi-family key
    * assignments (family, key, url), emit each candidate pair once with
    * the SORTED set of families that produced it and the number of
    * (family, key) blocks it co-occurred in. The view that justifies
    * keeping (or retiring) a blocking family: a family whose pairs are
    * all co-covered elsewhere is pure cost.
    *
    * Per-(family, key) blocks over `bucketCap` are excluded (the cold
    * tier's own rule — provenance describes the pairs the pipeline would
    * actually generate); feed hot families through [[candidatePairs]]'
    * salted tiers separately if their pairs matter. Shapes: one sizing
    * groupBy + join-back, one equi-self-join per qualifying block, one
    * pair-keyed groupBy whose collect_set is bounded by the family count
    * (sorted and comma-joined — a flat string, pinned order,
    * hash-reproducible and join-friendly downstream). */
  def pairProvenance(keys: DataFrame, bucketCap: Int = 200,
      familyCol: String = "family", keyCol: String = "key",
      idCol: String = "url"): DataFrame = {
    require(bucketCap >= 1, s"bucketCap must be >= 1, got $bucketCap")
    val sized = keys.groupBy(col(familyCol), col(keyCol))
      .agg(count(lit(1)).as("__n")).where(col("__n") <= bucketCap)
      .select(col(familyCol), col(keyCol))
    val good = keys.join(sized, Seq(familyCol, keyCol))
    val a = good.select(col(familyCol), col(keyCol), col(idCol).as("url_a"))
    val b = good.select(col(familyCol), col(keyCol), col(idCol).as("url_b"))
    a.join(b, Seq(familyCol, keyCol)).where(col("url_a") < col("url_b"))
      .groupBy(col("url_a"), col("url_b"))
      .agg(array_join(sort_array(collect_set(col(familyCol))), ",")
        .as("families"), count(lit(1)).as("n_keys"))
  }

  /** Pairs-completeness / reduction tradeoff CURVE over candidate bucket
    * caps — the capacity-planning sweep (Christen's PC/RR analysis) run
    * BEFORE committing to a cap: for each cap c,
    *
    *  - `pair_slots` — Σ n(n−1)/2 over blocks with n ≤ c, in
    *    decimal(38,0) (the [[blockingProfile]] slot convention: per-block
    *    pair slots BEFORE cross-key dedup — an upper bound on distinct
    *    candidates, exact when keys don't overlap);
    *  - `n_true_covered` / `pairs_completeness` — a labeled true pair
    *    survives cap c iff its SMALLEST shared block fits (≤ c): exactly
    *    the pairs [[candidatePairs]]' cold tier would generate, counted
    *    without materializing any pair set.
    *
    * One sizing groupBy over the key frame, two equi-joins landing the
    * block size on each truth pair's shared keys, one min-fold per truth
    * pair, then a |caps|-way exploded map-side-combined count (the
    * [[thresholdSweep]] shape). Truth pairs sharing NO key count as
    * never covered. Caps with no qualifying block still emit a row.
    * Output: (cap, pair_slots, n_true, n_true_covered,
    * pairs_completeness), one row per cap ascending. */
  def blockingQualitySweep(keys: DataFrame, truePairs: DataFrame,
      caps: Seq[Long], keyCol: String = "key", idCol: String = "url",
      aCol: String = "url_a", bCol: String = "url_b"): DataFrame = {
    require(caps.nonEmpty, "blockingQualitySweep needs at least one cap")
    require(caps.forall(_ >= 1) && caps == caps.sorted &&
      caps.distinct == caps,
      s"caps must be >= 1, strictly increasing, got $caps")
    val spark = keys.sparkSession
    val capArr = array(caps.map(lit(_)): _*)
    val dec = "decimal(38,0)"
    val sizes = keys.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val slots = sizes
      .select(col("__n"), explode(capArr).as("cap"))
      .groupBy(col("cap"))
      .agg(sum(when(col("__n") <= col("cap"),
        (col("__n").cast(dec) * (col("__n") - 1).cast(dec)) / 2)
        .otherwise(lit(0))).cast(dec).as("pair_slots"))
    val ka = keys.select(col(keyCol).as("__k"), col(idCol).as(aCol))
    val kb = keys.select(col(keyCol).as("__k"), col(idCol).as(bCol))
    val tp = truePairs.select(col(aCol), col(bCol)).distinct()
    val minShared = tp
      .join(ka, aCol).join(kb, Seq("__k", bCol))
      .join(sizes.withColumnRenamed(keyCol, "__k"), "__k")
      .groupBy(col(aCol), col(bCol)).agg(min(col("__n")).as("__minn"))
    val cov = tp.join(minShared, Seq(aCol, bCol), "left")
      .select(explode(capArr).as("cap"),
        when(col("__minn").isNotNull && col("__minn") <= col("cap"), 1L)
          .otherwise(0L).as("__c"))
      .groupBy(col("cap")).agg(sum(col("__c")).as("n_true_covered"))
    val nTrue = tp.agg(count(lit(1)).as("n_true"))
    val allCaps = spark.range(1).select(explode(capArr).as("cap"))
    allCaps
      .join(slots, Seq("cap"), "left")
      .join(cov, Seq("cap"), "left")
      .crossJoin(broadcast(nTrue))
      .select(col("cap"),
        coalesce(col("pair_slots"), lit(0).cast(dec)).as("pair_slots"),
        col("n_true"),
        coalesce(col("n_true_covered"), lit(0L)).as("n_true_covered"),
        when(col("n_true") > 0, coalesce(col("n_true_covered"), lit(0L))
          .cast("double") / col("n_true").cast("double"))
          .as("pairs_completeness"))
  }

  /** B-cubed sufficient statistics: for records carrying a predicted
    * cluster id and a reference (truth) partition id, emit one row per
    * predicted cluster and one per truth class — (side, gid, n_g,
    * sum_ni2) where sum_ni2 = Σ over the opposite partition of the
    * squared intersection size. ALL-INTEGER aggregates (count + sum of
    * products), so the frame is exactly reproducible regardless of
    * partitioning — the hash-gradable face of B-cubed; [[bCubed]] folds
    * it into the scalar metrics. Shapes: two partial-combined groupBys
    * over the (cluster, truth) contingency counts. */
  def bCubedStats(assignments: DataFrame, clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): DataFrame = {
    val ni = assignments.groupBy(col(clusterCol), col(truthCol))
      .agg(count(lit(1)).as("__ni"))
    val perCluster = ni.groupBy(col(clusterCol))
      .agg(sum(col("__ni")).as("n_g"),
        sum(col("__ni") * col("__ni")).as("sum_ni2"))
      .select(lit("cluster").as("side"), col(clusterCol).cast("string").as("gid"),
        col("n_g"), col("sum_ni2"))
    val perTruth = ni.groupBy(col(truthCol))
      .agg(sum(col("__ni")).as("n_g"),
        sum(col("__ni") * col("__ni")).as("sum_ni2"))
      .select(lit("truth").as("side"), col(truthCol).cast("string").as("gid"),
        col("n_g"), col("sum_ni2"))
    perCluster.union(perTruth)
  }

  /** B-cubed precision / recall / F1 (Bagga & Baldwin 1998) of a predicted
    * clustering vs a reference partition — the standard CLUSTER-level ER
    * metric next to pairwise F1 (B³ rewards correctly-sized clusters,
    * penalizing both over-merging and over-splitting per record):
    * precision = (1/N) Σ_records |C(r) ∩ T(r)| / |C(r)|, which reduces to
    * (1/N) Σ_clusters sum_ni2 / n_g over [[bCubedStats]]; recall is the
    * mirror over truth classes. */
  def bCubed(assignments: DataFrame, clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): (Double, Double, Double) = {
    val stats = bCubedStats(assignments, clusterCol, truthCol).cache()
    try {
      val n = assignments.count().toDouble
      def fold(side: String): Double = stats.where(col("side") === side)
        .agg(sum(col("sum_ni2").cast("double") / col("n_g").cast("double")))
        .head().getDouble(0) / n
      val p = fold("cluster")
      val r = fold("truth")
      val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
      (p, r, f1)
    } finally stats.unpersist()
  }

  /** MUC link-based metric (Vilain et al., MUC-6 1995) of a predicted
    * clustering vs a reference partition — the third classic ER/coref
    * metric next to [[bCubedStats]] (mention-weighted) and
    * [[adjustedRandStats]] (chance-corrected pair counting): MUC counts
    * the MINIMUM LINK EDITS to reconcile the two partitions. Recall =
    * Σ_t (n_t − p_t) / Σ_t (n_t − 1) over truth classes t, where p_t =
    * #predicted clusters class t is scattered across (links missing to
    * reunite it); precision mirrors with roles swapped. Singletons carry
    * zero weight — MUC's known blind spot, which is exactly why the three
    * metrics ship together.
    *
    * One pass to the contingency counts (map-side combining groupBy),
    * then two class-count aggregates folded to one row each and a 1-row
    * broadcast cross join; the numerators/denominators are exact 64-bit
    * integers, P/R one exact division each (null when the denominator is
    * 0 — all classes singleton = no evidence), f1 pinned to
    * 2·p·r/(p+r), 0.0 when p + r = 0, null if either side is null. */
  def mucStats(assignments: DataFrame, clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): DataFrame = {
    val ni = assignments
      .groupBy(col(clusterCol).as("g"), col(truthCol).as("t"))
      .agg(count(lit(1)).as("ni"))
    val byT = ni.groupBy(col("t"))
      .agg(sum(col("ni")).as("n"), count(lit(1)).as("p"))
      .agg(sum(col("n") - col("p")).as("recall_num"),
        sum(col("n") - 1).as("recall_den"))
    val byG = ni.groupBy(col("g"))
      .agg(sum(col("ni")).as("n"), count(lit(1)).as("q"))
      .agg(sum(col("n") - col("q")).as("precision_num"),
        sum(col("n") - 1).as("precision_den"))
    byG.crossJoin(broadcast(byT))
      .withColumn("muc_precision", when(col("precision_den") > 0,
        col("precision_num").cast("double") / col("precision_den").cast("double")))
      .withColumn("muc_recall", when(col("recall_den") > 0,
        col("recall_num").cast("double") / col("recall_den").cast("double")))
      .withColumn("muc_f1",
        when(col("muc_precision").isNull || col("muc_recall").isNull,
          lit(null).cast("double"))
          .when(col("muc_precision") + col("muc_recall") > 0,
            lit(2.0) * col("muc_precision") * col("muc_recall") /
              (col("muc_precision") + col("muc_recall")))
          .otherwise(lit(0.0)))
  }

  /** Adjusted Rand Index (Hubert & Arabie 1985) of a predicted clustering
    * vs a reference partition — the chance-corrected pair-counting metric
    * next to [[bCubed]] (ARI = 0 for a random clustering, 1 for a perfect
    * one, negative for worse-than-chance). One row: (n, s_ij, s_a, s_b,
    * ari) where s_ij = Σ C(n_ij,2) over the contingency cells, s_a / s_b
    * the marginal pair sums, and
    *   ari = (2·N·s_ij − 2·s_a·s_b) / (N·(s_a+s_b) − 2·s_a·s_b),
    * N = C(n,2) — the formula cleared of fractions so everything up to
    * the final division is INTEGER arithmetic. Pair sums are folded in
    * decimal(38,0) (long products overflow at ~3e9 records — the
    * [[blockingQuality]] lesson); the cleared products stay exact to
    * n ≈ 10^9 and the one double division is the only rounding anywhere.
    * NULL when the denominator is 0 (both partitions trivial — all
    * singletons or one block: chance correction is undefined).
    *
    * Shapes: one groupBy over the (cluster, truth) contingency counts,
    * two marginal groupBys over THAT (cell-count-sized) frame, three
    * 1-row aggregates cross-joined — no window, no collect beyond the
    * 1-row frames Spark folds itself. */
  def adjustedRandStats(assignments: DataFrame,
      clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): DataFrame = {
    val dec = "decimal(38,0)"
    def pairs2(c: Column): Column = // 2·C(x,2) = x·(x−1), decimal-exact
      (c.cast(dec) * (c.cast(dec) - 1))
    val ni = assignments.groupBy(col(clusterCol), col(truthCol))
      .agg(count(lit(1)).as("__ni"))
    val sij = ni.agg(sum(pairs2(col("__ni"))).as("s2_ij"),
      sum(col("__ni")).as("__n"))
    val sa = ni.groupBy(col(clusterCol)).agg(sum(col("__ni")).as("__na"))
      .agg(sum(pairs2(col("__na"))).as("s2_a"))
    val sb = ni.groupBy(col(truthCol)).agg(sum(col("__ni")).as("__nb"))
      .agg(sum(pairs2(col("__nb"))).as("s2_b"))
    // s2_* carry 2·ΣC(·,2); N2 = 2·C(n,2) = n·(n−1). Substituting into
    // the cleared form and scaling numerator and denominator to a common
    // factor of 8: ari = 2·(N2·s2_ij − s2_a·s2_b) /
    // (N2·(s2_a+s2_b) − 2·s2_a·s2_b) — every term a decimal INTEGER, no
    // intermediate division anywhere.
    sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("__num",
        lit(2).cast(dec) * (col("__n").cast(dec) * (col("__n").cast(dec) - 1)
          * col("s2_ij") - col("s2_a") * col("s2_b")))
      .withColumn("__den",
        col("__n").cast(dec) * (col("__n").cast(dec) - 1)
          * (col("s2_a") + col("s2_b")) - lit(2).cast(dec) * col("s2_a")
          * col("s2_b"))
      .select(col("__n").cast("long").as("n"),
        (col("s2_ij") / 2).cast("long").as("s_ij"),
        (col("s2_a") / 2).cast("long").as("s_a"),
        (col("s2_b") / 2).cast("long").as("s_b"),
        when(col("__den") =!= 0,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("ari"))
  }

  /** Partition-agreement metrics that complete the pair-counting family
    * beside [[adjustedRandStats]] / [[bCubedStats]] / [[mucStats]]: the
    * raw pair confusion counts (tp/fp/fn/tn), the UNADJUSTED Rand index
    * (Rand 1971), the Fowlkes-Mallows index (Fowlkes & Mallows 1983,
    * FM = tp / sqrt((tp+fp)·(tp+fn)) = the geometric mean of pairwise
    * precision and recall), and the Talburt-Wang index (Talburt 2011,
    * TW = sqrt(|A|·|B|) / V with V = #non-empty contingency overlaps —
    * the ER-textbook metric that needs NO pair counts at all, only
    * cluster counts, so it stays meaningful on singleton-heavy linkage
    * output where MUC goes null).
    *
    * Same shapes and exactness discipline as [[adjustedRandStats]]: one
    * contingency groupBy, two marginal groupBys over the cell-sized
    * frame, three 1-row aggregates broadcast-cross-joined; pair sums
    * folded in decimal(38,0) (long products overflow at ~3e9 records),
    * every count exact, and the only rounding is the final double
    * division / sqrt (sqrt is IEEE-correctly-rounded, so any engine
    * replaying the same integer inputs reproduces the doubles bit-exactly).
    * rand_index is null when n < 2 (no pairs to count); fowlkes_mallows
    * is null when either side has no intra-cluster pair (precision or
    * recall undefined); talburt_wang is null only on an empty input.
    *
    * Also emits the unit-cost Generalized Merge Distance (Menestrina,
    * Whang & Garcia-Molina, VLDB 2010) — the EDIT distance between the
    * two partitions: transforming clusters→truth takes exactly
    * `gmd_splits` = V − |A| splits (each cluster spanning k truth cells
    * needs k−1 splits; Σ(k−1) = V − |A|) followed by
    * `gmd_merges` = V − |B| merges (the V fragments then assemble into
    * the |B| truth clusters), so `gmd` = 2V − |A| − |B|, all integer —
    * 0 iff the partitions are identical. Unlike pair-counting metrics
    * GMD is linear in clusters, not pairs, so it never saturates on a
    * singleton-heavy corpus. */
  def partitionAgreementStats(assignments: DataFrame,
      clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): DataFrame = {
    val dec = "decimal(38,0)"
    def pairs2(c: Column): Column = // 2·C(x,2) = x·(x−1), decimal-exact
      (c.cast(dec) * (c.cast(dec) - 1))
    val ni = assignments.groupBy(col(clusterCol), col(truthCol))
      .agg(count(lit(1)).as("__ni"))
    val cells = ni.agg(sum(pairs2(col("__ni"))).as("s2_ij"),
      sum(col("__ni")).as("__n"), count(lit(1)).as("v"))
    val sa = ni.groupBy(col(clusterCol)).agg(sum(col("__ni")).as("__na"))
      .agg(sum(pairs2(col("__na"))).as("s2_a"), count(lit(1)).as("ca"))
    val sb = ni.groupBy(col(truthCol)).agg(sum(col("__ni")).as("__nb"))
      .agg(sum(pairs2(col("__nb"))).as("s2_b"), count(lit(1)).as("cb"))
    val n2 = col("__n").cast(dec) * (col("__n").cast(dec) - 1) // 2·C(n,2)
    cells.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(
        col("__n").cast("long").as("n"), col("ca"), col("cb"), col("v"),
        (col("s2_ij") / 2).cast("long").as("tp"),
        ((col("s2_a") - col("s2_ij")) / 2).cast("long").as("fp"),
        ((col("s2_b") - col("s2_ij")) / 2).cast("long").as("fn"),
        ((n2 - col("s2_a") - col("s2_b") + col("s2_ij")) / 2).cast("long")
          .as("tn"),
        when(n2 > 0,
          (lit(2).cast(dec) * col("s2_ij") + n2 - col("s2_a") - col("s2_b"))
            .cast("double") / n2.cast("double")).as("rand_index"),
        when(col("s2_a") > 0 && col("s2_b") > 0,
          (col("s2_ij") / 2).cast("double") /
            sqrt((col("s2_a") / 2).cast("double") *
              (col("s2_b") / 2).cast("double"))).as("fowlkes_mallows"),
        when(col("v") > 0,
          sqrt(col("ca").cast("double") * col("cb").cast("double")) /
            col("v").cast("double")).as("talburt_wang"),
        (col("v") - col("ca")).as("gmd_splits"),
        (col("v") - col("cb")).as("gmd_merges"),
        (lit(2L) * col("v") - col("ca") - col("cb")).as("gmd"))
  }

  /** Count-of-counts sufficient statistics for the INFORMATION-THEORETIC
    * cluster-agreement family (variation of information, NMI, V-measure
    * — [[informationMetrics]] folds the scalars). Entropies depend on the
    * partitions only through the MULTISETS of cell/cluster/truth sizes,
    * and a multiset of sizes compresses to (size, how-many-groups) rows —
    * at web scale billions of clusters collapse to the handful of
    * distinct sizes they take, which is what makes the histogram the
    * right persistence/gate face. Output: one row per
    * (side ∈ cell|cluster|truth, group_size) with its group count —
    * ALL-INTEGER (the house gate discipline: ln() is libm-dependent
    * across engines, so logs never touch a hash-gated face; compare
    * [[graft.operators.TextAnalysis]]'s log-free idf).
    *
    * Shapes: one contingency groupBy, two marginal groupBys over the
    * cell-sized frame, three count-of-counts groupBys over THOSE (all
    * map-side combinable) — nothing pair-shaped anywhere. */
  def informationStats(assignments: DataFrame,
      clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): DataFrame = {
    val ni = assignments.groupBy(col(clusterCol), col(truthCol))
      .agg(count(lit(1)).as("__ni"))
    def hist(sized: DataFrame, c: String, side: String): DataFrame =
      sized.groupBy(col(c).as("group_size"))
        .agg(count(lit(1)).as("n_groups"))
        .select(lit(side).as("side"), col("group_size"), col("n_groups"))
    hist(ni, "__ni", "cell")
      .unionAll(hist(ni.groupBy(col(clusterCol))
        .agg(sum(col("__ni")).as("__na")), "__na", "cluster"))
      .unionAll(hist(ni.groupBy(col(truthCol))
        .agg(sum(col("__ni")).as("__nb")), "__nb", "truth"))
  }

  /** Scalar information-theoretic agreement metrics folded from
    * [[informationStats]] — the third metric family beside pair counting
    * ([[adjustedRandStats]] / [[partitionAgreementStats]]) and link
    * editing ([[mucStats]] / GMD): entropy-based scores are the ones
    * that stay discriminative when cluster sizes are wildly skewed
    * (pair counts are dominated by the largest cluster's C(n,2); bits
    * are not). One row:
    *  - `h_cluster`, `h_truth`, `h_joint` — partition entropies in nats
    *    (H = ln n − Σ n_g·ln n_g / n, folded over the size histogram);
    *  - `mi` = H(A) + H(B) − H(A,B), clamped at ≥ 0 (the analytic value
    *    is non-negative; floating summation may land ulps below);
    *  - `vi` = 2·H(A,B) − H(A) − H(B) (Meilă 2003), clamped at ≥ 0 —
    *    the METRIC on partitions: 0 iff identical, triangle inequality
    *    holds, so drift between runs is comparable across corpora;
    *  - `nmi` = MI / ((H(A)+H(B))/2) — arithmetic-mean normalization;
    *  - `homogeneity` = 1 − H(B|A)/H(B), `completeness` = 1 − H(A|B)/H(A),
    *    `v_measure` = their harmonic mean (Rosenberg & Hirschberg 2007).
    *  Degenerate normalizers yield NULL, never a fake score (the
    *  [[graft.operators.Evaluation]] density/centralisation discipline;
    *  sklearn's 0-or-1 conventions at the same spots are arbitrary):
    *  `nmi` NULL when H(A)+H(B) = 0, `homogeneity` NULL when H(B) = 0,
    *  `completeness` NULL when H(A) = 0, `v_measure` NULL when either
    *  parent is NULL or hom+comp = 0.
    *
    * The fold runs as ONE aggregate over the histogram (model-sized —
    * the scalars are driver-safe but never leave the plan), with Σ
    * counts decimal-exact and ln() applied only at the final scalar
    * step. NOT hash-gate-faced (ln is libm-dependent across engines);
    * spec-pinned in sbt instead, where analytic fixtures are exact. */
  def informationMetrics(assignments: DataFrame,
      clusterCol: String = "cluster_id",
      truthCol: String = "truth_id"): DataFrame = {
    val st = informationStats(assignments, clusterCol, truthCol)
    // Σ n_groups·size (= n, identical per side) and Σ n_groups·size·ln(size)
    // per side; ln(1) = 0 exactly, so singleton mass drops out analytically.
    val agg = st.groupBy(col("side"))
      .agg(sum(col("n_groups") * col("group_size")).as("__tot"),
        sum(col("n_groups").cast("double") *
          col("group_size").cast("double") *
          log(col("group_size").cast("double"))).as("__slog"))
    def side(sideName: String, h: String): DataFrame =
      agg.where(col("side") === sideName)
        .select(col("__tot").as(s"__n_$h"), col("__slog").as(s"__s_$h"))
    val j = side("cell", "ij").crossJoin(broadcast(side("cluster", "a")))
      .crossJoin(broadcast(side("truth", "b")))
    val n = col("__n_ij").cast("double")
    def entropy(slog: Column): Column = log(n) - slog / n
    val withH = j
      .withColumn("h_cluster", entropy(col("__s_a")))
      .withColumn("h_truth", entropy(col("__s_b")))
      .withColumn("h_joint", entropy(col("__s_ij")))
      .withColumn("mi", greatest(lit(0.0),
        col("h_cluster") + col("h_truth") - col("h_joint")))
      .withColumn("vi", greatest(lit(0.0),
        lit(2.0) * col("h_joint") - col("h_cluster") - col("h_truth")))
    withH.select(
      col("__n_ij").cast("long").as("n"),
      col("h_cluster"), col("h_truth"), col("h_joint"),
      col("mi"), col("vi"),
      when(col("h_cluster") + col("h_truth") > 0,
        col("mi") / ((col("h_cluster") + col("h_truth")) / 2.0)).as("nmi"),
      when(col("h_truth") > 0, // 1 − H(B|A)/H(B), H(B|A) = H(AB) − H(A)
        lit(1.0) - (col("h_joint") - col("h_cluster")) / col("h_truth"))
        .as("homogeneity"),
      when(col("h_cluster") > 0,
        lit(1.0) - (col("h_joint") - col("h_truth")) / col("h_cluster"))
        .as("completeness"))
      .withColumn("v_measure",
        when(col("homogeneity").isNotNull && col("completeness").isNotNull &&
          col("homogeneity") + col("completeness") > 0,
          lit(2.0) * col("homogeneity") * col("completeness") /
            (col("homogeneity") + col("completeness"))))
  }

  /** Weakest intra-cluster match edge per entity cluster — the
    * chain-break review queue: transitive clustering merges a~b~c even
    * when a~c never scored, so if a cluster is over-merged the culprit
    * is usually its lowest-scoring edge; this ranks WHERE to look
    * (complementing [[ClusterRepair]], which applies the reviewer's
    * verdicts once they've looked). One row per cluster with ≥ 1
    * intra-cluster edge: (clusterCol, n_edges, weak_ia, weak_ib,
    * weak_score) — the argmin edge, ties pinned to the smallest
    * (ia, ib), so the queue is deterministic and
    * partitioning-independent.
    *
    * Scale shape: two id-keyed equi-joins hang the cluster id on each
    * edge endpoint, then ONE min-combinable struct aggregate — no
    * window, no pair rematerialization; cost ∝ scored edges. */
  def weakestLinks(scored: DataFrame, assignment: DataFrame,
      idCol: String, clusterCol: String = "component",
      iaCol: String = "ka", ibCol: String = "kb",
      scoreCol: String = "score"): DataFrame = {
    val a1 = assignment.select(col(idCol).as("__wia"),
      col(clusterCol).as("__wca"))
    val a2 = assignment.select(col(idCol).as("__wib"),
      col(clusterCol).as("__wcb"))
    scored.select(col(iaCol).as("__wia"), col(ibCol).as("__wib"),
        col(scoreCol).as("__ws"))
      .join(a1, "__wia").join(a2, "__wib")
      .where(col("__wca") === col("__wcb"))
      .groupBy(col("__wca"))
      .agg(count(lit(1)).as("n_edges"),
        min(struct(col("__ws").as("s"), col("__wia").as("a"),
          col("__wib").as("b"))).as("__w"))
      .select(col("__wca").as(clusterCol), col("n_edges"),
        col("__w").getField("a").as("weak_ia"),
        col("__w").getField("b").as("weak_ib"),
        col("__w").getField("s").as("weak_score"))
  }

  /** Strongest CROSS-cluster scored pairs — the under-merge review queue,
    * the dual of [[weakestLinks]]: weakestLinks asks "which edge barely
    * holds this cluster together" (over-merge suspects); this asks
    * "which scored pair ALMOST merged two clusters" (under-merge
    * suspects — typically candidates that scored just below θ). Per
    * unordered cluster pair connected by at least one cross edge, the
    * top-k edges by (score DESC, ia, ib) plus the total cross-edge count
    * `n_cross` — a cluster pair held apart by many near misses is the
    * first merge a reviewer confirms.
    *
    * Only records present in `assignment` participate (inner joins);
    * callers who want never-matched singletons in the queue pass a
    * completed assignment (id → singleton id) — the
    * [[graft.operators.EntityIds]] convention.
    *
    * Output: (cluster_a, cluster_b, ia, ib, score, rank, n_cross) with
    * cluster_a < cluster_b and rank 1-based per cluster pair.
    *
    * Scale shape: two id-keyed equi-joins hang cluster ids on the edge
    * endpoints; the count is one map-side-combinable groupBy; the top-k
    * window's ≤ k filter sits directly above row_number, so
    * InferWindowGroupLimit bounds every map task to k rows per cluster
    * pair before the shuffle. Cost ∝ scored edges; nothing quadratic in
    * clusters or records. */
  def nearMissPairs(scored: DataFrame, assignment: DataFrame,
      idCol: String, clusterCol: String = "component",
      iaCol: String = "ka", ibCol: String = "kb",
      scoreCol: String = "score", k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a1 = assignment.select(col(idCol).as("__nia"),
      col(clusterCol).as("__nca"))
    val a2 = assignment.select(col(idCol).as("__nib"),
      col(clusterCol).as("__ncb"))
    val cross = scored.select(col(iaCol).as("__nia"), col(ibCol).as("__nib"),
        col(scoreCol).as("__ns"))
      .join(a1, "__nia").join(a2, "__nib")
      .where(col("__nca") =!= col("__ncb"))
      .select(least(col("__nca"), col("__ncb")).as("cluster_a"),
        greatest(col("__nca"), col("__ncb")).as("cluster_b"),
        col("__nia").as("ia"), col("__nib").as("ib"), col("__ns").as("score"))
    val counts = cross.groupBy(col("cluster_a"), col("cluster_b"))
      .agg(count(lit(1)).as("n_cross"))
    cross
      .withColumn("rank", row_number().over(
        W.partitionBy(col("cluster_a"), col("cluster_b"))
          .orderBy(col("score").desc, col("ia"), col("ib"))))
      .where(col("rank") <= k)
      .join(counts, Seq("cluster_a", "cluster_b"))
      .select(col("cluster_a"), col("cluster_b"), col("ia"), col("ib"),
        col("score"), col("rank"), col("n_cross"))
  }

  /** Pairwise precision/recall/F1 of predicted match pairs vs labeled true
    * pairs, both restricted to candidate pairs (= pairs sharing a blocking
    * key, per BASELINE.json:2,14). */
  def pairwiseF1(predicted: DataFrame, labeled: DataFrame,
      candidates: DataFrame): (Double, Double, Double) = {
    val cand = candidates.select(col("url_a"), col("url_b"))
    val truePairs = labeled.join(cand, Seq("url_a", "url_b"), "left_semi")
    val pred = predicted.select(col("url_a"), col("url_b"))
    val tp = pred.join(truePairs, Seq("url_a", "url_b"), "left_semi").count().toDouble
    val fp = pred.join(truePairs, Seq("url_a", "url_b"), "left_anti").count().toDouble
    val fn = truePairs.join(pred, Seq("url_a", "url_b"), "left_anti").count().toDouble
    val precision = if (tp + fp == 0) 1.0 else tp / (tp + fp)
    val recall = if (tp + fn == 0) 1.0 else tp / (tp + fn)
    val f1 = if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
    (precision, recall, f1)
  }

  /** Decision-threshold sweep: for each θ in `thetas`, the confusion
    * counts and P/R/F1 of "match ⇔ score ≥ θ" against `labeled` true
    * pairs — the operating-curve view a θ choice should be read off
    * (complements the model-driven μ/λ calibration in
    * [[FellegiSunter.calibrate]] with a label-driven one).
    *
    * One pass over the scored pairs: each row fans out to the thresholds
    * it clears (explode over a literal array, |θ| small) and partial
    * aggregation folds to |θ| groups map-side, so the added cost over a
    * single count is ~|θ| comparisons per row — no per-θ rescan, no
    * window. `labeled` pairs carry a left-join flag; fn = n_true − tp
    * against ALL labeled pairs, so truth lost by blocking shows up as
    * irreducible fn (the recall ceiling [[blockingQuality]] measures).
    *
    * All counts are 64-bit integers; precision/recall are one exact
    * long→double division each (null when the denominator is 0 — no
    * evidence, not perfection); f1 = 2·p·r/(p+r) with that exact
    * evaluation order, 0.0 when tp = 0. Output: (theta, n_pred, tp, fp,
    * fn, precision, recall, f1), one row per θ, present even when
    * nothing clears it. */
  def thresholdSweep(scored: DataFrame, labeled: DataFrame,
      thetas: Seq[Double], aCol: String = "id_l", bCol: String = "id_r",
      scoreCol: String = "score"): DataFrame = {
    require(thetas.nonEmpty, "thresholdSweep needs at least one threshold")
    val thetaArr = array(thetas.map(lit(_)): _*)
    val flagged = scored.select(col(aCol), col(bCol), col(scoreCol))
      .join(labeled.select(col(aCol), col(bCol), lit(1L).as("__t"))
        .distinct(), Seq(aCol, bCol), "left")
      .select(col(scoreCol), coalesce(col("__t"), lit(0L)).as("__t"))
    val perTheta = flagged
      .select(col(scoreCol), col("__t"), explode(thetaArr).as("theta"))
      .where(col(scoreCol) >= col("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_pred"), sum(col("__t")).as("tp"))
    val allThetas = scored.sparkSession.range(1)
      .select(explode(thetaArr).as("theta"))
    val nTrue = labeled.select(col(aCol), col(bCol)).distinct()
      .agg(count(lit(1)).as("__ntrue"))
    allThetas.join(perTheta, Seq("theta"), "left")
      .crossJoin(broadcast(nTrue))
      .select(col("theta"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        col("__ntrue"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("__ntrue") - col("tp"))
      .withColumn("precision", when(col("n_pred") > 0,
        col("tp").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall", when(col("__ntrue") > 0,
        col("tp").cast("double") / col("__ntrue").cast("double")))
      .withColumn("f1", when(col("tp") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(lit(0.0)))
      .select(col("theta"), col("n_pred"), col("tp"), col("fp"), col("fn"),
        col("precision"), col("recall"), col("f1"))
  }

  /** Unlinkables analysis — Splink's `unlinkables_chart` recast for a
    * candidate-pair world: for each threshold θ, how many RECORDS have no
    * scored pair at or above θ touching them at all. A record is
    * unlinkable at θ when its best incident score is below θ — or when
    * blocking never produced a pair for it (best = no evidence), which
    * counts at EVERY θ. This is the per-record complement of
    * [[thresholdSweep]]'s per-pair view: the sweep says how the pair
    * decisions trade off, this says what fraction of the corpus a θ
    * choice strands with zero matches — the curve read off before
    * promising "every registry row links to the crawl".
    *
    * Shapes: one endpoint-explode + map-side-combinable max per record
    * (pair-sized in, record-sized out), one left join onto the record
    * frame, then the [[thresholdSweep]] explode discipline — each record
    * fans out to all |θ| literals and partial aggregation folds to |θ|
    * groups map-side. No window, nothing quadratic; every θ row is
    * present by construction (each record contributes to each θ group).
    *
    * All counts are longs; `frac_unlinkable` is one exact long→double
    * division. `records` must carry distinct ids (it is the corpus
    * frame, not the pair frame). Output: (theta, n_records,
    * n_unlinkable, frac_unlinkable), one row per θ. */
  def unlinkables(records: DataFrame, scored: DataFrame,
      thetas: Seq[Double], idCol: String = "url",
      aCol: String = "url_a", bCol: String = "url_b",
      scoreCol: String = "score"): DataFrame = {
    require(thetas.nonEmpty, "unlinkables needs at least one threshold")
    val thetaArr = array(thetas.map(lit(_)): _*)
    val best = scored.select(col(aCol).as("__uid"), col(scoreCol).as("__us"))
      .unionAll(scored.select(col(bCol).as("__uid"),
        col(scoreCol).as("__us")))
      .groupBy(col("__uid")).agg(max(col("__us")).as("__ubest"))
    records.select(col(idCol).as("__uid"))
      .join(best, Seq("__uid"), "left")
      .select(col("__ubest"), explode(thetaArr).as("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_records"),
        count(when(col("__ubest").isNull || col("__ubest") < col("theta"),
          lit(1))).as("n_unlinkable"))
      .withColumn("frac_unlinkable",
        col("n_unlinkable").cast("double") / col("n_records").cast("double"))
      .select(col("theta"), col("n_records"), col("n_unlinkable"),
        col("frac_unlinkable"))
  }

  /** Deterministic decision-rule cascade — the rule-based half of a
    * production linkage (the NHS-number-then-demographics pattern):
    * an ORDERED list of named match rules is evaluated per candidate
    * pair and the FIRST rule that fires decides the pair, carrying its
    * name and 1-based rank as provenance. Pairs no rule accepts are
    * dropped (they fall through to the probabilistic scorer — this is
    * the deterministic pre-pass, not the whole decision).
    *
    * The cascade compiles to ONE when-chain projection (first-match-wins
    * is exactly WHEN's evaluation order), so however many rules are
    * stacked, the pass stays a single whole-stage-codegen map over the
    * pair frame — no per-rule scan, no shuffle, and Catalyst pushes the
    * chain below any later join the caller adds. Rule predicates are
    * arbitrary Columns over the pair frame (kernel similarities,
    * [[Comparators]] levels, phonetic keys — anything codegen'd).
    *
    * @param rules (name, predicate), strongest/cheapest first; names
    *              must be unique and non-empty.
    * @return the input columns + (rule, rule_rank) for accepted pairs. */
  def ruleCascade(pairs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "ruleCascade needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size &&
      rules.forall(_._1.nonEmpty),
      s"rule names must be unique and non-empty, got ${rules.map(_._1)}")
    val rank = rules.zipWithIndex.reverse.foldLeft(lit(null).cast("long")) {
      case (acc, ((_, pred), i)) => when(pred, lit(i + 1L)).otherwise(acc)
    }
    val name = rules.zipWithIndex.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((n, _), i)) => when(col("rule_rank") === (i + 1L), lit(n))
        .otherwise(acc)
    }
    pairs.withColumn("rule_rank", rank)
      .where(col("rule_rank").isNotNull)
      .withColumn("rule", name)
  }

  /** Cluster-generation diff — the audit an incremental-ER deployment
    * runs after every re-clustering: each (old cluster, new cluster)
    * overlap cell with both marginal sizes and a classification:
    * `stable` (the cell IS both clusters — the entity rode through
    * unchanged), `merge` (the old cluster was absorbed whole into a
    * larger new one), `split` (the new cluster was carved whole out of a
    * larger old one), `reshuffle` (records crossed cluster boundaries
    * both ways — the cells to eyeball before shipping). Only ids present
    * in BOTH assignments participate (adds/removes are a plain anti-join
    * the caller owns; mixing them in here would make every marginal
    * ambiguous).
    *
    * Shapes: one equi-join on the record id, one contingency groupBy
    * (map-side combine), two marginal groupBys over the CELL-sized
    * frame, two cell-sized join-backs. Nothing corpus-sized is
    * windowed. */
  def clusterDiff(oldAsg: DataFrame, newAsg: DataFrame, idCol: String,
      oldCol: String = "cluster_id", newCol: String = "cluster_id"): DataFrame = {
    val o = oldAsg.select(col(idCol).as("__id"), col(oldCol).as("old_id"))
    val n = newAsg.select(col(idCol).as("__id"), col(newCol).as("new_id"))
    val cells = o.join(n, "__id").groupBy(col("old_id"), col("new_id"))
      .agg(count(lit(1)).as("n"))
    val oSize = cells.groupBy(col("old_id")).agg(sum(col("n")).as("n_old"))
    val nSize = cells.groupBy(col("new_id")).agg(sum(col("n")).as("n_new"))
    cells.join(oSize, "old_id").join(nSize, "new_id")
      .withColumn("kind",
        when(col("n") === col("n_old") && col("n") === col("n_new"),
          lit("stable"))
          .when(col("n") === col("n_old"), lit("merge"))
          .when(col("n") === col("n_new"), lit("split"))
          .otherwise(lit("reshuffle")))
      .select(col("old_id"), col("new_id"), col("n"), col("n_old"),
        col("n_new"), col("kind"))
  }

  /** Cluster repair from reviewer decisions — the write-back half of the
    * human-in-the-loop workflow ([[FellegiSunter.uncertaintySample]]
    * produces the review queue; this applies its verdicts to an existing
    * assignment without re-running the whole pipeline). Pinned,
    * order-free semantics:
    *
    *  1. MUST-LINK: clusters merge transitively — connected components
    *     over the assignment's star edges (id → cluster_id) plus the
    *     must edges ([[ConnectedComponents]] min-id roots).
    *  2. CANNOT-LINK: for every cannot pair whose endpoints land in the
    *     same merged cluster, the LARGER id is EVICTED to a singleton.
    *     One pass suffices and is order-free: eviction targets are a
    *     pure function of the merged assignment (every violated pair
    *     loses its max side; a singleton cannot violate anything).
    *  3. Survivors relabel to the min surviving id of their cluster
    *     (evictions can remove a cluster's old root).
    *
    *  A pair present in BOTH constraint sets fails loudly — that is a
    *  data bug upstream, not a tie to break silently. Cannot-links that
    *  would contradict must-links TRANSITIVELY (a≡b merged via must,
    *  a≢b via cannot) also fail loudly: silently evicting one side of an
    *  explicit must-link lies to the reviewer.
    *
    * Shapes: the audited CC plan over (corpus star edges + review-sized
    * must edges), two review-sized joins for the cannot check, one
    * min-per-cluster groupBy + join-back for the relabel. */
  def clusterRepair(assignment: DataFrame, mustLink: DataFrame,
      cannotLink: DataFrame, idCol: String = "id",
      clusterCol: String = "cluster_id",
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val asg = assignment.select(col(idCol).as("__id"),
      col(clusterCol).as("__c"))
    val must = mustLink.select(least(col(aCol), col(bCol)).as("la"),
      greatest(col(aCol), col(bCol)).as("lb")).where(col("la") =!= col("lb"))
      .distinct()
    val cannot = cannotLink.select(least(col(aCol), col(bCol)).as("la"),
      greatest(col(aCol), col(bCol)).as("lb")).where(col("la") =!= col("lb"))
      .distinct()
    require(must.join(cannot, Seq("la", "lb"), "left_semi").isEmpty,
      "clusterRepair: the same pair appears in mustLink AND cannotLink")

    // 1. merge: CC over star edges + must edges (min-id roots); ids not
    // touched by any edge keep their own component implicitly
    val starEdges = asg.where(col("__id") =!= col("__c"))
      .select(col("__id").as("la"), col("__c").as("lb"))
    val comp = ConnectedComponents.run(starEdges.union(must))
      .withColumnRenamed("component", "__m")
    val merged = asg.join(comp.withColumnRenamed("id", "__id"),
        Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__m"), col("__id")).as("__m"))

    // explicit-contradiction guard: a cannot pair merged by MUST edges
    // alone (not by the pre-existing assignment) is reviewer self-
    // contradiction — check against CC over must edges only
    val mustComp = ConnectedComponents.run(must)
      .withColumnRenamed("component", "__mc")
    val mustSide = mustComp.withColumnRenamed("id", "la")
      .withColumnRenamed("__mc", "mca")
    val mustSideB = mustComp.withColumnRenamed("id", "lb")
      .withColumnRenamed("__mc", "mcb")
    require(cannot.join(mustSide, Seq("la"), "left")
      .join(mustSideB, Seq("lb"), "left")
      .where(col("mca").isNotNull && col("mca") === col("mcb")).isEmpty,
      "clusterRepair: a cannotLink pair is transitively must-linked")

    // 2. evict the larger side of every violated cannot pair
    val ma = merged.select(col("__id").as("la"), col("__m").as("ma"))
    val mb = merged.select(col("__id").as("lb"), col("__m").as("mb"))
    val evicted = cannot.join(ma, "la").join(mb, "lb")
      .where(col("ma") === col("mb"))
      .select(col("lb").as("__id")).distinct()

    // 3. relabel survivors to the min surviving id per merged cluster
    val survivors = merged.join(evicted, Seq("__id"), "left_anti")
    val roots = survivors.groupBy(col("__m")).agg(min(col("__id")).as("__r"))
    survivors.join(roots, "__m")
      .select(col("__id").as(idCol), col("__r").as(clusterCol))
      .union(evicted.select(col("__id").as(idCol),
        col("__id").as(clusterCol)))
  }
}
