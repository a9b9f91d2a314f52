package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Webtext-corpus operators: URL canonicalization (the blocking key /
  * exact-dedup key for crawl data) and host-level aggregate stats (the
  * inputs to host-level filtering decisions — boilerplate farms, mirror
  * hosts, domain quality cuts).
  *
  * Every rewrite is a chained codegen `regexp_replace`/`regexp_extract`
  * restricted to the Java∩RE2 regex dialect (no lookahead, no
  * backreference REPLACEMENTS — Java spells them `$1`, RE2 spells them
  * `\1`, so a pattern that needs one cannot be oracle-shared), which lets
  * the DuckDB driver oracle apply the IDENTICAL pattern strings.
  */
object WebText {

  /** Canonicalized URL, pinned rewrite order:
    *  1. drop the fragment (`#...`);
    *  2. drop tracking params (`utm_*`, `fbclid`, `gclid`) and their
    *     value — applied ONLY to the query string (everything from the
    *     first `?`), so an RFC 3986 sub-delim `&` in the PATH
    *     (`/item&gclid=x/details`) is never touched, and anchored to the
    *     `?`/`&` delimiter within it, so a param whose name merely
    *     CONTAINS a tracker name (`?xgclid=5`) or a VALUE spelling one
    *     (`?q=utm_source=t`, `?x=2?gclid=3`) survives. Backreference
    *     replacements differ between Java (`$1`) and RE2 (`\1`), so the
    *     anchors are preserved by three backref-free rules over the query
    *     string: `&tracker=v` drops with its own `&`; `^?tracker=v&`
    *     rewrites to the literal `?`; a lone `^?tracker=v$` drops;
    *  3. tidy a dangling `?` or `&`;
    *  4. lowercase the scheme://host[:port] head (paths stay case-
    *     sensitive per RFC 3986 — only the head is case-insensitive);
    *  5. drop an explicit default port (`:80`/`:443` — pinned: both
    *     stripped regardless of scheme) at the end of the head;
    *  6. drop leading `www.` host labels (the whole `www.www.` chain in
    *     one pass, so normalization is idempotent on that rule).
    * Strings without a `scheme://` head pass through steps 1-3 unchanged
    * otherwise. A pure per-row projection: zero shuffle at any scale. */
  def normalizeUrl(u: Column): Column = {
    val trk = "(utm_[a-z]+|fbclid|gclid)"
    val u1 = regexp_replace(u, "#.*", "")
    // split at the FIRST '?': tracker rules see only the query string
    val qpos = instr(u1, "?")
    val pre = when(qpos > 0, u1.substr(lit(1), qpos - 1)).otherwise(u1)
    val qs0 = when(qpos > 0, u1.substr(qpos, length(u1))).otherwise(lit(""))
    val qs1 = regexp_replace(qs0, s"&$trk=[^&#]*", "")
    val qs2 = regexp_replace(qs1, s"^\\?$trk=[^&#]*&", "?")
    val qs3 = regexp_replace(qs2, s"^\\?$trk=[^&#]*$$", "")
    val qs = regexp_replace(qs3, "[?&]$", "")
    val u3 = concat(pre, qs)
    val head = regexp_extract(u3, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = u3.substr(length(head) + lit(1), length(u3))
    val headNorm = regexp_replace(
      regexp_replace(lower(head), ":(80|443)$", ""), "://(www\\.)+", "://")
    concat(headNorm, rest)
  }

  /** Host (authority, ports/userinfo included — run on [[normalizeUrl]]
    * output for a canonical host) of a URL; '' when there is no
    * `scheme://` head. */
  def hostOf(u: Column): Column =
    regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)

  /** Host-level aggregate stats for domain-filtering decisions. All
    * aggregates are integer (counts, exact distinct via content hash,
    * code-point length sums) and the one fraction is a single division of
    * two exact integers — so the frame is reproducible bit-for-bit by any
    * ANSI engine, and every aggregate partial-combines map-side (the
    * groupBy on host is the only shuffle; hosts are numerous and the
    * heaviest host is AQE-splittable in the partial stage). */
  def hostStats(docs: DataFrame, hostCol: String, textCol: String): DataFrame =
    docs
      .select(col(hostCol).as("host"),
        sha2(encode(col(textCol), "UTF-8"), 256).as("h"),
        length(col(textCol)).cast("long").as("chars"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_pages"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum(col("chars")).as("total_chars"),
        max(col("chars")).as("max_chars"))
      .select(col("host"), col("n_pages"), col("n_distinct_texts"),
        ((col("n_pages") - col("n_distinct_texts")).cast("double") /
          col("n_pages").cast("double")).as("dup_page_frac"),
        col("total_chars"), col("max_chars"))
}
