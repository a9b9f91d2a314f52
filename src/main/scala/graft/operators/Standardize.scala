package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary-driven token standardization — the lookup-table
  * normalization step every production linkage runs BEFORE any fuzzy
  * kernel: nickname folding (bill → william), address abbreviation
  * expansion (st → street), unit/brand canonicalization. A fuzzy scorer
  * cannot recover these (jw("bill","william") = 0.73 is a confident
  * non-match); only a curated dictionary can, which is why Splink / the
  * Febrl lineage treat it as a separate pipeline stage.
  *
  * Semantics (pinned):
  *  - the value is split on the LITERAL separator (default one space —
  *    regex metacharacters in `sep` are quoted, not interpreted);
  *  - each token is looked up by EXACT match (callers wanting
  *    case/accent-insensitive folding compose under
  *    [[graft.functions.normalize_match]] — one normalization, shared
  *    with the blocking keys, instead of a second one hidden here);
  *  - mapped tokens are replaced, unmapped tokens pass through
  *    verbatim, and the result re-joins with the same separator;
  *  - `""` splits to [""] (the house [""]-artifact contract), so the
  *    empty string round-trips unless the dictionary maps "" itself;
  *  - NULL in → NULL out (split/transform/array_join all propagate).
  *
  * Scale shape: the dictionary folds into the plan as a map literal
  * (entries sorted by key so the plan — and therefore checkpoint
  * fingerprints — are deterministic), making the whole operator ONE
  * codegen projection: zero shuffles, zero joins, no broadcast needed
  * at any corpus size. Dictionaries are model-sized by nature (10²-10⁵
  * entries); [[dictionaryFromFrame]] is the bounded-collect seam for
  * dictionaries maintained as tables (the FellegiSunter
  * bounded-driver-work convention, ≤ `maxEntries` enforced loudly). */
object Standardize {

  /** Column form: standardize `c` token-by-token under `dict`. */
  def tokenDictionary(c: Column, dict: Map[String, String],
      sep: String = " "): Column = {
    require(sep.nonEmpty, "separator must be non-empty")
    if (dict.isEmpty) c
    else {
      val entries = dict.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      val m = map(entries: _*)
      array_join(
        transform(split(c, java.util.regex.Pattern.quote(sep)),
          t => coalesce(element_at(m, t), t)),
        sep)
    }
  }

  /** Frame form: `inCol` standardized into `outCol` (added or replaced). */
  def applyTokenDictionary(df: DataFrame, inCol: String, outCol: String,
      dict: Map[String, String], sep: String = " "): DataFrame =
    df.withColumn(outCol, tokenDictionary(col(inCol), dict, sep))

  /** Bounded-collect seam for dictionaries maintained as tables: reads
    * (`keyCol`, `valueCol`) rows into the driver-side Map the literal
    * path needs. Fails loudly on over-size dictionaries (the literal
    * plan is the wrong shape past ~10⁵ entries — at that point the
    * caller wants a broadcast join, and silence would hide the cliff),
    * on NULL keys/values, and on duplicate keys with CONFLICTING values
    * (a reviewer merge artifact that must not resolve arbitrarily). */
  def dictionaryFromFrame(dict: DataFrame, keyCol: String, valueCol: String,
      maxEntries: Int = 100000): Map[String, String] = {
    val rows = dict.select(col(keyCol).cast("string"),
        col(valueCol).cast("string"))
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"dictionary exceeds maxEntries=$maxEntries; use a broadcast join " +
        "for dictionaries this large")
    val pairs = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"dictionary has a NULL in ($keyCol, $valueCol): $r")
      (r.getString(0), r.getString(1))
    }
    pairs.groupBy(_._1).foreach { case (k, vs) =>
      require(vs.map(_._2).distinct.length == 1,
        s"dictionary key '$k' maps to conflicting values " +
          vs.map(_._2).distinct.mkString("[", ", ", "]"))
    }
    pairs.toMap
  }
}
