package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record construction (survivorship): collapse each entity
  * cluster produced by [[ConnectedComponents]] into ONE canonical record
  * by per-attribute survivorship rules — the final stage of the linkage
  * pipeline (blocking → scoring → clustering → canonicalize), and the
  * piece a downstream consumer actually reads (MDM vocabulary:
  * "survivorship" / "golden record").
  *
  * Every rule is a deterministic, ORDER-INSENSITIVE aggregate, so the
  * canonical frame is bit-identical regardless of partitioning — the same
  * replay-stability contract the rest of the pipeline carries:
  *
  *  - `longest`: the longest non-null string; ties broken by the
  *    lexicographically smallest (via `min(struct(-length, value))` — a
  *    single min-combinable struct aggregate, no window).
  *  - `mode`: the most frequent non-null value; ties broken by the
  *    smallest value. Two chained map-side-combinable groupBys
  *    (cluster×value counts, then a min-struct fold) — never a window,
  *    never a collect.
  *  - `min` / `max`: plain null-ignoring extrema.
  *  - `prefer:<priorityCol>`: SOURCE-TRUST survivorship — the value from
  *    the record with the smallest `<priorityCol>` (the MDM "source
  *    priority" rule: a curated feed outranks a crawled one); ties
  *    within a priority break to the smallest value. One
  *    min-combinable struct aggregate `min(struct(priority, value))`,
  *    null values excluded so an empty high-trust field never shadows a
  *    populated lower-trust one. The priority column itself must be
  *    non-null (struct ordering would sort a NULL priority FIRST —
  *    i.e. silently most-trusted); map unknown sources to an explicit
  *    sentinel rank before calling.
  *
  * The canonical id is always `min(idCol)` (matching the min-node-id root
  * convention of [[ConnectedComponents]]), and `n_members` counts the
  * cluster's records.
  *
  * Scale shape: one inner equi-join (records ⋈ assignment on id — both
  * sides shuffle on the id they are already keyed by), then one groupBy
  * per the base + one (groupBy → groupBy → broadcast-sized join) chain
  * per `mode` column. Nothing is quadratic in cluster size; a hot
  * mega-cluster costs its row count, not its pair count.
  *
  * @param records    one row per record, carrying `idCol` + attributes
  * @param assignment (idCol, clusterCol) as produced by the clustering
  *                   stage; records without an assignment row are dropped
  *                   (they belong to no entity)
  * @param rules      (attributeColumn, rule) with rule in
  *                   longest | mode | min | max
  */
object Canonicalize {

  private val ValidRules = Set("longest", "mode", "min", "max")

  def goldenRecords(records: DataFrame, assignment: DataFrame,
      idCol: String, clusterCol: String = "component",
      rules: Seq[(String, String)] = Seq.empty): DataFrame = {
    val bad = rules.collect {
      case (c, r) if !ValidRules(r) && !r.startsWith("prefer:") => s"$c:$r"
    }
    require(bad.isEmpty,
      s"unknown survivorship rule(s) ${bad.mkString(", ")} — " +
        s"valid: ${ValidRules.mkString("|")}|prefer:<priorityCol>")

    val joined = records.join(assignment.select(col(idCol), col(clusterCol)),
      idCol)

    // base + all non-mode rules in ONE aggregate pass
    def longestAgg(c: String): Column =
      min(when(col(c).isNotNull,
        struct((-length(col(c))).as("nl"), col(c).as("v"))))
        .getField("v").as(c)
    val aggCols: Seq[Column] =
      count(lit(1)).as("n_members") +:
        rules.collect {
          case (c, "longest") => longestAgg(c)
          case (c, "min")     => min(col(c)).as(c)
          case (c, "max")     => max(col(c)).as(c)
          case (c, r) if r.startsWith("prefer:") =>
            val pc = r.stripPrefix("prefer:")
            min(when(col(c).isNotNull,
              struct(col(pc).as("p"), col(c).as("v"))))
              .getField("v").as(c)
        }
    val base = joined.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as(idCol), aggCols: _*)

    // each mode column: cluster×value counts, then a min-struct fold to
    // (count DESC, value ASC) — two shuffles on (cluster[, value]), both
    // map-side combined; result is cluster-count-sized
    rules.collect { case (c, "mode") => c }.foldLeft(base) { (acc, c) =>
      val m = joined.where(col(c).isNotNull)
        .groupBy(col(clusterCol), col(c))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(col(clusterCol))
        .agg(min(struct((-col("__cnt")).as("nc"), col(c).as("v")))
          .getField("v").as(c))
      acc.join(m, Seq(clusterCol), "left")
    }
  }

  /** Field-level survivorship provenance (the MDM lineage view): for
    * each golden column, WHICH record supplied the canonical value —
    * defined uniformly as the smallest record id in the cluster whose
    * column equals the chosen value. Rule-agnostic by design: it audits
    * the golden frame AS PRODUCED (whatever rule produced it), so it
    * works unchanged for longest/mode/min/max/prefer and stays
    * deterministic and order-insensitive. Output = `golden` plus one
    * `<col>_src` id per requested attribute (NULL when the canonical
    * value is NULL — nothing supplied it).
    *
    * Scale shape: per attribute, one map-side-combinable
    * (cluster, value) → min(id) aggregate over member records and one
    * equi-join against the cluster-count-sized golden frame; nothing
    * touches pairs, and a hot cluster costs its row count. */
  def goldenProvenance(records: DataFrame, assignment: DataFrame,
      golden: DataFrame, idCol: String, clusterCol: String = "component",
      cols: Seq[String] = Seq.empty): DataFrame = {
    require(cols.nonEmpty, "need at least one attribute column")
    val joined = records.join(
      assignment.select(col(idCol), col(clusterCol)), idCol)
    cols.foldLeft(golden) { (acc, c) =>
      val srcs = joined.where(col(c).isNotNull)
        .groupBy(col(clusterCol).as("__pc"), col(c).as("__pv"))
        .agg(min(col(idCol)).as(s"${c}_src"))
      acc.join(srcs,
          acc(clusterCol) === srcs("__pc") && acc(c) === srcs("__pv"),
          "left")
        .drop("__pc", "__pv")
    }
  }

  /** Over-merge audit: single-valuedness (functional-dependency)
    * violations per cluster — the QA step BETWEEN clustering and
    * survivorship. A field declared entity-unique (one SSN, one birth
    * date, one canonical URL per entity) taking two distinct non-null
    * values inside one cluster is the loudest over-merge signal there
    * is, and it is exactly the evidence survivorship then DESTROYS (the
    * golden record keeps one value and the conflict disappears) — so
    * the audit must run on the member records, not the golden frame.
    *
    * Output: one row per (cluster, field) WITH a conflict —
    * (clusterCol, field, n_values, n_nonnull, value_min, value_max):
    * distinct non-null value count (> 1 by construction), non-null
    * member count, and the extreme values as evidence. Values are
    * compared and reported AS STRINGS (fields of any type audit
    * uniformly; the cast is the audit's equality, documented not
    * hidden). Clean clusters and all-null fields produce no rows.
    *
    * Scale shape: one equi-join on the record id, one map-literal
    * explode (|fields| rows per record — fields are a handful by
    * nature), one map-side-combinable groupBy. A hot mega-cluster
    * costs its row count; nothing pairs, nothing windows, nothing
    * collects. */
  def mergeConflicts(records: DataFrame, assignment: DataFrame,
      idCol: String, fields: Seq[String],
      clusterCol: String = "component"): DataFrame = {
    require(fields.nonEmpty, "need at least one field to audit")
    val joined = records
      .select(col(idCol) +: fields.map(f => col(f).cast("string").as(f)): _*)
      .join(assignment.select(col(idCol), col(clusterCol)), idCol)
    joined
      .select(col(clusterCol),
        explode(map(fields.flatMap(f => Seq(lit(f), col(f))): _*))
          .as(Seq("field", "value")))
      .where(col("value").isNotNull)
      .groupBy(col(clusterCol), col("field"))
      .agg(countDistinct(col("value")).as("n_values"),
        count(lit(1)).as("n_nonnull"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"))
      .where(col("n_values") > 1)
  }

  /** Incremental golden-record maintenance — the continuous-crawl seam
    * that completes the incremental chain ([[Dedup.bandIndex]] makes
    * candidate generation incremental, [[ConnectedComponents.addEdges]]
    * makes clustering incremental; this makes the LAST stage
    * incremental): given the previous canonical frame and the old/new
    * cluster assignments, recompute ONLY the clusters whose membership
    * changed and keep every other golden row verbatim.
    *
    * Dirty-set derivation (handles new records, moves, merges, splits,
    * AND deletions in one shape): an id whose (id → cluster) mapping
    * changed — including appearing or disappearing — marks its OLD
    * cluster stale; every surviving member of a stale old cluster drags
    * its NEW cluster into the recompute set (a cluster that lost a
    * member must be rebuilt even though its remaining members never
    * moved). No cascade beyond that one hop is possible: recomputation
    * reads each dirty cluster's FULL membership from the new
    * assignment, so it is exact regardless of how many ids arrived.
    *
    * Equivalence contract (spec-pinned and gate-checked): if
    * `previousGolden` == `goldenRecords(oldRecords, oldAssignment, …)`
    * with the SAME rules, the result is bit-identical to
    * `goldenRecords(records, newAssignment, …)` — incremental is a cost
    * refactoring, not new semantics. Cluster ids must be stable for
    * untouched components (the min-member-id convention of
    * [[ConnectedComponents]] guarantees this).
    *
    * Scale shape: change detection is ONE id-keyed full-outer join of
    * the two assignments (both sides shuffle on the id they are already
    * keyed by); everything downstream — the two semi-joins, the anti-
    * join, and the [[goldenRecords]] recompute — is proportional to the
    * records of TOUCHED clusters, not the corpus. A daily batch over a
    * 10^12-record corpus costs the batch's neighborhood, not a full
    * canonicalization.
    *
    * @param previousGolden output of [[goldenRecords]] on the old state
    *                       (same `rules`, same `clusterCol`/`idCol`)
    * @param oldAssignment  (idCol, clusterCol) the previous frame was
    *                       built from
    * @param newAssignment  (idCol, clusterCol) after folding the batch in
    * @param records        CURRENT records (must cover every id in
    *                       `newAssignment`; deleted ids simply absent)
    */
  def goldenRecordsIncremental(previousGolden: DataFrame,
      oldAssignment: DataFrame, newAssignment: DataFrame,
      records: DataFrame, idCol: String, clusterCol: String = "component",
      rules: Seq[(String, String)] = Seq.empty): DataFrame = {
    val oldA = oldAssignment.select(col(idCol).as("__id"),
      col(clusterCol).as("__oc"))
    val newA = newAssignment.select(col(idCol).as("__id"),
      col(clusterCol).as("__nc"))
    val changed = oldA.join(newA, Seq("__id"), "full_outer")
      .where(col("__oc").isNull || col("__nc").isNull ||
        col("__oc") =!= col("__nc"))
    val staleOld = changed.where(col("__oc").isNotNull)
      .select(col("__oc")).distinct()
    // new clusters to rebuild: those holding a changed id, plus those
    // holding any surviving member of a stale old cluster
    val dirtyNew = changed.where(col("__nc").isNotNull)
      .select(col("__nc").as("__c"))
      .union(oldA.join(staleOld, Seq("__oc"), "left_semi")
        .join(newA, Seq("__id")).select(col("__nc").as("__c")))
      .distinct()
    val dropKeys = staleOld.select(col("__oc").as(clusterCol))
      .union(dirtyNew.select(col("__c").as(clusterCol))).distinct()
    val kept = previousGolden.join(dropKeys, Seq(clusterCol), "left_anti")
    val dirtyAsg = newAssignment.join(
      dirtyNew.select(col("__c").as(clusterCol)), Seq(clusterCol),
      "left_semi")
    kept.unionByName(goldenRecords(records, dirtyAsg, idCol, clusterCol, rules))
  }
}
