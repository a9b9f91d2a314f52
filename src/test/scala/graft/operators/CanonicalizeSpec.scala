package graft.operators

import graft.SparkFunSuite

/** Golden-record survivorship on hand-computed clusters: rule semantics,
  * pinned tie-breaks, null handling, and unassigned-record exclusion. */
class CanonicalizeSpec extends SparkFunSuite {

  import spark.implicits._

  private lazy val records = Seq(
    // cluster 10: names of differing length (tie on length 5), segs with
    // a 2-1 mode, one null bal
    (1L, "anne", "AUTO", Some(5.0)),
    (2L, "annie", "AUTO", None),
    (3L, "annia", "BIKE", Some(3.0)),
    // cluster 20: all-null name, seg mode tied 1-1 → smallest value
    (4L, null, "CARS", Some(9.0)),
    (5L, null, "BIKE", Some(7.0)),
    // unassigned — must not appear anywhere
    (6L, "zzzzzzzz", "ZZZZ", Some(99.0))).toDF("id", "name", "seg", "bal")

  private lazy val assignment = Seq(
    (1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L))
    .toDF("id", "component")

  test("longest / mode / min / max rules with pinned tie-breaks") {
    val g = Canonicalize.goldenRecords(records, assignment, "id",
        rules = Seq("name" -> "longest", "seg" -> "mode", "bal" -> "max"))
      .orderBy("component").collect()
    assert(g.length == 2)
    // cluster 10: canonical id 1, 3 members; longest name tie annie/annia
    // → lexicographically smaller "annia"? no: both length 5, min value
    // wins → "annia"; seg mode AUTO (2 of 3); max bal 5.0
    val r10 = g(0)
    assert(r10.getAs[Long]("component") == 10L)
    assert(r10.getAs[Long]("id") == 1L)
    assert(r10.getAs[Long]("n_members") == 3L)
    assert(r10.getAs[String]("name") == "annia")
    assert(r10.getAs[String]("seg") == "AUTO")
    assert(r10.getAs[Double]("bal") == 5.0)
    // cluster 20: all names null → null survives; seg tie BIKE/CARS →
    // smallest "BIKE"; max bal 9.0
    val r20 = g(1)
    assert(r20.getAs[Long]("id") == 4L)
    assert(r20.isNullAt(r20.fieldIndex("name")))
    assert(r20.getAs[String]("seg") == "BIKE")
    assert(r20.getAs[Double]("bal") == 9.0)
  }

  test("min rule and no-rules base frame") {
    val g = Canonicalize.goldenRecords(records, assignment, "id",
        rules = Seq("bal" -> "min"))
      .orderBy("component").collect()
    assert(g(0).getAs[Double]("bal") == 3.0) // null bal ignored
    assert(g(1).getAs[Double]("bal") == 7.0)
    val base = Canonicalize.goldenRecords(records, assignment, "id")
    assert(base.columns.toSeq == Seq("component", "id", "n_members"))
    assert(base.count() == 2)
  }

  test("result is partitioning-independent") {
    val r1 = Canonicalize.goldenRecords(records.repartition(7), assignment,
      "id", rules = Seq("name" -> "longest", "seg" -> "mode"))
      .orderBy("component").collect().toSeq
    val r2 = Canonicalize.goldenRecords(records.coalesce(1), assignment,
      "id", rules = Seq("name" -> "longest", "seg" -> "mode"))
      .orderBy("component").collect().toSeq
    assert(r1 == r2)
  }

  test("prefer: rule takes the smallest-priority value, null-safe") {
    import spark.implicits._
    val recs = Seq(
      // cluster 1: curated (prio 1) has NULL value -> crawl (2) survives
      (1L, null.asInstanceOf[String], 1L),
      (2L, "crawl-name", 2L),
      // cluster 2: priority tie -> smallest value; prio 1 beats longer
      (10L, "zzz", 1L), (11L, "aaa", 1L), (12L, "much-longer-name", 2L))
      .toDF("id", "name", "prio")
    val asg = Seq(1L -> 100L, 2L -> 100L, 10L -> 200L, 11L -> 200L,
      12L -> 200L).toDF("id", "component")
    val g = Canonicalize.goldenRecords(recs, asg, "id",
        rules = Seq("name" -> "prefer:prio"))
      .orderBy("component").collect()
    assert(g(0).getAs[String]("name") == "crawl-name")
    assert(g(1).getAs[String]("name") == "aaa")
  }

  test("unknown rule raises a clear error") {
    val e = intercept[IllegalArgumentException] {
      Canonicalize.goldenRecords(records, assignment, "id",
        rules = Seq("name" -> "median"))
    }
    assert(e.getMessage.contains("name:median"))
  }

  test("goldenProvenance: smallest id supplying each canonical value, null-safe") {
    import org.apache.spark.sql.functions.col
    val golden = Canonicalize.goldenRecords(records, assignment, "id",
      rules = Seq("name" -> "longest", "seg" -> "mode", "bal" -> "max"))
    val got = Canonicalize.goldenProvenance(records, assignment, golden,
      "id", cols = Seq("name", "seg", "bal")).orderBy("component").collect()
    assert(got.length == 2)
    // cluster 10: name "annia" supplied by 3; seg AUTO first carried by 1;
    // bal 5.0 by 1
    val r10 = got(0)
    assert(r10.getAs[Long]("name_src") == 3L)
    assert(r10.getAs[Long]("seg_src") == 1L)
    assert(r10.getAs[Long]("bal_src") == 1L)
    // cluster 20: name canonical is NULL → no source; seg BIKE from 5
    val r20 = got(1)
    assert(r20.isNullAt(r20.fieldIndex("name_src")))
    assert(r20.getAs[Long]("seg_src") == 5L)
    assert(r20.getAs[Long]("bal_src") == 4L)
    // partitioning-independent
    val again = Canonicalize.goldenProvenance(records.repartition(7),
      assignment.coalesce(1), golden, "id", cols = Seq("name"))
      .orderBy("component").select(col("name_src")).collect().toSeq
    assert(again.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))) ==
      Seq(Some(3L), None))
    intercept[IllegalArgumentException](
      Canonicalize.goldenProvenance(records, assignment, golden, "id"))
  }

  test("incremental == full re-run across new ids, merges, splits, and deletions") {
    val rules = Seq("name" -> "longest", "seg" -> "mode", "bal" -> "max")
    def full(recs: org.apache.spark.sql.DataFrame,
        asg: org.apache.spark.sql.DataFrame) =
      Canonicalize.goldenRecords(recs, asg, "id", rules = rules)
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("component").collect().map(_.toSeq).toSeq

    // old state: clusters 10 = {1,2,3}, 20 = {4,5}, 30 = {7}, 40 = {8,9}
    val oldRecs = Seq(
      (1L, "anne", "AUTO", Some(5.0)), (2L, "annie", "AUTO", None),
      (3L, "annia", "BIKE", Some(3.0)), (4L, null, "CARS", Some(9.0)),
      (5L, null, "BIKE", Some(7.0)), (7L, "solo", "SOLO", Some(1.0)),
      (8L, "left", "PAIR", Some(2.0)), (9L, "right", "PAIR", Some(4.0)))
      .toDF("id", "name", "seg", "bal")
    val oldAsg = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (7L, 30L), (8L, 40L), (9L, 40L)).toDF("id", "component")
    val prev = full(oldRecs, oldAsg)

    // new state, exercising every transition at once:
    //  - new id 11 joins cluster 10 (grow)
    //  - clusters 20 and 30 merge into 20 (merge)
    //  - cluster 40 splits: 9 moves out to new singleton 90 (split)
    //  - id 3 deleted from the corpus (delete)
    //  - NO change to nothing... cluster 10 changes, so add untouched
    //    cluster 50 = {12,13} present in both states verbatim
    val oldRecs2 = oldRecs.union(
      Seq((12L, "calm", "SAME", Some(6.0)), (13L, "calmer", "SAME", None))
        .toDF("id", "name", "seg", "bal"))
    val oldAsg2 = oldAsg.union(Seq((12L, 50L), (13L, 50L)).toDF("id", "component"))
    val prev2 = full(oldRecs2, oldAsg2)
    val newRecs = oldRecs2.where($"id" =!= 3L).union(
      Seq((11L, "annabelle", "AUTO", Some(8.0)))
        .toDF("id", "name", "seg", "bal"))
    val newAsg = Seq((1L, 10L), (2L, 10L), (11L, 10L),
      (4L, 20L), (5L, 20L), (7L, 20L),
      (8L, 40L), (9L, 90L), (12L, 50L), (13L, 50L)).toDF("id", "component")

    val inc = Canonicalize.goldenRecordsIncremental(prev2, oldAsg2, newAsg,
      newRecs, "id", rules = rules)
    assert(sortedRows(inc) == sortedRows(full(newRecs, newAsg)))
    // the untouched cluster must come from the KEPT path, not recompute:
    // feed a poisoned previousGolden and check the poison survives only
    // for cluster 50
    import org.apache.spark.sql.functions.{col, lit, when}
    val poisoned = prev2.withColumn("name",
      when(col("component") === 50L, lit("POISON")).otherwise(col("name")))
    val incP = Canonicalize.goldenRecordsIncremental(poisoned, oldAsg2,
      newAsg, newRecs, "id", rules = rules)
    val p50 = incP.where(col("component") === 50L).collect()
    assert(p50.length == 1 && p50(0).getAs[String]("name") == "POISON")
    assert(incP.where(col("component") =!= 50L && col("name") === "POISON")
      .count() == 0)
    // no-op batch: identical assignments → previousGolden verbatim
    val noop = Canonicalize.goldenRecordsIncremental(prev2, oldAsg2, oldAsg2,
      oldRecs2, "id", rules = rules)
    assert(sortedRows(noop) == sortedRows(prev2))
  }

  test("mergeConflicts reports per-(cluster, field) single-valuedness violations") {
    // the shared fixture by hand:
    //  cluster 10 name:  anne/annie/annia   → 3 distinct  → conflict
    //  cluster 10 seg:   AUTO/AUTO/BIKE     → 2 distinct  → conflict
    //  cluster 10 bal:   5.0/null/3.0       → 2 distinct  → conflict ("3.0" < "5.0")
    //  cluster 20 name:  null/null          → no non-null → NO row
    //  cluster 20 seg:   CARS/BIKE          → conflict
    //  cluster 20 bal:   9.0/7.0            → conflict
    //  record 6 is unassigned → never participates
    val got = Canonicalize.mergeConflicts(records, assignment, "id",
        Seq("name", "seg", "bal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet
    assert(got == Set(
      (10L, "name", 3L, 3L, "anne", "annie"),
      (10L, "seg", 2L, 3L, "AUTO", "BIKE"),
      (10L, "bal", 2L, 2L, "3.0", "5.0"),
      (20L, "seg", 2L, 2L, "BIKE", "CARS"),
      (20L, "bal", 2L, 2L, "7.0", "9.0")))
    // single-valued everywhere → empty audit, and empty field list rejected
    val clean = Seq((1L, "x"), (2L, "x")).toDF("id", "v")
    val asg = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    assert(Canonicalize.mergeConflicts(clean, asg, "id", Seq("v")).count() == 0)
    intercept[IllegalArgumentException] {
      Canonicalize.mergeConflicts(clean, asg, "id", Seq.empty)
    }
  }
}
