package graft.operators

import graft.SparkFunSuite

class ProfilingSpec extends SparkFunSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("en"), Some("a")), (2L, Some("en"), None),
    (3L, Some("de"), Some("b")), (4L, None, Some("a")),
    (5L, Some("en"), Some("c")), (6L, Some("de"), None)
  ).toDF("id", "lang", "tag")

  test("profileColumns: rows, nulls, distinct, argmax top with pinned ties") {
    val got = Profiling.profileColumns(df, Seq("lang", "tag", "id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), r.getLong(5)))).toMap
    assert(got("lang") == ((6L, 1L, 2L, Some("en"), 3L)))
    // tag: 'a' x2 beats 'b','c' x1; two nulls
    assert(got("tag") == ((6L, 2L, 3L, Some("a"), 2L)))
    // id: all distinct — top tie broken by smallest string value "1"
    assert(got("id") == ((6L, 0L, 6L, Some("1"), 1L)))
  }

  test("profileColumns: all-null column and partitioning independence") {
    val withNull = df.withColumn("empty",
      org.apache.spark.sql.functions.lit(null).cast("string"))
    val got = Profiling.profileColumns(withNull, Seq("empty")).collect()(0)
    assert(got.getLong(1) == 6L && got.getLong(2) == 6L && got.getLong(3) == 0L)
    assert(got.isNullAt(4) && got.getLong(5) == 0L)
    val a = Profiling.profileColumns(df, Seq("lang", "tag"))
      .orderBy("col_name").collect().map(_.toSeq).toSeq
    val b = Profiling.profileColumns(df.repartition(5), Seq("lang", "tag"))
      .orderBy("col_name").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("profileColumns approxDistinct path: exact counts, sketched cardinality") {
    val got = Profiling.profileColumns(df, Seq("lang"), approxDistinct = true)
      .collect()(0)
    assert(got.getString(0) == "lang" && got.getLong(1) == 6L &&
      got.getLong(2) == 1L)
    assert(got.getLong(3) == 2L) // HLL exact at tiny cardinality
    assert(got.isNullAt(4))
  }

  test("topValues: k per column, count-desc value-asc order, nulls excluded") {
    val got = Profiling.topValues(df, Seq("lang", "tag"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got == Set(
      ("lang", "en", 3L, 1), ("lang", "de", 2L, 2),
      ("tag", "a", 2L, 1), ("tag", "b", 1L, 2)))
    intercept[IllegalArgumentException](Profiling.topValues(df, Seq(), 2))
  }
}
