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

  test("columnValueOverlap: jaccard/containment per column pair, sparse") {
    import spark.implicits._
    val a = Seq(("1", "x"), ("2", "y"), ("3", "z"), ("3", "z"), (null, "w"))
      .toDF("ida", "taga")
    val b = Seq(("2", "p"), ("3", "q"), ("4", "r")).toDF("idb", "tagb")
    val got = Profiling.columnValueOverlap(a, Seq("ida", "taga"),
      b, Seq("idb", "tagb"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    // ida {1,2,3} vs idb {2,3,4}: common 2, union 4
    assert(got(("ida", "idb")) == ((3L, 3L, 2L, 0.5, 2.0 / 3.0, 2.0 / 3.0)))
    // disjoint pairs are ABSENT, not zero rows
    assert(!got.contains(("taga", "tagb")) && !got.contains(("taga", "idb")))
    assert(got.size == 1)
    // numeric cast alignment: ints match strings after the string cast
    val c = Seq(1, 2).toDF("n")
    val d = Seq("2", "5").toDF("s")
    val g2 = Profiling.columnValueOverlap(c, Seq("n"), d, Seq("s")).collect()
    assert(g2.length == 1 && g2(0).getLong(4) == 1L)
    intercept[IllegalArgumentException](
      Profiling.columnValueOverlap(a, Nil, b, Seq("idb")))
  }

  test("fdViolations: holds vs violated, null policy, pinned example") {
    import spark.implicits._
    val t = Seq(
      ("10115", "Berlin", "DE"), ("10115", "Berlin", "DE"),
      ("75001", "Paris", "FR"), ("75001", "Lutetia", "FR"), // violated
      ("00100", "Rome", "IT"), ("00100", null, "IT"),       // null rhs ok
      (null, "Nowhere", "XX")                               // null lhs out
    ).toDF("zip", "city", "cc")
    val got = Profiling.fdViolations(t,
      Seq(("zip", "city"), ("zip", "cc"), ("cc", "city")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val zc = got(("zip", "city"))
    assert(zc.getLong(2) == 3L && zc.getLong(3) == 1L)
    assert(zc.getDouble(4) == 1.0 / 3.0 && zc.getLong(5) == 2L)
    assert(zc.getString(6) == "75001")
    val cc = got(("zip", "cc"))
    assert(cc.getLong(3) == 0L && cc.isNullAt(6)) // FD holds
    val c2 = got(("cc", "city"))
    assert(c2.getLong(2) == 4L && c2.getLong(3) == 1L) // FR -> 2 cities
    assert(c2.getString(6) == "FR")
    intercept[IllegalArgumentException](Profiling.fdViolations(t, Nil))
  }

  test("hllRegisters: bucket/rho match a hand-rolled sha256 double-hash") {
    val vals = Seq("hello", "world", "en", "").toDF("v")
    val got = Profiling.hllRegisters(vals, Seq("v"), p = 12)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val expected = Seq("hello", "world", "en", "").map { s =>
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val rho = 33 - (64 - java.lang.Long.numberOfLeadingZeros(h2))
      (h1 % 4096, rho)
    }.groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(got == expected)
  }

  test("hllRegisters: dedup-invariant, null-skipping, partition-independent") {
    import org.apache.spark.sql.functions.col
    val dups = Seq("a", "a", "b", null, "b", "c").toDF("v")
    val dist = Seq("a", "b", "c").toDF("v")
    def regs(d: org.apache.spark.sql.DataFrame) =
      Profiling.hllRegisters(d, Seq("v"), p = 8)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(regs(dups) == regs(dist))
    assert(regs(dups.repartition(7)) == regs(dups))
    // merge of disjoint halves == registers of the union
    val whole = regs(Seq("a", "b", "c", "d").toDF("v"))
    val merged = Profiling.hllMergeRegisters(
      Profiling.hllRegisters(Seq("a", "b").toDF("v"), Seq("v"), 8),
      Profiling.hllRegisters(Seq("c", "d").toDF("v"), Seq("v"), 8))
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(merged == whole)
    // all-null column contributes no registers at all
    assert(Profiling.hllRegisters(
      Seq[String](null, null).toDF("v"), Seq("v"), 8).count() == 0L)
  }

  test("hllEstimate: within 6% of truth at 10k distinct, linear flag small") {
    import org.apache.spark.sql.functions.col
    val big = spark.range(10000).selectExpr("concat('key_', id) AS v")
    val est = Profiling.hllEstimate(
      Profiling.hllRegisters(big, Seq("v"), p = 12), p = 12).collect()(0)
    val e = est.getAs[Double]("estimate")
    assert(math.abs(e - 10000.0) / 10000.0 < 0.06, s"estimate $e")
    // tiny cardinality sits squarely in the linear-counting zone and the
    // corrected estimate lands very close to truth
    val small = Profiling.hllEstimate(
      Profiling.hllRegisters(df, Seq("lang"), p = 12), p = 12).collect()(0)
    assert(small.getAs[String]("correction") == "linear")
    assert(math.abs(small.getAs[Double]("estimate") - 2.0) < 0.1)
    intercept[IllegalArgumentException](
      Profiling.hllRawEstimate(Profiling.hllRegisters(df, Seq("lang"), 8), p = 6))
  }

  test("hllOverlapEstimate: inclusion-exclusion near truth, clamp on disjoint") {
    import org.apache.spark.sql.functions.col
    val a = spark.range(10000).selectExpr("concat('k', id) AS v") // k0..k9999
    val b = spark.range(5000, 15000).selectExpr("concat('k', id) AS v")
    val ra = Profiling.hllRegisters(a, Seq("v"), p = 12)
    val rb = Profiling.hllRegisters(b, Seq("v"), p = 12)
    val r = Profiling.hllOverlapEstimate(ra, rb, p = 12).collect()(0)
    // truth: |A|=|B|=10000, union 15000, inter 5000
    assert(math.abs(r.getAs[Double]("est_union") - 15000) / 15000.0 < 0.08)
    assert(math.abs(r.getAs[Double]("inter_est") - 5000) / 5000.0 < 0.25)
    val j = r.getAs[Double]("jaccard_est")
    assert(j > 0.2 && j < 0.46) // truth 1/3, sketch noise compounded
    // near-disjoint sets: inter_est may go negative; jaccard clamps to 0
    val c = spark.range(200).selectExpr("concat('x', id) AS v")
    val d = spark.range(200).selectExpr("concat('y', id) AS v")
    val r2 = Profiling.hllOverlapEstimate(
      Profiling.hllRegisters(c, Seq("v"), 12),
      Profiling.hllRegisters(d, Seq("v"), 12), 12).collect()(0)
    assert(r2.getAs[Double]("jaccard_est") < 0.05)
    assert(r2.getAs[Double]("jaccard_est") >= 0.0)
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

  // ------------------------------------------------------------------ KMV

  test("kmvSketch: k smallest distinct hashes, hand-checked, dedup/null-safe") {
    val src = spark.range(500).selectExpr(
      "concat('v', id % 100) AS v",                  // dups collapse
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('w', id) END AS w")
    val sk = Profiling.kmvSketch(src, Seq("v", "w"), k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val vRows = sk.filter(_._1 == "v").sortBy(_._2)
    assert(vRows.length == 16 && vRows.map(_._2).toList == (1L to 16L).toList)
    // hand-rolled reference: sha256 of each distinct value, 60-bit prefix
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val expect = (0 until 100).map(i => h60(s"v$i")).distinct.sorted.take(16)
    assert(vRows.map(_._3).toList == expect.toList)
    // hashes strictly increasing with rank; all nonnegative
    assert(sk.forall(_._3 >= 0L))
  }

  test("kmvMerge == sketch of the value union; merge is order-invariant") {
    val a = spark.range(300).selectExpr("concat('k', id) AS x")
    val b = spark.range(150, 450).selectExpr("concat('k', id) AS x")
    val skA = Profiling.kmvSketch(a, Seq("x"), 32)
    val skB = Profiling.kmvSketch(b, Seq("x"), 32)
    val direct = Profiling.kmvSketch(a.unionAll(b), Seq("x"), 32)
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    val merged = Profiling.kmvMerge(skA, skB, 32)
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    val mergedRev = Profiling.kmvMerge(skB, skA, 32)
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    assert(merged == direct && mergedRev == direct)
  }

  test("kmvEstimate: exact regime is exact; sketch regime within 15% at 10k") {
    val small = spark.range(40).selectExpr("concat('s', id) AS x")
    val eSmall = Profiling.kmvEstimate(
      Profiling.kmvSketch(small, Seq("x"), 256), 256).collect()(0)
    assert(eSmall.getAs[Boolean]("exact") &&
      eSmall.getAs[Double]("est_distinct") == 40.0d &&
      eSmall.getAs[Long]("n_seen") == 40L)
    val big = spark.range(10000).selectExpr("concat('b', id) AS x")
    val eBig = Profiling.kmvEstimate(
      Profiling.kmvSketch(big, Seq("x"), 256), 256).collect()(0)
    assert(!eBig.getAs[Boolean]("exact"))
    val est = eBig.getAs[Double]("est_distinct")
    assert(est > 8500.0 && est < 11500.0, s"est=$est")
  }

  test("kmvOverlap: direct jaccard near truth, disjoint exactly zero") {
    // truth: |A|=600, |B|=600, |A∩B|=300 → J = 1/3
    val a = spark.range(600).selectExpr("concat('k', id) AS ca")
    val b = spark.range(300, 900).selectExpr("concat('k', id) AS cb")
    val r = Profiling.kmvOverlap(
      Profiling.kmvSketch(a, Seq("ca"), 256),
      Profiling.kmvSketch(b, Seq("cb"), 256), 256).collect()(0)
    val j = r.getAs[Double]("jaccard_est")
    assert(j > 0.22 && j < 0.45, s"j=$j") // truth 1/3 ± sketch noise
    val inter = r.getAs[Double]("inter_est")
    assert(inter > 180.0 && inter < 430.0, s"inter=$inter")
    // disjoint → n_common = 0 → jaccard EXACTLY 0 (no estimator bias)
    val d = spark.range(600).selectExpr("concat('z', id) AS cd")
    val r2 = Profiling.kmvOverlap(
      Profiling.kmvSketch(a, Seq("ca"), 256),
      Profiling.kmvSketch(d, Seq("cd"), 256), 256).collect()(0)
    assert(r2.getAs[Long]("n_common") == 0L &&
      r2.getAs[Double]("jaccard_est") == 0.0d &&
      r2.getAs[Double]("inter_est") == 0.0d)
  }

  test("kmv frames are partitioning-independent; k bounds guarded") {
    val src = spark.range(2000).selectExpr("concat('p', id) AS x")
    val a = Profiling.kmvSketch(src.repartition(13), Seq("x"), 64)
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    val b = Profiling.kmvSketch(src, Seq("x"), 64)
      .orderBy("rnk").collect().map(_.toSeq).toSeq
    assert(a == b)
    intercept[IllegalArgumentException](Profiling.kmvSketch(src, Seq(), 64))
    intercept[IllegalArgumentException](Profiling.kmvSketch(src, Seq("x"), 8))
  }
}
