package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Splink-style comparator-level builders: pinned level assignments, the
  * null-as-missing guard, band validation, and integration with the FS
  * level fit. */
class ComparatorsSpec extends SparkFunSuite {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column,
      df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.select(c).collect().toSeq.map(r => if (r.isNullAt(0)) null else r.get(0))

  test("stringLevels: exact / fuzzy / disagree / missing") {
    val df = Seq(
      ("phillips", "phillips"), // exact -> 2
      ("phillips", "philips"),  // jw 0.955 >= 0.9 -> 1
      ("phillips", "zzz"),      // 0
      (null, "phillips")        // missing -> null
    ).toDF("a", "b")
    assert(one(Comparators.stringLevels(col("a"), col("b"), 0.9), df)
      == Seq(2L, 1L, 0L, null))
  }

  test("phoneticLevels: exact / soundex / disagree") {
    val df = Seq(
      ("robert", "robert"), // 2
      ("robert", "rupert"), // same soundex R163 -> 1
      ("robert", "smith"),  // 0
      ("robert", null)      // null
    ).toDF("a", "b")
    assert(one(Comparators.phoneticLevels(col("a"), col("b")), df)
      == Seq(2L, 1L, 0L, null))
  }

  test("numericAbsLevels / numericPctLevels band assignment") {
    val df = Seq(
      (100.0, 100.0),  // exact -> top
      (100.0, 104.0),  // abs 4 <= 5; pct 4 <= 0.05*104
      (100.0, 120.0),  // abs 20 <= 25; pct 20 <= 0.25*120
      (100.0, 200.0),  // 0; pct: 100 > 0.25*200 -> 0
      (0.0, 0.0)       // exact even at zero scale
    ).toDF("a", "b")
    assert(one(Comparators.numericAbsLevels(col("a"), col("b"), Seq(5.0, 25.0)), df)
      == Seq(3L, 2L, 1L, 0L, 3L))
    assert(one(Comparators.numericPctLevels(col("a"), col("b"), Seq(0.05, 0.25)), df)
      == Seq(3L, 2L, 1L, 0L, 3L))
  }

  test("dateLevels bands on datediff") {
    val df = Seq(
      ("2020-01-10", "2020-01-10"), // 3
      ("2020-01-10", "2020-01-03"), // 7 days -> 2
      ("2020-01-10", "2020-03-01"), // 51 days -> 1
      ("2020-01-10", "2021-01-10")  // 0
    ).toDF("a", "b").select(to_date(col("a")).as("a"), to_date(col("b")).as("b"))
    assert(one(Comparators.dateLevels(col("a"), col("b"), Seq(7, 60)), df)
      == Seq(3L, 2L, 1L, 0L))
  }

  test("dateTransposedLevels: exact / swap / bands / year mismatch / null") {
    val df = Seq(
      ("2020-01-10", "2020-01-10"), // identical -> 4
      ("1994-03-07", "1994-07-03"), // day<->month swap, same year -> 3
      ("1994-07-03", "1994-03-07"), // symmetric -> 3
      ("2020-01-10", "2020-01-05"), // 5 days -> 2
      ("1994-03-07", "1995-07-03"), // swapped fields but DIFFERENT year: no swap level, 483 days -> 0
      ("2020-01-10", "2020-03-01"), // 51 days -> 1
      ("2020-01-10", "2023-01-10"), // years out -> 0
      (null, "2020-01-10")          // missing -> null
    ).toDF("a", "b").select(to_date(col("a")).as("a"), to_date(col("b")).as("b"))
    assert(one(Comparators.dateTransposedLevels(col("a"), col("b")
      , Seq(7, 60)), df) == Seq(4L, 3L, 3L, 2L, 0L, 1L, 0L, null))
  }

  test("dateTransposedLevels: swap outranks an overlapping band; m=d dates can't fake a swap") {
    // March 4 vs April 3 1994: transposed AND only 30 days apart — the
    // specific evidence (swap) must win over the ≤60 band
    val df = Seq(
      ("1994-03-04", "1994-04-03"),
      ("1994-05-05", "1994-05-05"), // m = d, identical -> exact, not swap
      ("1994-05-05", "1994-06-05")  // m = d on a, 31 days -> band
    ).toDF("a", "b").select(to_date(col("a")).as("a"), to_date(col("b")).as("b"))
    assert(one(Comparators.dateTransposedLevels(col("a"), col("b"),
      Seq(7, 60)), df) == Seq(3L, 4L, 1L))
  }

  test("bands must be positive and strictly increasing") {
    intercept[IllegalArgumentException] {
      Comparators.numericAbsLevels(col("a"), col("b"), Seq(5.0, 5.0))
    }
    intercept[IllegalArgumentException] {
      Comparators.numericPctLevels(col("a"), col("b"), Seq(0.25, 0.05))
    }
    intercept[IllegalArgumentException] {
      Comparators.numericAbsLevels(col("a"), col("b"), Nil)
    }
  }

  test("comparator gammas feed fitLevels after the explicit null policy") {
    val rng = new scala.util.Random(71)
    val rows = (1 to 400).map { i =>
      val name = s"name${i % 40}"
      val near = if (i % 3 == 0) name else s"name${(i + 1) % 40}"
      (i.toLong, name, near, (i % 50) * 10.0, ((i + i % 7) % 50) * 10.0)
    }
    val pairs = rows.toDF("id", "na", "nb", "aa", "ab")
      .select(col("id"),
        Comparators.stringLevels(col("na"), col("nb"), 0.9).as("g0"),
        Comparators.numericPctLevels(col("aa"), col("ab"), Seq(0.1)).as("g1"))
    // complete-case: comparator gammas are non-null here, fit succeeds
    val model = FellegiSunter.fitLevels(pairs, Seq("g0", "g1"), Seq(3, 3))
    assert(model.lambda > 0.0 && model.lambda < 1.0)
    // a null gamma makes fit fail LOUDLY, naming the column
    val withNull = pairs.union(
      Seq((0L, null.asInstanceOf[java.lang.Long], 0L))
        .toDF("id", "g0", "g1"))
    val e = intercept[Exception] {
      FellegiSunter.fitLevels(withNull, Seq("g0", "g1"), Seq(3, 3))
    }
    assert(e.getMessage.contains("g0"), e.getMessage)
  }

  test("acronymLevels: exact, acronym, miss, guards") {
    import spark.implicits._
    val df = Seq(
      ("International Business Machines", "IBM"),          // 1
      ("I.B.M.", "International Business Machines"),       // 1 (compacted)
      ("ibm", "IBM"),                                      // 2 (case-insens)
      ("International Business Machines",
        "international business machines"),                // 2
      ("General Electric", "GM"),                          // 0 (wrong acr)
      ("Alpha Beta", "Gamma Delta"),                       // 0 (both multi)
      ("Ab", "Alpha Beta"),                                // 1
      ("A", "Alpha"),                                      // 0 (1-letter acr)
      (null, "IBM")                                        // null gamma
    ).toDF("a", "b")
    val got = df.select(Comparators.acronymLevels(col("a"), col("b"))
      .as("g")).collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got.toList == List(1L, 1L, 2L, 2L, 0L, 0L, 1L, 0L, -1L))
    // acronym() building block (row 0/4/5 'a' values are multi-token)
    val acr = df.where(col("a").isNotNull)
      .select(Comparators.acronym(col("a")).as("x"))
      .collect().map(_.getString(0))
    assert(acr(0) == "IBM" && acr(4) == "GE" && acr(5) == "AB")
  }

  test("confusionLevels: exact / glyph / fuzzy / disagree / missing") {
    import spark.implicits._
    val rows = Seq(
      ("Smith & Co 2010", "Smith & Co 2010", Some(3L)), // byte-exact
      ("Smith & Co 2010", "Smith & Co 2O1O", Some(2L)), // two glyph swaps
      ("B1ll Smith", "Bill Smith", Some(2L)),           // one glyph swap
      ("Jones Ltd", "Jones Ltd.", Some(2L)),            // one real edit (cost 2)
      ("Martinez", "Martines", Some(2L)),               // s<->z? not listed: real edit
      ("Anderson", "Andersen Group", Some(1L)),         // JW fuzzy only
      ("Anderson", "nosrednA", Some(0L)),               // reversal: none
      (null, "x", None)
    ).toDF("a", "b", "want")
    val got = rows.select(
      Comparators.confusionLevels(col("a"), col("b")).as("g"), col("want"))
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
         if (r.isNullAt(1)) None else Some(r.getLong(1))))
    got.foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    intercept[IllegalArgumentException](
      Comparators.confusionLevels(col("a"), col("b"), maxDist = 0))
  }
}
