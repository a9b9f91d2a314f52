package graft.strsim

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Match Rating Approach: codex vectors, the published Byrne/Boern worked
  * example, the no-comparison gate, combined-length minimums, and
  * column/SQL/null agreement. */
class MraSpec extends SparkFunSuite {

  test("codex vectors per the pinned rules") {
    assert(TextKernels.mraCodex("Byrne") == "BYRN")
    assert(TextKernels.mraCodex("Boern") == "BRN")
    assert(TextKernels.mraCodex("Aaron") == "ARN")      // leading vowel kept
    assert(TextKernels.mraCodex("Williams") == "WLMS")  // LL collapses
    assert(TextKernels.mraCodex("Catherine") == "CTHRN")
    assert(TextKernels.mraCodex("Kathryn") == "KTHRYN")
    // >6 after collapse: first 3 + last 3
    assert(TextKernels.mraCodex("Brockmeyerson") == "BRCRSN")
    assert(TextKernels.mraCodex("") == "")
    assert(TextKernels.mraCodex("...!") == "")          // non-letters only
  }

  test("published worked example and rating rules") {
    // Byrne vs Boern: backward residuals Y vs none → rating 5; combined
    // codex length 7 → minimum 4 → match (the Wikipedia walkthrough)
    assert(TextKernels.mraSimilarity("Byrne", "Boern") == 5)
    assert(TextKernels.mraMatch("Byrne", "Boern") == 1)
    // Catherine vs Kathryn: residuals (C,N)/(K,Y,N), backward unmatched 2
    // → rating 4; combined 11 → minimum 3 → match
    assert(TextKernels.mraSimilarity("Catherine", "Kathryn") == 4)
    assert(TextKernels.mraMatch("Catherine", "Kathryn") == 1)
    // identical codexes → rating 6
    assert(TextKernels.mraSimilarity("Smith", "Smith") == 6)
    // codex length gap >= 3 → no comparison
    assert(TextKernels.mraSimilarity("A", "Brockmeyerson") == -1)
    assert(TextKernels.mraMatch("A", "Brockmeyerson") == -1)
    // dissimilar short names: combined <= 4 needs rating 5
    val simAB = TextKernels.mraSimilarity("Ab", "Zu")
    assert(simAB >= 0 && TextKernels.mraMatch("Ab", "Zu") ==
      (if (simAB >= 5) 1 else 0))
  }

  test("column, SQL, and null paths agree; no-comparison maps to NULL") {
    import spark.implicits._
    val df = Seq(("Byrne", "Boern"), ("A", "Brockmeyerson"),
      (null.asInstanceOf[String], "x")).toDF("a", "b")
    val got = df.select(
      graft.functions.mra_codex(col("a")).as("ca"),
      graft.functions.mra_similarity(col("a"), col("b")).as("r"),
      graft.functions.mra_match(col("a"), col("b")).as("m")).collect()
    assert(got(0).getString(0) == "BYRN" && got(0).getInt(1) == 5 &&
      got(0).getBoolean(2))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2)) // no comparison
    assert(got(2).isNullAt(0) && got(2).isNullAt(1) && got(2).isNullAt(2))
    df.createOrReplaceTempView("mra_t")
    val sql = spark.sql(
      "SELECT mra_codex(a), mra_similarity(a, b), mra_match(a, b) FROM mra_t")
      .collect()
    assert(sql(0).getString(0) == "BYRN" && sql(0).getInt(1) == 5 &&
      sql(0).getBoolean(2))
    assert(sql(1).isNullAt(1) && sql(1).isNullAt(2))
    assert(sql(2).isNullAt(0) && sql(2).isNullAt(1) && sql(2).isNullAt(2))
  }
}
