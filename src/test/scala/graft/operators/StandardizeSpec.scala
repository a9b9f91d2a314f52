package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Pins [[Standardize]] — dictionary token standardization: exact-match
  * replacement, pass-through, the ""/NULL contract, literal (non-regex)
  * separators, and the bounded dictionaryFromFrame seam. */
class StandardizeSpec extends SparkFunSuite {

  private val dict = Map("bill" -> "william", "st" -> "street",
    "rd" -> "road")

  test("maps known tokens, passes unknown through, rejoins with sep") {
    import spark.implicits._
    val got = Seq("bill smith", "12 main st", "st bill st", "nothing here")
      .toDF("x")
      .select(Standardize.tokenDictionary(col("x"), dict).as("y"))
      .as[String].collect().toSeq
    assert(got == Seq("william smith", "12 main street",
      "street william street", "nothing here"))
  }

  test("empty string round-trips; NULL propagates; empty dict is identity") {
    import spark.implicits._
    val df = Seq(Some(""), None, Some("bill")).toDF("x")
    val got = df.select(Standardize.tokenDictionary(col("x"), dict).as("y"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some(""), None, Some("william")))
    val id = df.select(
        Standardize.tokenDictionary(col("x"), Map.empty[String, String])
          .as("y"))
      .as[Option[String]].collect().toSeq
    assert(id == Seq(Some(""), None, Some("bill")))
  }

  test("separator is literal, not regex") {
    import spark.implicits._
    val got = Seq("bill.st.x").toDF("x")
      .select(Standardize.tokenDictionary(col("x"),
        Map("bill" -> "william"), sep = ".").as("y"))
      .as[String].head()
    assert(got == "william.st.x")
  }

  test("exact match only: no substring or case folding") {
    import spark.implicits._
    val got = Seq("Bill bills bill").toDF("x")
      .select(Standardize.tokenDictionary(col("x"), dict).as("y"))
      .as[String].head()
    assert(got == "Bill bills william")
  }

  test("dictionaryFromFrame: reads, validates, and enforces the cap") {
    import spark.implicits._
    val d = Seq(("bill", "william"), ("st", "street"), ("bill", "william"))
      .toDF("k", "v")
    assert(Standardize.dictionaryFromFrame(d, "k", "v") ==
      Map("bill" -> "william", "st" -> "street"))
    val conflict = Seq(("st", "street"), ("st", "saint")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Standardize.dictionaryFromFrame(conflict, "k", "v")
    }
    val withNull = Seq((Some("a"), None: Option[String])).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Standardize.dictionaryFromFrame(withNull, "k", "v")
    }
    intercept[IllegalArgumentException] {
      Standardize.dictionaryFromFrame(d, "k", "v", maxEntries = 1)
    }
  }

  test("applyTokenDictionary adds the output column; plan is one projection") {
    import spark.implicits._
    val df = Seq(("a", "bill st")).toDF("id", "name")
    val out = Standardize.applyTokenDictionary(df, "name", "name_std", dict)
    assert(out.columns.toSeq == Seq("id", "name", "name_std"))
    assert(out.select("name_std").as[String].head() == "william street")
    // zero exchanges: the dictionary is a literal, not a join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
