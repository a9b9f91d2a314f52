package graft.strsim

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

import graft.SparkFunSuite
import graft.functions._

/** Reproduces the reference's worked demo exactly
  * (`/root/reference/demo.py:4-15`, expected table
  * `/root/reference/README.md:59-72`): null propagation, empty-string
  * semantics (empty != null), and literal broadcast.
  */
class DemoTableSpec extends SparkFunSuite {

  private val schema = StructType(Seq(
    StructField("name_a", StringType, nullable = true),
    StructField("name_b", StringType, nullable = true)))

  private val demoRows = Seq(
    Row("phillips", "phillips"),
    Row("phillips", "philips"),
    Row("", "phillips"),
    Row("", ""),
    Row(null, "phillips"),
    Row(null, null))

  // README.md:59-72 expected values per row, per kernel (null → None)
  private val expected: Map[String, Seq[Option[Double]]] = Map(
    "levenshtein" -> Seq(Some(1.0), Some(0.875), Some(0.0), Some(1.0), None, None),
    "jaro" -> Seq(Some(1.0), Some(0.958333), Some(0.0), Some(1.0), None, None),
    "jaro_winkler" -> Seq(Some(1.0), Some(0.975), Some(0.0), Some(1.0), None, None),
    "jaccard" -> Seq(Some(1.0), Some(0.875), Some(0.0), Some(1.0), None, None),
    "sorensen_dice" -> Seq(Some(1.0), Some(0.933333), Some(0.0), Some(1.0), None, None))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(demoRows, 2), schema)

  test("README demo table: null propagation and empty-string semantics") {
    val out = df.select(
      levenshtein_sim("name_a", "name_b").as("levenshtein"),
      jaro_sim("name_a", "name_b").as("jaro"),
      jaro_winkler_sim("name_a", "name_b").as("jaro_winkler"),
      jaccard_sim("name_a", "name_b").as("jaccard"),
      sorensen_dice_sim("name_a", "name_b").as("sorensen_dice")
    ).collect()
    for ((kernel, exp) <- expected; (e, i) <- exp.zipWithIndex) {
      val fieldIdx = out(i).fieldIndex(kernel)
      e match {
        case None => assert(out(i).isNullAt(fieldIdx), s"$kernel row $i should be null")
        case Some(v) =>
          assert(math.abs(out(i).getDouble(fieldIdx) - v) < 1e-6,
            s"$kernel row $i: got ${out(i).getDouble(fieldIdx)}, want $v")
      }
    }
  }

  test("literal broadcast equals column-column results row-wise") {
    // reference broadcast path strsim.rs:61-66,85-92: length-1 literal vs column
    val withLit = df.select(jaro_winkler_sim($("name_a"), lit("phillips")).as("s")).collect()
    val withCol = df.select(jaro_winkler_sim($("name_a"), lit("phillips")).as("s")).collect()
    val colCol = spark.createDataFrame(
      spark.sparkContext.parallelize(demoRows.map(r => Row(r.get(0), "phillips")), 2), schema)
      .select(jaro_winkler_sim("name_a", "name_b").as("s")).collect()
    for (i <- demoRows.indices) {
      assert(withLit(i).isNullAt(0) == colCol(i).isNullAt(0))
      if (!withLit(i).isNullAt(0)) {
        assert(withLit(i).getDouble(0) == colCol(i).getDouble(0))
        assert(withCol(i).getDouble(0) == withLit(i).getDouble(0))
      }
    }
  }

  private def $(name: String) = org.apache.spark.sql.functions.col(name)
}
