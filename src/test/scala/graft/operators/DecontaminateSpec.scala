package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class DecontaminateSpec extends SparkFunSuite {
  import spark.implicits._

  test("wordNGrams: distinct space-joined n-grams, empty under n tokens") {
    val got = Seq("a b c d", "a b c", "a b a b a b a b")
      .toDF("t").select(Decontaminate.wordNGrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set("a b c"))
    // repeats collapse: only two distinct 3-grams exist
    assert(got(2) == Set("a b a", "b a b"))
  }

  test("flaggedDocs: 8-gram overlap flags, counts distinct hits") {
    val benchText = (1 to 12).map(i => s"bench$i").mkString(" ")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    // doc 1 embeds 9 consecutive bench tokens → two distinct shared 8-grams
    val contaminated = "intro " + (1 to 9).map(i => s"bench$i").mkString(" ") + " outro"
    // doc 2 shares only 7 consecutive tokens → no 8-gram hit
    val clean7 = (1 to 7).map(i => s"bench$i").mkString(" ") + " different tail words here x y"
    val docs = Seq((1L, contaminated), (2L, clean7), (3L, "wholly unrelated text"))
      .toDF("doc_id", "text")
    val got = Decontaminate.flaggedDocs(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("flaggedDocs plan broadcasts the benchmark gram set") {
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val bench = Seq((2L, "a b c d e f g h")).toDF("doc_id", "text")
    val df = Decontaminate.flaggedDocs(docs, bench, "doc_id", "text", 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join, got:\n$plan")
  }

  test("broadcastBench=false degrades to an unhinted join, same flags") {
    val benchText = (1 to 12).map(i => s"bench$i").mkString(" ")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val contaminated = "intro " + (1 to 9).map(i => s"bench$i").mkString(" ") + " outro"
    val docs = Seq((1L, contaminated), (3L, "wholly unrelated text"))
      .toDF("doc_id", "text")
    val hinted = Decontaminate.flaggedDocs(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unhinted = Decontaminate.flaggedDocs(docs, bench, "doc_id", "text",
      n = 8, broadcastBench = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unhinted == hinted && hinted == Map(1L -> 2L))
  }
}
