package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkFunSuite
import graft.operators.Linkage
import graft.sources.PagesCorpus

/** Plan-shape assertions for scale behavior: column pruning (never drag
  * `html BINARY` through a shuffle), filter pushdown to the parquet scan,
  * and whole-stage codegen around the strsim kernels. These are the
  * "would this survive 100×" checks — cheap at sf-test, load-bearing at
  * 100 TB. */
class PipelinePlanSpec extends SparkFunSuite {

  private lazy val pagesPath = {
    val dir = Files.createTempDirectory("graft-pages").toString
    val (pages, _) = PagesCorpus.generate(spark, 400, 42L, 4)
    pages.write.mode("overwrite").parquet(dir)
    dir
  }

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }

  test("block-key-only projection prunes html AND text from the parquet scan") {
    val pages = spark.read.parquet(pagesPath)
    val df = Linkage.extract(pages).select(col("url"), col("block_key"))
    val schemas = scans(df).map(_.requiredSchema.fieldNames.toSet)
    assert(schemas.nonEmpty)
    // block_key derives from url only — scan must read just url
    assert(schemas.forall(s => !s.contains("html") && !s.contains("text") &&
      !s.contains("warc_ts")), s"scan read too much: $schemas")
  }

  test("extraction scan reads html but never warc_ts it doesn't need") {
    val pages = spark.read.parquet(pagesPath)
    val df = Linkage.extract(pages) // full extract: url, html-derived text, lang
    val schemas = scans(df).map(_.requiredSchema.fieldNames.toSet)
    assert(schemas.forall(s => s.contains("html") && !s.contains("warc_ts")))
  }

  test("post-extraction stages never touch html (checkpoint schema)") {
    val work = Files.createTempDirectory("graft-plan").toString
    val pages = spark.read.parquet(pagesPath)
    Pipeline.run(spark, pages, work, Pipeline.Config())
    val extracted = spark.read.parquet(s"$work/01_extracted")
    assert(!extracted.schema.fieldNames.contains("html"))
    val scored = spark.read.parquet(s"$work/04_scored")
    assert(scored.schema.fieldNames.toSet ==
      Set("url_a", "url_b", "jw", "dice", "score"))
  }

  test("kernel scoring after the equi-join runs inside whole-stage codegen") {
    val pages = spark.read.parquet(pagesPath)
    val ex = Linkage.extract(pages)
    val scored = Linkage.score(
      Linkage.candidatePairs(Linkage.candidateKeys(ex)), ex)
      .where(col("score") >= 1.6)
    scored.collect() // materialize THIS queryExecution so AQE finalizes it
    val plan = scored.queryExecution.executedPlan.toString
    // kernels run inside whole-stage codegen (the `*(n)` markers)
    assert(plan.contains("*("), s"no codegen stage in:\n$plan")
    assert(plan.contains("jaro_winkler_sim"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"non-equi join crept in:\n$plan")
  }

  test("partition-count stability: candidate pair join respects shuffle partitions") {
    val pages = spark.read.parquet(pagesPath)
    val ex = Linkage.extract(pages)
    val pairs = Linkage.candidatePairs(Linkage.candidateKeys(ex))
    // with AQE on, partitions are coalesced to the data size, not 200
    val n = pairs.rdd.getNumPartitions
    assert(n <= spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"pair join exploded partitions: $n")
  }
}
