package graft.plans

import java.nio.file.Files

import graft.SparkFunSuite

class CorpusPipelineSpec extends SparkFunSuite {

  test("corpus pipeline: stages run, metrics surface drops, resume is exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val workDir = Files.createTempDirectory("corpus_pipe").toString
    val cfg = CorpusPipeline.Config(minQuality = 0.3, tau = 0.7)

    val r1 = CorpusPipeline.run(spark, docs, workDir, cfg)
    assert(r1.stages.map(_.name) == Seq("01_signals", "02_clean",
      "03_exact", "04_neardup", "04_dropped", "05_corpus"))
    assert(r1.stages.forall(!_.resumed))
    // monotone shrinkage through the filter/dedup stages
    val rows = r1.stages.map(s => s.name -> s.rows).toMap
    assert(rows("01_signals") == docs.count())
    assert(rows("02_clean") <= rows("01_signals"))
    assert(rows("03_exact") <= rows("02_clean"))
    assert(rows("04_neardup") <= rows("03_exact"))
    // something must survive to be a corpus at all
    assert(rows("05_corpus") > 0)
    assert(r1.corpus.columns.toSeq == Seq("doc_id", "text", "lang", "source",
      "split_name", "shard", "start_off", "first_seq", "last_seq"))
    // drop metrics are first-class rows in the metrics frame
    val metricNames = r1.metrics.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(metricNames.contains(("04_neardup", "dropped_minhash_buckets")))
    assert(metricNames.contains(("02_clean", "docs_dropped")))

    // second run: every stage resumes from its manifest, output identical
    val r2 = CorpusPipeline.run(spark, docs, workDir, cfg)
    assert(r2.stages.forall(_.resumed), "expected full resume")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("doc_id", "split_name", "shard", "start_off")
      .collect().map(_.toSeq).toSet
    assert(key(r2.corpus) == key(r1.corpus))

    // a config change invalidates downstream checkpoints (content-addressed)
    val r3 = CorpusPipeline.run(spark, docs, workDir,
      cfg.copy(minQuality = 0.4))
    assert(!r3.stages.exists(s => s.name == "02_clean" && s.resumed))
  }
}
