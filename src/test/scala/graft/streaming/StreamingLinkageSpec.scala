package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.sources.{Page, PagesCorpus}

class StreamingLinkageSpec extends SparkFunSuite {
  import spark.implicits._

  private def mkPage(url: String, name: String, ts: Long): Page = {
    val text = s"${name.capitalize}\nsome body words here"
    Page(url, new Timestamp(ts), PagesCorpus.renderHtml(name.capitalize, text),
      text, "en")
  }

  test("stream-static matching finds cross-source matches per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Page]
    val index = graft.operators.Linkage.extract(Seq(
      mkPage("https://phillips.com/p0", "phillips", 1000L),
      mkPage("https://kensington.com/p0", "kensington", 1000L)).toDF())

    val matches = StreamingLinkage.matchAgainstIndex(input.toDF(), index, theta = 1.6)
    val q = matches.writeStream.format("memory").queryName("m1")
      .outputMode("append").start()
    input.addData(
      mkPage("https://philips.com/new", "philips", 2000L),       // ~ phillips, diff block_key
      mkPage("https://phillips.org/new", "phillips", 2000L),     // same block_key, exact name
      mkPage("https://zanzibar.com/new", "zanzibar", 2000L))     // no match
    q.processAllAvailable()
    val got = spark.sql("select url_a, url_b from m1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    // block_key join: only the same-normalized-host page reaches scoring
    assert(got == Set(("https://phillips.org/new", "https://phillips.com/p0")))
  }

  test("quality filter stream: stateless gate + scrub equals static filter") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val clean = "the quick brown fox and the lazy dog run to the hills " * 3
    val junk = "@@@@ ####"
    val pii = clean + " mail me at user@example.com now"
    val filtered = StreamingLinkage.qualityFilterStream(
      input.toDF().toDF("doc_id", "text"), minQuality = 0.3)
      .select(col("doc_id"), col("text"))
    val q = filtered.writeStream.format("memory").queryName("qf1")
      .outputMode("append").start()
    input.addData((1L, clean), (2L, junk))
    q.processAllAvailable()
    input.addData((3L, pii)) // second batch: still stateless, still flows
    q.processAllAvailable()
    val got = spark.sql("select doc_id, text from qf1").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    q.stop()
    assert(got.contains(1L) && !got.contains(2L)) // junk gated out
    assert(got(3L).contains("<EMAIL>") && !got(3L).contains("user@example.com"))
  }

  test("watermarked dedup suppresses exact re-crawls") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Page]
    val q = StreamingLinkage.dedupStream(input.toDF())
      .select("url").writeStream.format("memory").queryName("d1")
      .outputMode("append").start()
    val p = mkPage("https://a.com/x", "alpha", 5000L)
    input.addData(p, p.copy(warc_ts = new Timestamp(6000L))) // same html bytes
    q.processAllAvailable()
    input.addData(p.copy(warc_ts = new Timestamp(7000L)))    // re-crawl again
    q.processAllAvailable()
    val n = spark.sql("select * from d1").count()
    q.stop()
    assert(n == 1, s"expected 1 surviving row, got $n")
  }

  test("stateful incremental matching matches ACROSS micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingLinkage.Keyed]
    val matches = StreamingLinkage.incrementalMatches(spark, input.toDS(), theta = 1.6)
    val q = matches.writeStream.format("memory").queryName("m2")
      .outputMode("append").start()
    input.addData(StreamingLinkage.Keyed("bk1", "u1", "pemberton"))
    q.processAllAvailable()
    input.addData(
      StreamingLinkage.Keyed("bk1", "u2", "pemberton"),  // near-dup, later batch
      StreamingLinkage.Keyed("bk1", "u3", "zanzibar"),   // same key, no match
      StreamingLinkage.Keyed("bk2", "u4", "pemberton"))  // other key: no pair
    q.processAllAvailable()
    val got = spark.sql("select url_a, url_b from m2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(got == Set(("u1", "u2")))
  }

  test("stream-stream join matches across batches within the time band") {
    implicit val sqlCtx = spark.sqlContext
    val inA = MemoryStream[(String, String, String, Timestamp)]
    val inB = MemoryStream[(String, String, String, Timestamp)]
    def df(m: MemoryStream[(String, String, String, Timestamp)]) =
      m.toDF().toDF("url", "name_norm", "block_key", "ts")
    val q = StreamingLinkage.streamStreamMatches(df(inA), df(inB),
      theta = 1.6, maxDelaySeconds = 300)
      .writeStream.format("memory").queryName("ss1").outputMode("append").start()
    inA.addData(("a1", "pemberton", "bk1", new Timestamp(1000000L)))
    q.processAllAvailable()
    // LATER batch on the OTHER stream still matches (both sides buffered
    // in join state — the capability stream-static lacks)
    inB.addData(
      ("b1", "pemberton", "bk1", new Timestamp(1100000L)),  // in band: match
      ("b2", "pemberton", "bk1", new Timestamp(9000000L)),  // out of band
      ("b3", "pemberton", "bk2", new Timestamp(1100000L)),  // other block
      ("b4", "zanzibar", "bk1", new Timestamp(1100000L)))   // low score
    q.processAllAvailable()
    // and the reverse direction: a later A row matches buffered B rows
    inA.addData(("a2", "pemberton", "bk1", new Timestamp(1200000L)))
    q.processAllAvailable()
    val got = spark.sql("select url_a, url_b from ss1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(got == Set(("a1", "b1"), ("a2", "b1")), got.toString)
  }

  test("windowed throughput metrics aggregate by event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Page]
    val q = StreamingLinkage.throughputMetrics(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("t1")
      .outputMode("complete").start()
    input.addData(
      mkPage("https://a.com/1", "aaa", 0L),
      mkPage("https://b.com/2", "bbb", 60000L),            // same 10-min window
      mkPage("https://c.com/3", "ccc", 45 * 60 * 1000L))   // later window
    q.processAllAvailable()
    val rows = spark.sql("select pages from t1 order by pages").collect().map(_.getLong(0))
    q.stop()
    assert(rows.toSeq == Seq(1L, 2L))
  }
}
