package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  private val media = Seq(
    ("png1", Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A)),
    ("jpg1", Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1)),
    ("gif1", "GIF89a-data".getBytes("UTF-8")),
    ("wav1", "RIFFxxxxWAVE".getBytes("UTF-8")),
    ("htm1", "<html><body>x</body></html>".getBytes("UTF-8")),
    ("bin1", Array[Byte](0, 1, 2, 3, 4, 5)),
  ).toDF("id", "blob")

  test("metadata sniffs container kinds from magic bytes") {
    val got = Multimodal.metadata(media, "id", "blob").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(got("png1") == (6, "png"))
    assert(got("jpg1") == (5, "jpeg"))
    assert(got("gif1") == (11, "gif"))
    assert(got("wav1") == (12, "riff"))
    assert(got("htm1") == (27, "html"))
    assert(got("bin1") == (6, "unknown"))
  }

  test("decodeFeatures: fixed schema, fixed dim, deterministic across partitioning") {
    val out1 = Multimodal.decodeFeatures(spark, media.repartition(1), "id", "blob", dim = 8)
    val out2 = Multimodal.decodeFeatures(spark, media.repartition(5), "id", "blob",
      dim = 8, batchSize = 2)
    assert(out1.schema.fieldNames.toSeq == Seq("id", "kind", "features"))
    val m1 = out1.collect().map(f => f.id -> f.features.toSeq).toMap
    val m2 = out2.collect().map(f => f.id -> f.features.toSeq).toMap
    assert(m1 == m2, "features must not depend on partitioning or batch size")
    assert(m1.values.forall(_.size == 8))
    assert(m1("png1") != m1("jpg1")) // distinct content → distinct stub features
  }

  test("decodeFeatures never shuffles the blob: single projection, no Exchange") {
    val out = Multimodal.decodeFeatures(spark, media, "id", "blob", dim = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"blob crossed a shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"blob self-join crept back in:\n$plan")
  }

  test("decodeFeatures sha256 family: digest-derived, float-exact (oracle contract)") {
    val got = Multimodal.decodeFeatures(spark, media, "id", "blob", dim = 8,
      hashFamily = "sha256").collect().map(f => f.id -> f.features).toMap
    val blobs = media.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
    blobs.foreach { case (id, bytes) =>
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      val want = (0 until 8).map { i =>
        val v = ((d(3 * i) & 0xFF) << 16) | ((d(3 * i + 1) & 0xFF) << 8) |
          (d(3 * i + 2) & 0xFF)
        v.toFloat / 16777216.0f
      }
      assert(got(id).toSeq == want, s"sha-family features for $id")
      // the driver query depends on the float→double→long round trip being
      // exact: f * 2^24 must land on an integer, bit-for-bit
      got(id).foreach { f =>
        val scaled = f.toDouble * 16777216.0
        assert(scaled == math.rint(scaled) && scaled >= 0 && scaled < 16777216.0 + 1)
      }
    }
    // the sha family runs through the identical no-shuffle plan
    val plan = Multimodal.decodeFeatures(spark, media, "id", "blob", dim = 8,
      hashFamily = "sha256").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("downstream ANN composes over decoded features") {
    val feats = Multimodal.decodeFeatures(spark, media, "id", "blob", dim = 8)
      .toDF().withColumn("vid", xxhash64(col("id")))
    val top = Similarity.bruteForceTopK(feats, "vid", "features", k = 1)
    assert(top.count() == media.count())
  }
}
