package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class PackingSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs = (1L to 200L).map(i =>
    (i, (1 to (i % 13).toInt + 1).map(j => s"w$j").mkString(" ")))
    .toDF("doc_id", "text")

  test("pack layout: contiguous prefix sums, exact seq spans, per shard") {
    val out = Packing.packAssignments(docs, "doc_id", "text",
      seqLen = 16, shards = 4).collect()
    assert(out.length == 200)
    // within each shard, offsets sorted ascending are exactly the prefix
    // sums of token counts (no gaps, no overlaps)
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == expect, s"offset gap at id ${r.getLong(0)}")
        expect += r.getLong(2)
      }
    }
    // seq spans match the offsets
    out.foreach { r =>
      val (n, off, first, last) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(first == off / 16)
      assert(last == (off + math.max(n, 1) - 1) / 16)
      assert(last >= first)
    }
  }

  test("pack layout is partitioning-independent (deterministic)") {
    val a = Packing.packAssignments(docs.repartition(1), "doc_id", "text", 16, 4)
      .collect().map(_.toSeq).toSet
    val b = Packing.packAssignments(docs.repartition(13), "doc_id", "text", 16, 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("token-less docs pin to the sequence containing their offset") {
    val d = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Packing.packAssignments(d, "doc_id", "text", 2, 1)
      .orderBy("start_off").collect()
    out.filter(_.getLong(2) == 0L).foreach { r =>
      assert(r.getLong(4) == r.getLong(5)) // first_seq == last_seq
    }
    // all three share one shard; total tokens = 3 → offsets cover [0, 3]
    assert(out.map(_.getLong(2)).sum == 3L)
  }
}
