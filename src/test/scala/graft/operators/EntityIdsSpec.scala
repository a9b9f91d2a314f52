package graft.operators

import graft.SparkFunSuite

class EntityIdsSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(prev: Seq[(Long, String)], cur: Seq[(Long, Long)]) =
    EntityIds.stabilize(prev.toDF("id", "entity_id"),
        cur.toDF("id", "component"), "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))))
      .toMap

  test("unchanged clustering carries every id") {
    val prev = Seq(1L -> "eA", 2L -> "eA", 3L -> "eB")
    val cur = Seq(1L -> 10L, 2L -> 10L, 3L -> 30L)
    val got = run(prev, cur)
    assert(got(10L) == (("eA", 2L, 2L, false)))
    assert(got(30L) == (("eB", 1L, 1L, false)))
  }

  test("merge keeps the larger-overlap entity; equal overlap ties to the smaller") {
    // eA(1 rec) and eB(2 recs) merge into cluster 1 → eB carries
    val got = run(Seq(1L -> "eA", 2L -> "eB", 3L -> "eB"),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(got(1L) == (("eB", 3L, 2L, false)))
    // 1-vs-1 overlap tie → smallest entity id
    val tie = run(Seq(1L -> "eB", 2L -> "eA"), Seq(1L -> 1L, 2L -> 1L))
    assert(tie(1L)._1 == "eA")
  }

  test("split keeps the id on the biggest fragment; the rest mint new ids") {
    // eA had records 1..5; splits into cluster 1 (1,2,3) and cluster 4 (4,5)
    val got = run((1L to 5L).map(_ -> "eA"),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    assert(got(1L) == (("eA", 3L, 3L, false)))
    assert(got(4L) == (("new:4", 2L, 2L, true)))
    // equal fragments: the smaller cluster id wins the carry
    val even = run((1L to 4L).map(_ -> "eA"),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    assert(even(1L)._1 == "eA" && even(3L)._1 == "new:3")
  }

  test("brand-new clusters mint; emitted ids are unique") {
    val got = run(Seq(1L -> "eA"),
      Seq(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
    assert(got(1L) == (("eA", 2L, 1L, false)))
    assert(got(7L) == (("new:7", 2L, 0L, true)))
    assert(got.values.map(_._1).toSeq.distinct.size == got.size)
  }

  test("chained runs: stable membership keeps ids stable through churned labels") {
    import org.apache.spark.sql.functions.col
    // run 0 entity map; runs 1..3 relabel the SAME clusters with new
    // anonymous component ids each time (what CC re-runs do)
    val members = Map(100L -> Seq(1L, 2L, 3L), 200L -> Seq(4L, 5L))
    var prev = members.toSeq.flatMap { case (e, ids) =>
      ids.map(i => i -> s"e$e")
    }.toDF("id", "entity_id")
    (1 to 3).foreach { run =>
      val cur = members.toSeq.flatMap { case (e, ids) =>
        ids.map(i => i -> (e * 10 + run)) // fresh anonymous label each run
      }.toDF("id", "component")
      val st = EntityIds.stabilize(prev, cur, "id")
      val got = st.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(100L * 10 + run) == "e100" && got(200L * 10 + run) == "e200",
        s"run $run churned ids: $got")
      // feed forward: records carry their (stable) entity into the next run
      prev = cur.join(st.select(col("component"), col("entity_id")), "component")
        .select(col("id"), col("entity_id"))
    }
  }

  test("partitioning-independent") {
    val prev = (1L to 200L).map(i => i -> s"e${i % 7}")
    val cur = (1L to 220L).map(i => i -> (i % 13))
    val a = EntityIds.stabilize(prev.toDF("id", "entity_id"),
      cur.toDF("id", "component"), "id")
      .orderBy("component").collect().map(_.toSeq).toSeq
    val b = EntityIds.stabilize(prev.toDF("id", "entity_id").repartition(11),
      cur.toDF("id", "component").coalesce(1), "id")
      .orderBy("component").collect().map(_.toSeq).toSeq
    assert(a == b)
    // one carry per previous entity at most
    val carried = a.collect { case s if !s(4).asInstanceOf[Boolean] => s(1) }
    assert(carried.distinct.size == carried.size)
  }
}
