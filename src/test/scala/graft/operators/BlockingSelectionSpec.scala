package graft.operators

import graft.SparkFunSuite

class BlockingSelectionSpec extends SparkFunSuite {
  import spark.implicits._

  // 8 records; f1 = parity (2 blocks of 4, vol 12), f2 = lo/hi halves
  // (2 blocks of 4, vol 12), f3 = one block of 8 (vol 28)
  private val keyed = {
    val ids = (1L to 8L)
    (ids.map(i => ("f1", i, (i % 2).toString)) ++
      ids.map(i => ("f2", i, if (i <= 4) "lo" else "hi")) ++
      ids.map(i => ("f3", i, "x"))).toDF("family", "id", "key")
  }
  // f1 covers {13,26,48,15,57}; f2 covers {13,57,14,58}; f3 covers all 7
  private val truth = Seq((1L, 3L), (2L, 6L), (4L, 8L), (1L, 5L),
    (5L, 7L), (1L, 4L), (5L, 8L)).toDF("pa", "pb")

  private def rows(budget: Long, k: Int = 3) =
    BlockingSelection.greedySelection(keyed, truth, BigDecimal(budget), k)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), BigDecimal(r.getDecimal(4)),
        BigDecimal(r.getDecimal(5)), r.getLong(6)))

  test("unbounded budget: one family covers all, zero-marginal rest never picked") {
    val got = rows(1000)
    assert(got.toSeq == Seq((1, "f3", 7L, 7L, BigDecimal(28), BigDecimal(28), 7L)))
  }

  test("budget excludes the big family; greedy takes marginal order") {
    val got = rows(25)
    assert(got.toSeq == Seq(
      (1, "f1", 5L, 5L, BigDecimal(12), BigDecimal(12), 7L),
      (2, "f2", 2L, 7L, BigDecimal(12), BigDecimal(24), 7L)))
  }

  test("budget exhaustion stops the selection") {
    val got = rows(15)
    assert(got.toSeq == Seq(
      (1, "f1", 5L, 5L, BigDecimal(12), BigDecimal(12), 7L)))
  }

  test("maxSchemes bounds the selection; marginal ties break to family asc") {
    assert(rows(25, k = 1).length == 1)
    // duplicate family under two names → identical marginals → "a" first
    val dup = ((1L to 8L).map(i => ("b", i, (i % 2).toString)) ++
      (1L to 8L).map(i => ("a", i, (i % 2).toString))).toDF("family", "id", "key")
    val t = Seq((1L, 3L)).toDF("pa", "pb")
    val got = BlockingSelection.greedySelection(dup, t, BigDecimal(100), 2)
      .collect()
    assert(got.length == 1 && got(0).getString(1) == "a")
  }

  test("partitioning-independent") {
    val a = rows(25).toSeq
    val b = BlockingSelection.greedySelection(keyed.repartition(7),
      truth.coalesce(1), BigDecimal(25), 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), BigDecimal(r.getDecimal(4)),
        BigDecimal(r.getDecimal(5)), r.getLong(6))).toSeq
    assert(a == b)
  }
}
