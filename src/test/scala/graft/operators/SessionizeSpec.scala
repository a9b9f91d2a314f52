package graft.operators

import java.sql.Timestamp

import graft.SparkFunSuite

class SessionizeSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("gap-based session assignment") {
    // user 1: events at 0, 10, 50 min (gap 40 > 30 → split), user 2: one event
    val events = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(50)), (4L, 2L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, "user_id", "ts", gapSeconds = 1800)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(got.size == 3)
    assert(got((1L, 1L)) == ((2L, ts(0), ts(10))))   // first session: 2 events
    assert(got((1L, 2L)) == ((1L, ts(50), ts(50))))  // split by the 40-min gap
    assert(got((2L, 1L)) == ((1L, ts(5), ts(5))))
  }

  test("boundary: gap exactly equal to threshold does NOT split") {
    val events = Seq((1L, 1L, ts(0)), (2L, 1L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    val n = Sessionize.sessions(events, "user_id", "ts", gapSeconds = 1800).count()
    assert(n == 1)
  }

  test("orderCols: frames without an event_id column sessionize too") {
    // no event_id anywhere — the default tie-break column must not be
    // hard-wired into the plan when the caller supplies their own (or none)
    val events = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(50)), (2L, ts(5)))
      .toDF("uid", "when")
    val got = Sessionize.sessions(events, "uid", "when",
      gapSeconds = 1800, orderCols = Seq.empty)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
    // a custom tie-break column works the same as the default
    val withSeq = Seq((7L, 1L, ts(0)), (8L, 1L, ts(10)))
      .toDF("seq", "uid", "when")
    assert(Sessionize.sessions(withSeq, "uid", "when",
      gapSeconds = 1800, orderCols = Seq("seq")).count() == 1)
  }
}
