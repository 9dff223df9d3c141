package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit-level checks for the batch window operators (the oracle gate
  * covers the full queries; this pins the RANGE-frame peer semantics
  * the trailing aggregate's correctness rests on). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, epochSec: Long, value: Double) =
    (id, user, new Timestamp(epochSec * 1000L), value)

  test("tumbling avg: half-away-from-zero holds for negative sums") {
    // the cents-trick average must stay exact when a window's sum is
    // negative: truncating DIV and flooring // diverge by 1 there
    // unless the division is kept sign-aware over non-negative operands
    val events = Seq(
      // one window, sum = -0.03 over 2 rows -> avg -0.015, half away
      // from zero -> -0.02
      (1L, new Timestamp(0L), 1L, "a", -0.01, "{}"),
      (2L, new Timestamp(1000L), 1L, "a", -0.02, "{}"),
      // one window, sum = 0.03 over 2 rows -> avg 0.015 -> 0.02
      (3L, new Timestamp(0L), 1L, "b", 0.01, "{}"),
      (4L, new Timestamp(1000L), 1L, "b", 0.02, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Windows.tumbling(events)
      .select("event_type", "avg_value").as[(String, Double)]
      .collect().toMap
    assert(got("a") === -0.02)
    assert(got("b") === 0.02)
  }

  test("trailingHourStats: frame bounds, peer inclusion, per-user isolation") {
    val events = Seq(
      // user 1: t=0, t=3599 (inside the trailing hour of each other's
      // later edge), t=3600 (EXACTLY one hour after t=0 → excludes it)
      ev(1, 1, 0L, 1.00),
      ev(2, 1, 3599L, 2.00),
      ev(3, 1, 3600L, 4.00),
      // equal-timestamp PEERS: both rows see both (RANGE CURRENT ROW
      // spans the whole peer group, no tiebreak ordering)
      ev(4, 2, 100L, 10.00),
      ev(5, 2, 100L, 20.00),
      // another user at the same instants: must not leak into user 2
      ev(6, 3, 100L, 50.00))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Windows.trailingHourStats(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((100L, 1L)))          // just itself
    assert(out(2L) === ((300L, 2L)))          // t=0 still in range (3599 back)
    assert(out(3L) === ((600L, 2L)))          // t=0 aged out, t=3599 in
    assert(out(4L) === ((3000L, 2L)))         // peer included both ways
    assert(out(5L) === ((3000L, 2L)))
    assert(out(6L) === ((5000L, 1L)))         // user isolation
  }
}
