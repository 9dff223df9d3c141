package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream joins: both sides buffer state, the time-range
  * condition + watermarks bound that state (without them the join
  * state grows forever — the unbounded-state trap). The reference has
  * no stream-stream join; a complete streaming engine needs one. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("interval-bounded inner join matches events to clicks within 10 minutes") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[SensorEvent]
    val clicks = MemoryStream[SensorEvent]

    val imp = impressions.toDF()
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", "20 minutes")
    val clk = clicks.toDF()
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
      .withWatermark("clk_ts", "20 minutes")

    val joined = imp.join(clk,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))

    val q = Sinks.memory(joined, "ssj_sink", "append").start()
    try {
      impressions.addData(
        SensorEvent.at(1, "2024-01-01 10:00:00", 7, "imp", 0, 1),
        SensorEvent.at(2, "2024-01-01 10:00:00", 8, "imp", 0, 2))
      clicks.addData(
        SensorEvent.at(101, "2024-01-01 10:05:00", 7, "clk", 0, 1), // within 10m → match
        SensorEvent.at(102, "2024-01-01 10:30:00", 8, "clk", 0, 2)) // 30m later → no match
      q.processAllAvailable()

      val pairs = spark.table("ssj_sink")
        .select("imp_id", "clk_id").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 101L)))
    } finally q.stop()
  }

  test("left-outer interval join emits the null-padded row only after the watermark closes it") {
    // The outer side can only emit an unmatched row once the watermark
    // proves no match can still arrive — the semantics that make
    // streaming attribution ("impressions WITHOUT a click") correct.
    // Before the horizon passes, the unmatched impression is simply
    // absent, not null-padded: premature emission would be retracted.
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[SensorEvent]
    val clicks = MemoryStream[SensorEvent]

    val imp = impressions.toDF()
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF()
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
      .withWatermark("clk_ts", "10 minutes")

    val joined = imp.join(clk,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")

    val q = Sinks.memory(joined, "ssj_lo_sink", "append").start()
    try {
      impressions.addData(
        SensorEvent.at(1, "2024-01-01 10:00:00", 7, "imp", 0, 1), // will match
        SensorEvent.at(2, "2024-01-01 10:00:00", 8, "imp", 0, 2)) // never matches
      clicks.addData(
        SensorEvent.at(101, "2024-01-01 10:05:00", 7, "clk", 0, 1))
      q.processAllAvailable()
      val before = spark.table("ssj_lo_sink")
        .select("imp_id").as[Long].collect().toSet
      assert(before === Set(1L),
        "unmatched row must NOT be emitted while a match could still arrive")

      // advance both watermarks past imp 2's join horizon
      impressions.addData(
        SensorEvent.at(3, "2024-01-01 11:00:00", 9, "imp", 0, 3))
      clicks.addData(
        SensorEvent.at(102, "2024-01-01 11:00:00", 9, "clk", 0, 3))
      q.processAllAvailable()

      val rows = spark.table("ssj_lo_sink")
        .select(col("imp_id"), col("clk_id"))
        .as[(Long, Option[Long])].collect().toMap
      assert(rows(1L) === Some(101L))
      assert(rows.contains(2L) && rows(2L) === None,
        "watermark-closed unmatched row arrives null-padded exactly once")
    } finally q.stop()
  }
}
