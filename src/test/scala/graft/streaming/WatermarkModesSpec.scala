package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Survey #12: watermark semantics + output modes.
  *
  * Append mode only emits a window once the watermark (max event time −
  * delay) passes the window end, and late rows behind the watermark are
  * dropped; complete mode re-emits the full aggregate every trigger.
  */
class WatermarkModesSpec extends SparkSpec {
  import spark.implicits._

  test("append mode: window emitted only after watermark passes; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val out = StreamPipelines.tumbling(ms.toDF(), watermark = "10 minutes")
    val q = Sinks.memory(out, "wm_sink", "append").start()
    try {
      ms.addData(
        SensorEvent.at(1, "2024-01-01 10:05:00", 1, "click", 10.0, 1),
        SensorEvent.at(2, "2024-01-01 10:50:00", 1, "click", 20.0, 2))
      q.processAllAvailable()
      // watermark = 10:50 - 10min = 10:40 < window end 11:00 → nothing emitted
      assert(spark.table("wm_sink").isEmpty)

      // advance event time to 11:20 → watermark 11:10 > 11:00 closes the window
      ms.addData(SensorEvent.at(3, "2024-01-01 11:20:00", 1, "click", 1.0, 3))
      q.processAllAvailable()
      val closed = spark.table("wm_sink")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(closed === Set(("click", 2L, 30.0)))

      // a late row behind the watermark for the closed window is dropped
      ms.addData(SensorEvent.at(4, "2024-01-01 10:30:00", 1, "click", 99.0, 4))
      q.processAllAvailable()
      val after = spark.table("wm_sink")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(after === Set(("click", 2L, 30.0)), "late row must not reopen the window")
    } finally q.stop()
  }

  test("sliding window in update mode overlaps windows") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val out = StreamPipelines.sliding(ms.toDF(), watermark = "10 minutes")
    val q = Sinks.memory(out, "slide_sink", "update").start()
    try {
      // one event, value > 100 so it clears the post-agg filter; a
      // 10min/5min sliding window puts it in exactly two windows
      ms.addData(SensorEvent.at(1, "2024-01-01 10:07:00", 1, "click", 150.0, 1))
      q.processAllAvailable()
      val starts = spark.table("slide_sink").select("window_start").as[Long].collect().sorted
      assert(starts.length === 2)
      assert(starts(1) - starts(0) === 300L, "slide step is 5 minutes")
    } finally q.stop()
  }

  test("complete mode re-emits full aggregate each trigger") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val counts = ms.toDF().groupBy("value").count()
    val q = Sinks.memory(counts, "complete_sink", "complete").start()
    try {
      ms.addData("a", "b", "a")
      q.processAllAvailable()
      assert(spark.table("complete_sink").as[(String, Long)].collect().toMap
        === Map("a" -> 2L, "b" -> 1L))

      ms.addData("b")
      q.processAllAvailable()
      // complete mode: the sink holds the ENTIRE result, refreshed
      assert(spark.table("complete_sink").as[(String, Long)].collect().toMap
        === Map("a" -> 2L, "b" -> 2L))
    } finally q.stop()
  }
}
