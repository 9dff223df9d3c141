package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Windows

/** session_window is the one window family with data-dependent bounds.
  * Streaming session aggregation supports append mode: a session is
  * emitted once the watermark passes its end (last event + gap). */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sessionization: within-gap events merge, sessions emit after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val out = Windows.sessionized(
      ms.toDF().withWatermark("ts", "10 minutes"), gap = "30 minutes")
    val q = Sinks.memory(out, "sess_sink", "append").start()
    try {
      ms.addData(
        SensorEvent.at(1, "2024-01-01 10:00:00", 1, "click", 1.0, 1),
        SensorEvent.at(2, "2024-01-01 10:20:00", 1, "click", 2.0, 2), // merges (gap 20m)
        SensorEvent.at(4, "2024-01-01 10:10:00", 2, "view", 8.0, 4))  // other user
      q.processAllAvailable()
      // watermark 10:10 hasn't passed any session end yet
      assert(spark.table("sess_sink").isEmpty)

      // advance event time far enough to close both sessions
      // (user1 session end 10:50, user2 session end 10:40; wm = 12:50)
      ms.addData(SensorEvent.at(3, "2024-01-01 13:00:00", 1, "click", 4.0, 3))
      q.processAllAvailable()
      val rows = spark.table("sess_sink")
        .select("user_id", "n", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set((1L, 2L, 3.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }
}
