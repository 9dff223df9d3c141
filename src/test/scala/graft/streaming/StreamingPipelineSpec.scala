package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** A simulated sensor event matching the events table layout. */
case class SensorEvent(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double, props: String)

object SensorEvent {
  def at(id: Long, time: String, user: Long, typ: String, v: Double,
         k: Long): SensorEvent =
    SensorEvent(id, Timestamp.valueOf(time), user, typ, v, s"""{"k": $k}""")
}

/** Survey #10: memory-source end-to-end pipeline — the reference's
  * kafka job (parse → stream-static join → watermark → tumbling window)
  * running on a MemoryStream with a memory sink. */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("parse → enrich → watermark → tumbling window, update mode") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val dim = Seq(
      (1L, "alice", "BUILDING"),
      (2L, "bob", "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_mktsegment")

    val out = StreamPipelines.endToEnd(ms.toDF(), dim)
    val q = Sinks.memory(out, "e2e_sink", "update").start()
    try {
      ms.addData(
        SensorEvent.at(1, "2024-01-01 10:05:00", 1, "click", 10.0, 7),
        SensorEvent.at(2, "2024-01-01 10:20:00", 2, "click", 5.0, 8),
        SensorEvent.at(3, "2024-01-01 10:40:00", 9, "view", 2.0, 9)) // no dim row
      q.processAllAvailable()

      val rows = spark.table("e2e_sink")
        .select("event_type", "n", "sum_value", "avg_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      // both clicks land in the 10:00 window; the dim-less view survives
      // the left_outer join
      assert(rows === Set(("click", 2L, 15.0, 7.5), ("view", 1L, 2.0, 2.0)))
    } finally q.stop()
  }

  test("streaming dedup drops re-sent keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val out = StreamPipelines.dedupStream(ms.toDF(), Seq("event_id"), "1 hour")
    val q = Sinks.memory(out, "dedup_sink", "append").start()
    try {
      ms.addData(
        SensorEvent.at(1, "2024-01-01 10:00:00", 1, "click", 1.0, 1),
        SensorEvent.at(1, "2024-01-01 10:00:30", 1, "click", 1.0, 1)) // same batch dup
      q.processAllAvailable()
      ms.addData(
        SensorEvent.at(1, "2024-01-01 10:05:00", 1, "click", 1.0, 1), // later dup
        SensorEvent.at(2, "2024-01-01 10:05:00", 2, "view", 2.0, 2))  // new key
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-static enrich keeps unmatched stream rows (left_outer)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val dim = Seq((1L, "alice", "BUILDING")).toDF("c_custkey", "c_name", "c_mktsegment")

    val out = StreamPipelines.parseAndEnrich(ms.toDF(), dim)
    val q = Sinks.memory(out, "enrich_sink", "append").start()
    try {
      ms.addData(
        SensorEvent.at(1, "2024-01-01 10:00:00", 1, "click", 1.0, 1),
        SensorEvent.at(2, "2024-01-01 10:01:00", 5, "click", 2.0, 2))
      q.processAllAvailable()

      val rows = spark.table("enrich_sink")
        .select("event_id", "c_name", "k").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
      assert(rows === Set((1L, Some("alice"), 1L), (2L, None, 2L)))
    } finally q.stop()
  }
}
