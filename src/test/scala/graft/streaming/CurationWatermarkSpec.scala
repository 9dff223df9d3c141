package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Round-5 directive: the event-time curation variant. Unlike
  * curationStream's unbounded dropDuplicates (batch-parity semantics
  * for a finite corpus), curationStreamWatermarked bounds BOTH stateful
  * operators — dedup state by the watermark horizon, aggregation state
  * by the event-time window — so state size is a function of the
  * horizon, not of stream lifetime.
  */
case class TimedDoc(doc_id: Long, ts: Timestamp, text: String)

object TimedDoc {
  def at(id: Long, ts: String, text: String): TimedDoc =
    TimedDoc(id, Timestamp.valueOf(ts), text)
}

class CurationWatermarkSpec extends SparkSpec {
  import spark.implicits._

  // both pass the keep rule (>= 5 words, alpha ratio > 0.5) and carry
  // 'the' so predLangExpr scores them 'en'
  private val textA = "the cat sat on the mat today"          // 7 ws tokens
  private val textB = "the quick brown fox jumps over a lazy dog" // 9 ws tokens
  private val textC = "the sun rose over the quiet hills"     // watermark pusher

  test("in-watermark duplicates collapse; closed window emits bounded-state summary") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TimedDoc]
    val out = StreamPipelines.curationStreamWatermarked(
      ms.toDF(), watermark = "5 minutes", windowLen = "10 minutes")
    val q = Sinks.memory(out, "cur_wm_sink", "append").start()
    try {
      ms.addData(
        TimedDoc.at(1, "2024-01-01 10:01:00", textA),
        TimedDoc.at(2, "2024-01-01 10:02:00", textA), // dup within watermark
        TimedDoc.at(3, "2024-01-01 10:03:00", textB))
      q.processAllAvailable()
      // watermark = 10:03 - 5min → window [10:00, 10:10) still open
      assert(spark.table("cur_wm_sink").isEmpty)

      // push event time to 10:30 → watermark 10:25 closes the window
      ms.addData(TimedDoc.at(99, "2024-01-01 10:30:00", textC))
      q.processAllAvailable()

      val rows = spark.table("cur_wm_sink")
        .select("pred_lang", "n_docs", "total_tokens", "avg_tokens")
        .as[(String, Long, Long, Double)].collect().toSet
      // textA counted ONCE despite two arrivals; textB once: 7 + 9 tokens
      assert(rows === Set(("en", 2L, 16L, 8.0)))

      // both stateful operators are present and watermark-bounded:
      // the dedup-within-watermark state plus the windowed aggregate
      val ops = q.lastProgress.stateOperators.map(_.operatorName).toSet
      assert(ops.exists(_.toLowerCase.contains("dedupe")), s"ops=$ops")
      assert(ops.exists(_.toLowerCase.contains("statestore")), s"ops=$ops")
    } finally q.stop()
  }

  test("duplicate arriving after the horizon is counted again (the documented trade)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TimedDoc]
    val out = StreamPipelines.curationStreamWatermarked(
      ms.toDF(), watermark = "5 minutes", windowLen = "10 minutes")
    val q = Sinks.memory(out, "cur_wm_sink2", "append").start()
    try {
      ms.addData(TimedDoc.at(1, "2024-01-01 10:01:00", textA))
      q.processAllAvailable()
      // an unrelated batch first: dedup state expires against the
      // WATERMARK, which advances at batch END — textA's entry
      // (expires at 10:01 + 5min) is gone only after a batch whose
      // max event time pushes the watermark past 10:06
      ms.addData(TimedDoc.at(2, "2024-01-01 10:45:00", textB))
      q.processAllAvailable()
      // same text, an hour later: its dedup state has expired, so it
      // counts again in its own window
      ms.addData(TimedDoc.at(3, "2024-01-01 11:01:00", textA))
      q.processAllAvailable()
      ms.addData(TimedDoc.at(4, "2024-01-01 12:00:00", textC))
      q.processAllAvailable()

      val byWindow = spark.table("cur_wm_sink2")
        .select("window_start", "n_docs").as[(Long, Long)].collect().toMap
      val h = java.sql.Timestamp.valueOf("2024-01-01 11:01:00").getTime / 1000
      val win11 = h - (h % 600) // textA's second window, [11:00, 11:10)
      assert(byWindow.get(win11) === Some(1L),
        s"the beyond-horizon duplicate must count again: $byWindow")
      assert(byWindow.size === 3, s"windows 10:00, 10:40, 11:00: $byWindow")
    } finally q.stop()
  }
}
