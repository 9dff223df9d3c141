package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Timeseries

/** Streaming OHLC ≡ batch OHLC: the stream sees the same events in
  * shuffled order across micro-batches; every watermark-closed bar must
  * match the batch operator's row exactly (open/close champions merge
  * correctly across partial aggregates and batches). */
object OhlcStreamSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double, props: String)
}

class OhlcStreamSpec extends SparkSpec {
  import spark.implicits._
  import OhlcStreamSpec.Ev

  private def ev(id: Long, sec: Long, tpe: String, v: Double) =
    Ev(id, new Timestamp(sec * 1000), 1L, tpe, v, "{}")

  test("watermark-closed bars match the batch operator under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    // two hour-bars per type; ids at equal timestamps pin tie-breaks
    val all = Seq(
      ev(1, 3600 + 10, "click", 5.00), ev(2, 3600 + 10, "click", 7.00),
      ev(3, 3600 + 900, "click", 9.99), ev(4, 3600 + 3599, "click", 3.00),
      ev(5, 7200 + 5, "click", 1.25), ev(6, 7200 + 50, "click", 8.00),
      ev(7, 3600 + 30, "view", 2.00), ev(8, 3600 + 60, "view", 0.50))

    val ms = MemoryStream[Ev]
    val q = Sinks.memory(
      StreamPipelines.ohlcStream(ms.toDF(), watermark = "10 minutes"),
      "ohlc_sink", "append").start()
    try {
      // later half first, then the earlier half, then a far-future
      // heartbeat to close every bar
      val (late, early) = all.partition(_.ts.getTime >= (3600 + 900) * 1000L)
      ms.addData(late: _*)
      q.processAllAvailable()
      ms.addData(early: _*)
      q.processAllAvailable()
      ms.addData(ev(99, 100000, "view", 1.0))
      q.processAllAvailable()

      val got = spark.table("ohlc_sink")
        .select("window_start", "event_type", "open_cents", "close_cents",
          "high_cents", "low_cents", "n")
        .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
      val want = Timeseries.resampleOhlc(all.toDF())
        .select("window_start", "event_type", "open_cents", "close_cents",
          "high_cents", "low_cents", "n")
        .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === want)
      assert(want.size === 3, "fixture should close three bars")
      // the shuffled arrival put the open's timestamp-tie (ids 1, 2) in
      // the SECOND batch: the champion merge must still pick id 1
      assert(got.exists(r => r._1 == 3600L && r._2 == "click" && r._3 == 500L))
    } finally q.stop()
  }
}
