package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Windows

/** Streaming funnel ≡ batch funnel: the stream sees the SAME events in
  * shuffled order across several micro-batches (watermark permitting),
  * and the per-stage user sets must match the batch operator's counts
  * exactly. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  import FunnelStream.Ev

  private def ev(u: Long, t: String, sec: Long) =
    Ev(u, t, new Timestamp(sec * 1000))

  test("watermark-ordered replay reproduces batch funnel semantics") {
    implicit val sqlCtx = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingConfs.applyRocksDb(spark)
    try {
      // u1 full funnel; u2 click-before-view (click invalid, purchase
      // therefore invalid); u3 purchase first; u4 noise only; u5's
      // valid click is the SECOND one — all the batch spec's traps
      val all = Seq(
        ev(1, "view", 10), ev(1, "click", 20), ev(1, "purchase", 30),
        ev(2, "click", 10), ev(2, "view", 20), ev(2, "purchase", 30),
        ev(3, "purchase", 10), ev(3, "view", 20), ev(3, "click", 30),
        ev(4, "error", 10),
        ev(5, "click", 5), ev(5, "view", 20), ev(5, "click", 40),
        ev(5, "purchase", 50))

      val ms = MemoryStream[Ev]
      // the delay must cover the whole out-of-order window: in
      // event-time mode rows BELOW the watermark are late-filtered
      // before the processor, so a short delay would silently drop the
      // early half and the test would "pass" for the wrong reason
      val hits = FunnelStream.stageHits(
        ms.toDS().withWatermark("ts", "1000 seconds"))
      val q = Sinks.memory(hits.toDF(), "funnel_sink", "append").start()
      try {
        // shuffled arrival: batch 1 gets the LATER half of each user's
        // events, batch 2 the earlier half — the watermark (≤ 0 while
        // only 10–50s data is in) holds everything pending, so the
        // replay must reorder correctly
        val (late, early) = all.partition(_.ts.getTime >= 25000)
        ms.addData(late: _*)
        q.processAllAvailable()
        ms.addData(early: _*)
        q.processAllAvailable()
        // close the stream: two far-future pokes — the first advances
        // the watermark past all data, the second fires the timers
        // registered under the old watermark
        ms.addData(ev(99, "error", 5000))
        q.processAllAvailable()
        ms.addData(ev(99, "error", 6000))
        q.processAllAvailable()

        val got = spark.table("funnel_sink")
          .as[FunnelStream.StageHit].collect()
          .groupBy(_.stage).view.mapValues(_.map(_.user_id).toSet).toMap
        assert(got.getOrElse("view", Set()) === Set(1L, 2L, 3L, 5L))
        assert(got.getOrElse("click", Set()) === Set(1L, 3L, 5L))
        assert(got.getOrElse("purchase", Set()) === Set(1L, 5L))
        // u5's click anchor must be the 40s click, not the pre-view 5s
        val u5Click = spark.table("funnel_sink")
          .as[FunnelStream.StageHit].collect()
          .find(h => h.user_id == 5L && h.stage == "click").get
        assert(u5Click.tus === 40000000L)

        // cross-check the stage counts against the batch operator
        val batch = Windows.funnelConversion(
          all.toDF("user_id", "event_type", "ts"))
          .as[(Long, Long, Long, Long)].head()
        assert(batch._2 === got("view").size.toLong)
        assert(batch._3 === got("click").size.toLong)
        assert(batch._4 === got("purchase").size.toLong)
      } finally q.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sub-millisecond event spacing survives the buffer (micros, not ms)") {
    // view and click 500µs apart: ms-truncated buffering ties them and
    // the strict `>` gate drops the click; the batch operator
    // (unix_micros) counts it — the parity this pins
    implicit val sqlCtx = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingConfs.applyRocksDb(spark)
    try {
      def at(sec: Long, micros: Int): Timestamp = {
        val t = new Timestamp(sec * 1000)
        t.setNanos(micros * 1000)
        t
      }
      val view = Ev(1, "view", at(10, 0))
      val click = Ev(1, "click", at(10, 500)) // same ms, +500µs
      val ms = MemoryStream[Ev]
      val hits = FunnelStream.stageHits(
        ms.toDS().withWatermark("ts", "1000 seconds"))
      val q = Sinks.memory(hits.toDF(), "funnel_subms_sink", "append").start()
      try {
        ms.addData(view, click)
        q.processAllAvailable()
        ms.addData(Ev(99, "error", at(5000, 0)))
        q.processAllAvailable()
        ms.addData(Ev(99, "error", at(6000, 0)))
        q.processAllAvailable()
        val got = spark.table("funnel_subms_sink")
          .as[FunnelStream.StageHit].collect()
          .filter(_.user_id == 1L).map(h => h.stage -> h.tus).toMap
        assert(got === Map("view" -> 10000000L, "click" -> 10000500L))
      } finally q.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
