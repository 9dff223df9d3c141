package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Cdc

/** Streaming SCD2 ≡ batch SCD2: the stream sees the same change log in
  * shuffled order across micro-batches (watermark permitting); the
  * closed intervals it appends must be byte-identical to the batch
  * operator's closed (valid_to_us non-null) rows, and the open rows
  * must remain exclusively in state. */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._
  import Scd2Stream.{Change, ClosedInterval}

  private def ch(u: Long, id: Long, sec: Long, v: Double) =
    Change(u, id, new Timestamp(sec * 1000), v)

  test("shuffled multi-batch arrival reproduces the batch interval chain") {
    implicit val sqlCtx = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingConfs.applyRocksDb(spark)
    try {
      // u1: three changes incl. a same-second tie (ids 2,3) — the tie
      // pair must chain by event_id exactly like the batch window;
      // u2: a single change (stays open, must emit NOTHING)
      val all = Seq(
        ch(1, 1, 10, 1.00), ch(1, 2, 20, 2.00), ch(1, 3, 20, 3.00),
        ch(1, 4, 40, 4.00),
        ch(2, 9, 15, 5.00))

      val ms = MemoryStream[Change]
      val closed = Scd2Stream.closedIntervals(
        ms.toDS().withWatermark("ts", "1000 seconds"))
      val q = Sinks.memory(closed.toDF(), "scd2_sink", "append").start()
      try {
        // later half first: the replay has to reorder across batches
        val (late, early) = all.partition(_.ts.getTime >= 20000)
        ms.addData(late: _*)
        q.processAllAvailable()
        ms.addData(early: _*)
        q.processAllAvailable()
        // advance the watermark past the data, then fire the timers
        ms.addData(ch(99, 0, 5000, 0.0))
        q.processAllAvailable()
        ms.addData(ch(99, 0, 6000, 0.0))
        q.processAllAvailable()

        val got = spark.table("scd2_sink").as[ClosedInterval].collect()
          .map(c => (c.user_id, c.event_id, c.cents,
            c.valid_from_us, c.valid_to_us))
          .sortBy(t => (t._1, t._4, t._2))

        val want = Cdc.scd2Intervals(
            all.map(c => (c.user_id, c.event_id, c.ts, c.value))
              .toDF("user_id", "event_id", "ts", "value"))
          .filter("valid_to_us IS NOT NULL AND user_id < 99")
          .select("user_id", "event_id", "cents",
            "valid_from_us", "valid_to_us")
          .as[(Long, Long, Long, Long, Long)].collect()
          .sortBy(t => (t._1, t._4, t._2))

        assert(want.nonEmpty && got.toSeq === want.toSeq)
        // the open rows (u1 id 4, u2 id 9) never reach the sink
        assert(!got.exists(t => t._2 == 4L || t._2 == 9L))
      } finally q.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
