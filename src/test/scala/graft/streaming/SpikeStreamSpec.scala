package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Timeseries

/** Live spike monitor: complete-mode hourly counts ≡ the batch hourly
  * frame under any split, and the alarm reading over the live state +
  * frozen nightly model ≡ the batch detector with the same model. */
class SpikeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: (Long, Long, String)*) = {
    import java.sql.Timestamp
    rows.map { case (id, hr, t) =>
      (id, new Timestamp(hr * 3600L * 1000L), 1L, t, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("streamed counts == batch counts; live alarm == batch detector") {
    implicit val sqlCtx = spark.sqlContext
    val quiet = for { h <- 0L until 9L; i <- 0L until 2L }
      yield (h * 100 + i, h, "a")
    val burst = (0L until 20L).map(i => (9000L + i, 9L, "a"))
    val all = (quiet ++ burst).toSeq

    // nightly model from yesterday's QUIET history only
    val model = Timeseries.rateMedMad(mkEvents(quiet: _*)).localCheckpoint()

    val ms = MemoryStream[(Long, Long, String)]
    val stream = {
      import org.apache.spark.sql.functions._
      ms.toDF().toDF("event_id", "hr", "event_type")
        .select(col("event_id"), (col("hr") * 3600L * 1000000L).as("us"),
          col("event_type"))
        .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
          col("event_type"))
    }
    val q = Sinks.memory(SpikeStream.hourlyCounts(stream),
      "spike_state", "complete").start()
    try {
      ms.addData(all.take(10): _*)
      q.processAllAvailable()
      ms.addData(all.drop(10): _*)
      q.processAllAvailable()

      val state = spark.table("spike_state")
      val batchHourly = Timeseries.hourlyCounts(mkEvents(all: _*))
      assert(state.collect().map(_.toSeq).toSet ===
        batchHourly.collect().map(_.toSeq).toSet)

      val live = SpikeStream.reading(state, model)
        .collect().map(_.toSeq).toSet
      val batch = Timeseries.spikeFlags(batchHourly, model)
        .collect().map(_.toSeq).toSet
      assert(live === batch)
      // and the burst hour actually alarms against the quiet model
      import org.apache.spark.sql.functions._
      val spikes = SpikeStream.reading(state, model)
        .filter(col("spike")).select("hour").as[Long].collect()
      assert(spikes.toSeq === Seq(9L))
    } finally q.stop()
  }
}
