package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** dropDuplicatesWithinWatermark semantics: duplicates inside the
  * horizon are dropped, state expires with the watermark, and a
  * post-horizon re-occurrence re-emits (the documented contract the
  * nightly incremental pass backstops). */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, sec: Long) =
    (id, text, new Timestamp(sec * 1000))

  test("duplicates within the watermark horizon drop; state expires past it") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val deduped = DedupStream.withinWatermark(
      ms.toDF().toDF("doc_id", "text", "ts"), "100 seconds")
    val q = Sinks.memory(deduped, "dedup_stream_sink", "append").start()
    try {
      // batch 1: two copies of the same content 10s apart + one other
      ms.addData(doc(1, "same text", 10), doc(2, "same text", 20),
        doc(3, "other text", 30))
      q.processAllAvailable()
      // batch 2: a heartbeat advances the watermark to 900s — far past
      // 20s + 100s, so the "same text" state is evicted
      ms.addData(doc(90, "heartbeat", 1000))
      q.processAllAvailable()
      // batch 3: the same content re-occurs AFTER the horizon — by
      // contract it re-emits (the nightly incremental pass catches it)
      ms.addData(doc(4, "same text", 950))
      q.processAllAvailable()

      val ids = spark.table("dedup_stream_sink")
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L), "first copy must pass")
      assert(!ids.contains(2L), "in-horizon duplicate must drop")
      assert(ids.contains(3L), "distinct content must pass")
      assert(ids.contains(4L),
        "post-horizon re-occurrence must re-emit (bounded-state contract)")
    } finally q.stop()
  }
}
