package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming incremental dedup: the ingest-time probe of the static
  * corpus index, with windowed append-mode emission and EXACT batch
  * parity on the pair set. */
class IncrementalDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "an entirely different corpus document about winter weather"))

  test("streamed delta emits exactly the batch pairs once the window closes") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = corpusDocs.toDF("doc_id", "text")
    val ms = MemoryStream[TimedDoc]
    val out = StreamPipelines.incrementalDedupStream(
      ms.toDF(), corpus, k = 3, tau = 0.5,
      watermark = "5 minutes", windowLen = "10 minutes")
    val q = Sinks.memory(out, "inc_dedup_sink", "append").start()
    try {
      ms.addData(
        TimedDoc.at(10, "2024-01-01 10:01:00",
          "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
        TimedDoc.at(11, "2024-01-01 10:02:00",
          "completely novel delta text with no corpus overlap at all"))
      q.processAllAvailable()
      assert(spark.table("inc_dedup_sink").isEmpty) // window still open

      ms.addData(TimedDoc.at(99, "2024-01-01 10:30:00",
        "watermark pusher text far beyond the open window"))
      q.processAllAvailable()

      val streamed = spark.table("inc_dedup_sink")
        .select("delta_id", "corpus_id", "jac")
        .as[(Long, Long, Double)].collect().toSet

      val delta = Seq(
        (10L, "the quick brown fox jumps over the lazy dog tonight"),
        (11L, "completely novel delta text with no corpus overlap at all"),
        (99L, "watermark pusher text far beyond the open window"))
        .toDF("doc_id", "text")
      val batch = Dedup.incrementalDedupPairs(delta, corpus, k = 3, tau = 0.5)
        .as[(Long, Long, Double)].collect().toSet

      assert(streamed === batch)
      assert(streamed === Set((10L, 1L, 0.7778)))
    } finally q.stop()
  }
}
