package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming span-level decontamination rehearsal: the benchmark
  * window-hash index is the nightly artifact; incoming corpus docs
  * probe it per micro-batch through the SAME decontamSpansWithIndex
  * the batch audit runs. Per-doc results depend only on the doc and
  * the static index, so any micro-batch split must be batch-identical
  * — the admission-gate shape for continuously-crawled corpora (a doc
  * is checked for benchmark contamination BEFORE it enters the
  * training pool, not in a nightly sweep after). */
class DecontamSpansStreamSpec extends SparkSpec {
  import spark.implicits._

  private val quote = (1 to 15).map(i => s"q$i").mkString(" ")
  private val corpus = Seq(
    (1L, s"lead in words $quote and a tail"),  // contaminated: 15-run
    (2L, "nothing shared with the benchmark in this one"),
    (3L, s"$quote verbatim right at the start"),
    (4L, "clean words again without any overlap present"))
  private val bench = Seq((100L, s"$quote benchmark suffix"))

  private def runStream(batches: Seq[Seq[(Long, String)]])
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val index = Dedup.benchWindowIndex(bench.toDF("doc_id", "text"), w = 8)
      .localCheckpoint()
    val collected =
      scala.collection.mutable.Set[(Long, Long, Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= Dedup.decontamSpansWithIndex(batch, index, w = 8,
            minRunTokens = 13)
          .select("corpus_id", "bench_id", "n_runs", "max_run_tokens", "s", "e")
          .as[(Long, Long, Long, Long, Long, Long)].collect()
        ()
      }
      .start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    collected.toSet
  }

  test("streaming contamination gate is batch-identical under any split") {
    val batch = Dedup.decontamSpans(corpus.toDF("doc_id", "text"),
        bench.toDF("doc_id", "text"), w = 8, minRunTokens = 13)
      .select("corpus_id", "bench_id", "n_runs", "max_run_tokens", "s", "e")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.map(_._1) === Set(1L, 3L), "docs 1 and 3 carry the quote")

    val oneByOne = runStream(corpus.map(Seq(_)))
    val allAtOnce = runStream(Seq(corpus))
    assert(oneByOne === batch)
    assert(allAtOnce === batch)
    // span positions are exact in the streamed result too
    assert(batch.contains((1L, 100L, 1L, 15L, 4L, 18L)))
    assert(batch.contains((3L, 100L, 1L, 15L, 1L, 15L)))
  }
}
