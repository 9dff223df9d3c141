package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming span redaction — the production shape for the dup_spans
  * family: the dup-hash index is the NIGHTLY corpus artifact
  * (Dedup.dupHashIndex, persisted bucketed by h), and live-ingested
  * docs redact against it per micro-batch via foreachBatch. Each
  * output row depends only on its own doc and the static index, so
  * the result must be IDENTICAL to the batch operator under any
  * micro-batch split — this spec feeds the same corpus in two
  * deliberately different batch arrangements and requires bit parity
  * with batch dupSpansRedact both times. */
class DupSpansStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b p q r s t c d"),   // shares "p q r s t" with doc 2
    (2L, "p q r s t x y z"),
    (3L, "u v w only here once more words"),
    (4L, "j k l m"),             // 4/5 identical → fully covered
    (5L, "j k l m"))

  private def runStream(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long, Long, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val corpusDf = corpus.toDF("doc_id", "text")
    // the nightly artifact: build once, localCheckpoint stands in for
    // the persisted bucketed parquet the production job would read
    val index = Dedup.dupHashIndex(corpusDf, w = 4, minDf = 2).localCheckpoint()
    val collected = scala.collection.mutable.Set[(Long, Long, Long, String)]()
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= Dedup.dupSpansRedactWithIndex(batch, index, w = 4)
          .as[(Long, Long, Long, String)].collect()
        ()
      }
      .start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    collected.toSet
  }

  test("foreachBatch redaction against the nightly index is batch-identical under any split") {
    val batch = Dedup.dupSpansRedact(corpus.toDF("doc_id", "text"), w = 4, minDf = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(batch.nonEmpty)

    // one doc per micro-batch vs one big micro-batch: same answer
    val oneByOne = runStream(corpus.map(Seq(_)))
    val allAtOnce = runStream(Seq(corpus))
    assert(oneByOne === batch)
    assert(allAtOnce === batch)
    // and the redaction actually redacted (doc 4/5 fully covered)
    assert(batch.exists { case (id, _, kept, text) => id == 4L && kept == 0L && text == "" })
  }
}
