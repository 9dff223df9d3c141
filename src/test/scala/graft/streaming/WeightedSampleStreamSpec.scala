package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Streaming WEIGHTED RESERVOIR over the exponential race: because a
  * doc's priority is a pure function of (doc_id, text) and
  * min-n(A ∪ B) = min-n(min-n(A) ∪ B), a running top-n reservoir
  * folded over ANY micro-batch arrival order equals the batch
  * weightedSample over everything seen — the Efraimidis–Spirakis
  * property that makes weighted sampling STREAMABLE at all (state =
  * n rows, regardless of how many docs flowed). The production shape:
  * foreachBatch merges the incoming batch's priorities into the
  * n-row reservoir artifact. */
class WeightedSampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = (0L until 60L).map { i =>
    (i, if (i % 3 == 0) "abcdef ghijk lmnop qrstu" else s"12 34 doc $i", "s")
  }

  private val n = 10

  private def runStream(batches: Seq[Seq[(Long, String, String)]])
      : Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    var reservoir: DataFrame = Seq.empty[(Long, String, Long, Long, Long)]
      .toDF("doc_id", "source", "bucket", "w_bp", "priority")
    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        reservoir = reservoir
          .unionByName(TextAnalysis.weightedPriorities(batch)
            .select("doc_id", "source", "bucket", "w_bp", "priority"))
          .orderBy(col("priority").asc, col("bucket"), col("doc_id"))
          .limit(n)
          .localCheckpoint()
        ()
      }
      .start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    reservoir.select("doc_id", "priority").as[(Long, Long)]
      .collect().sortBy(_._2).toSeq
  }

  test("running reservoir equals the batch race under any arrival split") {
    val batch = TextAnalysis
      .weightedSample(corpus.toDF("doc_id", "text", "source"), n)
      .select("doc_id", "priority").as[(Long, Long)]
      .collect().sortBy(_._2).toSeq
    assert(batch.length === n)

    val oneByOne = runStream(corpus.map(Seq(_)))
    val chunked = runStream(corpus.grouped(7).toSeq)
    val reversed = runStream(corpus.reverse.grouped(13).toSeq)
    assert(oneByOne === batch)
    assert(chunked === batch)
    assert(reversed === batch, "arrival ORDER must not matter either")
  }
}
