package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CorpusStats

/** Streaming vocab-coverage admission gate: the frozen one-row vocab
  * broadcasts into the stream, per-batch observed metrics ride the
  * stream's own pass, and the admitted set must equal the batch rule
  * on the union of everything that flowed — under any split. */
class VocabGateStreamSpec extends SparkSpec {
  import spark.implicits._

  // the frozen vocab trains on a reference corpus where "alpha beta
  // gamma" dominate; streamed docs then carry varying OOV shares
  private val reference = Seq(
    (100L, "alpha beta gamma alpha beta", "en", "ref", 0L),
    (101L, "alpha beta gamma gamma", "en", "ref", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val arrivals = Seq(
    (1L, "alpha beta gamma"),        // 0 bp      -> keep
    (2L, "alpha beta zork"),         // 3333 bp   -> drop at 2000
    (3L, "alpha alpha alpha alpha"), // 0 bp      -> keep
    (4L, "zork blort frump"),        // 10000 bp  -> drop
    (5L, "alpha beta gamma gamma zork")) // 2000 bp -> keep (boundary)

  test("admitted set == batch rule under a 2/3 split; metrics reconcile") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = CorpusStats.vocabSetRow(reference, vocabSize = 3)
      .localCheckpoint()
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val q = Sinks.memory(VocabGateStream.gated(stream, vocab),
      "vocab_gate_sink", "append").start()
    try {
      ms.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      ms.addData(arrivals.drop(2): _*)
      q.processAllAvailable()

      val sunk = spark.table("vocab_gate_sink").select("doc_id")
        .as[Long].collect().toSet
      assert(sunk === Set(1L, 3L, 5L),
        "keeps are exactly the docs at or under 2000 bp OOV")

      val observed = q.recentProgress.toSeq
        .flatMap(p =>
          Option(p.observedMetrics.get(VocabGateStream.metricName)))
      assert(observed.map(_.getAs[Long]("n_rows")).sum === 5L)
      assert(observed.map(_.getAs[Long]("n_keep")).sum === 3L)
      assert(observed.map(_.getAs[Long]("oov_tokens")).sum === 5L,
        "zork + (zork blort frump) + zork = 5 OOV tokens")
      assert(observed.map(_.getAs[Long]("n_tokens")).sum === 18L)
    } finally q.stop()
  }

  test("batch-legal: the same gate code equals the batch coverage rule") {
    val vocab = CorpusStats.vocabSetRow(reference, vocabSize = 3)
    val batch = arrivals.toDF("doc_id", "text")
    val kept = VocabGateStream.gated(batch, vocab)
      .select("doc_id").as[Long].collect().toSet
    val expect = CorpusStats.oovScored(batch, vocab)
      .filter(col("oov_bp") <= 2000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expect && kept === Set(1L, 3L, 5L))
  }
}
