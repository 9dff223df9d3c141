package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.CorpusStats

/** Streaming KS drift gate: integer doc counts are associative, so the
  * complete-mode histogram state must equal the batch aggregate under
  * ANY micro-batch split, and the KS reading over the live state must
  * equal the batch ksDrift on the union of everything that arrived. */
class KsGateStreamSpec extends SparkSpec {
  import spark.implicits._

  // the CorpusStatsSpec hand-computed corpus, streamed: A {1,1,3},
  // B {1,3,3}, C {5}
  private val arrivals = Seq(
    (1L, "a", "A"), (2L, "b", "A"), (3L, "a b c", "A"),
    (4L, "a", "B"), (5L, "a b c", "B"), (6L, "x y z", "B"),
    (7L, "a b c d e", "C"))

  test("streamed histogram == batch under a 3/4 split; KS reading " +
       "matches batch ksDrift mid-stream and at the end") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val stream = ms.toDF().toDF("doc_id", "text", "source")
    val q = Sinks.memory(KsGateStream.lengthHist(stream),
      "ks_state", "complete").start()
    try {
      ms.addData(arrivals.take(3): _*)
      q.processAllAvailable()
      // mid-stream: state equals the batch histogram of what arrived,
      // and the reading equals batch ksDrift on the same prefix (a
      // single-source prefix would legally read as zero rows)
      val mid = spark.table("ks_state").collect().map(_.toSeq).toSet
      val midBatch = CorpusStats.lengthHist(
        arrivals.take(3).toDF("doc_id", "text", "source"))
        .collect().map(_.toSeq).toSet
      assert(mid === midBatch)

      ms.addData(arrivals.drop(3): _*)
      q.processAllAvailable()
      val fin = spark.table("ks_state").collect().map(_.toSeq).toSet
      val finBatch = CorpusStats.lengthHist(
        arrivals.toDF("doc_id", "text", "source"))
        .collect().map(_.toSeq).toSet
      assert(fin === finBatch)

      val live = KsGateStream.ksReading(spark.table("ks_state"))
        .collect().map(_.toSeq).toSet
      val batch = CorpusStats.ksDrift(
        arrivals.toDF("doc_id", "text", "source"))
        .collect().map(_.toSeq).toSet
      assert(live === batch)
      assert(live.map(_.head) === Set("A", "B", "C"))

      // the PSI verdict reads off the SAME state — no second
      // streaming aggregation — and must equal the batch psiDrift
      val livePsi = KsGateStream.psiReading(spark.table("ks_state"), 1L)
        .collect().map(_.toSeq).toSet
      val batchPsi = CorpusStats.psiDrift(
        arrivals.toDF("doc_id", "text", "source"), binWidth = 1L)
        .collect().map(_.toSeq).toSet
      assert(livePsi === batchPsi)
      assert(livePsi.map(_.head) === Set("A", "B", "C"))
    } finally q.stop()
  }

  test("split-invariance: one-row batches give the same final state " +
       "and the hand-computed KS verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val stream = ms.toDF().toDF("doc_id", "text", "source")
    val q = Sinks.memory(KsGateStream.lengthHist(stream),
      "ks_state_1row", "complete").start()
    try {
      arrivals.foreach { r => ms.addData(r); q.processAllAvailable() }
      val live = KsGateStream.ksReading(spark.table("ks_state_1row"))
        .select("source", "n_docs", "ks_micro", "ks_at_len")
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(live === Seq(("A", 3L, 416666L, 1L), ("B", 3L, 250000L, 3L),
        ("C", 1L, 1000000L, 3L)))
    } finally q.stop()
  }
}
