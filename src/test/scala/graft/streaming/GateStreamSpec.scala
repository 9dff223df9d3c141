package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Observed-metrics quality gate: per-micro-batch (n_rows, n_keep)
  * ride the stream's own pass via Dataset.observe, and their totals
  * must reconcile exactly with the batch operator's counts. */
class GateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // keep
    (2L, "x"),                                           // too short
    (3L, "a a a a a a"),                                 // alpha-thin? keep rule decides
    (4L, "the cat sat on the mat and looked at the dog"),
    (5L, "1 2 3 4 5 6 7 8 9"))                           // digits: alpha ratio 0

  test("observed totals across micro-batches == batch counts; sink gets only keeps") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val q = Sinks.memory(GateStream.gated(stream), "gate_sink", "append").start()
    try {
      ms.addData(docs.take(2): _*)
      q.processAllAvailable()
      ms.addData(docs.drop(2): _*)
      q.processAllAvailable()

      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(GateStream.metricName)))
      val nRows = observed.map(_.getAs[Long]("n_rows")).sum
      val nKeep = observed.map(_.getAs[Long]("n_keep")).sum

      val batch = docs.toDF("doc_id", "text")
      val expectKeep = batch
        .filter(TextAnalysis.qualityKeepExpr(col("text"))).count()
      assert(nRows === docs.size.toLong,
        "observe must count every row that flowed, kept or not")
      assert(nKeep === expectKeep)

      val sunk = spark.table("gate_sink").select("doc_id").as[Long]
        .collect().toSet
      val expectIds = batch.filter(TextAnalysis.qualityKeepExpr(col("text")))
        .select("doc_id").as[Long].collect().toSet
      assert(sunk === expectIds, "sink rows are exactly the keeps")
      assert(expectKeep > 0 && expectKeep < docs.size.toLong,
        "fixture must exercise both sides of the gate")
    } finally q.stop()
  }

  test("observe is batch-legal: same gate code runs as a batch transform") {
    val out = GateStream.gated(docs.toDF("doc_id", "text"))
    val kept = out.select("doc_id").as[Long].collect().toSet
    val expect = docs.toDF("doc_id", "text")
      .filter(TextAnalysis.qualityKeepExpr(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expect)
  }
}
