package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming quality gate with OBSERVED metrics — the production
  * monitoring shape for a curation stream: `Dataset.observe` attaches
  * accumulator-backed aggregates to the stream itself, so every
  * micro-batch reports (rows seen, rows kept) in its
  * StreamingQueryProgress WITHOUT a second aggregation query, a
  * foreachBatch count, or any extra scan — the metrics ride the
  * existing pass through the data (exactly-once per epoch by
  * contract, unlike accumulators in retried tasks).
  *
  * The gate itself is the batch corpus keep rule
  * (TextAnalysis.qualityKeepExpr) unchanged — the same expression the
  * oracle checks in batch — so stream and batch CANNOT drift, and the
  * observed totals must reconcile exactly with the batch counts
  * (GateStreamSpec pins both, across micro-batch splits).
  */
object GateStream {

  val metricName = "quality_gate"

  /** The gated stream: observe (n_rows, n_keep) then filter to keeps.
    * Works identically on a batch frame (observe is batch-legal). */
  def gated(docs: DataFrame): DataFrame =
    docs.observe(metricName,
        count(lit(1)).as("n_rows"),
        sum(when(TextAnalysis.qualityKeepExpr(col("text")), 1L)
          .otherwise(0L)).as("n_keep"))
      .filter(TextAnalysis.qualityKeepExpr(col("text")))
}
