package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** Streaming ANN QUERY serving — the read-side bookend to IvfIngest's
  * write side: query vectors arrive as a stream and each micro-batch
  * is served against the STATIC stored IVF+int8 index through the
  * exact batch serving path (annIvfTopKFromIndex — probes equi-join
  * the partitionBy(cell) layout, scores from stored integers).
  *
  * Correctness posture: each result row depends only on its own query
  * row + the static index/centroids, so the streamed results are
  * batch-identical under ANY micro-batch split — ServeStreamSpec pins
  * row-for-row parity with batch serving of the same query set. The
  * index and centroids are frozen for the stream's lifetime (the
  * IvfIngest operational rule from the other side: new quantizer ⇒
  * rebuild, never mid-stream).
  */
object ServeStream {

  /** foreachBatch writer serving each query micro-batch and appending
    * results to `collect` (any batch-side sink fn). Queries frame:
    * (query_id, e: array<double>). */
  def writer(queries: DataFrame, index: DataFrame, cents: DataFrame,
             nProbe: Int, k: Int)(
      collect: DataFrame => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        collect(Similarity.annIvfTopKFromIndex(index, batch, cents, nProbe, k))
      }
}
