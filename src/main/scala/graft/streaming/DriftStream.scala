package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.CorpusStats

/** Streaming embedding-drift monitoring — the live half of
  * CorpusStats.centroidDrift: the per-(label, dim) integer component
  * sums are an ordinary streaming aggregation (integer sums are
  * associative/commutative, so complete-mode state is EXACTLY the
  * batch aggregate under any micro-batch split — no watermark games,
  * no approximation), and the model-sized drift tail runs as a batch
  * query over the sink table whenever the monitor wants a reading.
  *
  * This is the admit-gate deployment shape: embeddings stream in as
  * slices arrive, the state stays |labels|·dim rows regardless of how
  * many vectors flowed, and a drift alarm reads cos_micro between
  * slice centroids without ever rescanning the corpus.
  */
object DriftStream {

  /** The streaming component-sum aggregation — run with
    * `Sinks.memory(centroidSums(stream), name, "complete")` (or any
    * complete-mode sink). Same code path as the batch operator. */
  def centroidSums(stream: DataFrame): DataFrame =
    CorpusStats.componentSums(stream)

  /** Drift reading over the live state (the sink table registered by
    * the complete-mode query). */
  def driftReading(state: DataFrame): DataFrame =
    CorpusStats.driftFromSums(state)
}
