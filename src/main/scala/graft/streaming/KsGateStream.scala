package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.CorpusStats

/** Streaming length-distribution drift monitoring — the live half of
  * CorpusStats.ksDrift: the per-(source, len) doc counts are an
  * ordinary streaming aggregation (integer counts are associative and
  * commutative, so complete-mode state is EXACTLY the batch histogram
  * under any micro-batch split — no watermark games, no
  * approximation), and the model-sized KS reading runs as a batch
  * query over the sink table whenever the admission gate wants a
  * verdict.
  *
  * This is the admit-gate deployment shape for a continuously-crawled
  * corpus: documents stream in as batches arrive, the state stays
  * |sources|·|distinct lengths| rows regardless of how many docs
  * flowed, and the one-vs-rest KS alarm (with its ks_at_len argmax
  * naming the diverging length) reads off the live histogram without
  * ever rescanning the corpus — the DriftStream/VocabGateStream
  * discipline pointed at the row-280 operator.
  */
object KsGateStream {

  /** The streaming histogram aggregation — run with
    * `Sinks.memory(lengthHist(stream), name, "complete")` (or any
    * complete-mode sink). Same code path as the batch operator. */
  def lengthHist(stream: DataFrame): DataFrame =
    CorpusStats.lengthHist(stream)

  /** One-vs-rest KS reading over the live state (the sink table
    * registered by the complete-mode query). */
  def ksReading(state: DataFrame): DataFrame =
    CorpusStats.ksFromHist(state)

  /** One-vs-rest PSI reading over the SAME live state — one streamed
    * histogram, two drift verdicts (KS names the sharpest point of
    * divergence, PSI integrates the whole reshaping; see
    * CorpusStats.psiDrift). The gate pays zero extra streaming state
    * for the second alarm. */
  def psiReading(state: DataFrame, binWidth: Long = 8L): DataFrame =
    CorpusStats.psiFromHist(state, binWidth)
}
