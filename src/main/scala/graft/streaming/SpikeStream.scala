package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Timeseries

/** Live rate-spike monitoring — the deployment shape of the batch
  * rate_spikes operator (the DupSpansStream pattern: a NIGHTLY model
  * artifact + a live probe): the nightly batch computes the per-type
  * hourly median/MAD (Timeseries.rateMedMad — model-sized, frozen for
  * the stream's lifetime), the live stream maintains per-(type, hour)
  * counts as a complete-mode aggregation, and the alarm reading joins
  * the live state against the broadcast model through the SAME flag
  * rule the batch detector uses — the alarm cannot drift between the
  * two.
  *
  * Correctness posture: hourly counts are split-invariant sums, so
  * the live state equals the batch hourly frame exactly under any
  * micro-batch split (the DriftStream argument), and the flag reading
  * over it equals batch rateSpikes run with the same frozen model —
  * SpikeStreamSpec pins both.
  */
object SpikeStream {

  /** The streaming count aggregation — run in complete mode into a
    * memory/table sink; same code as the batch hourly frame. */
  def hourlyCounts(stream: DataFrame): DataFrame =
    Timeseries.hourlyCounts(stream)

  /** Alarm reading over the live state and the frozen nightly model. */
  def reading(state: DataFrame, medMad: DataFrame): DataFrame =
    Timeseries.spikeFlags(state, medMad)
}
