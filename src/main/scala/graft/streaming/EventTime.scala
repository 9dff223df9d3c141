package graft.streaming

import java.sql.Timestamp

/** Event-time and money conversions shared by the stateful streaming
  * processors, kept bit-identical to the batch operators they claim
  * parity with:
  *
  *  - [[micros]] mirrors Spark's `unix_micros(ts)` — the batch
  *    operators compare microseconds, so the stream buffers must too:
  *    `ts.getTime` alone is millisecond-truncated, and events distinct
  *    only at sub-ms resolution would collapse into ties (FunnelStream's
  *    strict `>` then drops stages; Scd2Stream would chain intervals at
  *    the wrong boundary).
  *  - [[centsHalfUp]] mirrors `round(value * 100, 0).cast("long")` —
  *    Spark's Round on doubles is decimal HALF_UP, which differs from
  *    `math.round` (floor(x+0.5)) on negative half-cents
  *    (-0.5 → -1 vs 0).
  */
private[streaming] object EventTime {

  /** unix_micros: epoch seconds × 1e6 + intra-second nanos ÷ 1e3.
    * `getTime` already includes the ms part of the nanos field, so the
    * seconds must be floor-divided out before re-adding the full
    * microsecond fraction. */
  def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** The watermark comparison grid is milliseconds (Spark reports
    * watermarks in ms): the event-time ms a buffered micros value
    * falls in. */
  def wmMillis(tus: Long): Long = Math.floorDiv(tus, 1000L)

  /** Batch-parity cents: decimal HALF_UP on value×100, as
    * `round(col("value") * 100, 0).cast("long")` computes it. */
  def centsHalfUp(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}
