package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup with BOUNDED state:
  * `dropDuplicatesWithinWatermark` on the content hash — the live-ingest
  * complement of the batch `TextAnalysis.dedupExact` and the nightly
  * `Dedup.incrementalDedup`.
  *
  * The contract triangle these three span: batch dedup sees all history
  * (exact, offline); incremental dedup probes a persisted corpus index
  * (exact vs everything ingested, nightly); THIS operator dedups a live
  * stream against only the watermark horizon — state per key dies when
  * the watermark passes its event time plus the delay, so state size is
  * bounded by arrival rate × horizon, NOT corpus size (the property
  * that lets it run forever at ingest scale). The price, by contract: a
  * re-occurrence AFTER the horizon re-emits, which the nightly pass
  * then catches. `dropDuplicates` without the watermark bound would be
  * exact but its state grows with distinct keys forever — the
  * scale-killer this operator exists to avoid.
  *
  * (Reference anchor: the open-ended JSON event stream of
  * StreamingWithKafka.scala — dedup-at-ingest is the first stage a
  * production version of that pipeline adds.)
  */
object DedupStream {

  /** @param docs streaming frame with `text` and event-time `ts`
    * @param delay watermark delay, e.g. "10 minutes" — the dedup
    *   horizon AND the late-arrival bound */
  def withinWatermark(docs: DataFrame, delay: String): DataFrame =
    // the bounded-state recipe itself lives in ONE place
    // (StreamPipelines.dedupStream); this adds only the content key
    StreamPipelines.dedupStream(
      docs.withColumn("content_hash", md5(col("text"))),
      Seq("content_hash"), delay)
}
