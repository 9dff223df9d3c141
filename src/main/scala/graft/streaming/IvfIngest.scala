package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.Similarity

/** Streaming maintenance of the IVF+int8 ANN index — the missing
  * operational half of the ANN family: the nightly job TRAINS the
  * coarse quantizer (Similarity.trainIvfCentroids) and bulk-builds the
  * index; this keeps it fresh between rebuilds by assigning +
  * quantizing newly arrived vectors per micro-batch and appending them
  * to the same `partitionBy(cell)` parquet layout the serving path
  * partition-prunes.
  *
  * Correctness posture (same as DedupStream / the dup-span redaction
  * stream): every output row depends only on its own input row plus
  * the STATIC centroid frame, so the streamed index content is
  * batch-identical under any micro-batch split — IvfIngestSpec pins
  * stream ≡ batch row-for-row. Centroids are deliberately frozen for
  * the ingest's lifetime: re-training mid-stream would put old and new
  * cell assignments in one index (the standard IVF operational rule —
  * new quantizer ⇒ full rebuild, which the nightly bulk job owns).
  *
  * Exactly-once: CLOSED (r14 verdict #3) — the sink is [[IndexSink]]'s
  * idempotent (cell, batch_key) dynamic-partition-overwrite write, so
  * a batch replayed after a crash-between-sink-and-checkpoint (or a
  * simulated partial write) overwrites exactly its own partitions and
  * the layout stays row-identical to the batch builder
  * (IvfIngestSpec's replay test pins it).
  */
object IvfIngest {

  /** writeStream writer landing each micro-batch's index rows under
    * `indexDir` idempotently (call `.start()` to run; trigger left to
    * the caller's default unless set). */
  def writer(vecs: DataFrame, cents: DataFrame, indexDir: String,
             checkpointDir: String): DataStreamWriter[Row] = {
    val tag = IndexSink.ingestTag(checkpointDir)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IndexSink.writeBatch(Similarity.ivfInt8IndexRows(batch, cents),
          indexDir, s"$tag-$batchId")
        ()
      }
  }

  /** AvailableNow variant: drain whatever has arrived, build the index
    * delta, stop — the scheduled-catch-up shape for a bursty feed. */
  def writerAvailableNow(vecs: DataFrame, cents: DataFrame, indexDir: String,
                         checkpointDir: String): DataStreamWriter[Row] =
    writer(vecs, cents, indexDir, checkpointDir)
      .trigger(Trigger.AvailableNow())
}
