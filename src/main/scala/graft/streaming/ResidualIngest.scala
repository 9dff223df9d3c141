package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.Similarity

/** Streaming maintenance of the residual-PQ (IVFADC) index —
  * IvfIngest's contract on the code tier: the nightly bulk job trains
  * the coarse quantizer + residual codebook and bulk-builds the
  * partitionBy(cell) code layout; this keeps it fresh between
  * rebuilds by assigning, residual-encoding and appending newly
  * arrived vectors per micro-batch.
  *
  * BOTH model tables are deliberately frozen for the ingest's
  * lifetime — the IVF rule from IvfIngest doubled: a new coarse
  * quantizer re-cells the corpus AND a new codebook re-codes it, so
  * either retrain implies the full rebuild the nightly job owns.
  * Every output row depends only on its own input row plus the static
  * model frames (the per-(vec, sub) argmin groups within one vector),
  * so streamed index content is batch-identical under any micro-batch
  * split — ResidualIngestSpec pins stream ≡ batch row-for-row AND
  * that serving from the streamed layout equals serving from the
  * bulk-built one. Exactly-once: CLOSED — the sink is [[IndexSink]]'s
  * idempotent (cell, batch_key) dynamic-overwrite write (see its doc
  * and IvfIngest's; ResidualIngestSpec re-fires a batch on top of a
  * simulated partial write and pins the layout row-identical).
  */
object ResidualIngest {

  def writer(vecs: DataFrame, cents: DataFrame, cb: DataFrame,
             indexDir: String, checkpointDir: String,
             numSub: Int = 8, subDim: Int = 8): DataStreamWriter[Row] = {
    val tag = IndexSink.ingestTag(checkpointDir)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IndexSink.writeBatch(
          Similarity.residualPqIndexRowsWith(batch, cents, cb, numSub,
            subDim),
          indexDir, s"$tag-$batchId")
        ()
      }
  }

  /** AvailableNow variant — the scheduled-catch-up shape. */
  def writerAvailableNow(vecs: DataFrame, cents: DataFrame, cb: DataFrame,
                         indexDir: String, checkpointDir: String,
                         numSub: Int = 8,
                         subDim: Int = 8): DataStreamWriter[Row] =
    writer(vecs, cents, cb, indexDir, checkpointDir, numSub, subDim)
      .trigger(Trigger.AvailableNow())
}
