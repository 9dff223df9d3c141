package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Streaming vocabulary-coverage admission gate — the live deployment
  * of vocab_coverage: documents whose OOV rate against the FROZEN
  * production vocabulary exceeds the threshold are the ones the
  * tokenizer will shred into bytes/UNKs, and an ingest stream drops
  * them at the door instead of discovering the damage at training
  * time.
  *
  * The vocabulary is the nightly one-row map artifact
  * (CorpusStats.vocabSetRow — model-sized by Heaps), broadcast into a
  * stream-static cross of exactly one row; scoring is
  * CorpusStats.oovScored, the SAME expression the batch report uses,
  * so stream and batch cannot drift. `Dataset.observe` rides the
  * existing pass (the GateStream shape): every micro-batch reports
  * (n_rows, n_keep, oov token totals) in its progress without a
  * second aggregation query. */
object VocabGateStream {

  val metricName = "vocab_gate"

  /** The gated stream: score OOV against the frozen vocab row, observe
    * admission metrics, keep docs at or under maxOovBp. Batch-legal
    * (observe and the broadcast cross both work on static frames),
    * which is what the spec's reconciliation uses. */
  def gated(docs: DataFrame, vocabRow: DataFrame,
            maxOovBp: Long = 2000L): DataFrame =
    CorpusStats.oovScored(docs, vocabRow)
      .observe(metricName,
        count(lit(1)).as("n_rows"),
        sum(when(col("oov_bp") <= maxOovBp, 1L).otherwise(0L))
          .as("n_keep"),
        sum(col("oov")).as("oov_tokens"),
        sum(col("n_tok")).as("n_tokens"))
      .filter(col("oov_bp") <= maxOovBp)
}
