package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.MixturePlan

/** Streaming mixture ACCOUNTING — the live half of
  * MixturePlan.mixturePlan: per-source (n_docs, token) sums are an
  * ordinary streaming aggregation (integer sums are associative and
  * commutative, so complete-mode state is EXACTLY the batch aggregate
  * under any micro-batch split — the DriftStream contract), and the
  * waterfilling solver runs as a batch tail over the |sources|-row
  * sink table whenever the pipeline wants a fresh plan.
  *
  * This is the ingest-monitoring deployment shape: docs stream in as
  * crawls land, the state stays |sources| rows regardless of volume,
  * and a re-plan (or an achieved-vs-target drift alarm) reads the
  * state without ever rescanning the corpus. */
object MixtureStream {

  /** The streaming per-source sum aggregation — run with
    * `Sinks.memory(sourceSums(stream), name, "complete")`. Same code
    * path as the batch operator's first stage. */
  def sourceSums(stream: DataFrame): DataFrame =
    MixturePlan.sourceTokenSums(stream)

  /** A full waterfilling plan over the live state (the sink table the
    * complete-mode query maintains). */
  def planReading(state: DataFrame, targetBp: Column,
                  budgetFactor: Long = 3L,
                  maxEpochsMicro: Long = 4000000L): DataFrame =
    MixturePlan.planFromSums(state, targetBp, budgetFactor,
      maxEpochsMicro = maxEpochsMicro)
}
