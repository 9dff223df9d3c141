package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (DataSketches HLL, Spark 3.5+
  * builtins) — the only way distinct counting works at 100 TB.
  *
  * An exact COUNT(DISTINCT x) over 100 TB shuffles every distinct
  * value once per query window; re-asked for last-7-days, last-30-days
  * and month-to-date it rescans the corpus each time. The sketch path
  * pays ONE scan per ingest unit (e.g. day): a fixed-size (~KB) HLL
  * sketch per (group, day), stored like any other column; any window's
  * distinct estimate is then a merge of that window's sketches —
  * seconds over kilobytes, no rescan, and the merge is associative so
  * it parallelizes as a plain aggregate.
  *
  * Accuracy is the HLL guarantee (~1.6% rel. std. error at lgK=12,
  * tightening with lgK) — SketchesSpec pins the error bound against an
  * exact count, partition-merge == whole-corpus equivalence (the
  * property that makes incremental maintenance sound), and that
  * sketches survive a parquet round trip (they are plain binary).
  *
  * Not oracle-checked: an estimate has no cross-engine bit-exact
  * ground truth (DuckDB's approx_count_distinct is a different
  * algorithm), so this surface is spec-covered — the estimates ARE
  * deterministic within Spark, which is what the specs rely on.
  */
object Sketches {

  /** One HLL sketch per group — the per-ingest-unit build pass.
    * lgK = 12 ⇒ 4 KB sketches, ~1.6% relative standard error. */
  def buildSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge stored sketches down to coarser groups (e.g. per-day →
    * per-source, or per-day → whole-window) and estimate. The input is
    * sketch rows, not raw data — this never touches the corpus. */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame = {
    val merged =
      if (groupCols.isEmpty)
        sketches.agg(hll_union_agg(col("sketch")).as("sketch"))
      else
        sketches.groupBy(groupCols.map(col): _*)
          .agg(hll_union_agg(col("sketch")).as("sketch"))
    merged.withColumn("distinct_est", hll_sketch_estimate(col("sketch")))
  }

  /** Point estimate of one sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
