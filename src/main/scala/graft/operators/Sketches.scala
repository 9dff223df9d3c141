package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CountMin

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

  // ------------------------------------------------------- heavy hitters

  /** One count-min sketch per group (Spark's builtin `count_min_sketch`
    * aggregate) — the mergeable FREQUENCY complement of the HLL
    * distinct sketches above, for "which tokens/sources/keys are hot"
    * at 100 TB: per-ingest-unit sketches are fixed-size binaries
    * stored like any column; any window's frequency table is a merge
    * of that window's sketches, never a corpus rescan. Same seed ⇒
    * identical hash functions ⇒ sketches merge additively.
    *
    * The value is cast to STRING before sketching so build and probe
    * share one hash domain: the builtin aggregate hashes integral
    * columns as longs but `CountMinProbe` (and any stored-candidate
    * scoring) hashes UTF-8 bytes — sketching an int column natively
    * would make every later string-keyed probe hash-noise while
    * keeping the one-sided est ≥ true guarantee silently false. */
  def buildFreqSketches(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, eps: Double = 0.001,
                        confidence: Double = 0.99,
                        seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol).cast("string"), lit(eps),
        lit(confidence), lit(seed)).as("cms"))

  /** Merge per-unit frequency sketches and report the estimated count
    * of every candidate item above `minCount`.
    *
    * CMS cannot enumerate its own keys, so candidates come from the
    * standard pairing: each unit contributes its exact local top
    * (bounded rows per unit — cheap), the union is the candidate set
    * (a true global heavy hitter is a local heavy hitter in at least
    * one unit at these thresholds), and the merged sketch scores each
    * candidate over the WHOLE window.
    *
    * The union itself runs EXECUTOR-side (`CmsUnionAgg`, the
    * frequency mirror of `hll_union_agg` above): partial merges where
    * the sketch rows live, one final combine, and the driver sees
    * exactly ONE ~100 KB merged sketch — never the unit × sketch-size
    * product, which for a year of days × sources is tens of GB and a
    * sequential loop if collected. Scoring is the native
    * `CountMinProbe` expression, so the candidate pass stays inside
    * whole-stage codegen (plan-pinned in SketchesSpec).
    *
    * An empty/all-null sketches frame yields an EMPTY result (an empty
    * window is a legal query, not a throw).
    *
    * CMS error is one-sided: est ≥ true, est ≤ true + eps·N with the
    * configured confidence (spec-pinned). */
  def heavyHitters(sketches: DataFrame, candidates: DataFrame,
                   valueCol: String, minCount: Long): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val mergedRow = sketches.agg(CountMin.cmsUnion(col("cms")).as("cms")).head()
    if (mergedRow.isNullAt(0)) {
      spark.emptyDataset[(String, Long)].toDF(valueCol, "est_count")
    } else {
      val merged = mergedRow.getAs[Array[Byte]](0)
      candidates
        .select(col(valueCol).cast("string").as(valueCol))
        .withColumn("est_count", CountMin.probe(col(valueCol), merged))
        .filter(col("est_count") >= minCount)
        .orderBy(col("est_count").desc, col(valueCol))
    }
  }
}
