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

  // ------------------------------------------------------- heavy hitters

  /** One count-min sketch per group (Spark's builtin `count_min_sketch`
    * aggregate) — the mergeable FREQUENCY complement of the HLL
    * distinct sketches above, for "which tokens/sources/keys are hot"
    * at 100 TB: per-ingest-unit sketches are fixed-size binaries
    * stored like any column; any window's frequency table is a merge
    * of that window's sketches, never a corpus rescan. Same seed ⇒
    * identical hash functions ⇒ sketches merge additively. */
  def buildFreqSketches(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, eps: Double = 0.001,
                        confidence: Double = 0.99,
                        seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as("cms"))

  /** Merge per-unit frequency sketches and report the estimated count
    * of every candidate item above `minCount`.
    *
    * CMS cannot enumerate its own keys, so candidates come from the
    * standard pairing: each unit contributes its exact local top
    * (bounded rows per unit — cheap), the union is the candidate set
    * (a true global heavy hitter is a local heavy hitter in at least
    * one unit at these thresholds), and the merged sketch scores each
    * candidate over the WHOLE window. Sketch rows and candidates are
    * both unit-bounded metadata, so the driver-side merge is
    * broadcast-sized by construction — the corpus itself is touched
    * only by the per-unit build pass.
    *
    * CMS error is one-sided: est ≥ true, est ≤ true + eps·N with the
    * configured confidence (spec-pinned). */
  def heavyHitters(sketches: DataFrame, candidates: DataFrame,
                   valueCol: String, minCount: Long): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val spark = sketches.sparkSession
    val merged = sketches.select(col("cms")).collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
      .reduceLeft { (a, b) => a.mergeInPlace(b); a }
    val bc = spark.sparkContext.broadcast({
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      bos.toByteArray
    })
    val estimate = udfFreeEstimate(bc, candidates, valueCol)
    estimate.filter(col("est_count") >= minCount)
      .orderBy(col("est_count").desc, col(valueCol))
  }

  /** Candidate scoring via mapPartitions (one sketch deserialization
    * per partition, no per-row UDF churn). */
  private def udfFreeEstimate(bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                              candidates: DataFrame,
                              valueCol: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val spark = candidates.sparkSession
    import spark.implicits._
    val vals = candidates.select(col(valueCol).cast("string")).as[String]
    val scored = vals.mapPartitions { it =>
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bc.value))
      it.map(v => (v, cms.estimateCount(v)))
    }
    scored.toDF(valueCol, "est_count")
  }
}
