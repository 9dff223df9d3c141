package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QualityModels

/** Streaming admission gate on the CALIBRATED quality probability —
  * the live deployment of quality_calibrated (the r13 verdict's
  * calibrator): the raw trained score is rank-good but its
  * probabilities are meaningless as admission mass (measured flat
  * ~5100 bp against observed 0→8200 bp), so the gate thresholds the
  * PAV-calibrated probability instead of the raw sigmoid.
  *
  * Model freezing (the VocabGateStream nightly contract): the batch
  * side trains the weights, fits PAV over the reliability bins, and
  * FREEZES (weights, p_micro range bounds, bin → cal_bp step map)
  * into ONE row — model-sized by construction (≤10 pools). The stream
  * crossJoins that broadcast row, computes the SAME integer features,
  * score, hard-sigmoid clamp and range-binning the batch calibrator
  * used (shared expressions — stream and batch cannot drift), looks
  * its calibrated probability up in the step map, and admits rows
  * with cal_bp ≥ the threshold. `Dataset.observe` rides the existing
  * pass reporting (n_rows, n_admit, sum_cal_bp) per micro-batch with
  * no second aggregation.
  *
  * Bins the training batch never populated inherit the nearest
  * LOWER pool's calibrated value (a step function is right-continuous
  * in rank space; leading empties inherit the first pool) — pinned by
  * CalibratedGateStreamSpec alongside stream ≡ batch admission and
  * exact observed-metric reconciliation. */
object CalibratedGateStream {

  val metricName = "calibrated_gate"

  /** The frozen one-row model: trained weights + binning bounds + the
    * dense 0..9 bin → cal_bp step map. Batch-side (collects are the
    * quality_train / PAV model-sized contract). */
  def model(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // train ONCE: the weights frame is 1 row, but its lineage is the
    // 10-iteration GD loop — localCheckpoint so the collect and the
    // calibrationScored consumer read one materialization (r14 ADVICE)
    val wdf = QualityModels.trainedQualityWeights(docs).localCheckpoint()
    val w = wdf.collect()(0)
    val scored = QualityModels.calibrationScored(docs, wdf)
    val b = scored.agg(min(col("p_micro")), max(col("p_micro")))
      .as[(Long, Long)].collect()(0)
    val bins = QualityModels.calibrationBinsWith(docs, wdf)
      .select(col("bin"), col("n_docs"), col("n_pos"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    require(bins.nonEmpty, "CalibratedGateStream.model: empty corpus — " +
      "no populated reliability bins to fit the PAV step function over")
    val pools = QualityModels.pavPools(bins.map(r => (r._2, r._3)))
    val calByBin = bins.zipWithIndex.map { case ((bin, _, _), i) =>
      val p = pools.find(p => p._1 <= i && i <= p._2).get
      bin -> 10000L * p._4 / p._3
    }.toMap
    // dense 0..9: carry the nearest lower populated bin forward
    // (leading empties inherit the first populated pool's value)
    val dense = (0L to 9L).scanLeft(-1L -> calByBin(bins.head._1)) {
      case ((_, prev), bin) => bin -> calByBin.getOrElse(bin, prev)
    }.drop(1)
    Seq((w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3),
      w.getLong(4), b._1, b._2, dense.toMap))
      .toDF("w0", "w_alpha", "w_stop", "w_ttr", "w_len", "mn", "mx",
        "cal_map")
  }

  /** The gated frame: observe → filter. Stream-legal (the model side
    * is one static broadcast row; everything else is map-only) and
    * batch-legal — the spec reconciles both. */
  def gated(docs: DataFrame, model: DataFrame,
            minCalBp: Long = 5000L): DataFrame =
    QualityModels.qualityFeatures(docs)
      .crossJoin(broadcast(model))
      .withColumn("score",
        col("w0") + col("w_alpha") * col("alpha_bp")
          + col("w_stop") * col("stop_bp") + col("w_ttr") * col("ttr_bp")
          + col("w_len") * col("n_words"))
      .withColumn("p_micro", greatest(lit(0L),
        least(lit(1000000L), lit(500000L) + expr("score div 40000"))))
      .withColumn("bin",
        least(expr("((p_micro - mn) * 10) div (mx - mn + 1)"), lit(9L)))
      // a live stream can carry p_micro OUTSIDE the frozen [mn, mx]:
      // clamp the bin to the step function's support
      .withColumn("bin", greatest(lit(0L), least(lit(9L), col("bin"))))
      .withColumn("cal_bp", element_at(col("cal_map"), col("bin")))
      .observe(metricName,
        count(lit(1)).as("n_rows"),
        sum(when(col("cal_bp") >= minCalBp, 1L).otherwise(0L))
          .as("n_admit"),
        sum(col("cal_bp")).as("sum_cal_bp"))
      .filter(col("cal_bp") >= minCalBp)
      .select("doc_id", "p_micro", "bin", "cal_bp")

  /** Batch rehearsal entry (mirrors the other gate streams). */
  def rehearse(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.documents(spark, dir)
    gated(docs, model(docs))
  }
}
