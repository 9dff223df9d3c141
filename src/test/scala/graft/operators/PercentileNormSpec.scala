package graft.operators

import graft.SparkSpec

class PercentileNormSpec extends SparkSpec {
  import spark.implicits._

  test("percentiles are source-relative: same raw score, different pct") {
    // source A: scores 0, 5000, 10000; source B: scores 5000, 10000
    // (alpha mass controls the score: all-digits=0, half, all-letters)
    val d = Seq(
      (1L, "12 34", "A"),          // alpha 0
      (2L, "ab 12", "A"),          // 2 of 5 chars -> 4000
      (3L, "ab cd", "A"),          // 4 of 5 -> 8000
      (4L, "ab 12", "B"),
      (5L, "ab cd", "B"))
      .toDF("doc_id", "text", "source")
    val out = QualityModels.scorePercentileNorm(d)
      .select("doc_id", "pct_bp").as[(Long, Long)].collect().toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 5000L)  // 1 of (3-1) below
    assert(out(3L) === 10000L)
    // in B the SAME raw 4000 score is the bottom: pct 0
    assert(out(4L) === 0L)
    assert(out(5L) === 10000L)
  }

  test("ties share a percentile; extremes span 0..10000") {
    val d = Seq(
      (1L, "ab cd", "A"), (2L, "ab cd", "A"), (3L, "12 34", "A"))
      .toDF("doc_id", "text", "source")
    val out = QualityModels.scorePercentileNorm(d)
      .select("doc_id", "pct_bp").as[(Long, Long)].collect().toMap
    assert(out(1L) === out(2L), "equal scores share the percentile")
    assert(out(3L) === 0L)
    assert(out(1L) === 5000L, "one doc strictly below, n-1 = 2")
  }

  test("scorePercentileNormOf composes with qualityLogreg's score") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "the cat sat on the mat and the dog ran", "A"),
      (2L, "zz zz zz zz", "A"),
      (3L, "a quick brown fox jumps over the lazy dog today", "A"))
      .toDF("doc_id", "text", "source")
    val scored = QualityModels
      .qualityLogreg(d, QualityModels.defaultQualityWeights(spark))
      .select(col("doc_id"), col("score").as("score_bp"))
      .join(d.select("doc_id", "source"), "doc_id")
      .select("doc_id", "source", "score_bp")
    val out = QualityModels.scorePercentileNormOf(scored)
      .select("doc_id", "pct_bp").as[(Long, Long)].collect().toMap
    // three distinct logreg scores in one source -> percentiles 0/5000/10000
    assert(out.values.toSeq.sorted === Seq(0L, 5000L, 10000L))
    // the normalizer ranked by the LOGREG score (repetitive doc 2 lowest)
    assert(out(2L) === 0L)
  }

  test("singleton source gets pct 0 without dividing by zero") {
    val d = Seq((1L, "ab cd", "solo")).toDF("doc_id", "text", "source")
    val out = QualityModels.scorePercentileNorm(d)
      .select("pct_bp").as[Long].collect()
    assert(out.toSeq === Seq(0L))
  }
}
