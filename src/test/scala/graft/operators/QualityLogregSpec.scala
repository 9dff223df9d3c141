package graft.operators

import graft.SparkSpec

class QualityLogregSpec extends SparkSpec {
  import spark.implicits._

  private val doc = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")

  test("qualityLogreg: hand-computed integer score under unit weights") {
    // features: n_words=6; alpha = 17 letters of 22 chars -> 7727 bp;
    // stop hits = 2 ("the" twice) -> 20000/6 = 3333 bp;
    // 5 distinct of 6 tokens -> 50000/6 = 8333 bp
    val w = Seq((0L, 1L, 1L, 1L, 1L)).toDF("w0", "w_alpha", "w_stop", "w_ttr", "w_len")
    val out = QualityModels.qualityLogreg(doc, w)
      .select("n_words", "alpha_bp", "stop_bp", "ttr_bp", "score")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out === ((6L, 7727L, 3333L, 8333L, 6L + 7727L + 3333L + 8333L)))
  }

  test("keep == score > 0 is exactly the logistic decision at 0.5") {
    val w = QualityModels.defaultQualityWeights(spark)
    val out = QualityModels.qualityLogreg(doc, w)
      .select("score", "keep").as[(Long, Boolean)].head()
    val sigmoid = 1.0 / (1.0 + math.exp(-out._1.toDouble / 1e6))
    assert(out._2 === (sigmoid > 0.5), "monotone link: same decision")
    assert(out._2 === (out._1 > 0))
  }

  test("trained weights substitute without touching the operator") {
    val rejectAll = Seq((-10000000L, 0L, 0L, 0L, 0L))
      .toDF("w0", "w_alpha", "w_stop", "w_ttr", "w_len")
    val keepAll = Seq((10000000L, 0L, 0L, 0L, 0L))
      .toDF("w0", "w_alpha", "w_stop", "w_ttr", "w_len")
    assert(QualityModels.qualityLogreg(doc, rejectAll)
      .filter("keep").count() === 0)
    assert(QualityModels.qualityLogreg(doc, keepAll)
      .filter("keep").count() === 1)
  }

  test("default model splits the real corpus non-trivially") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = QualityModels.qualityLogreg(docs,
      QualityModels.defaultQualityWeights(spark))
    val n = out.count()
    val kept = out.filter("keep").count()
    assert(kept > 0 && kept < n, s"degenerate split: $kept of $n")
  }
}
