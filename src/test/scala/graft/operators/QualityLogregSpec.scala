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

  test("qualityTrain: exact-integer GD is bit-stable across runs") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = QualityModels.qualityTrain(docs, iters = 3)
      .collect().map(_.toSeq).toSeq
    val b = QualityModels.qualityTrain(docs, iters = 3)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === 3)
  }

  test("qualityTrain: trained weights beat the default model's AUC") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def auc(w: org.apache.spark.sql.DataFrame): Long =
      QualityModels.scoreAucEvalWith(docs, w)
        .select(col("auc_bp")).as[Long].head()
    val trained = auc(QualityModels.trainedQualityWeights(docs))
    val default = auc(QualityModels.defaultQualityWeights(spark))
    assert(trained > default,
      s"training must beat the hand-set weights: $trained vs $default")
    assert(trained > 5000L, s"trained model must beat chance: $trained")
  }

  test("qualityTrain: a perfectly separable corpus reaches high AUC") {
    // long wordy stopword-rich docs keep=true under gopher; terse
    // repetitive ones fail several rules — GD should order them
    val good = (1 to 60).map { i =>
      val words = (1 to 40).map(j => s"w$i$j")
      (i.toLong, ("the a to of and that have with " * 2 +
        words.mkString(" ")).trim)
    }
    val bad = (61 to 120).map(i => (i.toLong, "zz zz zz zz zz"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val out = QualityModels.scoreAucEvalWith(docs,
        QualityModels.trainedQualityWeights(docs))
      .select("auc_bp").as[Long].head()
    assert(out >= 9000L, s"separable data must train well, got $out")
  }
}
