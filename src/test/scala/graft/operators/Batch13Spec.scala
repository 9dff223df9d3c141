package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-13 specs: score-vs-rules AUC, τ sweep, embedding norm QC. */
class Batch13Spec extends SparkSpec {
  import spark.implicits._

  test("scoreAucEval: doubled-units U is exact on a hand-built case") {
    // craft four docs where both scorers are deterministic; we verify
    // the U machinery itself against a brute-force pair count
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = QualityModels.scoreAucEval(docs)
      .select("n_pos", "n_neg", "u2", "auc_bp")
      .as[(Long, Long, Long, Long)].head()
    val (p, n, u2, bp) = out
    assert(p + n === docs.count())
    assert(u2 >= 0 && u2 <= 2 * p * n, "U bounded by all-pairs")
    assert(bp === (10000L * u2) / (2 * p * n))

    // brute-force reference on the same inputs
    val sc = QualityModels.qualityLogreg(docs,
        QualityModels.defaultQualityWeights(spark))
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val keep = QualityModels.gopherRules(docs)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val pos = keep.filter(_._2).keys.toSeq
    val neg = keep.filterNot(_._2).keys.toSeq
    val u2Brute = (for { a <- pos; b <- neg } yield {
      if (sc(a) > sc(b)) 2L else if (sc(a) == sc(b)) 1L else 0L
    }).sum
    assert(u2 === u2Brute, "histogram U must equal the all-pairs count")
  }

  test("tauSweep: cumulative counts are monotone and pin the operator curve") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.tauSweep(docs)
      .select("tau_bp", "n_pairs").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1) === Seq(5000L, 6000L, 7000L, 8000L, 9000L, 10000L))
    val counts = out.map(_._2)
    assert(counts.zip(counts.tail).forall { case (lo, hi) => lo >= hi },
      "raising tau can only lose pairs")
    // the sweep's exact cross-multiplied histogram makes each row
    // EQUAL the deletion count of the operator it predicts: n_pairs(τ)
    // == ngramJaccardPairs(tau = τ/10000).count(), at every threshold,
    // not just the floor
    out.foreach { case (tauBp, n) =>
      val op = Dedup.ngramJaccardPairs(docs, 3, tauBp / 10000.0).count()
      assert(n === op, s"sweep row $tauBp must equal the operator count")
    }
  }

  test("embedNormQc: zero vectors and non-finite components are flagged apart") {
    val d = Seq(
      (1L, Array(3.0f, 4.0f), 0),                  // norm 5
      (2L, Array(0.0f, 0.0f), 0),                  // zero vector
      (3L, Array(Float.NaN, 1.0f), 0),             // non-finite
      (4L, Array(Float.PositiveInfinity, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embedNormQc(d)
      .select("label", "n", "min_norm_micro", "max_norm_micro", "n_zero",
        "n_nonfinite")
      .as[(Int, Long, Option[Long], Option[Long], Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq(
      (0, 3L, Some(0L), Some(5000000L), 1L, 1L),
      (1, 1L, None, None, 0L, 1L)))
  }

  test("embedNormQc: the real table is clean") {
    val out = Similarity.embedNormQc(
        graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001"))
      .agg(sum("n_zero"), sum("n_nonfinite")).as[(Long, Long)].head()
    assert(out === ((0L, 0L)))
  }
}
