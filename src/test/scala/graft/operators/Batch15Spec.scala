package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-15 specs: the raw-scale centroid guard at the public
  * residual-index boundaries (r14 ADVICE #1). */
class Batch15Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("residualSeedCodebookOf / residualPqIndexRows fail LOUDLY on " +
      "micro-valued (trained-style) centroids instead of encoding junk") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    // trainIvfCentroidsExact output convention: micro-valued doubles
    val microCents = Similarity.defaultCentroids(emb, 4)
      .select(col("cid"),
        transform(col("ce"), x => round(x * lit(1000000.0d))).as("ce"))
    def mustFail(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ex = intercept[Exception] { f.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("MICRO-valued")),
        s"expected the raw-scale guard message, got: $ex")
    }
    mustFail(Similarity.residualSeedCodebookOf(emb, microCents))
    mustFail(Similarity.residualPqIndexRows(emb, microCents))
    mustFail(Similarity.residualPqIndexRowsWith(emb, microCents,
      Similarity.residualSeedCodebookOf(emb,
        Similarity.defaultCentroids(emb, 4))))
    // raw-scale centroids still pass through untouched
    val ok = Similarity.residualSeedCodebookOf(emb,
      Similarity.defaultCentroids(emb, 4), numCodes = 4)
    assert(ok.count() > 0)
  }

  test("rerankBudgetRecall: strictly valid curve — per-m hits are " +
      "non-decreasing (a TRUE invariant here), full-budget top") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val rows = Similarity.rerankBudgetRecall(emb)
      .select("m", "hits", "recall_bp")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) === Seq(5, 10, 20, 40))
    // shortlists nest in m and the rerank orders by the truth's own
    // exact rounded-6 cosine + vec_id tiebreak: a served true neighbor
    // can only be displaced by a higher-exact-ranked vector, which is
    // itself a truth row — so hits can never drop when m grows. This
    // is a real invariant, not a data-pinned observation (contrast the
    // nProbe curve, where ADC approximation breaks it).
    val hits = rows.map(_._2)
    assert(hits.zip(hits.tail).forall { case (a, b) => b >= a },
      s"hits must be non-decreasing in m: $hits")
    rows.foreach { case (_, h, bp) =>
      assert(bp === (10000L * h) / (32L * 5L),
        "denominator must be the actual held-out count (32 at this sf)")
    }
  }

  test("rerankBudgetRecall: m = corpus recovers the candidate-set " +
      "recall ceiling (exact rerank over ALL probed candidates)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    // at m >= |candidates| the rerank IS an exact top-k over the
    // probed cells: the curve's ceiling equals serving the candidates
    // exactly — more budget cannot help past the probe recall
    val wide = Similarity.rerankBudgetRecall(emb, ms = Seq(5, 100000))
      .select("m", "recall_bp").as[(Int, Long)].collect().toMap
    assert(wide(100000) >= wide(5))
    val again = Similarity.rerankBudgetRecall(emb,
      ms = Seq(100000, 200000))
      .select("m", "recall_bp").as[(Int, Long)].collect().toMap
    assert(again(100000) === again(200000),
      "past the candidate-set size, the budget knob must saturate")
    assert(again(100000) === wide(100000))
  }
}
