package graft.operators

import graft.SparkSpec

class AnnRecallEvalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("nProbe = C rows measure perfect recall") {
    val out = Similarity.annRecallEval(emb, numQueries = 4, k = 3,
      numCentroids = 4, nProbes = Seq(4))
      .select("recall_bp").as[Long].collect()
    assert(out.length === 4)
    assert(out.forall(_ === 10000L),
      "probing every cell is exact, so recall@k must be 10000 bp")
  }

  test("recall is monotone non-decreasing in nProbe per query") {
    val out = Similarity.annRecallEval(emb, numQueries = 6, k = 3,
      numCentroids = 8, nProbes = Seq(1, 2, 8))
      .select("n_probe", "query_id", "hits")
      .as[(Int, Long, Long)].collect()
      .groupBy(_._2)
    out.values.foreach { rows =>
      val byProbe = rows.sortBy(_._1).map(_._3)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        "widening the probe set can only add exact neighbors")
    }
    // and the full-probe column is exact for every query
    assert(out.values.forall(_.find(_._1 == 8).get._3 === 3L))
  }

  test("trainIvfCentroidsExact: deterministic, micro-integer, model-sized") {
    val c1 = Similarity.trainIvfCentroidsExact(emb, 8, 2)
      .select("cid", "ce").as[(Long, Seq[Double])].collect().sortBy(_._1)
    val c2 = Similarity.trainIvfCentroidsExact(emb, 8, 2)
      .select("cid", "ce").as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(c1.toSeq === c2.toSeq, "exact-integer training must be bit-stable")
    assert(c1.length <= 8 && c1.nonEmpty)
    // every component is an integer micro value passed through double
    assert(c1.forall(_._2.forall(x => x == math.floor(x))),
      "centroid components must be floored integer micro-means")
  }

  test("ann_recall_trained: both centroid sets converge to exact at nProbe = C") {
    val out = Similarity.annRecallTrained(emb, numQueries = 4, k = 3,
      numCentroids = 4, iters = 2, nProbes = Seq(4))
      .select("centroids", "recall_bp").as[(String, Long)].collect()
    assert(out.length === 2)
    assert(out.forall(_._2 === 10000L),
      "probing every cell is exact regardless of where centroids came from")
  }

  test("ann_recall_trained: recall monotone non-decreasing in nProbe per tag") {
    val out = Similarity.annRecallTrained(emb, numQueries = 6, k = 3,
      numCentroids = 8, iters = 2, nProbes = Seq(1, 2, 8))
      .select("centroids", "n_probe", "hits")
      .as[(String, Int, Long)].collect()
      .groupBy(_._1)
    assert(out.keySet === Set("default", "trained"))
    out.values.foreach { rows =>
      val byProbe = rows.sortBy(_._2).map(_._3)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        "widening the probe set can only add exact neighbors")
    }
  }

  test("hits counts are bounded by k and by the candidate count") {
    val out = Similarity.annRecallEval(emb, numQueries = 8, k = 5)
      .select("hits", "recall_bp").as[(Long, Long)].collect()
    assert(out.forall { case (h, bp) => h >= 0 && h <= 5 && bp === h * 2000 })
  }

  test("matryoshka: prefix tier misses a neighbor the full dims rank first") {
    // q=(1,0); vec1=(1,1) prefix-cos 1.0, full-cos 0.707107;
    // vec2=(2,0) prefix-cos 1.0, full-cos 1.0. Tier d=1 ties at 1.0 and
    // vec_id asc picks vec1 (a MISS); tier d=2 (the truth) picks vec2.
    val toy = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 1.0f), 0),
      (2L, Array(2.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.annMatryoshkaRecall(toy, numQueries = 1, k = 1,
        tiers = Seq(1, 2))
      .orderBy("dims")
      .select("dims", "hits", "recall_bp").as[(Long, Long, Long)]
      .collect().toSeq
    assert(out === Seq((1L, 0L, 0L), (2L, 1L, 10000L)))
  }

  test("embedMatryoshkaTruncate: unit norm in micro, zero-prefix safe") {
    val toy = Seq(
      (1L, Array(3.0f, 4.0f, 9.9f), 0),     // prefix (3,4): norm 5
      (2L, Array(0.0f, 0.0f, 1.0f), 0))     // zero prefix at d=2
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embedMatryoshkaTruncate(toy, d = 2)
      .orderBy("vec_id")
      .select("dims", "norm_micro", "t_csv")
      .as[(Long, Long, String)].collect().toSeq
    assert(out.head === ((2L, 5000000L, "600000,800000")))
    assert(out(1) === ((2L, 0L, "0,0")))
  }

  test("matryoshka: top tier is its own truth — recall 10000 always") {
    val out = Similarity.annMatryoshkaRecall(emb, numQueries = 4, k = 3,
        tiers = Seq(16, 64))
      .orderBy("dims")
      .select("dims", "recall_bp").as[(Long, Long)].collect().toSeq
    assert(out.last === ((64L, 10000L)))
    assert(out.head._2 >= 0L && out.head._2 <= 10000L)
  }
}
