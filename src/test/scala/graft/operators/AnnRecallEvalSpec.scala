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

  test("hits counts are bounded by k and by the candidate count") {
    val out = Similarity.annRecallEval(emb, numQueries = 8, k = 5)
      .select("hits", "recall_bp").as[(Long, Long)].collect()
    assert(out.forall { case (h, bp) => h >= 0 && h <= 5 && bp === h * 2000 })
  }
}
