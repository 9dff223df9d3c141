package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("cosineNearDupPairs: parallel vectors hit 1.0, orthogonal excluded") {
    val pairs = Similarity.cosineNearDupPairs(emb(
      1L -> Seq(1f, 0f, 0f),
      2L -> Seq(2f, 0f, 0f), // parallel to 1
      3L -> Seq(0f, 1f, 0f)  // orthogonal
    ), tau = 0.9).as[(Long, Long, Double)].collect().toSet
    assert(pairs === Set((1L, 2L, 1.0)))
  }

  test("annCosineTopK ranks by cosine with deterministic ties") {
    val out = Similarity.annCosineTopK(emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),
      2L -> Seq(1f, 1f),
      3L -> Seq(0f, 1f)
    ), numQueries = 1, k = 3)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toSet
    assert(out === Set((1L, 1), (2L, 2), (3L, 3)))
  }

  test("annLshTopK returns only true near neighbors for clustered data") {
    // two tight clusters; query 0 must retrieve its own cluster-mates
    val vecs = (0L to 3L).map(i => i -> Seq(1f, 0.01f * i, 0f)) ++
      (4L to 7L).map(i => i -> Seq(-1f, 0f, 0.01f * i))
    val out = Similarity.annLshTopK(emb(vecs: _*), numQueries = 1, k = 3, numPlanes = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out.nonEmpty && out.subsetOf(Set(1L, 2L, 3L)))
  }
}
