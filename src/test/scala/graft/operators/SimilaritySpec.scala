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

  test("block-tiled near-dup == naive all-pairs: every pair met exactly once") {
    import org.apache.spark.sql.functions._
    import graft.functions.CosineSimilarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val naive = {
      val v = Similarity.vectors(e)
      val a = v.toDF("vec_a", "ea")
      val b = v.toDF("vec_b", "eb")
      a.join(b, a("vec_a") < b("vec_b"))
        .withColumn("cos", CosineSimilarity(col("ea"), col("eb")))
        .filter(col("cos") >= 0.40)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
        .as[(Long, Long, Double)].collect().toSeq
    }
    assert(naive.nonEmpty, "precondition: corpus has qualifying pairs")
    // a block count that divides 500 unevenly, incl. the 1-block edge
    for (g <- Seq(1, 3, 16)) {
      val tiled = Similarity.cosineNearDupPairs(e, tau = 0.40, numBlocks = g)
        .as[(Long, Long, Double)].collect().toSeq
      // multiset compare: a pair emitted from TWO block keys would dup
      assert(tiled.sorted === naive.sorted, s"numBlocks=$g")
    }
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

  test("annLshTopK recall@k vs brute force: high at Hamming-1, monotone in probes") {
    import scala.util.Random
    val rnd = new Random(427)
    val dim = 16
    val n = 200
    val numQ = 8
    val k = 5
    // zero-mean random vectors — the hardest (unclustered) case
    val vecs = (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val e = emb(vecs: _*)

    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val exact = topk(Similarity.annCosineTopK(e, numQ, k))
    def recallAt(probe: Int): Double = {
      val lsh = topk(Similarity.annLshTopK(e, numQ, k,
        numPlanes = 4, probeHamming = probe, dim = dim))
      exact.map { case (q, t) =>
        lsh.getOrElse(q, Set.empty).intersect(t).size.toDouble / k
      }.sum / exact.size
    }

    val r = (0 to 4).map(recallAt)
    // candidate sets grow with the probe radius, so recall is monotone
    assert(r.zip(r.tail).forall { case (lo, hi) => lo <= hi }, s"recall=$r")
    // at probeHamming = numPlanes every bucket is probed == brute force
    assert(r.last === 1.0, s"full probe must equal brute force, recall=$r")
    // the documented operating point (seeded, deterministic)
    assert(r(1) >= 0.7, s"Hamming-1 recall too low: $r")
  }

  test("annIvfTopK: probing every cell equals brute force; recall monotone in nProbe") {
    import scala.util.Random
    val rnd = new Random(428)
    val vecs = (0 until 150).map(i =>
      (i.toLong, Seq.fill(12)((rnd.nextDouble() * 2 - 1).toFloat)))
    val e = emb(vecs: _*)
    val numQ = 6
    val k = 4

    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
      df.select("query_id", "neighbor_id", "cos", "rnk")
        .as[(Long, Long, Double, Int)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap

    val exact = topk(Similarity.annCosineTopK(e, numQ, k))
    // nProbe == numCentroids probes the whole corpus: EXACTLY brute force
    val full = topk(Similarity.annIvfTopK(e, numQ, k,
      numCentroids = 8, nProbe = 8))
    assert(full === exact)

    val recalls = (1 to 8).map { p =>
      val ivf = topk(Similarity.annIvfTopK(e, numQ, k, numCentroids = 8, nProbe = p))
      exact.map { case (q, t) =>
        ivf.getOrElse(q, Seq.empty).map(_._1).toSet
          .intersect(t.map(_._1).toSet).size.toDouble / k
      }.sum / exact.size
    }
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => lo <= hi },
      s"recall must be monotone in nProbe: $recalls")
    assert(recalls.last === 1.0)
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
