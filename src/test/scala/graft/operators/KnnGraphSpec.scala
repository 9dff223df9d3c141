package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("nProbe = C degrades to the exact brute-force graph") {
    val n = emb.count().toInt
    val g = Similarity.knnGraph(emb, k = 3, numCentroids = 4, nProbe = 4)
      .select("src", "dst", "cos", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.annCosineTopK(emb, numQueries = n, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(g === brute)
  }

  test("numBlocks is pure partitioning: output invariant under 1 vs 3") {
    val a = Similarity.knnGraph(emb, k = 3, numBlocks = 1)
      .collect().map(_.toSeq).toSet
    val b = Similarity.knnGraph(emb, k = 3, numBlocks = 3)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("mutual flag marks exactly the reciprocal edges") {
    val out = Similarity.knnGraph(emb, k = 3)
      .select("src", "dst", "mutual")
      .as[(Long, Long, Boolean)].collect()
    val dir = out.map(e => (e._1, e._2)).toSet
    out.foreach { case (s, d, m) =>
      assert(m === dir.contains((d, s)), s"edge ($s,$d) mutual flag wrong")
    }
    // both kinds must occur, or the flag is vacuous on this corpus
    assert(out.exists(_._3) && out.exists(!_._3))
  }

  test("every vertex gets exactly k neighbors when candidates suffice") {
    // nProbe=C guarantees a full candidate set for every vertex
    val g = Similarity.knnGraph(emb, k = 2, numCentroids = 4, nProbe = 4)
    val counts = g.groupBy("src").count().select("count").as[Long].collect()
    assert(counts.forall(_ === 2L))
    assert(g.select("src").distinct().count() === emb.count())
  }

  test("directed edges carry a descending-cosine rank per vertex") {
    val g = Similarity.knnGraph(emb, k = 3)
      .select("src", "rnk", "cos").as[(Long, Int, Double)].collect()
      .groupBy(_._1)
    g.values.foreach { edges =>
      val byRank = edges.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
