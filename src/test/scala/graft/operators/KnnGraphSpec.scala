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

  test("knnGraphClusters: partition covers every vector; labels are min-reachable") {
    val out = Similarity.knnGraphClusters(emb, k = 3)
      .select("vec_id", "rep_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length === emb.count())
    // rep is the min member of its cluster, and sizes are consistent
    val byRep = out.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      assert(members.map(_._1).min === rep, "label must be the min member id")
      assert(members.forall(_._3 === members.length.toLong))
      assert(members.count(_._4) === 1, "exactly one canonical per cluster")
    }
  }

  test("knnGraphClusters: a vector with no reciprocal edge is a singleton") {
    val g = Similarity.knnGraph(emb, k = 3)
      .select("src", "dst", "mutual").as[(Long, Long, Boolean)].collect()
    val lonely = g.groupBy(_._1).collect {
      case (src, edges) if edges.forall(!_._3) => src
    }.toSet
    val sizes = Similarity.knnGraphClusters(emb, k = 3)
      .select("vec_id", "cluster_size").as[(Long, Long)].collect().toMap
    lonely.foreach(v => assert(sizes(v) === 1L,
      s"vector $v reciprocates nothing but landed in a cluster"))
  }

  test("knnGraphClusters: mutual components merge separated synthetic blobs correctly") {
    // two orthogonal blobs: ids 0-3 near e1, ids 10-13 near e2 — the
    // mutual graph cannot cross blobs, so components split exactly
    val mk = (base: Int, ids: Seq[Long]) => ids.map { i =>
      val v = Array.fill(4)(0.001f * i); v(base) = 1.0f
      (i, v, base)
    }
    val d = (mk(0, Seq(0L, 1L, 2L, 3L)) ++ mk(1, Seq(10L, 11L, 12L, 13L)))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnGraphClusters(d, k = 2, numCentroids = 2,
        nProbe = 2)
      .select("vec_id", "rep_id").as[(Long, Long)].collect().toMap
    assert(Set(0L, 1L, 2L, 3L).map(out) === Set(0L))
    assert(Set(10L, 11L, 12L, 13L).map(out) === Set(10L))
  }

  test("knnGraphRefine: candidates are a superset, so recall never drops") {
    // top-k from a candidate SUPERSET can only gain true edges: any
    // true-top-k edge surviving the base selection also survives the
    // refined one (at most k-1 vectors beat it globally)
    val out = Similarity.knnRefineRecall(emb, k = 3, numCentroids = 8,
        nProbe = 2)
      .select("stage", "hits").as[(String, Long)].collect().toMap
    assert(out("refined") >= out("ivf"))
  }

  test("knnGraphRefine: refining the exact graph is a fixpoint") {
    // base at nProbe = C is the exact graph; NN-Descent over it must
    // return the same edge set (no true neighbor left to discover)
    val base = Similarity.knnGraph(emb, k = 3, numCentroids = 4, nProbe = 4)
      .select("src", "dst", "cos", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val refined = Similarity.knnGraphRefine(emb, k = 3, numCentroids = 4,
        nProbe = 4)
      .select("src", "dst", "cos", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(refined === base)
  }

  test("knnGraphRefine: still exactly k ranked edges per vertex") {
    val g = Similarity.knnGraphRefine(emb, k = 2, numCentroids = 4,
      nProbe = 4)
    val counts = g.groupBy("src").count().select("count").as[Long].collect()
    assert(counts.forall(_ === 2L))
    assert(g.select("src").distinct().count() === emb.count())
  }

  test("knnRefineConverged: recall monotone round over round, and the " +
       "exact graph is a zero-round fixpoint") {
    // truth = nProbe=C graph (spec above pins ≡ brute force); recall
    // of round r ≥ recall of round r−1 because each round's candidate
    // set contains the incumbent edges
    val truth = Similarity.knnGraph(emb, k = 3, numCentroids = 8,
        nProbe = 8).select("src", "dst")
      .as[(Long, Long)].collect().toSet
    var cur = Similarity.knnGraph(emb, k = 3, numCentroids = 8, nProbe = 2)
      .select("src", "dst").localCheckpoint()
    var lastHits = cur.as[(Long, Long)].collect().count(truth)
    for (_ <- 1 to 3) {
      cur = Similarity.knnGraphRefineFrom(emb, cur, 3)
        .select("src", "dst").localCheckpoint()
      val hits = cur.as[(Long, Long)].collect().count(truth)
      assert(hits >= lastHits, "a refine round must never lose true edges")
      lastHits = hits
    }
    // converged run started AT the exact graph: every round changes
    // nothing, so the early stop fires on round 1 and the output IS
    // the exact graph (the fixpoint that defines convergence)
    val conv = Similarity.knnRefineConverged(emb, k = 3, numCentroids = 8,
        nProbe = 8, maxRounds = 3, epsBp = 100L)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(conv === truth)
  }

  test("knnRefineConverged: epsBp = 0 runs all maxRounds and matches " +
       "the unrolled refine chain") {
    // with an impossible stop threshold the loop must take exactly
    // maxRounds rounds — pin it against hand-unrolled refineFrom calls
    val base = Similarity.knnGraph(emb, k = 3, numCentroids = 8, nProbe = 2)
      .select("src", "dst").localCheckpoint()
    val r1 = Similarity.knnGraphRefineFrom(emb, base, 3)
      .select("src", "dst").localCheckpoint()
    val r2 = Similarity.knnGraphRefineFrom(emb, r1, 3)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    val conv = Similarity.knnRefineConverged(emb, k = 3, numCentroids = 8,
        nProbe = 2, maxRounds = 2, epsBp = 0L)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(conv === r2)
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
