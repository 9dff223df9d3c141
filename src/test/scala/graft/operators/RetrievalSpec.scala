package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("bm25TopK: minimal case pins the exact fixed-point formula") {
    // One doc "w", one query "w": N=1, df=1, dl=sumdl=tf=1.
    //   idf_micro = round(ln((1-1+0.5)/1.5 + 1)*1e6) = round(ln(4/3)*1e6)
    //             = 287682
    //   tfn_micro = 22e6 / (10 + 3 + 9) = 1_000_000
    //   score     = (287682 * 1_000_000) div 1e6 = 287682
    val out = Retrieval.bm25TopK(docs(1L -> "w"), Seq(0 -> "w"), k = 5)
      .as[(Int, Long, Long, Int)].collect().toSet
    assert(out === Set((0, 1L, 287682L, 1)))
  }

  test("bm25TopK: a query's unique term pulls its only doc to rank 1") {
    val d = docs(
      1L -> "alpha beta beta",
      2L -> "beta gamma",
      3L -> "gamma gamma delta")
    val out = Retrieval.bm25TopK(d, Seq(0 -> "delta"), k = 3)
    val rows = out.as[(Int, Long, Long, Int)].collect()
    assert(rows.length === 1)          // only doc 3 contains 'delta'
    assert(rows.head._2 === 3L && rows.head._4 === 1)
  }

  test("bm25TopK: higher tf of a rare term outranks a common-term doc") {
    val d = docs(
      1L -> "x x y",  // two hits of rare x
      2L -> "y y y",  // only the everywhere-term y
      3L -> "x y z",
      4L -> "y z z")
    val top = Retrieval.bm25TopK(d, Seq(0 -> "x"), k = 2)
      .orderBy($"rnk").as[(Int, Long, Long, Int)].collect()
    assert(top.map(_._2).toSeq === Seq(1L, 3L)) // tf=2 above tf=1
    assert(top(0)._3 > top(1)._3)
  }

  test("bm25TopK: two-phase sharded top-k == single-window top-k") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qs = Retrieval.demoQueries
    val one = Retrieval.bm25TopK(d, qs, k = 5, shards = 1)
      .as[(Int, Long, Long, Int)].collect().toSet
    val eight = Retrieval.bm25TopK(d, qs, k = 5, shards = 8)
      .as[(Int, Long, Long, Int)].collect().toSet
    assert(one.nonEmpty && one === eight)
  }

  test("bm25TopK: score ties break on doc_id ascending") {
    // identical docs ⇒ identical scores; rank must follow doc_id
    val d = docs(7L -> "a b", 3L -> "a b", 5L -> "a b")
    val out = Retrieval.bm25TopK(d, Seq(0 -> "a"), k = 3)
      .orderBy($"rnk").as[(Int, Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq === Seq(3L, 5L, 7L))
    assert(out.map(_._3).distinct.length === 1)
  }

  private def embs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("hybridRrfTopK: pins the integer RRF fusion of both hand-ranked lists") {
    // query = doc 0 ("q r"). Lexical list: [1, 2] (doc 1 has q twice
    // plus r; doc 3 shares no term). Semantic list: [3, 2, 1] by
    // cosine to e0 = x-axis. RRF with rrfK=60:
    //   doc1: 1e6 div 61 + 1e6 div 63 = 16393 + 15873 = 32266
    //   doc2: 1e6 div 62 + 1e6 div 62 = 16129 + 16129 = 32258
    //   doc3: sem-only rank 1         = 16393
    val d = docs(0L -> "q r", 1L -> "q q r", 2L -> "q s", 3L -> "t u")
    val e = embs(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.6f, 0.8f),
      2L -> Seq(0.9f, 0.43f),
      3L -> Seq(0.95f, 0.1f))
    val out = Retrieval.hybridRrfTopK(d, e, numQueries = 1, kFuse = 3, k = 3)
      .orderBy($"rnk")
      .as[(Long, Long, Int, Int, Long, Int)].collect()
    assert(out.toSeq === Seq(
      (0L, 1L, 1, 3, 32266L, 1),
      (0L, 2L, 2, 2, 32258L, 2),
      (0L, 3L, 0, 1, 16393L, 3)))
  }

  test("hybridRrfTopK: shard invariance and rank bookkeeping on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val one = Retrieval.hybridRrfTopK(d, e, shards = 1)
      .as[(Long, Long, Int, Int, Long, Int)].collect().toSet
    val eight = Retrieval.hybridRrfTopK(d, e, shards = 8)
      .as[(Long, Long, Int, Int, Long, Int)].collect().toSet
    assert(one.nonEmpty && one === eight)
    one.foreach { case (qid, did, lexR, semR, rrf, rnk) =>
      assert(did !== qid, "a query doc must not retrieve itself")
      assert(lexR > 0 || semR > 0, "every fused doc came from some list")
      val expect =
        (if (lexR > 0) 1000000L / (60 + lexR) else 0L) +
        (if (semR > 0) 1000000L / (60 + semR) else 0L)
      assert(rrf === expect, s"rrf_micro mismatch for ($qid,$did)")
      assert(rnk >= 1 && rnk <= 5)
    }
    // a doc topping BOTH lists must top the fusion
    one.groupBy(_._1).values.foreach { g =>
      g.find(r => r._3 === 1 && r._4 === 1)
        .foreach(r => assert(r._6 === 1, s"double-rank-1 doc not fused first: $r"))
    }
  }
}
