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
}
