package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfIdfSimSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfCosinePairs: hand-computed fixed-point pipeline at k=1") {
    // N=3; df(x)=df(y)=2, df(z)=1 ⇒ idf_milli: round(ln(1.5)·1000)=405,
    // round(ln 3·1000)=1099. Weights d1{x:810,y:405} d2{x:405,y:405}
    // d3{z:2198}; only (1,2) share terms.
    val d = Seq((1L, "x x y"), (2L, "x y"), (3L, "z z")).toDF("doc_id", "text")
    val out = TfIdfSim.tfidfCosinePairs(d, k = 1)
      .select("doc_a", "doc_b", "dot", "na2", "nb2", "cos_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val iXY = math.round(math.log(3.0 / 2) * 1000) // 405
    val dot = (2 * iXY) * iXY + iXY * iXY
    val na2 = (2 * iXY) * (2 * iXY) + iXY * iXY
    val nb2 = 2 * iXY * iXY
    val cosMicro = math.round(dot / (math.sqrt(na2.toDouble) *
      math.sqrt(nb2.toDouble)) * 1e6)
    assert(out.toSeq === Seq((1L, 2L, dot, na2, nb2, cosMicro)))
  }

  test("terms in every doc carry idf 0 — dropping them is provably exact") {
    val base = Seq((1L, "x x y"), (2L, "x y"), (3L, "z z"))
      .toDF("doc_id", "text")
    // same corpus with a ubiquitous term appended: N, df(x/y/z) and so
    // every surviving weight are unchanged; w itself must not appear
    val noisy = Seq((1L, "x x y w"), (2L, "x y w"), (3L, "z z w"))
      .toDF("doc_id", "text")
    val a = TfIdfSim.tfidfCosinePairs(base, k = 1).collect().toSeq
    val b = TfIdfSim.tfidfCosinePairs(noisy, k = 1).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("maxDf redefines the term space: capped runs can only lose pairs") {
    val d = Seq((1L, "x y aa"), (2L, "x y bb"), (3L, "cc"))
      .toDF("doc_id", "text") // doc 3 keeps df(x)=df(y)=2 below N=3
    val full = TfIdfSim.tfidfCosinePairs(d, k = 1, tauNum = 1, tauDen = 10)
    assert(full.count() === 1, "x,y overlap qualifies at tau=0.1")
    val capped = TfIdfSim.tfidfCosinePairs(d, k = 1, tauNum = 1, tauDen = 10,
      maxDf = 1L)
    assert(capped.count() === 0,
      "df-capped space drops the only shared terms, so the pair vanishes")
  }

  test("repetition separates weighted cosine from Jaccard") {
    // identical shingle SETS, different tf profiles: Jaccard says 1.0,
    // weighted cosine must say less
    val d = Seq((1L, "p p p p q"), (2L, "p q q q q"), (3L, "r")).toDF("doc_id", "text")
    val out = TfIdfSim.tfidfCosinePairs(d, k = 1, tauNum = 1, tauDen = 100)
      .select("doc_a", "doc_b", "cos_micro").as[(Long, Long, Long)].collect()
    assert(out.length === 1)
    assert(out.head._3 < 1000000L,
      "tf asymmetry must pull weighted cosine below 1 despite equal sets")
  }
}
