package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-11 specs: span-corruption planning, Heaps-law fit, and the
  * minhash banding chooser tied to its measured recall. */
class Batch11Spec extends SparkSpec {
  import spark.implicits._

  test("spanCorruptionPlan: spans are in-block, non-overlapping, 15% mass") {
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.spanCorruptionPlan(Seq((1L, text)).toDF("doc_id", "text"))
      .select("block", "span_start", "span_text")
      .as[(Int, Long, String)].collect().sortBy(_._1)
    assert(out.length === 5, "100 tokens / 20 per block")
    out.foreach { case (b, s, txt) =>
      assert(s >= b * 20 && s + 3 <= (b + 1) * 20, "span stays inside its block")
      assert(txt.split(" ").length === 3)
      assert(txt === (s until s + 3).map(i => s"t$i").mkString(" "),
        "span text is the slice at span_start")
    }
    val starts = out.map(_._2)
    starts.zip(starts.tail).foreach { case (a, b) => assert(a + 3 <= b) }
    assert(out.length * 3 === 15, "15% of 100 tokens masked")
  }

  test("spanCorruptionPlan: short docs emit nothing; plan is reproducible") {
    val df = Seq((1L, "a b c d e"), (2L, (0 until 25).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextAnalysis.spanCorruptionPlan(df).collect().map(_.toSeq).toSet
    val b = TextAnalysis.spanCorruptionPlan(df).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(!a.exists(_.head == 1L), "5-token doc has no full block")
    assert(a.count(_.head == 2L) === 1, "25 tokens -> one full block")
  }

  test("heapsFit: a genuinely growing vocabulary fits a positive beta") {
    // every doc introduces fresh types at a constant rate: V = N/2,
    // so ln V = ln N - ln 2 and beta must be ~1
    val docs = (0L until 40L).map(d =>
      (d, (0 until 10).map(i => s"w${d}_${i / 2}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusStats.heapsFit(docs)
      .select("beta_micro").as[Long].head()
    assert(math.abs(out - 1000000L) < 5000L, s"beta $out should be ~1e6")
  }

  test("heapsFit: a closed vocabulary saturates toward beta 0") {
    val docs = (0L until 40L).map(d =>
      (d, (0 until 10).map(i => s"fixed$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusStats.heapsFit(docs)
      .select("beta_micro").as[Long].head()
    assert(out >= 0L && out < 100000L, s"beta $out should be near 0")
  }

  test("minhashBandingFor: minimal banding meeting the predicted SLA") {
    // tau=0.8, numHashes=64: b=8 predicts ~0.77, b=16 ~0.9998
    assert(Dedup.minhashBandingFor(0.8, 0.95, 64) === ((16, 4)))
    // looser SLA admits the cheaper banding
    assert(Dedup.minhashBandingFor(0.8, 0.5, 64) === ((8, 8)))
    // unreachable SLA falls back to 1-row bands (max recall)
    assert(Dedup.minhashBandingFor(0.05, 0.999, 64) === ((64, 1)))
  }

  test("minhashBandingFor's choice meets its SLA in MEASURED recall") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val (bands, _) = Dedup.minhashBandingFor(0.8, 0.95, 64)
    val measured = Dedup.lshRecallEval(docs, tau = 0.8, numHashes = 64,
      bandings = Seq(bands))
      .select("recall_bp").as[Long].head()
    assert(measured >= 9500L,
      s"chosen banding $bands measured $measured bp < SLA 9500")
  }
}
