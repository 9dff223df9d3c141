package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.SparkSpec

class QualityModelsSpec extends SparkSpec {
  import spark.implicits._

  test("lmSurprisal: hand-computed micro-nats on a two-doc corpus") {
    // tokens: a=2, b=2, total=4 ⇒ surprisal(a)=surprisal(b)=ln2 nats
    //   = round(693147.18...) = 693147 micro-nats
    val d = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = QualityModels.lmSurprisal(d)
      .select("doc_id", "n_toks", "surprisal_micro", "mean_micro")
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(out(1L) === (3L, 3 * 693147L, 693147L))
    assert(out(2L) === (1L, 693147L, 693147L))
  }

  test("lmSurprisal: single-type corpus scores exactly zero") {
    val d = Seq((1L, "w w w"), (2L, "w")).toDF("doc_id", "text")
    val out = QualityModels.lmSurprisal(d)
      .select("doc_id", "surprisal_micro").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("lmSurprisal: mean is invariant to repeating a doc's content") {
    // "x y" vs "x y x y": same per-token distribution contribution
    // ratio, mean surprisal must match within 1 micro-nat (integer div)
    val d = Seq((1L, "x y"), (2L, "x y x y")).toDF("doc_id", "text")
    val out = QualityModels.lmSurprisal(d)
      .select("doc_id", "mean_micro").as[(Long, Long)].collect().toMap
    assert(math.abs(out(1L) - out(2L)) <= 1)
  }

  test("qualityFloorPerSource == naive per-source rank rule on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = QualityModels.qualityFloorPerSource(d)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    // naive reference: one window per source
    val scored = d.select(col("doc_id"), col("source"),
      expr("(10000 * length(regexp_replace(text, '[^a-z]', ''))) div length(text)")
        .as("score_bp"))
    val w = W.partitionBy(col("source"))
      .orderBy(col("score_bp").desc, col("doc_id"))
    val want = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(W.partitionBy(col("source"))))
      .withColumn("keep", expr("rn <= (9 * n_src + 9) div 10"))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got === want)
    assert(got.valuesIterator.exists(!_), "floor must actually drop docs")
  }

  test("dsirImportance: target-like docs outscore off-target docs and win selection") {
    // en docs share a feature pool disjoint from the xx docs', so every
    // en feature has ct≈cr (λ ≈ ln(Tr/Tt) > 0 … relative) while xx
    // features have ct=0 — en means must dominate
    val d = Seq(
      (0L, "aa bb aa", "en"), (1L, "bb aa cc", "en"), (2L, "aa bb", "en"),
      (3L, "xx yy zz", "xx"), (4L, "yy zz xx", "xx"), (5L, "zz xx", "xx"))
      .toDF("doc_id", "text", "lang")
    val out = QualityModels.dsirImportance(d, col("lang") === "en", selectN = 3)
      .select("doc_id", "mean_micro", "selected")
      .as[(Long, Long, Boolean)].collect()
    val mean = out.map(r => r._1 -> r._2).toMap
    for (t <- 0L to 2L; r <- 3L to 5L)
      assert(mean(t) > mean(r), s"target doc $t must outscore raw doc $r")
    assert(out.filter(_._3).map(_._1).toSet === Set(0L, 1L, 2L))
    assert(out.length === 6, "every doc gets a score row")
  }

  test("dsirImportance: selection == naive global top-N; shard-count invariant") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val one = QualityModels.dsirImportance(d, col("lang") === "en", shards = 1)
      .select("doc_id", "n_feat", "lw_micro", "mean_micro", "selected")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val eight = QualityModels.dsirImportance(d, col("lang") === "en", shards = 8)
      .select("doc_id", "n_feat", "lw_micro", "mean_micro", "selected")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(one.toSet === eight.toSet)
    assert(one.length === d.count().toInt)
    // no smoothing hole: every doc has a finite score even when its
    // buckets never occur in the target slice
    assert(one.forall(r => r._2 > 0))
    val naive = one.sortBy(r => (-r._4, r._1)).take(100).map(_._1).toSet
    assert(one.filter(_._5).map(_._1).toSet === naive)
    assert(naive.size === 100)
  }

  test("qualityFloorPerSource: boundary ties keep lowest doc_ids") {
    // 4 docs, one source, identical score; keep 9/10 ⇒ K = ceil(3.6) = 4?
    // No: K = (9*4+9) div 10 = 4 — all kept. Force a drop with 10 docs:
    // K = (90+9) div 10 = 9, all scores tie ⇒ doc_ids 0..8 keep, 9 drops.
    val d = (0L until 10L).map(i => (i, "same text here", "s"))
      .toDF("doc_id", "text", "source")
    val out = QualityModels.qualityFloorPerSource(d)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert((0L until 9L).forall(out(_)))
    assert(!out(9L))
  }

  implicit private class Map2Ops(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
  }
}
