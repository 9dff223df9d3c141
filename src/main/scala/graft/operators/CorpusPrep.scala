package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The composed training-corpus preparation pipeline — the job a data
  * team actually submits, built from the individually oracle-checked
  * stages:
  *
  *   quality filter → cluster-level near-dup removal (keep one
  *   canonical doc per connected component) → deterministic stratified
  *   sampling → token-budget packing.
  *
  * Composing them in ONE plan (rather than four materialized passes)
  * matters twice over: correctness — the end-to-end oracle catches
  * stage-wiring bugs (wrong column fed forward, stages composed in the
  * wrong order) that per-stage oracles cannot; and scale — the quality
  * filter and sampling predicates stay map-side (pruning the corpus
  * BEFORE the expensive shingle join), the canonical-survivor join is
  * an AQE-splittable equi-join on doc_id, and only the final packing
  * window touches the (small) surviving sample.
  *
  * Stage order is semantic, not stylistic: dedup must run BEFORE
  * sampling (sampling first would keep a doc whose cluster canonical
  * was sampled away, re-introducing duplicates), and packing must run
  * LAST because offsets are a function of exactly the surviving
  * stream. The oracle pins this order.
  */
object CorpusPrep {

  def corpusPrep(docs: DataFrame, k: Int, tau: Double,
                 rates: Seq[(String, Double)], budget: Long): DataFrame = {
    val kept = docs.filter(TextAnalysis.qualityKeepExpr(col("text")))
    val canon = Dedup.dedupClusters(kept, k, tau)
      .filter(col("is_canonical")).select("doc_id")
    val sampled = kept.join(canon, "doc_id")
      .filter(TextAnalysis.sampleKeepExpr(rates))
    TextAnalysis.packTokenBudget(sampled, budget)
  }

  def corpusPrepQuery(spark: SparkSession, dir: String): DataFrame =
    corpusPrep(Tables.documents(spark, dir), k = 3, tau = 0.7,
      rates = TextAnalysis.sampleRates, budget = 512)
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- oracle

  /** Every stage's SQL comes from the fragment the stage's OWN oracle
    * uses (shingle/components CTEs from Dedup, keep/sample/pack SQL
    * from TextAnalysis), so the composed oracle cannot drift from the
    * per-stage ones. */
  val oracles: Map[String, String] = Map(
    "corpus_prep" -> ("WITH RECURSIVE kept AS (" +
      s"""SELECT doc_id, text, lang, source FROM documents
         |  WHERE ${TextAnalysis.keepSql}),
         |""".stripMargin +
      Dedup.shingleCteFrom("kept") +
      Dedup.componentsCteSql(0.7, "kept") +
      s""",sampled AS (
         |  SELECT * FROM (
         |    SELECT kept.* FROM kept
         |    JOIN comp ON kept.doc_id = comp.doc_id
         |    WHERE comp.doc_id = comp.rep_id)
         |  WHERE ${TextAnalysis.sampleBucketSql} < ${TextAnalysis.sampleCaseSql})
         |${TextAnalysis.packSelectSql(512, "sampled")}
         |ORDER BY doc_id""".stripMargin),
  )
}
