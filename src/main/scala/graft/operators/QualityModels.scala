package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.core.Tables
import graft.functions.TextFunctions._

/** Model-based quality scoring — the CCNet-style layer between the
  * rule filters (TextAnalysis.textQuality) and near-dup dedup: score
  * each document by a language model trained on the corpus itself and
  * gate on the score distribution. Two operators:
  *
  *  - lmSurprisal: unigram-LM cross-entropy per document (the
  *    perplexity-proxy CCNet uses KenLM for, at unigram order so the
  *    model is an aggregatable table instead of an external artifact).
  *  - qualityFloorPerSource: keep the best `keepFrac` of each source
  *    by a quality score — the per-domain percentile gate that stops a
  *    single boilerplate-heavy domain from flooding the mixture.
  *
  * Cross-engine exactness: surprisal is fixed-point micro-nats (the
  * only transcendental, ln, is rounded ONCE per vocab type to 1e-6
  * before any summation), the floor score is integer basis points —
  * both sum/compare as BIGINTs with no float-order caveat.
  */
object QualityModels {

  /** Per-document unigram cross-entropy in micro-nats.
    *
    * Model: p(t) = cnt(t) / total over the corpus's own token stream
    * (self-scoring — the usual first pass when no held-out LM exists;
    * a real pipeline swaps in counts from a reference corpus, which
    * changes nothing structurally). Per token occurrence the
    * surprisal is −ln p(t) = ln(total) − ln(cnt(t)), rounded once per
    * VOCAB TYPE to integer micro-nats; a document's score is the
    * BIGINT sum over its occurrences and the mean is an exact integer
    * division. High mean surprisal ⇒ rare-token soup (mojibake,
    * keyboard mash); low ⇒ repetitive boilerplate. The demo keep-band
    * [minKeep, maxKeep] drops both tails.
    *
    * Scale shape — ZERO corpus-sized shuffles:
    *  - vocab counts: one map-side-combined aggregate keyed by token
    *    type (vocab-sized output, power-law input handled by partial
    *    aggregation — the heavy key collapses map-side).
    *  - scoring: the vocab table collapses to ONE map row
    *    (map_from_entries over collect_list — vocab is ≪ corpus by
    *    Heaps' law; a 1e6-type vocab is a few MB) broadcast into the
    *    doc scan; each doc folds its own token array through the map
    *    with an `aggregate` HOF. No explode, no per-doc groupBy — the
    *    corpus is touched map-only.
    *  - every token is in-vocab by construction (the model is trained
    *    on the same stream); scoring against a FOREIGN vocab would add
    *    coalesce(..., unkMicro) in the fold.
    */
  def lmSurprisal(docs: DataFrame,
                  minKeepMicro: Long = 3200000L,
                  maxKeepMicro: Long = 3600000L): DataFrame = {
    val toks = docs.select(explode(tokens(col("text"))).as("t"))
    val vocab = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val model = vocab
      .agg(sum(col("cnt")).as("total"),
        collect_list(struct(col("t"), col("cnt"))).as("entries"))
      .select(map_from_entries(transform(col("entries"), e =>
        struct(e.getField("t"),
          round((log(col("total")) - log(e.getField("cnt")))
            * lit(1000000.0d)).cast("long")))).as("smap"))

    docs.crossJoin(broadcast(model))
      .select(col("doc_id"), tokens(col("text")).as("toks"), col("smap"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + element_at(col("smap"), t))
          .as("surprisal_micro"))
      .withColumn("mean_micro", expr("surprisal_micro div n_toks"))
      .withColumn("keep",
        col("mean_micro") >= minKeepMicro && col("mean_micro") <= maxKeepMicro)
  }

  def lmSurprisalQuery(spark: SparkSession, dir: String): DataFrame =
    lmSurprisal(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Keep the top `keepFrac` of each source's documents by quality
    * score (integer basis points of alphabetic mass — (10000·n_alpha)
    * div n_chars, ties broken by doc_id asc so the rule is a total
    * order). Per source, K = ceil(keepFrac · count) docs survive.
    *
    * Scale shape — the naive form is ONE window over each source
    * partition, which funnels a popular domain's every doc through a
    * single task. This implementation never materializes a per-source
    * total order over DOCS:
    *  - histogram: groupBy (source, score) — map-side combined, output
    *    bounded by |sources| · 10001 score values.
    *  - the running-count window orders the HISTOGRAM (≤ 10001 rows
    *    per source), deriving each source's cutoff score and the
    *    quota of docs to keep AT the cutoff.
    *  - docs strictly above the cutoff keep with a broadcast join —
    *    map-only; ONLY docs exactly at their source's boundary score
    *    (a 1-in-10001 slice) enter the tie-break window.
    */
  def qualityFloorPerSource(docs: DataFrame,
                            keepNum: Int = 9, keepDen: Int = 10): DataFrame = {
    require(keepNum > 0 && keepNum <= keepDen,
      s"keep fraction $keepNum/$keepDen must be in (0, 1]")
    val scored = docs.select(col("doc_id"), col("source"),
      expr("(10000 * length(regexp_replace(text, '[^a-z]', ''))) div length(text)")
        .as("score_bp"))

    val hist = scored.groupBy("source", "score_bp").agg(count(lit(1)).as("c"))
    val wCum = W.partitionBy(col("source")).orderBy(col("score_bp").desc)
    val totals = scored.groupBy("source").agg(count(lit(1)).as("n_src"))
    val cuts = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .join(totals, "source")
      .withColumn("k_keep",
        expr(s"($keepNum * n_src + $keepDen - 1) div $keepDen"))
      .filter(col("cum") >= col("k_keep") &&
        col("cum") - col("c") < col("k_keep"))
      .select(col("source"), col("score_bp").as("cut_bp"),
        (col("k_keep") - (col("cum") - col("c"))).as("quota"))

    val withCut = scored.join(broadcast(cuts), "source")
    val above = withCut.filter(col("score_bp") > col("cut_bp"))
      .withColumn("keep", lit(true))
    val wTie = W.partitionBy(col("source")).orderBy(col("doc_id"))
    val boundary = withCut.filter(col("score_bp") === col("cut_bp"))
      .withColumn("keep", row_number().over(wTie) <= col("quota"))
    val below = withCut.filter(col("score_bp") < col("cut_bp"))
      .withColumn("keep", lit(false))

    above.unionByName(boundary).unionByName(below)
      .select("doc_id", "source", "score_bp", "keep")
  }

  def qualityFloorPerSourceQuery(spark: SparkSession, dir: String): DataFrame =
    qualityFloorPerSource(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  val oracles: Map[String, String] = Map(
    "lm_surprisal" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
        |total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
        |smap AS (
        | SELECT t, CAST(round((ln(total) - ln(cnt)) * 1000000) AS BIGINT) AS s
        | FROM vocab CROSS JOIN total),
        |per_doc AS (
        | SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(smap.s) AS BIGINT) AS surprisal_micro
        | FROM tok JOIN smap USING (t) GROUP BY 1)
        |SELECT doc_id, n_toks, surprisal_micro,
        | surprisal_micro // n_toks AS mean_micro,
        | (surprisal_micro // n_toks) BETWEEN 3200000 AND 3600000 AS keep
        |FROM per_doc ORDER BY doc_id""".stripMargin,
    "quality_floor_per_source" ->
      """WITH scored AS (
        | SELECT doc_id, source,
        |  (10000 * length(regexp_replace(text, '[^a-z]', '', 'g')))
        |    // length(text) AS score_bp
        | FROM documents),
        |ranked AS (
        | SELECT *,
        |  row_number() OVER (PARTITION BY source
        |                     ORDER BY score_bp DESC, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n_src
        | FROM scored)
        |SELECT doc_id, source, score_bp,
        | rn <= (9 * n_src + 9) // 10 AS keep
        |FROM ranked ORDER BY doc_id""".stripMargin)
}
