package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every raw document by how target-like its
    * hashed n-gram feature distribution is, then keep the top-N. The
    * importance model is two bag-of-buckets unigram+bigram
    * distributions — p_target over docs matching `target`, p_raw over
    * everything — smoothed add-1 over `numBuckets` hash buckets; a
    * doc's log-importance is Σ over its feature OCCURRENCES of
    * λ(b) = ln p̂_target(b) − ln p̂_raw(b). Ranking uses the per-feature
    * MEAN (lw div n_feat) so long docs aren't favored merely for
    * having more features (the paper's length-normalized variant).
    * The published method resamples with Gumbel noise; this takes the
    * deterministic top-N limit (noise-free selection is the
    * reproducible analog, and ties still break on doc_id).
    *
    * Cross-engine exactness: λ is rounded ONCE per bucket to integer
    * micro-nats with the four ln terms in a FIXED left-to-right order
    * (float addition is order-sensitive; same text, same bits), so doc
    * scores are BIGINT sums. Spark `div` and DuckDB `//` both truncate
    * toward zero, so the possibly-NEGATIVE mean agrees too.
    *
    * Scale shape: feature hashing is the point of DSIR — the model is
    * `numBuckets` rows no matter the corpus (vs an unbounded n-gram
    * vocab), so it broadcasts as ONE collapsed map row and docs score
    * map-only via the in-row `aggregate` fold (same zero-shuffle shape
    * as lmSurprisal). Both count aggregates are map-side-combined into
    * ≤ numBuckets groups; selection is the two-phase sharded top-N, so
    * no window ever sees the corpus — only ≤ shards·selectN rows. */
  def dsirImportance(docs: DataFrame, target: Column,
                     numBuckets: Int = 256, selectN: Int = 100,
                     shards: Int = 8): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(selectN >= 1 && shards >= 1,
      s"selectN/shards must be >= 1, got $selectN/$shards")
    val b = numBuckets
    val feats = docs
      .select(col("doc_id"), target.as("is_target"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("is_target"),
        concat(col("toks"), wordShingles(col("toks"), 2)).as("fs"))

    val occ = feats
      .select(col("doc_id"), col("is_target"), explode(col("fs")).as("f"))
      .select(col("is_target"), pmod(hash28(col("f")), lit(b.toLong)).as("b"))
    val counts = occ.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val tots = occ.agg(count(lit(1)).as("tr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tt"))

    // the four ln terms stay in this exact order on both engines
    val lam = counts.crossJoin(broadcast(tots))
      .select(col("b"),
        round((log(col("ct") + 1) - log(col("tt") + b)
          - log(col("cr") + 1) + log(col("tr") + b))
          * lit(1000000.0d)).cast("long").as("lam_micro"))
    val lamMap = lam
      .agg(collect_list(struct(col("b"), col("lam_micro"))).as("es"))
      .select(map_from_entries(col("es")).as("lmap"))

    val perDoc = feats.crossJoin(broadcast(lamMap))
      .select(col("doc_id"),
        size(col("fs")).cast("long").as("n_feat"),
        aggregate(col("fs"), lit(0L), (acc, f) =>
          acc + element_at(col("lmap"), pmod(hash28(f), lit(b.toLong))))
          .as("lw_micro"))
      .withColumn("mean_micro", expr("lw_micro div n_feat"))

    val wShard = W.partitionBy(pmod(col("doc_id"), lit(shards)))
      .orderBy(col("mean_micro").desc, col("doc_id"))
    val wFinal = W.orderBy(col("mean_micro").desc, col("doc_id"))
    val sel = perDoc
      .withColumn("srnk", row_number().over(wShard))
      .filter(col("srnk") <= selectN)
      .withColumn("rn", row_number().over(wFinal))
      .filter(col("rn") <= selectN)
      .select(col("doc_id").as("sel_id"))
    perDoc.join(broadcast(sel), col("doc_id") === col("sel_id"), "left_outer")
      .select(col("doc_id"), col("n_feat"), col("lw_micro"), col("mean_micro"),
        col("sel_id").isNotNull.as("selected"))
  }

  def dsirImportanceQuery(spark: SparkSession, dir: String): DataFrame =
    dsirImportance(Tables.documents(spark, dir), col("lang") === "en")
      .orderBy(col("doc_id"))

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
        |FROM ranked ORDER BY doc_id""".stripMargin,
    // hashed unigram+bigram buckets, add-1 smoothed target/raw
    // log-ratio rounded once per bucket (ln terms in the Spark-side
    // order), BIGINT doc sums, trunc-div mean, global top-100
    "dsir_importance" ->
      """WITH docs_t AS (
        | SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |feats AS (
        | SELECT doc_id, lang,
        |  list_concat(toks, CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)),
        |                        i -> toks[i] || ' ' || toks[i+1])
        |    ELSE [] END) AS fs
        | FROM docs_t),
        |occ AS (
        | SELECT doc_id, lang,
        |  CAST('0x' || substr(md5(f), 1, 7) AS BIGINT) % 256 AS b
        | FROM (SELECT doc_id, lang, unnest(fs) AS f FROM feats)),
        |counts AS (
        | SELECT b, CAST(count(*) AS BIGINT) AS cr,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
        | FROM occ GROUP BY 1),
        |tots AS (
        | SELECT CAST(count(*) AS BIGINT) AS tr,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
        | FROM occ),
        |lam AS (
        | SELECT b,
        |  CAST(round((ln(ct + 1) - ln(tt + 256) - ln(cr + 1) + ln(tr + 256))
        |             * 1000000) AS BIGINT) AS lam_micro
        | FROM counts CROSS JOIN tots),
        |per_doc AS (
        | SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_feat,
        |  CAST(sum(l.lam_micro) AS BIGINT) AS lw_micro
        | FROM occ o JOIN lam l USING (b) GROUP BY 1),
        |ranked AS (
        | SELECT doc_id, n_feat, lw_micro, lw_micro // n_feat AS mean_micro
        | FROM per_doc),
        |sel AS (
        | SELECT doc_id FROM (
        |  SELECT doc_id,
        |   row_number() OVER (ORDER BY mean_micro DESC, doc_id) AS rn
        |  FROM ranked) WHERE rn <= 100)
        |SELECT r.doc_id, r.n_feat, r.lw_micro, r.mean_micro,
        | r.doc_id IN (SELECT doc_id FROM sel) AS selected
        |FROM ranked r ORDER BY r.doc_id""".stripMargin)
}
