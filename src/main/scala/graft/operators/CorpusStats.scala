package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.core.Tables
import graft.functions.TextFunctions._

/** Corpus-level monitoring statistics: which SOURCES mirror each other
  * (set-level Jaccard between per-source shingle vocabularies) and
  * whether a slice's EMBEDDING distribution has drifted (pairwise
  * cosine between per-label centroid directions) — the slice-granular
  * complements to the per-doc dedup and per-token vocab_kl_drift
  * operators.
  *
  * Reference semantics: lightbitbird/spark-streaming-kafka-example has
  * no corpus-monitoring operators; these extend the curation family
  * (SURVEY §2 rows 89, 163) a training-data pipeline needs.
  */
object CorpusStats {

  /** Pairwise source-level Jaccard over distinct word k-shingle sets —
    * mirror/boilerplate-farm detection at SOURCE granularity ("are
    * src3 and src11 the same site crawled twice?"), where doc-level
    * dedup sees only scattered pairs.
    *
    * Exactness: |A∩B| from the distinct-(source, shingle) self-join,
    * |A|, |B| from per-source counts, jaccard_bp = 10000·inter div
    * union in BIGINTs — no floats anywhere.
    *
    * Scale shape: the per-source distinct sets come from ONE map-side-
    * combined groupBy (never a corpus-wide distinct over raw text);
    * the self-join fans out per shingle only to the sources that share
    * it (≤ |sources| copies, and |sources| is thousands at web scale,
    * not corpus-sized); the pair aggregate is map-side combined over
    * ≤ |sources|² keys. Pairs with ZERO shared shingles are absent by
    * construction (their Jaccard is 0; emitting them would make the
    * output |sources|²-dense for no signal). */
  def sourceJaccard(docs: DataFrame, k: Int = 3): DataFrame = {
    val srcSh = docs
      .select(col("source"), explode(wordShingles(tokens(col("text")), k)).as("s"))
      .groupBy("source", "s").agg(count(lit(1)).as("cnt")) // distinct, map-side
      .select("source", "s")
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("sz"))
    val a = srcSh.toDF("source_a", "sa")
    val b = srcSh.toDF("source_b", "sb")
    val inter = a.join(b, col("sa") === col("sb") && col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("source_a", "size_a"), "source_a")
      .join(sizes.toDF("source_b", "size_b"), "source_b")
      .select(col("source_a"), col("source_b"), col("inter"),
        col("size_a"), col("size_b"),
        expr("(10000 * inter) div (size_a + size_b - inter)")
          .as("jaccard_bp"))
  }

  def sourceJaccardQuery(spark: SparkSession, dir: String): DataFrame =
    sourceJaccard(Tables.documents(spark, dir))
      .orderBy(col("source_a"), col("source_b"))

  /** Pairwise cosine between per-label embedding CENTROID directions —
    * the embedding-space drift monitor next to vocab_kl_drift's token
    * view: a new crawl slice whose centroid swings away from the
    * corpus centroid (or two label slices whose centroids collapse
    * together) is the admit-gate signal.
    *
    * Determinism: distributed float sums are order-dependent, so each
    * component is rounded ONCE to integer micro-units in-row and the
    * centroid is an exact BIGINT component sum — bit-identical in any
    * aggregation order and replicable in SQL. Cosine needs only the
    * centroid DIRECTION, so the un-normalized sum vector serves as the
    * centroid (the 1/n scale cancels); dot and norms are exact
    * decimal(38,0) products (component sums reach n·10^6·|x|, so
    * int64 would overflow near ~10^9 rows — HUGEINT/decimal(38,0)
    * holds to ~10^19 per component). cos_micro is the one display
    * float (exact integers through IEEE sqrt, identical cross-engine).
    *
    * Scale shape: ONE map-side-combined (label, dim) aggregate over
    * the exploded corpus (output |labels|·dim rows — model-sized);
    * everything downstream operates on the model-sized centroid frame.
    */
  def centroidDrift(emb: DataFrame): DataFrame =
    driftFromSums(componentSums(emb))

  /** The accumulable STATE behind centroidDrift: per-(label, dim)
    * exact BIGINT sums of once-rounded micro components, plus the
    * contributing row count. Exposed separately because integer sums
    * are batch-split-invariant — the same aggregation runs as a
    * Structured Streaming complete-mode query (streaming.DriftStream)
    * and the drift tail computes from the live state at any point. */
  private[graft] def componentSums(emb: DataFrame): DataFrame =
    // posexplode_OUTER + the dim-0/xm-0 coalesce: a zero-length
    // embedding array still contributes one (label, 0, 0) row, so the
    // dim-0 group's n counts EVERY embeddings row of the label (the
    // oracle's per-label size), not just rows with a non-empty vector
    // — while adding 0 to the dim-0 component sum. Without this a
    // label containing any empty array under-reported n_a/n_b vs the
    // oracle and the streaming state consumer.
    emb.select(col("label"),
        posexplode_outer(toDoubleArray(col("embedding"))).as(Seq("dim", "x")))
      .select(col("label"), coalesce(col("dim"), lit(0)).as("dim"),
        coalesce(round(col("x") * lit(1000000.0d)).cast("long"), lit(0L))
          .as("xm"))
      .groupBy("label", "dim")
      .agg(sum("xm").as("c"), count(lit(1)).as("n"))

  /** The model-sized drift tail over the (label, dim, c, n) sums. */
  private[graft] def driftFromSums(sums0: DataFrame): DataFrame = {
    // sums is referenced FIVE times below (cent → norms/a/b, sizes ×2)
    // — without a checkpoint each reference replays the corpus-sized
    // explode behind it (r18: embed_centroid_drift planned 6 scans,
    // and corpus_card's drift panel inherited them). The frame is
    // |labels|·dim rows — model-sized — so the checkpoint is free;
    // callers passing live streaming STATE (DriftStream.driftReading)
    // hand a batch memory-sink table, also model-sized.
    val sums = sums0.localCheckpoint()
    val cent = sums.select("label", "dim", "c")
    // dim-0 rows exist for EVERY embeddings row post componentSums'
    // outer explode, so this n is the label's full row count
    val sizes = sums.filter(col("dim") === 0).select(col("label"), col("n"))
    val norms = cent.groupBy("label")
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("n2"))
      // a label whose vectors are ALL empty/zero has no centroid
      // direction — drop it (the oracle's unnest-based cent CTE never
      // materializes it either), rather than emit a NaN cosine
      .filter(col("n2") > 0)
    val a = cent.toDF("label_a", "dim", "ca")
    val b = cent.toDF("label_b", "dimb", "cb")
    val dots = a.join(b, col("dim") === col("dimb") && col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("dot"))
    dots
      .join(norms.toDF("label_a", "na2"), "label_a")
      .join(norms.toDF("label_b", "nb2"), "label_b")
      .join(sizes.toDF("label_a", "n_a"), "label_a")
      .join(sizes.toDF("label_b", "n_b"), "label_b")
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("dot").cast("double")
            / (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))
            * lit(1000000.0d)).cast("long").as("cos_micro"))
  }

  def centroidDriftQuery(spark: SparkSession, dir: String): DataFrame =
    centroidDrift(Tables.embeddings(spark, dir))
      .orderBy(col("label_a"), col("label_b"))

  /** Per-doc NOVELTY against the rest of the corpus: how much of this
    * doc's distinct shingle set appears nowhere else (df = 1), plus
    * the mean df of its shingles in milli-units — the per-doc signal
    * behind upsampling decisions (novel long-tail content) and
    * boilerplate suspicion (mean_df high), where the dedup family
    * answers only the binary is-it-a-near-dup question.
    *
    * Exactness: novelty_bp = 10000·n_unique div n_shingles and
    * mean_df_milli = 1000·Σdf div n_shingles, all BIGINT.
    *
    * Scale shape: distinct postings + df are the dedup family's
    * map-side-combined aggregates; the join-back is posting-sized and
    * re-aggregates by doc map-side. No window ever partitions by the
    * (power-law) shingle key. Docs with zero shingles (< k tokens)
    * are absent by construction. */
  def docNovelty(docs: DataFrame, k: Int = 3): DataFrame = {
    val ss = Dedup.shingleSet(docs, k)
    val dfBy = ss.groupBy("s").agg(count(lit(1)).as("df"))
    ss.join(dfBy, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(col("df")).as("df_sum"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("(10000 * n_unique) div n_shingles").as("novelty_bp"),
        expr("(1000 * df_sum) div n_shingles").as("mean_df_milli"))
  }

  def docNoveltyQuery(spark: SparkSession, dir: String): DataFrame =
    docNovelty(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Tokenizer fertility per language: how many regex (BPE-ish)
    * tokens the tokenizer spends per whitespace word, and characters
    * per token — the per-language tokenizer-efficiency audit run
    * before committing a vocab (a language at 2x fertility costs 2x
    * the training compute for the same text). Ratios in exact
    * milli-units over per-language BIGINT sums; per-doc counts are
    * in-row expressions, the aggregate is ONE map-side-combined
    * groupBy over |langs| keys. */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs
      .select(col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("re_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("chars"),
        sum("ws_tokens").as("ws_tokens"),
        sum("re_tokens").as("re_tokens"))
      .select(col("lang"), col("n_docs"), col("chars"),
        col("ws_tokens"), col("re_tokens"),
        expr("(1000 * re_tokens) div ws_tokens").as("fertility_milli"),
        expr("(1000 * chars) div re_tokens").as("chars_per_tok_milli"))
  }

  def tokenizerFertilityQuery(spark: SparkSession, dir: String): DataFrame =
    tokenizerFertility(Tables.documents(spark, dir)).orderBy(col("lang"))

  /** Vocabulary COVERAGE at a candidate vocab size — the sizing QC a
    * tokenizer/embedding-table decision needs next to fertility (cost
    * per token) and Heaps (how fast the vocab grows): fix the top-V
    * corpus tokens as the vocabulary and measure each document's
    * out-of-vocabulary rate. Docs with high OOV under the production V
    * are the ones the tokenizer will shred into bytes/UNKs.
    *
    * Vocabulary rule: top V by (count desc, token asc) over nonempty
    * whitespace tokens — ties at the boundary break on binary token
    * order, total order, cross-engine identical.
    *
    * Scale shape — the lm_surprisal discipline: vocab counts are one
    * map-side-combined aggregate; the top-V set collapses to ONE
    * broadcast map row (V ≪ corpus; lookups are O(1) map probes, not
    * array scans); the doc scan is map-only, folding each token array
    * against the map — no explode of the corpus, no per-doc groupBy.
    * oov_bp = 10000·oov div n_tok in BIGINTs, rounded never. */
  /** The top-V vocabulary collapsed to ONE map row — the frozen
    * artifact the batch coverage report and the streaming admission
    * gate (VocabGateStream) both score against.
    *
    * Top-V selection is the zipfFit discipline: orderBy+limit (a
    * distributed TakeOrderedAndProject — each partition keeps its own
    * top V, the driver merges V-sized heaps), NEVER a vocab-wide
    * unpartitioned window (r16 verdict: a web-scale vocab is 10⁸+
    * types — ranking them through one WindowExec task is the
    * single-task sort this repo's window-discipline gate forbids).
    * The map is order-insensitive, so no rank column is needed at
    * all: the limited V rows fold straight into the set. */
  def vocabSetRow(docs: DataFrame, vocabSize: Int = 500): DataFrame = {
    // the one-map-row model is bounded by the LIMIT itself, so the
    // broadcast-model contract (QualityModels.maxBroadcastModelRows)
    // is enforceable statically: refuse a vocabSize that could not
    // broadcast, rather than guarding in-plan like the data-dependent
    // vocab maps (r17 verdict #5)
    require(vocabSize >= 1 && vocabSize <= 5000000,
      s"vocabSetRow: vocabSize $vocabSize outside [1, 5000000] — the " +
        "top-V map row must stay broadcast-model-sized")
    val toks = docs.select(explode(tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(vocabSize)
      .agg(map_from_entries(collect_list(struct(col("t"), lit(true))))
        .as("vset"))
  }

  /** Per-doc OOV accounting against a (vset) one-row frame — shared by
    * the batch report and the streaming gate so the two CANNOT drift. */
  def oovScored(docs: DataFrame, vrow: DataFrame): DataFrame =
    docs.crossJoin(broadcast(vrow))
      .select(docs.columns.map(col) :+
        filter(tokens(col("text")), t => t =!= "").as("__toks") :+
        col("vset"): _*)
      .withColumn("n_tok", size(col("__toks")).cast("long"))
      .withColumn("oov", size(filter(col("__toks"),
        t => not(element_at(col("vset"), t).isNotNull))).cast("long"))
      .withColumn("oov_bp", expr("(10000 * oov) div greatest(n_tok, 1)"))
      .drop("__toks", "vset")

  def vocabCoverage(docs: DataFrame, vocabSize: Int = 500): DataFrame = {
    val vrow = vocabSetRow(docs, vocabSize)
    docs.crossJoin(broadcast(vrow))
      .select(col("doc_id"),
        filter(tokens(col("text")), t => t =!= "").as("toks"), col("vset"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(filter(col("toks"),
          t => not(element_at(col("vset"), t).isNotNull)))
          .cast("long").as("oov"))
      .withColumn("oov_bp", expr("(10000 * oov) div greatest(n_tok, 1)"))
  }

  def vocabCoverageQuery(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Zipf-law fit over the token frequency head — the distributional
    * QC gate: natural text runs a log-log slope near −1; synthetic,
    * boilerplate-heavy, or template corpora bend the curve, and the
    * drift of slope_micro across crawls is the alarm. Least squares
    * on (ln rank, ln count) over the top-N types, both coordinates
    * rounded ONCE to integer micro-nats so every sum (n, Σx, Σy, Σxy,
    * Σx²) is an exact BIGINT (|x| ≤ ln(10^9)·10^6 ≈ 2·10^7, N ≤ 100 ⇒
    * products sit under 10^17); the slope/intercept are the two
    * display floats, computed from exact integers in a pinned
    * expression order (the cos_micro discipline).
    *
    * Scale shape: type counts are the map-side-combined vocab
    * aggregate; the head is TakeOrdered (cnt desc, token) — never a
    * vocab-wide window; the fit runs on ≤ N rows. */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    require(topN >= 2 && topN <= 10000)
    val cnts = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    val top = cnts.orderBy(col("cnt").desc, col("t")).limit(topN)
      .withColumn("rnk",
        row_number().over(W.orderBy(col("cnt").desc, col("t"))))
    val xy = top.select(
      round(log(col("rnk")) * lit(1000000.0d)).cast("long").as("x"),
      round(log(col("cnt")) * lit(1000000.0d)).cast("long").as("y"))
    fitMicro(xy, "n_fit", "slope_micro")
  }

  /** Shared least-squares tail over a micro-unit (x, y) frame: exact
    * BIGINT sums, slope/intercept as the two display floats in pinned
    * expression order. */
  private def fitMicro(xy: DataFrame, nName: String,
                       slopeName: String): DataFrame =
    xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as(nName),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            * lit(1000000.0d)).cast("long").as(slopeName),
        round((col("sy").cast("double")
            - (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * col("sx").cast("double"))
            / col("n").cast("double")).cast("long").as("intercept_micro"))

  def zipfFitQuery(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.documents(spark, dir))

  /** Per-vector distance-to-own-centroid outliers — label-quality QC
    * over the embedding table ("is this vector mislabeled, or the
    * label itself incoherent?"): each vector's cosine to its OWN
    * label's centroid direction (the exact-integer centroid of
    * componentSums, self included — the n-1 exclusion changes nothing
    * at slice sizes worth monitoring and keeps the state shared with
    * centroidDrift), reported as the once-rounded cosc_micro with
    * `outlier` = cosc_micro < tauMicro. The flag compares the ROUNDED
    * display value — identical on both engines by the same argument
    * as every cos_micro here — so no 128-bit dot-squared is needed
    * (τ-cross-multiplication would overflow decimal(38,0) at corpus
    * scale since dot² carries the centroid's n² factor).
    *
    * Scale shape: one (label, dim) aggregate (model-sized), centroid
    * frame broadcast back onto the exploded corpus, per-vector dot
    * re-aggregated map-side. */
  def centroidOutliers(emb: DataFrame, tauMicro: Long = 0L): DataFrame = {
    val q = emb.select(col("vec_id"), col("label"),
        posexplode(toDoubleArray(col("embedding"))).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim"),
        round(col("x") * lit(1000000.0d)).cast("long").as("xm"))
    val cent = componentSums(emb).select(col("label"), col("dim"), col("c"))
    val nc2 = cent.groupBy("label")
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("nc2"))
    val per = q.join(broadcast(cent), Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum(col("xm").cast("decimal(38,0)") * col("c")).as("dot"),
        sum(col("xm") * col("xm")).as("nv2"))
    per.join(broadcast(nc2), "label")
      .select(col("vec_id"), col("label"),
        round(col("dot").cast("double")
            / (sqrt(col("nv2").cast("double")) * sqrt(col("nc2").cast("double")))
            * lit(1000000.0d)).cast("long").as("cosc_micro"))
      .withColumn("outlier", col("cosc_micro") < tauMicro)
  }

  def centroidOutliersQuery(spark: SparkSession, dir: String): DataFrame =
    centroidOutliers(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  /** Heaps'-law fit — vocabulary GROWTH QC, the companion curve to
    * zipf_fit's frequency head: natural corpora grow V ∝ N^β with
    * β ≈ 0.4–0.6; a saturating curve (β → 0) means a closed/template
    * vocabulary, β → 1 means near-random token soup. The cumulative
    * (tokens N_j, types V_j) curve is sampled at `points` doc_id
    * thresholds: docs and type-first-appearances bucket by threshold
    * (exact integer bucketing against the broadcast max id), the
    * cumulatives are ONE window over the ≤ points-row bucket frame —
    * the two-phase prefix-sum discipline, never a corpus-wide
    * running total — and the β fit reuses the exact-integer
    * least-squares tail. */
  def heapsFit(docs: DataFrame, points: Int = 20): DataFrame = {
    require(points >= 2 && points <= 10000)
    val perDoc = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("nw"))
    val mx = perDoc.agg(max("doc_id").as("mx"))
    val nj = perDoc.crossJoin(broadcast(mx))
      .select(expr(s"(doc_id * $points) div (mx + 1) + 1").as("j"), col("nw"))
      .groupBy("j").agg(sum("nw").as("s"))
    val vb = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(min("doc_id").as("fdoc"))
      .crossJoin(broadcast(mx))
      .select(expr(s"(fdoc * $points) div (mx + 1) + 1").as("j"))
      .groupBy("j").agg(count(lit(1)).as("c"))
    // every first-appearance bucket holds a doc, so nj's key set covers
    // vb's; the cumulative window runs over <= points rows (documented
    // single-partition window, bounded by the points knob)
    val wCum = W.orderBy(col("j")).rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = nj.join(vb, Seq("j"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .select(col("j"), sum(col("s")).over(wCum).as("nn"),
        sum(col("c")).over(wCum).as("v"))
    val xy = cum.filter(col("v") >= 1)
      .select(round(log(col("nn")) * lit(1000000.0d)).cast("long").as("x"),
        round(log(col("v")) * lit(1000000.0d)).cast("long").as("y"))
    fitMicro(xy, "n_points", "beta_micro")
  }

  def heapsFitQuery(spark: SparkSession, dir: String): DataFrame =
    heapsFit(Tables.documents(spark, dir))

  /** The corpus DATA CARD — the one-stop summary every dataset release
    * ships (docs, token mass, vocabulary, sources, languages, exact-dup
    * mass, quality-gate pass rate) as tall (metric, value) rows so new
    * metrics append without schema changes. All values exact BIGINTs;
    * rates in integer basis points.
    *
    * Scale shape: one per-doc map pass feeds a single global aggregate
    * (count/sum/countDistinct — all map-side combined or
    * partial-aggregated by Spark's distinct planning); the vocabulary
    * count is the one token-level aggregate; the card itself is a
    * dozen rows from two 1-row frames. */
  def corpusCard(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(
      md5(col("text")).as("h"),
      size(tokens(col("text"))).cast("long").as("nw"),
      length(col("text")).cast("long").as("nc"),
      col("source"), col("lang"),
      when(TextAnalysis.qualityKeepExpr(col("text")), 1L).otherwise(0L).as("keep"))
    val base = perDoc.agg(
      count(lit(1)).as("n_docs"),
      count_distinct(col("h")).as("n_distinct_texts"),
      count_distinct(col("source")).as("n_sources"),
      count_distinct(col("lang")).as("n_langs"),
      sum("nw").as("n_tokens"),
      sum("nc").as("n_chars"),
      sum("keep").as("n_quality_keep"))
    val vocab = docs.select(explode(tokens(col("text"))).as("t"))
      .agg(count_distinct(col("t")).as("n_token_types"))
    base.crossJoin(broadcast(vocab))
      .selectExpr(
        """stack(10,
          | 'n_docs', n_docs,
          | 'n_distinct_texts', n_distinct_texts,
          | 'exact_dup_docs', n_docs - n_distinct_texts,
          | 'n_sources', n_sources,
          | 'n_langs', n_langs,
          | 'n_tokens', n_tokens,
          | 'n_chars', n_chars,
          | 'n_token_types', n_token_types,
          | 'mean_doc_tokens_milli', (1000 * n_tokens) div n_docs,
          | 'quality_keep_bp', (10000 * n_quality_keep) div n_docs
          |) AS (metric, value)""".stripMargin)
  }

  /** The card WITH the drift panel (r17 verdict #7; completed r18):
    * the six independent admission gates a crawl operator would run
    * one by one — sharp (KS) and integral (PSI) readings on both the
    * doc-length and embedding-norm axes, plus the token-level KL and
    * the centroid-direction check — fold their VERDICT summaries into
    * the same tall card, so "admit this crawl" is one query:
    *   drift_ks_len_max_micro      worst one-vs-rest doc-length KS
    *   drift_psi_len_max_micro     worst one-vs-rest doc-length PSI
    *   drift_ks_norm_max_micro     worst per-label embedding-norm KS
    *   drift_psi_norm_max_micro    worst per-label embedding-norm PSI
    *   drift_vocab_kl_sum_micro    Σ per-type KL contributions
    *   drift_vocab_kl_driver_types #types flagged as KL drivers
    *   drift_centroid_min_cos_micro worst pairwise centroid cosine
    * Each summary is a 1-row aggregate over an already-model-sized
    * gate output, crossed into the card exactly like the base card's
    * own 1-row frames — the panel adds zero corpus-sized shuffles
    * beyond the gates' own (shared, checkpointed) aggregates. */
  def corpusCard(docs: DataFrame, emb: DataFrame,
                 isNew: Column): DataFrame = {
    // the sharp (KS) and integral (PSI) readings on each axis share
    // ONE checkpointed histogram — the card pays one doc scan and one
    // vector scan for all four distribution gates, not two each
    val lenHist = lengthHist(docs).localCheckpoint()
    val nHist = normHist(emb, 10000L).localCheckpoint()
    val ksLen = ksFromHist(lenHist).agg(max(col("ks_micro")).as("ks_len_max"))
    val psiLen = psiFromHist(lenHist)
      .agg(max(col("psi_micro")).as("psi_len_max"))
    val ksNorm = ksFromHist(nHist)
      .agg(max(col("ks_micro")).as("ks_norm_max"))
    val psiNorm = psiFromHist(nHist, 10L)
      .agg(max(col("psi_micro")).as("psi_norm_max"))
    val kl = QualityModels.vocabKlDrift(docs, isNew)
      .agg(sum(col("kl_contrib_micro")).as("kl_sum"),
        sum(when(col("driver"), 1L).otherwise(0L)).as("kl_drivers"))
    val cd = centroidDrift(emb)
      .agg(min(col("cos_micro")).as("cent_min_cos"))
    corpusCard(docs).unionByName(
      ksLen.crossJoin(broadcast(psiLen)).crossJoin(broadcast(ksNorm))
        .crossJoin(broadcast(psiNorm)).crossJoin(broadcast(kl))
        .crossJoin(broadcast(cd))
        .selectExpr(
          """stack(7,
            | 'drift_ks_len_max_micro', ks_len_max,
            | 'drift_psi_len_max_micro', psi_len_max,
            | 'drift_ks_norm_max_micro', ks_norm_max,
            | 'drift_psi_norm_max_micro', psi_norm_max,
            | 'drift_vocab_kl_sum_micro', kl_sum,
            | 'drift_vocab_kl_driver_types', kl_drivers,
            | 'drift_centroid_min_cos_micro', cent_min_cos
            |) AS (metric, value)""".stripMargin))
  }

  def corpusCardQuery(spark: SparkSession, dir: String): DataFrame =
    corpusCard(Tables.documents(spark, dir), Tables.embeddings(spark, dir),
        col("source").isin("src0", "src1"))
      .orderBy(col("metric"))

  /** Metadata-consistency audit: the documents table CARRIES an
    * n_chars column — does it actually equal length(text)? The
    * denormalized-metadata drift check every warehouse load needs
    * (an upstream re-crawl that edits text but not the cached counts
    * silently poisons every length-based filter downstream): per
    * source, doc counts and rows whose stored n_chars is NULL or
    * disagrees with the text. Map-only + one per-source aggregate. */
  def metaConsistency(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        (col("n_chars").isNull || col("text").isNull ||
          col("n_chars") =!= length(col("text"))).as("bad"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_mismatch"))
      .select(col("source"), col("n_docs"), col("n_mismatch"),
        expr("(10000 * n_mismatch) div n_docs").as("mismatch_bp"))

  def metaConsistencyQuery(spark: SparkSession, dir: String): DataFrame =
    metaConsistency(Tables.documents(spark, dir)).orderBy(col("source"))

  /** Per-source distribution drift via the two-sample KOLMOGOROV-
    * SMIRNOV statistic on the doc-length (whitespace-token) histogram
    * — one-vs-rest per source: KS_s = max_v |F_s(v) − F_rest(v)|. The
    * scalar a continuously-crawled pipeline alarms on before admitting
    * a source's new batch, next to vocab_kl_drift's per-token view:
    * KL names the drifted TOKENS, KS names the drifted source and the
    * length where its shape diverges (ks_at_len — boilerplate
    * injection and truncation bugs both show up as a single sharp KS
    * argmax).
    *
    * Exactness: ECDFs as floored integer micro-units — f(v) =
    * (10⁶·C(v)) div N per side, diff = |f_s − f_rest| — so the max
    * and its argmax (smallest length on ties) are deterministic
    * integer comparisons on both engines. Flooring before the max
    * costs ≤ 2 micro of precision, and keeps every intermediate
    * ≤ 10⁶·N — int64-safe to ~9·10¹² docs (a corpus-COUNT bound, not
    * a token bound — 10⁶ × the trigram guard's corpus ceiling), and
    * GUARDED in-plan: past the bound the reading raise_errors instead
    * of wrapping (the KN ladder's loud-fail discipline).
    *
    * Scale shape: ONE corpus scan builds the (source, len) histogram
    * (map-side combined, model-sized: |sources|·|distinct lengths|,
    * checkpointed for its three reuses); the value grid × source
    * frame is a model×model cross; cumulative sums are windows
    * partitioned by source (per-partition rows = |grid|) and by len
    * (rows = |sources|); the argmax is a per-source rank. Nothing
    * corpus-sized crosses, shuffles wide, or sorts globally. */
  def ksDrift(docs: DataFrame): DataFrame =
    ksFromHist(lengthHist(docs))

  /** The streaming-aggregable half of [[ksDrift]]: per-(source, len)
    * doc counts — plain associative integer counting, so complete-mode
    * streaming state is EXACTLY this aggregate under any micro-batch
    * split (the DriftStream discipline). */
  def lengthHist(docs: DataFrame): DataFrame = docs
    .select(col("source"), size(tokens(col("text"))).cast("long").as("len"))
    .groupBy("source", "len").agg(count(lit(1)).as("n"))

  /** The model-sized KS reading tail over a (source, len, n) histogram
    * frame — shared by the batch operator and the live-state reading
    * (streaming.KsGateStream). */
  def ksFromHist(hist: DataFrame): DataFrame = {
    val h = hist.localCheckpoint()
    val grid = h.select(col("len")).distinct()
    val srcs = h.groupBy("source").agg(sum(col("n")).as("n_docs"))
    val tot = srcs.agg(sum(col("n_docs")).as("n_total"))
    val full = grid.crossJoin(srcs.select("source"))
      .join(h, Seq("source", "len"), "left")
      .select(col("source"), col("len"), coalesce(col("n"), lit(0L)).as("n"))
    val cs = full
      .withColumn("c_s", sum(col("n")).over(
        W.partitionBy("source").orderBy("len")))
      .withColumn("c_all", sum(col("c_s")).over(W.partitionBy("len")))
    val diffs = cs.join(srcs, "source").crossJoin(broadcast(tot))
      .filter(col("n_docs") < col("n_total"))
      // the 10⁶-scaled cumulative counts stay exact only while
      // 10⁶·n_total < 2⁶³ — past ~9·10¹² rows non-ANSI Spark would WRAP
      // silently and report a wrong KS where the oracle engine errors;
      // fail loudly instead (r17 advice: match the KN ladder's in-plan
      // guard discipline — one broadcast scalar compare)
      .select(col("source"), col("len"), col("n_docs"),
        when(col("n_total") >= lit(9000000000000L),
          raise_error(lit("ks drift: n_total >= 9e12 rows overflows the " +
            "10^6-scaled int64 ECDF — shrink the slice or widen the " +
            "micro unit before corpora this size")))
          .otherwise(abs(expr("(1000000 * c_s) div n_docs") -
            expr("(1000000 * (c_all - c_s)) div (n_total - n_docs)")))
          .cast("long").as("diff"))
    diffs
      .withColumn("rn", row_number().over(
        W.partitionBy("source").orderBy(col("diff").desc, col("len"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_docs"), col("diff").as("ks_micro"),
        col("len").as("ks_at_len"))
  }

  def ksDriftQuery(spark: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.documents(spark, dir)).orderBy(col("source"))

  /** Per-label embedding-NORM drift via the same one-vs-rest KS — the
    * vector-side companion to [[ksDrift]] (an encoder rollout or a
    * re-normalization bug shifts the norm distribution of one slice
    * long before cosine quality visibly degrades): the exact
    * micro-norm on the shared rounding basis every vector operator
    * here uses (embed_norm_qc's l2norm fold, bit-parity with the
    * oracle's list_sum), FLOOR-BUCKETED at a fixed width so the value
    * grid stays model-sized at any corpus size — distinct raw norms
    * are corpus-sized, buckets are bounded by max_norm/width. The
    * reading is [[ksFromHist]] verbatim: batch and the vector-side
    * streaming gate share the one code path. Non-finite, NULL-element
    * and EMPTY vectors are EXCLUDED — their norm is undefined or
    * degenerate; embed_norm_qc is their gate, and counting them here
    * would put an engine-dependent value into an exact integer
    * compare (r17 advice: an empty array norms to 0.0 on Spark but
    * NULL via DuckDB's list_sum, and a NULL ELEMENT nulls Spark's
    * exists-predicate — silently dropping the row — while DuckDB's
    * list_filter would keep the partial norm; the `x IS NULL` leg
    * below makes the drop explicit and mirrored in the oracle). */
  def ksNormDrift(emb: DataFrame, bucketMicro: Long = 10000L): DataFrame =
    ksFromHist(normHist(emb, bucketMicro))
      .select(col("source").as("label"), col("n_docs").as("n_vecs"),
        col("ks_micro"), col("ks_at_len").as("ks_at_bucket"))

  /** The bucketed micro-norm histogram both vector-side drift
    * readings share — (source, len, n) with `len` the floor-bucketed
    * norm in bucketMicro units; degenerate vectors excluded as
    * documented on [[ksNormDrift]]. */
  private def normHist(emb: DataFrame, bucketMicro: Long): DataFrame = {
    require(bucketMicro >= 1)
    emb
      .select(col("label"), toDoubleArray(col("embedding")).as("e"))
      .filter(size(col("e")) > 0 &&
        !exists(col("e"), x => x.isNull || isnan(x) ||
          x === Double.PositiveInfinity || x === Double.NegativeInfinity))
      .select(col("label").as("source"),
        round(l2norm(col("e")) * lit(1000000.0d)).cast("long").as("nm"))
      .select(col("source"), expr(s"nm div $bucketMicro").as("len"))
      .groupBy("source", "len").agg(count(lit(1)).as("n"))
  }

  /** Per-label embedding-norm PSI — [[psiDrift]]'s integral reading
    * on the vector side, completing the drift panel's 2×2 (sharp KS
    * vs broad PSI × doc-length vs embedding-norm): an encoder
    * rollout that slightly widens the whole norm distribution of one
    * label never produces a large single ECDF gap, but every bucket's
    * (p_s − p_r)·ln(p_s/p_r) term accumulates. Rides the SAME
    * [[normHist]] scan as ks_norm_drift; buckets (bucketMicro
    * micro-norm units) are re-binned by binWidth so the PSI grid
    * stays coarse (|bins| ≤ max_norm/(bucketMicro·binWidth)) even
    * where the KS reading keeps full bucket resolution for its
    * argmax. psi_top_bucket is the argmax bin's low edge in BUCKET
    * units (multiply by bucketMicro for micro-norms). */
  def psiNormDrift(emb: DataFrame, bucketMicro: Long = 10000L,
                   binWidth: Long = 10L): DataFrame =
    psiFromHist(normHist(emb, bucketMicro), binWidth)
      .select(col("source").as("label"), col("n_docs").as("n_vecs"),
        col("psi_micro"), col("psi_top_len").as("psi_top_bucket"))

  def psiNormDriftQuery(spark: SparkSession, dir: String): DataFrame =
    psiNormDrift(Tables.embeddings(spark, dir)).orderBy(col("label"))

  def ksNormDriftQuery(spark: SparkSession, dir: String): DataFrame =
    ksNormDrift(Tables.embeddings(spark, dir)).orderBy(col("label"))

  /** Per-source POPULATION STABILITY INDEX on the binned doc-length
    * distribution, one-vs-rest — the magnitude companion to
    * [[ksDrift]]: KS reports the worst single point of ECDF
    * divergence (sharp, localized shifts — truncation at one length),
    * PSI integrates (p_s − p_r)·ln(p_s/p_r) over ALL bins, so a
    * broad, low-amplitude reshaping that never produces a large KS
    * gap still accumulates PSI (the industry monitoring convention:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 act — here in micro
    * units, 100 000 and 250 000).
    *
    * Exactness: the same fixed-point micro-nat discipline as
    * dsir_importance's λ weights — each bin's term is computed in
    * DOUBLE with the four ln terms in a FIXED left-to-right order and
    * the two smoothed ratios as single IEEE divisions, rounded ONCE
    * per (source, bin) to integer micro-nats; the per-source PSI is
    * then an exact integer sum, and the argmax bin (psi_top_len — the
    * length band driving the drift, ties to the smallest bin) is a
    * deterministic integer/rank compare. Zero bins are add-1 smoothed
    * against B = |observed bins| (PSI's standard ε, in the corpus's
    * own units), so ln never sees 0 and a bin one side lacks still
    * contributes.
    *
    * Scale shape: rides [[lengthHist]]'s ONE map-side-combined corpus
    * scan; everything downstream is model-sized (|sources|·|bins|
    * with |bins| ≤ max_len/binWidth by construction — binning is what
    * keeps the grid bounded when distinct lengths grow with the
    * corpus), the only window is the per-source argmax rank over
    * |bins| rows, and the scalar totals cross as 1-row broadcasts.
    * Nothing corpus-sized shuffles; no int64 guard is needed because
    * nothing scales counts — the ln/ratio terms are doubles of plain
    * counts and the summed micro terms are ≤ |bins|·ln(N)·10⁶. */
  def psiDrift(docs: DataFrame, binWidth: Long = 8L): DataFrame =
    psiFromHist(lengthHist(docs), binWidth)

  /** The model-sized PSI reading tail over a (source, len, n)
    * histogram frame — shared by the batch operator and the live
    * streaming state (streaming.KsGateStream.psiReading reads it off
    * the SAME complete-mode histogram the KS gate maintains: one
    * streamed state, two drift verdicts). */
  def psiFromHist(hist: DataFrame, binWidth: Long = 8L): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val h = hist
      .select(col("source"), expr(s"len div $binWidth").as("bin"), col("n"))
      .groupBy("source", "bin").agg(sum(col("n")).as("n"))
      .localCheckpoint()
    val grid = h.select(col("bin")).distinct()
    val nb = grid.agg(count(lit(1)).as("n_bins"))
    val srcs = h.groupBy("source").agg(sum(col("n")).as("n_docs"))
    val tot = srcs.agg(sum(col("n_docs")).as("n_total"))
    val btot = h.groupBy("bin").agg(sum(col("n")).as("n_bin_all"))
    val full = grid.crossJoin(srcs.select("source"))
      .join(h, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"), coalesce(col("n"), lit(0L)).as("n"))
    val terms = full.join(btot, "bin").join(srcs, "source")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
      .filter(col("n_docs") < col("n_total"))
      .withColumn("ns", col("n") + 1)
      .withColumn("ds", col("n_docs") + col("n_bins"))
      .withColumn("nr", col("n_bin_all") - col("n") + 1)
      .withColumn("dr", col("n_total") - col("n_docs") + col("n_bins"))
      .select(col("source"), col("bin"), col("n_docs"),
        round(((col("ns").cast("double") / col("ds").cast("double")
          - col("nr").cast("double") / col("dr").cast("double"))
          * (log(col("ns").cast("double")) - log(col("ds").cast("double"))
            - log(col("nr").cast("double")) + log(col("dr").cast("double"))))
          * lit(1000000.0d)).cast("long").as("term_micro"))
      .localCheckpoint()
    val psi = terms.groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"),
        sum(col("term_micro")).as("psi_micro"))
    val top = terms
      .withColumn("rn", row_number().over(
        W.partitionBy("source").orderBy(col("term_micro").desc, col("bin"))))
      .filter(col("rn") === 1)
      .select(col("source"), (col("bin") * lit(binWidth)).as("psi_top_len"))
    psi.join(top, "source")
      .select("source", "n_docs", "psi_micro", "psi_top_len")
  }

  def psiDriftQuery(spark: SparkSession, dir: String): DataFrame =
    psiDrift(Tables.documents(spark, dir)).orderBy(col("source"))

  /** The KS chain from an `h(source, len, n)` histogram CTE down to
    * the ranked per-source verdict rows (`r`) — shared by the
    * ks_drift and ks_norm_drift oracles; the caller supplies the
    * histogram head and the final SELECT. */
  private val ksOracleChain: String =
    """grid AS (SELECT DISTINCT len FROM h),
      |srcs AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs
      |         FROM h GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM srcs),
      |filled AS (
      | SELECT s.source, g.len, COALESCE(h.n, 0) AS n
      | FROM grid g CROSS JOIN srcs s
      |  LEFT JOIN h ON h.source = s.source AND h.len = g.len),
      |cs AS (
      | SELECT source, len,
      |  CAST(sum(n) OVER (PARTITION BY source ORDER BY len) AS BIGINT)
      |   AS c_s
      | FROM filled),
      |ca AS (
      | SELECT source, len, c_s,
      |  CAST(sum(c_s) OVER (PARTITION BY len) AS BIGINT) AS c_all
      | FROM cs),
      |d AS (
      | SELECT ca.source, ca.len, s.n_docs,
      |  abs((1000000 * ca.c_s) // s.n_docs
      |   - (1000000 * (ca.c_all - ca.c_s)) // (t.n_total - s.n_docs))
      |   AS diff
      | FROM ca JOIN srcs s USING (source) CROSS JOIN tot t
      | WHERE s.n_docs < t.n_total),
      |r AS (
      | SELECT source, n_docs, len, diff,
      |  row_number() OVER (PARTITION BY source
      |                     ORDER BY diff DESC, len) AS rn
      | FROM d)""".stripMargin

  // the three drift oracles are vals (not inline map entries) because
  // corpus_card's oracle COMPOSES them as subqueries — the card's
  // drift panel must read through the exact same SQL as the
  // standalone gates
  // the PSI term mirrors the Spark side operation-for-operation: two
  // smoothed ratios as single DOUBLE divisions, four ln terms in the
  // same left-to-right order, one multiply, one 10^6 scale, ONE
  // round. The chain runs from an `h(source, len, n)` histogram CTE
  // down to the per-source verdict frame `pr` — shared by psi_drift
  // and psi_norm_drift and composed by corpus_card's panel.
  private def psiOracleChain(binWidth: Long): String =
    s"""hb AS (SELECT source, len // $binWidth AS bin,
       |       CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY 1, 2),
       |grid AS (SELECT DISTINCT bin FROM hb),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bins FROM grid),
       |srcs AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs
       |         FROM hb GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM srcs),
       |btot AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n_bin_all
       |         FROM hb GROUP BY 1),
       |filled AS (
       | SELECT s.source, g.bin, COALESCE(hb.n, 0) AS n
       | FROM grid g CROSS JOIN srcs s
       |  LEFT JOIN hb ON hb.source = s.source AND hb.bin = g.bin),
       |terms AS (
       | SELECT f.source, f.bin, s.n_docs,
       |  CAST(round(((CAST(f.n + 1 AS DOUBLE)
       |      / CAST(s.n_docs + nb.n_bins AS DOUBLE)
       |    - CAST(b.n_bin_all - f.n + 1 AS DOUBLE)
       |      / CAST(t.n_total - s.n_docs + nb.n_bins AS DOUBLE))
       |   * (ln(f.n + 1) - ln(s.n_docs + nb.n_bins)
       |    - ln(b.n_bin_all - f.n + 1)
       |    + ln(t.n_total - s.n_docs + nb.n_bins)))
       |   * 1000000.0) AS BIGINT) AS term_micro
       | FROM filled f JOIN btot b USING (bin) JOIN srcs s USING (source)
       |  CROSS JOIN tot t CROSS JOIN nb
       | WHERE s.n_docs < t.n_total),
       |psi AS (
       | SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(term_micro) AS BIGINT) AS psi_micro
       | FROM terms GROUP BY 1),
       |top AS (
       | SELECT source, bin FROM (
       |  SELECT source, bin, row_number() OVER (PARTITION BY source
       |    ORDER BY term_micro DESC, bin) AS rn FROM terms) WHERE rn = 1),
       |pr AS (
       | SELECT p.source, p.n_docs, p.psi_micro,
       |  CAST(top.bin * $binWidth AS BIGINT) AS psi_top_len
       | FROM psi p JOIN top USING (source))""".stripMargin

  private val psiDriftOracle: String =
    s"""WITH lens AS (
       | SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
       | FROM documents),
       |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS n
       |      FROM lens GROUP BY 1, 2),
       |${psiOracleChain(8)}
       |SELECT source, n_docs, psi_micro, psi_top_len
       |FROM pr ORDER BY source""".stripMargin

  // the same chain over ks_norm_drift's bucketed micro-norm
  // histogram, re-binned 10 buckets per PSI bin
  private val psiNormDriftOracle: String =
    s"""WITH f AS (
       | SELECT label AS source,
       |  CAST(round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
       |    x -> x * x))) * 1000000.0) AS BIGINT) // 10000 AS len
       | FROM embeddings
       | WHERE len(embedding) > 0
       |  AND len(list_filter(embedding::DOUBLE[],
       |   x -> x IS NULL OR isnan(x) OR isinf(x))) = 0),
       |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS n
       |      FROM f GROUP BY 1, 2),
       |${psiOracleChain(10)}
       |SELECT source AS label, n_docs AS n_vecs, psi_micro,
       | psi_top_len AS psi_top_bucket
       |FROM pr ORDER BY label""".stripMargin

  private val ksDriftOracle: String =
    s"""WITH lens AS (
       | SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
       | FROM documents),
       |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS n
       |      FROM lens GROUP BY 1, 2),
       |$ksOracleChain
       |SELECT source, n_docs, CAST(diff AS BIGINT) AS ks_micro,
       | CAST(len AS BIGINT) AS ks_at_len
       |FROM r WHERE rn = 1 ORDER BY source""".stripMargin

  // the same chain over the bucketed micro-norm histogram; the norm
  // fold/rounding is embed_norm_qc's parity-pinned idiom verbatim
  private val ksNormDriftOracle: String =
    s"""WITH f AS (
       | SELECT label AS source,
       |  CAST(round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
       |    x -> x * x))) * 1000000.0) AS BIGINT) // 10000 AS len
       | FROM embeddings
       | WHERE len(embedding) > 0
       |  AND len(list_filter(embedding::DOUBLE[],
       |   x -> x IS NULL OR isnan(x) OR isinf(x))) = 0),
       |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS n
       |      FROM f GROUP BY 1, 2),
       |$ksOracleChain
       |SELECT source AS label, n_docs AS n_vecs,
       | CAST(diff AS BIGINT) AS ks_micro,
       | CAST(len AS BIGINT) AS ks_at_bucket
       |FROM r WHERE rn = 1 ORDER BY label""".stripMargin

  private val centroidDriftOracle: String =
    """WITH q AS (
      | SELECT label, unnest(range(1, len(embedding) + 1)) AS i,
      |        embedding::DOUBLE[] AS e
      | FROM embeddings),
      |qm AS (
      | SELECT label, i - 1 AS dim,
      |        CAST(round(e[i] * 1000000.0) AS BIGINT) AS xm
      | FROM q),
      |cent AS (
      | SELECT label, dim, CAST(sum(xm) AS HUGEINT) AS c
      | FROM qm GROUP BY 1, 2),
      |sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS n
      |          FROM embeddings GROUP BY 1),
      |norms AS (SELECT label, sum(c * c) AS n2 FROM cent GROUP BY 1),
      |dots AS (
      | SELECT a.label AS label_a, b.label AS label_b, sum(a.c * b.c) AS dot
      | FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      | GROUP BY 1, 2)
      |SELECT d.label_a, d.label_b, sa.n AS n_a, sb.n AS n_b,
      |  CAST(round(CAST(d.dot AS DOUBLE)
      |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
      |    * 1000000.0) AS BIGINT) AS cos_micro
      |FROM dots d
      | JOIN norms na ON d.label_a = na.label
      | JOIN norms nb ON d.label_b = nb.label
      | JOIN sizes sa ON d.label_a = sa.label
      | JOIN sizes sb ON d.label_b = sb.label
      |ORDER BY label_a, label_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "ks_drift" -> ksDriftOracle,
    "psi_drift" -> psiDriftOracle,
    "psi_norm_drift" -> psiNormDriftOracle,
    "ks_norm_drift" -> ksNormDriftOracle,
    "meta_consistency" ->
      """WITH b AS (
        | SELECT source,
        |  (n_chars IS NULL OR text IS NULL
        |   OR n_chars <> length(text)) AS bad
        | FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |  (10000 * CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS mismatch_bp
        |FROM b GROUP BY source ORDER BY source""".stripMargin,
    "source_jaccard" ->
      """WITH toks AS (
        | SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        | SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 3
        |   THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE [] END) AS s
        | FROM toks),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
        |          FROM sh GROUP BY 1),
        |inter AS (
        | SELECT a.source AS source_a, b.source AS source_b,
        |        CAST(count(*) AS BIGINT) AS inter
        | FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        | GROUP BY 1, 2)
        |SELECT i.source_a, i.source_b, i.inter,
        |  sa.sz AS size_a, sb.sz AS size_b,
        |  10000 * i.inter // (sa.sz + sb.sz - i.inter) AS jaccard_bp
        |FROM inter i
        | JOIN sizes sa ON i.source_a = sa.source
        | JOIN sizes sb ON i.source_b = sb.source
        |ORDER BY source_a, source_b""".stripMargin,

    // drift's micro-component state reused: per-vector dot against
    // the own-label centroid, HUGEINT products, rounded display flag
    "embed_centroid_outliers" ->
      """WITH q AS (
        | SELECT vec_id, label, unnest(range(1, len(embedding) + 1)) AS i,
        |        embedding::DOUBLE[] AS e
        | FROM embeddings),
        |qm AS (
        | SELECT vec_id, label, i - 1 AS dim,
        |        CAST(round(e[i] * 1000000.0) AS BIGINT) AS xm
        | FROM q),
        |cent AS (
        | SELECT label, dim, CAST(sum(xm) AS HUGEINT) AS c
        | FROM qm GROUP BY 1, 2),
        |nc2 AS (SELECT label, sum(c * c) AS nc2 FROM cent GROUP BY 1),
        |per AS (
        | SELECT qm.vec_id, qm.label,
        |  sum(CAST(qm.xm AS HUGEINT) * cent.c) AS dot,
        |  sum(CAST(qm.xm AS HUGEINT) * qm.xm) AS nv2
        | FROM qm JOIN cent ON qm.label = cent.label AND qm.dim = cent.dim
        | GROUP BY 1, 2)
        |SELECT p.vec_id, p.label,
        |  CAST(round(CAST(p.dot AS DOUBLE)
        |    / (sqrt(CAST(p.nv2 AS DOUBLE)) * sqrt(CAST(n.nc2 AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) AS cosc_micro,
        |  CAST(round(CAST(p.dot AS DOUBLE)
        |    / (sqrt(CAST(p.nv2 AS DOUBLE)) * sqrt(CAST(n.nc2 AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) < 0 AS outlier
        |FROM per p JOIN nc2 n ON p.label = n.label
        |ORDER BY vec_id""".stripMargin,

    "heaps_fit" ->
      """WITH pd AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
        | FROM documents),
        |mx AS (SELECT max(doc_id) AS mx FROM pd),
        |nj AS (
        | SELECT (doc_id * 20) // (mx + 1) + 1 AS j,
        |        CAST(sum(nw) AS BIGINT) AS s
        | FROM pd, mx GROUP BY 1),
        |fd AS (
        | SELECT t, min(doc_id) AS fdoc FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents) GROUP BY 1),
        |vb AS (
        | SELECT (fdoc * 20) // (mx + 1) + 1 AS j,
        |        CAST(count(*) AS BIGINT) AS c
        | FROM fd, mx GROUP BY 1),
        |cum AS (
        | SELECT nj.j, sum(nj.s) OVER (ORDER BY nj.j) AS nn,
        |        sum(coalesce(vb.c, 0)) OVER (ORDER BY nj.j) AS v
        | FROM nj LEFT JOIN vb ON nj.j = vb.j),
        |xy AS (
        | SELECT CAST(round(ln(nn) * 1000000.0) AS BIGINT) AS x,
        |        CAST(round(ln(v) * 1000000.0) AS BIGINT) AS y
        | FROM cum WHERE v >= 1),
        |s AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx
        | FROM xy)
        |SELECT n AS n_points,
        | CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
        |   / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT)
        |  AS beta_micro,
        | CAST(round((CAST(sy AS DOUBLE)
        |   - CAST(n * sxy - sx * sy AS DOUBLE)
        |     / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |   / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_micro
        |FROM s""".stripMargin,

    // the drift-panel rows (r17 verdict #7) read through the
    // standalone gates' oracle SQL verbatim, each wrapped as a
    // 1-row verdict subquery — batch card and individual gates
    // CANNOT drift apart
    "corpus_card" ->
      s"""WITH pd AS (
         | SELECT md5(text) AS h,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         |  CAST(length(text) AS BIGINT) AS nc,
         |  source, lang,
         |  CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 1000
         |        AND round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
         |                  AS DOUBLE) / length(text), 4) > 0.5
         |       THEN 1 ELSE 0 END AS keep
         | FROM documents),
         |b AS (
         | SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(nw) AS BIGINT) AS n_tokens,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(sum(keep) AS BIGINT) AS n_quality_keep
         | FROM pd),
         |v AS (
         | SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_token_types FROM (
         |  SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         |kd AS (SELECT max(ks_micro) AS ks_len_max
         |       FROM ($ksDriftOracle)),
         |pld AS (SELECT max(psi_micro) AS psi_len_max
         |        FROM ($psiDriftOracle)),
         |knd AS (SELECT max(ks_micro) AS ks_norm_max
         |        FROM ($ksNormDriftOracle)),
         |pnd AS (SELECT max(psi_micro) AS psi_norm_max
         |        FROM ($psiNormDriftOracle)),
         |klp AS (SELECT CAST(sum(kl_contrib_micro) AS BIGINT) AS kl_sum,
         |  CAST(sum(CASE WHEN driver THEN 1 ELSE 0 END) AS BIGINT)
         |    AS kl_drivers
         | FROM (${QualityModels.oracles("vocab_kl_drift")})),
         |cdp AS (SELECT min(cos_micro) AS cent_min_cos
         |        FROM ($centroidDriftOracle))
         |SELECT metric, value FROM b, v, kd, pld, knd, pnd, klp, cdp,
         | LATERAL (VALUES
         | ('n_docs', n_docs),
         | ('n_distinct_texts', n_distinct_texts),
         | ('exact_dup_docs', n_docs - n_distinct_texts),
         | ('n_sources', n_sources),
         | ('n_langs', n_langs),
         | ('n_tokens', n_tokens),
         | ('n_chars', n_chars),
         | ('n_token_types', n_token_types),
         | ('mean_doc_tokens_milli', (1000 * n_tokens) // n_docs),
         | ('quality_keep_bp', (10000 * n_quality_keep) // n_docs),
         | ('drift_ks_len_max_micro', ks_len_max),
         | ('drift_psi_len_max_micro', psi_len_max),
         | ('drift_ks_norm_max_micro', ks_norm_max),
         | ('drift_psi_norm_max_micro', psi_norm_max),
         | ('drift_vocab_kl_sum_micro', kl_sum),
         | ('drift_vocab_kl_driver_types', kl_drivers),
         | ('drift_centroid_min_cos_micro', cent_min_cos)
         |) t(metric, value)
         |ORDER BY metric""".stripMargin,

    // same once-rounded micro-nat coordinates; slope/intercept are the
    // two display floats from exact integer sums in pinned order
    "zipf_fit" ->
      """WITH tok AS (
        | SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |cnts AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt
        |         FROM tok GROUP BY 1),
        |top AS (
        | SELECT t, cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rnk
        | FROM cnts ORDER BY cnt DESC, t LIMIT 100),
        |xy AS (
        | SELECT CAST(round(ln(rnk) * 1000000.0) AS BIGINT) AS x,
        |        CAST(round(ln(cnt) * 1000000.0) AS BIGINT) AS y
        | FROM top),
        |s AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx
        | FROM xy)
        |SELECT n AS n_fit,
        | CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
        |   / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT)
        |  AS slope_micro,
        | CAST(round((CAST(sy AS DOUBLE)
        |   - CAST(n * sxy - sx * sy AS DOUBLE)
        |     / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |   / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_micro
        |FROM s""".stripMargin,

    "doc_novelty" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ss AS (
        | SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) >= 3
        |   THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE [] END) AS s
        | FROM toks),
        |dfv AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM ss GROUP BY 1)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  (10000 * CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS novelty_bp,
        |  (1000 * CAST(sum(df) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS mean_df_milli
        |FROM ss JOIN dfv USING (s)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "tokenizer_fertility" ->
      """WITH f AS (
        | SELECT lang,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |   AS BIGINT) AS re_tokens
        | FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(ws_tokens) AS BIGINT) AS ws_tokens,
        |  CAST(sum(re_tokens) AS BIGINT) AS re_tokens,
        |  (1000 * CAST(sum(re_tokens) AS BIGINT))
        |    // CAST(sum(ws_tokens) AS BIGINT) AS fertility_milli,
        |  (1000 * CAST(sum(n_chars) AS BIGINT))
        |    // CAST(sum(re_tokens) AS BIGINT) AS chars_per_tok_milli
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // top-V vocab (count desc, token asc — the boundary tie rule),
    // per-doc OOV fold against the vocab LIST
    "vocab_coverage" ->
      """WITH tk AS (
        | SELECT t, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        | WHERE t <> '' GROUP BY t),
        |vocab AS MATERIALIZED (
        | SELECT t FROM (
        |  SELECT t, row_number() OVER (ORDER BY cnt DESC, t) AS rn FROM tk)
        | WHERE rn <= 500),
        |vl AS (SELECT list(t) AS vs FROM vocab),
        |per AS (
        | SELECT d.doc_id,
        |  len(list_filter(string_split(d.text, ' '),
        |      x -> x <> '')) AS n_tok,
        |  len(list_filter(string_split(d.text, ' '),
        |      x -> x <> '' AND NOT list_contains(vl.vs, x))) AS oov
        | FROM documents d CROSS JOIN vl)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        | CAST(oov AS BIGINT) AS oov,
        | (10000 * CAST(oov AS BIGINT))
        |   // greatest(CAST(n_tok AS BIGINT), 1) AS oov_bp
        |FROM per ORDER BY doc_id""".stripMargin,

    // the same once-rounded micro components, HUGEINT sums/products,
    // and the display-only IEEE sqrt tail
    "embed_centroid_drift" -> centroidDriftOracle)
}
