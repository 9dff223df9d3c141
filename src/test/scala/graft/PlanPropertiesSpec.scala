package graft

/** Plan-shape regression gate: scale-killer operators must never
  * reappear in any registered query's physical plan. PLANS.md is the
  * reviewable artifact; THIS is the enforcement — reintroducing an
  * all-pairs nested loop (round 2's embed_cosine_neardup bug) fails CI
  * instead of waiting for a human to read the audit.
  */
class PlanPropertiesSpec extends SparkSpec {

  /** Queries allowed a BroadcastNestedLoopJoin because the BROADCAST
    * side is bounded BY CONSTRUCTION (a fixed query set / centroid
    * table — model-sized, independent of corpus scale), which is the
    * one legitimate use. Everything else must candidate-generate via
    * keyed equi-joins. */
  private val boundedBroadcastOk = Set("ann_cosine_topk", "ann_ivf_topk",
    "ann_int8_topk",
    // bounded query-side broadcast (fixed query set), band filter
    // applied in-scan — same legitimate shape as ann_cosine_topk
    "ann_hard_negatives",
    // bounded-query broadcast scan scoring every dim tier in-row
    // (ann_cosine_topk's shape; one corpus pass serves all tiers)
    "ann_matryoshka_recall",
    // query-side cell assignment crosses the bounded query set with
    // the model-sized centroid table; index probing is an equi-join
    // on cell — same bounded shape as ann_ivf_topk
    "ann_ivf_from_index",
    // stage-1 shortlist pass: same bounded query-side broadcast as
    // ann_int8_topk; stage 2 is equi-joins only
    "ann_rerank_topk",
    // cell-assignment pass crosses each vector with the model-sized
    // centroid table (same bounded shape as ann_ivf_topk); the
    // shortlist and rerank stages are keyed equi-joins
    "ann_ivf_rerank_topk",
    // the IVF+PQ serving stack: ann_ivf_topk's centroid cross +
    // ann_pq_topk's bounded query x model-sized codebook table; the
    // ADC scan and rerank are keyed equi-joins
    "ann_ivf_pq_topk",
    // the same serving stack with BOTH model tables trained — the
    // trainers' own crossJoins broadcast model-sized frames only
    "ann_ivf_pq_trained",
    // residual IVFADC: the centroid cross (assignment) + the bounded
    // query x model-sized xhat table; encoding and ADC scoring are
    // (cell, sub, cid)-keyed equi-joins
    "ann_ivf_pq_residual",
    // the raw-vs-residual recall eval composing the two shapes above
    // over one candidate set + the 1-row held-out-count scalar
    "pq_residual_recall",
    // the rerank-budget curve: same residual-ADC shape over one
    // candidate set, plus the 1-row held-out-count scalar
    "rerank_budget_recall",
    // the fully-trained residual compose (trained-centroid cross +
    // the residual-Lloyd model frames, all model-sized broadcasts)
    // and its seeded-vs-trained recall eval
    "ann_ivf_pq_residual_trained", "pq_residual_trained_recall",
    // the stored-index read path: bounded probe/model broadcasts, the
    // candidate join is the cell equi-join against the index — and
    // its int4-packed storage variant (unpack is a map-only bit
    // expression in the index scan)
    "ann_ivf_pq_residual_index", "ann_ivf_pq_residual_int4",
    // benchmark embedding set — model-sized by construction
    "embed_decontam",
    // per-language threshold frame (|langs| rows) + its scalar max
    "temperature_sample",
    // scalar corpus-count frame (exactly ONE row) broadcast onto the
    // shingle-df aggregate for the df_ratio column
    "ngram_stats",
    // scalar aggregate frames (exactly ONE row by construction — a
    // global count / threshold), broadcast back onto the probe side
    "source_stats", "q22_global_sales", "q11_important_parts",
    "q15_top_supplier",
    // 1-row (min_day, max_day) bounds frame crossed into the user grid
    "gap_fill_daily",
    // 1-row (N, sumdl) corpus-stats frame crossed into the scorer
    "bm25_topk",
    // 1-row (v, vv) top-component frame crossed into the map-only
    // per-vector projection (the power iteration's own 1-row crosses
    // sit behind localCheckpoints and never reach a final plan)
    "embed_all_but_top",
    // the postprocessed-vs-original recall eval: two bounded
    // query-side broadcasts (ann_cosine_topk's shape) over the
    // projected and raw tables + the 1-row model frame above
    "ann_abt_recall",
    // 1-row vocab-total scalar (Σcnt for the cost re-fit) crossed onto
    // the model-sized vocab frame; the E-step's candidate generation
    // is the broadcast vocab EQUI-join, and the per-round crosses sit
    // behind localCheckpoints
    "unigram_lm_train_dist",
    // 1-row vocab-map frame (the broadcast unigram model) crossed into
    // the map-only doc scan
    "lm_surprisal",
    // the same 1-row unigram model cross on the scoring leg; the
    // tercile thresholds themselves join by lang (broadcast equi)
    "ppl_buckets",
    // the same 1-row model (train-split vocab map + unk scalar)
    // crossed into the split-tagged doc scan
    "lm_heldout_eval",
    // 1-row top-V vocab-set map (lm_surprisal's shape) crossed into
    // the map-only per-doc OOV fold
    "vocab_coverage",
    // 1-row (min, max) probability-bounds scalar crossed back for the
    // range-normalized reliability bins
    "quality_calibration",
    // the same bin chain; PAV runs driver-side on the collected
    // ≤10-row bin table and ships back as a literal frame
    "quality_calibrated",
    // same shape one order up: 1-row bigram-map model + the 1-row
    // distinct-unigram-count (V) scalar crossed into the model build
    "bigram_surprisal",
    // the backoff variant: the same 1-row (N, V) totals scalar crossed
    // into the model build / the scored bigram stream
    "bigram_surprisal_kn", "lm_heldout_bigram",
    // one order up: the same 1-row (B) and (V) scalar frames crossed
    // into the model build / the scored trigram stream — the model
    // itself joins by key (vocab³-bounded, deliberately NOT broadcast)
    "trigram_surprisal_kn", "lm_heldout_trigram",
    // order 4 (count-pruned): the same two scalar crosses; both the
    // quadgram and trigram model tables join by key (the quadgram
    // table is exactly what must never broadcast — pruning exists to
    // keep it storable, not to make it broadcastable)
    "quadgram_surprisal_kn", "lm_heldout_quadgram", "kn_prune_curve",
    // order 5 (count-pruned, both top orders): the same two scalar
    // crosses; the fivegram/quadgram/trigram model tables all join by
    // key — the fivegram table is the most explosive frame in the repo
    "fivegram_surprisal_kn", "lm_heldout_fivegram",
    // composes trigram_surprisal_kn (same scalar crosses); the
    // histogram itself is one keyed aggregate
    "ppl_histogram",
    // two 1-row direction frames (v1, v2 with their norms) crossed
    // into the map-only double projection
    "embed_all_but_top2",
    // 1-row totals frame (tot_base, tot_new, V) crossed onto the
    // vocab-sized counts frame
    "vocab_kl_drift",
    // the length-value grid × the source list — BOTH model-sized
    // aggregates of the checkpointed histogram — plus the 1-row
    // corpus-total scalar (ks_norm_drift: the same shape over the
    // bucket-value grid × label list)
    "ks_drift", "ks_norm_drift",
    // 1-row occurrence-totals frame + the numBuckets-row model
    // collapsed to ONE map row, crossed into the map-only doc scorer
    "dsir_importance",
    // 1-row (N, sumdl) corpus-stats frame (bm25_topk's shape) on the
    // sparse leg; the dense leg is the bounded query broadcast
    "hybrid_rrf_topk",
    // nearest-centroid assignment crosses vectors with the model-sized
    // centroid table (ann_ivf_topk's shape); intra-cell pairing is an
    // equi-join on cell
    "semdedup",
    // 1-row corpus-count scalar (N for idf) crossed onto the
    // vocab-sized df frame; pairing is the term-keyed equi-join
    "tfidf_cosine_pairs",
    // 1-row broadcast query + 1-row newest-pick frames; the greedy
    // rounds run on the bounded top-nCand shortlist only
    "mmr_diversify",
    // 1-row node-count scalar crossed onto the node frame each
    // iteration; rank propagation itself is the src/dst equi-join
    "event_pagerank",
    // ADC table build crosses the bounded query set with the
    // model-sized codebook (numSub·numCodes rows); encoding and
    // scoring are (sub, cid)-keyed equi-joins
    "ann_pq_topk",
    // the same bounded ADC shape served from TRAINED codebooks (the
    // Lloyd loop itself is sub-keyed equi-joins + groupBys), and the
    // default-vs-trained recall eval running it twice
    "ann_pq_trained", "pq_train_recall",
    // the int4-packed storage path (same bounded ADC-table cross;
    // pack/unpack are map-only bit expressions) and the equal-bytes
    // recall eval running the two shapes side by side
    "ann_pq_int4_topk", "pq_int4_recall",
    // cluster-mixture front end: the trainer's and the assignment's
    // crosses broadcast the model-sized centroid table only; the
    // docs join and collapse are doc_id equi-join + groupBy
    "mixture_plan_clusters",
    // 1-row doc-count scalar crossed onto the vocab-sized pair-rate
    // filter; wedge/closure hops are keyed equi-joins
    "token_triangles",
    // 1-row count frames (n_cand / n_found / n_true scalars) crossed
    // into the |bandings|-row summary; candidates come from the band
    // equi-join, truth from the prefix-filtered equi-join path
    "lsh_recall_eval",
    // composes the already-allowed bounded shapes (ann_cosine_topk +
    // ann_ivf_topk per nProbe); the hit join is keyed, the summary
    // aggregates are per-(nProbe, query)
    "ann_recall_eval",
    // ann_ivf_topk's bounded centroid-cross shape with TRAINED
    // centroids — the per-iteration training crossJoin broadcasts the
    // model-sized centroid frame only
    "ann_ivf_topk_trained",
    // the recall eval's composed shapes over both centroid tables
    "ann_recall_trained",
    // cell assignment/probing cross the corpus with the MODEL-sized
    // centroid table (ann_ivf_topk's shape, Q = corpus); candidate
    // generation is the (cell, blk) equi-join, mutuality a keyed
    // edge-frame self-join
    "knn_graph",
    // inherits knn_graph's bounded centroid-cross shape; the mutual
    // filter and CC rounds are keyed equi-joins on the edge frame
    "knn_graph_clusters",
    // same bounded shape; NN-Descent expansion and rescore are keyed
    // equi-joins over the n·k edge frame
    "knn_graph_refine",
    // composes the above plus the 1-row n_vec scalar cross
    "knn_refine_recall",
    // per-edge 1-row count scalars (n_rows/n_null × n_orphans)
    // crossed into the |edges|-row report; orphan detection itself is
    // a keyed left-anti join
    "fk_integrity",
    // ONE-row broadcast weight model crossed into the map-only scorer
    "quality_logreg",
    // 1-row V scalar + the one-row per-language trigram-map model and
    // floor frames crossed into the map-only classifier
    "lang_id_ngram",
    // 1-row aggregate frames crossed into the tall card: global stats
    // × vocab count for the base rows, plus the drift panel's four
    // 1-row gate verdicts (each a model-sized gate output collapsed
    // to one row) and the gates' own 1-row scalar crosses (ks_drift /
    // ks_norm_drift / vocab_kl_drift shapes, allowed above)
    "corpus_card",
    // the |taus|-row threshold frame theta-joins (jac_bp >= tau_bp)
    // the bounded basis-point histogram — both sides model-sized
    "tau_sweep",
    // inherits quality_logreg's ONE-row weight-model cross-join on the
    // scoring leg; the U computation itself is histogram aggregates
    "score_auc_eval",
    // the same shape with the TRAINED one-row weight frame (training
    // itself aggregates with weights as plan literals — no join)
    "score_auc_trained",
    // the 1-row max-doc-id scalar crossed into both bucket assignments
    "heaps_fit")

  test("every query's parquet scan count stays within its recorded budget") {
    // The r11 round's two biggest perf wins (token_triangles edge
    // checkpoint, lsh_recall_eval checkpoints) were replicated-subtree
    // blowups found by HUMAN plan reading — a reused frame without a
    // checkpoint silently re-scans the corpus once per reference. This
    // pins each query's "Scan parquet" count to the recorded budget, so
    // the next reuse-without-checkpoint regression fails CI with the
    // query name instead of waiting for an audit. Counting goes through
    // totalScanCount (r13): a QueryExecutionListener accumulates scans
    // over every execution CONSTRUCTION triggers, so the trainer /
    // fixpoint loops whose localCheckpoints leave a scan-free final
    // plan (budget 0 through r12 — unenforceable) are now gated on
    // their real per-build scan totals. Regenerate budgets after a
    // DELIBERATE shape change: sbt "Test/runMain graft.ScanBudgetGen".
    val dir = "/root/testdata/sf0.001"
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/scan_budgets.txt"))
    val budgets = try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(n, c) = l.split(" "); n -> c.toInt
    }.toMap finally src.close()
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> ScanBudgetGen.totalScanCount(spark, fn(spark, dir))
    }
    val over = ScanBudgetGen.violations(counts, budgets)
    assert(over.isEmpty, over.mkString("\n"))
  }

  test("scan budget gate: a deliberate exceed fails naming the query") {
    val budgets = Map("ok_query" -> 2, "hot_query" -> 3)
    val over = ScanBudgetGen.violations(
      Seq("ok_query" -> 2, "hot_query" -> 7, "new_query" -> 1), budgets)
    assert(over.length === 2)
    assert(over.exists(m => m.startsWith("hot_query:") &&
      m.contains("7 scans > budget 3")))
    assert(over.exists(_.startsWith("new_query: NO BUDGET")))
    assert(ScanBudgetGen.violations(Seq("ok_query" -> 1), budgets).isEmpty,
      "a count under budget (an improvement) must not fail the gate")
  }

  test("no unbounded nested-loop or cartesian join in any registered query") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!boundedBroadcastOk(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — candidates must come " +
            "from keyed equi-joins (see PLANS.md for the expected shapes)")
      }
    }
  }

  /** Queries allowed an unpartitioned Window whose input is NOT
    * structurally bounded (no limit / literal relation below it),
    * because the windowed frame is bounded BY CONSTRUCTION — each with
    * the bound stated. Everything else must either window a
    * limit-bounded frame or partition the window. */
  private val unpartitionedWindowOk = Map(
    // cumulative (N_j, V_j) curve over the ≤ points(=20)-row bucket
    // frame — docs bucket by (doc_id·points) div (max+1)
    "heaps_fit" -> "<= points(20) threshold buckets",
    // exclusive prefix sum over the 256-row bucket-offset frame (the
    // two-phase rank's phase 1; phase 2 partitions by bucket)
    "shuffle_shards" -> "256 md5-prefix buckets",
    // running max over event_id div 1024 bucket maxima (the coarsened
    // prefix-scan; per-bucket work is partitioned)
    "out_of_order_stats" -> "event_id div 1024 bucket frame",
    // prefix sum over doc_id div 100 range totals (two-phase global
    // pack; the per-range pass partitions by range)
    "pack_token_budget_global" -> "doc_id div 100 range frame")

  test("no unpartitioned window over an unbounded frame in any registered query") {
    // The r16 verdict's second weak mark: vocab_coverage ranked the
    // ENTIRE vocabulary through one row_number() window with no
    // partitioning — a single-task global sort that a 10⁸-type
    // web-scale vocab turns into the job's bottleneck, and exactly the
    // shape zipfFit avoids with orderBy+limit (TakeOrderedAndProject).
    // The bench tail's repeated "No Partition Defined for Window
    // operation" warnings show how silently these reappear — so gate
    // the CLASS: every unpartitioned logical Window must sit over a
    // frame bounded by a limit / literal relation in-plan, or carry a
    // per-name allowlist entry stating its by-construction bound.
    import org.apache.spark.sql.catalyst.plans.logical._
    def boundedBelow(p: LogicalPlan): Boolean = p.exists {
      case _: GlobalLimit | _: LocalLimit | _: LocalRelation |
           _: OneRowRelation => true
      case _ => false
    }
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val unbounded = plan.collect {
        case w: Window if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
      }
      if (unpartitionedWindowOk.contains(name))
        assert(unbounded.nonEmpty,
          s"$name is on the unpartitioned-window allowlist but plans " +
            "none — remove the stale entry")
      else assert(unbounded.isEmpty,
        s"$name plans ${unbounded.size} unpartitioned window(s) over an " +
          "unbounded frame — a single-task global sort at scale. Bound " +
          "the input (orderBy+limit / TakeOrdered, the zipfFit " +
          "discipline), partition the window, or allowlist it with its " +
          s"by-construction bound. First offender child:\n" +
          unbounded.headOption.map(_.child.toString).getOrElse(""))
      spark.catalog.clearCache()
    }
  }

  test("minhash signature and simhash fingerprint stages are map-only (zero exchanges)") {
    // The in-row native expressions replaced full-corpus groupBy
    // exchanges (r7) — the signature/fingerprint frames must plan as
    // pure projections over the scan: any Exchange here is the
    // regression this spec exists to catch.
    import org.apache.spark.sql.functions.col
    // raw read, NOT Tables.documents — the loader's single-file fan-out
    // repartition is an intentional ingest exchange, not part of the
    // signature computation under test
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sig = operators.Dedup.docShingleSets(docs, 3)
      .select(col("doc_id"), functions.MinHashSig(col("sset"), 64).as("sig"))
    val fp = operators.Dedup.docShingleSets(docs, 3)
      .select(col("doc_id"), functions.SimHash60(col("sset")).as("fp"))
    Seq("minhash" -> sig, "simhash" -> fp).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name signature stage must be map-only, planned:\n$plan")
    }
  }

  test("dedup_ngram_jaccard computes df as an aggregate, not a shingle window") {
    // A Window partitioned by the shingle key puts every posting for a
    // hot shingle into ONE reducer partition (AQE cannot split skewed
    // window partitions). df must come from a map-side-combined
    // groupBy(s).count() + join-back. The per-doc row_number window
    // (partitioned by doc_id, bounded by doc length) is fine.
    val plan = SparkEntry.queries("dedup_ngram_jaccard")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*windowspecdefinition\\(s#\\d.*"),
      "dedup_ngram_jaccard plans a Window partitioned by the shingle key")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "expected a map-side-combined aggregate for document frequency")
  }

  test("ANN / similarity plans contain NO interpreted lambda expressions") {
    // These queries' map passes touch every corpus vector; an
    // interpreted HOF (aggregate/transform lambdafunction) there is a
    // 10-30x constant factor on the one full-corpus stage of the ANN
    // path (the round-5 `weak`). Bucket assignment is the native
    // HyperplaneBucket, cosines are the native CosineSimilarity, the
    // float→double widening is a native Cast, and the probe expansion
    // explodes a literal mask array — so the WHOLE plan must be
    // lambda-free, pinned here.
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("ann_lsh_topk", "ann_cosine_topk", "ann_ivf_topk",
        "ann_int8_topk", "embed_cosine_neardup", "embed_decontam_lsh")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("lambdafunction"),
        s"$name plans an interpreted lambda expression")
    }
  }

  test("co-partitioned localCheckpoint frames join with ZERO exchange " +
      "(the contract connectedComponents' frontier rounds rely on)") {
    // connectedComponents partitions labels/edges on their join keys
    // once and localCheckpoints them; every later round's joins must
    // reuse that partitioning (shuffling only frontier-sized frames)
    // or delta iteration silently degrades to full-frame shuffles.
    // The partitioning is only RECORDED with AQE off (an adaptive plan
    // reports UnknownPartitioning at checkpoint time), which is why
    // the fixpoint loop disables AQE around its checkpoints — pin the
    // planner behavior that decision rests on.
    import org.apache.spark.sql.functions.col
    val p = 4
    val confs = Seq("spark.sql.adaptive.enabled" -> "false",
      // a small frontier broadcasts (zero shuffle anywhere — fine);
      // the load-bearing case is a LARGE frontier, where both sides
      // must reuse the checkpointed hash partitioning
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (c, _) => c -> spark.conf.get(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val labels = spark.range(1000)
        .select(col("id").as("v"), col("id").as("l"))
        .repartition(p, col("v")).localCheckpoint()
      val delta = spark.range(10)
        .select(col("id").as("cv"), col("id").as("nl"))
        .repartition(p, col("cv")).localCheckpoint()
      val merged = labels.join(delta, col("v") === col("cv"), "left")
      merged.collect()
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"pre-partitioned checkpointed join still plans a shuffle:\n$plan")
    } finally saved.foreach { case (c, v) => spark.conf.set(c, v) }
  }

  test("relational scans push their filters into parquet") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q3_top_unshipped", "q5_region_revenue")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: ["),
        s"$name shows no parquet filter pushdown")
    }
  }

  test("merge_upserts never shuffles the base snapshot") {
    // The MERGE contract at 100 TB: touched keys broadcast into a
    // map-side left_anti on the base scan; a SortMergeJoin (or any
    // hash exchange of the base) means the whole corpus shuffles for
    // a nightly-delta-sized change set.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val delta = docs.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, lit("upsert"))
          .otherwise(lit("delete")).as("op"),
        col("text"))
    val plan = operators.Cdc.mergeUpserts(docs, delta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast left_anti, planned:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("Exchange hashpartitioning"),
      s"merge_upserts shuffles the base snapshot:\n$plan")
  }

  test("outlier_events: the fact scan is filtered in place, never exchanged") {
    // Per-type stats are a handful of grouped rows broadcast back onto
    // the fact side; the only hash exchange allowed is the one carrying
    // those partial aggregates. The fact rows themselves must flow
    // scan → broadcast join → filter with no shuffle.
    val df = operators.Timeseries.outlierEvents(
      graft.core.Tables.events(spark, "/root/testdata/sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the stats frame broadcast back, planned:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"outlier_events shuffles the fact side:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"expected exactly the stats aggregate's exchange, found $exchanges:\n$plan")
  }

  test("scd2_intervals is one exchange: the user_id window partitioning") {
    val df = operators.Cdc.scd2Intervals(
      graft.core.Tables.events(spark, "/root/testdata/sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllMatchIn(plan).length
    assert(exchanges == 1 && plan.contains("Window"),
      s"expected scan -> one hash exchange -> sort -> window, planned:\n$plan")
  }
}
