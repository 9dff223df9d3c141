package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.core.Tables
import graft.functions.{CosineSimilarity, HyperplaneBucket}
import graft.functions.TextFunctions._

/** Embedding similarity: cosine near-dup pairs, brute-force top-k ANN
  * (the correctness baseline) and a random-hyperplane-LSH bucketed ANN
  * (the 100 TB path — candidates bounded per bucket, never all-pairs).
  *
  * All cosines are sequential-fold double arithmetic (see
  * TextFunctions.dot) so the DuckDB oracle reproduces them bit-for-bit;
  * ranking ties are broken on the ROUNDED cosine + neighbor id, so both
  * engines rank identically even at the last ulp.
  */
object Similarity {

  /** (vec_id, e: array<double>) projection of the embeddings table.
    * Norms are NOT precomputed: every consumer scores through the
    * native CosineSimilarity expression, which derives both norms
    * inside its fused loop (bit-identical to the oracle's per-vector
    * sqrt(list_sum(x*x)) because the accumulation order is the same). */
  def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), toDoubleArray(col("embedding")).as("e"))


  /** EXACT cosine near-dup at threshold tau, as a block-tiled pair
    * enumeration — an EQUI-JOIN on block-pair keys, never a broadcast
    * nested loop over the whole table.
    *
    * Why not LSH candidates here: at tau = 0.40 the angle is ~66°, so a
    * random hyperplane separates a QUALIFYING pair with p ≈ 0.37. Any
    * banding strong enough for the ~100% recall this operator's exact
    * contract requires (miss ≤ 1e-6 needs ~27 bands of 2 planes) also
    * collides ~100% of UNRELATED pairs (p=0.5/plane) — at low angular
    * thresholds hyperplane LSH prunes nothing. LSH is the right tool
    * for high-similarity top-k (annLshTopK below); the exact threshold
    * join at tau=0.4 on dense vectors has an O(n²) compute floor, and
    * the engineering question is making that floor SCALE.
    *
    * Tiling: vectors hash into G blocks. A vector in block x enters the
    * join's A side under keys {(x, j) : j >= x} and its B side under
    * keys {(i, x) : i <= x}; a pair from blocks {x, y} therefore meets
    * at EXACTLY one key, (min, max) — no dedup pass needed. The join on
    * (bi, bj) is a shuffled equi-join over G(G+1)/2 evenly-loaded keys:
    * per-task memory is O(n/G) vectors and per-task work (n/G)² — both
    * tuned by numBlocks, independent of executor count or driver
    * memory. At 100 TB: raise numBlocks until a block fits an executor
    * core's memory; replication cost is G+1 copies of the (small)
    * vector column, traded for never materializing an O(n) broadcast.
    *
    * The cosine itself is the native codegen'd CosineSimilarity
    * expression — a primitive loop inside whole-stage codegen, ~30x
    * faster than the zip_with+aggregate HOF form. */
  def cosineNearDupPairs(emb: DataFrame, tau: Double,
                         numBlocks: Int = 16): DataFrame = {
    require(numBlocks >= 1, s"numBlocks must be >= 1, got $numBlocks")
    val g = numBlocks
    val v = vectors(emb).withColumn("blk", pmod(hash(col("vec_id")), lit(g)))
    val a = v.select(col("vec_id").as("vec_a"), col("e").as("ea"),
      col("blk").as("bi"),
      explode(sequence(col("blk"), lit(g - 1))).as("bj"))
    val b = v.select(col("vec_id").as("vec_b"), col("e").as("eb"),
      explode(sequence(lit(0), col("blk"))).as("ci"),
      col("blk").as("cj"))
    // Cross-block pairs (bi < bj) meet exactly once but with ARBITRARY
    // id order (the A/B role is assigned by block, not id) — accept
    // them as-is and canonicalize with least/greatest. Same-block
    // pairs (bi == bj) meet under BOTH role assignments, so the id
    // order keeps exactly one (and excludes self-pairs; cross-block
    // pairs are distinct vectors by construction).
    a.join(b, col("bi") === col("ci") && col("bj") === col("cj") &&
        (col("bi") < col("bj") || col("vec_a") < col("vec_b")))
      .withColumn("cos", CosineSimilarity(col("ea"), col("eb")))
      .filter(col("cos") >= tau)
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"),
        round(col("cos"), 6).as("cos"))
  }

  def cosineNearDupQuery(spark: SparkSession, dir: String): DataFrame =
    cosineNearDupPairs(Tables.embeddings(spark, dir), tau = 0.40)
      .orderBy(col("vec_a"), col("vec_b"))

  /** Embedding-space dedup clusters: connected components over the
    * exact cosine near-dup pair graph — the SAME component operator
    * the text path uses (Dedup.connectedComponents is edge-set
    * generic); only the pair generator differs. Semantic near-dups
    * chain exactly like textual ones (A≈B, B≈C with A,C below
    * threshold), so the cluster, not the pair, is the dedup unit here
    * too. */
  def embedClusters(emb: DataFrame, tau: Double): DataFrame =
    Dedup.connectedComponents(
      vectors(emb).select(col("vec_id").as("doc_id")),
      cosineNearDupPairs(emb, tau)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("rep_id"),
        col("cluster_size"), col("is_canonical"))

  def embedClustersQuery(spark: SparkSession, dir: String): DataFrame =
    embedClusters(Tables.embeddings(spark, dir), tau = 0.40)
      .orderBy(col("vec_id"))

  /** Cluster↔label agreement — the evaluation step between "we built
    * embedding dedup clusters" and "we trust them": per cluster, its
    * majority ground-truth label (the embeddings table's `label`
    * column) and purity in integer basis points. Low purity means the
    * cosine threshold is merging semantically distinct docs — the
    * knob-tuning signal for tau, measured instead of eyeballed.
    *
    * Determinism: majority = ONE map-side-combined min_by over the
    * (−count, label) struct (ties to the smallest label — no RNG, no
    * window over a mega-cluster); purity_bp = 10000·majority_n div
    * size in exact integer division.
    *
    * Scale: clustering cost is embedClusters' (frontier-iterated CC);
    * everything added here is two label-keyed aggregates over
    * cluster-sized frames. */
  def clusterLabelPurity(emb: DataFrame, tau: Double): DataFrame = {
    val cl = embedClusters(emb, tau).select(col("vec_id"), col("rep_id"))
    val cnt = cl.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("rep_id"), col("label")).agg(count(lit(1)).as("n"))
    cnt.groupBy("rep_id").agg(
        min_by(col("label"),
          struct((lit(0L) - col("n")).as("nn"), col("label")))
          .as("majority_label"),
        max(col("n")).as("majority_n"),
        sum(col("n")).as("cluster_size"))
      .select(col("rep_id"), col("cluster_size"), col("majority_label"),
        col("majority_n"),
        expr("majority_n * 10000 div cluster_size").as("purity_bp"))
  }

  def clusterPurityQuery(spark: SparkSession, dir: String): DataFrame =
    clusterLabelPurity(Tables.embeddings(spark, dir), tau = 0.40)
      .orderBy(col("rep_id"))

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * with CLUSTER-BOUNDED pairwise comparison — the trick that makes
    * embedding dedup tractable when the exact tiled join (embedClusters
    * above) is still too much compute. Vectors are coarse-clustered by
    * nearest centroid; near-dup pairs are only sought WITHIN a cell, so
    * pairwise work drops from O(n²) to O(Σ cᵢ²) — at 100 TB with C
    * cells of ~n/C vectors that is a C-fold compute cut, bought with
    * the (measured, bounded) recall loss of cross-cell dup pairs.
    *
    * Within each cell: cosine-threshold pairs at `tau` chain into
    * groups via the same connected-components operator the text path
    * uses, and each group keeps the member FARTHEST from its cell
    * centroid (lowest centroid cosine; doc_id breaks ties) — the
    * paper's keep-rule, which retains the cluster's most peripheral
    * (least redundant) example rather than an arbitrary one.
    *
    * Serving contract mirrors annIvfTopK: centroids here are the
    * deterministic `vec_id < numCentroids` set so the WHOLE path —
    * assignment, intra-cell pairs, components, keep-rule — replicates
    * in the SQL oracle; production plugs trainIvfCentroids output into
    * the same plan unchanged.
    *
    * Scale shape: assignment is corpus × broadcast(C centroids) with a
    * map-side-combined max_by (one scan, no shuffle of the C-fold
    * amplification); the intra-cell self-join shuffles on `cell` once;
    * components shuffle frontier-sized rounds; the keep-rule is one
    * component-keyed aggregate join-back. No window ever sees more
    * than a cell. */
  def semDedup(emb: DataFrame, numCentroids: Int, tau: Double): DataFrame = {
    require(numCentroids >= 1, s"numCentroids must be >= 1, got $numCentroids")
    val assigned = semDedupAssigned(emb, numCentroids)
    val pairs = semDedupPairs(assigned, tau)

    val comp = Dedup.connectedComponents(
        assigned.select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("rep_id"), col("cluster_size"))
    val withCos = comp.join(
      assigned.select(col("vec_id"), col("cell"), col("cos_centroid")),
      "vec_id")
    val keepers = withCos.groupBy("rep_id")
      .agg(min_by(col("vec_id"), struct(col("cos_centroid"), col("vec_id")))
        .as("keeper"))
    withCos.join(keepers, "rep_id")
      .select(col("vec_id"), col("cell"), col("cos_centroid"), col("rep_id"),
        col("cluster_size"), (col("vec_id") === col("keeper")).as("keep"))
  }

  /** THE nearest-centroid assignment rule — one implementation shared
    * by semDedup, the IVF index build, and (via ivfIndex) IVF serving,
    * so the tie-break-sensitive ordering (rounded-6 ccos desc, then
    * smallest cid via the negated-cid struct) cannot drift between the
    * write path, the read path, and the SQL oracles that replicate it.
    * trainIvfCentroids deliberately does NOT share it: Lloyd
    * iterations assign on the UN-rounded cosine (training is float
    * territory by contract and not oracle-checked).
    * @param v     (vec_id, e) corpus vectors
    * @param cents (cid, ce) centroid frame (model-sized, broadcast) */
  private[graft] def assignToCells(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("ccos", round(CosineSimilarity(col("e"), col("ce")), 6))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cid"), col("ccos")),
          struct(col("ccos"), (lit(0L) - col("cid")).as("nc"))).as("best"),
        first(col("e")).as("e"))
      .select(col("vec_id"), col("best.cid").as("cell"),
        col("best.ccos").as("cos_centroid"), col("e"))

  /** semDedup stage 1 — nearest-centroid assignment (exposed for the
    * cell-sizing scale probe). */
  private[graft] def semDedupAssigned(emb: DataFrame,
                                      numCentroids: Int): DataFrame = {
    val v = vectors(emb)
    val cents = v.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    assignToCells(v, cents)
  }

  /** semDedup stage 2 — intra-cell near-dup pairs at tau. */
  private[graft] def semDedupPairs(assigned: DataFrame,
                                   tau: Double): DataFrame = {
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("e").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("e").as("eb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(CosineSimilarity(col("ea"), col("eb")), 6) >= tau)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
  }

  def semDedupQuery(spark: SparkSession, dir: String): DataFrame =
    semDedup(Tables.embeddings(spark, dir), numCentroids = 16, tau = 0.40)
      .orderBy(col("vec_id"))

  /** Shared top-k tail of every ANN variant: rank candidates per query
    * by (rounded cosine desc, id) — ties break identically in the
    * DuckDB oracles — and keep rnk <= k.
    * @param cand (query_id, vec_id, cos) candidate rows */
  private def topK(cand: DataFrame, k: Int): DataFrame = {
    val w = W.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Brute-force cosine top-k for a bounded query set (vec_id < 8).
    *
    * Scale shape: the query side is broadcast (bounded by construction),
    * so the big side is scanned exactly once with no shuffle; the only
    * shuffle is the final per-query top-k, whose input is |Q| * n rows
    * pre-truncatable by partial top-k. */
  def annCosineTopK(emb: DataFrame, numQueries: Int, k: Int): DataFrame =
    topK(cosineCandidates(emb, numQueries), k)

  /** The fp32 broadcast-query candidate block — one copy of the
    * bounded-query scan (broadcast q side, self-pair exclusion,
    * rounded-6 cosine) shared by annCosineTopK, annHardNegatives, and
    * the hybrid RRF dense side, so the conventions the DuckDB oracles
    * replicate live in one place. Emits (query_id, vec_id, cos, ...).*/
  private[graft] def cosineCandidates(emb: DataFrame,
                                      numQueries: Int): DataFrame = {
    val v = vectors(emb)
    cosineCandidatesQ(v, v.filter(col("vec_id") < numQueries)
      .toDF("query_id", "eq"))
  }

  /** The same candidate block for an EXPLICIT bounded query frame
    * (query_id, eq) — the held-out-query evaluation path. */
  private[graft] def cosineCandidatesQ(v: DataFrame, q: DataFrame): DataFrame =
    broadcast(q)
      .join(v, col("query_id") =!= col("vec_id"))
      .withColumn("cos",
        round(CosineSimilarity(col("eq"), col("e")), 6))

  def annCosineTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annCosineTopK(Tables.embeddings(spark, dir), numQueries = 8, k = 5)
      .orderBy(col("query_id"), col("rnk"))

  /** Hard-negative mining for contrastive retrieval training (the
    * DPR/ANCE shape — Karpukhin et al. 2020, Xiong et al. 2021): per
    * query, the top-k candidates in the cosine band [lo, hi) —
    * similar enough to be confusable (the negatives that actually
    * teach the model), but below the near-dup/positive threshold so
    * no false negative sneaks into the training pair. Plain top-k
    * mines easy negatives; the band is the whole point.
    *
    * Same scale shape as annCosineTopK: bounded query side broadcast,
    * one corpus scan, band filter BEFORE the rank shuffle (the band
    * prunes most of the |Q|·n candidate stream in-scan); at corpus
    * scale stage 1 swaps for the IVF/int8 shortlist unchanged. */
  def annHardNegatives(emb: DataFrame, numQueries: Int, k: Int,
                       lo: Double = 0.15, hi: Double = 0.40): DataFrame = {
    require(lo < hi, s"band [$lo, $hi) is empty")
    topK(cosineCandidates(emb, numQueries)
      .filter(col("cos") >= lo && col("cos") < hi), k)
  }

  def annHardNegativesQuery(spark: SparkSession, dir: String): DataFrame =
    annHardNegatives(Tables.embeddings(spark, dir), numQueries = 8, k = 5)
      .orderBy(col("query_id"), col("rnk"))

  /** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    * traversal; the coreset objective of Sener & Savarese 2018): pick
    * k vectors such that every corpus vector is close to some pick —
    * the diversity-maximizing subset used for "cover the embedding
    * space with a small training subset" selection, the opposite
    * objective of semDedup's redundancy removal.
    *
    * Deterministic contract: seed is vec_id 0; each round adds the
    * vector FARTHEST from the chosen set (max over the running
    * min-distance, ties to the smallest vec_id); distances are
    * rounded-6 cosine distance so both engines compare identical
    * doubles, and the reported distance is exact integer micro-units.
    *
    * Scale shape: k corpus passes, each map-only (crossJoin with the
    * ONE-row broadcast of the newest center + a running `least`) into
    * a TakeOrdered top-1 — no corpus-sized shuffle anywhere, state
    * between rounds is one localCheckpoint'd frame. The classic
    * sequential-greedy; at 100 TB each pass is a scan, so cost is
    * k scans — which is the known price of the exact greedy (the 2-approx
    * guarantee needs sequential picks). */
  def kcenterCoreset(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = vectors(emb)
    val seed = v.filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("e")).localCheckpoint()
    // selection log: (rnk, vec_id, dist_micro); the seed has no
    // predecessor set — 2000000 (the max possible cosine distance) by
    // convention
    var sel = seed.select(lit(1).as("rnk"), col("vec_id"),
      lit(2000000L).as("dist_micro")).localCheckpoint()
    var cent = seed.select(col("e").as("ce")).localCheckpoint()
    var md = v // (vec_id, e) + running min distance, added on round 1
      .select(col("vec_id"), col("e"), lit(2.0d).as("mind"))
    for (i <- 2 to k) {
      md = md.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("e"),
          least(col("mind"),
            round(lit(1.0d) - CosineSimilarity(col("e"), col("ce")), 6))
            .as("mind"))
        .localCheckpoint()
      val next = md.orderBy(col("mind").desc, col("vec_id")).limit(1)
        .localCheckpoint()
      sel = sel.unionByName(next.select(lit(i).as("rnk"), col("vec_id"),
        round(col("mind") * 1000000.0d).cast("long").as("dist_micro")))
        .localCheckpoint()
      cent = next.select(col("e").as("ce")).localCheckpoint()
    }
    sel
  }

  def kcenterCoresetQuery(spark: SparkSession, dir: String): DataFrame =
    kcenterCoreset(Tables.embeddings(spark, dir), k = 8)
      .orderBy(col("rnk"))

  /** MMR — Maximal Marginal Relevance re-ranking (Carbonell &
    * Goldstein 1998): pick k results that are RELEVANT to the query
    * but not redundant with each other,
    *   mmr(d) = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    * greedily. kcenterCoreset maximizes pure diversity over the whole
    * corpus; this is its QUERY-RELATIVE sibling — the post-retrieval
    * step that stops a near-dup cluster from filling all k slots.
    *
    * Deterministic contract, all integer: per-candidate relevance and
    * pairwise similarities are rounded ONCE to micro-units
    * (round(cos·1e6) — never round-to-6-then-scale, whose re-widened
    * double can truncate off by one); with λ = lamNum/lamDen the
    * selection argmax uses the UNDIVIDED score
    *   lamNum·rel_micro − (lamDen−lamNum)·maxs_micro
    * (reported as mmr_tenth_micro at the default λ=7/10 — tenth-micro
    * units), so no float ever orders the picks; ties to smallest
    * vec_id. Pick 1 is pure relevance (empty-S convention: no
    * penalty term).
    *
    * Scale shape: the CORPUS is touched exactly once — relevance
    * scoring against the ONE broadcast query row, then a two-phase
    * sharded top-nCand shortlist (no global window ever sees the
    * corpus; the final window sees ≤ shards·nCand rows). The k−1
    * greedy rounds run entirely on the nCand-row candidate frame
    * (model-sized by construction — this is a re-RANKER, fed by
    * annIvfRerankTopK at 100 TB), each round one broadcast of the
    * newest pick + a running integer max, exactly kcenterCoreset's
    * loop discipline. */
  def mmrDiversify(emb: DataFrame, k: Int = 8, nCand: Int = 64,
                   lamNum: Int = 7, lamDen: Int = 10,
                   shards: Int = 8): DataFrame = {
    require(k >= 1 && nCand >= k, s"need 1 <= k <= nCand, got $k/$nCand")
    require(lamNum >= 0 && lamNum <= lamDen && lamDen > 0,
      s"lambda $lamNum/$lamDen must be in [0, 1]")
    val v = vectors(emb)
    val q = v.filter(col("vec_id") === 0L).select(col("e").as("eq"))
      .localCheckpoint()
    def micro(c: Column): Column = round(c * lit(1000000.0d)).cast("long")
    val rel = v.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"), col("e"),
        micro(CosineSimilarity(col("e"), col("eq"))).as("rel_micro"))
    val wShard = W.partitionBy(pmod(col("vec_id"), lit(shards)))
      .orderBy(col("rel_micro").desc, col("vec_id"))
    val wFinal = W.orderBy(col("rel_micro").desc, col("vec_id"))
    val cand = rel
      .withColumn("srnk", row_number().over(wShard))
      .filter(col("srnk") <= nCand)
      .withColumn("rn", row_number().over(wFinal))
      .filter(col("rn") <= nCand)
      .select(col("vec_id"), col("e"), col("rel_micro"))
      .localCheckpoint()

    val penalty = lamDen - lamNum
    val first = cand.orderBy(col("rel_micro").desc, col("vec_id")).limit(1)
      .localCheckpoint()
    var sel = first.select(lit(1).as("rnk"), col("vec_id"), col("rel_micro"),
      (lit(lamNum) * col("rel_micro")).as("mmr_tenth_micro"))
      .localCheckpoint()
    var newest = first.select(col("vec_id").as("cid"), col("e").as("ce"))
      .localCheckpoint()
    // pool rows carry the running max similarity to the selected set
    var pool = cand.select(col("vec_id"), col("e"), col("rel_micro"),
      lit(Long.MinValue).as("maxs"))
    for (i <- 2 to k) {
      pool = pool.crossJoin(broadcast(newest))
        .filter(col("vec_id") =!= col("cid"))
        .select(col("vec_id"), col("e"), col("rel_micro"),
          greatest(col("maxs"),
            micro(CosineSimilarity(col("e"), col("ce")))).as("maxs"))
        .localCheckpoint()
      val score = lit(lamNum) * col("rel_micro") - lit(penalty) * col("maxs")
      val next = pool.orderBy(score.desc, col("vec_id")).limit(1)
        .localCheckpoint()
      sel = sel.unionByName(next.select(lit(i).as("rnk"), col("vec_id"),
        col("rel_micro"), score.as("mmr_tenth_micro"))).localCheckpoint()
      newest = next.select(col("vec_id").as("cid"), col("e").as("ce"))
        .localCheckpoint()
    }
    sel
  }

  def mmrDiversifyQuery(spark: SparkSession, dir: String): DataFrame =
    mmrDiversify(Tables.embeddings(spark, dir)).orderBy(col("rnk"))

  /** Embedding-space benchmark decontamination: for every corpus
    * vector, its maximum cosine against a (model-sized, broadcast)
    * benchmark embedding set and the count of benchmark vectors within
    * tau — the SEMANTIC contamination check next to the k-shingle one
    * (Dedup.decontaminate catches verbatim leakage; paraphrased eval
    * questions only surface in embedding space).
    *
    * Scale shape: identical to annCosineTopK — the benchmark set is
    * bounded BY CONSTRUCTION (an eval suite is thousands of rows no
    * matter how big the corpus is), so it broadcasts and the corpus
    * scans ONCE with no shuffle before the per-vector aggregate, which
    * reuses the scan's partitioning (map-side combinable: max and
    * conditional count). Every corpus vector appears in the output
    * (clean rows carry their max too — the audit a release gate wants).
    * MAX over doubles is accumulation-order-independent, so the only
    * rounding is the final display round. */
  def embedDecontaminate(emb: DataFrame, benchIds: DataFrame => Column,
                         tau: Double): DataFrame = {
    val v = vectors(emb)
    val bench = v.filter(benchIds(v))
      .select(col("vec_id").as("bench_id"), col("e").as("eb"))
    val corpus = v.filter(!benchIds(v))
    corpus.join(broadcast(bench), col("vec_id") =!= col("bench_id"))
      .withColumn("cos", CosineSimilarity(col("e"), col("eb")))
      .groupBy(col("vec_id"))
      .agg(
        round(max(col("cos")), 6).as("max_cos"),
        sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  def embedDecontamQuery(spark: SparkSession, dir: String): DataFrame =
    embedDecontaminate(Tables.embeddings(spark, dir),
      v => pmod(v("vec_id"), lit(50)) === 0, tau = 0.40)
      .orderBy(col("vec_id"))

  /** Minimal band count so a pair at EXACTLY cosine `tau` collides in
    * at least one band with probability ≥ `targetRecall`: the banding
    * curve 1-(1-p^bits)^bands ≥ target solved for bands, with
    * p = 1-θ/π = 1-acos(tau)/π (the hyperplane collision probability
    * per bit). Recall is monotone in cosine, so every pair ABOVE tau
    * detects with at least this probability — tau is the worst case. */
  def bandsFor(tau: Double, targetRecall: Double, planesPerBand: Int): Int = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall must be in (0, 1), got $targetRecall")
    require(planesPerBand >= 1)
    val p = 1.0 - math.acos(tau) / math.Pi
    val pBand = math.pow(p, planesPerBand)
    math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-pBand)).toInt)
  }

  /** (bands, planesPerBand) meeting `targetRecall` at `tau` with the
    * LOWEST expected candidate cost, subject to a total-plane budget:
    * for each bits ∈ [1, 8] the minimal band count comes from
    * [[bandsFor]]; among configs with bands·bits ≤ maxPlanes, pick the
    * one minimizing bands/2^bits (expected candidates per corpus row,
    * as a fraction of |bench|), tie-broken on fewer planes. More bits
    * always cuts cost-per-candidate but costs more planes — the budget
    * caps the banding compute (bands·bits dot products per row). */
  def bandingFor(tau: Double, targetRecall: Double = 0.95,
                 maxPlanes: Int = 96): (Int, Int) = {
    val options = (1 to 8).map { bits =>
      (bandsFor(tau, targetRecall, bits), bits)
    }.filter { case (bands, bits) => bands * bits <= maxPlanes }
    require(options.nonEmpty,
      s"no banding meets recall $targetRecall at tau $tau within $maxPlanes planes")
    options.minBy { case (bands, bits) =>
      (bands.toDouble / (1L << bits), bands * bits)
    }
  }

  /** LSH-banded decontamination — the scale path next to the exact
    * embedDecontaminate BNLJ, for when the benchmark set outgrows
    * "model-sized": `numBands` independent hyperplane codes of
    * `planesPerBand` bits each; corpus and benchmark rows meet through
    * a broadcast HASH join on (band, bucket) equality, exact cosine
    * verifies only the collisions, and the per-doc aggregate counts
    * DISTINCT benchmark hits (a pair colliding in several bands scores
    * more than once but is counted once — max is duplicate-immune).
    *
    * Scale shape: candidates per corpus row ≈ B·|bench|/2^P instead of
    * |bench| — the banded-join bound every other near-dup operator in
    * this library uses, and O(n·B) in corpus size with NO nested loop.
    * Recall is the standard banding curve (1-(1-p^P)^B, p = 1-θ/π),
    * monotone in numBands. The DEFAULT knobs are derived from tau by
    * [[bandingFor]], so the shipped operating point meets ≥ 0.95
    * per-pair recall AT tau BY CONSTRUCTION (spec-pinned empirically)
    * — a caller picks knobs only to trade recall for candidate volume
    * deliberately, never to make the defaults safe. Misses are pairs
    * colliding in no band; the DuckDB oracle replicates the banding
    * bit-for-bit (dots, buckets, then verify), so the PIPELINE is
    * checked exactly even though the operator is approximate vs
    * embedDecontaminate.
    *
    * Output = corpus docs with at least one CANDIDATE (audit rows:
    * near-misses carry contaminated=false with their max_cos). */
  def embedDecontaminateLsh(emb: DataFrame, benchIds: DataFrame => Column,
                            tau: Double, numBands: Int = -1,
                            planesPerBand: Int = -1,
                            dim: Int = 64): DataFrame = {
    val (autoBands, autoPlanes) =
      if (numBands > 0 && planesPerBand > 0) (numBands, planesPerBand)
      else bandingFor(tau)
    embedDecontaminateLshWith(emb, benchIds, tau, autoBands, autoPlanes, dim)
  }

  private def embedDecontaminateLshWith(
      emb: DataFrame, benchIds: DataFrame => Column, tau: Double,
      numBands: Int, planesPerBand: Int, dim: Int): DataFrame =
    lshDecontamCandidates(emb, benchIds, numBands, planesPerBand, dim)
      .groupBy(col("vec_id"))
      .agg(
        round(max(col("cos")), 6).as("max_cos"),
        count_distinct(when(col("cos") >= tau, col("bench_id"))).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)

  /** Collision (candidate) frame of the banded decontam join —
    * (vec_id, bench_id, cos) per (band, bucket) collision, BEFORE the
    * per-doc aggregate. Exposed so ScaleProbe can measure the exact
    * candidate volume a knob choice buys (the quantity bandingFor's
    * bands/2^bits objective estimates). */
  private[graft] def lshDecontamCandidates(
      emb: DataFrame, benchIds: DataFrame => Column,
      numBands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    require(numBands >= 1 && planesPerBand >= 1)
    val planes = planeMatrix(numBands * planesPerBand, dim)
    // (id, e, band, bucket) — one HyperplaneBucket per band (native
    // codegen'd, in-scan), then the B codes explode into rows so the
    // collision join is a plain equi-join on (band, bucket)
    def banded(df: DataFrame, id: String, e: String): DataFrame = {
      val withCodes = (0 until numBands).foldLeft(df) { (d, b) =>
        d.withColumn(s"bk$b", HyperplaneBucket(col(e),
          planes.slice(b * planesPerBand, (b + 1) * planesPerBand)))
      }
      withCodes.select(col(id), col(e),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"), col(s"bk$b").as("bucket"))): _*)).as("bb"))
        .select(col(id), col(e),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val v = vectors(emb)
    val bench = banded(v.filter(benchIds(v))
      .select(col("vec_id").as("bench_id"), col("e").as("eb")), "bench_id", "eb")
    val corpus = banded(v.filter(!benchIds(v)), "vec_id", "e")
    corpus.join(broadcast(bench), Seq("band", "bucket"))
      .withColumn("cos", CosineSimilarity(col("e"), col("eb")))
  }

  def embedDecontamLshQuery(spark: SparkSession, dir: String): DataFrame =
    embedDecontaminateLsh(Tables.embeddings(spark, dir),
      v => pmod(v("vec_id"), lit(50)) === 0, tau = 0.40)
      .orderBy(col("vec_id"))

  // ---------------------------------------------------------------- LSH ANN

  /** Deterministic pseudo-random hyperplanes: component (p, d) is an
    * md5-derived value in [-1, 1). Driver-side constants — the plane
    * matrix is tiny (numPlanes x dim) and ships as literals, the moral
    * equivalent of broadcasting the model. */
  private def planeMatrix(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Double = {
      val bytes = digest.digest(s.getBytes("UTF-8"))
      val v = ((bytes(0) & 0x7fL) << 20) | ((bytes(1) & 0xffL) << 12) |
        ((bytes(2) & 0xffL) << 4) | (bytes(3) & 0xfL)
      v.toDouble / (1L << 26).toDouble - 1.0 // [-1, 1)
    }
    Seq.tabulate(numPlanes, dim)((p, d) => h(s"plane#$p#$d"))
  }

  /** All XOR masks of Hamming weight <= r over `planes` bits — the
    * multi-probe neighborhood. Driver-side constant (2^planes masks
    * scanned; planes is single-digit). */
  private def probeMasks(numPlanes: Int, probeHamming: Int): Seq[Int] =
    (0 until (1 << numPlanes)).filter(m => Integer.bitCount(m) <= probeHamming)

  /** Random-hyperplane LSH ANN: `numPlanes` sign bits → 2^planes
    * buckets; queries probe every bucket within Hamming distance
    * `probeHamming` of their own (sum of C(planes, i) probes), compute
    * exact cosine only within probed buckets, keep top-k.
    *
    * Scale shape: candidate count per query is bounded by probe-bucket
    * occupancy (E[n/2^planes * probes]), not n — this is the O(n·b)
    * path that replaces cosineNearDupPairs' O(n²) at 100 TB.
    *
    * Tuning (see the recall property test in SimilaritySpec):
    * more planes → smaller buckets, cheaper probes, lower recall at
    * fixed probeHamming; more probeHamming → recall rises toward
    * brute force (at probeHamming = numPlanes it IS brute force).
    * Raising probeHamming by 1 can only grow each query's candidate
    * set, so recall is monotone in it. */
  def annLshTopK(emb: DataFrame, numQueries: Int, k: Int,
                 numPlanes: Int = 6, probeHamming: Int = 1,
                 dim: Int = 64): DataFrame =
    topK(annLshCandidates(emb, numQueries, numPlanes, probeHamming, dim), k)

  /** The candidate frame (query_id, vec_id, cos) BEFORE top-k — exposed
    * so ScaleProbe can audit per-query candidate volume. Occupancy of
    * a probed bucket is E[n/2^planes], so planes must rise by 1 per
    * corpus doubling to hold per-bucket occupancy flat; total
    * candidates then grow only with the multi-probe bucket count
    * (1 + planes at probeHamming=1), i.e. O(log n) versus the linear
    * growth of fixed knobs — measured in ScaleProbe.annProbe. */
  private[graft] def annLshCandidates(emb: DataFrame, numQueries: Int,
                                      numPlanes: Int, probeHamming: Int,
                                      dim: Int): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= numPlanes,
      s"probeHamming must be in [0, numPlanes], got $probeHamming")
    val v = vectors(emb)
    // Bucket assignment is the ONE expression that touches every corpus
    // vector, so it is the native codegen'd HyperplaneBucket — a
    // primitive numPlanes×dim loop, not numPlanes interpreted HOF
    // folds (bit-parity with the old fold pinned by HyperplaneBucketSpec).
    val vb = v.withColumn("bucket",
      HyperplaneBucket(col("e"), planeMatrix(numPlanes, dim)))
    // Explode the LITERAL mask array first, then XOR as a plain column
    // op — keeps the probe expansion codegen'd too (a transform lambda
    // over the masks would be the plan's only interpreted expression).
    val q = vb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("bucket"),
        explode(array(probeMasks(numPlanes, probeHamming).map(lit): _*)).as("m"))
      .select(col("query_id"), col("eq"),
        col("bucket").bitwiseXOR(col("m")).as("probe"))

    broadcast(q)
      .join(vb, col("probe") === col("bucket") &&
        col("query_id") =!= col("vec_id"))
      .withColumn("cos",
        round(CosineSimilarity(col("eq"), col("e")), 6))
  }

  def annLshTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annLshTopK(Tables.embeddings(spark, dir), numQueries = 8, k = 3)
      .orderBy(col("query_id"), col("rnk"))

  // ---------------------------------------------------------------- IVF ANN

  /** IVF (inverted-file) cosine ANN — the other standard scale path
    * next to hyperplane LSH: a coarse quantizer of `numCentroids`
    * centroid vectors partitions the corpus into cells; each query
    * probes its `nProbe` nearest cells and computes exact cosine only
    * there. Candidates per query ≈ nProbe · n/C — linear scan of a
    * tunable corpus fraction, never all of n.
    *
    * Scale shape: cell assignment is ONE map-side pass (corpus ×
    * broadcast centroid table — C is a bounded model constant, the
    * moral equivalent of the LSH plane matrix) reduced by a map-side-
    * combined max_by aggregate, and candidate generation is an
    * equi-join on the cell id. No window over the full corpus, no
    * all-pairs anywhere.
    *
    * Centroids are the first `numCentroids` vectors — deterministic,
    * so the DuckDB oracle replicates assignment bit-for-bit. A real
    * deployment plugs TRAINED k-means centroids into the same plan
    * (assignment, probing, ranking are unchanged); training itself is
    * a separate offline job, and its floating-point reductions are not
    * cross-engine reproducible, which is exactly why the oracle pins
    * the serving path, not the training path. */
  def annIvfTopK(emb: DataFrame, numQueries: Int, k: Int,
                 numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids], got $nProbe")
    topK(annIvfCandidates(emb, defaultCentroids(emb, numCentroids),
      numQueries, nProbe), k)
  }

  /** The untrained default coarse quantizer: the first C vectors as
    * centroids. ONE definition — the serving path and ScaleProbe's
    * occupancy audit must quantize identically or the audit measures a
    * different operator than it claims. */
  def defaultCentroids(emb: DataFrame, numCentroids: Int): DataFrame =
    vectors(emb).filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("e").as("ce"))

  /** IVF serving with an EXPLICIT centroid table (cid, ce) — the plan
    * the oracle pins, unchanged whether centroids are the deterministic
    * first-C default or trained by [[trainIvfCentroids]]. */
  def annIvfTopKWith(emb: DataFrame, cents: DataFrame, numQueries: Int,
                     k: Int, nProbe: Int): DataFrame =
    topK(annIvfCandidates(emb, cents, numQueries, nProbe), k)

  /** The candidate frame (query_id, vec_id, cos) BEFORE top-k — shared
    * serving path for any centroid table, and exposed so ScaleProbe can
    * audit candidates/query (≈ nProbe · n/C; C must grow linearly with
    * n to hold the per-query scan constant). */
  private[graft] def annIvfCandidates(emb: DataFrame, cents: DataFrame,
                                      numQueries: Int, nProbe: Int): DataFrame = {
    val (assigned, probes) = ivfIndex(emb, cents, numQueries, nProbe)
    broadcast(probes)
      .join(assigned, col("probe") === col("cell") &&
        col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
  }

  /** IVF index + probe frames shared by the fp32 and two-stage serving
    * paths: `assigned` (vec_id, cell, e) — each corpus vector in its
    * single nearest cell — and `probes` (query_id, eq, probe) — each
    * query fanned to its top-nProbe cells. A (query, vector) candidate
    * pair arises at most once downstream because a vector lives in
    * exactly one cell. */
  private def ivfIndex(emb: DataFrame, cents: DataFrame, numQueries: Int,
                       nProbe: Int): (DataFrame, DataFrame) =
    ivfIndexOpt(emb, cents, Some(numQueries), nProbe)

  /** numQueries = None means EVERY corpus vector is a query (the
    * knnGraph corpus-as-queries contract) — no vec_id bound at all, so
    * a Long id space (ids >= 2^31 from sharded ingest) still gets its
    * full adjacency; an Int.MaxValue cap would silently drop those. */
  private def ivfIndexOpt(emb: DataFrame, cents: DataFrame,
                          numQueries: Option[Int],
                          nProbe: Int): (DataFrame, DataFrame) = {
    val v = vectors(emb)
    ivfIndexQ(v, cents, numQueries.fold(v)(n => v.filter(col("vec_id") < n)),
      nProbe)
  }

  /** The IVF index for an EXPLICIT query-vector frame (vec_id, e) —
    * the held-out-query evaluation path shares the exact serving
    * plan (assignment rule, probe ranking, tiebreaks) with the
    * vec_id-prefix defaults above. */
  private def ivfIndexQ(v: DataFrame, cents: DataFrame, qside: DataFrame,
                        nProbe: Int): (DataFrame, DataFrame) = {
    // nearest centroid per vector: the shared assignToCells rule —
    // aggregates combine map-side, so the C-fold row amplification
    // never crosses the exchange
    val assigned = assignToCells(v, cents)
      .select(col("vec_id"), col("cell"), col("e"))

    // query probes: top-nProbe centroids (bounded rows — window is
    // fine; the crossJoin is queries-only, |Q|·C rows — or, in
    // all-queries mode, |corpus|·C map-side before the per-vector
    // window, the knnGraph build cost)
    val wProbe = W.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = qside
      .crossJoin(broadcast(cents))
      .withColumn("ccos", round(CosineSimilarity(col("e"), col("ce")), 6))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("e").as("eq"),
        col("cid").as("probe"))
    (assigned, probes)
  }

  /** IVF candidates for an explicit query frame — [[annIvfCandidates]]
    * with the query set passed in rather than a vec_id prefix. */
  private def annIvfCandidatesQ(v: DataFrame, cents: DataFrame,
                                qv: DataFrame, nProbe: Int): DataFrame = {
    val (assigned, probes) = ivfIndexQ(v, cents, qv, nProbe)
    broadcast(probes)
      .join(assigned, col("probe") === col("cell") &&
        col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
  }

  /** Offline spherical k-means (Lloyd) training for the IVF coarse
    * quantizer. Each iteration is one corpus scan feeding two map-side-
    * combined aggregates: assignment (corpus × broadcast centroids +
    * max_by — same shape as serving) and the update, where the per-cell
    * elementwise mean is `dim` codegen'd avg() columns in ONE groupBy
    * (the minhash-signature trick: no posexplode row amplification, no
    * UDFs, no interpreted HOF folds). Cosine assignment ignores vector
    * magnitude, so the un-normalized mean is a valid spherical-k-means
    * update.
    *
    * Init is a deterministic md5-ordered sample — spread across the
    * corpus rather than the first C rows, because a corpus sorted by
    * source/cluster would seed every centroid from one shard (exactly
    * the degenerate case the recall property test exercises). Empty
    * cells drop out (standard Lloyd degeneracy); serving accepts any
    * centroid count.
    *
    * The centroid frame is model-sized (C × dim); localCheckpoint
    * truncates lineage each iteration so iteration i+1 does not replay
    * iterations 1..i, and the broadcast each round ships only the
    * materialized rows. Training is NOT oracle-checked by design: its
    * float reductions are not cross-engine reproducible, which is why
    * the oracle pins the serving path (annIvfTopK) instead — see the
    * recall property test in SimilaritySpec for the training check. */
  def trainIvfCentroids(emb: DataFrame, numCentroids: Int, iters: Int,
                        dim: Int = 64): DataFrame = {
    require(numCentroids >= 1 && iters >= 0)
    val v = vectors(emb)
    var cents = v
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(numCentroids)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
      .localCheckpoint()
    val meanCols = (0 until dim).map(i => avg(element_at(col("e"), i + 1)).as(s"x$i"))
    for (_ <- 1 to iters) {
      val assigned = v.crossJoin(broadcast(cents))
        .withColumn("ccos", CosineSimilarity(col("e"), col("ce")))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("ccos"), (lit(0L) - col("cid")).as("nc")))
          .as("cell"), first(col("e")).as("e"))
      cents = assigned.groupBy("cell")
        .agg(meanCols.head, meanCols.tail: _*)
        .select(col("cell").as("cid"),
          array((0 until dim).map(i => col(s"x$i")): _*).as("ce"))
        .localCheckpoint()
    }
    cents
  }

  def annIvfTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annIvfTopK(Tables.embeddings(spark, dir), numQueries = 8, k = 3)
      .orderBy(col("query_id"), col("rnk"))

  /** EXACT-INTEGER spherical k-means — [[trainIvfCentroids]]'s
    * oracle-replicable twin, closing the gap where every oracle-green
    * IVF query served from the deterministic first-C centroids while
    * the trained path was only property-tested: this trainer is
    * data-adaptive (real Lloyd iterations) AND bit-reproducible
    * cross-engine, so a TRAINED serving path can be oracle-checked
    * end-to-end (ann_ivf_topk_trained / ann_recall_trained).
    *
    * Determinism, step by step: vectors round ONCE to integer micro
    * units; init is the md5-ordered deterministic sample (cid = the
    * sample rank, 1..C); assignment is the serving path's own
    * round(cos, 6)-then-cid tiebreak (micro ints pass through double
    * exactly — |em| ≤ ~10^6, and the 64-term dot ≤ ~6.4·10^13 stays
    * inside double's 2^53 exact-integer range, so the fold is exact
    * in ANY order); the update floors the per-(cell, dim) mean —
    * floor(Σem / n), an IEEE-exact divide of exact integers — back to
    * micro ints. No float state ever crosses an iteration boundary.
    *
    * Scale shape: per iteration ONE corpus pass (the assignToCells
    * crossJoin with the model-sized centroid broadcast + a map-side-
    * combined 64-column aggregate); centroid frames are model-sized
    * and localCheckpointed so iteration i+1 never replays 1..i. The
    * exactness contract bounds per-(cell, dim) micro sums to 2^53 —
    * holds to ~10^9 vectors per cell, beyond any sane cell occupancy
    * (C grows with the corpus precisely to keep cells small).
    *
    * Returns (cid, ce: array<double>) — micro-valued components; the
    * scale is irrelevant to every cosine consumer. Empty cells drop
    * out (standard Lloyd degeneracy). */
  def trainIvfCentroidsExact(emb: DataFrame, numCentroids: Int, iters: Int,
                             dim: Int = 64): DataFrame = {
    require(numCentroids >= 1 && iters >= 0)
    val vm = vectors(emb).select(col("vec_id"),
      transform(col("e"),
        x => round(x * lit(1000000.0d)).cast("long")).as("em"))
      .localCheckpoint()
    val vAsD = vm.select(col("vec_id"),
      transform(col("em"), _.cast("double")).as("e"))
    // orderBy + limit plans as a distributed TakeOrderedAndProject;
    // the rank window then runs over the C-row RESULT only (an
    // unpartitioned window over a model-sized frame, never the corpus)
    val wInit = W.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    var cents = vm
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(numCentroids)
      .withColumn("cid", row_number().over(wInit).cast("long"))
      .select(col("cid"), col("em").as("cm"))
      .localCheckpoint()
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("em"), i + 1)).as(s"s$i")) :+
      count(lit(1)).as("n")
    for (_ <- 1 to iters) {
      val cAsD = cents.select(col("cid"),
        transform(col("cm"), _.cast("double")).as("ce"))
      // e is the micro ints passed through double exactly — cast back
      // in-row rather than re-joining the corpus for em
      val assigned = assignToCells(vAsD, cAsD)
        .select(col("cell"),
          transform(col("e"), _.cast("long")).as("em"))
      cents = assigned.groupBy("cell")
        .agg(sumCols.head, sumCols.tail: _*)
        .select(col("cell").as("cid"),
          array((0 until dim).map(i =>
            floor(col(s"s$i").cast("double") / col("n")).cast("long")): _*)
            .as("cm"))
        .localCheckpoint()
    }
    cents.select(col("cid"),
      transform(col("cm"), _.cast("double")).as("ce"))
  }

  /** IVF serving from TRAINED centroids, end-to-end oracle-checked —
    * the exact-integer trainer's output through the UNCHANGED
    * annIvfTopKWith serving plan. */
  def annIvfTopKTrainedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annIvfTopKWith(emb, trainIvfCentroidsExact(emb, 16, 2),
      numQueries = 8, k = 3, nProbe = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The HELD-OUT query frame (query_id, eq) for the trained-vs-
    * default recall eval: queries disjoint from BOTH centroid samples,
    * so neither serving path is its own quantizer's seed.
    * Deterministic and oracle-replicable: drop the default sample
    * (vec_id < C), anti-join away the trained init sample (the
    * md5-ASC first C — trainIvfCentroidsExact's seed rule), then take
    * the md5-DESC tail Q. Bounded (Q rows) by construction; the
    * orderBy+limit plans as TakeOrderedAndProject and the anti-join
    * broadcasts the C-row init sample. */
  private[graft] def heldoutQueries(emb: DataFrame, numQueries: Int,
                                    numCentroids: Int): DataFrame = {
    val v = vectors(emb)
    val tinit = v
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(numCentroids)
      .select(col("vec_id"))
    v.filter(col("vec_id") >= numCentroids)
      .join(broadcast(tinit), Seq("vec_id"), "left_anti")
      .orderBy(md5(col("vec_id").cast("string")).desc, col("vec_id").desc)
      .limit(numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("eq"))
  }

  /** Recall@k per nProbe for TRAINED vs DEFAULT (first-C) centroids —
    * same queries, same k, same probe budgets, the exact brute-force
    * top-k as truth; recall_bp aggregates over all queries so each
    * (centroids, n_probe) row is one point on the quality-for-compute
    * curve.
    *
    * Queries are HELD OUT from both centroid samples (r12 verdict #4:
    * the old vec_id < Q query set was a SUBSET of the first-C default
    * sample, so each query's top probe was its own cell at cos 1.0 —
    * the instrument measured the artifact, default 9000-9250 bp vs
    * trained 2250-5250 bp at sf0.01). With [[heldoutQueries]] neither
    * path serves its own seed, so the rows read quantizer QUALITY:
    * measured sf0.01 (C=16, k=5, Q=8 held-out): trained ≥ default at
    * every probe budget — see NOTES_r13. Both paths still converge to
    * recall 10000 at nProbe = C — spec-pinned. */
  def annRecallTrained(emb: DataFrame, numQueries: Int = 8, k: Int = 5,
                       numCentroids: Int = 16, iters: Int = 2,
                       nProbes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(p => p >= 1 && p <= numCentroids))
    val v = vectors(emb)
    // Q rows, referenced by every serving branch — checkpoint so the
    // corpus-side TakeOrdered does not replay per branch
    val hq = heldoutQueries(emb, numQueries, numCentroids).localCheckpoint()
    val exact = topK(cosineCandidatesQ(v, hq), k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
    def served(tag: String, cents: DataFrame): DataFrame =
      nProbes.map { p =>
        topK(annIvfCandidatesQ(v, cents,
          hq.select(col("query_id").as("vec_id"), col("eq").as("e")), p), k)
          .select(lit(tag).as("centroids"), lit(p).as("n_probe"),
            col("query_id"), col("neighbor_id"))
      }.reduce(_ unionByName _)
    // divide by the ACTUAL held-out count (see pqTrainRecall's note)
    val nq = hq.agg(count(lit(1)).as("n_q"))
    served("default", defaultCentroids(emb, numCentroids))
      .unionByName(served("trained",
        trainIvfCentroidsExact(emb, numCentroids, iters)))
      .join(broadcast(exact), Seq("query_id", "neighbor_id"), "left")
      .groupBy("centroids", "n_probe")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("centroids"), col("n_probe"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def annRecallTrainedQuery(spark: SparkSession, dir: String): DataFrame =
    annRecallTrained(Tables.embeddings(spark, dir))
      .orderBy(col("centroids"), col("n_probe"))

  // ---------------------------------------------------------------- quantize

  /** Symmetric per-vector int8 quantization — the storage/bandwidth
    * lever for an at-scale ANN corpus: q_i = round(x_i * 127 /
    * max|x|), half away from zero, so a float32 embedding column
    * shrinks 4x (and an int8 dot product is SIMD-friendly at serving
    * time). Emits the quantized vector as a csv string plus its
    * element sum (a checksum both engines compute in exact integer
    * arithmetic) and the rounded scale. An all-zero vector quantizes
    * to zeros (scale 0 by convention).
    *
    * Rounding is written as sign(x) * floor(|x|*127/max + 0.5) — an
    * explicit IEEE expression both engines evaluate bit-identically
    * (library round() half-even/half-up conventions differ across
    * engines; floor does not). Map-only, zero shuffles; the transform
    * lambdas here are a one-off storage pass, not the per-query ANN
    * hot path (which stays lambda-free via native expressions). */
  /** The half-away-from-zero int8 component expression — ONE copy
    * shared by quantizeInt8 and the index build (ivfInt8IndexRows), so
    * the rounding mode and the zero-vector convention cannot drift
    * between the stored index and the quantization the oracles/native
    * Int8Quantize pin. */
  private def int8Components(e: Column, maxabs: Column): Column =
    transform(e, x =>
      when(maxabs === 0.0d, lit(0))
        .otherwise((signum(x) *
          floor(abs(x) * lit(127.0d) / maxabs + lit(0.5d)))
          .cast("int")))

  def quantizeInt8(emb: DataFrame): DataFrame =
    vectors(emb)
      .withColumn("maxabs", array_max(transform(col("e"), x => abs(x))))
      .select(col("vec_id"), col("maxabs"),
        int8Components(col("e"), col("maxabs")).as("q"))
      .select(col("vec_id"),
        round(col("maxabs"), 6).as("maxabs_r"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("q_sum"),
        concat_ws(",", col("q")).as("q_csv"))

  def quantizeInt8Query(spark: SparkSession, dir: String): DataFrame =
    quantizeInt8(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  /** Serving DIRECTLY from the stored IVF+int8 index — the read path
    * matching [[ivfInt8IndexRows]]'s write path: queries probe their
    * nProbe nearest cells, candidates come from an equi-join of the
    * broadcast probe frame against the index on `cell` (on the
    * `partitionBy(cell)` parquet layout that join is dynamic partition
    * pruning — only probed cells are READ, the point of the layout),
    * and scoring is the quantized cosine computed from the STORED `q`
    * integers — per-vector scale cancels in cosine, so the index needs
    * no fp32 vectors at all for the shortlist tier. Unlike the ann_*
    * functions that recompute quantization per run, this is the shape
    * that actually serves at 100 TB: the index is built once (nightly
    * bulk + streaming.IvfIngest appends), queries touch ~nProbe/C of
    * it.
    *
    * @param queries (query_id, e) fp32 query vectors — quantized here
    *                with the same native expression the index used */
  def annIvfTopKFromIndex(index: DataFrame, queries: DataFrame,
                          cents: DataFrame, nProbe: Int, k: Int): DataFrame = {
    require(nProbe >= 1 && k >= 1, s"nProbe/k must be >= 1, got $nProbe/$k")
    val scoredCells = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", round(CosineSimilarity(col("e"), col("ce")), 6))
    val wProbe = W.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = scoredCells
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nProbe)
      .select(col("query_id"),
        graft.functions.Int8Quantize(col("e")).as("qq"),
        col("cid").as("cell"))
    val cand = broadcast(probes).join(index, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos",
        round(CosineSimilarity(col("qq"), toDoubleArray(col("q"))), 6))
    topK(cand, k)
  }

  def annIvfFromIndexQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val v = vectors(emb)
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val queries = v.filter(col("vec_id") < 8).toDF("query_id", "e")
    annIvfTopKFromIndex(ivfInt8IndexRows(emb, cents), queries, cents,
        nProbe = 4, k = 3)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The physical ANN index row — (vec_id, cell, scale, q) with the
    * SAME nearest-centroid rule the serving path probes and the SAME
    * half-away-from-zero quantization quantizeInt8 pins: one frame
    * that, written `partitionBy("cell")`, is the on-disk IVF+int8
    * index (serving's cell probe becomes partition pruning). Built
    * here once for batch, and per micro-batch by the streaming ingest
    * (streaming.IvfIngest) — each row depends only on itself plus the
    * static centroid frame, so stream output is batch-identical under
    * any micro-batch split. */
  def ivfInt8IndexRows(emb: DataFrame, cents: DataFrame): DataFrame =
    assignToCells(vectors(emb), cents)
      .withColumn("maxabs", array_max(transform(col("e"), x => abs(x))))
      .select(col("vec_id"), col("cell"),
        round(col("maxabs"), 6).as("scale"),
        int8Components(col("e"), col("maxabs")).as("q"))

  /** Brute-force cosine top-k over the int8-QUANTIZED corpus — the
    * serving path that reads a 4x-smaller vector column (the dominant
    * I/O cost of a 100 TB ANN scan) and accepts quantization noise in
    * the ranking.
    *
    * Exactness contract that makes this oracle-checkable: quantized
    * components are small integers (|q| <= 127), so dot products and
    * squared norms of 64-dim vectors stay <= 64·127² ≈ 1.03e6 —
    * EXACTLY representable in double in any accumulation order. The
    * score is exact integer arithmetic finished by two correctly-
    * rounded IEEE sqrts and one division: bit-replicable cross-engine
    * with no summation-order caveat (unlike the float-input paths,
    * which pin a left-to-right fold order instead).
    *
    * Scale shape: identical to annCosineTopK — bounded query side
    * broadcast, corpus scanned once, the only shuffle is the final
    * per-query top-k. Quantization runs IN the scan stage via the
    * native Int8Quantize expression (lambda-free plan, spec-pinned);
    * the declarative quantizeInt8 above stays the once-per-corpus
    * storage pass. */
  def annInt8TopK(emb: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val qv = vectors(emb).select(col("vec_id"),
      graft.functions.Int8Quantize(col("e")).as("qe"))
    val q = qv.filter(col("vec_id") < numQueries).toDF("query_id", "qq")
    val cand = broadcast(q)
      .join(qv, col("query_id") =!= col("vec_id"))
      .withColumn("cos",
        round(CosineSimilarity(col("qq"), col("qe")), 6))
    topK(cand, k)
  }

  /** TWO-STAGE retrieval — the production serving shape the separate
    * int8 and fp32 baselines exist to feed: stage 1 scans the
    * 4x-smaller QUANTIZED corpus and shortlists the top `m` neighbors
    * per query by quantized cosine (the I/O-bound pass at 100 TB);
    * stage 2 re-scores ONLY the shortlist — |Q|·m rows — with exact
    * fp32 cosine and keeps top `k`. Quantization noise can reorder
    * near-ties inside the shortlist but the rerank restores the exact
    * ordering; a true neighbor is missed only if noise pushes it below
    * rank m, which m >> k makes rare (and AnnRerankSpec pins the
    * m = corpus bound: with a full shortlist the result EQUALS the
    * exact brute-force baseline).
    *
    * Scale shape: stage 1 is the annInt8TopK plan (broadcast bounded
    * query side, one quantized-corpus scan, per-query top-m); stage 2
    * broadcasts the |Q|·m shortlist against the fp32 corpus scan —
    * no shuffle touches full-width vectors until only shortlisted
    * rows remain. */
  def annRerankTopK(emb: DataFrame, numQueries: Int, m: Int,
                    k: Int): DataFrame = {
    require(m >= k, s"shortlist m=$m must be >= k=$k")
    val v = vectors(emb)
    val qv = v.select(col("vec_id"),
      graft.functions.Int8Quantize(col("e")).as("qe"))
    val q8 = qv.filter(col("vec_id") < numQueries).toDF("query_id", "qq")
    val wq = W.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("vec_id"))
    val shortlist = broadcast(q8)
      .join(qv, col("query_id") =!= col("vec_id"))
      .withColumn("qcos",
        round(CosineSimilarity(col("qq"), col("qe")), 6))
      .select(col("query_id"), col("vec_id"),
        row_number().over(wq).as("prnk"))
      .filter(col("prnk") <= m)
      .select("query_id", "vec_id")
    val qf = v.filter(col("vec_id") < numQueries).toDF("query_id", "eq")
    val cand = v
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos",
        round(CosineSimilarity(col("eq"), col("e")), 6))
    topK(cand, k)
  }

  def annRerankTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annRerankTopK(Tables.embeddings(spark, dir),
      numQueries = 8, m = 20, k = 5)
      .orderBy(col("query_id"), col("rnk"))

  /** Product-quantization ANN (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search") — the compression
    * tier BELOW int8: the vector splits into numSub subspaces, each
    * encoded as the id of its nearest codeword from a numCodes-entry
    * per-subspace codebook, so a 64-dim fp32 vector stores as 8
    * one-byte codes — 32x less index I/O than fp32, 8x less than
    * int8. Scoring is ADC (asymmetric distance computation): per
    * query, ONE numSub×numCodes table of query-subvector·codeword
    * dots; a corpus vector's score is numSub table LOOKUPS summed —
    * the original vector is never touched at serving time.
    *
    * Determinism contract (the family's usual): codewords are the
    * deterministic `vec_id < numCodes` sub-slices (production plugs a
    * trained codebook into the same plan — the trainIvfCentroids
    * convention); encoding picks the min rounded-6 L2 distance², ties
    * to smallest code id; each ADC table entry and each per-sub
    * reconstruction norm² rounds ONCE to integer micro-units, so a
    * vector's dot and recon-norm² are BIGINT sums — exact in any
    * accumulation order — finished by one IEEE sqrt + divide both
    * engines compute identically. Vectors sharing a code share a
    * score for every query, BY CONSTRUCTION (spec-pinned): that loss
    * of resolution is exactly what was compressed away, and the fp32
    * rerank tier (annRerankTopK) exists to restore it.
    *
    * Scale shape: the codebook (numSub·numCodes rows) broadcasts;
    * encoding is one corpus scan — numSub in-row slices, broadcast
    * codebook join, map-side-combined per-(vec, sub) argmin (the
    * assignToCells discipline); the stored code frame (numSub small
    * ints per vector) IS the index; serving joins codes against the
    * broadcast ADC table on (sub, cid) and map-side-combines the
    * numSub partial sums — no shuffle ever carries a vector wider
    * than its codes. */
  /** The default (data-seeded) PQ codebook: the first numCodes
    * vectors' sub-slices. */
  private def pqDefaultCodebook(v: DataFrame, numSub: Int, subDim: Int,
                                numCodes: Int): DataFrame = {
    val subs = explode(sequence(lit(0), lit(numSub - 1)))
    v.filter(col("vec_id") < numCodes)
      .select(col("vec_id").as("cid"), subs.as("sub"), col("e"))
      .select(col("sub"), col("cid"),
        slice(col("e"), col("sub") * subDim + 1, lit(subDim)).as("c"))
  }

  /** Encode + reconstructed norms against an EXPLICIT codebook
    * (sub, cid, c) — shared by the default and trained paths. The
    * code frame IS the PQ index (M small ints per vector): it
    * localCheckpoints so its two consumers (the ADC scan and the
    * reconstructed norms) and any rerank stage read the materialized
    * index instead of replaying the corpus encode — the production
    * shape, where the index is built once and served many times (the
    * ann_ivf_from_index contract; without this the composed IVF+PQ
    * plan replayed the corpus scan 26 times). */
  private def pqPartsWith(v: DataFrame, cb: DataFrame, numSub: Int,
                          subDim: Int): (DataFrame, DataFrame) = {
    val subs = explode(sequence(lit(0), lit(numSub - 1)))
    val enc = v.select(col("vec_id"), subs.as("sub"), col("e"))
      .select(col("vec_id"), col("sub"),
        slice(col("e"), col("sub") * subDim + 1, lit(subDim)).as("x"))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2r",
        round(dot(col("x"), col("x")) + dot(col("c"), col("c"))
          - lit(2.0d) * dot(col("x"), col("c")), 6))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2r"), col("cid"))).as("cid"))
      .localCheckpoint()
    val r2 = enc.join(broadcast(cb), Seq("sub", "cid"))
      .groupBy(col("vec_id"))
      .agg(sum(round(dot(col("c"), col("c")) * lit(1000000.0d)).cast("long"))
        .as("r2m"))
    (enc, r2)
  }

  /** The PQ model parts over (vec_id, e): per-subspace codebook
    * slices, nearest-code assignments (the M-byte codes), and
    * reconstructed-norm micro sums — shared by the flat ADC scan
    * (annPqTopK) and the IVF-pruned serving stack (annIvfPqTopK). */
  private def pqParts(v: DataFrame, numSub: Int, subDim: Int,
                      numCodes: Int): (DataFrame, DataFrame, DataFrame) = {
    val cb = pqDefaultCodebook(v, numSub, subDim, numCodes)
    val (enc, r2) = pqPartsWith(v, cb, numSub, subDim)
    (cb, enc, r2)
  }

  /** TRAINED PQ codebooks — per-subspace Lloyd iterations in EXACT
    * integer micro units, the trainIvfCentroidsExact determinism
    * discipline pointed at the PQ objective (L2 on sub-slices, not
    * cosine): micro-int subvectors (|x| ≲ 2·10⁶ after floored means),
    * squared distances are BIGINT sums ≤ ~3.5·10¹³ (zip_with fold, no
    * doubles anywhere in assignment), argmin ties (d2 asc, cid asc),
    * update = per-(sub, cid, dim) FLOORED integer mean — so training
    * itself replays bit-for-bit in the DuckDB oracle. All numSub
    * k-means run as ONE keyed job per iteration: assignment is a
    * broadcast join on `sub` (the codebook frame is numSub·numCodes
    * rows — model-sized), the update one map-side-combined groupBy.
    * Init: the md5-ordered first numCodes vectors' sub-slices (the IVF
    * trainer's sampling rule). Empty codewords drop out of later
    * rounds in both engines identically. Exact while per-(sub,cid)
    * assigned mass stays under ~9·10⁹ vectors (the sum-of-micro 2^53
    * bound). Codewords ship back in fp scale via the exact /10⁶. */
  /** The per-subspace integer Lloyd CORE over an arbitrary micro-int
    * frame (vec_id, em: array<long>) — ONE loop for the raw-vector
    * codebooks (pqTrainCodebook) and the residual ones
    * (pqTrainResidualCodebook): slices to (vec_id, sub, xm), inits
    * from the md5-ordered first numCodes vec_ids, iterates BIGINT-L2
    * assignment (ties cid asc) + floored integer means. Returns
    * (sub, cid, cm: array<long>) in the INPUT's integer scale. */
  private def pqLloydOnMicro(vm: DataFrame, numSub: Int, subDim: Int,
                             numCodes: Int, iters: Int): DataFrame = {
    require(numSub >= 1 && subDim >= 1 && numCodes >= 1 && iters >= 0)
    val subs = explode(sequence(lit(0), lit(numSub - 1)))
    val vms = vm
      .select(col("vec_id"), subs.as("sub"), col("em"))
      .select(col("vec_id"), col("sub"),
        slice(col("em"), col("sub") * subDim + 1, lit(subDim)).as("xm"))
      .localCheckpoint()
    val wInit = W.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    val init = vm.select(col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(numCodes)
      .withColumn("cid", row_number().over(wInit).cast("long"))
    var cents = vms.join(broadcast(init), "vec_id")
      .select(col("sub"), col("cid"), col("xm").as("cm"))
      .localCheckpoint()
    val sumCols = (0 until subDim).map(i =>
      sum(element_at(col("xm"), i + 1)).as(s"s$i")) :+
      count(lit(1)).as("n")
    for (_ <- 1 to iters) {
      val assigned = vms.join(broadcast(cents), Seq("sub"))
        .withColumn("d2", aggregate(
          zip_with(col("xm"), col("cm"), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, y) => acc + y))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
          first(col("xm")).as("xm"))
      cents = assigned.groupBy("sub", "cid")
        .agg(sumCols.head, sumCols.tail: _*)
        .select(col("sub"), col("cid"),
          array((0 until subDim).map(i =>
            floor(col(s"s$i").cast("double") / col("n")).cast("long")): _*)
            .as("cm"))
        .localCheckpoint()
    }
    cents
  }

  def pqTrainCodebook(emb: DataFrame, numSub: Int = 8, subDim: Int = 8,
                      numCodes: Int = 16, iters: Int = 2): DataFrame =
    pqLloydOnMicro(
      vectors(emb).select(col("vec_id"),
        transform(col("e"), x => round(x * lit(1000000.0d)).cast("long"))
          .as("em")),
      numSub, subDim, numCodes, iters)
      .select(col("sub"), col("cid"),
        transform(col("cm"), x => x.cast("double") / lit(1000000.0d))
          .as("c"))

  /** The flat ADC top-k chain against an explicit codebook and an
    * explicit (query_id, eq) frame — shared by the default-codebook
    * query, the trained one, and the held-out recall eval. */
  private def pqAdcTopKQ(v: DataFrame, cb: DataFrame, q: DataFrame,
                         k: Int, numSub: Int, subDim: Int): DataFrame = {
    val (enc, r2) = pqPartsWith(v, cb, numSub, subDim)
    val tab = pqQueryTabQ(q, cb, subDim)
    val sc = enc.join(broadcast(tab), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), first(col("qn")).as("qn"))
    val cand = sc.join(r2, "vec_id")
      .withColumn("cos", pqAdcCos(col("dm"), col("qn"), col("r2m")))
    topK(cand, k)
  }

  private def pqAdcTopK(v: DataFrame, cb: DataFrame, numQueries: Int,
                        k: Int, numSub: Int, subDim: Int): DataFrame =
    pqAdcTopKQ(v, cb, v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("eq")),
      k, numSub, subDim)

  /** ann_pq_trained: the flat ADC scan served from TRAINED codebooks
    * — same bytes per vector, better codewords. */
  def annPqTrained(emb: DataFrame, numQueries: Int = 8, k: Int = 3,
                   numSub: Int = 8, subDim: Int = 8, numCodes: Int = 16,
                   iters: Int = 2): DataFrame =
    pqAdcTopK(vectors(emb),
      pqTrainCodebook(emb, numSub, subDim, numCodes, iters),
      numQueries, k, numSub, subDim)

  def annPqTrainedQuery(spark: SparkSession, dir: String): DataFrame =
    annPqTrained(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("rnk"))

  /** Does TRAINING the codebook buy recall at equal bytes? Default
    * (data-seeded) vs Lloyd-trained ADC top-k, both against the exact
    * fp32 truth — the measured justification (or refutation) of the
    * training pass, the ann_recall_trained instrument pointed at PQ.
    *
    * Queries are HELD OUT (the r12 de-artifacting rule): disjoint from
    * BOTH the default codebook sample (vec_id < numCodes — those
    * queries' subvectors ARE default codewords, encoding losslessly
    * and handing the default an artifactual win) and the trained init
    * sample (the md5-ASC first numCodes). */
  def pqTrainRecall(emb: DataFrame, numQueries: Int = 8, k: Int = 5,
                    numSub: Int = 8, subDim: Int = 8, numCodes: Int = 16,
                    iters: Int = 2): DataFrame = {
    val v = vectors(emb)
    val hq = heldoutQueries(emb, numQueries, numCodes).localCheckpoint()
    // recall_bp divides by the ACTUAL held-out count, not numQueries·k:
    // heldoutQueries returns fewer than numQueries rows when the corpus
    // barely exceeds numCodes + the init sample, and a constant
    // denominator would silently deflate recall and break the
    // nProbe=C→10000 convergence invariant (r13 ADVICE)
    val nq = hq.agg(count(lit(1)).as("n_q"))
    val truth = topK(cosineCandidatesQ(v, hq), k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
      .localCheckpoint()
    def served(tag: String, cb: DataFrame) =
      pqAdcTopKQ(v, cb, hq, k, numSub, subDim)
        .select(lit(tag).as("codebook"), col("query_id"),
          col("neighbor_id"))
    served("default", pqDefaultCodebook(v, numSub, subDim, numCodes))
      .unionByName(served("trained",
        pqTrainCodebook(emb, numSub, subDim, numCodes, iters)))
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("codebook")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("codebook"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def pqTrainRecallQuery(spark: SparkSession, dir: String): DataFrame =
    pqTrainRecall(Tables.embeddings(spark, dir)).orderBy(col("codebook"))

  /** Per-query ADC lookup tables (query_id, sub, cid, qn, tm) — the
    * micro-integer dot of each query's sub-slice with every code.
    * `q` is an explicit (query_id, eq) frame. */
  private def pqQueryTabQ(q: DataFrame, cb: DataFrame,
                          subDim: Int): DataFrame =
    q.select(col("query_id"), col("eq"), l2norm(col("eq")).as("qn"))
      .crossJoin(cb)
      .select(col("query_id"), col("sub"), col("cid"), col("qn"),
        round(dot(slice(col("eq"), col("sub") * subDim + 1, lit(subDim)),
          col("c")) * lit(1000000.0d)).cast("long").as("tm"))

  private def pqQueryTab(v: DataFrame, cb: DataFrame, numQueries: Int,
                         subDim: Int): DataFrame =
    pqQueryTabQ(v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("eq")), cb, subDim)

  /** The ADC cosine from summed table entries + reconstructed norm. */
  private def pqAdcCos(dm: Column, qn: Column, r2m: Column): Column =
    when(r2m <= 0 || qn === 0.0d, lit(0.0d))
      .otherwise(round((dm / lit(1000000.0d)) /
        (qn * sqrt(r2m / lit(1000000.0d))), 6))

  def annPqTopK(emb: DataFrame, numQueries: Int, k: Int,
                numSub: Int = 8, subDim: Int = 8,
                numCodes: Int = 16): DataFrame = {
    require(numQueries >= 1 && k >= 1, s"bad numQueries=$numQueries/k=$k")
    require(numSub >= 1 && subDim >= 1 && numCodes >= 1,
      s"bad PQ shape $numSub x $subDim x $numCodes")
    val v = vectors(emb)
    val (cb, enc, r2) = pqParts(v, numSub, subDim, numCodes)
    val tab = pqQueryTab(v, cb, numQueries, subDim)
    val sc = enc.join(broadcast(tab), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), first(col("qn")).as("qn"))
    val cand = sc.join(r2, "vec_id")
      .withColumn("cos", pqAdcCos(col("dm"), col("qn"), col("r2m")))
    topK(cand, k)
  }

  /** The full production serving stack — IVF prune → PQ-ADC scan →
    * exact rerank (the FAISS IVFADC/IVFPQ composition, Jégou et al.
    * 2011): stage 1 bounds candidates to the probed cells (never the
    * corpus), stage 2 scores those candidates from the M-byte codes
    * and the query's code tables — no full-width vector is touched
    * per candidate — and stage 3 rescores only the top-m shortlist in
    * exact fp32 so reported scores are true cosines.
    *
    * Scale shape: the candidate join is the IVF equi-join on cell;
    * ADC scoring joins candidates to the code frame (M rows per
    * vector) against a BROADCAST query table (|Q|·M·numCodes rows —
    * model-sized); the rerank touches m vectors per query. At corpus
    * scale the win over annIvfRerankTopK's int8 shortlist is
    * bandwidth: M bytes per candidate instead of the full int8
    * vector. */
  /** The composed serving chain with EXPLICIT model tables (coarse
    * centroids + PQ codebook) — one plan for the data-seeded default
    * (annIvfPqTopK) and the fully-trained compose (annIvfPqTrained),
    * so training swaps the MODELS, never the serving semantics. */
  def annIvfPqTopKWith(emb: DataFrame, cents: DataFrame, cb: DataFrame,
                       numQueries: Int, m: Int, k: Int, nProbe: Int,
                       numSub: Int, subDim: Int): DataFrame = {
    require(m >= k, s"shortlist m=$m must be >= k=$k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val v = vectors(emb)
    val (assigned, probes) = ivfIndex(emb, cents, numQueries, nProbe)
    val candIds = broadcast(probes.select(col("query_id"), col("probe")))
      .join(assigned.select(col("vec_id"), col("cell")),
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id")
    val (enc, r2) = pqPartsWith(v, cb, numSub, subDim)
    val tab = pqQueryTab(v, cb, numQueries, subDim)
    val sc = candIds.join(enc, "vec_id")
      .join(broadcast(tab), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), first(col("qn")).as("qn"))
    val wm = W.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("vec_id"))
    val shortlist = sc.join(r2, "vec_id")
      .withColumn("pcos", pqAdcCos(col("dm"), col("qn"), col("r2m")))
      .select(col("query_id"), col("vec_id"),
        row_number().over(wm).as("prnk"))
      .filter(col("prnk") <= m)
      .select("query_id", "vec_id")
    val qf = v.filter(col("vec_id") < numQueries).toDF("query_id", "eq")
    val cand = v
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
    topK(cand, k)
  }

  def annIvfPqTopK(emb: DataFrame, numQueries: Int = 8, m: Int = 12,
                   k: Int = 3, numCentroids: Int = 16, nProbe: Int = 4,
                   numSub: Int = 8, subDim: Int = 8,
                   numCodes: Int = 16): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids=$numCentroids], got $nProbe")
    annIvfPqTopKWith(emb, defaultCentroids(emb, numCentroids),
      pqDefaultCodebook(vectors(emb), numSub, subDim, numCodes),
      numQueries, m, k, nProbe, numSub, subDim)
  }

  def annIvfPqTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annIvfPqTopK(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("rnk"))

  /** ann_ivf_pq_trained — the serving stack trained END-TO-END (r13
    * verdict #2): BOTH model tiers come from their exact-integer
    * trainers — the coarse quantizer from [[trainIvfCentroidsExact]]
    * (micro-int Lloyd, oracle-replayable) and the PQ codebooks from
    * [[pqTrainCodebook]] (per-subspace integer Lloyd on the L2
    * objective) — composed through the UNCHANGED annIvfPqTopKWith
    * serving plan. The r13 compose served data-seeded models by
    * choice (its oracle pinned the compose); this entry's oracle
    * replays BOTH trainers AND the serving chain, so a green row
    * certifies the production stack end to end: train coarse → train
    * PQ → assign → probe → encode → ADC → rerank. At iters=0 both
    * trainers return their md5-sample seeds and the compose is pinned
    * ≡ annIvfPqTopKWith on those seed tables (AnnIvfPqTrainedSpec). */
  def annIvfPqTrained(emb: DataFrame, numQueries: Int = 8, m: Int = 12,
                      k: Int = 3, numCentroids: Int = 16, nProbe: Int = 4,
                      numSub: Int = 8, subDim: Int = 8, numCodes: Int = 16,
                      iters: Int = 2): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids=$numCentroids], got $nProbe")
    annIvfPqTopKWith(emb,
      trainIvfCentroidsExact(emb, numCentroids, iters),
      pqTrainCodebook(emb, numSub, subDim, numCodes, iters),
      numQueries, m, k, nProbe, numSub, subDim)
  }

  def annIvfPqTrainedQuery(spark: SparkSession, dir: String): DataFrame =
    annIvfPqTrained(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("rnk"))

  // ------------------------------------------------- residual IVFADC

  /** (vec_id, em) micro-integer view — vectors rounded ONCE to 10⁻⁶
    * units; all residual-PQ arithmetic stays in BIGINT from here. */
  private def microVectors(v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      transform(col("e"), x => round(x * lit(1000000.0d)).cast("long"))
        .as("em"))

  /** The residual-PQ index over an assigned frame: codes
    * (vec_id, cell, sub, cid) and reconstruction slices
    * xhat(cell, sub, cid, xh) — the TRUE FAISS IVFADC semantic (Jégou
    * et al. 2011 §III): PQ encodes the RESIDUAL x − q_coarse(x), not x.
    * Residuals concentrate near zero once the coarse quantizer has
    * soaked up the between-cell variance, so the same M×numCodes bytes
    * spend their resolution on a far smaller ball — the recall-at-
    * equal-bytes win pqResidualRecall measures.
    *
    * Exactness: micro-int vectors minus micro-int centroids give BIGINT
    * residuals; encode argmin is a BIGINT L2 (no rounding anywhere),
    * ties to the smallest code id; reconstruction x̂ = c_cell + ŵ stays
    * BIGINT. Bounds: |x̂| ≤ 3·10⁶ per component ⇒ recon norm² ≤
    * 64·9·10¹² < 2⁵³ (exact in double for the final IEEE sqrt) and every
    * ADC dot ≤ 2·10¹⁴ — far inside BIGINT.
    *
    * Scale shape: the codebook is numSub·numCodes rows (seeded from
    * the residuals of vectors [seedFrom, seedFrom + numCodes) —
    * pqDefaultCodebook's prefix convention SHIFTED past the centroid
    * sample, because a centroid vector's residual against its own
    * cell is exactly ZERO: seeding from vec_id < numCodes when those
    * ids are also the default centroids yields an all-zero codebook
    * and the "residual" scores degenerate to bare cell centroids —
    * caught by pqResidualRecall's first measurement); encoding is one
    * pass over the assigned corpus with a broadcast codebook join and
    * a map-side-combined per-(vec, sub) argmin; xhat is
    * C·numSub·numCodes rows — model-sized — built entirely from
    * broadcast frames. */
  /** Micro-int centroid frame (cell, cm) from a RAW-scale centroid
    * table (components ≤ 1 — defaultCentroids). The trained exact
    * trainer's output is ALREADY micro-valued and must cast, not
    * re-scale (residuals are scale-sensitive where cosines are not —
    * see annIvfPqResidualTrained). */
  private def microCentsOf(cents: DataFrame): DataFrame =
    // guarded at THIS shared boundary (r15 review): every caller —
    // including the SERVE path annIvfPqResidualFromIndex, which the
    // per-entry guards below don't reach — expects RAW-scale
    // centroids; the trained convention (already micro) CASTs and
    // never comes through here. Passing micro values would silently
    // re-scale by 1e6 and corrupt every residual.
    guardRawScaleCents(cents).select(col("cid").as("cell"),
      transform(col("ce"), x => round(x * lit(1000000.0d)).cast("long"))
        .as("cm"))

  /** (vec_id, cell, rm) — each assigned vector's BIGINT micro residual
    * against its cell centroid. */
  private def residualFrame(assigned: DataFrame, cm: DataFrame): DataFrame =
    assigned
      .select(col("vec_id"), col("cell"),
        transform(col("e"), x => round(x * lit(1000000.0d)).cast("long"))
          .as("em"))
      .join(broadcast(cm), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("em"), col("cm"), (x, c) => x - c).as("rm"))

  /** Data-seeded residual codebook: the residuals of vectors
    * [seedFrom, seedFrom + numCodes), sub-sliced. */
  private def residualSeedCodebook(rm: DataFrame, numSub: Int, subDim: Int,
                                   numCodes: Int, seedFrom: Int): DataFrame = {
    val subs = explode(sequence(lit(0), lit(numSub - 1)))
    rm.filter(col("vec_id") >= seedFrom &&
        col("vec_id") < seedFrom + numCodes)
      .select(col("vec_id").as("cid"), subs.as("sub"), col("rm"))
      .select(col("sub"), col("cid"),
        slice(col("rm"), col("sub") * subDim + 1, lit(subDim)).as("wm"))
  }

  /** TRAINED residual codebook — the integer Lloyd core pointed at
    * the residual frame: codewords minimize within-cell-residual L2,
    * which is exactly what FAISS's IVFADC trains (PQ on residuals).
    * Output stays in micro-int scale (sub, cid, wm). */
  def pqTrainResidualCodebook(rm: DataFrame, numSub: Int = 8,
                              subDim: Int = 8, numCodes: Int = 16,
                              iters: Int = 2): DataFrame =
    pqLloydOnMicro(rm.select(col("vec_id"), col("rm").as("em")),
      numSub, subDim, numCodes, iters)
      .select(col("sub"), col("cid"), col("cm").as("wm"))

  /** Encode + reconstruction slices against an explicit residual
    * codebook (sub, cid, wm): codes (vec_id, cell, sub, cid) and
    * xhat(cell, sub, cid, xh = c_sub + ŵ). */
  private def residualEncodeXhat(rm: DataFrame, cm: DataFrame,
                                 cb: DataFrame, numSub: Int,
                                 subDim: Int): (DataFrame, DataFrame) = {
    val subs = explode(sequence(lit(0), lit(numSub - 1)))
    val codes = rm
      .select(col("vec_id"), col("cell"), subs.as("sub"), col("rm"))
      .select(col("vec_id"), col("cell"), col("sub"),
        slice(col("rm"), col("sub") * subDim + 1, lit(subDim)).as("x"))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", aggregate(
        zip_with(col("x"), col("wm"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, y) => acc + y))
      .groupBy(col("vec_id"), col("cell"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      .localCheckpoint()
    (codes, residualXhatOf(cm, cb, numSub, subDim))
  }

  /** Reconstruction slices xhat(cell, sub, cid, xh = c_sub + ŵ) from
    * the MODEL tables alone (no corpus) — the piece a stored-index
    * server rebuilds per query batch. */
  private def residualXhatOf(cm: DataFrame, cb: DataFrame, numSub: Int,
                             subDim: Int): DataFrame = {
    val subs = explode(sequence(lit(0), lit(numSub - 1)))
    cm.select(col("cell"), subs.as("sub"), col("cm"))
      .select(col("cell"), col("sub"),
        slice(col("cm"), col("sub") * subDim + 1, lit(subDim)).as("cs"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("cell"), col("sub"), col("cid"),
        zip_with(col("cs"), col("wm"), (a, b) => a + b).as("xh"))
  }

  private def residualPqParts(assigned: DataFrame, cents: DataFrame,
                              numSub: Int, subDim: Int, numCodes: Int,
                              seedFrom: Int): (DataFrame, DataFrame) = {
    val cm = microCentsOf(cents)
    val rm = residualFrame(assigned, cm)
    val cb = residualSeedCodebook(rm, numSub, subDim, numCodes, seedFrom)
    residualEncodeXhat(rm, cm, cb, numSub, subDim)
  }

  /** The residual-ADC cosine: BIGINT dot and norms², finished by one
    * IEEE sqrt+divide both engines compute identically (operands are
    * exact integers < 2⁵³ passed through double exactly). */
  private def resAdcCos(dm: Column, q2m: Column, r2m: Column): Column =
    when(r2m <= 0 || q2m <= 0, lit(0.0d))
      .otherwise(round(dm.cast("double")
        / (sqrt(q2m.cast("double")) * sqrt(r2m.cast("double"))), 6))

  /** The per-(query, cell) ADC tables + candidate scoring shared by
    * the serving query and the recall eval: `qm` is (query_id, qm,
    * q2m), `candIds` the IVF-probed (query_id, vec_id) pairs. Emits
    * (query_id, vec_id, cos) — the ADC estimate, BEFORE any rerank. */
  private def residualAdcScores(candIds: DataFrame, codes: DataFrame,
                                xhat: DataFrame, qm: DataFrame,
                                subDim: Int): DataFrame = {
    val rr = xhat.select(col("cell"), col("sub"), col("cid"),
      aggregate(col("xh"), lit(0L), (acc, y) => acc + y * y).as("rr"))
    val r2 = codes.join(broadcast(rr), Seq("cell", "sub", "cid"))
      .groupBy("vec_id").agg(sum(col("rr")).as("r2m"))
    val tab = qm.crossJoin(broadcast(xhat))
      .select(col("query_id"), col("q2m"), col("cell"), col("sub"),
        col("cid"),
        aggregate(
          zip_with(slice(col("qm"), col("sub") * subDim + 1, lit(subDim)),
            col("xh"), (a, b) => a * b),
          lit(0L), (acc, y) => acc + y).as("tm"))
    candIds.join(codes.select("vec_id", "cell", "sub", "cid"), "vec_id")
      .join(broadcast(tab), Seq("query_id", "cell", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), first(col("q2m")).as("q2m"))
      .join(r2, "vec_id")
      .withColumn("cos", resAdcCos(col("dm"), col("q2m"), col("r2m")))
      .select("query_id", "vec_id", "cos")
  }

  /** ann_ivf_pq_residual — IVFADC serving with RESIDUAL-encoded PQ
    * (r13 verdict #1): assign → residual → encode → per-(query, cell)
    * ADC → shortlist → exact fp32 rerank. Identical IVF probe chain
    * and rerank tail to annIvfPqTopK; only the code semantics change
    * (codes address residuals, so the ADC tables carry the cell
    * centroid inside x̂ = c + ŵ and become per-(query, cell) —
    * |Q|·C·M·numCodes rows, still model-sized and broadcast). */
  def annIvfPqResidualTopK(emb: DataFrame, numQueries: Int = 8,
                           m: Int = 12, k: Int = 3, numCentroids: Int = 16,
                           nProbe: Int = 4, numSub: Int = 8,
                           subDim: Int = 8, numCodes: Int = 16): DataFrame = {
    require(m >= k, s"shortlist m=$m must be >= k=$k")
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids], got $nProbe")
    val v = vectors(emb)
    val cents = defaultCentroids(emb, numCentroids)
    val (assigned, probes) = ivfIndex(emb, cents, numQueries, nProbe)
    val candIds = broadcast(probes.select(col("query_id"), col("probe")))
      .join(assigned.select(col("vec_id"), col("cell")),
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id")
    val (codes, xhat) = residualPqParts(assigned, cents, numSub, subDim,
      numCodes, seedFrom = numCentroids)
    val qm = microVectors(v.filter(col("vec_id") < numQueries))
      .select(col("vec_id").as("query_id"), col("em").as("qm"))
      .withColumn("q2m",
        aggregate(col("qm"), lit(0L), (acc, y) => acc + y * y))
    val wm = W.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val shortlist = residualAdcScores(candIds, codes, xhat, qm, subDim)
      .select(col("query_id"), col("vec_id"),
        row_number().over(wm).as("prnk"))
      .filter(col("prnk") <= m)
      .select("query_id", "vec_id")
    val qf = v.filter(col("vec_id") < numQueries).toDF("query_id", "eq")
    val cand = v
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
    topK(cand, k)
  }

  def annIvfPqResidualTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annIvfPqResidualTopK(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("rnk"))

  /** Does RESIDUAL encoding buy recall at equal bytes — and how does
    * the answer move with the PROBE BUDGET? Raw-vector PQ vs residual
    * PQ, BOTH inside the same IVF probe chain (same cells, same
    * candidates, same M×numCodes bytes per vector), top-k served
    * directly from the ADC estimate — no rerank, so the rows measure
    * the CODES, not the fp32 tail — against the exact brute-force
    * truth on HELD-OUT queries (disjoint from the centroid sample and
    * both codebook seed samples; the r12 de-artifacting rule), at
    * EVERY nProbe in one pass: candidates carry the probe RANK of the
    * cell that contributed them, the ADC scores each (query, vec)
    * once at the maximum budget, and each budget's top-k is a rank
    * filter over that one scored frame (the tau_sweep
    * one-candidate-pass-for-the-whole-curve discipline). The
    * literature (Jégou 2011 Fig.2) promises the residual win; on
    * isotropic synthetics the honest measured answer may be a null —
    * either way the curve records it per budget. */
  def pqResidualRecall(emb: DataFrame, numQueries: Int = 32, k: Int = 5,
                       numCentroids: Int = 16,
                       nProbes: Seq[Int] = Seq(1, 2, 4),
                       numSub: Int = 8, subDim: Int = 8,
                       numCodes: Int = 16): DataFrame = {
    require(nProbes.nonEmpty &&
      nProbes.forall(p => p >= 1 && p <= numCentroids))
    val maxP = nProbes.max
    val v = vectors(emb)
    val cents = defaultCentroids(emb, numCentroids)
    // held out past BOTH seed prefixes: the centroid sample [0, C) and
    // the residual-codebook sample [C, C + numCodes)
    val hq = heldoutQueries(emb, numQueries,
      numCentroids + numCodes).localCheckpoint()
    val nq = hq.agg(count(lit(1)).as("n_q"))
    val truth = topK(cosineCandidatesQ(v, hq), k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
      .localCheckpoint()
    // probes at the MAX budget, probe rank kept for the per-budget cut
    val wProbe = W.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = hq.crossJoin(broadcast(cents))
      .withColumn("ccos", round(CosineSimilarity(col("eq"), col("ce")), 6))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= maxP)
      .select(col("query_id"), col("cid").as("probe"), col("prnk"))
    val assigned = assignToCells(v, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    val candIds = broadcast(probes)
      .join(assigned.select(col("vec_id"), col("cell")),
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id", "prnk")
      .localCheckpoint()
    val candFlat = candIds.select("query_id", "vec_id")
    // raw branch: flat PQ codes, scored once over the max-budget set
    val cbRaw = pqDefaultCodebook(v, numSub, subDim, numCodes)
    val (encRaw, r2Raw) = pqPartsWith(v, cbRaw, numSub, subDim)
    val tabRaw = pqQueryTabQ(hq, cbRaw, subDim)
    val rawScored = candFlat.join(encRaw, "vec_id")
      .join(broadcast(tabRaw), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), first(col("qn")).as("qn"))
      .join(r2Raw, "vec_id")
      .withColumn("cos", pqAdcCos(col("dm"), col("qn"), col("r2m")))
    // residual branch: same candidates, residual codes, scored once
    val (codes, xhat) = residualPqParts(assigned, cents, numSub, subDim,
      numCodes, seedFrom = numCentroids)
    val qmh = hq
      .select(col("query_id"),
        transform(col("eq"), x => round(x * lit(1000000.0d)).cast("long"))
          .as("qm"))
      .withColumn("q2m",
        aggregate(col("qm"), lit(0L), (acc, y) => acc + y * y))
    val resScored = residualAdcScores(candFlat, codes, xhat, qmh, subDim)
    def served(tag: String, scored: DataFrame) = {
      val ranked = scored.join(candIds, Seq("query_id", "vec_id"))
        .localCheckpoint()
      nProbes.map { p =>
        topK(ranked.filter(col("prnk") <= p), k)
          .select(lit(tag).as("encoding"), lit(p).as("n_probe"),
            col("query_id"), col("neighbor_id"))
      }.reduce(_ unionByName _)
    }
    served("raw", rawScored)
      .unionByName(served("residual", resScored))
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("encoding", "n_probe")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("encoding"), col("n_probe"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def pqResidualRecallQuery(spark: SparkSession, dir: String): DataFrame =
    pqResidualRecall(Tables.embeddings(spark, dir))
      .orderBy(col("encoding"), col("n_probe"))

  /** The OTHER serving knob's curve (r14 verdict #6): pqResidualRecall
    * sweeps the probe budget (nProbe); this sweeps the RERANK budget —
    * shortlist depth m, the number of ADC-ranked candidates the exact
    * fp32 tail rescores per query. One residual-ADC scored pass ranks
    * the candidates once at the MAXIMUM budget; each m is a rank
    * filter over that one frame, and ONE exact-scored frame (built at
    * max m) serves every budget's rerank (the tau_sweep
    * one-pass-for-the-whole-curve discipline, third instance).
    *
    * Unlike the nProbe curve, monotonicity here IS a true invariant:
    * shortlists nest in m and the rerank orders by EXACT cosine (the
    * truth's own order, rounded-6 + vec_id tiebreak both sides), so a
    * served true neighbor can only be displaced by a vector that
    * precedes it in the exact order — which is then itself a truth row.
    * Per-query hits are non-decreasing in m — spec-pinned as a strict
    * invariant (Batch15Spec), not a data-pinned observation. */
  def rerankBudgetRecall(emb: DataFrame, numQueries: Int = 32, k: Int = 5,
                         ms: Seq[Int] = Seq(5, 10, 20, 40),
                         numCentroids: Int = 16, nProbe: Int = 4,
                         numSub: Int = 8, subDim: Int = 8,
                         numCodes: Int = 16): DataFrame = {
    require(ms.nonEmpty && ms.forall(_ >= k),
      s"every rerank budget must be >= k=$k, got $ms")
    require(ms.distinct.size == ms.size,
      s"rerank budgets must be distinct (a duplicate m double-counts " +
        s"its hits in the groupBy), got $ms")
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids=$numCentroids], got $nProbe")
    val maxM = ms.max
    val v = vectors(emb)
    val cents = defaultCentroids(emb, numCentroids)
    val hq = heldoutQueries(emb, numQueries,
      numCentroids + numCodes).localCheckpoint()
    val nq = hq.agg(count(lit(1)).as("n_q"))
    val truth = topK(cosineCandidatesQ(v, hq), k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
      .localCheckpoint()
    val wProbe = W.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = hq.crossJoin(broadcast(cents))
      .withColumn("ccos", round(CosineSimilarity(col("eq"), col("ce")), 6))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("cid").as("probe"))
    val assigned = assignToCells(v, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    val candIds = broadcast(probes)
      .join(assigned.select(col("vec_id"), col("cell")),
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id")
    val (codes, xhat) = residualPqParts(assigned, cents, numSub, subDim,
      numCodes, seedFrom = numCentroids)
    val qmh = hq
      .select(col("query_id"),
        transform(col("eq"), x => round(x * lit(1000000.0d)).cast("long"))
          .as("qm"))
      .withColumn("q2m",
        aggregate(col("qm"), lit(0L), (acc, y) => acc + y * y))
    val wAdc = W.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val shortRank = residualAdcScores(candIds, codes, xhat, qmh, subDim)
      .select(col("query_id"), col("vec_id"),
        row_number().over(wAdc).as("prnk"))
      .filter(col("prnk") <= maxM)
    // exact rerank scores computed ONCE at the max budget — |Q|·maxM
    // rows; every m reads this frame through a rank filter
    val exact = v.join(broadcast(shortRank), "vec_id")
      .join(broadcast(hq), "query_id")
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
      .select("query_id", "vec_id", "cos", "prnk")
      .localCheckpoint()
    ms.map { m =>
      topK(exact.filter(col("prnk") <= m), k)
        .select(lit(m).as("m"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("m")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("m"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def rerankBudgetRecallQuery(spark: SparkSession, dir: String): DataFrame =
    rerankBudgetRecall(Tables.embeddings(spark, dir)).orderBy(col("m"))

  /** ann_ivf_pq_residual_trained — the COMPLETE FAISS IVFADC
    * production semantic, every tier trained: exact-integer Lloyd
    * coarse centroids (trainIvfCentroidsExact), residuals against
    * THOSE centroids, and a residual codebook from the integer Lloyd
    * core pointed at the residual frame (pqTrainResidualCodebook) —
    * codewords minimize within-cell residual L2, which is what buys
    * recall-at-equal-bytes over both raw-PQ and seeded-residual PQ.
    * Serving is the unchanged residual-ADC chain + exact rerank.
    *
    * Scale caveat, explicit: the trained trainer's centroid output is
    * ALREADY micro-valued, so the residual uses CAST, not ×10⁶ —
    * cosines are scale-invariant but residuals are not; mixing the
    * scales silently destroys the codes (guarded by the iters=0
    * boundary spec, whose seed tables exercise exactly this path). */
  def annIvfPqResidualTrained(emb: DataFrame, numQueries: Int = 8,
                              m: Int = 12, k: Int = 3,
                              numCentroids: Int = 16, nProbe: Int = 4,
                              numSub: Int = 8, subDim: Int = 8,
                              numCodes: Int = 16, iters: Int = 2): DataFrame = {
    require(m >= k, s"shortlist m=$m must be >= k=$k")
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids], got $nProbe")
    val v = vectors(emb)
    val cents = trainIvfCentroidsExact(emb, numCentroids, iters)
    val (assigned, probes) = ivfIndex(emb, cents, numQueries, nProbe)
    val candIds = broadcast(probes.select(col("query_id"), col("probe")))
      .join(assigned.select(col("vec_id"), col("cell")),
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id")
    // trained centroids are micro-valued doubles: CAST to micro longs
    val cm = cents.select(col("cid").as("cell"),
      transform(col("ce"), _.cast("long")).as("cm"))
    val rm = residualFrame(assigned, cm).localCheckpoint()
    val cb = pqTrainResidualCodebook(rm, numSub, subDim, numCodes, iters)
    val (codes, xhat) = residualEncodeXhat(rm, cm, cb, numSub, subDim)
    val qm = microVectors(v.filter(col("vec_id") < numQueries))
      .select(col("vec_id").as("query_id"), col("em").as("qm"))
      .withColumn("q2m",
        aggregate(col("qm"), lit(0L), (acc, y) => acc + y * y))
    val wm = W.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val shortlist = residualAdcScores(candIds, codes, xhat, qm, subDim)
      .select(col("query_id"), col("vec_id"),
        row_number().over(wm).as("prnk"))
      .filter(col("prnk") <= m)
      .select("query_id", "vec_id")
    val qf = v.filter(col("vec_id") < numQueries).toDF("query_id", "eq")
    val cand = v
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
    topK(cand, k)
  }

  def annIvfPqResidualTrainedQuery(spark: SparkSession,
                                   dir: String): DataFrame =
    annIvfPqResidualTrained(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("rnk"))

  /** Seeded-residual vs TRAINED-residual codebooks at equal bytes —
    * the pq_train_recall instrument pointed at the residual tier:
    * same trained coarse quantizer, same candidates (so the row
    * isolates the CODEBOOK-training effect), top-k from the ADC
    * estimate, held-out queries disjoint from the centroid init and
    * both codebook seed/init samples, actual-count denominator. */
  def pqResidualTrainedRecall(emb: DataFrame, numQueries: Int = 8,
                              k: Int = 5, numCentroids: Int = 16,
                              nProbe: Int = 4, numSub: Int = 8,
                              subDim: Int = 8, numCodes: Int = 16,
                              iters: Int = 2): DataFrame = {
    val v = vectors(emb)
    val cents = trainIvfCentroidsExact(emb, numCentroids, iters)
    val hq = heldoutQueries(emb, numQueries,
      numCentroids + numCodes).localCheckpoint()
    val nq = hq.agg(count(lit(1)).as("n_q"))
    val truth = topK(cosineCandidatesQ(v, hq), k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
      .localCheckpoint()
    val (assigned, probes) = ivfIndexQ(v, cents,
      hq.select(col("query_id").as("vec_id"), col("eq").as("e")), nProbe)
    val candIds = broadcast(probes.select(col("query_id"), col("probe")))
      .join(assigned.select(col("vec_id"), col("cell")),
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id")
      .localCheckpoint()
    val cm = cents.select(col("cid").as("cell"),
      transform(col("ce"), _.cast("long")).as("cm"))
    val rm = residualFrame(assigned, cm).localCheckpoint()
    val qmh = hq
      .select(col("query_id"),
        transform(col("eq"), x => round(x * lit(1000000.0d)).cast("long"))
          .as("qm"))
      .withColumn("q2m",
        aggregate(col("qm"), lit(0L), (acc, y) => acc + y * y))
    def branch(tag: String, cb: DataFrame) = {
      val (codes, xhat) = residualEncodeXhat(rm, cm, cb, numSub, subDim)
      topK(residualAdcScores(candIds, codes, xhat, qmh, subDim), k)
        .select(lit(tag).as("codebook"), col("query_id"),
          col("neighbor_id"))
    }
    branch("seeded",
        residualSeedCodebook(rm, numSub, subDim, numCodes,
          seedFrom = numCentroids))
      .unionByName(branch("trained",
        pqTrainResidualCodebook(rm, numSub, subDim, numCodes, iters)))
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("codebook")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("codebook"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def pqResidualTrainedRecallQuery(spark: SparkSession,
                                   dir: String): DataFrame =
    pqResidualTrainedRecall(Tables.embeddings(spark, dir))
      .orderBy(col("codebook"))

  /** The physical residual-PQ index row — (vec_id, cell, codes) with
    * codes[s] = the sub-s codeword id: M small ints per vector, the
    * true IVFADC index payload (M bytes where fp32 stores 4·dim).
    * Written `partitionBy("cell")` the serving probe becomes partition
    * pruning — only probed cells are READ (spec-pinned). The companion
    * model tables (centroids + codebook — model-sized) persist
    * alongside; ivfInt8IndexRows' nightly-bulk contract applies. */
  /** Index rows against an EXPLICIT (frozen) codebook — the per-batch
    * encoder the streaming ingest needs: every output row depends only
    * on its own input row plus the static model frames, so streamed
    * index content is batch-identical under any split. */
  /** The data-seeded residual codebook derived from a corpus — the
    * model frame the nightly bulk persists alongside the index
    * (exposed for the streaming ingest's frozen-model contract). */
  /** RAW-scale guard at the public residual-index boundaries: these
    * entries apply microCentsOf (×10⁶) unconditionally, so a caller
    * passing trainIvfCentroidsExact output — ALREADY micro-valued, the
    * convention annIvfPqResidualTrained hand-handles with a plain CAST
    * — would silently get ~10⁶x-inflated residuals and garbage codes.
    * Unit vectors keep every component ≤ 1, so magnitude ≥ 10³ can
    * only mean a micro-valued frame: fail loudly (the raise_error
    * delimiter discipline) instead of encoding corruption. */
  private def guardRawScaleCents(cents: DataFrame): DataFrame = {
    // two independent micro signals: component magnitude ≥ 1e3 (no raw
    // unit-vector mean reaches it) OR squared L2 norm ≥ 1e10 (micro
    // frames sit near 1e12 REGARDLESS of dimension — the norm catch for
    // very high-dim frames whose every component stays under 1e3). The
    // message names WHICH signal fired — an operator debugging the
    // magnitude claim on a norm-tripped frame would find it false and
    // distrust the guard (r16 review)
    val mag = array_max(transform(col("ce"), x => abs(x)))
    val nrm2 = aggregate(col("ce"), lit(0.0d), (acc, x) => acc + x * x)
    cents.select(col("cid"),
      when(mag >= lit(1000.0d) or nrm2 >= lit(1e10d),
        raise_error(concat(
          lit("residual index: "),
          when(mag >= lit(1000.0d),
            lit("centroid component magnitude >= 1e3"))
            .otherwise(lit("centroid squared L2 norm >= 1e10 (micro " +
              "frames sit near 1e12)")),
          lit(" — this frame looks MICRO-valued (trained); pass " +
            "RAW-scale centroids here, or follow " +
            "annIvfPqResidualTrained's plain-CAST path for trained " +
            "models (cid="),
          col("cid").cast("string"), lit(")"))))
        .otherwise(col("ce")).as("ce"))
  }

  def residualSeedCodebookOf(emb: DataFrame, cents: DataFrame,
                             numSub: Int = 8, subDim: Int = 8,
                             numCodes: Int = 16,
                             seedFrom: Int = 16): DataFrame = {
    val cg = guardRawScaleCents(cents)
    val assigned = assignToCells(vectors(emb), cg)
      .select(col("vec_id"), col("cell"), col("e"))
    residualSeedCodebook(residualFrame(assigned, microCentsOf(cg)),
      numSub, subDim, numCodes, seedFrom)
  }

  private def residualIndexRowsOf(rm: DataFrame, cm: DataFrame,
                                  cb: DataFrame, numSub: Int,
                                  subDim: Int): DataFrame = {
    val (codes, _) = residualEncodeXhat(rm, cm, cb, numSub, subDim)
    codes.groupBy(col("vec_id"), col("cell"))
      .agg(transform(
        sort_array(collect_list(struct(col("sub"), col("cid")))),
        s => s.getField("cid")).as("codes"))
  }

  def residualPqIndexRowsWith(emb: DataFrame, cents: DataFrame,
                              cb: DataFrame, numSub: Int = 8,
                              subDim: Int = 8): DataFrame = {
    val cg = guardRawScaleCents(cents)
    val assigned = assignToCells(vectors(emb), cg)
      .select(col("vec_id"), col("cell"), col("e"))
    val cm = microCentsOf(cg)
    residualIndexRowsOf(residualFrame(assigned, cm), cm, cb, numSub,
      subDim)
  }

  def residualPqIndexRows(emb: DataFrame, cents: DataFrame,
                          numSub: Int = 8, subDim: Int = 8,
                          numCodes: Int = 16,
                          seedFrom: Int = 16): DataFrame = {
    val cg = guardRawScaleCents(cents)
    val assigned = assignToCells(vectors(emb), cg)
      .select(col("vec_id"), col("cell"), col("e"))
    val cm = microCentsOf(cg)
    val rm = residualFrame(assigned, cm)
    val cb = residualSeedCodebook(rm, numSub, subDim, numCodes, seedFrom)
    residualIndexRowsOf(rm, cm, cb, numSub, subDim)
  }

  /** Serving DIRECTLY from the stored residual-PQ index — the read
    * path matching [[residualPqIndexRows]]' write path: queries probe
    * their nProbe nearest cells against the (model-sized) centroid
    * table, candidates come from the equi-join of the broadcast probe
    * frame against the index on `cell` (partition pruning on the
    * partitionBy(cell) layout), ADC scores come from the STORED codes
    * + the per-(query, cell) tables derived from the model frames
    * alone, and only the top-m shortlist touches fp32 vectors (the
    * primary store, joined by id) for the exact rerank. The plan must
    * serve EXACTLY what the rebuild-everything plan serves —
    * Batch14Spec pins the equality, and the oracle is the SAME
    * replay ann_ivf_pq_residual pins. */
  def annIvfPqResidualFromIndex(index: DataFrame, queries: DataFrame,
                                corpus: DataFrame, cents: DataFrame,
                                cb: DataFrame, nProbe: Int, m: Int,
                                k: Int, numSub: Int,
                                subDim: Int): DataFrame = {
    require(m >= k && nProbe >= 1)
    val cm = microCentsOf(cents)
    val wProbe = W.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", round(CosineSimilarity(col("e"), col("ce")), 6))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"))
    val candSub = broadcast(probes)
      .join(index, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("cell"),
        posexplode(col("codes")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "cid")
    val xhat = residualXhatOf(cm, cb, numSub, subDim)
    val rr = xhat.select(col("cell"), col("sub"), col("cid"),
      aggregate(col("xh"), lit(0L), (acc, y) => acc + y * y).as("rr"))
    val qm = queries
      .select(col("query_id"),
        transform(col("e"), x => round(x * lit(1000000.0d)).cast("long"))
          .as("qm"))
      .withColumn("q2m",
        aggregate(col("qm"), lit(0L), (acc, y) => acc + y * y))
    val tab = qm.crossJoin(broadcast(xhat))
      .select(col("query_id"), col("q2m"), col("cell"), col("sub"),
        col("cid"),
        aggregate(
          zip_with(slice(col("qm"), col("sub") * subDim + 1, lit(subDim)),
            col("xh"), (a, b) => a * b),
          lit(0L), (acc, y) => acc + y).as("tm"))
    val wm = W.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val shortlist = candSub
      .join(broadcast(tab), Seq("query_id", "cell", "sub", "cid"))
      .join(broadcast(rr), Seq("cell", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), sum(col("rr")).as("r2m"),
        first(col("q2m")).as("q2m"))
      .withColumn("cos", resAdcCos(col("dm"), col("q2m"), col("r2m")))
      .select(col("query_id"), col("vec_id"),
        row_number().over(wm).as("prnk"))
      .filter(col("prnk") <= m)
      .select("query_id", "vec_id")
    val qf = queries.toDF("query_id", "eq")
    val cand = corpus
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
    topK(cand, k)
  }

  def annIvfPqResidualFromIndexQuery(spark: SparkSession,
                                     dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val v = vectors(emb)
    val cents = defaultCentroids(emb, 16)
    // the model/codebook the nightly bulk persists alongside the index
    val cb = residualSeedCodebookOf(emb, cents).localCheckpoint()
    annIvfPqResidualFromIndex(
      residualPqIndexRows(emb, cents),
      v.filter(col("vec_id") < 8).toDF("query_id", "e"),
      v, cents, cb, nProbe = 4, m = 12, k = 3, numSub = 8, subDim = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The two r15 storage wins COMPOSED — the stored residual-PQ index
    * (row 250) at int4 packing (row 253): (vec_id, cell, packed[M/2])
    * where packed[b] = cid[2b] | cid[2b+1] << 4 — the production
    * IVFADC index at HALF the code bytes (M/2 where row 250 stores M
    * small ints, both against fp32's 4·dim). Written partitionBy(cell)
    * the probe pruning story is unchanged. */
  def residualPqIndexRowsInt4(emb: DataFrame, cents: DataFrame,
                              numSub: Int = 8, subDim: Int = 8,
                              numCodes: Int = 16,
                              seedFrom: Int = 16): DataFrame = {
    require(numCodes >= 1 && numCodes <= 16,
      s"int4 packing needs numCodes <= 16, got $numCodes")
    require(numSub >= 2 && numSub % 2 == 0,
      s"int4 packing needs an even numSub, got $numSub")
    // the seed codebook's cids are [seedFrom, seedFrom + numCodes) BY
    // CONSTRUCTION (they are the seed vectors' ids) — a nibble stores
    // cid − seedFrom, and serving re-bases. Packing a cid outside the
    // nibble window would silently corrupt every code (this bug's
    // first draft did exactly that: cids 16..31 into 4 bits), so the
    // rebase guards loudly in-plan.
    // upper bound is seedFrom + numCodes, NOT seedFrom + 16: with
    // numCodes < 16 a cid in the [numCodes, 16) gap would still fit a
    // nibble but violates the codebook's domain — the guard exists to
    // catch exactly such convention drift, so it checks the real domain
    def nib(e: String) =
      s"(CASE WHEN $e < $seedFrom OR $e >= ${seedFrom + numCodes} THEN " +
        "CAST(raise_error('int4 residual pack: cid out of the " +
        s"nibble window [$seedFrom, ${seedFrom + numCodes})') AS BIGINT) " +
        s"ELSE $e - $seedFrom END)"
    residualPqIndexRows(emb, cents, numSub, subDim, numCodes, seedFrom)
      .select(col("vec_id"), col("cell"), expr(
        s"transform(sequence(0, ${numSub / 2 - 1}), " +
          s"b -> CAST(${nib("codes[b * 2]")} | " +
          s"shiftleft(${nib("codes[b * 2 + 1]")}, 4) AS INT))")
        .as("packed"))
  }

  /** Serving from the PACKED stored index: nibbles unpack IN-SCAN
    * (shiftright + mask — the ann_pq_int4_topk formula) into the
    * UNCHANGED from-index plan, so the result is bit-identical to
    * serving from the unpacked index and to the rebuild plan
    * (spec-pinned; the oracle replays pack → unpack inside the
    * ann_ivf_pq_residual chain). */
  def annIvfPqResidualFromInt4Index(index: DataFrame, queries: DataFrame,
                                    corpus: DataFrame, cents: DataFrame,
                                    cb: DataFrame, nProbe: Int, m: Int,
                                    k: Int, numSub: Int, subDim: Int,
                                    cidBase: Int = 16): DataFrame = {
    // cidBase = the packing's seedFrom: nibbles re-base to the
    // codebook's cid domain before the (cell, sub, cid) ADC joins
    val unpacked = index.select(col("vec_id"), col("cell"), expr(
      s"transform(sequence(0, ${numSub - 1}), " +
        "s -> CAST((shiftright(packed[CAST(s div 2 AS INT)], " +
        s"CAST(s % 2 AS INT) * 4) & 15) + $cidBase AS BIGINT))")
      .as("codes"))
    annIvfPqResidualFromIndex(unpacked, queries, corpus, cents, cb,
      nProbe, m, k, numSub, subDim)
  }

  def annIvfPqResidualInt4Query(spark: SparkSession,
                                dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val v = vectors(emb)
    val cents = defaultCentroids(emb, 16)
    val cb = residualSeedCodebookOf(emb, cents).localCheckpoint()
    annIvfPqResidualFromInt4Index(
      residualPqIndexRowsInt4(emb, cents),
      v.filter(col("vec_id") < 8).toDF("query_id", "e"),
      v, cents, cb, nProbe = 4, m = 12, k = 3, numSub = 8, subDim = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  def annPqTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annPqTopK(Tables.embeddings(spark, dir), numQueries = 8, k = 5)
      .orderBy(col("query_id"), col("rnk"))

  // --------------------------------------------------- int4-packed PQ

  /** int4-PACKED PQ index rows (r14 verdict #2) — FAISS's PQx4
    * storage: with numCodes ≤ 16 a code id fits 4 bits, so TWO codes
    * pack per byte and the index halves again (M/2 bytes per vector
    * where PQ8 stores M). Pure shift/mask column expressions (the
    * zorder_key bit discipline): packed[b] = cid[2b] | cid[2b+1] << 4.
    * This is a STORAGE change, not a model change — the codes are
    * bit-identical to the unpacked frame, spec-pinned through the
    * serving equality below. */
  def pqInt4IndexRowsWith(v: DataFrame, cb: DataFrame, numSub: Int,
                          subDim: Int, numCodes: Int): DataFrame = {
    require(numCodes >= 1 && numCodes <= 16,
      s"int4 packing needs numCodes <= 16, got $numCodes")
    require(numSub >= 2 && numSub % 2 == 0,
      s"int4 packing needs an even numSub, got $numSub")
    val (enc, _) = pqPartsWith(v, cb, numSub, subDim)
    enc.groupBy(col("vec_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("sub"), col("cid")))),
        s => s.getField("cid")).as("codes"))
      // Spark SQL [] is 0-based (unlike element_at/DuckDB's 1-based)
      .select(col("vec_id"), expr(
        s"transform(sequence(0, ${numSub / 2 - 1}), " +
          "b -> CAST(codes[b * 2] | shiftleft(codes[b * 2 + 1], 4) " +
          "AS INT))").as("packed"))
  }

  def pqInt4IndexRows(emb: DataFrame, numSub: Int = 8, subDim: Int = 8,
                      numCodes: Int = 16): DataFrame = {
    val v = vectors(emb)
    pqInt4IndexRowsWith(v, pqDefaultCodebook(v, numSub, subDim, numCodes),
      numSub, subDim, numCodes)
  }

  /** ann_pq_int4_topk — the flat ADC scan served from the int4-PACKED
    * index: codes unpack IN-SCAN (shiftright + mask over the stored
    * bytes — no full-width vector, no unpacked code frame is ever
    * materialized), then the unchanged ADC chain scores them. Because
    * pack/unpack is lossless, the result is BIT-IDENTICAL to
    * annPqTopK on the same models — Batch15Spec pins the equality,
    * and the oracle replays the pack → unpack bit formula in SQL. */
  def annPqInt4TopK(emb: DataFrame, numQueries: Int = 8, k: Int = 5,
                    numSub: Int = 8, subDim: Int = 8,
                    numCodes: Int = 16): DataFrame = {
    require(numQueries >= 1 && k >= 1, s"bad numQueries=$numQueries/k=$k")
    val v = vectors(emb)
    val cb = pqDefaultCodebook(v, numSub, subDim, numCodes)
    // the stored index: numSub/2 bytes per vector, built once
    val packed = pqInt4IndexRowsWith(v, cb, numSub, subDim, numCodes)
      .localCheckpoint()
    val enc = packed
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(numSub - 1))).as("sub"),
        col("packed"))
      .select(col("vec_id"), col("sub"), expr(
        "CAST(shiftright(packed[CAST(sub div 2 AS INT)], " +
          "CAST(sub % 2 AS INT) * 4) & 15 AS BIGINT)").as("cid"))
    val r2 = enc.join(broadcast(cb), Seq("sub", "cid"))
      .groupBy(col("vec_id"))
      .agg(sum(round(dot(col("c"), col("c")) * lit(1000000.0d))
        .cast("long")).as("r2m"))
    val tab = pqQueryTab(v, cb, numQueries, subDim)
    val sc = enc.join(broadcast(tab), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tm")).as("dm"), first(col("qn")).as("qn"))
    val cand = sc.join(r2, "vec_id")
      .withColumn("cos", pqAdcCos(col("dm"), col("qn"), col("r2m")))
    topK(cand, k)
  }

  def annPqInt4TopKQuery(spark: SparkSession, dir: String): DataFrame =
    annPqInt4TopK(Tables.embeddings(spark, dir), numQueries = 8, k = 5)
      .orderBy(col("query_id"), col("rnk"))

  /** Recall AT EQUAL BYTES — the measurement that justifies (or
    * refutes) int4 packing as the production default: 4 bytes per
    * vector spent as "pq8_4x16" (4 subspaces × 16 dims, one byte per
    * code) vs "int4_8x8" (8 subspaces × 8 dims, two 4-bit codes per
    * byte). Finer subspace granularity at the same storage is the
    * int4 bet (FAISS PQx4). Both branches ADC-score the full corpus
    * for 32 HELD-OUT queries (disjoint from the shared numCodes seed
    * prefix) against the exact brute-force truth. The int4 branch
    * legitimately scores from UNPACKED codes: pack/unpack is
    * bit-lossless (pinned by ann_pq_int4_topk ≡ ann_pq_topk), so the
    * row isolates the MODEL-shape effect — storage equality is the
    * serving query's contract, not this instrument's. */
  def pqInt4Recall(emb: DataFrame, numQueries: Int = 32, k: Int = 5,
                   numCodes: Int = 16): DataFrame = {
    val v = vectors(emb)
    val hq = heldoutQueries(emb, numQueries, numCodes).localCheckpoint()
    val nq = hq.agg(count(lit(1)).as("n_q"))
    val truth = topK(cosineCandidatesQ(v, hq), k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
      .localCheckpoint()
    def served(tag: String, numSub: Int, subDim: Int) =
      pqAdcTopKQ(v, pqDefaultCodebook(v, numSub, subDim, numCodes), hq,
        k, numSub, subDim)
        .select(lit(tag).as("encoding"), col("query_id"),
          col("neighbor_id"))
    served("pq8_4x16", 4, 16)
      .unionByName(served("int4_8x8", 8, 8))
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("encoding")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("encoding"), lit(4L).as("bytes_per_vec"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def pqInt4RecallQuery(spark: SparkSession, dir: String): DataFrame =
    pqInt4Recall(Tables.embeddings(spark, dir)).orderBy(col("encoding"))

  /** The FULL production ANN serving stack — IVF cell shortlist ×
    * int8 scoring × fp32 rerank composed into one plan (the r10
    * pieces ran separately: annIvfTopK scanned probed cells at fp32,
    * annRerankTopK int8-scanned the WHOLE corpus). Three stages:
    *
    *   1. coarse: each query probes its nProbe nearest IVF cells, so
    *      only ≈ nProbe·n/C corpus rows are touched at all;
    *   2. shortlist: those rows are scored by QUANTIZED cosine (the
    *      4x-smaller column a 100 TB index actually stores per cell)
    *      and cut to the top m per query;
    *   3. rerank: exact fp32 cosine on |Q|·m rows restores the true
    *      ordering before the final top-k.
    *
    * Misses compose exactly like the parts: a true neighbor is lost
    * only if it lives outside every probed cell (IVF recall, measured
    * by SimilaritySpec's recall property) or quantization noise pushes
    * it below rank m inside them (m >> k makes this rare; AnnRerankSpec
    * pins the bound). With nProbe = C and m = corpus size the result
    * EQUALS the exact brute-force baseline — the boundary contract
    * AnnIvfRerankSpec pins.
    *
    * Scale shape: cell assignment and quantization are one map-side
    * pass each, computed ONCE per corpus vector (inside `assigned`,
    * not per candidate pair); both join stages broadcast only bounded
    * frames (probes, then the |Q|·m shortlist); no shuffle ever
    * carries full-width fp32 vectors except the final |Q|·m rerank. */
  def annIvfRerankTopK(emb: DataFrame, numQueries: Int, m: Int, k: Int,
                       numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    require(m >= k, s"shortlist m=$m must be >= k=$k")
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids], got $nProbe")
    val (assigned, probes) = ivfIndex(
      emb, defaultCentroids(emb, numCentroids), numQueries, nProbe)
    val a8 = assigned.withColumn("qe", graft.functions.Int8Quantize(col("e")))
    val p8 = probes.select(col("query_id"),
      graft.functions.Int8Quantize(col("eq")).as("qq"), col("probe"))
    val wm = W.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("vec_id"))
    val shortlist = broadcast(p8)
      .join(a8, col("probe") === col("cell") &&
        col("query_id") =!= col("vec_id"))
      .withColumn("qcos", round(CosineSimilarity(col("qq"), col("qe")), 6))
      .select(col("query_id"), col("vec_id"),
        row_number().over(wm).as("prnk"))
      .filter(col("prnk") <= m)
      .select("query_id", "vec_id")
    val v = vectors(emb)
    val qf = v.filter(col("vec_id") < numQueries).toDF("query_id", "eq")
    val cand = v
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("e")), 6))
    topK(cand, k)
  }

  def annIvfRerankTopKQuery(spark: SparkSession, dir: String): DataFrame =
    annIvfRerankTopK(Tables.embeddings(spark, dir),
      numQueries = 8, m = 12, k = 3)
      .orderBy(col("query_id"), col("rnk"))

  def annInt8TopKQuery(spark: SparkSession, dir: String): DataFrame =
    annInt8TopK(Tables.embeddings(spark, dir), numQueries = 8, k = 5)
      .orderBy(col("query_id"), col("rnk"))

  // ---------------------------------------------------------------- kNN graph

  /** k-nearest-neighbor GRAPH over the whole corpus — the precursor
    * artifact for graph-based curation (NN-Descent refinement,
    * graph-connected semantic dedup, diversity walks): every vector's
    * top-k cosine neighbors as directed edges, with a `mutual` flag
    * (both endpoints list each other — the reciprocal edges graph
    * clustering actually trusts).
    *
    * This is ann_ivf serving with Q = the corpus itself, and the scale
    * shape changes where it must: the probe side is corpus-sized, so
    * it is NOT broadcast (contrast annIvfCandidates) — candidates come
    * from a shuffled equi-join on (cell, blk), where `blk` sub-tiles
    * each cell's corpus slice so a hot cell splits across numBlocks
    * tasks instead of funneling through one (the cosineNearDupPairs
    * tiling discipline applied to IVF cells; AQE skew-join would split
    * by size, the explicit key makes the bound deterministic).
    * Candidate volume per vertex ≈ nProbe·n/C — C grows with the
    * corpus exactly like the serving path, and nProbe=C degrades to
    * the exact brute-force graph (spec-pinned). The mutuality pass is
    * a self-join of the EDGE frame (n·k rows), never corpus-sized.
    */
  def knnGraph(emb: DataFrame, k: Int = 5, numCentroids: Int = 16,
               nProbe: Int = 4, numBlocks: Int = 4): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids && numBlocks >= 1)
    val cents = defaultCentroids(emb, numCentroids)
    val (assigned, probes) = ivfIndexOpt(emb, cents, None, nProbe)
    val blocked = assigned
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("e").as("en"),
        pmod(col("vec_id"), lit(numBlocks.toLong)).as("blk"))
    val fanned = probes
      .withColumn("blk", explode(sequence(lit(0L), lit(numBlocks - 1L))))
    val cand = fanned.join(blocked,
        col("probe") === col("cell") && fanned("blk") === blocked("blk") &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(CosineSimilarity(col("eq"), col("en")), 6))
      .select(col("query_id"), col("neighbor_id").as("vec_id"), col("cos"))
    val edges = topK(cand, k)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("cos"), col("rnk"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"),
      lit(true).as("m"))
    edges.join(rev, Seq("src", "dst"), "left")
      .withColumn("mutual", coalesce(col("m"), lit(false)))
      .drop("m")
  }

  /** Default IVF cell count as a function of corpus size (r12 verdict
    * #7 — the C ∝ n knob was documented but manual): C(n) =
    * clamp(⌈√n⌉, 16, 65536). √n is the minimizer of the two-term IVF
    * cost n·C (assignment: every vector scores every centroid) +
    * nProbe·n²/C (probing: candidates per vertex × n) — total
    * 2n^1.5·√nProbe — and, unlike C ∝ n (which would make per-vertex
    * candidates flat), it keeps the centroid frame o(n): the 65536 cap
    * × 32 floats ≈ 16 MB, so the broadcast side of the assignment join
    * stays model-sized (the PlanPropertiesSpec BNLJ contract). C ∝ n
    * would push the quadratic into assignment and broadcast a
    * corpus-proportional frame — rejected; callers who want flat
    * per-vertex volume pass numCentroids explicitly.
    *
    * Cross-engine exact: IEEE-754 sqrt is correctly rounded in both
    * the JVM and DuckDB, ceil of it is integral, so the oracle's
    * `ceil(sqrt(count(*)))` computes the identical C. */
  def adaptiveCentroids(n: Long): Int = {
    val c = math.ceil(math.sqrt(n.toDouble)).toLong
    math.min(65536L, math.max(16L, c)).toInt
  }

  def knnGraphQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnGraph(emb, numCentroids = adaptiveCentroids(vectors(emb).count()))
      .orderBy(col("src"), col("rnk"))
  }

  /** Mutual-kNN CLUSTERING — the knn_graph consumer (row 180 names
    * graph dedup as the artifact's purpose): keep only RECIPROCAL
    * edges (both endpoints list each other — the similarity evidence
    * one-directional kNN can fake when a hub vector is everyone's
    * neighbor but reciprocates none of them), then label connected
    * components over the mutual graph. Mutual-kNN components are the
    * classic density-adaptive clustering (Brito et al. 1997): no
    * global distance threshold, each vector's own neighborhood scale
    * decides, so dense shards and sparse tails cluster on their own
    * terms — the semantic grouping semdedup's fixed-C cells
    * approximate.
    *
    * Scale shape: rides knnGraph's (cell, blk)-tiled candidate join,
    * then the SHARED frontier-iterated connectedComponents over the
    * mutual edge frame — at most n·k edges in, frontier-sized shuffles
    * per round (the dedup_clusters discipline; singletons — vectors
    * with no reciprocal neighbor — stay their own cluster). */
  def knnGraphClusters(emb: DataFrame, k: Int = 5, numCentroids: Int = 16,
                       nProbe: Int = 4, numBlocks: Int = 4): DataFrame = {
    val pairs = knnGraph(emb, k, numCentroids, nProbe, numBlocks)
      .filter(col("mutual") && col("src") < col("dst"))
      .select(col("src").as("doc_a"), col("dst").as("doc_b"))
    Dedup.connectedComponents(
        vectors(emb).select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("rep_id"),
        col("cluster_size"), col("is_canonical"))
  }

  def knnGraphClustersQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnGraphClusters(emb,
        numCentroids = adaptiveCentroids(vectors(emb).count()))
      .orderBy(col("vec_id"))
  }

  /** One NN-DESCENT refinement round over the IVF-bounded kNN graph
    * (Dong, Charikar & Li 2011: a neighbor of a neighbor is likely a
    * neighbor): candidate set per vertex = its current neighbors ∪
    * REVERSE neighbors ∪ two-hop neighbors, rescored exactly and
    * re-ranked top-k. Recovers true neighbors the cell-bounded
    * candidate generation missed — an edge crossing a cell boundary
    * is reachable through any shared neighbor — WITHOUT touching the
    * corpus-pair space: candidates are ≤ n·k(k+2) rows from keyed
    * self-joins of the n·k edge frame, deterministic (no sampling),
    * and one round is the measured sweet spot (knnRefineRecall).
    *
    * Scale shape: the edge frame localCheckpoints once (n·k rows); the
    * two-hop expansion and both vector joins are keyed equi-joins —
    * no broadcast of anything corpus-sized, no windows over hot keys
    * (per-vertex candidate groups are ≤ k(k+2)). */
  def knnGraphRefine(emb: DataFrame, k: Int = 5, numCentroids: Int = 16,
                     nProbe: Int = 4, numBlocks: Int = 4): DataFrame =
    knnGraphRefineFrom(emb,
      knnGraph(emb, k, numCentroids, nProbe, numBlocks)
        .select("src", "dst").localCheckpoint(), k)

  /** The refinement round over an ALREADY-built (src, dst) edge frame
    * — exposed so evaluators sharing the base graph (knnRefineRecall)
    * refine the same materialized edges instead of rebuilding the IVF
    * chain. */
  private[graft] def knnGraphRefineFrom(emb: DataFrame, base: DataFrame,
                                        k: Int): DataFrame = {
    val rev = base.select(col("dst").as("src"), col("src").as("dst"))
    val hop2 = base.toDF("src", "mid")
      .join(base.toDF("mid", "dst"), "mid")
      .select("src", "dst")
    val cand = base.unionByName(rev).unionByName(hop2)
      .filter(col("src") =!= col("dst")).distinct()
    val v = vectors(emb)
    val scored = cand
      .join(v.toDF("src", "es"), "src")
      .join(v.toDF("dst", "ed"), "dst")
      .select(col("src").as("query_id"), col("dst").as("vec_id"),
        round(CosineSimilarity(col("es"), col("ed")), 6).as("cos"))
    topK(scored, k)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("cos"), col("rnk"))
  }

  def knnGraphRefineQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnGraphRefine(emb,
        numCentroids = adaptiveCentroids(vectors(emb).count()))
      .orderBy(col("src"), col("rnk"))
  }

  /** Edge-set recall of the IVF-bounded graph vs one NN-Descent round,
    * against the exhaustive exact kNN graph — the uplift measurement
    * that justifies (or refutes) the refinement pass at equal k. Truth
    * is knnGraph at nProbe = C, which is spec-pinned ≡ brute force.
    * Output: one row per stage with hits over n·k true edges. */
  def knnRefineRecall(emb: DataFrame, k: Int = 5, numCentroids: Int = 16,
                      nProbe: Int = 4): DataFrame = {
    val truth = knnGraph(emb, k, numCentroids, numCentroids)
      .select(col("src"), col("dst"), lit(true).as("hit"))
    // ONE base-graph build: the ivf stage and the refinement both read
    // the same materialized edge frame
    val base = knnGraph(emb, k, numCentroids, nProbe)
      .select("src", "dst").localCheckpoint()
    val staged = base
      .select(lit("ivf").as("stage"), col("src"), col("dst"))
      .unionByName(knnGraphRefineFrom(emb, base, k)
        .select(lit("refined").as("stage"), col("src"), col("dst")))
    val nRow = vectors(emb).agg(count(lit(1)).as("n_vec"))
    staged.join(truth, Seq("src", "dst"), "left")
      .groupBy("stage")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nRow))
      .select(col("stage"), col("hits"), col("n_vec"),
        expr(s"(10000 * hits) div (n_vec * $k)").as("recall_bp"))
  }

  def knnRefineRecallQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnRefineRecall(emb,
        numCentroids = adaptiveCentroids(vectors(emb).count()))
      .orderBy(col("stage"))
  }

  /** NN-Descent run to CONVERGENCE — knn_graph_refine's single round
    * (measured +21 recall points) iterated with the standard early
    * stop (Dong, Charikar & Li 2011 §2.3): after each round, count
    * edges the round CHANGED (new (src,dst) pairs in the top-k lists);
    * stop when that falls below epsBp basis points of the n·k edge
    * mass, or at maxRounds. The graph monotonically improves (a
    * round's candidate set contains the incumbent edges, so a
    * neighbor is only ever replaced by a STRICTLY closer one — the
    * spec pins both monotone recall and refine(exact) = exact, the
    * fixpoint that makes "convergence" meaningful).
    *
    * Scale shape: each round's state is the n·k edge frame,
    * localCheckpointed like the CC fixpoint (no lineage growth, no
    * corpus re-scan per round); the per-round stop statistic is ONE
    * scalar count off a keyed anti-join of two edge frames. The
    * early-stop matters at 100 TB because rounds are not free —
    * n·k(k+2) exact rescores each — and NN-Descent's value
    * concentrates in the first rounds.
    *
    * Determinism: the round count is data-dependent but REPLAYABLE —
    * the oracle unrolls maxRounds rounds as CTEs, computes the same
    * change counts, and selects the same effective round. */
  def knnRefineConverged(emb: DataFrame, k: Int = 5,
      numCentroids: Int = 16, nProbe: Int = 4, numBlocks: Int = 4,
      maxRounds: Int = 3, epsBp: Long = 100L): DataFrame = {
    require(maxRounds >= 1 && epsBp >= 0)
    val nk = vectors(emb).count() * k
    var cur = knnGraph(emb, k, numCentroids, nProbe, numBlocks)
      .select("src", "dst", "cos", "rnk").localCheckpoint()
    var rounds = 0
    var done = false
    while (rounds < maxRounds && !done) {
      val next = knnGraphRefineFrom(emb, cur.select("src", "dst"), k)
        .localCheckpoint()
      val newEdges = next.select("src", "dst")
        .join(cur.select("src", "dst"), Seq("src", "dst"), "left_anti")
        .count()
      done = 10000L * newEdges < epsBp * nk
      cur = next
      rounds += 1
    }
    cur
  }

  def knnRefineConvergedQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnRefineConverged(emb,
        numCentroids = adaptiveCentroids(vectors(emb).count()))
      .orderBy(col("src"), col("rnk"))
  }

  // ---------------------------------------------------------------- vector QC

  /** Embedding-table hygiene report, per label slice: row counts, the
    * norm range in exact micro units, zero vectors (unembeddable
    * inputs — they silently break cosine math), and vectors carrying a
    * non-finite component (NaN/Inf from an overflowed encoder — one
    * of them poisons every aggregate it touches). The vector-side
    * admission gate next to the text side's corpus_card: run it
    * BEFORE vectors enter the index.
    *
    * Scale shape: entirely map-only per row (norm fold + two in-row
    * `exists` probes) + one map-side-combined per-label aggregate. */
  def embedNormQc(emb: DataFrame): DataFrame =
    emb.select(col("label"), toDoubleArray(col("embedding")).as("e"))
      .withColumn("bad",
        exists(col("e"), x => isnan(x) || x === Double.PositiveInfinity ||
          x === Double.NegativeInfinity))
      // norm is only DEFINED for finite vectors: guard before the long
      // cast so a NaN norm can't turn into an engine-dependent value
      .select(col("label"), col("bad"),
        when(col("bad"), lit(null).cast("long"))
          .otherwise(round(l2norm(col("e")) * lit(1000000.0d)).cast("long"))
          .as("norm_micro"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(when(!col("bad"), col("norm_micro"))).as("min_norm_micro"),
        max(when(!col("bad"), col("norm_micro"))).as("max_norm_micro"),
        sum(when(col("norm_micro") === 0 && !col("bad"), 1L).otherwise(0L))
          .as("n_zero"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite"))

  def embedNormQcQuery(spark: SparkSession, dir: String): DataFrame =
    embedNormQc(Tables.embeddings(spark, dir)).orderBy(col("label"))

  /** EXACT-duplicate vector detection — the embedding mirror of
    * dedup_exact (dedup'd text re-embedded twice, double-ingested
    * shards, and constant-output encoder bugs all materialize as
    * bit-identical vectors that silently double-weight every
    * centroid, index cell, and nearest-neighbor list): vectors hash
    * by the md5 of their once-rounded micro components joined as a
    * canonical string (the same micro basis every exact-integer
    * operator here shares — float bit-pattern equality without
    * cross-engine float hashing), min id per hash group keeps, the
    * rest flag as dups. Window partitions by the hash — groups are
    * duplicate-set-sized, never corpus-sized. */
  def embedExactDups(emb: DataFrame): DataFrame = {
    val hash = md5(concat_ws(",",
      transform(toDoubleArray(col("embedding")),
        x => round(x * lit(1000000.0d)).cast("long"))))
    val w = W.partitionBy(col("h"))
    emb.select(col("vec_id"), hash.as("h"))
      .select(col("vec_id"), min(col("vec_id")).over(w).as("keep_id"))
      .withColumn("is_dup", col("vec_id") =!= col("keep_id"))
  }

  def embedExactDupsQuery(spark: SparkSession, dir: String): DataFrame =
    embedExactDups(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  /** Dominant direction of the embedding table by POWER ITERATION on
    * the exact-integer second-moment matrix — the measurement behind
    * the "all-but-the-top" postprocessing rule (Mu & Viswanath 2018:
    * a fat top component is corpus-wide anisotropy — frequency
    * artifacts, not meaning — and retrieval improves when it is
    * projected out; this computes WHAT to project):
    *
    *  - components round ONCE to milli units, so every gram entry
    *    m_ij = Σ x̃_i·x̃_j is an exact BIGINT (|x̃| ≤ ~10³ keeps the
    *    sum in int64 past 10⁹ rows);
    *  - the gram build is the ONE corpus pass: a dim²-fold in-row
    *    explode feeding a map-side-combined (i, j) aggregate — output
    *    dim² rows, model-sized;
    *  - iterations run on the dim²-frame only: w = G·v with products
    *    in decimal(38,0) (scale-safe), then v ← round(10⁴·w/max|w|)
    *    — the max-norm rescale keeps next-round integers bounded, and
    *    the one double division per component is the display-float
    *    discipline (exact-integer inputs, correctly-rounded IEEE ops,
    *    identical cross-engine); v state localCheckpoints per round.
    *  - deterministic BY CONSTRUCTION: fixed seed v₀ = e_s·10⁴ at the
    *    LARGEST-DIAGONAL axis s (argmax_j G_jj, ties → smallest j —
    *    a fixed e₀ seed dead-ends with a 0/0 when dimension 0 carries
    *    no mass, a real failure mode for encoders with dead dims; the
    *    heaviest axis always has G·e_s ≠ 0, and an ALL-zero gram
    *    raise_errors loudly), fixed iteration count — no RNG, no sign
    *    ambiguity, and the oracle unrolls the identical recurrence as
    *    materialized CTEs. */
  /** The exact-integer milli gram, localCheckpointed — the ONE corpus
    * pass every power-iteration consumer shares. */
  private def gramOf(emb: DataFrame): DataFrame =
    emb.select(transform(toDoubleArray(col("embedding")),
        x => round(x * lit(1000.0d)).cast("long")).as("q"))
      .select(posexplode(col("q")).as(Seq("i", "xi")), col("q"))
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .groupBy("i", "j").agg(sum(col("xi") * col("xj")).as("m"))
      .localCheckpoint()

  /** One max-rescaled power recurrence from an explicit integer seed
    * frame (j, v): iters × (w = G·v in decimal, v ← round(10⁴·w/max|w|)),
    * localCheckpointed per round. */
  private def powerIterate(gram: DataFrame, seed: DataFrame,
                           iters: Int): DataFrame = {
    var v = seed
    for (_ <- 1 to iters) {
      val w = gram.join(v, "j")
        .groupBy("i")
        .agg(sum(col("m").cast("decimal(38,0)") * col("v")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mw"))
      v = w.crossJoin(broadcast(mx))
        .select(col("i").as("j"),
          round(col("w").cast("double") / col("mw").cast("double")
            * lit(10000.0d)).cast("long").as("v"))
        .localCheckpoint()
    }
    v
  }

  /** The argmax-diagonal seed frame e_s·10⁴ (loud failure on an
    * all-zero gram). */
  private def diagSeed(gram: DataFrame, dim: Int): DataFrame = {
    import gram.sparkSession.implicits._
    val seed = gram.filter(col("i") === col("j"))
      .orderBy(col("m").desc, col("i")).limit(1)
      .select(when(col("m") === 0L,
        raise_error(lit("topComponent: the gram diagonal is all zero — " +
          "every embedding is the zero vector; no direction exists")))
        .otherwise(col("i")).as("sj"))
    Seq.tabulate(dim)(j => j).toDF("j")
      .crossJoin(broadcast(seed))
      .select(col("j"),
        when(col("j") === col("sj"), 10000L).otherwise(0L).as("v"))
  }

  def topComponent(emb: DataFrame, iters: Int = 6,
                   dim: Int = 64): DataFrame = {
    require(iters >= 1 && dim >= 1)
    val gram = gramOf(emb)
    powerIterate(gram, diagSeed(gram, dim), iters)
      .select(col("j").as("dim"), col("v").as("v_unit"))
  }

  def topComponentQuery(spark: SparkSession, dir: String): DataFrame =
    topComponent(Tables.embeddings(spark, dir)).orderBy(col("dim"))

  // ---------------------------------------------------------------- recall eval

  /** MEASURED recall@k of the IVF serving path against exact brute
    * force, per query and per nProbe setting — the knob-tuning
    * artifact behind every "C and nProbe were chosen to meet the
    * recall SLA" claim in this family (the banding analog is
    * bandingFor's closed form; IVF recall has no closed form, so it
    * must be measured). recall_bp = 10000·hits div k in BIGINTs.
    *
    * Scale shape: each probed serving run is the annIvfTopK plan
    * unchanged (one per nProbe, unioned — the cells scan is shared
    * work a cache-conscious caller can persist); the exact side is the
    * brute-force baseline ONCE; both sides land as |Q|·k edge frames
    * and the hit join + per-(nProbe, query) aggregate never touch
    * anything corpus-sized. */
  def annRecallEval(emb: DataFrame, numQueries: Int = 8, k: Int = 5,
                    numCentroids: Int = 16,
                    nProbes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(p => p >= 1 && p <= numCentroids))
    val exact = annCosineTopK(emb, numQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
    val approx = nProbes.map { p =>
      annIvfTopK(emb, numQueries, k, numCentroids, p)
        .select(lit(p).as("n_probe"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    approx.join(broadcast(exact), Seq("query_id", "neighbor_id"), "left")
      .groupBy("n_probe", "query_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .select(col("n_probe"), col("query_id"), col("hits"),
        expr(s"(10000 * hits) div $k").as("recall_bp"))
  }

  def annRecallEvalQuery(spark: SparkSession, dir: String): DataFrame =
    annRecallEval(Tables.embeddings(spark, dir))
      .orderBy(col("n_probe"), col("query_id"))

  /** Matryoshka (MRL — Kusupati et al. 2022) dimension-tier recall:
    * brute-force cosine top-k using only the FIRST d dimensions, per
    * tier d, against the full-dimension truth — the measured
    * accuracy-vs-cost curve that decides how many leading dims a
    * serving index actually needs (an MRL-trained encoder front-loads
    * information, so low tiers stay useful; this instrument is how
    * you check YOUR embeddings before truncating them).
    *
    * Scale shape: ONE corpus scan — every (query, vector) pair scores
    * ALL tiers in-row (prefix cosines share the broadcast-query scan),
    * then unpivots to (dims, query, vec, cos) so the per-tier top-k is
    * a single window pass; the edge frame (|tiers|·|Q|·k rows) is
    * localCheckpointed before the truth self-join (the k-core lesson —
    * a recursive consumer would replay the corpus scan).
    *
    * The top tier IS the truth, so its row reports recall_bp = 10000
    * by construction — the eval's self-check. */
  def annMatryoshkaRecall(emb: DataFrame, numQueries: Int = 8, k: Int = 5,
                          tiers: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(tiers.nonEmpty && tiers == tiers.sorted && tiers.forall(_ >= 1),
      "tiers must be ascending positive dims")
    val v = vectors(emb)
    val q = v.filter(col("vec_id") < numQueries).toDF("query_id", "eq")
    val cand = broadcast(q).join(v, col("query_id") =!= col("vec_id"))
      .select(Seq(col("query_id"), col("vec_id")) ++ tiers.map { d =>
        round(CosineSimilarity(slice(col("eq"), 1, d), slice(col("e"), 1, d)),
          6).as(s"cos_$d")
      }: _*)
    val long = cand.selectExpr("query_id", "vec_id",
      s"stack(${tiers.size}, " +
        tiers.map(d => s"CAST($d AS BIGINT), cos_$d").mkString(", ") +
        ") AS (dims, cos)")
    val w = W.partitionBy(col("dims"), col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val edges = long
      .select(col("dims"), col("query_id"), col("vec_id").as("neighbor_id"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
      .localCheckpoint()
    val truth = edges.filter(col("dims") === tiers.max.toLong)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
    val nq = q.agg(count(lit(1)).as("n_q"))
    edges.join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy("dims")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .crossJoin(broadcast(nq))
      .select(col("dims"), col("hits"),
        expr(s"(10000 * hits) div (n_q * $k)").as("recall_bp"))
  }

  def annMatryoshkaRecallQuery(spark: SparkSession, dir: String): DataFrame =
    annMatryoshkaRecall(Tables.embeddings(spark, dir)).orderBy(col("dims"))

  /** The TRANSFORM ann_matryoshka_recall gates: truncate every vector
    * to its first `d` dims and re-normalize to unit length, shipped in
    * exact integer micro units (component = round(x/‖x₁..d‖ · 10⁶),
    * each rounded ONCE; the norm itself in micro for QC). The 4×
    * storage/bandwidth cut a serving index takes AFTER the recall eval
    * approves d — run the eval first; this materializes the decision.
    * Zero-norm prefixes (unembeddable at tier d) emit all-zero
    * components with norm_micro = 0 — the embed_norm_qc flag carries
    * over rather than a NaN. Map-only, one corpus pass; the array
    * ships as the CSV convention (embed_quantize_int8's). */
  def embedMatryoshkaTruncate(emb: DataFrame, d: Int = 16): DataFrame = {
    require(d >= 1)
    val t = slice(col("e"), 1, d)
    val nrm = sqrt(aggregate(transform(t, x => x * x), lit(0.0d),
      (acc, x) => acc + x))
    vectors(emb)
      .select(col("vec_id"), t.as("t"), nrm.as("nrm"))
      .select(col("vec_id"), lit(d.toLong).as("dims"),
        round(col("nrm") * lit(1000000.0d)).cast("long").as("norm_micro"),
        concat_ws(",", transform(col("t"), x =>
          when(col("nrm") === 0.0d, lit(0L))
            .otherwise(round(x / col("nrm") * lit(1000000.0d))
              .cast("long")))).as("t_csv"))
  }

  def embedMatryoshkaTruncateQuery(spark: SparkSession,
                                   dir: String): DataFrame =
    embedMatryoshkaTruncate(Tables.embeddings(spark, dir))
      .orderBy(col("vec_id"))

  /** ALL-BUT-THE-TOP postprocessing (Mu & Viswanath 2018) — the
    * TRANSFORM top_component gates: project the dominant direction v
    * out of every vector and re-normalize, in exact integers end to
    * end. top_component measures corpus anisotropy; this removes it.
    *
    * Exact-integer construction (nothing float crosses engines
    * unpinned):
    *  - x̃ = round(x·10³) per component (topComponent's milli basis);
    *    v is the power iteration's integer v_unit (|v_j| ≤ 10⁴);
    *  - the residual is the EXACT integer vector
    *      num_i = x̃_i·⟨v,v⟩ − ⟨x̃,v⟩·v_i
    *    (x̃ − proj_v x̃ scaled by ⟨v,v⟩ — scaling by the exact integer
    *    denominator instead of dividing keeps every component a
    *    BIGINT: |num_i| ≤ 10³·64·10⁸ + 64·10⁷·10⁴ ≈ 1.3·10¹³, inside
    *    int64 AND double-exact);
    *  - re-normalization divides by ‖num‖ once per component and
    *    rounds ONCE to micro units (norm squares ~10²⁶ round in
    *    double, but identically: both engines fold the same exact
    *    integers in the same order — the cosine-family discipline).
    *
    * Diagnostics per vector: cos_top_micro = cos(x̃, v) (how aligned
    * the vector was with the common direction) and res_norm_micro =
    * ‖num‖/(⟨v,v⟩·‖x̃‖) (the fraction of the vector's norm that
    * SURVIVES the projection — sin of the angle to v). Zero vectors
    * degrade to NULL diagnostics + all-zero components, the
    * embed_norm_qc convention.
    *
    * Scale shape: topComponent's one corpus pass builds the gram; the
    * projection itself is map-only per row against the ONE broadcast
    * (v, ⟨v,v⟩) row — no shuffle, no second corpus pass beyond the
    * gram's. The CSV ships like embed_quantize_int8. */
  private[operators] def allButTopVectors(emb: DataFrame, iters: Int,
                                          dim: Int): DataFrame = {
    val top = topComponent(emb, iters, dim)
    val vrow = top
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("v_unit")))),
        s => s.getField("v_unit")).as("va"))
      .select(col("va"),
        aggregate(col("va"), lit(0L), (a, x) => a + x * x).as("vv"))
    emb.select(col("vec_id"),
        transform(toDoubleArray(col("embedding")),
          x => round(x * lit(1000.0d)).cast("long")).as("q"))
      .crossJoin(broadcast(vrow))
      .withColumn("qq", aggregate(col("q"), lit(0L), (a, x) => a + x * x))
      .withColumn("xv",
        aggregate(zip_with(col("q"), col("va"), (x, vi) => x * vi),
          lit(0L), (a, x) => a + x))
      .withColumn("num",
        zip_with(col("q"), col("va"),
          (x, vi) => x * col("vv") - col("xv") * vi))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("num"),
          n => n.cast("double") * n.cast("double")),
          lit(0.0d), (a, x) => a + x)))
  }

  def embedAllButTop(emb: DataFrame, iters: Int = 6,
                     dim: Int = 64): DataFrame =
    allButTopVectors(emb, iters, dim)
      .select(col("vec_id"),
        when(col("qq") === 0L, lit(null).cast("long"))
          .otherwise(round(col("xv") / (sqrt(col("qq")) * sqrt(col("vv")))
            * lit(1000000.0d)).cast("long")).as("cos_top_micro"),
        when(col("qq") === 0L, lit(null).cast("long"))
          .otherwise(round(col("nrm")
            / (col("vv").cast("double") * sqrt(col("qq")))
            * lit(1000000.0d)).cast("long")).as("res_norm_micro"),
        concat_ws(",", transform(col("num"), n =>
          when(col("nrm") === 0.0d, lit(0L))
            .otherwise(round(n.cast("double") / col("nrm")
              * lit(1000000.0d)).cast("long")))).as("e_csv"))

  def embedAllButTopQuery(spark: SparkSession, dir: String): DataFrame =
    embedAllButTop(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  /** MEASURED neighborhood shift of the all-but-the-top transform:
    * brute-force cosine top-k over the POSTPROCESSED vectors (query
    * side postprocessed too — the transform applies to the whole
    * space) against the original-vector truth, per query. recall_bp
    * near 10000 ⇒ the common direction carried little neighbor
    * information; a low row names the queries whose neighborhoods the
    * anisotropy was defining — the measurement that decides whether
    * to ship the transform (the ann_recall_eval discipline pointed at
    * a TRANSFORM instead of an index knob).
    *
    * Scale shape: annCosineTopK's twice (bounded broadcast-query scan
    * each side) + a |Q|·k edge join — nothing corpus-sized shuffles. */
  def embedAllButTopRecall(emb: DataFrame, numQueries: Int = 8, k: Int = 5,
                           iters: Int = 6, dim: Int = 64): DataFrame = {
    val post = allButTopVectors(emb, iters, dim)
      .select(col("vec_id"),
        transform(col("num"), n =>
          when(col("nrm") === 0.0d, lit(0.0d))
            .otherwise(round(n.cast("double") / col("nrm")
              * lit(1000000.0d)).cast("long").cast("double"))).as("e"))
      .localCheckpoint()
    val served = topK(cosineCandidatesQ(post,
      post.filter(col("vec_id") < numQueries).toDF("query_id", "eq")), k)
    val truth = annCosineTopK(emb, numQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
    served.join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .select(col("query_id"), col("hits"),
        expr(s"(10000 * hits) div $k").as("recall_bp"))
  }

  def embedAllButTopRecallQuery(spark: SparkSession, dir: String): DataFrame =
    embedAllButTopRecall(Tables.embeddings(spark, dir))
      .orderBy(col("query_id"))

  /** Exact-integer Gram-Schmidt step shared by the v₂ iteration and
    * its seed: o = u·⟨v₁,v₁⟩ − ⟨u,v₁⟩·v₁ over (j, u)/(j, v) frames —
    * scaling by the exact denominator instead of dividing (the
    * all-but-the-top trick) keeps every term in int64 for 10⁴-scaled
    * inputs. Emits (j, o). */
  private def orthogonalizeAgainst(u: DataFrame, v1: DataFrame): DataFrame = {
    val v1r = v1.select(col("j"), col("v").as("v1"))
    val vv1 = v1r.agg(sum(col("v1") * col("v1")).as("vv1"))
    val uv = u.join(v1r, "j")
      .agg(sum(col("u") * col("v1")).as("uv"))
    u.join(v1r, "j")
      .crossJoin(broadcast(vv1)).crossJoin(broadcast(uv))
      .select(col("j"),
        (col("u") * col("vv1") - col("uv") * col("v1")).as("o"))
  }

  /** Max-rescale an integer frame (j, o) to 10⁴ units; a zero frame
    * raise_errors with the caller's message (rank deficiency). */
  private def rescale10k(o: DataFrame, onZero: String): DataFrame = {
    val mx = o.agg(max(abs(col("o"))).as("mo"))
    o.crossJoin(broadcast(mx))
      .select(col("j"),
        when(col("mo") === 0L, raise_error(lit(onZero)))
          .otherwise(round(col("o").cast("double")
            / col("mo").cast("double") * lit(10000.0d)).cast("long"))
          .as("v"))
  }

  /** The top TWO principal directions (r15 verdict #6's "k = 1 first"
    * continued): v₁ is the power iteration unchanged; v₂ comes from
    * deflation-free ORTHOGONALIZED power iteration — each step runs
    * the same G·v recurrence, rescales to 10⁴ integers, then projects
    * v₁ back out with the exact-integer Gram-Schmidt step above, so
    * the iterate converges to the dominant direction of v₁'s
    * orthogonal complement (the second eigenvector). Both the seed
    * and every step stay in int64 (|o| ≤ 10⁴·Σv₁² + ⟨u,v₁⟩·10⁴ ≈
    * 1.3·10¹⁴) and the one division per component is the
    * display-float discipline.
    *
    * Determinism: v₂ seeds at e_s'·10⁴ with s' = argmax_j of
    * G_jj·(10⁸ − v₁_j²) — diagonal mass × misalignment with v₁, ties
    * → smallest j. The score is zero only for dead axes (G_jj = 0,
    * whose power step would dead-end) or axes fully equal to v₁
    * (whose orthogonalization vanishes); it is zero for ALL j exactly
    * when every vector lives on the single v₁ axis — true rank-1 —
    * which raise_errors loudly. (argmin |v₁_j| looked simpler but
    * picks DEAD axes: a zero-mass dimension orthogonalizes fine and
    * then G·v = 0 on the first step.) The score's double product is
    * exact for G_jj < 2⁵³ (~10⁹ rows of milli-unit vectors) and
    * identical cross-engine regardless.
    * A corpus that is rank-1 within rounding (every G·v collapses
    * back onto v₁) raise_errors loudly instead of dividing by zero.
    *
    * Scale shape: ONE gram pass (shared with v₁ — localCheckpointed),
    * all iteration state dim-sized; the orthogonalization scalars are
    * 1-row aggregates. */
  def topComponents2(emb: DataFrame, iters: Int = 6,
                     dim: Int = 64): DataFrame = {
    require(iters >= 1 && dim >= 2,
      "topComponents2 needs dim >= 2 (a 1-dim space has no v2)")
    val gram = gramOf(emb)
    val v1 = powerIterate(gram, diagSeed(gram, dim), iters)
    val rank1Msg = "topComponents2: the corpus is rank-1 within " +
      "rounding — every direction collapses onto v1; no second " +
      "component exists"
    val s2 = gram.filter(col("i") === col("j"))
      .join(v1.select(col("j"), col("v").as("v1")), "j")
      .select(col("j"),
        (col("m").cast("double")
          * (lit(1.0e8d) - (col("v1") * col("v1")).cast("double")))
          .as("score"))
      .orderBy(col("score").desc, col("j")).limit(1)
      .select(when(col("score") === 0.0d, raise_error(lit(rank1Msg)))
        .otherwise(col("j")).as("s2j"))
    import emb.sparkSession.implicits._
    val seed0 = Seq.tabulate(dim)(j => j).toDF("j")
      .crossJoin(broadcast(s2))
      .select(col("j"),
        when(col("j") === col("s2j"), 10000L).otherwise(0L).as("u"))
    var v2 = rescale10k(orthogonalizeAgainst(seed0, v1), rank1Msg)
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val w = gram.join(v2, "j")
        .groupBy("i")
        .agg(sum(col("m").cast("decimal(38,0)") * col("v")).as("w"))
      val mw = w.agg(max(abs(col("w"))).as("mw"))
      val u = w.crossJoin(broadcast(mw))
        .select(col("i").as("j"),
          when(col("mw") === 0L, raise_error(lit(rank1Msg)))
            .otherwise(round(col("w").cast("double")
              / col("mw").cast("double") * lit(10000.0d)).cast("long"))
            .as("u"))
      v2 = rescale10k(orthogonalizeAgainst(u, v1), rank1Msg)
        .localCheckpoint()
    }
    v1.select(lit(1L).as("component"), col("j").as("dim"),
        col("v").as("v_unit"))
      .unionByName(v2.select(lit(2L).as("component"), col("j").as("dim"),
        col("v").as("v_unit")))
  }

  def topComponents2Query(spark: SparkSession, dir: String): DataFrame =
    topComponents2(Tables.embeddings(spark, dir))
      .orderBy(col("component"), col("dim"))

  /** All-but-the-top with k = 2: project v₁ out (the embed_all_but_top
    * residual), re-normalize to micro units, then project v₂ out of
    * the MICRO-rounded residual and re-normalize again — sequential
    * single-direction applications, each with one rounding, so every
    * intermediate stays int64- and double-exact (the second
    * projection's terms top out near 8.3·10¹⁵ < 2⁵³). v₂ ⟂ v₁, so
    * the second projection cannot reintroduce the first direction
    * beyond rounding. Zero vectors — and vectors whose ENTIRE mass
    * was the anisotropy (zero residual after either projection) —
    * degrade to NULL diagnostics + zero components. */
  def embedAllButTop2(emb: DataFrame, iters: Int = 6,
                      dim: Int = 64): DataFrame = {
    val both = topComponents2(emb, iters, dim).localCheckpoint()
    def dirRow(c: Long, va: String, vv: String) = both
      .filter(col("component") === c)
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("v_unit")))), s => s.getField("v_unit")).as(va))
      .select(col(va),
        aggregate(col(va), lit(0L), (a, x) => a + x * x).as(vv))
    val q = emb.select(col("vec_id"),
      transform(toDoubleArray(col("embedding")),
        x => round(x * lit(1000.0d)).cast("long")).as("q"))
    val r1 = q
      .crossJoin(broadcast(dirRow(1L, "va", "vv")))
      .withColumn("qq", aggregate(col("q"), lit(0L), (a, x) => a + x * x))
      .withColumn("xv",
        aggregate(zip_with(col("q"), col("va"), (x, vi) => x * vi),
          lit(0L), (a, x) => a + x))
      .withColumn("num",
        zip_with(col("q"), col("va"),
          (x, vi) => x * col("vv") - col("xv") * vi))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("num"),
          n => n.cast("double") * n.cast("double")),
          lit(0.0d), (a, x) => a + x)))
      .select(col("vec_id"), col("qq"), col("xv"), col("vv"),
        transform(col("num"), n =>
          when(col("nrm") === 0.0d, lit(0L))
            .otherwise(round(n.cast("double") / col("nrm")
              * lit(1000000.0d)).cast("long"))).as("r1"))
    r1.crossJoin(broadcast(dirRow(2L, "wa", "ww")))
      .withColumn("rr", aggregate(col("r1"), lit(0L), (a, x) => a + x * x))
      .withColumn("xw",
        aggregate(zip_with(col("r1"), col("wa"), (x, wi) => x * wi),
          lit(0L), (a, x) => a + x))
      .withColumn("num2",
        zip_with(col("r1"), col("wa"),
          (x, wi) => x * col("ww") - col("xw") * wi))
      .withColumn("nrm2",
        sqrt(aggregate(transform(col("num2"),
          n => n.cast("double") * n.cast("double")),
          lit(0.0d), (a, x) => a + x)))
      .select(col("vec_id"),
        when(col("qq") === 0L, lit(null).cast("long"))
          .otherwise(round(col("xv") / (sqrt(col("qq")) * sqrt(col("vv")))
            * lit(1000000.0d)).cast("long")).as("cos_top_micro"),
        when(col("rr") === 0L, lit(null).cast("long"))
          .otherwise(round(col("xw") / (sqrt(col("rr")) * sqrt(col("ww")))
            * lit(1000000.0d)).cast("long")).as("cos_top2_micro"),
        concat_ws(",", transform(col("num2"), n =>
          when(col("nrm2") === 0.0d, lit(0L))
            .otherwise(round(n.cast("double") / col("nrm2")
              * lit(1000000.0d)).cast("long")))).as("e_csv"))
  }

  def embedAllButTop2Query(spark: SparkSession, dir: String): DataFrame =
    embedAllButTop2(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  // ---------------------------------------------------------------- projection

  /** Deterministic ±1 sign matrix for signed random projection, from
    * the same md5 stream as planeMatrix so both engines can replicate
    * it as literals. */
  private[operators] def srpSigns(outDim: Int, inDim: Int): Seq[Seq[Int]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def s(tag: String): Int =
      if ((digest.digest(tag.getBytes("UTF-8"))(0) & 1) == 0) 1 else -1
    Seq.tabulate(outDim, inDim)((j, i) => s(s"srp#$j#$i"))
  }

  /** Signed-random-projection dimensionality reduction (Achlioptas
    * 2003's database-friendly JL variant): int8-quantize each vector,
    * then project through a fixed ±1 matrix to `outDim` integer
    * components. For sign rows s_j, E[(s_j·a)(s_j·b)] = a·b, so
    * projected dot products are unbiased inner-product estimators and
    * projected cosine approximates true cosine with stderr ~ 1/√outDim
    * — the compression layer that feeds clustering / LSH / ANN probes
    * when even the int8 corpus is too wide to scan (64 dims × 4 B
    * fp32 = 256 B/vec down to 16 × ~2 B ≈ 32 B/vec, 8x less I/O).
    *
    * Exactness contract: quantized components are |q| ≤ 127 ints, so
    * every projected component is an exact BIGINT sum (|p_j| ≤ 64·127)
    * and norm2 an exact sum of their squares — no float summation
    * order anywhere; the oracle replicates quantization + projection
    * bit-for-bit.
    *
    * Scale shape: entirely MAP-ONLY — the sign matrix is a literal in
    * the plan, quantization and both folds are in-row array ops; the
    * operator adds ZERO shuffles to a corpus scan at any size. */
  def embedProjectSrp(emb: DataFrame, outDim: Int = 16,
                      inDim: Int = 64): DataFrame = {
    val signsLit = array(srpSigns(outDim, inDim).map(row =>
      array(row.map(lit(_)): _*)): _*)
    vectors(emb)
      .select(col("vec_id"), graft.functions.Int8Quantize(col("e")).as("q"))
      // zip_with null-pads on length mismatch, which would silently
      // null the fold — reject wrong-width vectors loudly instead
      .withColumn("q", when(size(col("q")) === inDim, col("q"))
        .otherwise(raise_error(concat(lit(s"embedProjectSrp: expected $inDim-dim vector, got "),
          size(col("q")).cast("string")))))
      .select(col("vec_id"),
        transform(signsLit, r =>
          aggregate(zip_with(r, col("q"), (s, x) => (s * x).cast("long")),
            lit(0L), (acc, x) => acc + x)).as("p"))
      .select(col("vec_id"),
        concat_ws(",", col("p")).as("proj_csv"),
        aggregate(col("p"), lit(0L), (acc, x) => acc + x * x).as("norm2"))
  }

  def embedProjectSrpQuery(spark: SparkSession, dir: String): DataFrame =
    embedProjectSrp(Tables.embeddings(spark, dir)).orderBy(col("vec_id"))

  // ---------------------------------------------------------------- oracles

  /** Chained-CTE oracle for the greedy k-center traversal: m_i is the
    * running min-distance after i-1 picks, c_i the i-th pick (argmax
    * m_i, ties to smallest vec_id) — the same iterated `least` over
    * rounded-6 distances the Spark loop computes, so the selection
    * sequence and reported micro-distances match bit-for-bit. */
  private def kcenterOracle(k: Int): String = {
    def dist(a: String, b: String): String =
      s"round(1.0 - list_sum(list_transform(range(1, len($a.e)+1), " +
        s"i -> $a.e[i]*$b.e[i])) / ($a.nrm * $b.nrm), 6)"
    val sb = new StringBuilder(vectorCte)
    sb ++= ",c1 AS (SELECT vec_id, e, nrm FROM v WHERE vec_id = 0)"
    for (i <- 2 to k) {
      val m =
        if (i == 2)
          s"SELECT v.vec_id, v.e, v.nrm, ${dist("v", "c")} AS mind " +
            "FROM v CROSS JOIN c1 c"
        else
          s"SELECT m.vec_id, m.e, m.nrm, least(m.mind, ${dist("m", "c")}) " +
            s"AS mind FROM m${i - 1} m CROSS JOIN c${i - 1} c"
      sb ++= s",m$i AS ($m)"
      sb ++= s",c$i AS (SELECT vec_id, e, nrm, mind FROM m$i " +
        "ORDER BY mind DESC, vec_id LIMIT 1)"
    }
    sb ++= " SELECT 1 AS rnk, vec_id, CAST(2000000 AS BIGINT) AS dist_micro FROM c1"
    for (i <- 2 to k)
      sb ++= s" UNION ALL SELECT $i, vec_id, " +
        s"CAST(round(mind * 1000000) AS BIGINT) FROM c$i"
    sb ++= " ORDER BY rnk"
    sb.toString
  }

  /** Chained-CTE oracle for the MMR greedy: cand is the micro-unit
    * top-nCand shortlist, m_i the pool with the running max-similarity
    * after i-1 picks, c_i the argmax of the undivided integer score
    * 7·rel − 3·maxs (λ = 7/10, ties to smallest vec_id) — the same
    * iterated greatest() over once-rounded micro cosines the Spark
    * loop computes. */
  private def mmrOracle(k: Int, nCand: Int): String = {
    def simMicro(a: String, b: String): String =
      s"CAST(round((list_sum(list_transform(range(1, len($a.e)+1), " +
        s"i -> $a.e[i]*$b.e[i])) / ($a.nrm * $b.nrm)) * 1000000) AS BIGINT)"
    val sb = new StringBuilder(vectorCte)
    sb ++= ",q AS (SELECT vec_id, e, nrm FROM v WHERE vec_id = 0)"
    sb ++= s",rel AS (SELECT c.vec_id, c.e, c.nrm, " +
      s"${simMicro("c", "q")} AS rel_micro " +
      "FROM v c CROSS JOIN q WHERE c.vec_id <> 0)"
    sb ++= s",cand AS (SELECT vec_id, e, nrm, rel_micro FROM rel " +
      s"ORDER BY rel_micro DESC, vec_id LIMIT $nCand)"
    sb ++= ",c1 AS (SELECT vec_id, e, nrm, rel_micro FROM cand " +
      "ORDER BY rel_micro DESC, vec_id LIMIT 1)"
    for (i <- 2 to k) {
      val prev = if (i == 2) "cand" else s"m${i - 1}"
      val maxExpr =
        if (i == 2) simMicro("m", "s")
        else s"greatest(m.maxs, ${simMicro("m", "s")})"
      sb ++= s",m$i AS (SELECT m.vec_id, m.e, m.nrm, m.rel_micro, " +
        s"$maxExpr AS maxs FROM $prev m CROSS JOIN c${i - 1} s " +
        "WHERE m.vec_id <> s.vec_id)"
      sb ++= s",c$i AS (SELECT vec_id, e, nrm, rel_micro, maxs FROM m$i " +
        "ORDER BY (7 * rel_micro - 3 * maxs) DESC, vec_id LIMIT 1)"
    }
    sb ++= " SELECT 1 AS rnk, vec_id, rel_micro, " +
      "7 * rel_micro AS mmr_tenth_micro FROM c1"
    for (i <- 2 to k)
      sb ++= s" UNION ALL SELECT $i, vec_id, rel_micro, " +
        s"7 * rel_micro - 3 * maxs FROM c$i"
    sb ++= " ORDER BY rnk"
    sb.toString
  }

  private val vectorCte =
    """WITH v AS (
      | SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      | FROM embeddings)
      |""".stripMargin

  /** Full oracle for the LSH path: the plane matrix is deterministic
    * driver-side data, so it is embedded as SQL literals (Double
    * .toString round-trips exactly through DuckDB's parser) and the
    * whole bucket → probe → cosine → rank pipeline is replicated in
    * SQL. This checks the LSH plumbing itself, not just row counts. */
  private def annLshOracle(numQueries: Int, k: Int, numPlanes: Int,
                           probeHamming: Int = 1): String = {
    val planes = planeMatrix(numPlanes, 64)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(", ")}])"
    }.mkString(",\n   ")
    val probeRows = probeMasks(numPlanes, probeHamming).map(m => s"($m)").mkString(",")
    s"""WITH planes(pi, pvec) AS (VALUES
       |   $planeRows),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dots AS (
       | SELECT v.vec_id, p.pi,
       |  list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i] * p.pvec[i])) AS d
       | FROM v, planes p),
       |buckets AS (
       | SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << pi) ELSE 0 END) AS INTEGER) AS bucket
       | FROM dots GROUP BY 1),
       |q AS (
       | SELECT b.vec_id AS query_id, xor(b.bucket, m.m) AS probe
       | FROM buckets b, (VALUES $probeRows) AS m(m)
       | WHERE b.vec_id < $numQueries),
       |cand AS (
       | SELECT q.query_id, x.vec_id AS neighbor_id
       | FROM q JOIN buckets x ON x.bucket = q.probe AND x.vec_id <> q.query_id),
       |scored AS (
       | SELECT c.query_id, c.neighbor_id,
       |  round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i] * b.e[i]))
       |   / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
       |      * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS cos
       | FROM cand c JOIN v a ON c.query_id = a.vec_id
       |  JOIN v b ON c.neighbor_id = b.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Full oracle for the IVF path: centroids are the first C vectors,
    * so assignment, probing and ranking all replicate in SQL — the
    * whole serving pipeline is checked, not just row counts. */
  /** The shared cosine SQL fragment: dot and norms as in-order
    * list_sum folds, rounded to 6 dp — the CosineSimilarity parity
    * contract. Valid over DOUBLE and BIGINT lists (micro ints pass
    * through double exactly). */
  private[graft] def cosSql(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]))
       |   / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |      * sqrt(list_sum(list_transform($b, x -> x*x)))), 6)""".stripMargin

  /** cosSql over the first `d` components only — same sequential
    * accumulation order as CosineSimilarity over slice(·, 1, d). */
  private def cosSliceSql(a: String, b: String, d: Int): String =
    s"""round(list_sum(list_transform(range(1, ${d + 1}), i -> $a[i]*$b[i]))
       |   / (sqrt(list_sum(list_transform($a[1:$d], x -> x*x)))
       |      * sqrt(list_sum(list_transform($b[1:$d], x -> x*x)))), 6)""".stripMargin

  /** Per-subspace Lloyd replay — assumes CTEs `v(vec_id, e)` and
    * `sub(s)`; emits `cbt(sub, cid, c)`. Mirrors pqTrainCodebook:
    * micro-int subvectors, BIGINT L2 argmin (d2 asc, cid asc),
    * floored integer means, exact /10⁶ back to fp scale. */
  private def pqTrainCtes(subDim: Int, numCodes: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""vmi AS (SELECT vec_id,
      | list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS em
      | FROM v),
      |vms AS MATERIALIZED (SELECT vec_id, s.s AS sub,
      | list_transform(range(1, ${subDim + 1}),
      |                j -> em[s.s*$subDim + j]) AS xm
      | FROM vmi, sub s),
      |pinit AS (SELECT vec_id, CAST(row_number() OVER (
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS cid
      | FROM v),
      |pc0 AS (SELECT m.sub, p.cid, m.xm AS cm
      | FROM vms m JOIN pinit p USING (vec_id)
      | WHERE p.cid <= $numCodes)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
        |pa$t AS (SELECT m.vec_id, m.sub, m.xm, c.cid,
        |  list_sum(list_transform(range(1, ${subDim + 1}),
        |    i -> (m.xm[i]-c.cm[i])*(m.xm[i]-c.cm[i]))) AS d2
        | FROM vms m JOIN pc${t - 1} c ON m.sub = c.sub),
        |ps$t AS (SELECT sub, cid, xm FROM (
        | SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |   ORDER BY d2, cid) AS rn FROM pa$t) WHERE rn = 1),
        |pc$t AS MATERIALIZED (
        | SELECT sub, cid, list(cv ORDER BY i) AS cm FROM (
        |  SELECT sub, cid, i,
        |   CAST(floor(CAST(sum(xm[i]) AS DOUBLE)/count(*)) AS BIGINT) AS cv
        |  FROM ps$t, UNNEST(range(1, ${subDim + 1})) u(i)
        |  GROUP BY sub, cid, i)
        | GROUP BY sub, cid)""".stripMargin
    }
    sb ++= s""",
      |cbt AS (SELECT sub, cid, list_transform(cm, x -> x/1000000.0) AS c
      | FROM pc$iters)""".stripMargin
    sb.toString
  }

  /** The ADC chain against codebook CTE `cbName`, CTE names suffixed
    * by `sfx` — assumes `v`, `sub`, `cx(vec_id, sub, x)` and
    * `q(query_id, e, qn)`. Emits cand$sfx(query_id, neighbor_id, cos). */
  private def pqAdcCtes(cbName: String, sfx: String, subDim: Int): String =
    s"""enc$sfx AS (
       | SELECT vec_id, sub, cid FROM (
       |  SELECT cx.vec_id, cx.sub, cb.cid,
       |   row_number() OVER (PARTITION BY cx.vec_id, cx.sub ORDER BY
       |    round(list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cx.x[i]))
       |      + list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cb.c[i]*cb.c[i]))
       |      - 2*list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cb.c[i])),
       |     6), cb.cid) AS rn
       |  FROM cx JOIN $cbName cb ON cx.sub = cb.sub) WHERE rn = 1),
       |r2$sfx AS (
       | SELECT e.vec_id,
       |  sum(CAST(round(list_sum(list_transform(cb.c, x -> x*x)) * 1000000)
       |      AS BIGINT)) AS r2m
       | FROM enc$sfx e JOIN $cbName cb ON e.sub = cb.sub AND e.cid = cb.cid
       | GROUP BY 1),
       |tab$sfx AS (
       | SELECT q.query_id, cb.sub, cb.cid, q.qn,
       |  CAST(round(list_sum(list_transform(range(1, ${subDim + 1}),
       |    i -> q.e[cb.sub*$subDim + i] * cb.c[i])) * 1000000) AS BIGINT)
       |   AS tm
       | FROM q, $cbName cb),
       |sc$sfx AS (
       | SELECT t.query_id, e.vec_id, sum(t.tm) AS dm, min(t.qn) AS qn
       | FROM enc$sfx e JOIN tab$sfx t ON e.sub = t.sub AND e.cid = t.cid
       | WHERE t.query_id <> e.vec_id GROUP BY 1, 2),
       |cand$sfx AS (
       | SELECT sc.query_id, sc.vec_id AS neighbor_id,
       |  CASE WHEN r2.r2m <= 0 OR sc.qn = 0 THEN 0.0
       |       ELSE round((sc.dm / 1000000.0)
       |            / (sc.qn * sqrt(r2.r2m / 1000000.0)), 6) END AS cos
       | FROM sc$sfx sc JOIN r2$sfx r2 ON sc.vec_id = r2.vec_id)""".stripMargin

  /** A COMPLETE flat-ADC branch with its own subspace SHAPE — every
    * CTE suffixed so two different (numSub, subDim) shapes can serve
    * side by side in one statement (the equal-bytes comparison).
    * Assumes `v` and a query frame `q(query_id, e, qn)`. Emits
    * cand$sfx(query_id, neighbor_id, cos). */
  private def pqShapeBranchCtes(sfx: String, numSub: Int, subDim: Int,
                                numCodes: Int): String =
    s"""sub$sfx AS (SELECT unnest(range(0, $numSub)) AS s),
       |cb$sfx AS (
       | SELECT s.s AS sub, v.vec_id AS cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS c
       | FROM v, sub$sfx s WHERE v.vec_id < $numCodes),
       |cx$sfx AS (
       | SELECT v.vec_id, s.s AS sub,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS x
       | FROM v, sub$sfx s),
       |enc$sfx AS (
       | SELECT vec_id, sub, cid FROM (
       |  SELECT cx.vec_id, cx.sub, cb.cid,
       |   row_number() OVER (PARTITION BY cx.vec_id, cx.sub ORDER BY
       |    round(list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cx.x[i]))
       |      + list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cb.c[i]*cb.c[i]))
       |      - 2*list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cb.c[i])),
       |     6), cb.cid) AS rn
       |  FROM cx$sfx cx JOIN cb$sfx cb ON cx.sub = cb.sub) WHERE rn = 1),
       |r2$sfx AS (
       | SELECT e.vec_id,
       |  sum(CAST(round(list_sum(list_transform(cb.c, x -> x*x)) * 1000000)
       |      AS BIGINT)) AS r2m
       | FROM enc$sfx e JOIN cb$sfx cb ON e.sub = cb.sub AND e.cid = cb.cid
       | GROUP BY 1),
       |tab$sfx AS (
       | SELECT q.query_id, cb.sub, cb.cid, q.qn,
       |  CAST(round(list_sum(list_transform(range(1, ${subDim + 1}),
       |    i -> q.e[cb.sub*$subDim + i] * cb.c[i])) * 1000000) AS BIGINT)
       |   AS tm
       | FROM q, cb$sfx cb),
       |sc$sfx AS (
       | SELECT t.query_id, e.vec_id, sum(t.tm) AS dm, min(t.qn) AS qn
       | FROM enc$sfx e JOIN tab$sfx t ON e.sub = t.sub AND e.cid = t.cid
       | WHERE t.query_id <> e.vec_id GROUP BY 1, 2),
       |cand$sfx AS (
       | SELECT sc.query_id, sc.vec_id AS neighbor_id,
       |  CASE WHEN r2.r2m <= 0 OR sc.qn = 0 THEN 0.0
       |       ELSE round((sc.dm / 1000000.0)
       |            / (sc.qn * sqrt(r2.r2m / 1000000.0)), 6) END AS cos
       | FROM sc$sfx sc JOIN r2$sfx r2 ON sc.vec_id = r2.vec_id)""".stripMargin

  /** ann_pq_int4_topk oracle: the ann_pq_topk chain with the PACK →
    * UNPACK bit formula replayed in SQL between encode and serving —
    * packed[b] = cid[2b] | cid[2b+1] << 4, then cid = (packed[s div 2]
    * >> ((s % 2) · 4)) & 15 (DuckDB lists are 1-based, hence the +1
    * on the list index; Spark's [] is 0-based — both sides documented
    * at their use sites). */
  private def annPqInt4Oracle(numQueries: Int, k: Int, numSub: Int,
                              subDim: Int, numCodes: Int): String =
    s"""WITH ${pqSharedCtes(numQueries, numSub, subDim)},
       |cb AS (
       | SELECT s.s AS sub, v.vec_id AS cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS c
       | FROM v, sub s WHERE v.vec_id < $numCodes),
       |enc0 AS (
       | SELECT vec_id, sub, cid FROM (
       |  SELECT cx.vec_id, cx.sub, cb.cid,
       |   row_number() OVER (PARTITION BY cx.vec_id, cx.sub ORDER BY
       |    round(list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cx.x[i]))
       |      + list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cb.c[i]*cb.c[i]))
       |      - 2*list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cb.c[i])),
       |     6), cb.cid) AS rn
       |  FROM cx JOIN cb ON cx.sub = cb.sub) WHERE rn = 1),
       |packed AS (
       | SELECT vec_id,
       |  list_transform(range(0, ${numSub / 2}),
       |   b -> (codes[b*2 + 1] | (codes[b*2 + 2] << 4))) AS packed
       | FROM (SELECT vec_id, list(cid ORDER BY sub) AS codes
       |       FROM enc0 GROUP BY vec_id)),
       |enc AS (
       | SELECT p.vec_id, s.s AS sub,
       |  ((p.packed[s.s // 2 + 1] >> ((s.s % 2) * 4)) & 15) AS cid
       | FROM packed p, sub s),
       |r2 AS (
       | SELECT e.vec_id,
       |  sum(CAST(round(list_sum(list_transform(cb.c, x -> x*x)) * 1000000)
       |      AS BIGINT)) AS r2m
       | FROM enc e JOIN cb ON e.sub = cb.sub AND e.cid = cb.cid GROUP BY 1),
       |tab AS (
       | SELECT q.query_id, cb.sub, cb.cid, q.qn,
       |  CAST(round(list_sum(list_transform(range(1, ${subDim + 1}),
       |    i -> q.e[cb.sub*$subDim + i] * cb.c[i])) * 1000000) AS BIGINT)
       |   AS tm
       | FROM q, cb),
       |sc AS (
       | SELECT t.query_id, e.vec_id, sum(t.tm) AS dm, min(t.qn) AS qn
       | FROM enc e JOIN tab t ON e.sub = t.sub AND e.cid = t.cid
       | WHERE t.query_id <> e.vec_id GROUP BY 1, 2),
       |cand AS (
       | SELECT sc.query_id, sc.vec_id AS neighbor_id,
       |  CASE WHEN r2.r2m <= 0 OR sc.qn = 0 THEN 0.0
       |       ELSE round((sc.dm / 1000000.0)
       |            / (sc.qn * sqrt(r2.r2m / 1000000.0)), 6) END AS cos
       | FROM sc JOIN r2 ON sc.vec_id = r2.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** pq_int4_recall oracle: held-out queries, the two equal-byte
    * shapes each ADC-served over the full corpus, recall vs exact
    * truth. */
  private def pqInt4RecallOracle(numQueries: Int, k: Int,
                                 numCodes: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |tinit AS (SELECT vec_id FROM (
       | SELECT vec_id, row_number() OVER (
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM v)
       | WHERE rn <= $numCodes),
       |q AS MATERIALIZED (
       | SELECT vec_id AS query_id, e,
       |  sqrt(list_sum(list_transform(e, x -> x*x))) AS qn
       | FROM v
       | WHERE vec_id >= $numCodes
       |  AND vec_id NOT IN (SELECT vec_id FROM tinit)
       | ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC
       | LIMIT $numQueries),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT qv.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY qv.vec_id
       |     ORDER BY ${cosSql("qv.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v qv JOIN v x ON qv.vec_id <> x.vec_id
       |  WHERE qv.vec_id IN (SELECT query_id FROM q)) WHERE rnk <= $k),
       |${pqShapeBranchCtes("_w", numSub = 4, subDim = 16, numCodes)},
       |${pqShapeBranchCtes("_n", numSub = 8, subDim = 8, numCodes)},
       |served AS (
       | SELECT 'pq8_4x16' AS encoding, query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rnk FROM cand_w)
       | WHERE rnk <= $k
       | UNION ALL
       | SELECT 'int4_8x8', query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rnk FROM cand_n)
       | WHERE rnk <= $k),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM q)
       |SELECT s.encoding, CAST(4 AS BIGINT) AS bytes_per_vec,
       | CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM served s LEFT JOIN truth t
       | ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       | CROSS JOIN nq
       |GROUP BY 1, nq.n_q ORDER BY 1""".stripMargin

  private def pqSharedCtes(numQueries: Int, numSub: Int, subDim: Int,
                           heldoutFrom: Option[Int] = None): String = {
    val qCte = heldoutFrom match {
      case None =>
        s"""q AS (
           | SELECT vec_id AS query_id, e,
           |  sqrt(list_sum(list_transform(e, x -> x*x))) AS qn
           | FROM v WHERE vec_id < $numQueries)""".stripMargin
      case Some(numCodes) =>
        s"""tinit AS (SELECT vec_id FROM (
           | SELECT vec_id, row_number() OVER (
           |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM v)
           | WHERE rn <= $numCodes),
           |q AS MATERIALIZED (
           | SELECT vec_id AS query_id, e,
           |  sqrt(list_sum(list_transform(e, x -> x*x))) AS qn
           | FROM v
           | WHERE vec_id >= $numCodes
           |  AND vec_id NOT IN (SELECT vec_id FROM tinit)
           | ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC
           | LIMIT $numQueries)""".stripMargin
    }
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |$qCte,
       |cx AS (
       | SELECT v.vec_id, s.s AS sub,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS x
       | FROM v, sub s)""".stripMargin
  }

  private def annPqTrainedOracle(numQueries: Int, k: Int, numSub: Int,
                                 subDim: Int, numCodes: Int,
                                 iters: Int): String =
    s"""WITH ${pqSharedCtes(numQueries, numSub, subDim)},
       |${pqTrainCtes(subDim, numCodes, iters)},
       |${pqAdcCtes("cbt", "", subDim)}
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  private def pqTrainRecallOracle(numQueries: Int, k: Int, numSub: Int,
                                  subDim: Int, numCodes: Int,
                                  iters: Int): String =
    s"""WITH ${pqSharedCtes(numQueries, numSub, subDim,
             heldoutFrom = Some(numCodes))},
       |cbd AS (
       | SELECT s.s AS sub, v.vec_id AS cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS c
       | FROM v, sub s WHERE v.vec_id < $numCodes),
       |${pqTrainCtes(subDim, numCodes, iters)},
       |${pqAdcCtes("cbd", "_d", subDim)},
       |${pqAdcCtes("cbt", "_t", subDim)},
       |served AS (
       | SELECT 'default' AS codebook, query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rnk FROM cand_d)
       | WHERE rnk <= $k
       | UNION ALL
       | SELECT 'trained', query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rnk FROM cand_t)
       | WHERE rnk <= $k),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT qv.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY qv.vec_id
       |     ORDER BY ${cosSql("qv.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v qv JOIN v x ON qv.vec_id <> x.vec_id
       |  WHERE qv.vec_id IN (SELECT query_id FROM q)) WHERE rnk <= $k),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM q)
       |SELECT s.codebook,
       | CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM served s LEFT JOIN truth t
       | ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       | CROSS JOIN nq
       |GROUP BY 1, nq.n_q ORDER BY 1""".stripMargin

  /** The composed IVF+PQ serving chain as CTE SQL — assumes CTEs `v`,
    * `sub`, a centroid table `cents(cid, ce)` and a codebook
    * `$cbName(sub, cid, c)` are already defined, so ONE serving replay
    * checks both the data-seeded compose (ann_ivf_pq_topk) and the
    * fully-trained one (ann_ivf_pq_trained). */
  private def ivfPqServeSql(numQueries: Int, m: Int, k: Int, nProbe: Int,
                            subDim: Int, cbName: String): String =
    s"""ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |candi AS (
       | SELECT p.query_id, a.vec_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |cx AS (
       | SELECT v.vec_id, s.s AS sub,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS x
       | FROM v, sub s),
       |enc AS (
       | SELECT vec_id, sub, cid FROM (
       |  SELECT cx.vec_id, cx.sub, cb.cid,
       |   row_number() OVER (PARTITION BY cx.vec_id, cx.sub ORDER BY
       |    round(list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cx.x[i]))
       |      + list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cb.c[i]*cb.c[i]))
       |      - 2*list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cb.c[i])),
       |     6), cb.cid) AS rn
       |  FROM cx JOIN $cbName cb ON cx.sub = cb.sub) WHERE rn = 1),
       |r2 AS (
       | SELECT e.vec_id,
       |  sum(CAST(round(list_sum(list_transform(cb.c, x -> x*x)) * 1000000)
       |      AS BIGINT)) AS r2m
       | FROM enc e JOIN $cbName cb ON e.sub = cb.sub AND e.cid = cb.cid
       | GROUP BY 1),
       |q AS (
       | SELECT vec_id AS query_id, e,
       |  sqrt(list_sum(list_transform(e, x -> x*x))) AS qn
       | FROM v WHERE vec_id < $numQueries),
       |tab AS (
       | SELECT q.query_id, cb.sub, cb.cid, q.qn,
       |  CAST(round(list_sum(list_transform(range(1, ${subDim + 1}),
       |    i -> q.e[cb.sub*$subDim + i] * cb.c[i])) * 1000000) AS BIGINT)
       |   AS tm
       | FROM q, $cbName cb),
       |sc AS (
       | SELECT c.query_id, c.vec_id, sum(t.tm) AS dm, min(t.qn) AS qn
       | FROM candi c JOIN enc e ON c.vec_id = e.vec_id
       |  JOIN tab t ON t.query_id = c.query_id AND t.sub = e.sub
       |   AND t.cid = e.cid
       | GROUP BY 1, 2),
       |short AS (
       | SELECT query_id, vec_id FROM (
       |  SELECT sc.query_id, sc.vec_id,
       |   row_number() OVER (PARTITION BY sc.query_id ORDER BY
       |    CASE WHEN r2.r2m <= 0 OR sc.qn = 0 THEN 0.0
       |         ELSE round((sc.dm / 1000000.0)
       |              / (sc.qn * sqrt(r2.r2m / 1000000.0)), 6) END DESC,
       |    sc.vec_id) AS prnk
       |  FROM sc JOIN r2 ON sc.vec_id = r2.vec_id) WHERE prnk <= $m),
       |rr AS (
       | SELECT s.query_id, s.vec_id AS neighbor_id,
       |  ${cosSql("qv.e", "x.e")} AS cos
       | FROM short s JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v x ON s.vec_id = x.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM rr) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** ann_ivf_pq_topk oracle: the IVF candidate chain + the PQ code/
    * table chain + ADC shortlist + exact rerank, composed verbatim
    * from the two standalone oracles. */
  private def annIvfPqOracle(numQueries: Int, m: Int, k: Int,
                             numCentroids: Int, nProbe: Int, numSub: Int,
                             subDim: Int, numCodes: Int): String =
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v
       |          WHERE vec_id < $numCentroids),
       |cb AS (
       | SELECT s.s AS sub, v.vec_id AS cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS c
       | FROM v, sub s WHERE v.vec_id < $numCodes),
       |${ivfPqServeSql(numQueries, m, k, nProbe, subDim, "cb")}""".stripMargin

  /** ann_ivf_pq_trained oracle: BOTH exact-integer trainers replayed
    * (trainedCentsCtes = the micro-int Lloyd coarse quantizer,
    * pqTrainCtes = the per-subspace integer Lloyd codebooks), feeding
    * the SAME serving chain the untrained compose pins. */
  private def annIvfPqTrainedOracle(numQueries: Int, m: Int, k: Int,
                                    numCentroids: Int, nProbe: Int,
                                    numSub: Int, subDim: Int,
                                    numCodes: Int, iters: Int): String =
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |${trainedCentsCtes(numCentroids, iters)},
       |${pqTrainCtes(subDim, numCodes, iters)},
       |${ivfPqServeSql(numQueries, m, k, nProbe, subDim, "cbt")}""".stripMargin

  /** The residual-PQ BASE CTE chain — assumes `v`, `cents`,
    * `assigned(vec_id, cell)`. Emits resvm (micro vectors), cmm
    * (micro centroids — `cmExpr` is the per-component conversion:
    * ×10⁶ rounding for raw-scale centroids, a plain CAST for the
    * already-micro trained ones), resrm (residuals). */
  private def residualBaseCtes(cmExpr: String): String =
    s"""resvm AS (SELECT vec_id,
       | list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS em
       | FROM v),
       |cmm AS (SELECT cid AS cell,
       | list_transform(ce, x -> $cmExpr) AS cm
       | FROM cents),
       |resrm AS MATERIALIZED (
       | SELECT m.vec_id, a.cell,
       |  list_transform(range(1, len(m.em)+1), i -> m.em[i] - c.cm[i]) AS rm
       | FROM resvm m JOIN assigned a USING (vec_id)
       |  JOIN cmm c ON a.cell = c.cell)""".stripMargin

  /** Data-seeded residual codebook CTE `$name(sub, cid, wm)`. */
  private def residualSeedCbCte(name: String, subDim: Int, numCodes: Int,
                                seedFrom: Int): String =
    s"""$name AS (
       | SELECT s.s AS sub, r.vec_id AS cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> r.rm[s.s*$subDim + j]) AS wm
       | FROM resrm r, sub s
       | WHERE r.vec_id >= $seedFrom AND r.vec_id < ${seedFrom + numCodes})""".stripMargin

  /** TRAINED residual codebook CTEs — the integer Lloyd core replayed
    * over resrm's sub-slices (pqLloydOnMicro step for step: md5-rank
    * init over the residual frame's vec_ids, BIGINT-L2 assignment
    * ties cid asc, floored integer means). Emits `$name(sub, cid,
    * wm)` in micro scale. */
  private def residualTrainCbCtes(name: String, subDim: Int,
                                  numCodes: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""rvs AS MATERIALIZED (SELECT r.vec_id, s.s AS sub,
      | list_transform(range(1, ${subDim + 1}),
      |                j -> r.rm[s.s*$subDim + j]) AS xm
      | FROM resrm r, sub s),
      |rin AS (SELECT vec_id, CAST(row_number() OVER (
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS cid
      | FROM resrm),
      |rc0 AS (SELECT m.sub, p.cid, m.xm AS cm
      | FROM rvs m JOIN rin p USING (vec_id)
      | WHERE p.cid <= $numCodes)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
        |ra$t AS (SELECT m.vec_id, m.sub, m.xm, c.cid,
        |  list_sum(list_transform(range(1, ${subDim + 1}),
        |    i -> (m.xm[i]-c.cm[i])*(m.xm[i]-c.cm[i]))) AS d2
        | FROM rvs m JOIN rc${t - 1} c ON m.sub = c.sub),
        |rs$t AS (SELECT sub, cid, xm FROM (
        | SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |   ORDER BY d2, cid) AS rn FROM ra$t) WHERE rn = 1),
        |rc$t AS MATERIALIZED (
        | SELECT sub, cid, list(cv ORDER BY i) AS cm FROM (
        |  SELECT sub, cid, i,
        |   CAST(floor(CAST(sum(xm[i]) AS DOUBLE)/count(*)) AS BIGINT) AS cv
        |  FROM rs$t, UNNEST(range(1, ${subDim + 1})) u(i)
        |  GROUP BY sub, cid, i)
        | GROUP BY sub, cid)""".stripMargin
    }
    sb ++= s""",
      |$name AS (SELECT sub, cid, cm AS wm FROM rc$iters)""".stripMargin
    sb.toString
  }

  /** Encode + reconstruction against codebook CTE `$cbName`, names
    * suffixed `$sfx` — emits renc$sfx, xh$sfx, rrt$sfx, resr2$sfx. */
  private def residualIndexCtes(cbName: String, sfx: String,
                                subDim: Int): String =
    s"""rx$sfx AS (
       | SELECT r.vec_id, r.cell, s.s AS sub,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> r.rm[s.s*$subDim + j]) AS x
       | FROM resrm r, sub s),
       |renc$sfx AS MATERIALIZED (
       | SELECT vec_id, cell, sub, cid FROM (
       |  SELECT rx.vec_id, rx.cell, rx.sub, cb.cid,
       |   row_number() OVER (PARTITION BY rx.vec_id, rx.sub ORDER BY
       |    list_sum(list_transform(range(1, ${subDim + 1}),
       |      i -> (rx.x[i]-cb.wm[i])*(rx.x[i]-cb.wm[i]))), cb.cid) AS rn
       |  FROM rx$sfx rx JOIN $cbName cb ON rx.sub = cb.sub) WHERE rn = 1),
       |xh$sfx AS (
       | SELECT c.cell, w.sub, w.cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 i -> c.cm[w.sub*$subDim + i] + w.wm[i]) AS xh
       | FROM cmm c CROSS JOIN $cbName w),
       |rrt$sfx AS (SELECT cell, sub, cid,
       | CAST(list_sum(list_transform(xh, x -> x*x)) AS BIGINT) AS rr
       | FROM xh$sfx),
       |resr2$sfx AS (
       | SELECT e.vec_id, CAST(sum(t.rr) AS BIGINT) AS r2m
       | FROM renc$sfx e JOIN rrt$sfx t ON e.cell = t.cell
       |  AND e.sub = t.sub AND e.cid = t.cid
       | GROUP BY 1)""".stripMargin

  /** The residual-ADC candidate scoring — assumes candi(query_id,
    * vec_id), renc$sfx/xh$sfx/resr2$sfx, and a query frame
    * `$qName(query_id, qm, q2m)`. Emits rescand$sfx. */
  private def residualScoreCtes(qName: String, sfx: String,
                                subDim: Int): String =
    s"""restab$sfx AS (
       | SELECT q.query_id, q.q2m, x.cell, x.sub, x.cid,
       |  CAST(list_sum(list_transform(range(1, ${subDim + 1}),
       |    i -> q.qm[x.sub*$subDim + i] * x.xh[i])) AS BIGINT) AS tm
       | FROM $qName q CROSS JOIN xh$sfx x),
       |ressc$sfx AS (
       | SELECT c.query_id, c.vec_id, CAST(sum(t.tm) AS BIGINT) AS dm,
       |  min(t.q2m) AS q2m
       | FROM candi c JOIN renc$sfx e ON c.vec_id = e.vec_id
       |  JOIN restab$sfx t ON t.query_id = c.query_id AND t.cell = e.cell
       |   AND t.sub = e.sub AND t.cid = e.cid
       | GROUP BY 1, 2),
       |rescand$sfx AS (
       | SELECT sc.query_id, sc.vec_id,
       |  CASE WHEN r2.r2m <= 0 OR sc.q2m <= 0 THEN 0.0
       |       ELSE round(CAST(sc.dm AS DOUBLE)
       |            / (sqrt(CAST(sc.q2m AS DOUBLE))
       |               * sqrt(CAST(r2.r2m AS DOUBLE))), 6) END AS cos
       | FROM ressc$sfx sc JOIN resr2$sfx r2 ON sc.vec_id = r2.vec_id)""".stripMargin

  /** ann_ivf_pq_residual oracle: assignment → residual → encode →
    * per-(query, cell) ADC → shortlist → exact rerank, all replayed. */
  private def annIvfPqResidualOracle(numQueries: Int, m: Int, k: Int,
                                     numCentroids: Int, nProbe: Int,
                                     numSub: Int, subDim: Int,
                                     numCodes: Int): String =
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v
       |          WHERE vec_id < $numCentroids),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |candi AS (
       | SELECT p.query_id, a.vec_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |${residualBaseCtes("CAST(round(x * 1000000.0) AS BIGINT)")},
       |${residualSeedCbCte("rcb", subDim, numCodes, seedFrom = numCentroids)},
       |${residualIndexCtes("rcb", "", subDim)},
       |qres AS (
       | SELECT query_id, qm,
       |  CAST(list_sum(list_transform(qm, x -> x*x)) AS BIGINT) AS q2m
       | FROM (SELECT vec_id AS query_id,
       |   list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qm
       |  FROM v WHERE vec_id < $numQueries)),
       |${residualScoreCtes("qres", "", subDim)},
       |short AS (
       | SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id,
       |   row_number() OVER (PARTITION BY query_id
       |                      ORDER BY cos DESC, vec_id) AS prnk
       |  FROM rescand) WHERE prnk <= $m),
       |rrk AS (
       | SELECT s.query_id, s.vec_id AS neighbor_id,
       |  ${cosSql("qv.e", "x.e")} AS cos
       | FROM short s JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v x ON s.vec_id = x.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM rrk) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** ann_ivf_pq_residual_int4 oracle: the ann_ivf_pq_residual replay
    * with the PACK → UNPACK nibble formulas spliced between encode
    * and serving — codes list per vector, packed[b] = cid[2b] |
    * cid[2b+1] << 4, then cid = (packed[s div 2] >> ((s%2)·4)) & 15,
    * and the reconstructed-norm + ADC scoring read ONLY the unpacked
    * frame. Must return exactly what the unpacked replay returns. */
  private def annIvfPqResidualInt4Oracle(numQueries: Int, m: Int, k: Int,
                                         numCentroids: Int, nProbe: Int,
                                         numSub: Int, subDim: Int,
                                         numCodes: Int): String =
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v
       |          WHERE vec_id < $numCentroids),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |candi AS (
       | SELECT p.query_id, a.vec_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |${residualBaseCtes("CAST(round(x * 1000000.0) AS BIGINT)")},
       |${residualSeedCbCte("rcb", subDim, numCodes, seedFrom = numCentroids)},
       |${residualIndexCtes("rcb", "_b", subDim)},
       |rcodes AS (
       | SELECT vec_id, cell, list(cid ORDER BY sub) AS codes
       | FROM renc_b GROUP BY 1, 2),
       |rpk AS (
       | SELECT vec_id, cell,
       |  list_transform(range(0, ${numSub / 2}),
       |   b -> ((codes[b*2 + 1] - $numCentroids)
       |         | ((codes[b*2 + 2] - $numCentroids) << 4))) AS packed
       | FROM rcodes),
       |renc AS MATERIALIZED (
       | SELECT p.vec_id, p.cell, s.s AS sub,
       |  ((p.packed[s.s // 2 + 1] >> ((s.s % 2) * 4)) & 15)
       |    + $numCentroids AS cid
       | FROM rpk p, sub s),
       |xh AS (SELECT * FROM xh_b),
       |rrt AS (SELECT * FROM rrt_b),
       |resr2 AS (
       | SELECT e.vec_id, CAST(sum(t.rr) AS BIGINT) AS r2m
       | FROM renc e JOIN rrt t ON e.cell = t.cell
       |  AND e.sub = t.sub AND e.cid = t.cid
       | GROUP BY 1),
       |qres AS (
       | SELECT query_id, qm,
       |  CAST(list_sum(list_transform(qm, x -> x*x)) AS BIGINT) AS q2m
       | FROM (SELECT vec_id AS query_id,
       |   list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qm
       |  FROM v WHERE vec_id < $numQueries)),
       |${residualScoreCtes("qres", "", subDim)},
       |short AS (
       | SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id,
       |   row_number() OVER (PARTITION BY query_id
       |                      ORDER BY cos DESC, vec_id) AS prnk
       |  FROM rescand) WHERE prnk <= $m),
       |rrk AS (
       | SELECT s.query_id, s.vec_id AS neighbor_id,
       |  ${cosSql("qv.e", "x.e")} AS cos
       | FROM short s JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v x ON s.vec_id = x.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM rrk) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** pq_residual_recall oracle: held-out queries, ONE max-budget IVF
    * candidate set carrying probe RANKS, the raw-PQ ADC branch and
    * the residual branch each scored once, every probe budget served
    * by a rank filter + per-(budget, query) top-k, recall vs
    * brute-force truth. */
  private def pqResidualRecallOracle(numQueries: Int, k: Int,
                                     numCentroids: Int,
                                     nProbes: Seq[Int], numSub: Int,
                                     subDim: Int,
                                     numCodes: Int): String = {
    val maxP = nProbes.max
    val vals = nProbes.map(p => s"($p)").mkString(", ")
    val hqBound = numCentroids + numCodes
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v
       |          WHERE vec_id < $numCentroids),
       |tinit AS (SELECT vec_id FROM (
       | SELECT vec_id, row_number() OVER (
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM v)
       | WHERE rn <= $hqBound),
       |hq AS MATERIALIZED (
       | SELECT vec_id FROM v
       | WHERE vec_id >= $hqBound
       |  AND vec_id NOT IN (SELECT vec_id FROM tinit)
       | ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC
       | LIMIT $numQueries),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id IN (SELECT vec_id FROM hq))
       | WHERE rn <= $maxP),
       |candi AS (
       | SELECT p.query_id, a.vec_id, p.rn
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT qv.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY qv.vec_id
       |     ORDER BY ${cosSql("qv.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v qv JOIN v x ON qv.vec_id <> x.vec_id
       |  WHERE qv.vec_id IN (SELECT vec_id FROM hq)) WHERE rnk <= $k),
       |cb AS (
       | SELECT s.s AS sub, v.vec_id AS cid,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS c
       | FROM v, sub s WHERE v.vec_id < $numCodes),
       |cx AS (
       | SELECT v.vec_id, s.s AS sub,
       |  list_transform(range(1, ${subDim + 1}),
       |                 j -> v.e[s.s*$subDim + j]) AS x
       | FROM v, sub s),
       |enc AS (
       | SELECT vec_id, sub, cid FROM (
       |  SELECT cx.vec_id, cx.sub, cb.cid,
       |   row_number() OVER (PARTITION BY cx.vec_id, cx.sub ORDER BY
       |    round(list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cx.x[i]))
       |      + list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cb.c[i]*cb.c[i]))
       |      - 2*list_sum(list_transform(range(1, ${subDim + 1}),
       |       i -> cx.x[i]*cb.c[i])),
       |     6), cb.cid) AS rn
       |  FROM cx JOIN cb ON cx.sub = cb.sub) WHERE rn = 1),
       |r2 AS (
       | SELECT e.vec_id,
       |  sum(CAST(round(list_sum(list_transform(cb.c, x -> x*x)) * 1000000)
       |      AS BIGINT)) AS r2m
       | FROM enc e JOIN cb ON e.sub = cb.sub AND e.cid = cb.cid GROUP BY 1),
       |qraw AS (
       | SELECT v.vec_id AS query_id, v.e,
       |  sqrt(list_sum(list_transform(v.e, x -> x*x))) AS qn
       | FROM v WHERE v.vec_id IN (SELECT vec_id FROM hq)),
       |tab AS (
       | SELECT q.query_id, cb.sub, cb.cid, q.qn,
       |  CAST(round(list_sum(list_transform(range(1, ${subDim + 1}),
       |    i -> q.e[cb.sub*$subDim + i] * cb.c[i])) * 1000000) AS BIGINT)
       |   AS tm
       | FROM qraw q, cb),
       |rawsc AS (
       | SELECT c.query_id, c.vec_id, sum(t.tm) AS dm, min(t.qn) AS qn
       | FROM candi c JOIN enc e ON c.vec_id = e.vec_id
       |  JOIN tab t ON t.query_id = c.query_id AND t.sub = e.sub
       |   AND t.cid = e.cid
       | GROUP BY 1, 2),
       |rawcand AS (
       | SELECT sc.query_id, sc.vec_id,
       |  CASE WHEN r2.r2m <= 0 OR sc.qn = 0 THEN 0.0
       |       ELSE round((sc.dm / 1000000.0)
       |            / (sc.qn * sqrt(r2.r2m / 1000000.0)), 6) END AS cos
       | FROM rawsc sc JOIN r2 ON sc.vec_id = r2.vec_id),
       |${residualBaseCtes("CAST(round(x * 1000000.0) AS BIGINT)")},
       |${residualSeedCbCte("rcb", subDim, numCodes, seedFrom = numCentroids)},
       |${residualIndexCtes("rcb", "_r", subDim)},
       |qres AS (
       | SELECT query_id, qm,
       |  CAST(list_sum(list_transform(qm, x -> x*x)) AS BIGINT) AS q2m
       | FROM (SELECT vec_id AS query_id,
       |   list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qm
       |  FROM v WHERE vec_id IN (SELECT vec_id FROM hq))),
       |${residualScoreCtes("qres", "_r", subDim)},
       |served AS (
       | SELECT 'raw' AS encoding, n_probe, query_id,
       |  vec_id AS neighbor_id FROM (
       |  SELECT np.p AS n_probe, rc.query_id, rc.vec_id,
       |   row_number() OVER (PARTITION BY np.p, rc.query_id
       |     ORDER BY rc.cos DESC, rc.vec_id) AS rnk
       |  FROM (VALUES $vals) np(p)
       |   JOIN rawcand rc ON TRUE
       |   JOIN candi c ON c.query_id = rc.query_id
       |    AND c.vec_id = rc.vec_id AND c.rn <= np.p)
       | WHERE rnk <= $k
       | UNION ALL
       | SELECT 'residual', n_probe, query_id, vec_id FROM (
       |  SELECT np.p AS n_probe, rc.query_id, rc.vec_id,
       |   row_number() OVER (PARTITION BY np.p, rc.query_id
       |     ORDER BY rc.cos DESC, rc.vec_id) AS rnk
       |  FROM (VALUES $vals) np(p)
       |   JOIN rescand_r rc ON TRUE
       |   JOIN candi c ON c.query_id = rc.query_id
       |    AND c.vec_id = rc.vec_id AND c.rn <= np.p)
       | WHERE rnk <= $k),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM hq)
       |SELECT s.encoding, CAST(s.n_probe AS BIGINT) AS n_probe,
       | CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM served s LEFT JOIN truth t
       | ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       | CROSS JOIN nq
       |GROUP BY 1, 2, nq.n_q ORDER BY 1, 2""".stripMargin
  }

  /** rerank_budget_recall oracle: the residual-ADC chain ranked once
    * at the max shortlist budget, ONE exact-scored frame at max m, and
    * each rerank budget served by a rank filter + per-(m, query) exact
    * top-k — recall vs brute-force truth per m. */
  private def rerankBudgetRecallOracle(numQueries: Int, k: Int,
                                       ms: Seq[Int], numCentroids: Int,
                                       nProbe: Int, numSub: Int,
                                       subDim: Int, numCodes: Int): String = {
    val maxM = ms.max
    val vals = ms.map(m => s"($m)").mkString(", ")
    val hqBound = numCentroids + numCodes
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v
       |          WHERE vec_id < $numCentroids),
       |tinit AS (SELECT vec_id FROM (
       | SELECT vec_id, row_number() OVER (
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM v)
       | WHERE rn <= $hqBound),
       |hq AS MATERIALIZED (
       | SELECT vec_id FROM v
       | WHERE vec_id >= $hqBound
       |  AND vec_id NOT IN (SELECT vec_id FROM tinit)
       | ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC
       | LIMIT $numQueries),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id IN (SELECT vec_id FROM hq))
       | WHERE rn <= $nProbe),
       |candi AS (
       | SELECT p.query_id, a.vec_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT qv.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY qv.vec_id
       |     ORDER BY ${cosSql("qv.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v qv JOIN v x ON qv.vec_id <> x.vec_id
       |  WHERE qv.vec_id IN (SELECT vec_id FROM hq)) WHERE rnk <= $k),
       |${residualBaseCtes("CAST(round(x * 1000000.0) AS BIGINT)")},
       |${residualSeedCbCte("rcb", subDim, numCodes, seedFrom = numCentroids)},
       |${residualIndexCtes("rcb", "_r", subDim)},
       |qres AS (
       | SELECT query_id, qm,
       |  CAST(list_sum(list_transform(qm, x -> x*x)) AS BIGINT) AS q2m
       | FROM (SELECT vec_id AS query_id,
       |   list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qm
       |  FROM v WHERE vec_id IN (SELECT vec_id FROM hq))),
       |${residualScoreCtes("qres", "_r", subDim)},
       |shortr AS MATERIALIZED (
       | SELECT query_id, vec_id, prnk FROM (
       |  SELECT query_id, vec_id,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY cos DESC, vec_id) AS prnk
       |  FROM rescand_r) WHERE prnk <= $maxM),
       |exactsc AS MATERIALIZED (
       | SELECT s.query_id, s.vec_id, s.prnk,
       |  ${cosSql("qv.e", "x.e")} AS cos
       | FROM shortr s JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v x ON s.vec_id = x.vec_id),
       |served AS (
       | SELECT m, query_id, vec_id AS neighbor_id FROM (
       |  SELECT mm.m, e.query_id, e.vec_id,
       |   row_number() OVER (PARTITION BY mm.m, e.query_id
       |     ORDER BY e.cos DESC, e.vec_id) AS rnk
       |  FROM (VALUES $vals) mm(m)
       |   JOIN exactsc e ON e.prnk <= mm.m)
       | WHERE rnk <= $k),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM hq)
       |SELECT CAST(s.m AS BIGINT) AS m,
       | CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM served s LEFT JOIN truth t
       | ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       | CROSS JOIN nq
       |GROUP BY 1, nq.n_q ORDER BY 1""".stripMargin
  }

  /** ann_ivf_pq_residual_trained oracle: trained coarse centroids
    * (trainedCentsCtes — micro-valued, so cmm CASTS instead of
    * re-scaling), residuals, the residual-Lloyd codebook replay, and
    * the same encode→ADC→shortlist→rerank chain. */
  private def annIvfPqResidualTrainedOracle(numQueries: Int, m: Int,
                                            k: Int, numCentroids: Int,
                                            nProbe: Int, numSub: Int,
                                            subDim: Int, numCodes: Int,
                                            iters: Int): String =
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |${trainedCentsCtes(numCentroids, iters)},
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |candi AS (
       | SELECT p.query_id, a.vec_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |${residualBaseCtes("CAST(x AS BIGINT)")},
       |${residualTrainCbCtes("rcbt", subDim, numCodes, iters)},
       |${residualIndexCtes("rcbt", "", subDim)},
       |qres AS (
       | SELECT query_id, qm,
       |  CAST(list_sum(list_transform(qm, x -> x*x)) AS BIGINT) AS q2m
       | FROM (SELECT vec_id AS query_id,
       |   list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qm
       |  FROM v WHERE vec_id < $numQueries)),
       |${residualScoreCtes("qres", "", subDim)},
       |short AS (
       | SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id,
       |   row_number() OVER (PARTITION BY query_id
       |                      ORDER BY cos DESC, vec_id) AS prnk
       |  FROM rescand) WHERE prnk <= $m),
       |rrk AS (
       | SELECT s.query_id, s.vec_id AS neighbor_id,
       |  ${cosSql("qv.e", "x.e")} AS cos
       | FROM short s JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v x ON s.vec_id = x.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM rrk) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** pq_residual_trained_recall oracle: ONE trained coarse + candidate
    * set, the seeded and Lloyd-trained residual codebooks served
    * side-by-side from the ADC estimate, recall vs exact truth. */
  private def pqResidualTrainedRecallOracle(numQueries: Int, k: Int,
                                            numCentroids: Int, nProbe: Int,
                                            numSub: Int, subDim: Int,
                                            numCodes: Int,
                                            iters: Int): String = {
    val hqBound = numCentroids + numCodes
    s"""WITH v AS (
       | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sub AS (SELECT unnest(range(0, $numSub)) AS s),
       |${trainedCentsCtes(numCentroids, iters)},
       |tinit AS (SELECT vec_id FROM (
       | SELECT vec_id, row_number() OVER (
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM v)
       | WHERE rn <= $hqBound),
       |hq AS MATERIALIZED (
       | SELECT vec_id FROM v
       | WHERE vec_id >= $hqBound
       |  AND vec_id NOT IN (SELECT vec_id FROM tinit)
       | ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC
       | LIMIT $numQueries),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id IN (SELECT vec_id FROM hq))
       | WHERE rn <= $nProbe),
       |candi AS (
       | SELECT p.query_id, a.vec_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT qv.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY qv.vec_id
       |     ORDER BY ${cosSql("qv.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v qv JOIN v x ON qv.vec_id <> x.vec_id
       |  WHERE qv.vec_id IN (SELECT vec_id FROM hq)) WHERE rnk <= $k),
       |${residualBaseCtes("CAST(x AS BIGINT)")},
       |${residualSeedCbCte("rcb", subDim, numCodes, seedFrom = numCentroids)},
       |${residualTrainCbCtes("rcbt", subDim, numCodes, iters)},
       |qres AS (
       | SELECT query_id, qm,
       |  CAST(list_sum(list_transform(qm, x -> x*x)) AS BIGINT) AS q2m
       | FROM (SELECT vec_id AS query_id,
       |   list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qm
       |  FROM v WHERE vec_id IN (SELECT vec_id FROM hq))),
       |${residualIndexCtes("rcb", "_s", subDim)},
       |${residualScoreCtes("qres", "_s", subDim)},
       |${residualIndexCtes("rcbt", "_t", subDim)},
       |${residualScoreCtes("qres", "_t", subDim)},
       |served AS (
       | SELECT 'seeded' AS codebook, query_id, vec_id AS neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, vec_id) AS rnk FROM rescand_s)
       | WHERE rnk <= $k
       | UNION ALL
       | SELECT 'trained', query_id, vec_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, vec_id) AS rnk FROM rescand_t)
       | WHERE rnk <= $k),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM hq)
       |SELECT s.codebook,
       | CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM served s LEFT JOIN truth t
       | ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       | CROSS JOIN nq
       |GROUP BY 1, nq.n_q ORDER BY 1""".stripMargin
  }

  /** ann_matryoshka_recall oracle: one MATERIALIZED candidate block
    * scoring every tier in-row, UNION-ALL unpivot, per-tier top-k,
    * hits vs the top-tier truth. */
  private def annMatryoshkaOracle(numQueries: Int, k: Int,
                                  tiers: Seq[Int]): String = {
    val tierCols = tiers.map(d =>
      s"${cosSliceSql("q.eq", "x.e", d)} AS cos_$d").mkString(",\n  ")
    val unpivot = tiers.map(d =>
      s"SELECT query_id, vec_id, CAST($d AS BIGINT) AS dims, cos_$d AS cos FROM cand")
      .mkString("\n UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS eq FROM v
       |      WHERE vec_id < $numQueries),
       |cand AS MATERIALIZED (
       | SELECT q.query_id, x.vec_id,
       |  $tierCols
       | FROM q JOIN v x ON x.vec_id <> q.query_id),
       |long AS ($unpivot),
       |edges AS MATERIALIZED (
       | SELECT dims, query_id, vec_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY dims, query_id
       |                               ORDER BY cos DESC, vec_id) AS rnk
       |  FROM long) WHERE rnk <= $k),
       |truth AS (SELECT query_id, vec_id FROM edges
       |          WHERE dims = ${tiers.max}),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM q)
       |SELECT e.dims, CAST(sum(CASE WHEN t.query_id IS NOT NULL
       |  THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL
       |  THEN 1 ELSE 0 END) AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM edges e LEFT JOIN truth t
       | ON t.query_id = e.query_id AND t.vec_id = e.vec_id
       | CROSS JOIN nq
       |GROUP BY e.dims, nq.n_q ORDER BY dims""".stripMargin
  }

  /** The IVF serving CTE chain — assumes CTEs `v(vec_id, e)` and
    * `cents(cid, ce)` are already defined, so the SAME serving SQL
    * checks the default-centroid and trained-centroid paths. */
  private def ivfServingSql(numQueries: Int, k: Int, nProbe: Int): String =
    s"""ac AS (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |cand AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |scored AS (
       | SELECT c.query_id, c.neighbor_id,
       |  ${cosSql("q.e", "x.e")} AS cos
       | FROM cand c JOIN v q ON c.query_id = q.vec_id
       |  JOIN v x ON c.neighbor_id = x.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM scored) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  private def annIvfOracle(numQueries: Int, k: Int, numCentroids: Int,
                           nProbe: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $numCentroids),
       |${ivfServingSql(numQueries, k, nProbe)}""".stripMargin

  /** trainIvfCentroidsExact replicated as SQL CTEs — micro rounding,
    * md5-ordered init, per-iteration round(cos,6)/cid-tiebreak
    * assignment and floored integer-mean update, ending in
    * `cents(cid, ce)` ready for [[ivfServingSql]]. Assumes `v`. */
  private[graft] def trainedCentsCtes(numCentroids: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""vm AS (SELECT vec_id,
      | list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS em
      | FROM v),
      |tc0 AS (SELECT cid, cm FROM (
      | SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
      |   vec_id) AS BIGINT) AS cid, em AS cm FROM vm)
      | WHERE cid <= $numCentroids)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
        |ta$t AS (SELECT m.vec_id, m.em, c.cid,
        |  ${cosSql("m.em", "c.cm")} AS ccos
        | FROM vm m CROSS JOIN tc${t - 1} c),
        |ts$t AS (SELECT vec_id, em, cell FROM (
        | SELECT vec_id, em, cid AS cell,
        |  row_number() OVER (PARTITION BY vec_id
        |                     ORDER BY ccos DESC, cid) AS rn
        | FROM ta$t) WHERE rn = 1),
        |tc$t AS (SELECT cell AS cid, list(cv ORDER BY i) AS cm FROM (
        | SELECT cell, i,
        |  CAST(floor(CAST(sum(em[i]) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        | FROM ts$t, UNNEST(range(1, len(em)+1)) u(i) GROUP BY cell, i)
        | GROUP BY cell)""".stripMargin
    }
    sb ++= s""",
      |cents AS (SELECT cid, list_transform(cm, x -> CAST(x AS DOUBLE)) AS ce
      | FROM tc$iters)""".stripMargin
    sb.toString
  }

  private def annIvfTrainedOracle(numQueries: Int, k: Int, numCentroids: Int,
                                  nProbe: Int, iters: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |${trainedCentsCtes(numCentroids, iters)},
       |${ivfServingSql(numQueries, k, nProbe)}""".stripMargin

  /** ann_recall_trained oracle: both centroid tables tagged and
    * unioned, one serving/ranking chain partitioned by tag, recall
    * against the shared brute-force truth. Queries are the HELD-OUT
    * set — [[heldoutQueries]]'s rule replayed: drop vec_id < C, drop
    * the md5-ASC first-C trained init sample, take the md5-DESC tail
    * Q. */
  private def annRecallTrainedOracle(numQueries: Int, k: Int,
                                     numCentroids: Int, iters: Int,
                                     nProbes: Seq[Int]): String = {
    val maxP = nProbes.max
    val vals = nProbes.map(p => s"($p)").mkString(", ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |${trainedCentsCtes(numCentroids, iters)},
       |tinit AS (SELECT vec_id FROM (
       | SELECT vec_id, row_number() OVER (
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM v)
       | WHERE rn <= $numCentroids),
       |hq AS MATERIALIZED (
       | SELECT vec_id FROM v
       | WHERE vec_id >= $numCentroids
       |  AND vec_id NOT IN (SELECT vec_id FROM tinit)
       | ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC
       | LIMIT $numQueries),
       |dcents AS (SELECT vec_id AS cid, e AS ce FROM v
       | WHERE vec_id < $numCentroids),
       |allc AS (SELECT 'default' AS tag, cid, ce FROM dcents
       | UNION ALL SELECT 'trained', cid, ce FROM cents),
       |ac AS (
       | SELECT c.tag, v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN allc c),
       |assigned AS (
       | SELECT tag, vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY tag, vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT tag, vec_id AS query_id, cid AS probe, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY tag, vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id IN (SELECT vec_id FROM hq)) WHERE rn <= $maxP),
       |exact_scored AS (
       | SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |  ${cosSql("q.e", "x.e")} AS cos
       | FROM v q JOIN v x ON q.vec_id <> x.vec_id
       | WHERE q.vec_id IN (SELECT vec_id FROM hq)),
       |exact AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM exact_scored) WHERE rnk <= $k),
       |cand AS (
       | SELECT pr.tag, np.p AS n_probe, pr.query_id, a.vec_id AS neighbor_id
       | FROM (VALUES $vals) np(p)
       |  JOIN probes pr ON pr.rn <= np.p
       |  JOIN assigned a ON a.tag = pr.tag AND a.cell = pr.probe
       |   AND a.vec_id <> pr.query_id),
       |scored AS (
       | SELECT c.tag, c.n_probe, c.query_id, c.neighbor_id,
       |  ${cosSql("q.e", "x.e")} AS cos
       | FROM cand c JOIN v q ON c.query_id = q.vec_id
       |  JOIN v x ON c.neighbor_id = x.vec_id),
       |ranked AS (
       | SELECT tag, n_probe, query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY tag, n_probe, query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= $k),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM hq)
       |SELECT r.tag AS centroids, r.n_probe,
       |  CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS hits,
       |  (10000 * CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT)) // (nq.n_q * $k) AS recall_bp
       |FROM ranked r LEFT JOIN exact e
       | ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
       | CROSS JOIN nq
       |GROUP BY 1, 2, nq.n_q ORDER BY 1, 2""".stripMargin
  }

  /** Full oracle for the composed IVF × int8 × fp32-rerank path: the
    * IVF assignment/probing fragments are [[annIvfOracle]]'s, the
    * quantization is embed_quantize_int8's explicit sign·floor form,
    * and the int8 shortlist scoring is exact integer arithmetic (|q| <=
    * 127 ⇒ 64-dim dots <= ~1.03e6, exactly representable in double in
    * any order) — so the WHOLE three-stage pipeline replicates in SQL
    * bit-for-bit, not just row counts. */
  /** Oracle for the from-index serving path: identical CTE chain to
    * the rerank oracle up to the candidate set, then the top-k ranks
    * directly on the quantized cosine computed from the stored-index
    * integers (exact small-int arithmetic, bit-stable cross-engine). */
  /** ann_recall_eval oracle: the annIvfOracle CTE chain ranked once
    * per nProbe value (a VALUES fan-out over the probe-rank filter),
    * the brute-force exact top-k as the truth set, hits by left join. */
  private def annRecallOracle(numQueries: Int, k: Int, numCentroids: Int,
                              nProbes: Seq[Int]): String = {
    val maxP = nProbes.max
    val vals = nProbes.map(p => s"($p)").mkString(", ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $numCentroids),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  round(list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]))
       |   / (sqrt(list_sum(list_transform(v.e, x -> x*x)))
       |      * sqrt(list_sum(list_transform(c.ce, x -> x*x)))), 6) AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $maxP),
       |exact_scored AS (
       | SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |  round(list_sum(list_transform(range(1, len(q.e)+1), i -> q.e[i]*x.e[i]))
       |   / (sqrt(list_sum(list_transform(q.e, y -> y*y)))
       |      * sqrt(list_sum(list_transform(x.e, y -> y*y)))), 6) AS cos
       | FROM v q JOIN v x ON q.vec_id < $numQueries AND q.vec_id <> x.vec_id),
       |exact AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM exact_scored) WHERE rnk <= $k),
       |cand AS (
       | SELECT np.p AS n_probe, pr.query_id, a.vec_id AS neighbor_id
       | FROM (VALUES $vals) np(p)
       |  JOIN probes pr ON pr.rn <= np.p
       |  JOIN assigned a ON a.cell = pr.probe AND a.vec_id <> pr.query_id),
       |scored AS (
       | SELECT c.n_probe, c.query_id, c.neighbor_id,
       |  round(list_sum(list_transform(range(1, len(q.e)+1), i -> q.e[i]*x.e[i]))
       |   / (sqrt(list_sum(list_transform(q.e, y -> y*y)))
       |      * sqrt(list_sum(list_transform(x.e, y -> y*y)))), 6) AS cos
       | FROM cand c JOIN v q ON c.query_id = q.vec_id
       |  JOIN v x ON c.neighbor_id = x.vec_id),
       |ranked AS (
       | SELECT n_probe, query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY n_probe, query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= $k)
       |SELECT r.n_probe, r.query_id,
       |  CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS hits,
       |  (10000 * CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT)) // $k AS recall_bp
       |FROM ranked r LEFT JOIN exact e
       | ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** top_component oracle: the identical milli-gram + max-rescaled
    * power recurrence unrolled as MATERIALIZED CTEs (plain CTE
    * inlining would replay the gram per reference — the k-core
    * lesson). */
  private def topComponentOracle(iters: Int, dim: Int): String =
    s"""WITH ${topComponentCtes(iters, dim)}
       |SELECT j AS dim, v AS v_unit FROM v$iters ORDER BY dim""".stripMargin

  /** The power-iteration CTE chain alone (qm … v$iters) — shared by
    * top_component and the all-but-the-top transform oracles. */
  private def topComponentCtes(iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""qm AS (
      | SELECT list_transform(embedding::DOUBLE[],
      |   x -> CAST(round(x * 1000.0) AS BIGINT)) AS q
      | FROM embeddings),
      |px AS (SELECT q, unnest(range(1, len(q) + 1)) AS i FROM qm),
      |pr AS (SELECT q, i, unnest(range(1, len(q) + 1)) AS j FROM px),
      |g AS MATERIALIZED (
      | SELECT i - 1 AS i, j - 1 AS j, CAST(sum(q[i] * q[j]) AS BIGINT) AS m
      | FROM pr GROUP BY 1, 2),
      |sd AS (SELECT i AS sj FROM g WHERE i = j ORDER BY m DESC, i LIMIT 1),
      |v0 AS MATERIALIZED (
      | SELECT jj AS j, CASE WHEN jj = (SELECT sj FROM sd)
      |  THEN 10000 ELSE 0 END AS v
      | FROM (SELECT unnest(range(0, $dim)) AS jj))""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",w$t AS MATERIALIZED (
        | SELECT g.i, sum(CAST(g.m AS HUGEINT) * vp.v) AS w
        | FROM g JOIN v${t - 1} vp ON g.j = vp.j GROUP BY 1),
        |m$t AS MATERIALIZED (SELECT max(abs(w)) AS mw FROM w$t),
        |v$t AS MATERIALIZED (
        | SELECT i AS j, CAST(round(CAST(w AS DOUBLE) / CAST(mw AS DOUBLE)
        |   * 10000.0) AS BIGINT) AS v
        | FROM w$t, m$t)""".stripMargin
    }
    sb.toString
  }

  /** The all-but-the-top projection CTE chain over the power
    * iteration's v$iters — emits `abt(vec_id, qq, xv, vv, num, nrm)`,
    * the exact-integer residual frame both abt oracles read. */
  private def allButTopCtes(iters: Int, dim: Int): String =
    s"""${topComponentCtes(iters, dim)},
       |varr AS MATERIALIZED (
       | SELECT list(v ORDER BY j) AS va,
       |  CAST(list_sum(list_transform(list(v ORDER BY j), y -> y * y))
       |   AS BIGINT) AS vv
       | FROM v$iters),
       |qv AS (
       | SELECT vec_id, list_transform(embedding::DOUBLE[],
       |   x -> CAST(round(x * 1000.0) AS BIGINT)) AS q
       | FROM embeddings),
       |pj AS (
       | SELECT qv.vec_id, qv.q, r.va, r.vv,
       |  CAST(list_sum(list_transform(qv.q, y -> y * y)) AS BIGINT) AS qq,
       |  CAST(list_sum(list_transform(range(1, len(qv.q) + 1),
       |    i -> qv.q[i] * r.va[i])) AS BIGINT) AS xv
       | FROM qv CROSS JOIN varr r),
       |abt AS MATERIALIZED (
       | SELECT vec_id, qq, xv, vv, num,
       |  sqrt(list_sum(list_transform(num,
       |    n -> CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS nrm
       | FROM (
       |  SELECT vec_id, qq, xv, vv,
       |   list_transform(range(1, len(q) + 1),
       |     i -> q[i] * vv - xv * va[i]) AS num
       |  FROM pj))""".stripMargin

  /** The orthogonalized-power v₂ CTE chain on top of
    * [[topComponentCtes]] — seed at argmax G_jj·(10⁸ − v₁_j²) (the
    * diagonal-mass-times-misalignment pick: a high-variance axis the
    * first direction poorly covers, matching topComponents2's seed —
    * argmin |v₁_j| would pick DEAD axes), per step: HUGEINT G·v, 10⁴
    * rescale, exact Gram-Schmidt vs v$iters, 10⁴ rescale. Emits
    * b2_$iters(j, v) — the second direction. */
  private def topComponents2Ctes(iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""${topComponentCtes(iters, dim)},
      |s2 AS (
      | SELECT j AS s2j FROM (
      |  SELECT d.j,
      |   CAST(d.m AS DOUBLE) * (100000000.0 - CAST(p.v * p.v AS DOUBLE))
      |    AS score
      |  FROM (SELECT i AS j, m FROM g WHERE i = j) d
      |   JOIN v$iters p USING (j))
      | ORDER BY score DESC, j LIMIT 1),
      |vv1s AS (SELECT CAST(sum(v * v) AS BIGINT) AS vv1 FROM v$iters),
      |u2_0 AS (
      | SELECT jj AS j, CASE WHEN jj = (SELECT s2j FROM s2)
      |  THEN 10000 ELSE 0 END AS u
      | FROM (SELECT unnest(range(0, $dim)) AS jj))""".stripMargin
    for (t <- 0 to iters) {
      if (t > 0) sb ++= s""",
        |w2_$t AS MATERIALIZED (
        | SELECT g.i, sum(CAST(g.m AS HUGEINT) * vp.v) AS w
        | FROM g JOIN b2_${t - 1} vp ON g.j = vp.j GROUP BY 1),
        |wm2_$t AS (SELECT max(abs(w)) AS mw FROM w2_$t),
        |u2_$t AS (
        | SELECT i AS j, CAST(round(CAST(w AS DOUBLE) / CAST(mw AS DOUBLE)
        |   * 10000.0) AS BIGINT) AS u
        | FROM w2_$t, wm2_$t)""".stripMargin
      sb ++= s""",
        |d2_$t AS (
        | SELECT CAST(sum(u.u * p.v) AS BIGINT) AS uv
        | FROM u2_$t u JOIN v$iters p USING (j)),
        |o2_$t AS MATERIALIZED (
        | SELECT u.j,
        |  u.u * (SELECT vv1 FROM vv1s) - (SELECT uv FROM d2_$t) * p.v AS o
        | FROM u2_$t u JOIN v$iters p USING (j)),
        |m2_$t AS (SELECT max(abs(o)) AS mo FROM o2_$t),
        |b2_$t AS MATERIALIZED (
        | SELECT j, CAST(round(CAST(o AS DOUBLE) / CAST(mo AS DOUBLE)
        |   * 10000.0) AS BIGINT) AS v
        | FROM o2_$t, m2_$t)""".stripMargin
    }
    sb.toString
  }

  private def topComponents2Oracle(iters: Int, dim: Int): String =
    s"""WITH ${topComponents2Ctes(iters, dim)}
       |SELECT CAST(1 AS BIGINT) AS component, j AS dim, v AS v_unit
       |FROM v$iters
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), j, v FROM b2_$iters
       |ORDER BY component, dim""".stripMargin

  private def embedAllButTop2Oracle(iters: Int, dim: Int): String =
    s"""WITH ${topComponents2Ctes(iters, dim)},
       |varr AS MATERIALIZED (
       | SELECT list(v ORDER BY j) AS va,
       |  CAST(list_sum(list_transform(list(v ORDER BY j), y -> y * y))
       |   AS BIGINT) AS vv
       | FROM v$iters),
       |warr AS MATERIALIZED (
       | SELECT list(v ORDER BY j) AS wa,
       |  CAST(list_sum(list_transform(list(v ORDER BY j), y -> y * y))
       |   AS BIGINT) AS ww
       | FROM b2_$iters),
       |qv AS (
       | SELECT vec_id, list_transform(embedding::DOUBLE[],
       |   x -> CAST(round(x * 1000.0) AS BIGINT)) AS q
       | FROM embeddings),
       |pj AS (
       | SELECT qv.vec_id, qv.q, r.va, r.vv,
       |  CAST(list_sum(list_transform(qv.q, y -> y * y)) AS BIGINT) AS qq,
       |  CAST(list_sum(list_transform(range(1, len(qv.q) + 1),
       |    i -> qv.q[i] * r.va[i])) AS BIGINT) AS xv
       | FROM qv CROSS JOIN varr r),
       |r1v AS MATERIALIZED (
       | SELECT vec_id, qq, xv, vv,
       |  list_transform(num, n -> CAST(CASE WHEN nrm = 0 THEN 0
       |   ELSE round(CAST(n AS DOUBLE) / nrm * 1000000.0)
       |   END AS BIGINT)) AS r1
       | FROM (
       |  SELECT vec_id, qq, xv, vv, num,
       |   sqrt(list_sum(list_transform(num,
       |     n -> CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS nrm
       |  FROM (
       |   SELECT vec_id, qq, xv, vv,
       |    list_transform(range(1, len(q) + 1),
       |      i -> q[i] * vv - xv * va[i]) AS num
       |   FROM pj))),
       |p2 AS (
       | SELECT r.vec_id, r.qq, r.xv, r.vv, r.r1, w.wa, w.ww,
       |  CAST(list_sum(list_transform(r.r1, y -> y * y)) AS BIGINT) AS rr,
       |  CAST(list_sum(list_transform(range(1, len(r.r1) + 1),
       |    i -> r.r1[i] * w.wa[i])) AS BIGINT) AS xw
       | FROM r1v r CROSS JOIN warr w),
       |f2 AS (
       | SELECT vec_id, qq, xv, vv, rr, xw, ww, num2,
       |  sqrt(list_sum(list_transform(num2,
       |    n -> CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS nrm2
       | FROM (
       |  SELECT *, list_transform(range(1, len(r1) + 1),
       |    i -> r1[i] * ww - xw * wa[i]) AS num2
       |  FROM p2))
       |SELECT vec_id,
       | CASE WHEN qq = 0 THEN NULL
       |  ELSE CAST(round(CAST(xv AS DOUBLE)
       |   / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(vv AS DOUBLE)))
       |   * 1000000.0) AS BIGINT) END AS cos_top_micro,
       | CASE WHEN rr = 0 THEN NULL
       |  ELSE CAST(round(CAST(xw AS DOUBLE)
       |   / (sqrt(CAST(rr AS DOUBLE)) * sqrt(CAST(ww AS DOUBLE)))
       |   * 1000000.0) AS BIGINT) END AS cos_top2_micro,
       | array_to_string(list_transform(num2, n ->
       |  CAST(CASE WHEN nrm2 = 0 THEN 0
       |   ELSE round(CAST(n AS DOUBLE) / nrm2 * 1000000.0)
       |   END AS BIGINT)), ',') AS e_csv
       |FROM f2 ORDER BY vec_id""".stripMargin

  private def embedAllButTopOracle(iters: Int, dim: Int): String =
    s"""WITH ${allButTopCtes(iters, dim)}
       |SELECT vec_id,
       | CASE WHEN qq = 0 THEN NULL
       |  ELSE CAST(round(CAST(xv AS DOUBLE)
       |   / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(vv AS DOUBLE)))
       |   * 1000000.0) AS BIGINT) END AS cos_top_micro,
       | CASE WHEN qq = 0 THEN NULL
       |  ELSE CAST(round(nrm
       |   / (CAST(vv AS DOUBLE) * sqrt(CAST(qq AS DOUBLE)))
       |   * 1000000.0) AS BIGINT) END AS res_norm_micro,
       | array_to_string(list_transform(num, n ->
       |  CAST(CASE WHEN nrm = 0 THEN 0
       |   ELSE round(CAST(n AS DOUBLE) / nrm * 1000000.0)
       |   END AS BIGINT)), ',') AS e_csv
       |FROM abt ORDER BY vec_id""".stripMargin

  private def embedAllButTopRecallOracle(numQueries: Int, k: Int,
                                         iters: Int, dim: Int): String =
    s"""WITH ${allButTopCtes(iters, dim)},
       |post AS MATERIALIZED (
       | SELECT vec_id, list_transform(num, n ->
       |  CASE WHEN nrm = 0 THEN 0.0
       |   ELSE CAST(CAST(round(CAST(n AS DOUBLE) / nrm * 1000000.0)
       |    AS BIGINT) AS DOUBLE) END) AS e
       | FROM abt),
       |served AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${cosSql("q.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM post q JOIN post x
       |   ON q.vec_id < $numQueries AND q.vec_id <> x.vec_id)
       | WHERE rnk <= $k),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |truth AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${cosSql("q.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v q JOIN v x
       |   ON q.vec_id < $numQueries AND q.vec_id <> x.vec_id)
       | WHERE rnk <= $k)
       |SELECT s.query_id,
       | CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | (10000 * CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // $k AS recall_bp
       |FROM served s LEFT JOIN truth t
       | ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** knn_graph oracle: annIvfOracle's CTE chain with the probe set
    * widened to the WHOLE corpus, plus the reciprocal-edge self-join
    * for the mutual flag. */
  /** The kNN edge-frame CTE chain shared by the graph dump and the
    * mutual-kNN clustering oracle. The corpus-sized cosine table and
    * the edge frame are MATERIALIZED — the k-core lesson: a recursive
    * consumer would otherwise replay the whole chain per reference. */
  /** The oracle's replica of [[adaptiveCentroids]] — ceil(sqrt(n))
    * clamped to [16, 65536], computed over the same corpus; IEEE sqrt
    * and ceil are bit-identical across engines on integer inputs. */
  private val adaptiveCentroidsSql: String =
    "(SELECT least(65536, greatest(16, CAST(ceil(sqrt(CAST(count(*) " +
      "AS DOUBLE))) AS BIGINT))) FROM v)"

  private def knnEdgesCtes(k: Int, nProbe: Int): String =
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v
       |          WHERE vec_id < $adaptiveCentroidsSql),
       |ac AS MATERIALIZED (
       | SELECT v.vec_id, c.cid,
       |  ${cosSql("v.e", "c.ce")} AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn <= $nProbe),
       |cand AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |scored AS (
       | SELECT c.query_id, c.neighbor_id,
       |  ${cosSql("q.e", "x.e")} AS cos
       | FROM cand c JOIN v q ON c.query_id = q.vec_id
       |  JOIN v x ON c.neighbor_id = x.vec_id),
       |edges AS MATERIALIZED (
       | SELECT query_id AS src, neighbor_id AS dst, cos, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= $k)""".stripMargin

  private def knnGraphOracle(k: Int, nProbe: Int): String =
    s"""WITH ${knnEdgesCtes(k, nProbe)}
       |SELECT e.src, e.dst, e.cos, e.rnk, (r.src IS NOT NULL) AS mutual
       |FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
       |ORDER BY e.src, e.rnk""".stripMargin

  /** The NN-Descent one-round expansion CTEs — candidate set per
    * vertex (neighbors ∪ reverse ∪ two-hop), exact rescore, top-k
    * re-rank. Assumes [[knnEdgesCtes]]' `v` and `edges`. */
  private def refinedEdgesCtes(k: Int): String =
    s"""cnd AS (
       | SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges
       |  UNION ALL SELECT dst, src FROM edges
       |  UNION ALL SELECT a.src, b.dst FROM edges a
       |   JOIN edges b ON a.dst = b.src
       | ) WHERE src <> dst),
       |rsc AS MATERIALIZED (
       | SELECT c.src, c.dst,
       |  ${cosSql("q.e", "x.e")} AS cos
       | FROM cnd c JOIN v q ON c.src = q.vec_id
       |  JOIN v x ON c.dst = x.vec_id),
       |refined AS (
       | SELECT src, dst, cos, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY src
       |                               ORDER BY cos DESC, dst) AS rnk
       |  FROM rsc) WHERE rnk <= $k)""".stripMargin

  private def knnRefineOracle(k: Int, nProbe: Int): String =
    s"""WITH ${knnEdgesCtes(k, nProbe)},
       |${refinedEdgesCtes(k)}
       |SELECT src, dst, cos, rnk FROM refined ORDER BY src, rnk""".stripMargin

  /** One round-suffixed NN-Descent step: er_$r refines er_{r-1} (er_0
    * = edges), chg_$r counts the round's NEW (src,dst) pairs — the
    * unrolled replica of the Spark loop's per-round state. */
  private def refineRoundCtes(k: Int, r: Int): String = {
    val prev = if (r == 1) "edges" else s"er_${r - 1}"
    s"""cnd_$r AS (
       | SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM $prev
       |  UNION ALL SELECT dst, src FROM $prev
       |  UNION ALL SELECT a.src, b.dst FROM $prev a
       |   JOIN $prev b ON a.dst = b.src
       | ) WHERE src <> dst),
       |rsc_$r AS MATERIALIZED (
       | SELECT c.src, c.dst,
       |  ${cosSql("q.e", "x.e")} AS cos
       | FROM cnd_$r c JOIN v q ON c.src = q.vec_id
       |  JOIN v x ON c.dst = x.vec_id),
       |er_$r AS MATERIALIZED (
       | SELECT src, dst, cos, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY src
       |                               ORDER BY cos DESC, dst) AS rnk
       |  FROM rsc_$r) WHERE rnk <= $k),
       |chg_$r AS (
       | SELECT CAST(count(*) AS BIGINT) AS c FROM er_$r e
       |  LEFT JOIN $prev p ON p.src = e.src AND p.dst = e.dst
       | WHERE p.src IS NULL)""".stripMargin
  }

  /** knn_refine_converged oracle: maxRounds refine rounds unrolled,
    * the effective round picked by the SAME early-stop rule the Spark
    * loop applies (first round whose new-edge count falls below epsBp
    * bp of n·k; the round cap needs no chg test — the loop takes its
    * last round unconditionally). */
  private def knnRefineConvergedOracle(k: Int, nProbe: Int,
      maxRounds: Int, epsBp: Long): String = {
    val rounds = (1 to maxRounds).map(refineRoundCtes(k, _)).mkString(",\n")
    val cases = (1 until maxRounds).map { r =>
      s"WHEN 10000 * (SELECT c FROM chg_$r) < " +
        s"$epsBp * (SELECT count(*) FROM v) * $k THEN $r"
    }.mkString("\n  ")
    val branches = (1 to maxRounds).map { r =>
      s"SELECT src, dst, cos, rnk FROM er_$r WHERE (SELECT e FROM eff) = $r"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${knnEdgesCtes(k, nProbe)},
       |$rounds,
       |eff AS (SELECT CASE
       |  $cases
       |  ELSE $maxRounds END AS e)
       |$branches
       |ORDER BY src, rnk""".stripMargin
  }

  /** knn_refine_recall oracle: ivf and refined edge sets vs the
    * EXHAUSTIVE exact kNN graph (all-pairs top-k — the truth the
    * nProbe=C boundary spec pins on the Spark side). */
  private def knnRefineRecallOracle(k: Int, nProbe: Int): String =
    s"""WITH ${knnEdgesCtes(k, nProbe)},
       |${refinedEdgesCtes(k)},
       |truth AS MATERIALIZED (
       | SELECT src, dst FROM (
       |  SELECT q.vec_id AS src, x.vec_id AS dst,
       |   ${cosSql("q.e", "x.e")} AS cos,
       |   row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${cosSql("q.e", "x.e")} DESC, x.vec_id) AS rnk
       |  FROM v q JOIN v x ON q.vec_id <> x.vec_id) WHERE rnk <= $k),
       |st AS (SELECT 'ivf' AS stage, src, dst FROM edges
       | UNION ALL SELECT 'refined', src, dst FROM refined),
       |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM v)
       |SELECT st.stage,
       | CAST(sum(CASE WHEN t.src IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS hits,
       | nv.n_vec,
       | (10000 * CAST(sum(CASE WHEN t.src IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT)) // (nv.n_vec * $k) AS recall_bp
       |FROM st LEFT JOIN truth t ON t.src = st.src AND t.dst = st.dst
       | CROSS JOIN nv
       |GROUP BY 1, nv.n_vec ORDER BY 1""".stripMargin

  /** knn_graph_clusters oracle: the shared edge chain, reciprocal
    * filter, then min-label connected components as a recursive CTE
    * (the dedup_clusters pattern over the mutual graph). */
  private def knnGraphClustersOracle(k: Int, nProbe: Int): String =
    s"""WITH RECURSIVE ${knnEdgesCtes(k, nProbe)},
       |mut AS MATERIALIZED (
       | SELECT e.src, e.dst FROM edges e
       |  JOIN edges r ON r.src = e.dst AND r.dst = e.src
       | WHERE e.src < e.dst),
       |und AS (SELECT src, dst FROM mut UNION ALL SELECT dst, src FROM mut),
       |reach(n, l) AS (
       | SELECT vec_id, vec_id FROM v
       | UNION
       | SELECT e.dst, r.l FROM reach r JOIN und e ON e.src = r.n),
       |comp AS (SELECT n AS vec_id, min(l) AS rep_id FROM reach GROUP BY n),
       |sz AS (SELECT rep_id, count(*) AS cluster_size FROM comp GROUP BY 1)
       |SELECT c.vec_id, c.rep_id,
       | CAST(sz.cluster_size AS BIGINT) AS cluster_size,
       | c.vec_id = c.rep_id AS is_canonical
       |FROM comp c JOIN sz USING (rep_id) ORDER BY vec_id""".stripMargin

  private def annIvfFromIndexOracle(numQueries: Int, k: Int,
                                    numCentroids: Int, nProbe: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |qv AS (
       | SELECT vec_id, list_transform(e, x -> CASE WHEN maxabs = 0 THEN 0
       |   ELSE CAST(sign(x) * floor(abs(x) * 127.0 / maxabs + 0.5)
       |             AS INTEGER) END) AS q
       | FROM (SELECT vec_id, e,
       |        list_max(list_transform(e, x -> abs(x))) AS maxabs FROM v)),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $numCentroids),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  round(list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]))
       |   / (sqrt(list_sum(list_transform(v.e, x -> x*x)))
       |      * sqrt(list_sum(list_transform(c.ce, x -> x*x)))), 6) AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |cand AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |q8 AS (
       | SELECT c.query_id, c.neighbor_id,
       |  round(list_sum(list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]))
       |   / (sqrt(list_sum(list_transform(a.q, x -> x*x)))
       |      * sqrt(list_sum(list_transform(b.q, x -> x*x)))), 6) AS cos
       | FROM cand c JOIN qv a ON c.query_id = a.vec_id
       |  JOIN qv b ON c.neighbor_id = b.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM q8) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  private def annIvfRerankOracle(numQueries: Int, k: Int, numCentroids: Int,
                                 nProbe: Int, m: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |qv AS (
       | SELECT vec_id, list_transform(e, x -> CASE WHEN maxabs = 0 THEN 0
       |   ELSE CAST(sign(x) * floor(abs(x) * 127.0 / maxabs + 0.5)
       |             AS INTEGER) END) AS q
       | FROM (SELECT vec_id, e,
       |        list_max(list_transform(e, x -> abs(x))) AS maxabs FROM v)),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $numCentroids),
       |ac AS (
       | SELECT v.vec_id, c.cid,
       |  round(list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]))
       |   / (sqrt(list_sum(list_transform(v.e, x -> x*x)))
       |      * sqrt(list_sum(list_transform(c.ce, x -> x*x)))), 6) AS ccos
       | FROM v CROSS JOIN cents c),
       |assigned AS (
       | SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac) WHERE rn = 1),
       |probes AS (
       | SELECT vec_id AS query_id, cid AS probe FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY ccos DESC, cid) AS rn
       |  FROM ac WHERE vec_id < $numQueries) WHERE rn <= $nProbe),
       |cand AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id
       | FROM probes p JOIN assigned a
       |  ON a.cell = p.probe AND a.vec_id <> p.query_id),
       |q8 AS (
       | SELECT c.query_id, c.neighbor_id,
       |  round(list_sum(list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i]))
       |   / (sqrt(list_sum(list_transform(a.q, x -> x*x)))
       |      * sqrt(list_sum(list_transform(b.q, x -> x*x)))), 6) AS qcos
       | FROM cand c JOIN qv a ON c.query_id = a.vec_id
       |  JOIN qv b ON c.neighbor_id = b.vec_id),
       |short AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY qcos DESC, neighbor_id) AS rn
       |  FROM q8) WHERE rn <= $m),
       |scored AS (
       | SELECT s.query_id, s.neighbor_id,
       |  round(list_sum(list_transform(range(1, len(q.e)+1), i -> q.e[i]*x.e[i]))
       |   / (sqrt(list_sum(list_transform(q.e, y -> y*y)))
       |      * sqrt(list_sum(list_transform(x.e, y -> y*y)))), 6) AS cos
       | FROM short s JOIN v q ON s.query_id = q.vec_id
       |  JOIN v x ON s.neighbor_id = x.vec_id)
       |SELECT query_id, neighbor_id, cos, rnk FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id) AS rnk
       | FROM scored) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** Full oracle for the banded decontam path: planes as SQL literals,
    * band/bucket assignment, DISTINCT collision pairs, exact verify —
    * the same pipeline the Spark plan runs, so the banding itself is
    * checked bit-for-bit (sign of a sequential-fold dot product is
    * engine-stable; see TextFunctions.dot). */
  private def embedDecontamLshOracle(tau: Double, numBands: Int,
                                     planesPerBand: Int): String = {
    val planes = planeMatrix(numBands * planesPerBand, 64)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(", ")}])"
    }.mkString(",\n   ")
    s"""WITH planes(pi, pvec) AS (VALUES
       |   $planeRows),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dots AS (
       | SELECT v.vec_id, p.pi,
       |  list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i] * p.pvec[i])) AS d
       | FROM v, planes p),
       |buckets AS (
       | SELECT vec_id, CAST(pi // $planesPerBand AS INTEGER) AS band,
       |  CAST(sum(CASE WHEN d > 0 THEN (1 << (pi % $planesPerBand)) ELSE 0 END)
       |   AS INTEGER) AS bucket
       | FROM dots GROUP BY 1, 2),
       |cand AS (
       | SELECT DISTINCT c.vec_id, b.vec_id AS bench_id
       | FROM buckets c JOIN buckets b ON c.band = b.band AND c.bucket = b.bucket
       | WHERE c.vec_id % 50 <> 0 AND b.vec_id % 50 = 0),
       |scored AS (
       | SELECT c.vec_id, c.bench_id,
       |  list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i] * b.e[i]))
       |   / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
       |      * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
       | FROM cand c JOIN v a ON c.vec_id = a.vec_id
       |  JOIN v b ON c.bench_id = b.vec_id)
       |SELECT vec_id, round(max(cos), 6) AS max_cos,
       |  CAST(count(DISTINCT CASE WHEN cos >= $tau THEN bench_id END) AS BIGINT)
       |    AS n_hits,
       |  count(DISTINCT CASE WHEN cos >= $tau THEN bench_id END) > 0
       |    AS contaminated
       |FROM scored GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** The query's shipped banding — derived, not hand-picked, so the
    * oracle and the Spark plan can never drift from the recall SLA. */
  private val decontamLshBanding: (Int, Int) = bandingFor(tau = 0.40)

  /** Full oracle for the SRP projection: the sign matrix is
    * deterministic driver-side data embedded as SQL literals, and the
    * quantize → project → fold pipeline is replicated end to end in
    * exact integer arithmetic. */
  private def embedProjectSrpOracle(outDim: Int): String = {
    val signRows = srpSigns(outDim, 64).zipWithIndex.map { case (row, j) =>
      s"($j, [${row.mkString(", ")}])"
    }.mkString(",\n   ")
    s"""WITH signs(j, s) AS (VALUES
       |   $signRows),
       |q AS (
       | SELECT vec_id,
       |  list_transform(e, x -> CASE WHEN maxabs = 0 THEN 0
       |    ELSE CAST(sign(x) * floor(abs(x) * 127.0 / maxabs + 0.5)
       |              AS INTEGER) END) AS q
       | FROM (
       |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS maxabs
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings))),
       |proj AS (
       | SELECT q.vec_id, s.j,
       |  CAST(list_sum(list_transform(range(1, 65), i -> s.s[i] * q.q[i]))
       |       AS BIGINT) AS p
       | FROM q CROSS JOIN signs s)
       |SELECT vec_id,
       | string_agg(CAST(p AS VARCHAR), ',' ORDER BY j) AS proj_csv,
       | CAST(sum(p * p) AS BIGINT) AS norm2
       |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "embed_project_srp" -> embedProjectSrpOracle(outDim = 16),
    "embed_decontam_lsh" -> embedDecontamLshOracle(tau = 0.40,
      numBands = decontamLshBanding._1,
      planesPerBand = decontamLshBanding._2),
    "embed_quantize_int8" ->
      """SELECT vec_id, round(maxabs, 6) AS maxabs_r,
        | CAST(list_sum(q) AS BIGINT) AS q_sum,
        | array_to_string(q, ',') AS q_csv
        |FROM (
        | SELECT vec_id, maxabs,
        |  list_transform(e, x -> CASE WHEN maxabs = 0 THEN 0
        |    ELSE CAST(sign(x) * floor(abs(x) * 127.0 / maxabs + 0.5)
        |              AS INTEGER) END) AS q
        | FROM (
        |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS maxabs
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)))
        |ORDER BY vec_id""".stripMargin,
    "ann_lsh_topk" -> annLshOracle(numQueries = 8, k = 3, numPlanes = 6),
    "ann_ivf_topk" -> annIvfOracle(numQueries = 8, k = 3,
      numCentroids = 16, nProbe = 4),
    "ann_ivf_topk_trained" -> annIvfTrainedOracle(numQueries = 8, k = 3,
      numCentroids = 16, nProbe = 4, iters = 2),
    "ann_recall_trained" -> annRecallTrainedOracle(numQueries = 8, k = 5,
      numCentroids = 16, iters = 2, nProbes = Seq(1, 2, 4)),
    "knn_graph" -> knnGraphOracle(k = 5, nProbe = 4),
    "knn_graph_clusters" -> knnGraphClustersOracle(k = 5, nProbe = 4),
    "knn_graph_refine" -> knnRefineOracle(k = 5, nProbe = 4),
    "knn_refine_recall" -> knnRefineRecallOracle(k = 5, nProbe = 4),
    "knn_refine_converged" -> knnRefineConvergedOracle(k = 5, nProbe = 4,
      maxRounds = 3, epsBp = 100L),
    "ann_recall_eval" -> annRecallOracle(numQueries = 8, k = 5,
      numCentroids = 16, nProbes = Seq(1, 2, 4)),
    "ann_matryoshka_recall" -> annMatryoshkaOracle(numQueries = 8, k = 5,
      tiers = Seq(8, 16, 32, 64)),
    // the truncate-and-renorm transform at d=16: same fold order for
    // the prefix norm, each unit component rounded once to micro
    "embed_matryoshka_truncate" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |t AS (
        | SELECT vec_id, e[1:16] AS t,
        |  sqrt(list_sum(list_transform(e[1:16], x -> x*x))) AS nrm
        | FROM v)
        |SELECT vec_id, CAST(16 AS BIGINT) AS dims,
        | CAST(round(nrm * 1000000.0) AS BIGINT) AS norm_micro,
        | array_to_string(list_transform(t, x ->
        |   CASE WHEN nrm = 0 THEN 0
        |        ELSE CAST(round(x / nrm * 1000000.0) AS BIGINT) END),
        |  ',') AS t_csv
        |FROM t ORDER BY vec_id""".stripMargin,
    "ann_ivf_pq_topk" -> annIvfPqOracle(numQueries = 8, m = 12, k = 3,
      numCentroids = 16, nProbe = 4, numSub = 8, subDim = 8,
      numCodes = 16),
    "ann_ivf_pq_trained" -> annIvfPqTrainedOracle(numQueries = 8, m = 12,
      k = 3, numCentroids = 16, nProbe = 4, numSub = 8, subDim = 8,
      numCodes = 16, iters = 2),
    "ann_ivf_pq_residual" -> annIvfPqResidualOracle(numQueries = 8,
      m = 12, k = 3, numCentroids = 16, nProbe = 4, numSub = 8,
      subDim = 8, numCodes = 16),
    // the stored-index read path must serve EXACTLY what the rebuild
    // plan serves — same replay, deliberately
    "ann_ivf_pq_residual_index" -> annIvfPqResidualOracle(numQueries = 8,
      m = 12, k = 3, numCentroids = 16, nProbe = 4, numSub = 8,
      subDim = 8, numCodes = 16),
    // numQueries = 32 (r14 verdict #8): 8 held-out queries gave the
    // curve 250 bp granularity — one hit of noise could invert the
    // first point's raw-vs-residual story; 32 queries × k=5 puts the
    // floor at 62.5 bp
    "pq_residual_recall" -> pqResidualRecallOracle(numQueries = 32, k = 5,
      numCentroids = 16, nProbes = Seq(1, 2, 4), numSub = 8, subDim = 8,
      numCodes = 16),
    "rerank_budget_recall" -> rerankBudgetRecallOracle(numQueries = 32,
      k = 5, ms = Seq(5, 10, 20, 40), numCentroids = 16, nProbe = 4,
      numSub = 8, subDim = 8, numCodes = 16),
    "ann_pq_int4_topk" -> annPqInt4Oracle(numQueries = 8, k = 5,
      numSub = 8, subDim = 8, numCodes = 16),
    "ann_ivf_pq_residual_int4" -> annIvfPqResidualInt4Oracle(
      numQueries = 8, m = 12, k = 3, numCentroids = 16, nProbe = 4,
      numSub = 8, subDim = 8, numCodes = 16),
    "pq_int4_recall" -> pqInt4RecallOracle(numQueries = 32, k = 5,
      numCodes = 16),
    "ann_ivf_pq_residual_trained" -> annIvfPqResidualTrainedOracle(
      numQueries = 8, m = 12, k = 3, numCentroids = 16, nProbe = 4,
      numSub = 8, subDim = 8, numCodes = 16, iters = 2),
    "pq_residual_trained_recall" -> pqResidualTrainedRecallOracle(
      numQueries = 8, k = 5, numCentroids = 16, nProbe = 4, numSub = 8,
      subDim = 8, numCodes = 16, iters = 2),
    "ann_pq_trained" -> annPqTrainedOracle(numQueries = 8, k = 3,
      numSub = 8, subDim = 8, numCodes = 16, iters = 2),
    "pq_train_recall" -> pqTrainRecallOracle(numQueries = 8, k = 5,
      numSub = 8, subDim = 8, numCodes = 16, iters = 2),
    "top_component" -> topComponentOracle(iters = 6, dim = 64),
    "embed_all_but_top" -> embedAllButTopOracle(iters = 6, dim = 64),
    "ann_abt_recall" -> embedAllButTopRecallOracle(numQueries = 8, k = 5,
      iters = 6, dim = 64),
    "top_components2" -> topComponents2Oracle(iters = 6, dim = 64),
    "embed_all_but_top2" -> embedAllButTop2Oracle(iters = 6, dim = 64),
    "embed_exact_dups" ->
      """WITH h AS (
        | SELECT vec_id,
        |  md5(array_to_string(list_transform(embedding::DOUBLE[],
        |      x -> CAST(round(x * 1000000.0) AS BIGINT)), ',')) AS hh
        | FROM embeddings)
        |SELECT vec_id, min(vec_id) OVER (PARTITION BY hh) AS keep_id,
        |  vec_id <> min(vec_id) OVER (PARTITION BY hh) AS is_dup
        |FROM h ORDER BY vec_id""".stripMargin,
    "embed_norm_qc" ->
      """WITH v AS (
        | SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
        |r AS (
        | SELECT label,
        |  len(list_filter(e, x -> isnan(x) OR isinf(x))) > 0 AS bad,
        |  CASE WHEN len(list_filter(e, x -> isnan(x) OR isinf(x))) > 0
        |   THEN NULL
        |   ELSE CAST(round(sqrt(list_sum(list_transform(e, x -> x * x)))
        |     * 1000000.0) AS BIGINT) END AS norm_micro
        | FROM v)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  min(CASE WHEN NOT bad THEN norm_micro END) AS min_norm_micro,
        |  max(CASE WHEN NOT bad THEN norm_micro END) AS max_norm_micro,
        |  CAST(sum(CASE WHEN norm_micro = 0 AND NOT bad THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_zero,
        |  CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite
        |FROM r GROUP BY label ORDER BY label""".stripMargin,
    "ann_ivf_rerank_topk" -> annIvfRerankOracle(numQueries = 8, k = 3,
      numCentroids = 16, nProbe = 4, m = 12),
    "ann_ivf_from_index" -> annIvfFromIndexOracle(numQueries = 8, k = 3,
      numCentroids = 16, nProbe = 4),
    "embed_decontam" -> (vectorCte +
      """, b AS (SELECT vec_id AS bench_id, e AS eb, nrm AS nrmb
        |        FROM v WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id, e, nrm FROM v WHERE vec_id % 50 <> 0),
        |pairs AS (
        | SELECT c.vec_id,
        |  list_sum(list_transform(range(1, len(c.e)+1), i -> c.e[i]*b.eb[i]))
        |    / (c.nrm * b.nrmb) AS cos
        | FROM c, b WHERE c.vec_id <> b.bench_id)
        |SELECT vec_id, round(max(cos), 6) AS max_cos,
        |  CAST(sum(CASE WHEN cos >= 0.40 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  sum(CASE WHEN cos >= 0.40 THEN 1 ELSE 0 END) > 0 AS contaminated
        |FROM pairs GROUP BY vec_id ORDER BY vec_id""".stripMargin),
    "embed_cosine_neardup" -> (vectorCte +
      """SELECT vec_a, vec_b, round(cos, 6) AS cos FROM (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]))
        |    / (a.nrm * b.nrm) AS cos
        | FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |WHERE cos >= 0.40 ORDER BY vec_a, vec_b""".stripMargin),
    "embed_clusters" -> ("WITH RECURSIVE " + vectorCte.stripPrefix("WITH ") +
      """,pairs AS (
        | SELECT vec_a, vec_b FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |   list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]))
        |     / (a.nrm * b.nrm) AS cos
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        | WHERE cos >= 0.40),
        |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(x, l) AS (
        |  SELECT vec_id, vec_id FROM v
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.x),
        |comp AS (SELECT x AS vec_id, min(l) AS rep_id FROM reach GROUP BY x),
        |sz AS (SELECT rep_id, count(*) AS cluster_size FROM comp GROUP BY 1)
        |SELECT c.vec_id, c.rep_id,
        |  CAST(sz.cluster_size AS BIGINT) AS cluster_size,
        |  c.vec_id = c.rep_id AS is_canonical
        |FROM comp c JOIN sz USING (rep_id)
        |ORDER BY vec_id""".stripMargin),
    // clustering base identical to embed_clusters; majority label by
    // (n DESC, label) rank, purity in exact integer basis points
    "cluster_purity" -> ("WITH RECURSIVE " + vectorCte.stripPrefix("WITH ") +
      """,pairs AS (
        | SELECT vec_a, vec_b FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |   list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]))
        |     / (a.nrm * b.nrm) AS cos
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        | WHERE cos >= 0.40),
        |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(x, l) AS (
        |  SELECT vec_id, vec_id FROM v
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.x),
        |comp AS (SELECT x AS vec_id, min(l) AS rep_id FROM reach GROUP BY x),
        |cnt AS (
        |  SELECT c.rep_id, b.label, CAST(count(*) AS BIGINT) AS n
        |  FROM comp c JOIN embeddings b ON c.vec_id = b.vec_id
        |  GROUP BY 1, 2),
        |arg AS (
        |  SELECT rep_id, label AS majority_label, n AS majority_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY rep_id
        |      ORDER BY n DESC, label) AS rn FROM cnt) WHERE rn = 1),
        |tot AS (SELECT rep_id, CAST(sum(n) AS BIGINT) AS cluster_size
        |        FROM cnt GROUP BY 1)
        |SELECT t.rep_id, t.cluster_size, a.majority_label, a.majority_n,
        |  a.majority_n * 10000 // t.cluster_size AS purity_bp
        |FROM tot t JOIN arg a USING (rep_id)
        |ORDER BY rep_id""".stripMargin),
    // the whole SemDeDup path — assignment (ties: rounded ccos desc,
    // cid asc), intra-cell pairs, components, farthest-from-centroid
    // keep-rule — replicated; reach starts from every vector so
    // singletons carry cluster_size 1
    "semdedup" -> ("WITH RECURSIVE " + vectorCte.stripPrefix("WITH ") +
      """,cents AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm
        |           FROM v WHERE vec_id < 16),
        |ac AS (
        | SELECT v.vec_id, c.cid,
        |  round(list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]))
        |    / (v.nrm * c.cnrm), 6) AS ccos
        | FROM v CROSS JOIN cents c),
        |assigned AS (
        | SELECT vec_id, cid AS cell, ccos AS cos_centroid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY ccos DESC, cid) AS rn
        |  FROM ac) WHERE rn = 1),
        |pairs AS (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        | FROM assigned a JOIN assigned b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        | JOIN v va ON va.vec_id = a.vec_id
        | JOIN v vb ON vb.vec_id = b.vec_id
        | WHERE round(list_sum(list_transform(range(1, len(va.e)+1),
        |         i -> va.e[i]*vb.e[i])) / (va.nrm * vb.nrm), 6) >= 0.40),
        |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(x, l) AS (
        |  SELECT vec_id, vec_id FROM v
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.x),
        |comp AS (SELECT x AS vec_id, min(l) AS rep_id FROM reach GROUP BY x),
        |sz AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM comp GROUP BY 1),
        |keepers AS (
        | SELECT rep_id, vec_id AS keeper FROM (
        |  SELECT c.rep_id, c.vec_id,
        |   row_number() OVER (PARTITION BY c.rep_id
        |                      ORDER BY a.cos_centroid ASC, c.vec_id) AS rn
        |  FROM comp c JOIN assigned a USING (vec_id)) WHERE rn = 1)
        |SELECT a.vec_id, a.cell, a.cos_centroid, c.rep_id, sz.cluster_size,
        | a.vec_id = k.keeper AS keep
        |FROM assigned a JOIN comp c USING (vec_id) JOIN sz USING (rep_id)
        |JOIN keepers k USING (rep_id)
        |ORDER BY vec_id""".stripMargin),
    "ann_cosine_topk" -> (vectorCte +
      """SELECT query_id, neighbor_id, cos, rnk FROM (
        | SELECT query_id, neighbor_id, cos,
        |  row_number() OVER (PARTITION BY query_id
        |                     ORDER BY cos DESC, neighbor_id) AS rnk
        | FROM (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.e)+1), i -> q.e[i]*x.e[i]))
        |     / (q.nrm * x.nrm), 6) AS cos
        |  FROM v q JOIN v x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 8))
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    // the confusable band [0.15, 0.40): rank only candidates inside it
    "ann_hard_negatives" -> (vectorCte +
      """SELECT query_id, neighbor_id, cos, rnk FROM (
        | SELECT query_id, neighbor_id, cos,
        |  row_number() OVER (PARTITION BY query_id
        |                     ORDER BY cos DESC, neighbor_id) AS rnk
        | FROM (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.e)+1), i -> q.e[i]*x.e[i]))
        |     / (q.nrm * x.nrm), 6) AS cos
        |  FROM v q JOIN v x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 8)
        | WHERE cos >= 0.15 AND cos < 0.40)
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    "kcenter_coreset" -> kcenterOracle(k = 8),
    "mmr_diversify" -> mmrOracle(k = 8, nCand = 64),
    // the whole quantize→score→rank pipeline replicated in SQL — the
    // quantized values are exact small integers, so list_sum order is
    // irrelevant and the score is bit-stable cross-engine
    // two-stage: int8 top-20 shortlist (same qz/n CTEs as ann_int8),
    // exact fp32 rerank of the shortlist to top-5
    "ann_rerank_topk" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |vn AS (
        | SELECT vec_id, e,
        |  sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        |m AS (
        | SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) AS ma FROM v),
        |qz AS (
        | SELECT vec_id,
        |  CASE WHEN ma = 0 THEN list_transform(e, x -> 0.0)
        |       ELSE list_transform(e,
        |              x -> sign(x) * floor(abs(x) * 127.0 / ma + 0.5))
        |  END AS qe
        | FROM m),
        |n AS (
        | SELECT vec_id, qe,
        |  sqrt(list_sum(list_transform(qe, x -> x * x))) AS nrm FROM qz),
        |pre AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id
        |                      ORDER BY qcos DESC, neighbor_id) AS prnk
        |  FROM (
        |   SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(range(1, len(q.qe)+1),
        |      i -> q.qe[i]*x.qe[i])) / (q.nrm * x.nrm), 6) AS qcos
        |   FROM n q JOIN n x ON x.vec_id <> q.vec_id
        |   WHERE q.vec_id < 8))
        | WHERE prnk <= 20)
        |SELECT query_id, neighbor_id, cos, rnk FROM (
        | SELECT query_id, neighbor_id, cos,
        |  row_number() OVER (PARTITION BY query_id
        |                     ORDER BY cos DESC, neighbor_id) AS rnk
        | FROM (
        |  SELECT p.query_id, p.neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.e)+1),
        |     i -> q.e[i]*x.e[i])) / (q.nrm * x.nrm), 6) AS cos
        |  FROM pre p
        |   JOIN vn q ON q.vec_id = p.query_id
        |   JOIN vn x ON x.vec_id = p.neighbor_id))
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "ann_int8_topk" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |m AS (
        | SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) AS ma FROM v),
        |qz AS (
        | SELECT vec_id,
        |  CASE WHEN ma = 0 THEN list_transform(e, x -> 0.0)
        |       ELSE list_transform(e,
        |              x -> sign(x) * floor(abs(x) * 127.0 / ma + 0.5))
        |  END AS qe
        | FROM m),
        |n AS (
        | SELECT vec_id, qe,
        |  sqrt(list_sum(list_transform(qe, x -> x * x))) AS nrm FROM qz)
        |SELECT query_id, neighbor_id, cos, rnk FROM (
        | SELECT query_id, neighbor_id, cos,
        |  row_number() OVER (PARTITION BY query_id
        |                     ORDER BY cos DESC, neighbor_id) AS rnk
        | FROM (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.qe)+1), i -> q.qe[i]*x.qe[i]))
        |     / (q.nrm * x.nrm), 6) AS cos
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 8))
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "ann_pq_topk" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |sub AS (SELECT unnest(range(0, 8)) AS s),
        |cb AS (
        | SELECT s.s AS sub, v.vec_id AS cid,
        |  list_transform(range(1, 9), j -> v.e[s.s*8 + j]) AS c
        | FROM v, sub s WHERE v.vec_id < 16),
        |cx AS (
        | SELECT v.vec_id, s.s AS sub,
        |  list_transform(range(1, 9), j -> v.e[s.s*8 + j]) AS x
        | FROM v, sub s),
        |enc AS (
        | SELECT vec_id, sub, cid FROM (
        |  SELECT cx.vec_id, cx.sub, cb.cid,
        |   row_number() OVER (PARTITION BY cx.vec_id, cx.sub ORDER BY
        |    round(list_sum(list_transform(range(1, 9), i -> cx.x[i]*cx.x[i]))
        |      + list_sum(list_transform(range(1, 9), i -> cb.c[i]*cb.c[i]))
        |      - 2*list_sum(list_transform(range(1, 9), i -> cx.x[i]*cb.c[i])),
        |     6), cb.cid) AS rn
        |  FROM cx JOIN cb ON cx.sub = cb.sub) WHERE rn = 1),
        |r2 AS (
        | SELECT e.vec_id,
        |  sum(CAST(round(list_sum(list_transform(cb.c, x -> x*x)) * 1000000)
        |      AS BIGINT)) AS r2m
        | FROM enc e JOIN cb ON e.sub = cb.sub AND e.cid = cb.cid GROUP BY 1),
        |q AS (
        | SELECT vec_id AS query_id, e,
        |  sqrt(list_sum(list_transform(e, x -> x*x))) AS qn
        | FROM v WHERE vec_id < 8),
        |tab AS (
        | SELECT q.query_id, cb.sub, cb.cid, q.qn,
        |  CAST(round(list_sum(list_transform(range(1, 9),
        |    i -> q.e[cb.sub*8 + i] * cb.c[i])) * 1000000) AS BIGINT) AS tm
        | FROM q, cb),
        |sc AS (
        | SELECT t.query_id, e.vec_id, sum(t.tm) AS dm, min(t.qn) AS qn
        | FROM enc e JOIN tab t ON e.sub = t.sub AND e.cid = t.cid
        | WHERE t.query_id <> e.vec_id GROUP BY 1, 2),
        |cand AS (
        | SELECT sc.query_id, sc.vec_id AS neighbor_id,
        |  CASE WHEN r2.r2m <= 0 OR sc.qn = 0 THEN 0.0
        |       ELSE round((sc.dm / 1000000.0)
        |            / (sc.qn * sqrt(r2.r2m / 1000000.0)), 6) END AS cos
        | FROM sc JOIN r2 ON sc.vec_id = r2.vec_id)
        |SELECT query_id, neighbor_id, cos, rnk FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
  )
}
