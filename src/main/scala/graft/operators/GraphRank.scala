package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.core.Tables

/** PageRank (Page et al. 1999) as a fixed-iteration DataFrame loop —
  * the graph-centrality member of the curation toolkit (CommonCrawl
  * pipelines rank domains by link centrality before quality scoring;
  * the same loop ranks any (src, dst, weight) frame).
  *
  * Deterministic contract — INTEGER fixed point end to end, no float
  * anywhere: ranks live in micro-units, r_0 = 10^6 div N, and each
  * iteration computes
  *   r_{i+1}(v) = (15·10^6) div (100·N)
  *              + (85 · Σ_u (r_i(u)·w(u,v)) div out(u)) div 100
  * with BIGINT truncating division at every step (Spark `div` ≡
  * DuckDB `//`), so ten iterations produce bit-identical ranks on
  * both engines. Truncation loses ≤ 1 micro-unit per div — the same
  * order as float PageRank's own convergence slack. Dangling nodes
  * (no out-edges) leak their mass, the standard simplification; their
  * RANK is still computed (they can be ranked INTO).
  *
  * Scale shape: the corpus appears ONCE, in the edge build (for the
  * event graph: one lead() window per user — per-USER history, never
  * a global order). The iteration loop runs on NODE/EDGE-sized frames
  * keyed by src/dst: each round is one equi-join (ranks ⋈ edges on
  * src — broadcastable when the rank frame is vocab-sized, shuffle
  * otherwise) and one map-side-combined groupBy(dst). That is the
  * canonical distributed PageRank data layout; iteration state is one
  * localCheckpoint'd rank frame, so plans stay flat across rounds.
  */
object GraphRank {

  /** Ten-iteration integer PageRank over `edges` (src, dst, w).
    * Nodes = every vertex appearing as src OR dst. Output:
    * (node, out_w, rank_micro). */
  def pageRank(edges: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val ed = edges.toDF("src", "dst", "w").localCheckpoint()
    val nodes = ed.select(col("src").as("t"))
      .union(ed.select(col("dst").as("t")))
      .distinct().localCheckpoint()
    val outw = ed.groupBy("src").agg(sum(col("w")).as("outw"))
    val edOut = ed.join(outw, "src").localCheckpoint()
    val nn = nodes.agg(count(lit(1)).as("n"))

    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("t"), expr("1000000 div n").as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edOut
        .join(ranks, col("src") === col("t"))
        .select(col("dst"), expr("(r * w) div outw").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, col("t") === col("dst"), "left_outer")
        .crossJoin(broadcast(nn))
        .select(col("t"),
          (expr("(15 * 1000000) div (100 * n)")
            + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks
      .join(outw, col("t") === col("src"), "left_outer")
      .select(col("t").as("node"),
        coalesce(col("outw"), lit(0L)).as("out_w"),
        col("r").as("rank_micro"))
  }

  /** The event-type transition graph: an edge (a, b, count) for every
    * consecutive pair of events by the same user in (ts, event_id)
    * order — the behavioral Markov chain whose stationary mass ranks
    * event types by where user flows concentrate. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  def eventPageRankQuery(spark: SparkSession, dir: String): DataFrame =
    pageRank(eventTransitions(Tables.events(spark, dir)))
      .withColumnRenamed("node", "event_type")
      .orderBy(col("event_type"))

  /** Token co-occurrence graph: an undirected edge (u < v) for every
    * token pair sharing ≥ perMille‰ of the corpus's documents. The
    * rate threshold (1000·w ≥ perMille·nDocs, exact integers against
    * the ONE broadcast doc-count row) keeps the edge rule scale-free:
    * the same perMille names the same relationship at any corpus
    * size, where an absolute count would saturate to the complete
    * graph as the corpus grows. Per-doc pair fan-out is quadratic in
    * DISTINCT tokens per doc — bounded by doc length, never corpus
    * size — and the pair aggregate is map-side combined on (u, v). */
  def tokenCooccurrence(docs: DataFrame, perMille: Int = 630): DataFrame = {
    require(perMille >= 0 && perMille <= 1000,
      s"perMille must be in [0, 1000], got $perMille")
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
        .as("t"))
    val nd = docs.agg(count(lit(1)).as("ndocs"))
    toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("u"), col("b.t").as("v"))
      .agg(count(lit(1)).as("w"))
      .crossJoin(broadcast(nd))
      .filter(lit(1000L) * col("w") >= lit(perMille.toLong) * col("ndocs"))
      .select(col("u"), col("v"), col("w"))
  }

  /** Per-node triangle counts by degree-ordered orientation (the
    * compact-forward algorithm; Latapy 2008): each undirected edge is
    * directed from its lower-(deg, id) endpoint to the higher, wedges
    * enumerate ONLY ordered out-neighbor pairs of each source, and a
    * wedge closes iff the (y→z) directed edge exists — every triangle
    * materializes exactly once, at its lowest-rank vertex.
    *
    * Why this shape survives scale: the naive 3-way edge self-join
    * lets one hub generate deg² wedges (power-law graphs: quadratic
    * in the hottest degree); after orientation every vertex's
    * OUT-degree is O(√m), so wedge volume is Σ outdeg² ≤ m^(3/2) —
    * the theoretical optimum for exact counting. All three hops are
    * equi-joins (src, then (y, z) against the directed edge set), so
    * AQE handles residual skew; the rank is the exact integer pair
    * (deg, node) — no float, ties broken by node id, bit-identical
    * cross-engine. */
  def triangleCount(edges: DataFrame): DataFrame = {
    // materialize the edge set ONCE: the degree/orientation/wedge/
    // closure joins below reference it six-plus ways, and without a
    // checkpoint every reference replays the whole upstream edge-build
    // subtree (for the token graph: the corpus co-occurrence self-join
    // and its doc-count scalar — the audit showed 65 replicated
    // broadcast subtrees in the executed plan)
    val und = edges.toDF("u", "v")
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("x"))
      .union(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))

    val lower = (du: Column, u: Column, dv: Column, v: Column) =>
      du < dv || (du === dv && u < v)
    val dir = und
      .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lower(col("du"), col("u"), col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(lower(col("du"), col("u"), col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("d"))
      .join(deg.select(col("x").as("d"), col("deg").as("dd")), "d")

    val tri = dir.select(col("s"), col("d").as("y"), col("dd").as("dy"))
      .join(dir.select(col("s"), col("d").as("z"), col("dd").as("dz")), "s")
      .filter(lower(col("dy"), col("y"), col("dz"), col("z")))
      .join(dir.select(col("s").as("y"), col("d").as("z")), Seq("y", "z"),
        "left_semi")
    val perNode = tri.select(col("s").as("n"))
      .union(tri.select(col("y").as("n")))
      .union(tri.select(col("z").as("n")))
      .groupBy("n").agg(count(lit(1)).as("triangles"))

    deg.join(perNode, col("x") === col("n"), "left_outer")
      .select(col("x").as("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  def tokenTrianglesQuery(spark: SparkSession, dir: String): DataFrame =
    triangleCount(
        tokenCooccurrence(Tables.documents(spark, dir)).select("u", "v"))
      .orderBy(col("node"))

  /** Community detection by SYNCHRONOUS weighted label propagation
    * (Raghavan et al. 2007), made deterministic: every node starts
    * labeled with itself; each round every node adopts the label with
    * the highest summed edge weight among its neighbors, ties to the
    * smallest label — evaluated as ONE map-side-combined min_by over
    * the (-weight, label) struct, so there is no RNG, no update
    * order, and no float anywhere. Synchronous LPA can oscillate
    * (period 2) on bipartite-ish structures; a FIXED iteration count
    * is therefore part of the operator contract (like pageRank's 10)
    * and the spec pins an oscillating case rather than hiding it.
    * Complements the graph family: connectedComponents answers
    * reachability, triangles local density, pageRank centrality —
    * LPA answers "which nodes belong together", the domain/topic
    * grouping step of a curation pipeline.
    *
    * Scale shape: the corpus appears only in the edge build; each
    * round is ONE equi-join of the neighbor list against the label
    * frame (both graph-sized) + one map-side-combined argmax — no
    * windows, no driver-side graph; label state localCheckpoints per
    * round so plans stay flat (the connectedComponents discipline). */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val ed = edges.toDF("u", "v", "w")
    val nb = ed.select(col("u").as("x"), col("v").as("nb"), col("w"))
      .union(ed.select(col("v").as("x"), col("u").as("nb"), col("w")))
      .localCheckpoint()
    val nodes = nb.select("x").distinct().localCheckpoint()
    var labels = nodes.select(col("x"), col("x").as("lbl")).localCheckpoint()
    for (_ <- 1 to iters) {
      labels = nb
        .join(labels.select(col("x").as("nb"), col("lbl")), "nb")
        .groupBy(col("x"), col("lbl")).agg(sum(col("w")).as("s"))
        .groupBy("x")
        .agg(min_by(col("lbl"),
          struct((lit(0L) - col("s")).as("ns"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "lbl")
      .select(col("x").as("node"), col("lbl").as("community"),
        col("community_size"))
  }

  def tokenCommunitiesQuery(spark: SparkSession, dir: String): DataFrame =
    labelPropagation(tokenCooccurrence(Tables.documents(spark, dir)))
      .orderBy(col("node"))

  /** k-core decomposition membership (Seidman 1983) by iterative
    * peeling — the graph family's QUALITY gate (a spam/boilerplate
    * token cluster survives frequency filters but rarely survives the
    * k-core of the co-occurrence graph; in curation the k-core is the
    * "structurally embedded" vocabulary): repeatedly delete nodes of
    * degree < k until the fixpoint. Deterministic BY STRUCTURE — the
    * peel removes ALL under-k nodes each round (no removal order), so
    * early-stop ≡ full unrolling, and the oracle replays exactly
    * `maxIters` rounds to the same state whether convergence came
    * early or not.
    *
    * Scale shape: each round is two map-side-combined degree counts +
    * two key-based semi-joins — graph-sized, no windows, no driver
    * graph; the edge frame localCheckpoints per round (the frontier
    * discipline) and the convergence probe is one scalar count. */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 8): DataFrame = {
    require(k >= 1 && maxIters >= 1)
    val und = edges.toDF("u", "v")
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    val nodes = und.select(col("u").as("x"))
      .union(und.select(col("v").as("x"))).distinct().localCheckpoint()
    var e = und
    var n = e.count()
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val deg = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("x").localCheckpoint()
      val e2 = e.join(keep.toDF("u"), Seq("u"), "left_semi")
        .join(keep.toDF("v"), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint()
      val n2 = e2.count()
      converged = n2 == n
      e = e2; n = n2; it += 1
    }
    val degF = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    nodes.join(degF, Seq("x"), "left")
      .select(col("x").as("node"), col("d").isNotNull.as("in_core"),
        coalesce(col("d"), lit(0L)).as("core_deg"))
  }

  def tokenKcoreQuery(spark: SparkSession, dir: String): DataFrame =
    kCore(tokenCooccurrence(Tables.documents(spark, dir)).select("u", "v"),
        k = 15)
      .orderBy(col("node"))

  /** Oracle: the identical integer recurrence unrolled as r0..r10
    * CTEs — truncating `//` at the same three spots per iteration. */
  private def pagerankOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH seq AS (
      | SELECT user_id, event_type AS src,
      |  lead(event_type) OVER (PARTITION BY user_id
      |                         ORDER BY ts, event_id) AS dst
      | FROM events),
      |ed AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
      |       FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
      |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY 1),
      |nodes AS (SELECT src AS t FROM ed UNION SELECT dst FROM ed),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      |r0 AS (SELECT t, 1000000 // n AS r FROM nodes CROSS JOIN nn)
      |""".stripMargin
    for (i <- 1 to iters) {
      sb ++= s",r$i AS (SELECT nodes.t, " +
        "(15 * 1000000) // (100 * nn.n) + (85 * coalesce(c.s, 0)) // 100 AS r " +
        "FROM nodes CROSS JOIN nn LEFT JOIN (" +
        s"SELECT ed.dst AS t2, CAST(sum((p.r * ed.w) // outw.outw) AS BIGINT) AS s " +
        s"FROM ed JOIN r${i - 1} p ON ed.src = p.t " +
        "JOIN outw ON ed.src = outw.src GROUP BY 1" +
        ") c ON nodes.t = c.t2)"
    }
    sb ++= s" SELECT nodes.t AS event_type, coalesce(outw.outw, 0) AS out_w, " +
      s"rr.r AS rank_micro FROM nodes " +
      s"JOIN r$iters rr ON nodes.t = rr.t " +
      "LEFT JOIN outw ON nodes.t = outw.src ORDER BY event_type"
    sb.toString
  }

  /** The shared token co-occurrence edge CTEs (rate threshold 630‰,
    * matching tokenCooccurrence's default). */
  private val coocCte =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |  FROM documents),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM documents),
      |ed AS (
      |  SELECT u, v, w FROM (
      |    SELECT a.t AS u, b.t AS v, CAST(count(*) AS BIGINT) AS w
      |    FROM tok a JOIN tok b
      |      ON a.doc_id = b.doc_id AND a.t < b.t GROUP BY 1, 2), nd
      |  WHERE 1000*w >= 630*ndocs)
      |""".stripMargin

  /** k-core oracle: exactly `iters` peel rounds unrolled as e0..eN
    * CTEs (early-stop ≡ full unroll because the peel is idempotent at
    * the fixpoint), survivors by final-degree left join. */
  private def kcoreOracle(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= coocCte
    // every e_{i+1} references e_i THREE ways (itself + two IN
    // subqueries); DuckDB inlines plain CTEs, so 8 rounds would
    // replicate the base scan 3^8 times — MATERIALIZED computes each
    // round once (the SQL analog of the operator's localCheckpoint)
    sb ++= ",e0 AS MATERIALIZED (SELECT u, v FROM ed)"
    sb ++= """,nodes AS (SELECT DISTINCT x FROM (
             |  SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0))""".stripMargin
    for (i <- 0 until iters) {
      sb ++= s""",d$i AS MATERIALIZED (SELECT x, count(*) AS d FROM (
                |  SELECT u AS x FROM e$i UNION ALL SELECT v FROM e$i) GROUP BY 1),
                |k$i AS MATERIALIZED (SELECT x FROM d$i WHERE d >= $k),
                |e${i + 1} AS MATERIALIZED (SELECT u, v FROM e$i
                |  WHERE u IN (SELECT x FROM k$i) AND v IN (SELECT x FROM k$i))""".stripMargin
    }
    sb ++= s""",df AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
              |  SELECT u AS x FROM e$iters UNION ALL SELECT v FROM e$iters)
              | GROUP BY 1)
              |SELECT n.x AS node, df.x IS NOT NULL AS in_core,
              |  coalesce(df.d, 0) AS core_deg
              |FROM nodes n LEFT JOIN df ON n.x = df.x
              |ORDER BY node""".stripMargin
    sb.toString
  }

  /** Oracle: the identical synchronous rounds unrolled as l0..lN CTEs
    * — weighted counts, then argmax with (s DESC, lbl) tie order. */
  private def lpaOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= coocCte
    sb ++= """,nb AS (SELECT u AS x, v AS nb, w FROM ed
      | UNION ALL SELECT v, u, w FROM ed),
      |l0 AS (SELECT DISTINCT x, x AS lbl FROM nb)
      |""".stripMargin
    for (i <- 1 to iters) {
      sb ++= s""",l$i AS (
        | SELECT x, lbl FROM (
        |  SELECT c.x, c.lbl,
        |   row_number() OVER (PARTITION BY c.x
        |                      ORDER BY c.s DESC, c.lbl) AS rn
        |  FROM (SELECT n.x, l.lbl, CAST(sum(n.w) AS BIGINT) AS s
        |        FROM nb n JOIN l${i - 1} l ON n.nb = l.x
        |        GROUP BY 1, 2) c)
        | WHERE rn = 1)
        |""".stripMargin
    }
    sb ++= s""",cs AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
      | FROM l$iters GROUP BY 1)
      |SELECT l.x AS node, l.lbl AS community, cs.community_size
      |FROM l$iters l JOIN cs ON l.lbl = cs.lbl ORDER BY node""".stripMargin
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "event_pagerank" -> pagerankOracle(10),
    "token_communities" -> lpaOracle(5),
    "token_kcore" -> kcoreOracle(k = 15, iters = 8),
    "token_triangles" -> (coocCte +
      """,dg AS (
        |  SELECT x, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS x FROM ed UNION ALL SELECT v FROM ed) GROUP BY 1),
        |dir AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
        |              THEN e.u ELSE e.v END AS s,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
        |              THEN e.v ELSE e.u END AS d
        |  FROM ed e JOIN dg du ON e.u = du.x JOIN dg dv ON e.v = dv.x),
        |tri AS (
        |  SELECT e1.s AS x, e1.d AS y, e2.d AS z
        |  FROM dir e1
        |  JOIN dg dy ON e1.d = dy.x
        |  JOIN dir e2 ON e1.s = e2.s
        |  JOIN dg dz ON e2.d = dz.x
        |  WHERE (dy.deg < dz.deg OR (dy.deg = dz.deg AND e1.d < e2.d))
        |    AND EXISTS (SELECT 1 FROM dir e3
        |                WHERE e3.s = e1.d AND e3.d = e2.d))
        |SELECT dg.x AS node, dg.deg,
        |  CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles
        |FROM dg LEFT JOIN (
        |  SELECT n, count(*) AS triangles FROM (
        |    SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri) GROUP BY 1) p
        |  ON dg.x = p.n
        |ORDER BY node""".stripMargin))
}
