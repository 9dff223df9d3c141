package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val oracles: Map[String, String] = Map(
    "event_pagerank" -> pagerankOracle(10))
}
