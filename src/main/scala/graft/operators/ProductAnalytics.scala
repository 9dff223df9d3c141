package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Product-analytics shapes over the event log: user journey paths,
  * cohort retention, and value histograms — the reporting layer that
  * sits next to the funnel operator (`Windows.funnelConversion`).
  *
  * All three follow the same scale law: the raw event frame is touched
  * once and immediately collapses to an aggregate whose cardinality is
  * entities (users) or cells (cohort×offset, type×bin), orders of
  * magnitude below event rows at any corpus size.
  */
object ProductAnalytics {

  private val MicrosPerDay = 86400000000L

  private def cents: Column =
    round(col("value") * 100, 0).cast("long").as("cents")
  private def day: Column =
    (unix_micros(col("ts")) / MicrosPerDay).cast("long").as("day")

  /** Top-20 user journey paths: each user's event types concatenated in
    * event-time order (ties on event_id), counted across users.
    *
    * The per-user sequence is built by ONE groupBy collect + in-row
    * array_sort of (tus, event_id, type) structs — never a window sort
    * followed by a second aggregate; per-group state is bounded by
    * per-user activity. The field extraction `sorted.event_type` is a
    * native ExtractValue over the struct array (no interpreted
    * lambda). Path counting is a map-side-combinable aggregate over
    * one short string per user; top-20 ties break on the path string
    * so the cut is deterministic. */
  def sessionPaths(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(
        struct(col("tus"), col("event_id"), col("event_type")))).as("seq"))
      .select(col("user_id"),
        array_join(col("seq.event_type"), ">").as("path"))
    perUser.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  def sessionPathsQuery(spark: SparkSession, dir: String): DataFrame =
    sessionPaths(Tables.events(spark, dir))

  /** Classic cohort retention: users grouped by first-seen day, counted
    * on each later active day as an offset k = day − first_day.
    *
    * Two aggregates and one join, all keyed on user_id so the join
    * reuses the distinct's partitioning: distinct (user, day) activity
    * → per-user min day → join back → count per (first_day, k). After
    * the distinct, a user contributes at most one row per (first_day,
    * k) cell, so count(*) IS count-distinct-users — no Expand pass. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val activity = events.select(col("user_id"), day).distinct()
    val firstDay = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    activity.join(firstDay, Seq("user_id"))
      .groupBy(col("first_day"), (col("day") - col("first_day")).as("k"))
      .agg(count(lit(1)).as("n_users"))
  }

  def retentionCohortsQuery(spark: SparkSession, dir: String): DataFrame =
    retentionCohorts(Tables.events(spark, dir))
      .orderBy(col("first_day"), col("k"))

  /** Per-type 10-bin equi-width histogram over value cents:
    * bin = (cents − mn)·10 DIV (mx − mn + 1) — pure integer division,
    * so the bin edges are bit-identical in any engine. Per-type bounds
    * are a first tiny aggregate broadcast back onto the scan (the
    * outlier_events shape); empty bins are simply absent. */
  def valueHistogram(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"), cents)
    val bounds = ev.groupBy(col("event_type")).agg(
      min(col("cents")).as("mn_cents"), max(col("cents")).as("mx_cents"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("bin",
        expr("(cents - mn_cents) * 10 DIV (mx_cents - mn_cents + 1)"))
      .groupBy(col("event_type"), col("mn_cents"), col("mx_cents"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  def valueHistogramQuery(spark: SparkSession, dir: String): DataFrame =
    valueHistogram(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("bin"))

  /** First-touch / last-touch attribution: each user's entry and exit
    * event types (by the (event-time µs, event_id) total order) keyed
    * against their purchase revenue, aggregated to the
    * (first_touch, last_touch) matrix marketing reads.
    *
    * The per-user reduction is ONE map-side-combined aggregate —
    * min_by/max_by over the (tus, event_id) struct key carry a single
    * running champion per user through the partial/final stages, so
    * first/last never needs a window sort over raw events; the second
    * aggregate is |touch-types|² cells. Revenue stays in exact
    * integer cents. */
  def attributionFirstLast(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_type"), cents,
      unix_micros(col("ts")).as("tus"), col("event_id"))
    val perUser = ev.groupBy(col("user_id")).agg(
      min_by(col("event_type"), struct(col("tus"), col("event_id")))
        .as("first_touch"),
      max_by(col("event_type"), struct(col("tus"), col("event_id")))
        .as("last_touch"),
      sum(when(col("event_type") === "purchase", col("cents"))
        .otherwise(0L)).as("purchase_cents"))
    perUser.groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("purchase_cents")).as("revenue_cents"))
  }

  def attributionFirstLastQuery(spark: SparkSession, dir: String): DataFrame =
    attributionFirstLast(Tables.events(spark, dir))
      .orderBy(col("first_touch"), col("last_touch"))

  val oracles: Map[String, String] = Map(
    "attribution_first_last" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents,
        |    epoch_ns(ts)//1000 AS tus, event_id
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tus, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tus DESC, event_id DESC) AS rn_d
        |  FROM e),
        |u AS (
        |  SELECT user_id,
        |    max(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
        |    max(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
        |             ELSE 0 END) AS BIGINT) AS purchase_cents
        |  FROM r GROUP BY user_id)
        |SELECT first_touch, last_touch,
        |  count(*) AS n_users,
        |  CAST(sum(purchase_cents) AS BIGINT) AS revenue_cents
        |FROM u GROUP BY 1, 2
        |ORDER BY first_touch, last_touch""".stripMargin,
    "session_paths" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY tus, event_id) AS path
        |  FROM (SELECT user_id, event_id, event_type,
        |          epoch_ns(ts)//1000 AS tus FROM events)
        |  GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM per_user
        |GROUP BY path ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    "retention_cohorts" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts)//86400000000000 AS day
        |  FROM events),
        |fd AS (SELECT user_id, min(day) AS first_day FROM activity
        |       GROUP BY user_id)
        |SELECT f.first_day, a.day - f.first_day AS k,
        |  count(*) AS n_users
        |FROM activity a JOIN fd f USING (user_id)
        |GROUP BY 1, 2 ORDER BY first_day, k""".stripMargin,
    "value_histogram" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type, min(cents) AS mn_cents,
        |        max(cents) AS mx_cents FROM ev GROUP BY event_type)
        |SELECT e.event_type, b.mn_cents, b.mx_cents,
        |  (e.cents - b.mn_cents) * 10 // (b.mx_cents - b.mn_cents + 1) AS bin,
        |  count(*) AS n
        |FROM ev e JOIN b USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type, bin""".stripMargin
  )
}
