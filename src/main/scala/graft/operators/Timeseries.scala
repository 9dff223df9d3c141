package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Time-series maintenance + anomaly QC over the event log: regular-grid
  * resampling with forward fill (the feature-store shape — models want
  * one row per (entity, period), not raw irregular events) and exact
  * integer z-score outlier flagging (the QC gate in front of it).
  */
object Timeseries {

  private val MicrosPerDay = 86400000000L

  /** Resample each user's event stream to a daily grid spanning the
    * corpus date range, carrying the last observed value forward into
    * gap days (nulls before a user's first observation).
    *
    * Three bounded shuffles, none over raw events twice:
    * 1. daily-last: row_number over (user_id, day) picks each day's
    *    closing value — partition cardinality users×days, per-partition
    *    rows = that day's events for that user;
    * 2. the grid (distinct users × sequence(min_day, max_day) — built
    *    from a broadcast 1-row bounds frame, never a driver collect)
    *    left-joins the daily frame on (user_id, day);
    * 3. forward fill: `last(ignoreNulls)` over user_id ordered by day —
    *    a running frame whose partition is the user's day span (the
    *    grid size), NOT their event count.
    * Grid rows = users × days, orders of magnitude below event rows at
    * any scale; the raw 100 TB frame is touched exactly once (step 1). */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"),
      (unix_micros(col("ts")) / MicrosPerDay).cast("long").as("day"),
      round(col("value") * 100, 0).cast("long").as("cents"))

    val lastPerDay = W.partitionBy(col("user_id"), col("day"))
      .orderBy(col("tus").desc, col("event_id").desc)
    val daily = ev
      .withColumn("rn", row_number().over(lastPerDay))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("cents"))

    val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row frame: a broadcast constant
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("day"))

    val ffill = W.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("cents"), ignoreNulls = true).over(ffill)
          .as("filled_cents"),
        col("cents").isNotNull.as("has_obs"))
  }

  def gapFillDailyQuery(spark: SparkSession, dir: String): DataFrame =
    gapFillDaily(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("day"))

  /** Events more than 3 population standard deviations from their
    * event_type mean — evaluated ENTIRELY in integers:
    *   |x − μ| > 3σ  ⟺  (n·x − S)² > 9·(n·SS − S²)
    * (multiply through by n²; S = Σx, SS = Σx², x in cents). A
    * float σ needs sqrt and a partition-order-dependent double sum —
    * neither is bit-stable across engines or even across runs; the
    * integer form is exact. DECIMAL(38,0) holds every term out to
    * ~10¹² rows per group of 5-digit cent values ((n·x−S)² ≤ 4·10³²).
    *
    * Scale: one map-side-combined groupBy over event_type (group count
    * = |event types|), broadcast back over the fact scan — the filter
    * runs in the scan stage, no fact shuffle at all. */
  def outlierEvents(events: DataFrame): DataFrame = {
    val d = (c: Column) => c.cast(DecimalType(38, 0))
    val ev = events.select(col("event_id"), col("event_type"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("s"),
      // per-row cents² fits a long; the running sum does not at 10¹²
      // rows — accumulate in decimal so the invariant above holds
      sum(d(col("cents") * col("cents"))).as("ss"))
    val dev = d(col("n")) * d(col("cents")) - d(col("s"))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(dev * dev > lit(9) * (d(col("n")) * d(col("ss")) - d(col("s")) * d(col("s"))))
      .select(col("event_id"), col("event_type"), col("cents"))
  }

  def outlierEventsQuery(spark: SparkSession, dir: String): DataFrame =
    outlierEvents(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("event_id"))

  /** OHLC bar resampling: per (event_type, hour) the opening/closing
    * value (first/last event by (event-time µs, event_id) — the unique
    * total order every time-series operator here uses) plus high/low
    * and the bar's event count — the candlestick/feature-bar shape.
    *
    * Scale: ONE map-side-combined aggregate over the fact scan.
    * open/close are `min_by`/`max_by` of cents over the (tus,
    * event_id) struct key — each partial task carries a single
    * running champion per group, so first/last NEVER needs a sorted
    * window over raw events (the windowed formulation puts every
    * event of the hottest (type, hour) cell in one unsplittable
    * task). Exact integer cents throughout. */
  def resampleOhlc(events: DataFrame): DataFrame = {
    // integer DIV, not floor(double /): an hour-boundary tus divided in
    // double can land an ulp off; timestamps here are non-negative so
    // truncation == floor and both engines stay exact
    val ev = events
      .select(
        col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .withColumn("window_start", expr("tus DIV 3600000000 * 3600"))
    ev.groupBy(col("window_start"), col("event_type"))
      .agg(ohlcAggs.head, ohlcAggs.tail: _*)
  }

  /** The OHLC aggregate expressions over a (tus, event_id, cents)
    * frame — ONE definition shared by the batch operator above and
    * `streaming.StreamPipelines.ohlcStream`, so the spec-pinned
    * batch≡stream parity cannot drift (same rule as the shared
    * curation expressions). */
  private[graft] def ohlcAggs: Seq[Column] = Seq(
    min_by(col("cents"), struct(col("tus"), col("event_id")))
      .as("open_cents"),
    max_by(col("cents"), struct(col("tus"), col("event_id")))
      .as("close_cents"),
    max(col("cents")).as("high_cents"),
    min(col("cents")).as("low_cents"),
    count(lit(1)).as("n"))

  def resampleOhlcQuery(spark: SparkSession, dir: String): DataFrame =
    resampleOhlc(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  val oracles: Map[String, String] = Map(
    "resample_ohlc" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (epoch_ns(ts)//1000 // 3600000000) * 3600 AS window_start,
        |    epoch_ns(ts)//1000 AS tus, event_id,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY window_start, event_type
        |                       ORDER BY tus, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY window_start, event_type
        |                       ORDER BY tus DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT window_start, event_type,
        |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
        |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
        |  max(cents) AS high_cents,
        |  min(cents) AS low_cents,
        |  count(*) AS n
        |FROM r
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "gap_fill_daily" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS tus,
        |    epoch_ns(ts)//86400000000000 AS day,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, cents FROM (
        |    SELECT user_id, day, cents, row_number() OVER (
        |      PARTITION BY user_id, day ORDER BY tus DESC, event_id DESC
        |    ) AS rn FROM ev) WHERE rn = 1),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
        |grid AS (
        |  SELECT u.user_id, unnest(generate_series(b.mn, b.mx)) AS day
        |  FROM (SELECT DISTINCT user_id FROM ev) u, b)
        |SELECT g.user_id, g.day,
        |  last_value(d.cents IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |  ) AS filled_cents,
        |  d.cents IS NOT NULL AS has_obs
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY g.user_id, g.day""".stripMargin,
    "outlier_events" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents FROM events),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(cents) AS HUGEINT) AS s,
        |    CAST(sum(cents*cents) AS HUGEINT) AS ss
        |  FROM ev GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.cents
        |FROM ev e JOIN st USING (event_type)
        |WHERE (n*e.cents - s)*(n*e.cents - s) > 9*(n*ss - s*s)
        |ORDER BY e.event_type, e.event_id""".stripMargin
  )
}
