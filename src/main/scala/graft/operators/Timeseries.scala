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

  /** Robust outlier QC: events whose modified z-score exceeds 3.5 —
    * |0.6745·(x − med)| > 3.5·MAD (Iglewicz & Hoaglin 1993), the
    * median/MAD complement to outlierEvents' mean/σ gate (one wild
    * sensor reading inflates σ enough to hide its siblings; the
    * median breaks down only past 50% contamination).
    *
    * Exactness: the flag is evaluated as 6745·|x−med| > 35000·MAD in
    * BIGINTs — no division anywhere — and both medians are DISCRETE
    * (smallest value whose cumulative count reaches (n+1) div 2), so
    * every compared quantity is an integer both engines agree on.
    * MAD = 0 (>50% of a type at one value) flags any deviation, the
    * documented modified-z-score degeneration.
    *
    * Scale shape — the corpus is scanned ONCE and never sorted:
    * medians come from a VALUE HISTOGRAM (map-side-combined groupBy
    * (type, cents), output bounded by |types|·|distinct cents|, not
    * row count), the cumulative window runs over the histogram, and
    * the deviation histogram is derived FROM the value histogram
    * (groupBy |cents−med| re-aggregating cnt — no second corpus
    * pass). The (med, MAD) frame (|types| rows) broadcasts back onto
    * the fact scan, so the flag is a map-only filter — the same
    * join-back discipline as outlierEvents/valueHistogram. */
  /** DISCRETE per-type median off a (event_type, <valueCol>, cnt)
    * histogram — the smallest value whose cumulative reaches
    * (n+1) div 2. Shared by madOutliers (value medians) and
    * rateSpikes (hourly-count medians). */
  private def discreteMedian(h: DataFrame, valueCol: String): DataFrame = {
    val cum = W.partitionBy(col("event_type")).orderBy(col(valueCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val tot = W.partitionBy(col("event_type"))
    h.withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(tot))
      .filter(lit(2) * col("cum") >= col("n") + 1)
      .groupBy(col("event_type"))
      .agg(min(col(valueCol)).as("med"))
  }

  def madOutliers(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"), col("event_type"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val hist = ev.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))

    val meds = discreteMedian(hist, "cents")
      .withColumnRenamed("med", "med_cents")
    val adHist = hist.join(broadcast(meds), Seq("event_type"))
      .groupBy(col("event_type"),
        abs(col("cents") - col("med_cents")).as("ad"))
      .agg(sum(col("cnt")).as("cnt"))
    val mads = discreteMedian(adHist, "ad")
      .withColumnRenamed("med", "mad_cents")

    ev.join(broadcast(meds), Seq("event_type"))
      .join(broadcast(mads), Seq("event_type"))
      .filter(lit(6745L) * abs(col("cents") - col("med_cents")) >
        lit(35000L) * col("mad_cents"))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("med_cents"), col("mad_cents"))
  }

  def madOutliersQuery(spark: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("event_id"))

  /** Hourly event-RATE spike detection — mad_outliers' robust gate
    * turned TEMPORAL ("did something unusual happen this hour?", the
    * monitoring alarm for ingestion storms, bot bursts, outage
    * silences): per type, hourly counts are scored by modified
    * z-score against the type's own hourly-count median/MAD —
    * 6745·|c−med| > 35000·MAD in BIGINTs, medians DISCRETE from the
    * hourly-count histogram (never a sort). Every hour row is emitted
    * with its `spike` flag (a quiet corpus with zero spikes is a
    * finding, not an empty frame).
    *
    * Scale shape: the corpus appears once in the (type, hour)
    * aggregate; everything downstream operates on hour-count frames
    * (|types|·|hours|) and their bounded histograms. */
  /** The per-type hourly (event_type, hour, cnt_h) frame — shared by
    * the batch detector and the streaming monitor (the hourly count
    * is a split-invariant sum, so the complete-mode streaming state
    * equals this frame exactly). */
  private[graft] def hourlyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("cnt_h"))

  /** The nightly MODEL half of rate-spike detection: per-type hourly
    * median + MAD off the hourly-count histogram. Model-sized
    * (|types| rows) — the frame a live monitor broadcasts. */
  private[graft] def rateMedMad(events: DataFrame): DataFrame = {
    val hist = hourlyCounts(events)
      .groupBy(col("event_type"), col("cnt_h").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val meds = discreteMedian(hist, "v").withColumnRenamed("med", "med_cnt")
    val adHist = hist.join(broadcast(meds), Seq("event_type"))
      .groupBy(col("event_type"), abs(col("v") - col("med_cnt")).as("ad"))
      .agg(sum(col("cnt")).as("cnt"))
    val mads = discreteMedian(adHist, "ad").withColumnRenamed("med", "mad_cnt")
    meds.join(mads, "event_type")
  }

  /** The flag rule over an hourly-count frame + the med/MAD model —
    * ONE definition shared by batch detection and the live monitor so
    * the alarm cannot drift between them. */
  private[graft] def spikeFlags(hourly: DataFrame,
                                medMad: DataFrame): DataFrame =
    hourly.join(broadcast(medMad), Seq("event_type"))
      .select(col("event_type"), col("hour"), col("cnt_h"),
        col("med_cnt"), col("mad_cnt"),
        (lit(6745L) * abs(col("cnt_h") - col("med_cnt")) >
          lit(35000L) * col("mad_cnt")).as("spike"))

  def rateSpikes(events: DataFrame): DataFrame =
    spikeFlags(hourlyCounts(events), rateMedMad(events))

  def rateSpikesQuery(spark: SparkSession, dir: String): DataFrame =
    rateSpikes(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("hour"))

  /** Trailing exponentially-weighted moving average, α = 1/2, as
    * EXACT integers: over the last K events of the same user (by the
    * (event-time µs, event_id) total order), weight 2^i for the i-th
    * oldest frame element, so
    *   ewma = (Σ xᵢ·2^i) div (2^L − 1),   L = frame length ≤ K.
    * The numerator folds Horner-style over the reversed frame list
    * (acc·2 + x — newest first), so no pow() float touches the value
    * path; magnitudes: |x| ≤ 10⁷ cents · 2⁸ · 8 ≪ int64. A shorter
    * head frame (L < K) renormalizes automatically via its own 2^L−1.
    *
    * Scale: ONE shuffle+sort on user_id (per-USER history partitions,
    * the scd2/gap-fill discipline — never a global order); the frame
    * list is ≤ K elements, folded in-row. The window's collect_list
    * respects frame order on both engines (rows enter in ORDER BY
    * order — the same contract session_paths pins for array_sort
    * inputs). */
  def ewmaSmooth(events: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1, 62], got $k")
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val w = W.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(-(k - 1), W.currentRow)
    ev.withColumn("lst", collect_list(col("cents")).over(w))
      .select(col("user_id"), col("event_id"), col("tus"), col("cents"),
        expr("aggregate(reverse(lst), 0L, (acc, x) -> acc * 2 + x)" +
          " div (shiftleft(1L, size(lst)) - 1)").as("ewma_cents"))
  }

  def ewmaSmoothQuery(spark: SparkSession, dir: String): DataFrame =
    ewmaSmooth(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("tus"), col("event_id"))

  /** Trailing rolling MEDIAN over each user's last k events — the
    * robust centerline next to ewma_smooth's exponential mean (one
    * wild reading drags an EWMA for k steps; the median shrugs it
    * off — the pairing mad_outliers makes corpus-wide, done per-user
    * trailing). DISCRETE median in exact integer cents: the lower
    * median element of the sorted frame list, never an average of two
    * middles — no division, no .5 ties, bit-identical cross-engine.
    *
    * Scale shape: same single user-partitioned window as ewma (ONE
    * shuffle+sort on user_id); the k-element frame list sorts in-row.
    */
  def rollingMedian(events: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val w = W.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(-(k - 1), W.currentRow)
    ev.withColumn("lst", collect_list(col("cents")).over(w))
      .select(col("user_id"), col("event_id"), col("tus"), col("cents"),
        expr("element_at(array_sort(lst), cast((size(lst) + 1) / 2 as int))")
          .as("median_cents"))
  }

  def rollingMedianQuery(spark: SparkSession, dir: String): DataFrame =
    rollingMedian(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("tus"), col("event_id"))

  /** Out-of-order arrival audit — the measurement that SIZES a
    * watermark instead of guessing it: treating event_id as the
    * arrival (ingest) sequence and ts as event time, each event's
    * lateness is how far the stream's running event-time high-water
    * mark had already passed it on arrival (exactly the quantity
    * `withWatermark` must bound for the event not to be dropped).
    * Per event type: counts, late share in exact permille, max and
    * total lateness in integer microseconds.
    *
    * Scale shape: the global running max is NEVER one window — the
    * arrival sequence buckets by `event_id div bucketSize`; per-bucket
    * maxima take an exclusive prefix-max in one window over the
    * (tiny) bucket frame, rows combine it with an exclusive running
    * max INSIDE their bucket (window bounded by bucketSize) — the
    * packTokenBudgetGlobal / shuffle_shards two-phase discipline
    * applied to a prefix MAX, and the oracle computes the same
    * lateness with ONE global window, so two-phase ≡ global is the
    * correctness check itself. */
  def outOfOrderStats(events: DataFrame,
                      bucketSize: Long = 1024L): DataFrame = {
    require(bucketSize >= 1)
    val ev = events.select(col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"),
      expr(s"event_id DIV $bucketSize").as("bkt"))
    val wB = W.orderBy(col("bkt")).rowsBetween(W.unboundedPreceding, -1)
    val prefix = ev.groupBy("bkt").agg(max("tus").as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(wB))
      .select("bkt", "pmax")
    val wIn = W.partitionBy(col("bkt")).orderBy(col("event_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val late = ev.join(prefix, "bkt")
      .withColumn("rmax", max(col("tus")).over(wIn))
      .withColumn("hwm", greatest(
        coalesce(col("pmax"), lit(Long.MinValue)),
        coalesce(col("rmax"), lit(Long.MinValue))))
      .withColumn("late_us",
        when(col("hwm") === Long.MinValue, 0L) // first arrival overall
          .otherwise(greatest(lit(0L), col("hwm") - col("tus"))))
    late.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
      .select(col("event_type"), col("n"), col("n_late"),
        expr("(1000 * n_late) div n").as("late_permille"),
        col("max_late_us"), col("sum_late_us"))
  }

  def outOfOrderStatsQuery(spark: SparkSession, dir: String): DataFrame =
    outOfOrderStats(Tables.events(spark, dir)).orderBy(col("event_type"))

  val oracles: Map[String, String] = Map(
    // mad_outliers' discrete-median machinery over hourly counts
    "rate_spikes" ->
      """WITH hr AS (
        | SELECT event_type,
        |  (epoch_ns(ts)//1000) // 3600000000 AS hour FROM events),
        |hc AS (SELECT event_type, hour, CAST(count(*) AS BIGINT) AS cnt_h
        |       FROM hr GROUP BY 1, 2),
        |h AS (SELECT event_type, cnt_h AS v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM hc GROUP BY 1, 2),
        |med AS (
        | SELECT event_type, min(v) AS med_cnt FROM (
        |  SELECT event_type, v,
        |   sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
        |   sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM h) WHERE 2 * cum >= n + 1 GROUP BY 1),
        |ah AS (SELECT h.event_type, abs(h.v - m.med_cnt) AS ad,
        |        CAST(sum(h.cnt) AS BIGINT) AS cnt
        |       FROM h JOIN med m USING (event_type) GROUP BY 1, 2),
        |mad AS (
        | SELECT event_type, min(ad) AS mad_cnt FROM (
        |  SELECT event_type, ad,
        |   sum(cnt) OVER (PARTITION BY event_type ORDER BY ad) AS cum,
        |   sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM ah) WHERE 2 * cum >= n + 1 GROUP BY 1)
        |SELECT hc.event_type, hc.hour, hc.cnt_h, m.med_cnt, d.mad_cnt,
        |  6745 * abs(hc.cnt_h - m.med_cnt) > 35000 * d.mad_cnt AS spike
        |FROM hc JOIN med m USING (event_type) JOIN mad d USING (event_type)
        |ORDER BY event_type, hour""".stripMargin,

    // DuckDB list() over the same trailing frame; lower median via
    // integer index into the sorted list
    "rolling_median" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_ns(ts)//1000 AS tus,
        |  CAST(round(value*100, 0) AS BIGINT) AS cents FROM events),
        |l AS (
        | SELECT user_id, event_id, tus, cents,
        |  list(cents) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
        | FROM ev)
        |SELECT user_id, event_id, tus, cents,
        |  list_sort(lst)[CAST((len(lst) + 1) // 2 AS INTEGER)] AS median_cents
        |FROM l ORDER BY user_id, tus, event_id""".stripMargin,

    // ONE global window vs the operator's two-phase bucket scheme —
    // the equivalence is the scale-correctness check
    "out_of_order_stats" ->
      """WITH e AS (
        | SELECT event_id, event_type, epoch_ns(ts)//1000 AS tus FROM events),
        |l AS (
        | SELECT event_type,
        |  greatest(0, coalesce(
        |   max(tus) OVER (ORDER BY event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    - tus, 0)) AS late_us
        | FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  (1000 * CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS late_permille,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us,
        |  CAST(sum(late_us) AS BIGINT) AS sum_late_us
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "mad_outliers" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents FROM events),
        |h AS (
        |  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |hc AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM h),
        |med AS (
        |  SELECT event_type, min(cents) AS med_cents FROM hc
        |  WHERE 2*cum >= n + 1 GROUP BY 1),
        |ah AS (
        |  SELECT h.event_type, abs(h.cents - m.med_cents) AS ad,
        |    CAST(sum(h.cnt) AS BIGINT) AS cnt
        |  FROM h JOIN med m ON h.event_type = m.event_type GROUP BY 1, 2),
        |ac AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM ah),
        |mad AS (
        |  SELECT event_type, min(ad) AS mad_cents FROM ac
        |  WHERE 2*cum >= n + 1 GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.cents, m.med_cents, d.mad_cents
        |FROM ev e
        |JOIN med m ON e.event_type = m.event_type
        |JOIN mad d ON e.event_type = d.event_type
        |WHERE 6745*abs(e.cents - m.med_cents) > 35000*d.mad_cents
        |ORDER BY e.event_type, e.event_id""".stripMargin,
    "ewma_smooth" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS tus,
        |    CAST(round(value*100, 0) AS BIGINT) AS cents FROM events),
        |l AS (
        |  SELECT user_id, event_id, tus, cents,
        |    list(cents) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
        |  FROM ev)
        |SELECT user_id, event_id, tus, cents,
        |  CAST(list_reduce(list_reverse(lst), (acc, x) -> acc*2 + x)
        |    // ((1::BIGINT << len(lst)) - 1) AS BIGINT) AS ewma_cents
        |FROM l ORDER BY user_id, tus, event_id""".stripMargin,
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
