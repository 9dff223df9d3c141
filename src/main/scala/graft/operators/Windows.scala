package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.core.Tables

/** Event-time windowed aggregation — the analytical heart of the
  * reference (streaming/structured/analysis/TumblingWindow.scala:55-66,
  * SlidingWindow.scala:56-69).
  *
  * The same transforms run on a stream (with `withWatermark`, see
  * graft.streaming.StreamPipelines) and in batch, where the driver's
  * DuckDB oracle checks them. Window starts are emitted as epoch-second
  * bigints: Spark's `window()` aligns to epoch 0, so
  * `unix_timestamp(window.start) == floor(epoch(ts)/len)*len`, which the
  * oracle reproduces portably.
  *
  * Scale: groupBy(window, key) is a single shuffle with map-side partial
  * aggregation; cardinality = windows × keys, far below input rows, so
  * the reduce side is tiny even at 100 TB.
  */
object Windows {

  /** 1-hour tumbling window per event_type (TumblingWindow.scala mirror,
    * sums + count + avg). avg is computed in integer cents with
    * half-away-from-zero integer division: small windows of 2-decimal
    * values land avg exactly on .005 boundaries, where Spark
    * (decimal-string HALF_UP) and DuckDB (binary fp) round() disagree —
    * integer math is bit-identical across engines. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        round(sum(col("value")) * 100, 0).cast("long").as("cents"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        unix_timestamp(col("window.end")).as("window_end"),
        col("event_type"), col("n"), col("sum_value"),
        // sign-aware half-away-from-zero: both branches divide
        // non-negative operands, where Spark's truncating DIV and
        // DuckDB's flooring // agree bit-for-bit (they diverge by 1 on
        // negative numerators, and the +n half-bias itself assumes a
        // non-negative sum)
        (expr("CASE WHEN cents >= 0 THEN (cents*2 + n) DIV (n*2) " +
          "ELSE -((-cents*2 + n) DIV (n*2)) END")
          .cast("double") / 100.0).as("avg_value"))

  def tumblingQuery(spark: SparkSession, dir: String): DataFrame =
    tumbling(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** 10-minute window sliding by 5 minutes, with the reference's
    * post-aggregation filter (SlidingWindow.scala:66-69 filters avg_whc
    * < 25.0; here: windows whose summed value clears a floor). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))
      .filter(col("sum_value") > 100.0)
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  def slidingQuery(spark: SparkSession, dir: String): DataFrame =
    sliding(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization per user: events within `gap` of the
    * previous event merge into one session (session_window — the third
    * event-time window family, beyond tumbling/sliding). Works
    * identically on a stream with a watermark (see
    * StreamingSessionSpec). Session starts are emitted at microsecond
    * precision: the session boundary IS an exact event timestamp, and
    * the oracle reproduces the same gaps-and-islands grouping with
    * integer micros arithmetic. */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("user_id"), col("n"), col("sum_value"))

  def sessionizedQuery(spark: SparkSession, dir: String): DataFrame =
    sessionized(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Batch analog of BasicStreaming.scala:20 `updateStateByKey`: the
    * running per-key count in event-time order, as an analytic window.
    * (The true streaming form is graft.streaming.StatefulWordCount.) */
  def statefulRunningCount(events: DataFrame): DataFrame = {
    val w = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    events.select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("running_n"))
  }

  def statefulRunningCountQuery(spark: SparkSession, dir: String): DataFrame =
    statefulRunningCount(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** The remaining analytic-function family — lag + ntile in one
    * per-key pass: each event's microsecond gap to the SAME user's
    * previous event (inter-arrival time, the input to rate-limit /
    * anomaly rules; null for a user's first event) and its ntile(4)
    * position quartile within the user's history. Both functions share
    * ONE window spec, so Catalyst evaluates them in a single Window
    * operator — one shuffle, one sort, two outputs. */
  def eventGapQuartiles(events: DataFrame): DataFrame = {
    val w = W.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"))
      .select(col("event_id"), col("user_id"),
        (col("tus") - lag(col("tus"), 1).over(w)).as("gap_us"),
        ntile(4).over(w).as("qtile"))
  }

  def eventGapQuartilesQuery(spark: SparkSession, dir: String): DataFrame =
    eventGapQuartiles(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** RANGE-frame trailing aggregation — the VALUE-bounded window frame
    * family (tumbling/sliding/session cover aligned, overlapping and
    * gap-based windows; rows-frames cover positional): per event, the
    * sum and count of the SAME user's events in the trailing hour,
    * computed as `RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW` over
    * epoch seconds — the continuous sliding aggregate that needs NO
    * slide-interval explode and no self-join.
    *
    * Equal-timestamp events are RANGE peers: every engine includes the
    * full peer group at CURRENT ROW, so ties need no tiebreak column
    * (unlike the ROWS frames, which order by (ts, event_id)).
    *
    * Exactness: values are 2-decimal, so the trailing sum is kept in
    * integer CENTS — any accumulation strategy (Spark's running
    * aggregate, DuckDB's segment tree) produces the identical BIGINT.
    * A double sum here would be engine-dependent in the last ulp.
    *
    * Scale shape: one shuffle + one sort per user partition, both
    * window functions share one spec → a single Window operator; frame
    * state is bounded by the hour's event volume per user. */
  def trailingHourStats(events: DataFrame): DataFrame = {
    val w = W.partitionBy(col("user_id")).orderBy(col("ets"))
      .rangeBetween(-3599L, W.currentRow)
    events
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ets"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .select(col("event_id"), col("user_id"), col("ets"),
        sum(col("cents")).over(w).as("trail_cents"),
        count(lit(1)).over(w).as("trail_n"))
  }

  def trailingHourStatsQuery(spark: SparkSession, dir: String): DataFrame =
    trailingHourStats(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** Ordered-funnel conversion (view → click → purchase): how many
    * users reached each stage IN ORDER — the sequential-pattern query
    * every product-analytics stack runs, and a different shape from
    * every other window op here: each stage's anchor time depends on
    * the PREVIOUS stage's anchor.
    *
    * Plan shape: the three stage anchors are conditional mins over the
    * SAME unordered per-user window — no ORDER BY, so no sort; the
    * stage chaining is expression-level (stage N's `when` references
    * stage N-1's window output). Catalyst runs all three in one Window
    * operator behind ONE hash exchange on user_id; the funnel then
    * reduces to a single-row conditional aggregate. No joins, no
    * self-union — a 100 TB event log pays exactly one shuffle of
    * (user_id, type, ts). NULL chaining does the stage gating: a user
    * with no view has t_view = NULL, so `ts > t_view` is NULL and
    * every later stage stays NULL — strictly-ordered semantics with no
    * explicit per-stage filters.
    *
    * Timestamps compare in microseconds and never reach the output
    * (cross-engine raw-timestamp hashing is a known trap); the output
    * is one row of exact BIGINT stage counts. */
  def funnelConversion(events: DataFrame): DataFrame = {
    val w = W.partitionBy(col("user_id"))
    val staged = events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("tus"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("tus") > col("t_view"),
          col("tus"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("tus") > col("t_click"),
          col("tus"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("t_view")).isNotNull.as("viewed"),
        max(col("t_click")).isNotNull.as("clicked"),
        max(col("t_purchase")).isNotNull.as("purchased"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("viewed"), 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("clicked"), 1L).otherwise(0L)).as("n_clicked_after_view"),
        sum(when(col("purchased"), 1L).otherwise(0L)).as("n_purchased_in_order"))
  }

  def funnelConversionQuery(spark: SparkSession, dir: String): DataFrame =
    funnelConversion(Tables.events(spark, dir))

  /** Wordcount over a text column — Basic.scala:24-25's
    * flatMap(split).groupBy.count in declarative form. */
  def wordCount(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  def wordCountQuery(spark: SparkSession, dir: String): DataFrame =
    wordCount(Tables.documents(spark, dir)).orderBy(col("word"))

  val oracles: Map[String, String] = Map(
    "trailing_hour_stats" ->
      """SELECT event_id, user_id, ets,
        | CAST(sum(cents) OVER w AS BIGINT) AS trail_cents,
        | count(*) OVER w AS trail_n
        |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS ets,
        |       CAST(round(value*100, 0) AS BIGINT) AS cents FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ets
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "tumbling_window" ->
      """SELECT window_start, window_start + 3600 AS window_end,
        | event_type, n, sum_value,
        | (CASE WHEN cents >= 0 THEN (cents*2 + n) // (n*2)
        |       ELSE -((-cents*2 + n) // (n*2)) END) / 100.0 AS avg_value
        |FROM (
        |  SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
        |   event_type, count(*) AS n, round(sum(value),2) AS sum_value,
        |   CAST(round(sum(value)*100, 0) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |ORDER BY window_start, event_type""".stripMargin,
    "sliding_window" ->
      """SELECT window_start, event_type, n, sum_value FROM (
        |  SELECT CAST(floor(epoch(ts)/300)*300 - off.i*300 AS BIGINT) AS window_start,
        |   event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |  FROM events CROSS JOIN (VALUES (0),(1)) AS off(i)
        |  GROUP BY 1, 2)
        |WHERE sum_value > 100.0 ORDER BY window_start, event_type""".stripMargin,
    "session_window_agg" ->
      """SELECT user_id, session_start_us, n, sum_value FROM (
        | SELECT user_id, min(tus) AS session_start_us, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        | FROM (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM (
        |   SELECT *, CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
        |                                            ORDER BY tus, event_id)
        |                  >= 1800000000 THEN 1 ELSE 0 END AS brk
        |   FROM (SELECT user_id, epoch_ns(ts)//1000 AS tus, value, event_id
        |         FROM events)))
        | GROUP BY user_id, grp)
        |ORDER BY user_id, session_start_us""".stripMargin,
    "stateful_running_count" ->
      """SELECT event_id, user_id,
        | count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS UNBOUNDED PRECEDING) AS running_n
        |FROM events ORDER BY event_id""".stripMargin,
    "wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "event_gap_quartiles" ->
      """SELECT event_id, user_id,
        | tus - lag(tus) OVER w AS gap_us,
        | ntile(4) OVER w AS qtile
        |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000 AS tus FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY event_id""".stripMargin,
    "funnel_conversion" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, epoch_ns(ts)//1000 AS tus FROM events),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tus END)
        |         OVER (PARTITION BY user_id) AS t_view FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'click' AND tus > t_view
        |         THEN tus END) OVER (PARTITION BY user_id) AS t_click FROM s2),
        |s4 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tus > t_click
        |         THEN tus END) OVER (PARTITION BY user_id) AS t_purchase FROM s3),
        |pu AS (SELECT user_id,
        |        max(t_view) IS NOT NULL AS viewed,
        |        max(t_click) IS NOT NULL AS clicked,
        |        max(t_purchase) IS NOT NULL AS purchased
        |       FROM s4 GROUP BY user_id)
        |SELECT count(*) AS n_users,
        | CAST(sum(CASE WHEN viewed THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        | CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
        | CAST(sum(CASE WHEN purchased THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_in_order
        |FROM pu""".stripMargin,
  )
}
