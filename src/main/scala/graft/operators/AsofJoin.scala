package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of (point-in-time) join — the operator Spark lacks natively that
  * every sensor/feature pipeline eventually needs: for each left row,
  * attach the state of the right side as it was at the left row's
  * timestamp (greatest right.ts <= left.ts within the key).
  *
  * Implementation is the union–sort–carry pattern, per the library's
  * preference order: composition of built-ins BEFORE custom plans.
  * Both sides are tagged and unioned, shuffled ONCE by key, sorted by
  * (ts, side) within the key, and the right payload is carried forward
  * with last(ignoreNulls) over an unbounded-preceding window. That is
  * O(n log n) per key with a single exchange — versus the naive
  * range-join (left.ts >= right.ts then argmax), which explodes to
  * |L|x|R| rows per key before pruning. At 100 TB the sort is the
  * floor for this semantics; no custom SparkPlan would beat it
  * asymptotically, so none is built.
  */
object AsofJoin {

  /** @param right must have at most ONE row per (key, ts) — pre-dedup
    *              (the match is otherwise ambiguous; DuckDB's ASOF has
    *              the same caveat). Payload columns are every right
    *              column except key and ts, returned null when no
    *              right row precedes the left row (LEFT semantics).
    *              The two ts columns must share one orderable type —
    *              they are compared AS-IS, at full precision (a cast
    *              to seconds here would silently leak sub-second
    *              FUTURE updates into a point-in-time join).
    * @param forward false (default): greatest right.ts <= left.ts —
    *              state as it WAS (backward as-of). true: smallest
    *              right.ts >= left.ts — the next scheduled change
    *              (forward as-of: "what happens to this entity next"),
    *              same single-exchange union–sort–carry with the sort
    *              direction flipped; at equal ts the right row is
    *              visible to the left row in BOTH directions. */
  def asof(left: DataFrame, leftKey: String, leftTs: String,
           right: DataFrame, rightKey: String, rightTs: String,
           forward: Boolean = false): DataFrame = {
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"asof ts types must match: ${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType} (cast explicitly, at full precision)")
    val payloadCols = right.columns.filterNot(c => c == rightKey || c == rightTs).toSeq
    val leftCols = left.columns.toSeq
    val clash = payloadCols.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: $clash — rename before asof")
    val reserved = Seq("__key", "__ts", "__side", "__payload", "__carried")
    require(!(leftCols ++ payloadCols).exists(reserved.contains),
      s"column names $reserved are reserved by asof")

    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payloadCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))))
      .select((Seq("__key", "__ts", "__side", "__payload") ++ leftCols).map(col): _*)

    val rTagged = right
      .withColumn("__key", col(rightKey))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(payloadCols.map(col): _*))
      .select(Seq(col("__key"), col("__ts"), col("__side"), col("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // updates (side 0) sort before events (side 1) at equal ts, so a
    // same-timestamp update IS visible to the event (ASOF >=/<=
    // semantics); forward flips only the ts direction — the carry then
    // runs from the future toward each event
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val w = W.partitionBy(col("__key")).orderBy(tsOrd, col("__side"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Oracle query: each event enriched with the customer's most recent
    * order at event time (orders deduped to max o_orderkey per
    * (custkey, day) — ties would make the match ambiguous in any
    * engine). */
  def asofLatestOrderQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ets"))
    val dedup = W.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables.orders(spark, dir)
      .withColumn("__rn", row_number().over(dedup))
      .filter(col("__rn") === 1)
      .select(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("ots"),
        col("o_orderkey"), col("o_totalprice"))
    asof(events, "user_id", "ets", orders, "o_custkey", "ots")
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of: each event enriched with the customer's NEXT order
    * at or after event time — the "time to next action" shape (churn /
    * conversion-lag analytics), verified against DuckDB's native ASOF
    * with the comparator flipped. */
  def asofNextOrderQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ets"))
    val dedup = W.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables.orders(spark, dir)
      .withColumn("__rn", row_number().over(dedup))
      .filter(col("__rn") === 1)
      .select(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("ots"),
        col("o_orderkey"), col("o_totalprice"))
    asof(events, "user_id", "ets", orders, "o_custkey", "ots", forward = true)
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** NEAREST as-of: each event matched to the temporally CLOSEST order
    * of its customer, either side of the event — the sensor-fusion
    * semantic (align to the closest reading) that completes the
    * backward (row 36) / forward (row 126) family. Composed from BOTH
    * directional passes — each is the proven merge-carry plan — then a
    * per-event integer |Δt| comparison picks the winner; ties go
    * backward (the earlier order), `src` names the side for
    * auditability. Events with orders on neither side keep nulls.
    *
    * Scale shape: two key-partitioned merge-carry windows (the asof
    * cost, twice) + one 1:1 equi-join on event_id of two event-sized
    * frames — nothing new shuffles wider than the asof passes
    * themselves. */
  def asofNearestOrderQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ets"))
    val dedup = W.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables.orders(spark, dir)
      .withColumn("__rn", row_number().over(dedup))
      .filter(col("__rn") === 1)
      .select(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("ots"),
        // the join ts is not a payload column; carry a copy so the
        // |Δt| comparison can see the matched order's time
        unix_timestamp(col("o_orderdate")).as("o_ts"),
        col("o_orderkey"), col("o_totalprice"))
    val back = asof(events, "user_id", "ets", orders, "o_custkey", "ots")
      .select(col("event_id"), col("user_id"), col("ets"),
        col("o_ts").as("bts"), col("o_orderkey").as("bkey"),
        col("o_totalprice").as("bprice"))
    val fwd = asof(events, "user_id", "ets", orders, "o_custkey", "ots",
        forward = true)
      .select(col("event_id"), col("o_ts").as("fts"),
        col("o_orderkey").as("fkey"), col("o_totalprice").as("fprice"))
    val pickBack = col("fkey").isNull ||
      (col("bkey").isNotNull &&
        (col("ets") - col("bts")) <= (col("fts") - col("ets")))
    back.join(fwd, "event_id")
      .select(col("event_id"), col("user_id"),
        when(pickBack, col("bkey")).otherwise(col("fkey")).as("o_orderkey"),
        round(when(pickBack, col("bprice")).otherwise(col("fprice")), 2)
          .as("o_totalprice"),
        when(col("bkey").isNull && col("fkey").isNull, lit(null).cast("string"))
          .when(pickBack, lit("back")).otherwise(lit("fwd")).as("src"))
      .orderBy(col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    "asof_join_nearest" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS ets
        |           FROM events),
        |o AS (
        | SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS ots,
        |  o_orderkey, o_totalprice
        | FROM orders
        | QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                            ORDER BY o_orderkey DESC) = 1),
        |b AS (
        | SELECT e.event_id, e.user_id, e.ets, o.ots AS bts,
        |  o.o_orderkey AS bkey, o.o_totalprice AS bprice
        | FROM e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ets >= o.ots),
        |f AS (
        | SELECT e.event_id, o.ots AS fts, o.o_orderkey AS fkey,
        |  o.o_totalprice AS fprice
        | FROM e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ets <= o.ots)
        |SELECT b.event_id, b.user_id,
        | CASE WHEN f.fkey IS NULL OR (b.bkey IS NOT NULL
        |        AND (b.ets - b.bts) <= (f.fts - b.ets))
        |      THEN b.bkey ELSE f.fkey END AS o_orderkey,
        | round(CASE WHEN f.fkey IS NULL OR (b.bkey IS NOT NULL
        |        AND (b.ets - b.bts) <= (f.fts - b.ets))
        |      THEN b.bprice ELSE f.fprice END, 2) AS o_totalprice,
        | CASE WHEN b.bkey IS NULL AND f.fkey IS NULL THEN NULL
        |      WHEN f.fkey IS NULL OR (b.bkey IS NOT NULL
        |        AND (b.ets - b.bts) <= (f.fts - b.ets))
        |      THEN 'back' ELSE 'fwd' END AS src
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,
    "asof_join_forward" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey,
        | round(o.o_totalprice, 2) AS o_totalprice
        |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS ets
        |      FROM events) e
        |ASOF LEFT JOIN (
        | SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS ots,
        |  o_orderkey, o_totalprice
        | FROM orders
        | QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                            ORDER BY o_orderkey DESC) = 1)
        | o ON e.user_id = o.o_custkey AND e.ets <= o.ots
        |ORDER BY e.event_id""".stripMargin,
    "asof_join" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey,
        | round(o.o_totalprice, 2) AS o_totalprice
        |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS ets
        |      FROM events) e
        |ASOF LEFT JOIN (
        | SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS ots,
        |  o_orderkey, o_totalprice
        | FROM orders
        | QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                            ORDER BY o_orderkey DESC) = 1)
        | o ON e.user_id = o.o_custkey AND e.ets >= o.ots
        |ORDER BY e.event_id""".stripMargin,
  )
}
