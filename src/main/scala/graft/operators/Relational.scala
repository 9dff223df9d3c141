package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Relational core: the batch query engine the stream operators sit on.
  *
  * Notes on oracle parity (driver compares against DuckDB by value hash):
  *  - every double aggregate is `round`ed so summation-order fp noise
  *    can't flip the hash;
  *  - every query has a deterministic total ORDER BY;
  *  - timestamps are emitted as formatted strings or epoch bigints,
  *    never raw timestamp columns (tz-encoding differs across engines).
  *
  * Scale notes: dims (region/nation/supplier, and part/customer at the
  * SFs where they stay small) are broadcast; fact-fact joins shuffle on
  * the join key and rely on AQE for skew/coalesce.
  */
object Relational {

  /** TPC-H Q1 pricing summary over lineitem. One shuffle (partial agg is
    * map-side combined); scan is pruned to the 7 referenced columns and
    * the shipdate predicate is pushed to parquet. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style shipping priority: 3-way join, group, top-10 revenue.
    *
    * Scale shape: customer scales with SF, so no forced broadcast — AQE
    * picks broadcast only when the filtered side actually fits. The
    * ord⋈cust join runs FIRST (both sides pre-filtered, pushed to the
    * scan) so the expensive lineitem join carries only qualifying orders. */
  def q3TopUnshipped(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
    val oc   = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
    li.join(oc, li("l_orderkey") === oc("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per nation within one region, 5-way join.
    *
    * Scale shape: only region/nation (constant-size) are broadcast.
    * Customer is pre-reduced by joining the broadcast nation⋈region
    * filter FIRST, so only ASIA-nation customers flow into the shuffle
    * join with orders; customer itself is never broadcast (it scales
    * with SF — a forced hint would OOM the driver at 100 TB). */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val reg  = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val asiaCust = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(asiaCust, ord("o_custkey") === asiaCust("c_custkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-k parts by revenue.
    *
    * Scale shape: rank-then-join. The agg is ordered and cut to 20 rows
    * BEFORE the part join, so the name lookup is a broadcast of 20 rows
    * against part — at 100 TB this turns a fact-dim shuffle join into a
    * constant-size lookup. (Revenue depends only on lineitem, so the cut
    * commutes with the join.) */
  def topPartsByRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    val top20 = li.groupBy(col("l_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_partkey"))
      .limit(20)
    broadcast(top20).join(part, col("l_partkey") === part("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
  }

  /** Analytic window function: rank suppliers by revenue within nation. */
  def windowRankSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val li  = Tables.lineitem(spark, dir)
    // supplier scales with SF → no forced broadcast (AQE decides);
    // nation is constant-size → safe to hint.
    val rev = li.groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .join(sup, col("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("revenue").desc, col("s_suppkey"))
    rev.select(col("s_suppkey"), col("s_name"), col("n_name"), col("revenue"),
        rank().over(w).as("rnk"))
      .orderBy(col("n_name"), col("rnk"))
  }

  /** EXISTS / NOT EXISTS flag in ONE pass: distinct order keys, then a
    * single left_outer join with an isNotNull flag — the semi+anti+union
    * form scans customer and orders twice (2× I/O at 100 TB). */
  def semiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ordKeys = Tables.orders(spark, dir).select(col("o_custkey")).distinct()
    cust.join(ordKeys, cust("c_custkey") === ordKeys("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"),
        col("o_custkey").isNotNull.as("has_order"))
      .orderBy(col("c_custkey"))
  }

  /** Exact interpolated percentiles of event values per type — the
    * distribution-cut primitive a data pipeline uses for threshold
    * selection ("keep above p95"). Spark's `percentile` and DuckDB's
    * `quantile_cont` share the sorted-linear-interpolation definition
    * and agree bit-for-bit (verified empirically).
    *
    * Scale note: exact percentiles sort each group's values; for
    * 100 TB-per-group data switch to `approx_percentile` and accept
    * sketch error — kept exact here because the oracle must be
    * deterministic. */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.5, 0.9, 0.95, 0.99))").as("q"))
      .select(col("event_type"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p90"),
        element_at(col("q"), 3).as("p95"),
        element_at(col("q"), 4).as("p99"))
      .orderBy(col("event_type"))

  /** The 100 TB percentile path: `percentile_approx` — a single-pass,
    * MERGEABLE quantile sketch (partials combine map-side and across
    * partitions, memory bounded by `accuracy`, never by group size),
    * vs exact percentile's per-group full sort. Not oracle-checked
    * (sketch internals differ engine-to-engine by design); the spec
    * pins it to the exact operator within rank-error tolerance on the
    * real events table. Use THIS form when a group's values do not
    * comfortably sort in one task; the exact form is the correctness
    * oracle at test scale. */
  def valuePercentilesApprox(events: DataFrame,
                             accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(0.5, 0.9, 0.95, 0.99), $accuracy)")
        .as("q"))
      .select(col("event_type"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p90"),
        element_at(col("q"), 3).as("p95"),
        element_at(col("q"), 4).as("p99"))
      .orderBy(col("event_type"))

  /** Point-in-interval RANGE join with NO equi-key, executed as
    * Layout.binnedRangeJoin's bin equi-join (Spark's native plan for a
    * pure inequality predicate is BroadcastNestedLoopJoin — a
    * non-starter once both sides scale). Here: count events landing in
    * each 3-day "promo window" — a pseudo-random ~0.1% of orders opens
    * one, so the interval side scales WITH the data and nothing here
    * is broadcast-able by construction. (The synthetic orders' 1990s
    * dates don't overlap the events' 2024 observation month, so the
    * window start is derived inside that month from the order key.)
    * Each interval spans 2-3 of the 2-day bins; only co-binned rows
    * ever meet. */
  def rangeJoinBins(spark: SparkSession, dir: String): DataFrame = {
    val day = 86400L
    val monthStart = 1704067200L // 2024-01-01, the events observation month
    val events = Tables.events(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ets"))
    val promos = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey").as("promo_id"),
        (lit(monthStart) + (col("o_orderkey") % 28) * day).as("pstart"))
      .withColumn("pend", col("pstart") + lit(3 * day))
    graft.core.Layout.binnedRangeJoin(events, "ets", promos,
        "pstart", "pend", binWidth = 2 * day)
      .groupBy(col("promo_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("promo_id"))
  }

  /** Hierarchical totals: revenue by (region, nation) with ROLLUP
    * subtotals and a grand total — one pass, partial-aggregated like
    * any groupBy (rollup expands to grouping sets, not extra scans).
    * NULL group labels are coalesced to sentinels so the oracle's
    * column-sorted hash compare is unambiguous. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue"))
      .orderBy(col("region"), col("nation"))
  }

  /** Full CUBE over two independent dimensions — every (region,
    * segment) cell PLUS both one-dimensional margins and the grand
    * total, which ROLLUP's hierarchy cannot express (it only subtotals
    * along its prefix order). Same single-pass grouping-sets execution
    * as rollup: 4 grouping sets expand in the aggregate, partial
    * combine map-side, no extra scans. */
  def cubeSegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("revenue"), col("n_orders"))
      .orderBy(col("region"), col("segment"))
  }

  /** Wide pivot: per-nation revenue split across market segments as
    * columns — groupBy().pivot() with an explicit segment list (an
    * unlisted pivot would need an extra pass to discover values;
    * always pin the list at scale). */
  def pivotSegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val nat = Tables.nation(spark, dir)
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segments)
      .agg(round(sum(col("o_totalprice")), 2))
      .na.fill(0.0, segments)
      .orderBy(col("n_name"))
  }

  /** TPC-H Q17 shape — a CORRELATED SCALAR SUBQUERY through the SQL
    * surface: lineitems whose quantity is below 20% of their part's
    * average quantity (the small-order detection pattern). The point
    * is the planner path: Catalyst DECORRELATES the subquery into a
    * per-part aggregate joined back (one scan of lineitem per side,
    * never a per-row re-execution) — the rewrite a naive engine
    * misses, which turns an O(n) predicate into O(n·parts). The
    * predicate is deterministic cross-engine: quantities are integral
    * doubles, so the per-part sum is EXACT in any accumulation order
    * and avg is one IEEE division.
    *
    * Scale shape: both sides shuffle on l_partkey (the aggregate is
    * map-side combined); AQE broadcasts the per-part averages when
    * they measure small. The brand filter pushes into the part scan. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    spark.sql(
      """SELECT p_brand, round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** The inverse reshape: melt the wide pivot frame back to long
    * (nation, segment, revenue) rows via Dataset.unpivot — the
    * wide→long half of the reshape pair (reports arrive wide; the
    * engine's joins/aggregates want long). Map-only over the already-
    * aggregated 25-row frame: unpivot is a generate, never a shuffle,
    * so the pair pivot+unpivot costs exactly the pivot's aggregate. */
  def unpivotSegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    pivotSegmentRevenue(spark, dir)
      .unpivot(Array(col("n_name")), segments.map(col).toArray,
        "segment", "revenue")
      .orderBy(col("n_name"), col("segment"))
  }

  /** TPC-H Q4 shape (order-priority checking): orders in a six-month
    * window with at least one LATE line item (shipped > 60 days after
    * the order date), counted per priority. (The driver's synthetic
    * lineitem has no commitdate/receiptdate, so "late" is defined
    * against the order date — same EXISTS-with-non-equi-predicate
    * plan shape as the real Q4.)
    *
    * Scale shape: EXISTS compiles to a left_semi join — the non-equi
    * lateness predicate rides on the o_orderkey equi-join, the semi
    * join short-circuits per matching key (lineitem is never
    * aggregated or deduplicated), and the date window pushes into the
    * orders parquet scan. One shuffle per side. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 shape (customer distribution): how many customers
    * placed k orders, for every k — including k = 0, which is why the
    * status filter must live in the JOIN condition (a WHERE would
    * silently drop the zero-order customers, the row Q13 exists to
    * count). The 'P' status stands in for the comment NOT-LIKE filter.
    *
    * Scale shape: the left_outer join keys on c_custkey and the first
    * aggregate groups on the SAME key, so the count reuses the join's
    * partitioning — one exchange per input, none between join and
    * aggregate. The second aggregate runs over a customer-cardinality
    * frame map-side-combined down to ~max(k) rows. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "P")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total line
    * quantity exceeds the threshold, with their customer — top 100 by
    * order value.
    *
    * Scale shape: the HAVING threshold is applied to the lineitem
    * aggregate BEFORE any join, so the join input shrinks to the ~1%
    * qualifying orders (AQE broadcasts it when it measures small) —
    * the naive join-then-filter shape would drag every lineitem row
    * through both joins first. Quantities are small integers stored
    * as doubles, so the per-order sum is exact in any accumulation
    * order. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    bigOrders.join(ord, col("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22 shape (global sales opportunity): DORMANT customers —
    * above-average account balance, no order since 1999 — counted and
    * totaled per nation. (The synthetic orders table leaves almost no
    * customer with zero orders ever, so the anti-join predicate is
    * recency-scoped; the date filter pushes into the orders scan —
    * partition-prunable on a date-partitioned 100 TB table.)
    *
    * The "above average" threshold is evaluated in EXACT integer
    * arithmetic: balances are 2-decimal values, so cents are exact
    * longs and `cents·n_pos > total_cents` is the same predicate as
    * `balance > avg` with NO floating-point summation anywhere — a
    * double avg would depend on partition merge order (nondeterministic
    * across runs, let alone engines). Long overflow needs cents·n_pos
    * ≥ 2^63: ~1e6 cents × ~1e9 positive-balance customers = 1e15,
    * three orders of magnitude of headroom over a 100 TB customer
    * table.
    *
    * Scale shape: the threshold is a scalar aggregate (partial sums
    * reduced to ONE row, broadcast back — bytes, not rows); the
    * no-orders test is a left_anti against the projected o_custkey
    * column; nation is a constant-size broadcast. Customer is scanned
    * twice (threshold + probe) — inherent to the query's semantics. */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .withColumn("cents", round(col("c_acctbal") * 100, 0).cast("long"))
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("cents")).as("tot_cents"), count(lit(1)).as("n_pos"))
    val ordKeys = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(thr))
      .filter(col("cents") * col("n_pos") > col("tot_cents"))
      .join(ordKeys, col("c_custkey") === ordKeys("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q7 shape (volume shipping): revenue between two trading
    * nations, by direction and ship year.
    *
    * Scale shape: the nation filter is applied to supplier and
    * customer BEFORE they touch the fact tables — each dim join then
    * passes only ~2/25 of fact rows (the joins act as semi-filters),
    * and the direction pair filter (an OR over two name pairs) runs on
    * the already-reduced frame. Nation is a constant-size broadcast;
    * supplier/customer scale with SF so AQE decides their strategy.
    * Year extraction is a cast-to-long so both engines emit BIGINT. */
  def q7NationTrade(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, col("l_suppkey") === sup("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** GROUPING SETS — the general form the ROLLUP/CUBE specializations
    * compile to: an explicit margin list ((nation, segment), (nation),
    * (segment)) WITHOUT the grand total, a shape neither ROLLUP (no
    * segment-only margin) nor CUBE (forces the () cell) expresses.
    * Through the SQL surface; Catalyst lowers to ONE Expand over the
    * joined frame — three margins, one scan, one shuffle. */
  def groupingSetsRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(
      """SELECT coalesce(n_name, 'ALL') AS nation,
        | coalesce(c_mktsegment, 'ALL') AS segment,
        | round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment))
        |ORDER BY nation, segment""".stripMargin)
  }

  /** TPC-H Q6 shape (forecasting revenue change): the pure
    * scan-filter-aggregate — every predicate (ship-year, discount
    * band, quantity cap) pushes into the parquet scan, the aggregate
    * is a scalar reduce of map-side partials. The simplest possible
    * plan, here as the degenerate-case regression anchor: if THIS
    * query ever plans a shuffle beyond the final single-row reduce,
    * something upstream broke.
    *
    * The discount band compares stored doubles against the same
    * 2-decimal literals both engines parse to identical bits, so the
    * predicate is exact cross-engine. */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q10 shape (returned-item reporting): top 20 customers by
    * revenue lost to returns in one quarter.
    *
    * Scale shape: rank-then-join (same law as topPartsByRevenue) —
    * revenue depends only on lineitem⋈orders, so the top-20 cut runs
    * BEFORE customer attributes attach; the dim join is then a
    * broadcast of 20 rows instead of a customer-wide shuffle. Both
    * fact filters (returnflag, order-date quarter) push to their
    * scans. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val top20 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
    broadcast(top20)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
  }

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        |FROM (SELECT o_custkey,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE l_returnflag = 'R'
        |        AND o_orderdate >= TIMESTAMP '1997-07-01'
        |        AND o_orderdate < TIMESTAMP '1997-10-01'
        |      GROUP BY o_custkey
        |      ORDER BY revenue DESC, o_custkey LIMIT 20)
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey""".stripMargin,
    "q7_nation_trade" ->
      """SELECT supp_nation, cust_nation, l_year,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM (
        | SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |        l_extendedprice, l_discount
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        | WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        |    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "grouping_sets_revenue" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        | coalesce(c_mktsegment, 'ALL') AS segment,
        | round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment))
        |ORDER BY nation, segment""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | o_totalprice, total_qty
        |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING round(sum(l_quantity), 2) > 250.0) big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q22_global_sales" ->
      """WITH pos AS (
        |  SELECT CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer WHERE c_acctbal > 0.0),
        |thr AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS tot_cents,
        |         count(*) AS n_pos FROM pos)
        |SELECT n_name, count(*) AS numcust,
        | round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey, thr
        |WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * n_pos > tot_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "range_join_bins" ->
      """SELECT promo_id, count(*) AS n_events
        |FROM (SELECT event_id, epoch_ns(ts)//1000000000 AS ets FROM events) e
        |JOIN (SELECT o_orderkey AS promo_id,
        |       1704067200 + (o_orderkey % 28) * 86400 AS pstart,
        |       1704067200 + (o_orderkey % 28) * 86400 + 3*86400 AS pend
        |      FROM orders WHERE o_orderkey % 997 = 0) p
        | ON e.ets >= p.pstart AND e.ets < p.pend
        |GROUP BY promo_id ORDER BY promo_id""".stripMargin,
    "rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        | coalesce(n_name, 'ALL') AS nation,
        | round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "cube_segment_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        | coalesce(c_mktsegment, 'ALL') AS segment,
        | round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, c_mktsegment)
        |ORDER BY region, segment""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT p_brand, round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "unpivot_revenue" ->
      """WITH p AS (
        | SELECT n_name, c_mktsegment AS segment,
        |  coalesce(round(sum(o_totalprice), 2), 0) AS revenue
        | FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name, c_mktsegment),
        |grid AS (
        | SELECT n.n_name, s.segment
        | FROM (SELECT DISTINCT n_name FROM p) n
        | CROSS JOIN (VALUES ('AUTOMOBILE'), ('BUILDING'), ('FURNITURE'),
        |             ('HOUSEHOLD'), ('MACHINERY')) s(segment))
        |SELECT g.n_name, g.segment, coalesce(p.revenue, 0) AS revenue
        |FROM grid g LEFT JOIN p ON g.n_name = p.n_name AND g.segment = p.segment
        |ORDER BY g.n_name, g.segment""".stripMargin,
    "pivot_segment_revenue" ->
      """SELECT n_name,
        | coalesce(round(sum(o_totalprice) FILTER (c_mktsegment = 'AUTOMOBILE'), 2), 0) AS "AUTOMOBILE",
        | coalesce(round(sum(o_totalprice) FILTER (c_mktsegment = 'BUILDING'), 2), 0) AS "BUILDING",
        | coalesce(round(sum(o_totalprice) FILTER (c_mktsegment = 'FURNITURE'), 2), 0) AS "FURNITURE",
        | coalesce(round(sum(o_totalprice) FILTER (c_mktsegment = 'HOUSEHOLD'), 2), 0) AS "HOUSEHOLD",
        | coalesce(round(sum(o_totalprice) FILTER (c_mktsegment = 'MACHINERY'), 2), 0) AS "MACHINERY"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "value_percentiles" ->
      """SELECT event_type, q[1] AS p50, q[2] AS p90, q[3] AS p95, q[4] AS p99
        |FROM (
        | SELECT event_type,
        |  quantile_cont(value, [0.5, 0.9, 0.95, 0.99]) AS q
        | FROM events GROUP BY 1)
        |ORDER BY event_type""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),2) AS avg_qty,
        | round(avg(l_extendedprice),2) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_unshipped" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "top_parts_by_revenue" ->
      """SELECT p_partkey, p_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name
        |ORDER BY revenue DESC, p_partkey LIMIT 20""".stripMargin,
    "window_rank_suppliers" ->
      """SELECT s_suppkey, s_name, n_name, revenue,
        | rank() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS rnk
        |FROM (
        |  SELECT s_suppkey, s_name, n_name,
        |   round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY s_suppkey, s_name, n_name)
        |ORDER BY n_name, rnk""".stripMargin,
    "semi_anti_join" ->
      """SELECT c_custkey, c_name,
        | c_custkey IN (SELECT o_custkey FROM orders) AS has_order
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
