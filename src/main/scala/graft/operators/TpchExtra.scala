package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The remaining 11 TPC-H query shapes (Q2, Q8, Q9, Q11, Q12, Q14,
  * Q15, Q16, Q19, Q20, Q21) — with Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q13/Q17/Q18/
  * Q22 in [[Relational]], every one of the 22 TPC-H query SHAPES is
  * now represented by an oracle-checked query.
  *
  * "Shape" because the driver's synthetic schema has no partsupp table
  * and lineitem carries no shipmode/commitdate/receiptdate — queries
  * that reference them are re-expressed over the available columns with
  * the SAME plan shape (correlated MIN join-back, scalar-threshold
  * HAVING, disjunctive pushdown, nested semi-join chain, …), exactly as
  * Relational did for Q4's lateness predicate and Q22's recency scope.
  *
  * Oracle-parity rules follow Relational: every double aggregate is
  * rounded; threshold comparisons against aggregates run in EXACT
  * integer cents where the predicate could flip on summation order
  * (Q11); per-row derived doubles (Q2's unit price) are safe to compare
  * exactly because both engines evaluate the identical IEEE expression
  * per row, and MIN is accumulation-order-independent.
  */
object TpchExtra {

  private def euSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
  }

  /** TPC-H Q2 shape (minimum-cost supplier): for each PROMO part, the
    * EUROPE supplier(s) selling it at the minimum unit price. (No
    * partsupp table — the part-supplier cost relation is derived from
    * lineitem: unit price = extendedprice·(1−discount)/quantity.)
    *
    * Scale shape: the correlated MIN subquery is decorrelated by hand
    * the way Catalyst decorrelates Q17 — a per-part min aggregate
    * joined back on the SAME key the offer frame already shuffles on
    * (one exchange, reused by both the aggregate and the join; AQE
    * broadcasts the min frame when it measures small). The region
    * filter semi-reduces lineitem through the supplier join BEFORE any
    * per-part work; the part-type filter prunes the other side. MIN
    * over doubles is accumulation-order-independent, so the
    * equality probe `up = min_up` is exact cross-engine. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eu = euSuppliers(spark, dir)
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_name"))
    val offers = Tables.lineitem(spark, dir)
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .withColumn("up",
        col("l_extendedprice") * (lit(1) - col("l_discount")) / col("l_quantity"))
    val minUp = offers.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("up")).as("min_up"))
    // floor-truncate to 4 decimals rather than round: decimal HALF_UP on
    // a double near the .5 boundary differs between engines (Spark goes
    // through BigDecimal, DuckDB through scaled fp), while floor of the
    // identical double is bit-deterministic. Observed at sf0.01.
    offers.join(minUp, col("l_partkey") === col("mk") && col("up") === col("min_up"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("s_acctbal"), (floor(col("up") * 10000) / 10000).as("unit_price"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  /** TPC-H Q8 shape (national market share): EUROPE-supplier share of
    * PROMO-part revenue sold to ASIA customers, per order year.
    *
    * Scale shape: both dim-side filters (part type, customer region)
    * semi-reduce the fact frame BEFORE the supplier attribute join;
    * the share is a conditional aggregate over ONE reduced frame — one
    * scan, one shuffle to the year grouping. Numerator and denominator
    * are rounded independently, then divided once (IEEE-exact on the
    * rounded values), so summation-order noise can't flip the hash. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val asiaReg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val asiaCust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(asiaReg), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val supRegion = Tables.supplier(spark, dir)
      .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region"))
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .join(supRegion, col("l_suppkey") === col("s_suppkey"))
      .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy(col("o_year"))
      .agg(
        round(sum(when(col("supp_region") === "EUROPE", col("rev")).otherwise(lit(0.0))), 2)
          .as("eu_revenue"),
        round(sum(col("rev")), 2).as("total_revenue"))
      .withColumn("mkt_share",
        floor(col("eu_revenue") / col("total_revenue") * 10000) / 10000)
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape (product-type profit): profit by supplier nation
    * and order year over name-matched parts. (No ps_supplycost — the
    * cost term is re-expressed as 10% of retail price × quantity, the
    * same per-row join-the-part-attribute-then-subtract arithmetic.)
    *
    * Scale shape: the LIKE filter prunes part first (it cannot push to
    * a parquet min/max but DOES semi-reduce the fact join); the profit
    * expression is computed per row in the join stage and map-side
    * combined into the (nation, year) grouping — the grouping frame is
    * bounded by nations × years regardless of SF.
    *
    * The profit sum runs in EXACT integer cents: the per-row amount is
    * rounded to cents once (deterministic — both engines evaluate the
    * identical IEEE expression on the same row), and the group sum of
    * longs is exact in any accumulation order. A double sum rounded at
    * the end flipped the last cent between engines at sf0.001. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val widgetParts = Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(widgetParts, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .withColumn("amount_cents",
        round((col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.1)) * 100, 0).cast("long"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(round(sum(col("amount_cents")) / 100.0, 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important stock): parts whose revenue exceeds a
    * fixed fraction of CORPUS-WIDE revenue — the group-vs-global scalar
    * threshold. (partsupp value → lineitem discounted revenue.)
    *
    * The predicate `part_share > 1/180` is evaluated in EXACT integer
    * cents (`cents·180 > total_cents`) — same law as Q22: a double
    * global sum is partition-merge-order nondeterministic, and a
    * threshold predicate on it could flip membership between engines.
    * Per-row cents are exact (2-decimal prices), per-part and global
    * sums of longs are exact in any order. Overflow headroom: 1e7
    * cents/row × 180 needs ~5e15 rows to reach 2^63.
    *
    * Scale shape: ONE shuffle builds the per-part cents; the global
    * total is a scalar second-stage reduce of the per-part frame (not
    * a rescan), broadcast back as one row. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .withColumn("cents",
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0).cast("long"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("cents"))
    val total = perPart.agg(sum(col("cents")).as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("cents") * 180 > col("total_cents"))
      .select(col("l_partkey"),
        round(col("cents") / 100.0, 2).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape (shipping modes / priority): line counts by
    * lateness class and priority class in one ship year. (No
    * l_shipmode/commitdate/receiptdate — the class is derived from the
    * ship-vs-order-date gap, same CASE-aggregation-over-a-join shape.)
    *
    * Scale shape: the ship-year filter pushes to the lineitem scan;
    * the join carries only (orderkey, priority); the CASE sums are
    * map-side combined into a 2-row result. */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_class",
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), "LATE")
          .otherwise("ON-TIME"))
      .groupBy(col("ship_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  /** TPC-H Q14 shape (promotion effect): PROMO-part share of one
    * month's revenue. Numerator and denominator rounded independently
    * before the single division — the only fp ops after the rounds are
    * one multiply and one divide, bit-identical cross-engine. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .agg(
        round(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        round(sum(col("rev")), 2).as("total_revenue"))
      .withColumn("promo_share",
        floor(lit(100.0) * col("promo_revenue") / col("total_revenue") * 10000) / 10000)
  }

  /** TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    * quarterly revenue — the view + scalar MAX + equality join-back.
    *
    * Scale shape: per-supplier revenue is ONE map-side-combined
    * shuffle; the max is a scalar reduce of that frame broadcast back
    * (bytes, not rows); the name lookup joins only the winner row(s).
    * The equality probes ROUNDED revenue on both sides, so the
    * comparison is on stable values. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    * counts per (brand, type, size) over a size IN-list, excluding
    * brand Brand#1 and "complaint" suppliers (negative-ish balance
    * stands in for the comment LIKE — same NOT-IN anti-join shape).
    *
    * Scale shape: the excluded-supplier set is a broadcast left_anti
    * (it is a filtered dim, bounded); countDistinct lowers to a
    * two-phase Expand aggregate — no per-group set materialized. */
  def q16SupplierPartCounts(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaintSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 2000.0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaintSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    * OR of three (brand, quantity-band, size-band) conjunctions across
    * the part join.
    *
    * Scale shape: Catalyst extracts the join-independent disjuncts —
    * `l_quantity <= 40` (the hull of the quantity bands) pushes to the
    * lineitem scan and the brand/size hull to the part scan — while
    * the full disjunction evaluates on the joined row. The shape
    * exists to keep THAT extraction honest: a regression leaves a
    * full-table scan on both sides. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15) &&
          col("p_size").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25) &&
          col("p_size").between(1, 30)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 40) &&
          col("p_size").between(1, 40)))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20 shape (potential part promotion): EUROPE suppliers who
    * moved more than 330 units of PROMO parts in 1997 — the nested
    * aggregate-threshold semi-join chain (inner correlated subquery →
    * per-supplier aggregate filtered on the threshold → semi-join).
    *
    * Scale shape: the aggregate-then-filter runs on the fact side
    * FIRST (one shuffle keyed on l_suppkey, map-side combined), so the
    * semi-join probes a frame already reduced to qualifying suppliers;
    * the region scope is a broadcast dim filter. Quantities are small
    * integers in doubles — exact in any accumulation order. */
  def q20PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_quantity")), 2).as("promo_qty"))
      .filter(col("promo_qty") > 330.0)
    euSuppliers(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    * orders with ≥2 distinct suppliers where EXACTLY ONE supplier
    * shipped late, count the offending orders per supplier. (Lateness
    * = shipped > 60 days after order date, as in Q4.)
    *
    * The real Q21 is EXISTS(other supplier) AND NOT EXISTS(other LATE
    * supplier) — two correlated self-joins on lineitem. Re-expressed
    * as aggregates: ONE pass builds per-(order, supplier) lateness,
    * a second map-side-combined aggregate per order counts suppliers
    * and late suppliers, and the "only culprit" predicate becomes
    * `n_supp > 1 AND n_late = 1` joined back to the late rows — two
    * shuffles total instead of two extra lineitem scans + joins; the
    * per-order frame it joins back to is orderkey-partitioned on both
    * sides (exchange reused).
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val perOrderSupp = Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        1L).otherwise(0L)).as("late"))
    val perOrder = perOrderSupp.groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
    perOrderSupp.filter(col("late") === 1)
      .join(perOrder, col("l_orderkey") === col("ok") &&
        col("n_supp") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offers AS (
        |  SELECT l_partkey, p_name, s_name, n_name, s_acctbal,
        |         l_extendedprice * (1 - l_discount) / l_quantity AS up
        |  FROM lineitem
        |  JOIN eu ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'),
        |mn AS (SELECT l_partkey AS mk, min(up) AS min_up FROM offers GROUP BY 1)
        |SELECT DISTINCT l_partkey AS p_partkey, p_name, s_name, n_name, s_acctbal,
        |       floor(up * 10000) / 10000 AS unit_price
        |FROM offers JOIN mn ON l_partkey = mk AND up = min_up
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CASE WHEN sr.r_name = 'EUROPE'
        |                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
        |    AS eu_revenue,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
        |  floor(round(sum(CASE WHEN sr.r_name = 'EUROPE'
        |                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
        |        / round(sum(l_extendedprice * (1 - l_discount)), 2) * 10000) / 10000
        |    AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |WHERE cr.r_name = 'ASIA' AND p_type = 'PROMO'
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CAST(round((l_extendedprice * (1 - l_discount)
        |            - p_retailprice * l_quantity * 0.1) * 100, 0) AS BIGINT))
        |        / 100.0, 2) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH pc AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
        |                       AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM pc)
        |SELECT l_partkey, round(cents / 100.0, 2) AS value
        |FROM pc, tot
        |WHERE cents * 180 > total_cents
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_ship_priority" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |            THEN 'LATE' ELSE 'ON-TIME' END AS ship_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY ship_class""".stripMargin,
    "q14_promo_revenue" ->
      """WITH agg AS (
        |  SELECT round(sum(CASE WHEN p_type = 'PROMO'
        |                   THEN l_extendedprice * (1 - l_discount)
        |                   ELSE 0.0 END), 2) AS promo_revenue,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT promo_revenue, total_revenue,
        |       floor(100.0 * promo_revenue / total_revenue * 10000) / 10000
        |         AS promo_share
        |FROM agg""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
        |  AND l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15
        |       AND p_size BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25
        |       AND p_size BETWEEN 1 AND 30)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40
        |       AND p_size BETWEEN 1 AND 40)""".stripMargin,
    "q20_promo_suppliers" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_type = 'PROMO'
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_suppkey
        |    HAVING round(sum(l_quantity), 2) > 330.0)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |                  THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |po AS (SELECT l_orderkey AS ok, count(*) AS n_supp,
        |              sum(late) AS n_late
        |       FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM ps
        |JOIN po ON l_orderkey = ok AND n_supp > 1 AND n_late = 1
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin
  )
}
