package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Unit checks for the TpchExtra shapes. The oracle gate pins values;
  * these pin the SEMANTIC invariants a hash compare can't explain when
  * it breaks (min-ness of Q2 rows, Q21's only-culprit rule) plus the
  * plan shapes the queries exist to exercise. */
class TpchExtraSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q2: every surviving row carries its part's minimum EUROPE unit price") {
    val rows = TpchExtra.q2MinCostSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    // driver-side recompute of the correlated MIN over the same inputs
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2) * (1 - r.getDouble(3)) / r.getDouble(4)))
    val eu = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val minPerPart = li.filter(t => eu(t._2)).groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    rows.foreach { r =>
      val (pk, up) = (r.getLong(0), r.getDouble(5))
      val want = math.floor(minPerPart(pk) * 10000) / 10000
      assert(up === want, s"part $pk: unit_price $up != floor4(min) $want")
    }
  }

  test("q21: numwait counts exactly the only-late-supplier multi-supplier orders") {
    val got = TpchExtra.q21WaitingSuppliers(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute-force recompute
    val ord = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byOrder = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate").cast("timestamp").cast("long"))
      .collect()
      .flatMap { r =>
        ord.get(r.getLong(0)).map { od =>
          (r.getLong(0), r.getLong(1), r.getLong(2) > od + 60L * 86400)
        }
      }.groupBy(_._1)
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    byOrder.foreach { case (_, lines) =>
      val perSupp = lines.groupBy(_._2).view.mapValues(_.exists(_._3)).toMap
      val lateSupps = perSupp.filter(_._2).keys.toSeq
      if (perSupp.size > 1 && lateSupps.size == 1)
        want(lateSupps.head) += 1
    }
    assert(got === want.toMap.filter(_._2 > 0))
  }

  test("q19: the disjunction's join-independent hulls reach both parquet scans") {
    val plan = TpchExtra.q19DisjunctiveRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    // Catalyst extracts the join-independent disjunction to the part
    // scan (brand/size conjunctions) and the quantity hull to the
    // lineitem scan — if the extraction regresses, both sides scan in
    // full at 100 TB.
    assert(plan.contains("Or(Or(And(EqualTo(p_brand"),
      s"expected the brand/size disjunction pushed to the part scan:\n$plan")
    assert(plan.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"expected the quantity disjunction pushed to the lineitem scan:\n$plan")
  }

  test("q11: exact-cents threshold matches the double-arithmetic share rule") {
    val rows = TpchExtra.q11ImportantParts(spark, dir).collect()
    assert(rows.nonEmpty && rows.length < 200) // strictly a subset of parts
    // exact recompute in BigInt cents
    val cents = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .map(r => r.getLong(0) ->
        BigInt(math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = cents.values.sum
    val want = cents.filter { case (_, c) => c * 180 > total }.keySet
    assert(rows.map(_.getLong(0)).toSet === want)
  }

  test("q12/q15/q16/q20: non-degenerate results with internally consistent counts") {
    val q12 = TpchExtra.q12ShipPriority(spark, dir).collect()
    assert(q12.map(_.getString(0)).toSet === Set("LATE", "ON-TIME"))
    val q15 = TpchExtra.q15TopSupplier(spark, dir).collect()
    assert(q15.nonEmpty)
    assert(q15.map(_.getDouble(2)).distinct.length === 1) // all carry the max
    val q16 = TpchExtra.q16SupplierPartCounts(spark, dir).collect()
    val nSupp = Tables.supplier(spark, dir).count()
    assert(q16.nonEmpty && q16.forall(_.getLong(3) <= nSupp))
    val q20 = TpchExtra.q20PromoSuppliers(spark, dir).collect()
    assert(q20.nonEmpty)
  }
}
