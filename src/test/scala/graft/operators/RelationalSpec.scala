package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit-level checks for the relational reshape pair (the oracle gate
  * covers the full queries; this pins the wide↔long inverse property). */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  test("unpivotSegmentRevenue: full grid, and re-pivoting restores the wide frame exactly") {
    val wide = Relational.pivotSegmentRevenue(spark, dir)
    val long = Relational.unpivotSegmentRevenue(spark, dir)
    val nNations = wide.count()
    assert(long.count() === nNations * segments.length) // na.fill(0) ⇒ no dropped cells
    // unpivot is pivot's exact inverse on this frame
    val roundTrip = long.groupBy("n_name")
      .pivot("segment", segments)
      .agg(first(col("revenue")))
      .orderBy("n_name")
    assert(roundTrip.columns.toSeq === wide.columns.toSeq)
    assert(roundTrip.collect().toSeq === wide.orderBy("n_name").collect().toSeq)
  }

  test("valuePercentilesApprox: sketch quantiles land within rank tolerance of exact") {
    import graft.core.Tables
    val events = Tables.events(spark, dir)
    val values = events.select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Relational.valuePercentilesApprox(events)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.nonEmpty)
    val qs = Seq(0.5, 0.9, 0.95, 0.99)
    approx.foreach { case (et, ps) =>
      val sorted = values(et)
      qs.zip(ps).foreach { case (q, p) =>
        // rank of the sketch's answer must sit within 2% of the target
        val rank = sorted.count(_ <= p).toDouble / sorted.length
        assert(math.abs(rank - q) <= 0.02,
          s"$et q=$q: approx=$p has rank $rank")
      }
    }
  }

  test("q13 distribution covers every customer; zero-order semantics pinned on a crafted frame") {
    // real data: every customer lands in exactly one k-bucket
    val out = Relational.q13CustomerDistribution(spark, dir).collect()
    val total = out.map(_.getLong(1)).sum
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(total === nCust)
    // sf0.001 has no zero-order customer, so pin the k = 0 semantics
    // (join-condition filter, NOT a WHERE) via driver-side recompute:
    // a WHERE-placed status filter would shrink `total` below nCust
    // AND delete the only-'P'-orders customers from the distribution.
    import graft.core.Tables
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") =!= "P")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custs = Tables.customer(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0))
    val expected = custs.map(k => perCust.getOrElse(k, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("q22 integer-cents threshold selects exactly the above-average dormant customers") {
    import graft.core.Tables
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val active = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    // exact driver-side recompute: BigInt cents, no floating point
    val cents = cust.map { case (k, b) => (k, BigInt(math.round(b * 100))) }
    val pos = cents.filter(_._2 > 0)
    val (tot, n) = (pos.map(_._2).sum, BigInt(pos.length))
    val expected = cents
      .filter { case (k, c) => c * n > tot && !active(k) }
      .map(_._1).toSet
    assert(expected.nonEmpty, "probe data must exercise the predicate")
    val got = Relational.q22GlobalSales(spark, dir).collect()
    assert(got.map(_.getLong(1)).sum === expected.size.toLong,
      "numcust total must equal the exact-arithmetic recompute")
  }
}
