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
}
