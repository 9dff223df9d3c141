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
}
