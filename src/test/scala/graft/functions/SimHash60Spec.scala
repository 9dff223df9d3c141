package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** The native in-row fingerprint must be BIT-identical to the r5
  * aggregate form it replaced (explode → hash60 → 60 conditional-sum
  * aggregates → majority bits) — that equivalence carries the 4×15
  * pigeonhole recall guarantee over to the map-only path. The old
  * form is kept here verbatim as the executable specification. */
class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  /** The OLD r5 aggregate fingerprint: (doc_id, fp). */
  private def aggregateFp(docSets: DataFrame): DataFrame = {
    val bitsN = 60
    val h = docSets
      .select(col("doc_id"), explode(col("sset")).as("s"))
      .select(col("doc_id"), hash60(col("s")).as("hv"))
    val bitSums = (0 until bitsN).map { b =>
      sum(when(shiftright(col("hv"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"c$b")
    }
    h.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until bitsN).map(b =>
          when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp_old"))
  }

  test("native fingerprint == aggregate fingerprint on real documents") {
    val docSets = Dedup.docShingleSets(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 3)
    val native = docSets.select(col("doc_id"), SimHash60(col("sset")).as("fp"))
    val joined = native.join(aggregateFp(docSets), "doc_id")
    assert(joined.count() === docSets.count(), "row sets must match")
    assert(joined.filter(col("fp") =!= col("fp_old")).count() === 0L)
    // fingerprints actually spread (the expression isn't constant)
    assert(native.select("fp").distinct().count() > 1L)
  }

  test("tie votes produce a 0 bit (even-sized disagreeing sets)") {
    // two shingles → every bit's vote is +2, 0, or -2; ties MUST be 0
    // exactly like the aggregate's when(c > 0). Parity on a crafted
    // frame where ties are guaranteed to occur in some bit.
    val docSets = Dedup.docShingleSets(
      Seq((1L, "a b c x y z"), (2L, "p q r s t u v w")).toDF("doc_id", "text"), 3)
    val native = docSets.select(col("doc_id"), SimHash60(col("sset")).as("fp"))
    val joined = native.join(aggregateFp(docSets), "doc_id")
    assert(joined.filter(col("fp") =!= col("fp_old")).count() === 0L)
  }

  test("null array, empty array, and null ELEMENTS yield null") {
    val df = Seq(
      (0, Some(Seq[String]("a", "b"))),
      (1, None),
      (2, Some(Seq.empty[String])),
      (3, Some(Seq[String]("a", null))))
      .toDF("id", "sset")
    val out = df.orderBy("id")
      .select(SimHash60(col("sset")).as("fp")).collect()
      .map(r => !r.isNullAt(0))
    assert(out.toSeq === Seq(true, false, false, false))
  }

  test("fingerprint is always in [0, 2^60) and column is nullable") {
    val docSets = Dedup.docShingleSets(
      Seq((1L, "a b c d"), (2L, "e f g h i")).toDF("doc_id", "text"), 3)
    val proj = docSets.select(SimHash60(col("sset")).as("fp"))
    assert(proj.schema("fp").nullable)
    val fps = proj.collect().map(_.getLong(0))
    assert(fps.forall(fp => fp >= 0L && fp < (1L << 60)))
  }

  test("non-array input is rejected") {
    val bad = Seq((1L, 2.0)).toDF("doc_id", "v")
    intercept[Exception] {
      bad.select(SimHash60(col("v"))).collect()
    }
  }
}
