package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

/** The native bucket expression must be BIT-identical to the
  * declarative HOF form it replaced (per-plane aggregate/transform
  * fold + when(>0) bit sum) — that equivalence is what keeps the
  * embedded DuckDB LSH oracle valid for the codegen'd path. */
class HyperplaneBucketSpec extends SparkSpec {
  import spark.implicits._

  /** The OLD interpreted form, kept here verbatim as the executable
    * specification of the fold order the native loop must reproduce. */
  private def foldedBucket(e: org.apache.spark.sql.Column,
                           planes: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val lits = array(plane.map(lit): _*)
      val dot = aggregate(
        transform(e, (x, i) => x * element_at(lits, i + 1)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  private def testPlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes, dim)((p, d) =>
      math.sin(p * 131.0 + d * 7.0)) // deterministic, sign-balanced

  test("native bucket == interpreted fold bucket on real embeddings") {
    val planes = testPlanes(6, 64)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("e"))
    val diff = emb.select(
        HyperplaneBucket(col("e"), planes).as("native"),
        foldedBucket(col("e"), planes).as("folded"))
      .filter(col("native") =!= col("folded")).count()
    assert(diff === 0L)
    // and buckets actually spread (the expression isn't constant)
    val distinct = emb.select(HyperplaneBucket(col("e"), planes)).distinct().count()
    assert(distinct > 1L)
  }

  test("null array, dimension mismatch, and null ELEMENTS yield null, never bucket 0") {
    val planes = Seq(Seq(1.0, -1.0))
    val df = Seq(
      (0, Some(Seq[java.lang.Double](2.0, 1.0))),  // dot 1 > 0 → bit 0 set
      (1, Some(Seq[java.lang.Double](1.0, 2.0))),  // dot -1 → bucket 0
      (2, None),                                   // null array
      (3, Some(Seq[java.lang.Double](1.0, 2.0, 3.0))), // dim mismatch
      (4, Some(Seq[java.lang.Double](1.0, null)))) // null element
      .toDF("id", "e")
    val out = df.orderBy("id")
      .select(HyperplaneBucket(col("e"), planes).as("b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq === Seq(Some(1), Some(0), None, None, None))
  }

  test("mismatch nulls the result on NON-nullable input (nullable must be true)") {
    val planes = Seq(Seq(1.0, 1.0))
    val df = spark.range(2).select(
      when(col("id") === 0, array(lit(1.0), lit(1.0), lit(1.0)))
        .otherwise(array(lit(1.0), lit(1.0))).as("e"))
    assert(df.schema.forall(!_.nullable), "precondition: input non-nullable")
    val proj = df.select(HyperplaneBucket(col("e"), planes).as("b"))
    assert(proj.schema("b").nullable,
      "expression must declare nullable: dim mismatch can null the result")
    val out = proj.collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSet === Set(None, Some(1)))
  }

  test("plane matrix preconditions are rejected eagerly") {
    intercept[IllegalArgumentException] {
      HyperplaneBucket(col("e"), Seq.empty[Seq[Double]])
    }
    intercept[IllegalArgumentException] {
      HyperplaneBucket(col("e"), Seq(Seq(1.0, 2.0), Seq(1.0)))
    }
    intercept[IllegalArgumentException] {
      HyperplaneBucket(col("e"), Seq.fill(32)(Seq(1.0)))
    }
  }
}
