package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

/** The native expression must be BIT-identical to the declarative fold
  * (dot/l2norm) — that equivalence is what lets the DuckDB oracle keep
  * checking operators that use the codegen'd path. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd cosine == declarative fold cosine, bit-exact, on real vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("e"))
    val a = emb.toDF("ia", "ea")
    val b = emb.toDF("ib", "eb")
    val pairs = a.join(b, a("ia") < b("ib") && a("ia") < 40)
      .select(
        CosineSimilarity(col("ea"), col("eb")).as("native"),
        (dot(col("ea"), col("eb")) / (l2norm(col("ea")) * l2norm(col("eb"))))
          .as("folded"))
    val diff = pairs.filter(col("native") =!= col("folded")).count()
    assert(diff === 0L)
  }

  test("null array, ragged lengths, and null ELEMENTS propagate null; never a truncated cosine") {
    val df = Seq(
      (Some(Seq[java.lang.Double](1.0, 0.0)), Some(Seq[java.lang.Double](1.0, 0.0))),
      (None, Some(Seq[java.lang.Double](1.0, 0.0))),
      (Some(Seq[java.lang.Double](1.0, 0.0, 5.0)), Some(Seq[java.lang.Double](1.0, 0.0))), // ragged
      (Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](1.0, 0.0)))) // null element
      .toDF("a", "b")
    val out = df.select(CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(1.0), None, None, None))
  }

  test("ragged lengths null the result even on NON-nullable inputs " +
      "(nullable must be true or codegen emits `false = true;`)") {
    // literal arrays: the one construction Catalyst types non-nullable
    val df = spark.range(2).select(
      when(col("id") === 0, array(lit(1.0), lit(0.0), lit(5.0)))
        .otherwise(array(lit(2.0), lit(0.0))).as("a"), // row 0 ragged
      array(lit(2.0), lit(0.0)).as("b"))
    assert(df.schema.forall(!_.nullable), "precondition: inputs non-nullable")
    val proj = df.select(CosineSimilarity(col("a"), col("b")).as("c"))
    assert(proj.schema("c").nullable,
      "expression must declare nullable: ragged inputs can null the result")
    val out = proj.collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSet === Set(None, Some(1.0)))
  }
}
