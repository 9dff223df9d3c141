package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.toDoubleArray
import graft.operators.Similarity

/** The native quantizer must match the declarative transform recipe
  * (Similarity.quantizeInt8's storage pass) ELEMENTWISE — that parity
  * is what lets the int8 ANN oracle replicate the whole pipeline in
  * SQL. The declarative form is kept here as the executable spec. */
class Int8QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("native quantizer == declarative transform on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("e"))
    val declarative = emb
      .withColumn("maxabs", array_max(transform(col("e"), x => abs(x))))
      .withColumn("qd", transform(col("e"), x =>
        when(col("maxabs") === 0.0d, lit(0.0d))
          .otherwise(signum(x) *
            floor(abs(x) * lit(127.0d) / col("maxabs") + lit(0.5d)))))
    val both = declarative
      .withColumn("qn", Int8Quantize(col("e")))
    // elementwise compare — -0.0 vs 0.0 must also agree, so compare
    // on equality of the concatenated exact string forms
    val mismatch = both.filter(
      concat_ws(",", col("qd")) =!= concat_ws(",", col("qn"))).count()
    assert(mismatch === 0L)
    // values live in [-127, 127] and hit the extremes
    val flat = both.select(explode(col("qn")).as("v"))
    assert(flat.filter(abs(col("v")) > 127.0).count() === 0L)
    assert(flat.filter(abs(col("v")) === 127.0).count() > 0L)
  }

  test("all-zero vectors quantize to all zeros; null/empty/null-element yield null") {
    val df = Seq(
      (0, Some(Seq[java.lang.Double](0.0, 0.0))),
      (1, None),
      (2, Some(Seq.empty[java.lang.Double])),
      (3, Some(Seq[java.lang.Double](1.0, null))))
      .toDF("id", "e")
    val out = df.orderBy("id").select(Int8Quantize(col("e")).as("q")).collect()
    assert(out(0).getSeq[Double](0) === Seq(0.0, 0.0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("int8 top-k ranking stays close to the exact double ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Long] =
      df.collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val exact = ranks(Similarity.annCosineTopK(emb, 8, 5))
    val quant = ranks(Similarity.annInt8TopK(emb, 8, 5))
    val exactSets = exact.groupBy(_._1._1).view.mapValues(_.values.toSet)
    val quantSets = quant.groupBy(_._1._1).view.mapValues(_.values.toSet)
    val overlaps = exactSets.map { case (q, s) =>
      (s intersect quantSets(q)).size.toDouble / s.size
    }.toSeq
    val mean = overlaps.sum / overlaps.size
    // int8 keeps ~1% relative component error; neighbor sets should
    // overlap strongly (measured 1.0 on this data — pinned well below)
    assert(mean >= 0.7, s"mean top-5 overlap $mean too low")
  }
}
