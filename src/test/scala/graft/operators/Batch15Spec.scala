package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-15 specs: the raw-scale centroid guard at the public
  * residual-index boundaries (r14 ADVICE #1). */
class Batch15Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("residualSeedCodebookOf / residualPqIndexRows fail LOUDLY on " +
      "micro-valued (trained-style) centroids instead of encoding junk") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    // trainIvfCentroidsExact output convention: micro-valued doubles
    val microCents = Similarity.defaultCentroids(emb, 4)
      .select(col("cid"),
        transform(col("ce"), x => round(x * lit(1000000.0d))).as("ce"))
    def mustFail(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ex = intercept[Exception] { f.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("MICRO-valued")),
        s"expected the raw-scale guard message, got: $ex")
    }
    mustFail(Similarity.residualSeedCodebookOf(emb, microCents))
    mustFail(Similarity.residualPqIndexRows(emb, microCents))
    mustFail(Similarity.residualPqIndexRowsWith(emb, microCents,
      Similarity.residualSeedCodebookOf(emb,
        Similarity.defaultCentroids(emb, 4))))
    // raw-scale centroids still pass through untouched
    val ok = Similarity.residualSeedCodebookOf(emb,
      Similarity.defaultCentroids(emb, 4), numCodes = 4)
    assert(ok.count() > 0)
  }
}
