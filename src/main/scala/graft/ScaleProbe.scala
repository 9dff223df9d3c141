package graft

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe for the dedup/similarity family: replicates the
  * sf0.1 corpus F-fold WITHOUT creating cross-copy near-duplicates, so
  * the expected output grows linearly and any super-linear runtime or
  * candidate blowup is an algorithmic cliff, not a data artifact.
  *
  * - documents: every token in copy c is prefixed `c<c>_`, making the
  *   shingle spaces of different copies disjoint — near-dup structure
  *   within a copy is preserved verbatim, across copies nothing pairs.
  * - embeddings: copy c multiplies each vector elementwise by a
  *   deterministic ±1 pattern. Sign flips cancel inside a same-copy
  *   dot product ((s⊙a)·(s⊙b) = a·b), so within-copy cosines are
  *   bit-identical to the originals, while cross-copy cosines scatter
  *   toward 0 (different patterns don't cancel).
  *
  * Usage: `sbt "runMain graft.ScaleProbe [factors...]"` (default
  * 1 4 16). Writes replicas under /tmp/graft_scale_f<F>/ and prints
  * one line per (factor, query): seconds + output rows.
  */
object ScaleProbe {
  private val srcDir = "/root/testdata/sf0.1"

  private def signPattern(copy: Int, dim: Int): Seq[Float] = {
    val md = MessageDigest.getInstance("MD5")
    Seq.tabulate(dim) { d =>
      val b = md.digest(s"sign#$copy#$d".getBytes("UTF-8"))(0)
      if ((b & 1) == 0) 1.0f else -1.0f
    }
  }

  private def replicate(spark: SparkSession, factor: Int): String = {
    val out = s"/tmp/graft_scale_f$factor"
    if (new java.io.File(s"$out/_done").exists()) return out
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docCopies = (0 until factor).map { c =>
      docs.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(^| )", s"$$1c${c}_").as("text"),
        col("lang"))
    }.reduce(_ unionByName _)
    docCopies.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val embCopies = (0 until factor).map { c =>
      val signs = array(signPattern(c, 64).map(lit): _*)
      emb.select(
        (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        zip_with(col("embedding"), signs, (x, s) => x * s).as("embedding"))
    }.reduce(_ unionByName _)
    embCopies.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    new java.io.File(s"$out/_done").createNewFile()
    out
  }

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dedup_ngram_jaccard" -> (operators.Dedup.ngramJaccardQuery _),
      "dedup_minhash_lsh"   -> (operators.Dedup.minhashLshQuery _),
      "dedup_simhash"       -> (operators.Dedup.simhashQuery _),
      "embed_cosine_neardup" -> (operators.Similarity.cosineNearDupQuery _),
      "curation_summary"    -> (operators.TextAnalysis.curationSummaryQuery _))

    factors.foreach { f =>
      val dir = replicate(spark, f)
      probes.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] factor=$f%-3d $name%-22s ${sec}%8.2fs rows=$rows")
      }
    }
    spark.stop()
  }
}
