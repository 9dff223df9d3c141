package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Trigger.AvailableNow incremental ingest — the production shape of
  * a nightly delta job: each run processes exactly the files that
  * arrived since the last checkpoint, runs the SAME operator code the
  * batch path uses (unified batch/stream), writes a fault-tolerant
  * sink, and self-terminates. File-tracking state lives in the
  * checkpoint, so "which inputs are done" is the engine's exactly-once
  * bookkeeping, not hand-rolled manifest diffing. */
class AvailableNowIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(
    StructField("doc_id", LongType) :: StructField("text", StringType) :: Nil)

  test("each AvailableNow run processes only files new since the checkpoint") {
    val src = Files.createTempDirectory("graft_an_src").toString
    val out = Files.createTempDirectory("graft_an_out").toString
    val ckpt = Files.createTempDirectory("graft_an_ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = TextAnalysis.tokenCount(stream) // the BATCH operator, unchanged
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    val first = spark.read.parquet(out).select("doc_id", "ws_tokens")
      .as[(Long, Int)].collect().toSet
    assert(first === Set((1L, 3), (2L, 2)))

    Seq((3L, "f g h i")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    val second = spark.read.parquet(out).select("doc_id", "ws_tokens")
      .as[(Long, Int)].collect().toSet
    // doc 3 ingested exactly once; docs 1-2 NOT reprocessed (no dup rows)
    assert(second === Set((1L, 3), (2L, 2), (3L, 4)))
    assert(spark.read.parquet(out).count() === 3)
  }
}
