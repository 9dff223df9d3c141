package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Cdc

/** Streaming CDC apply rehearsal: delta files arrive, each
  * Trigger.AvailableNow run applies them to the CURRENT snapshot via
  * the batch `Cdc.applyDelta` in foreachBatch and persists the next
  * snapshot version — the nightly MERGE loop of a 100 TB warehouse.
  * Asserts (a) the chained streamed applies are row-identical to batch
  * applies of the deltas in order, (b) an idle re-run (checkpoint has
  * seen every file) emits NO new version — the engine's exactly-once
  * file tracking doing the idempotency bookkeeping.
  */
class MergeStreamRehearsalSpec extends SparkSpec {
  import spark.implicits._

  test("chained AvailableNow delta applies == batch applies, idle run is a no-op") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val delta1 = Seq((2L, "upsert", "TWO"), (3L, "delete", ""))
    val delta2 = Seq((2L, "delete", ""), (5L, "upsert", "five"))

    val src = Files.createTempDirectory("graft_merge_src").toString
    val snaps = Files.createTempDirectory("graft_merge_snap").toString
    val ckpt = Files.createTempDirectory("graft_merge_ckpt").toString

    base.write.parquet(s"$snaps/v0")
    var version = 0

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, op STRING, text STRING").parquet(src)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val cur = spark.read.parquet(s"$snaps/v$version")
          // src is a per-apply provenance tag, not part of the snapshot
          Cdc.applyDelta(cur, batch).drop("src")
            .write.parquet(s"$snaps/v${version + 1}")
          version += 1
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def snap(v: Int): Seq[(Long, String)] =
      spark.read.parquet(s"$snaps/v$v")
        .as[(Long, String)].collect().toSeq.sorted

    delta1.toDF("doc_id", "op", "text").write.mode("append").parquet(src)
    runOnce()
    assert(version === 1)
    assert(snap(1) === Seq((1L, "one"), (2L, "TWO"), (4L, "four")))

    delta2.toDF("doc_id", "op", "text").write.mode("append").parquet(src)
    runOnce()
    assert(version === 2)
    assert(snap(2) === Seq((1L, "one"), (4L, "four"), (5L, "five")))

    // nothing new: the checkpoint has consumed every file; a rerun
    // must not apply anything twice (deletes of absent keys would be
    // silent no-ops, but a re-applied upsert-then-delete would not)
    runOnce()
    assert(version === 2, "idle AvailableNow run re-applied a delta")

    // cross-check: the streamed chain equals one batch chain
    val batchChain = Cdc.applyDelta(
        Cdc.applyDelta(base, delta1.toDF("doc_id", "op", "text")).drop("src"),
        delta2.toDF("doc_id", "op", "text"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(snap(2) === batchChain)
  }
}
