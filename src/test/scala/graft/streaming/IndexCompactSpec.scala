package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Compaction of the (cell, batch_key) idempotent index layout
  * (r15 verdict #3): serving parity, partition/file-count collapse,
  * replay-after-compaction idempotence, crash-retry convergence, and
  * the fold-a-previous-compaction nightly path. */
class IndexCompactSpec extends SparkSpec {
  import spark.implicits._

  private val quantizer = Seq(
    0L -> Seq(1.0, 0.0, 0.0),
    1L -> Seq(0.0, 1.0, 0.0)).toDF("cid", "ce")

  // three "micro-batches", each touching both cells
  private val batches: Seq[Seq[(Long, Seq[Float])]] = Seq(
    Seq(10L -> Seq(0.9f, 0.1f, 0.0f), 11L -> Seq(0.1f, 0.8f, 0.1f)),
    Seq(12L -> Seq(0.8f, 0.2f, 0.0f), 13L -> Seq(0.2f, 0.9f, 0.0f)),
    Seq(14L -> Seq(0.7f, 0.3f, 0.0f), 15L -> Seq(0.3f, 0.7f, 0.1f)))

  private def rowsOf(b: Seq[(Long, Seq[Float])]) =
    Similarity.ivfInt8IndexRows(b.toDF("vec_id", "embedding"), quantizer)
      .localCheckpoint()

  private def indexSet(dir: String) = spark.read.parquet(dir)
    .select(col("vec_id"), col("cell"), col("scale"),
      concat_ws(",", col("q")).as("qcsv"))
    .as[(Long, Long, Double, String)].collect().toSet

  private def batchKeyDirs(dir: String): Set[String] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(_.getName.startsWith("cell="))
      .flatMap(c => c.listFiles().filter(_.getName.startsWith("batch_key="))
        .map(k => s"${c.getName}/${k.getName}")).toSet
  }

  private def parquetFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  private def buildIndex(dir: String, tag: String = "tagA"): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      IndexSink.writeBatch(rowsOf(b), dir, s"$tag-$i")
    }

  test("compact folds committed batches, keeps the tail, preserves " +
       "every served row, and collapses partitions and files") {
    val dir = Files.createTempDirectory("compact1").toString + "/index"
    buildIndex(dir)
    val before = indexSet(dir)
    val dirsBefore = batchKeyDirs(dir)
    assert(dirsBefore.size === 6, "3 batches x 2 cells before compaction")
    val filesBefore = parquetFileCount(dir)

    // tagA-2 is the possibly-in-flight tail: excluded
    IndexSink.compact(spark, dir, "d1", excludeBatchKeys = Set("tagA-2"))

    assert(indexSet(dir) === before, "serving parity: same rows")
    val dirsAfter = batchKeyDirs(dir)
    assert(dirsAfter === Set(
      "cell=0/batch_key=compact-d1", "cell=1/batch_key=compact-d1",
      "cell=0/batch_key=tagA-2", "cell=1/batch_key=tagA-2"))
    assert(parquetFileCount(dir) < filesBefore,
      "consolidation must shrink the file count")

    // the serving path reads the compacted layout unchanged
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("query_id", "e")
    val served = Similarity.annIvfTopKFromIndex(
      spark.read.parquet(dir), queries, quantizer, nProbe = 1, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(served.nonEmpty && served.subsetOf(Set(10L, 12L, 14L)),
      s"cell-0 probe must serve cell-0 vectors, got $served")
  }

  test("a replayed tail batch after compaction still lands " +
       "idempotently; re-running the same compaction converges") {
    val dir = Files.createTempDirectory("compact2").toString + "/index"
    buildIndex(dir)
    val before = indexSet(dir)
    IndexSink.compact(spark, dir, "d1", excludeBatchKeys = Set("tagA-2"))

    // the tail batch re-fires (crash before its offset committed):
    // same rows, same key — must overwrite its own partitions only
    IndexSink.writeBatch(rowsOf(batches(2)), dir, "tagA-2")
    assert(indexSet(dir) === before, "replay after compaction is a no-op")
    assert(spark.read.parquet(dir).count() === 6L, "no duplicate rows")

    // crash-retry: the same compact call converges to the same layout
    val dirsOnce = batchKeyDirs(dir)
    IndexSink.compact(spark, dir, "d1", excludeBatchKeys = Set("tagA-2"))
    assert(indexSet(dir) === before)
    assert(batchKeyDirs(dir) === dirsOnce)
  }

  test("the nightly pass folds a previous compaction into one " +
       "partition per cell; orphaned trash from a mid-swap crash " +
       "is restored") {
    val dir = Files.createTempDirectory("compact3").toString + "/index"
    buildIndex(dir)
    val before = indexSet(dir)
    IndexSink.compact(spark, dir, "d1", excludeBatchKeys = Set("tagA-2"))

    // next epoch: nothing in flight; fold EVERYTHING, compact-d1 too
    IndexSink.compact(spark, dir, "d2")
    assert(indexSet(dir) === before)
    assert(batchKeyDirs(dir) === Set(
      "cell=0/batch_key=compact-d2", "cell=1/batch_key=compact-d2"))

    // simulate the one no-live-dir crash window: live moved to trash,
    // temp never swapped in — the next run must restore and proceed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.compact-old")))
    IndexSink.compact(spark, dir, "d3")
    assert(indexSet(dir) === before, "recovery then compaction")
    assert(batchKeyDirs(dir) === Set(
      "cell=0/batch_key=compact-d3", "cell=1/batch_key=compact-d3"))
  }
}
