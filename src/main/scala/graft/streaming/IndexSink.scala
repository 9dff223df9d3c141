package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IDEMPOTENT per-batch index sink shared by IvfIngest and
  * ResidualIngest (r14 verdict #3 — closing the exactly-once caveat):
  * plain `mode("append").parquet` inside foreachBatch re-appends when
  * a batch replays (the parquet commit is not transactional with the
  * streaming checkpoint), so a crash between sink write and offset
  * commit duplicated index rows. Instead each batch writes its rows
  * under partitions (cell, batch_key) with DYNAMIC partition
  * overwrite: a replayed batch carries the same batch_key and the
  * same deterministic rows (every ingest row depends only on its own
  * input + the frozen models), so it overwrites exactly its own
  * partitions — any partial leftovers from the failed attempt are
  * cells of the same batch and get rewritten. The layout converges to
  * the batch builder's rows no matter how many times a batch fires.
  *
  * batch_key = <checkpoint tag>-<batchId>: the Spark batchId alone is
  * only unique per checkpoint lineage — two ingests (distinct
  * checkpoints) feeding ONE index directory would collide at batch 0
  * and dynamic overwrite would clobber the other stream's rows. The
  * tag (md5 prefix of the checkpoint path — stable across restarts of
  * the same query, distinct across checkpoints) scopes each
  * partition to its lineage.
  *
  * Serving is unchanged: `cell` stays the leading partition column,
  * so the probe equi-join still prunes to probed cells; batch_key is
  * a dead column to every reader. */
object IndexSink {

  /** Stable per-checkpoint lineage tag. */
  def ingestTag(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)

  /** The (cell, batch_key) layout is partition-INCOMPATIBLE with the
    * pre-r15 append sink's flat partitionBy(cell) layout: mixing the
    * two under one directory makes Spark's partition discovery throw
    * "Conflicting directory structures" on the next read, i.e. the
    * index breaks AFTER the write. Detect the legacy layout up front
    * (one O(|cells|) listing — cells are model-sized) and fail
    * loudly: the nightly bulk rebuild owns the migration. */
  private def guardLegacyLayout(spark: org.apache.spark.sql.SparkSession,
                                indexDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      val legacy = fs.listStatus(path)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .exists(cell => fs.listStatus(cell.getPath)
          .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
      require(!legacy,
        s"$indexDir holds a pre-r15 flat partitionBy(cell) index; " +
          "mixing it with the (cell, batch_key) idempotent layout " +
          "breaks partition discovery — rebuild the index (the " +
          "nightly bulk job owns the migration)")
    }
  }

  /** Write one batch's index rows idempotently (exposed for the
    * replay specs): same (rows, batchKey) ⇒ same final layout,
    * however many times it runs, including on top of a partial
    * earlier attempt. */
  def writeBatch(indexRows: DataFrame, indexDir: String,
                 batchKey: String): Unit = {
    guardLegacyLayout(indexRows.sparkSession, indexDir)
    indexRows.withColumn("batch_key", lit(batchKey))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell", "batch_key")
      .parquet(indexDir)
  }
}
