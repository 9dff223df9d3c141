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

  /** COMPACTION (r15 verdict #3) — the operational counterweight to
    * the idempotent layout's one-partition-per-micro-batch accrual:
    * at one batch a minute a cell collects ~1440 `batch_key=`
    * directories a day, a small-files + partition-discovery tax every
    * serving probe and every rebuild pays. This folds all batch_key
    * partitions EXCEPT `excludeBatchKeys` into ONE consolidated
    * `compact-<compactKey>` partition per cell, rewriting into a
    * sibling temp directory and swapping at the directory level.
    *
    * Replay safety — WHY the exclude set exists: a streaming batch
    * can re-fire only if its offset was not yet committed, and its
    * replay overwrites its own (cell, batch_key) partitions. Folding
    * such a batch would move its rows OUT of those partitions, so the
    * replay would land duplicates next to them. The caller passes the
    * possibly-in-flight tail (every batch_key at or past the last
    * committed offset — cheap to read from the checkpoint's commits/
    * dir, or just the newest key per lineage tag); excluded
    * partitions are carried over row-identical under their original
    * batch_key, so a replay after compaction still overwrites exactly
    * its own partitions. (Run compaction against a quiesced or
    * between-batches index — it is the nightly job's step, not a
    * concurrent writer's.)
    *
    * Convergence — every crash window is recoverable by RE-RUNNING
    * the same call: the temp rewrite is deterministic from the index
    * content; the swap is ordered (temp fully written → live moved to
    * trash → temp renamed live → trash deleted) and each rename is a
    * single directory move; on entry a stale temp is discarded and an
    * orphaned trash (crash between the two renames: the one window
    * with no live dir) is restored before proceeding. A previous
    * compaction's `compact-<k'>` partition is itself an ordinary
    * foldable batch, so the nightly run with a fresh key converges
    * the layout to ONE partition per cell regardless of history.
    *
    * Caller contract: `compactKey` is fresh per logical epoch (a date
    * stamp works) — reusing a key only ever re-folds into the same
    * partition (idempotent retry), never corrupts. At real scale set
    * spark.sql.files.maxRecordsPerFile so a fat cell's consolidated
    * partition still splits into scan-parallel files; serving is
    * unchanged (`cell` stays the leading partition column, batch_key
    * stays a dead column to readers). */
  def compact(spark: org.apache.spark.sql.SparkSession, indexDir: String,
              compactKey: String,
              excludeBatchKeys: Set[String] = Set.empty): Unit = {
    require(compactKey.nonEmpty && !compactKey.contains("/"),
      s"compactKey must be a plain token, got '$compactKey'")
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(indexDir)
    val fs = live.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir.compact-tmp")
    val trash = new org.apache.hadoop.fs.Path(s"$indexDir.compact-old")
    // crash recovery: a trash dir with NO live dir is the one window
    // between the two swap renames — restore it; any other leftover
    // temp/trash is stale output from a completed or abandoned run
    if (fs.exists(trash) && !fs.exists(live)) {
      require(fs.rename(trash, live),
        s"compact: could not restore $trash to $live")
    }
    require(fs.exists(live), s"compact: no index at $indexDir")
    guardLegacyLayout(spark, indexDir)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(trash)) fs.delete(trash, true)
    val idx = spark.read.parquet(indexDir)
    val folded = idx
      .withColumn("batch_key",
        when(col("batch_key").isin(excludeBatchKeys.toSeq.map(lit): _*),
          col("batch_key"))
          .otherwise(lit(s"compact-$compactKey")))
      .repartition(col("cell"), col("batch_key"))
    folded.write.mode("overwrite")
      .partitionBy("cell", "batch_key")
      .parquet(tmp.toString)
    require(fs.rename(live, trash),
      s"compact: could not move $live aside")
    require(fs.rename(tmp, live),
      s"compact: could not swap $tmp into $live — the index is at " +
        s"$trash; re-run compact to recover")
    fs.delete(trash, true)
  }
}
