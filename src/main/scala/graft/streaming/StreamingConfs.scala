package graft.streaming

/** Production streaming configuration, applied per-session.
  *
  * The default HDFS-backed state store keeps every key in executor
  * heap — fine for tests, an OOM at 100 TB-scale state (billions of
  * dedup keys / window groups). RocksDB spills state to local disk,
  * and changelog checkpointing uploads per-batch deltas instead of
  * full snapshots, keeping commit time independent of total state
  * size.
  */
object StreamingConfs {

  /** RocksDB state store conf. `maxMemoryMB` bounds the shared
    * write-buffer + block-cache budget across ALL RocksDB instances on
    * an executor — size it to the executor's off-heap headroom (the
    * Spark default when bounded is only 500 MB, which thrashes on
    * large state; that's why it's a required argument here). */
  def rocksDbStateStore(maxMemoryMB: Long): Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // deltas, not full snapshots, per commit
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> maxMemoryMB.toString)

  /** Apply to an existing session (picked up by queries started after
    * the set; running queries keep their provider). */
  def applyRocksDb(spark: org.apache.spark.sql.SparkSession,
                   maxMemoryMB: Long = 1024): Unit =
    rocksDbStateStore(maxMemoryMB).foreach { case (k, v) => spark.conf.set(k, v) }
}
