package graft.streaming

/** Production streaming configuration, applied per-session.
  *
  * The default HDFS-backed state store keeps every key in executor
  * heap — fine for tests, an OOM at 100 TB-scale state (billions of
  * dedup keys / window groups). RocksDB spills state to local disk
  * with changelog checkpointing, which is the only setting that
  * survives state larger than memory.
  */
object StreamingConfs {

  val rocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // bound per-task native memory instead of growing unchecked
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true")

  /** Apply to an existing session (picked up by queries started after
    * the set; running queries keep their provider). */
  def applyRocksDb(spark: org.apache.spark.sql.SparkSession): Unit =
    rocksDbStateStore.foreach { case (k, v) => spark.conf.set(k, v) }
}
