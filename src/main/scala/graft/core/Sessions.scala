package graft.core

import org.apache.spark.sql.SparkSession

/** Session builder tuned for the local[32] harness while keeping the
  * settings that transfer to a real cluster (AQE, UTC, sane shuffle
  * partition count). On a 1000-executor cluster only master/memory
  * change; the SQL conf choices hold.
  */
object Sessions {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .withExtensions(new graft.GraftExtensions)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); set once here, not inside
      // loaders (a conf mutation in a loader is a hidden global side effect)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
