package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst keeps full pushdown
  * (PushedFilters / ReadSchema pruning) — no caching or materialization
  * here; operators decide what to broadcast or repartition.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fan a poorly-partitioned scan out to the cluster's parallelism —
    * ONLY when the source under-delivers partitions (a single-row-group
    * parquet file scans as ONE task, serializing every downstream
    * map-side stage: shingling, hashing, vector casts). The condition
    * makes this a no-op at scale: a 100 TB table already scans as tens
    * of thousands of splits, so the exchange is never added; a small
    * hot table pays one shuffle of its raw bytes to unlock N-way
    * compute. getNumPartitions only plans the scan, it runs no job. */
  def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; the session must set spark.sql.legacy.parquet.nanosAsLong
    * (Sessions.local / Verify / Bench do). Convert with integer DIV — a
    * double division would lose precision above 2^53 nanos. */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  /** documents/embeddings feed compute-heavy map stages (shingling,
    * md5, per-element vector math), so their loaders fan out when the
    * file layout starves parallelism (see fanOut). */
  def documents(s: SparkSession, d: String): DataFrame  =
    fanOut(s, load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(s, load(s, d, "embeddings"))
}
