package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Survey #13: the four sink shapes — partitioned parquet + checkpoint,
  * foreach (row-at-a-time external system), kafka-shaped to_json frame,
  * memory. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet sink with checkpoint writes readable partitions") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorEvent]
    val outDir = Files.createTempDirectory("graft_pq_out").toString
    val ckDir = Files.createTempDirectory("graft_pq_ck").toString

    val withMonth = ms.toDF()
      .withColumn("month", date_format(col("ts"), "yyyyMM"))
      .select("event_id", "event_type", "value", "month")
    val q = Sinks.partitionedParquet(withMonth, outDir, ckDir, Seq("month")).start()
    try {
      ms.addData(
        SensorEvent.at(1, "2024-01-05 10:00:00", 1, "click", 1.0, 1),
        SensorEvent.at(2, "2024-02-06 11:00:00", 1, "view", 2.0, 2))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(outDir)
    assert(back.count() === 2)
    assert(back.select("month").as[String].collect().toSet === Set("202401", "202402"))
    // physical layout: hive-style partition directories
    val dirs = new java.io.File(outDir).listFiles().map(_.getName).filter(_.startsWith("month="))
    assert(dirs.toSet === Set("month=202401", "month=202402"))
  }

  test("foreach sink processes every row exactly once per epoch") {
    implicit val sqlCtx = spark.sqlContext
    Sinks.CollectingForeachWriter.clear()
    val ms = MemoryStream[String]
    val q = ms.toDF().writeStream
      .foreach(new Sinks.CollectingForeachWriter).start()
    try {
      ms.addData("r1", "r2", "r3")
      q.processAllAvailable()
      assert(Sinks.CollectingForeachWriter.rows.map(_.head).toSet
        === Set("r1", "r2", "r3"))
    } finally q.stop()
  }

  test("kafka-shaped frame is (key string, value json-of-all-columns)") {
    val df = Seq((1L, "click", 2.5)).toDF("event_id", "event_type", "value")
    val shaped = Sinks.kafkaShaped(df, "event_id")
    assert(shaped.columns.toSeq === Seq("key", "value"))
    val (k, v) = shaped.as[(String, String)].collect().head
    assert(k === "1")
    assert(v === """{"event_id":1,"event_type":"click","value":2.5}""")
  }

  test("upsert foreach sink: last-write-wins by key, idempotent epoch replay") {
    // the Cassandra-sink rehearsal (StreamingWithCasssandra.scala:31-40:
    // INSERT by primary key == upsert) against the in-memory table
    implicit val sqlCtx = spark.sqlContext
    Sinks.UpsertForeachWriter.clear()
    val ms = MemoryStream[(Long, String)]
    // coalesce(1): within-batch apply order for a repeated key is
    // partition-sequential, deterministic only on one partition
    val q = ms.toDF().toDF("id", "v").coalesce(1).writeStream
      .foreach(new Sinks.UpsertForeachWriter(keyIdx = 0)).start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((1L, "c"), (3L, "d")) // epoch 2 overwrites key 1
      q.processAllAvailable()
      val table = Sinks.UpsertForeachWriter.rows
      assert(table.map { case (k, r) => k -> r(1) }
        === Map(1L -> "c", 2L -> "b", 3L -> "d"))
      val appliedBefore = Sinks.UpsertForeachWriter.appliedCount
      assert(appliedBefore === 4L)

      // replayed task, same (partition, epoch): open() declines it
      val w = new Sinks.UpsertForeachWriter(0)
      assert(!w.open(0L, 0L), "already-committed epoch must be declined")
      assert(w.open(0L, 99L), "a fresh epoch must be accepted")

      // commit() itself re-checks the epoch under the lock (open()'s
      // probe alone is not atomic with close() — two speculative
      // attempts of one (partition, epoch) could both pass it): a
      // direct replay of an already-committed epoch no-ops entirely,
      // content AND count
      Sinks.UpsertForeachWriter.commit(0L, 1L,
        Seq((1L, Seq(1L, "c")), (3L, Seq(3L, "d"))))
      assert(Sinks.UpsertForeachWriter.rows.map { case (k, r) => k -> r(1) }
        === Map(1L -> "c", 2L -> "b", 3L -> "d"))
      assert(Sinks.UpsertForeachWriter.appliedCount === appliedBefore,
        "a replayed (partition, epoch) must not double-count")

      // and even when the SAME values land under a fresh epoch (the
      // at-least-once path with no dedup bookkeeping at all), table
      // content is idempotent because upsert-by-key re-applies them
      Sinks.UpsertForeachWriter.commit(0L, 98L,
        Seq((1L, Seq(1L, "c")), (3L, Seq(3L, "d"))))
      assert(Sinks.UpsertForeachWriter.rows.map { case (k, r) => k -> r(1) }
        === Map(1L -> "c", 2L -> "b", 3L -> "d"))
      assert(Sinks.UpsertForeachWriter.appliedCount === appliedBefore + 2)
    } finally q.stop()
  }
}
