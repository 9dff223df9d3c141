package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Parquet bloom-filter row-group pruning proof (r14 verdict #4) —
  * the point-lookup member of the layout-proof family (bucketed
  * zero-shuffle, dynamic partition pruning, z-order scan boxes): a
  * selective `key = x` probe over a SHUFFLED high-cardinality key must
  * read a fraction of the rows when the layout carries per-row-group
  * bloom filters, and the whole table when it doesn't (min/max stats
  * are useless — every row group's key range spans the domain, which
  * is exactly the production arrival-order shape).
  *
  * Both layouts are written identically (same repartition, dictionary
  * disabled on the key) except for the filter, so the measured gap is
  * the bloom filter's and nothing else's. */
class BloomLayoutSpec extends SparkSpec {

  /** Executor-reported input bytes for one action — the NOTES
    * measurement (rows read comes from the scan metric). */
  private def bytesRead(act: => Unit): Long = {
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          seen.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      act
      org.apache.spark.GraftBusDrain.drain(spark)
    } finally spark.sparkContext.removeSparkListener(l)
    seen.get
  }

  test("point probe on a shuffled md5 key: bloom layout skips row " +
      "groups; the bare layout reads the whole table") {
    val dir = Files.createTempDirectory("graft_bloom").toString
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("key", md5(col("event_id").cast("string")))
    val total = events.count()
    val files = 8

    graft.core.Layout.writeBloomFiltered(events, s"$dir/bloom", "key",
      files, ndv = total / files + 1)
    // identical layout, no bloom filter (dictionary still disabled so
    // neither side can dictionary-skip — the gap is the bloom's alone)
    events.repartition(files).write.mode("overwrite")
      .option("parquet.enable.dictionary#key", "false")
      .parquet(s"$dir/plain")

    val probe = events.filter(col("event_id") === 4321L)
      .select("key").collect()(0).getString(0)
    def probed(path: String) =
      spark.read.parquet(path).filter(col("key") === probe)

    // correctness first: both layouts serve the identical row
    assert(probed(s"$dir/bloom").select("event_id").collect()
      .map(_.getLong(0)).toSeq === Seq(4321L))
    assert(probed(s"$dir/plain").select("event_id").collect()
      .map(_.getLong(0)).toSeq === Seq(4321L))

    val bloomRows = rowsRead(probed(s"$dir/bloom"))
    val plainRows = rowsRead(probed(s"$dir/plain"))
    val bloomBytes = bytesRead(probed(s"$dir/bloom").collect())
    val plainBytes = bytesRead(probed(s"$dir/plain").collect())
    info(s"rows read: bloom=$bloomRows plain=$plainRows (total=$total); " +
      s"bytes read: bloom=$bloomBytes plain=$plainBytes")

    // a shuffled md5 key leaves min/max useless: the bare layout
    // decodes (essentially) every row group
    assert(plainRows >= total / 2,
      s"expected the bare layout to read most of the $total rows, " +
        s"got $plainRows — stats pruning should not fire on a " +
        "shuffled key")
    // the bloom filter must skip the row groups that cannot contain
    // the key — at 8 row groups and fpp 0.01 that is at least 4x
    assert(bloomRows * 4 <= plainRows,
      s"bloom layout read $bloomRows rows vs $plainRows bare — " +
        "row-group skipping did not engage")
  }
}
