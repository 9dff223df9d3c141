package graft.core

import graft.SparkSpec

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("fanOut repartitions a starved scan but leaves a wide frame alone") {
    // the testdata parquet files are single-row-group → 1-partition scans
    val scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val starved = scan.rdd.getNumPartitions
    assert(starved < spark.sparkContext.defaultParallelism,
      s"precondition: raw scan should under-partition, got $starved")
    val fanned = Tables.fanOut(spark, scan)
    assert(fanned.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    // row set unchanged
    assert(fanned.count() === scan.count())

    // a frame already at (or above) target parallelism must NOT gain
    // a repartition exchange
    val wide = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism + 4).toDF()
    assert(Tables.fanOut(spark, wide) eq wide)
  }

  test("normalizeEventsTs canonicalizes every historical ts dtype to TIMESTAMP") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // 2021-01-01T00:00:01Z, expressed three ways
    val micros = 1609459201000000L

    // nanos-long generation (pre-r9 testdata under nanosAsLong): the
    // current testdata no longer exercises this branch, so pin it here
    val longFrame = Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    val fromLong = Tables.normalizeEventsTs(longFrame)
    assert(fromLong.schema("ts").dataType === TimestampType)

    // micros-NTZ generation (current testdata)
    val ntzFrame = longFrame.select(col("event_id"),
      timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType).as("ts"))
    assert(ntzFrame.schema("ts").dataType === TimestampNTZType)
    val fromNtz = Tables.normalizeEventsTs(ntzFrame)
    assert(fromNtz.schema("ts").dataType === TimestampType)

    // already-TIMESTAMP passes through, and all three agree on the
    // instant (session TZ is UTC, so NTZ wall-clock == LTZ instant)
    val ltzFrame = longFrame.select(col("event_id"),
      timestamp_micros(expr("ts DIV 1000")).as("ts"))
    assert(Tables.normalizeEventsTs(ltzFrame) eq ltzFrame)
    val instants = Seq(fromLong, fromNtz, ltzFrame)
      .map(_.select(unix_timestamp(col("ts"))).head.getLong(0))
    assert(instants.distinct === Seq(1609459201L))

    // an unsupported dtype must fail loudly at load, not downstream
    val strFrame = longFrame.select(col("event_id"), lit("2021-01-01").as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(strFrame))
    assert(e.getMessage.contains("events.ts"))

    // the NTZ branch depends on a UTC session — a misconfigured
    // entrypoint must fail loudly, not silently shift wall-clock values
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val tzErr = intercept[IllegalArgumentException](Tables.normalizeEventsTs(ntzFrame))
      assert(tzErr.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("documents/embeddings loaders deliver full parallelism downstream") {
    for (t <- Seq(
        Tables.documents(spark, "/root/testdata/sf0.001"),
        Tables.embeddings(spark, "/root/testdata/sf0.001"))) {
      assert(t.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    }
  }
}
