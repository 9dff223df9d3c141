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

  test("documents/embeddings loaders deliver full parallelism downstream") {
    for (t <- Seq(
        Tables.documents(spark, "/root/testdata/sf0.001"),
        Tables.embeddings(spark, "/root/testdata/sf0.001"))) {
      assert(t.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    }
  }
}
