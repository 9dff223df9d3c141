package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Stateful streaming must run on the RocksDB state store (the
  * at-scale provider) with identical semantics to the default. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState accumulates state on RocksDB provider") {
    implicit val sqlCtx = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingConfs.applyRocksDb(spark)
    try {
      val ms = MemoryStream[String]
      val q = Sinks.memory(
        StatefulWordCount.runningCounts(ms.toDS()).toDF(), "rocks_sink", "update")
        .start()
      try {
        ms.addData("a", "b", "a")
        q.processAllAvailable()
        ms.addData("a")
        q.processAllAvailable()
        val counts = spark.table("rocks_sink").as[(String, Long)].collect()
          .groupBy(_._1).map { case (w, r) => w -> r.map(_._2).max }
        assert(counts === Map("a" -> 3L, "b" -> 1L))
        // the query really ran on RocksDB, not the default provider
        assert(q.lastProgress.stateOperators.head.customMetrics
          .keySet.toString.contains("rocksdb"))
      } finally q.stop()

      // the transformWithState successor API must give the same answer
      val ms2 = MemoryStream[String]
      val q2 = Sinks.memory(
        StatefulWordCount.runningCountsTws(ms2.toDS()).toDF(), "tws_sink", "update")
        .start()
      try {
        ms2.addData("x", "y", "x")
        q2.processAllAvailable()
        ms2.addData("x")
        q2.processAllAvailable()
        val counts2 = spark.table("tws_sink").as[(String, Long)].collect()
          .groupBy(_._1).map { case (w, r) => w -> r.map(_._2).max }
        assert(counts2 === Map("x" -> 3L, "y" -> 1L))
      } finally q2.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      StreamingConfs.rocksDbStateStore(1024).keys
        .filterNot(_ == "spark.sql.streaming.stateStore.providerClass")
        .foreach(spark.conf.unset)
    }
  }
}
