package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Survey #11: flatMapGroupsWithState running wordcount — state must
  * accumulate ACROSS triggers (the updateStateByKey semantics). */
class StatefulWordCountSpec extends SparkSpec {
  import spark.implicits._

  test("running counts accumulate across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val counts = StatefulWordCount.runningCounts(ms.toDS())
    val q = Sinks.memory(counts.toDF(), "wc_sink", "update").start()
    try {
      ms.addData("spark", "kafka", "spark")
      q.processAllAvailable()
      val after1 = spark.table("wc_sink").as[(String, Long)].collect().toMap
      assert(after1 === Map("spark" -> 2L, "kafka" -> 1L))

      ms.addData("spark", "flink")
      q.processAllAvailable()
      // update mode: latest row per word wins
      val after2 = spark.table("wc_sink").as[(String, Long)].collect()
        .groupBy(_._1).map { case (w, rows) => w -> rows.map(_._2).max }
      assert(after2 === Map("spark" -> 3L, "kafka" -> 1L, "flink" -> 1L))
    } finally q.stop()
  }
}
