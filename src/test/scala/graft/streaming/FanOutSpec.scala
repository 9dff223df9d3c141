package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** fanOut must deliver each micro-batch to EVERY consumer (the
  * reference's console+kafka dual sink, computed once). */
class FanOutSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch fan-out delivers the same batch to all consumers") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val out1 = Files.createTempDirectory("graft_fan1").toString
    val out2 = Files.createTempDirectory("graft_fan2").toString

    val q = Sinks.fanOut(ms.toDF(), "append", Seq(
      b => b.write.mode("append").parquet(out1),
      b => Sinks.kafkaShaped(b, "value").write.mode("append").parquet(out2)))
      .start()
    try {
      ms.addData("x", "y", "z")
      q.processAllAvailable()
    } finally q.stop()

    assert(spark.read.parquet(out1).as[String].collect().toSet === Set("x", "y", "z"))
    val shaped = spark.read.parquet(out2)
    assert(shaped.columns.toSeq.sorted === Seq("key", "value"))
    assert(shaped.count() === 3)
  }
}
