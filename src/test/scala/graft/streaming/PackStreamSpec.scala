package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Streaming continuation of token packing: the per-stratum running
  * offset lives in the state store, so successive deltas extend the
  * SAME pack sequence the batch operator would produce over the full
  * history — the nightly-ingest form of the packing pipeline. */
class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StreamingConfs.applyRocksDb(spark)
    try body finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("packStream: two AvailableNow deltas continue pack offsets with exact batch parity") {
    withRocksDb {
      val delta1 = Seq(
        (1L, "a b c", "en", "s1"),       // en/s1 off 0  → pack 0
        (2L, "d e f g", "en", "s1"),     // en/s1 off 3  → pack 0
        (3L, "h i j k", "fr", "s2"))     // fr/s2 off 0  → pack 0
      val delta2 = Seq(
        (4L, "l m n o p", "en", "s1"),   // en/s1 off 7  → pack 1 (state carried)
        (5L, "q r", "fr", "s2"))         // fr/s2 off 4  → pack 0

      val src = Files.createTempDirectory("graft_pack_src").toString
      val ckpt = Files.createTempDirectory("graft_pack_ckpt").toString
      val out = Files.createTempDirectory("graft_pack_out").toString

      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING, lang STRING, source STRING")
          .parquet(src)
        val q = PackStream.packStream(stream, budget = 5).toDF()
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      delta1.toDF("doc_id", "text", "lang", "source")
        .write.mode("append").parquet(src)
      runOnce()
      delta2.toDF("doc_id", "text", "lang", "source")
        .write.mode("append").parquet(src)
      runOnce()

      val streamed = spark.read.parquet(out)
        .select("doc_id", "lang", "source", "ws_tokens", "start_off", "pack_id")
        .as[(Long, String, String, Long, Long, Long)].collect().toSeq.sorted
      val batch = TextAnalysis.packTokenBudget(
          (delta1 ++ delta2).toDF("doc_id", "text", "lang", "source"),
          budget = 5)
        .select("doc_id", "lang", "source", "ws_tokens", "start_off", "pack_id")
        .as[(Long, String, String, Long, Long, Long)].collect().toSeq.sorted

      assert(streamed === batch,
        "streamed pack assignment diverged from the batch operator")
      // the cross-batch continuation actually happened: doc 4 starts at
      // the offset delta1 left the en/s1 stratum at, not at 0
      assert(streamed.find(_._1 == 4L).get._5 === 7L)
      assert(streamed.find(_._1 == 4L).get._6 === 1L)
    }
  }

  test("packStream: out-of-order arrivals WITHIN a batch are packed in doc_id order") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, String, String, String)]
      val q = Sinks.memory(
        PackStream.packStream(
          ms.toDS().toDF("doc_id", "text", "lang", "source"),
          budget = 4).toDF(),
        "pack_order_sink", "append").start()
      try {
        // arrival order 3, 1, 2 — offsets must follow doc_id order 1, 2, 3
        ms.addData((3L, "f g h", "en", "s"), (1L, "a b", "en", "s"),
          (2L, "c d e", "en", "s"))
        q.processAllAvailable()
        val byDoc = spark.table("pack_order_sink")
          .select("doc_id", "start_off", "pack_id")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(byDoc === Map(1L -> ((0L, 0L)), 2L -> ((2L, 0L)),
          3L -> ((5L, 1L))))
      } finally q.stop()
    }
  }
}
