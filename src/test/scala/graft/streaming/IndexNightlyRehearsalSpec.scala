package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The index lifecycle's FULL operational loop in one rehearsal
  * (r16 verdict #5 — IndexCompactSpec proves compact in isolation;
  * this composes it with live ingest the way the nightly actually
  * runs): stream-ingest batches on the RocksDB state store → compact
  * with the in-flight tail excluded → resume the SAME checkpoint for
  * more batches → serve → replay the one batch that CAN legally
  * re-fire (the excluded tail — a committed batch never replays,
  * which is exactly why compact's exclude set is the commit frontier)
  * → serve again. Serving must be row-identical to the nightly bulk
  * rebuild at every step, on the real parquet layout.
  */
class IndexNightlyRehearsalSpec extends SparkSpec {
  import spark.implicits._

  private val quantizer = Seq(
    0L -> Seq(1.0, 0.0, 0.0),
    1L -> Seq(0.0, 1.0, 0.0)).toDF("cid", "ce")

  // four ingest waves — one micro-batch each; every wave hits both cells
  private val waves: Seq[Seq[(Long, Seq[Float])]] = Seq(
    Seq(10L -> Seq(0.9f, 0.1f, 0.0f), 11L -> Seq(0.1f, 0.8f, 0.1f)),
    Seq(12L -> Seq(0.8f, 0.2f, 0.0f), 13L -> Seq(0.2f, 0.9f, 0.0f)),
    Seq(14L -> Seq(0.7f, 0.3f, 0.0f), 15L -> Seq(0.3f, 0.7f, 0.1f)),
    Seq(16L -> Seq(0.6f, 0.4f, 0.0f), 17L -> Seq(0.4f, 0.6f, 0.1f)))

  private def indexSetDf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("vec_id"), col("cell"), col("scale"),
      concat_ws(",", col("q")).as("qcsv"))
    .as[(Long, Long, Double, String)].collect().toSet

  private def indexSet(dir: String) = indexSetDf(spark.read.parquet(dir))

  private def batchKeyDirs(dir: String): Set[String] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(_.getName.startsWith("cell="))
      .flatMap(c => c.listFiles().filter(_.getName.startsWith("batch_key="))
        .map(k => s"${c.getName}/${k.getName}")).toSet
  }

  private def serve(dir: String): Set[Long] = {
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.0))).toDF("query_id", "e")
    Similarity.annIvfTopKFromIndex(
        spark.read.parquet(dir), queries, quantizer, nProbe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
  }

  test("ingest -> compact(tail excluded) -> more ingest -> serve -> " +
       "replay the tail -> serve: row-identical to the bulk rebuild " +
       "throughout, on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val before =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingConfs.applyRocksDb(spark)
    try {
      val dir = Files.createTempDirectory("nightly_idx").toString
      val index = s"$dir/index"
      val ckpt = s"$dir/ckpt"
      val tag = IndexSink.ingestTag(ckpt)
      val ms = MemoryStream[(Long, Seq[Float])]

      // phase 1: three micro-batches through one checkpointed query
      val q1 = IvfIngest.writer(
        ms.toDF().toDF("vec_id", "embedding"), quantizer, index, ckpt)
        .start()
      try waves.take(3).foreach { w =>
        ms.addData(w: _*); q1.processAllAvailable()
      } finally q1.stop()
      assert(batchKeyDirs(index).size === 6, "3 batches x 2 cells")

      // phase 2: nightly compaction — batch 2 is the commit frontier
      // (the only batch that could still re-fire), so it is excluded
      // and carried over under its own key
      val preCompact = indexSet(index)
      val servedPre = serve(index)
      IndexSink.compact(spark, index, "night1",
        excludeBatchKeys = Set(s"$tag-2"))
      assert(indexSet(index) === preCompact, "compaction serving parity")
      assert(serve(index) === servedPre)
      assert(batchKeyDirs(index) === Set(
        "cell=0/batch_key=compact-night1", "cell=1/batch_key=compact-night1",
        s"cell=0/batch_key=$tag-2", s"cell=1/batch_key=$tag-2"))

      // phase 3: the stream RESUMES from the same checkpoint — the
      // next batch lands beside the compacted layout at batchId 3
      val q2 = IvfIngest.writer(
        ms.toDF().toDF("vec_id", "embedding"), quantizer, index, ckpt)
        .start()
      try { ms.addData(waves(3): _*); q2.processAllAvailable() }
      finally q2.stop()
      val rebuilt = indexSetDf(Similarity.ivfInt8IndexRows(
        waves.flatten.toDF("vec_id", "embedding"), quantizer))
      assert(indexSet(index) === rebuilt,
        "ingest + compact + ingest must equal the nightly bulk rebuild")
      val servedAll = serve(index)

      // phase 4: the excluded tail batch re-fires (crash between sink
      // write and offset commit) — it must overwrite exactly its own
      // partitions, leaving serving row-identical
      IndexSink.writeBatch(
        Similarity.ivfInt8IndexRows(
          waves(2).toDF("vec_id", "embedding"), quantizer),
        index, s"$tag-2")
      assert(indexSet(index) === rebuilt,
        "tail replay after compaction must be a no-op on content")
      assert(serve(index) === servedAll)
    } finally before match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
