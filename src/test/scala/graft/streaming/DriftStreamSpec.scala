package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CorpusStats

/** Streaming centroid-drift monitor: integer component sums are
  * associative, so the complete-mode state must equal the batch
  * aggregate under ANY micro-batch split, and the drift reading over
  * the live state must equal the batch operator on the union of
  * everything that has arrived. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val arrivals = Seq(
    (1L, Seq(1.0f, 0.0f), 0),
    (2L, Seq(0.5f, 0.5f), 0),
    (3L, Seq(0.0f, 1.0f), 1),
    (4L, Seq(-0.25f, 0.75f), 1),
    (5L, Seq(0.9f, -0.1f), 2))

  test("streamed sums == batch sums under a 2/3 micro-batch split; drift reading matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    val stream = ms.toDF().toDF("vec_id", "embedding", "label")
    val q = Sinks.memory(DriftStream.centroidSums(stream),
      "drift_state", "complete").start()
    try {
      ms.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      // mid-stream reading: state equals the batch aggregate of what
      // has arrived so far
      val mid = spark.table("drift_state").collect().map(_.toSeq).toSet
      val midBatch = CorpusStats.componentSums(
        arrivals.take(2).toDF("vec_id", "embedding", "label"))
        .collect().map(_.toSeq).toSet
      assert(mid === midBatch)

      ms.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val fin = spark.table("drift_state").collect().map(_.toSeq).toSet
      val finBatch = CorpusStats.componentSums(
        arrivals.toDF("vec_id", "embedding", "label"))
        .collect().map(_.toSeq).toSet
      assert(fin === finBatch)

      // the drift tail over the LIVE state == the batch operator
      val live = DriftStream.driftReading(spark.table("drift_state"))
        .collect().map(_.toSeq).toSet
      val batch = CorpusStats.centroidDrift(
        arrivals.toDF("vec_id", "embedding", "label"))
        .collect().map(_.toSeq).toSet
      assert(live === batch)
      assert(live.size === 3, "three label pairs expected")
    } finally q.stop()
  }

  test("split-invariance: one-row batches give the same final state") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    val stream = ms.toDF().toDF("vec_id", "embedding", "label")
    val q = Sinks.memory(DriftStream.centroidSums(stream),
      "drift_state_1row", "complete").start()
    try {
      arrivals.foreach { r => ms.addData(r); q.processAllAvailable() }
      val fin = spark.table("drift_state_1row").collect().map(_.toSeq).toSet
      val batch = CorpusStats.componentSums(
        arrivals.toDF("vec_id", "embedding", "label"))
        .collect().map(_.toSeq).toSet
      assert(fin === batch)
    } finally q.stop()
  }
}
