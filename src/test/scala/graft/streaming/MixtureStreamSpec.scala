package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MixturePlan

/** Streaming mixture accounting: per-source integer sums are
  * associative, so the complete-mode state must equal the batch
  * aggregate under ANY micro-batch split, and the waterfilling plan
  * read over the live state must equal the batch operator on the
  * union of everything that has arrived. */
class MixtureStreamSpec extends SparkSpec {
  import spark.implicits._

  private val target =
    expr("CASE source WHEN 'a' THEN 5000 WHEN 'b' THEN 3000 ELSE 2000 END")

  private def doc(id: Long, src: String, n: Int) =
    (id, Seq.fill(n)("w").mkString(" "), "en", src, 0L)

  private val arrivals = Seq(
    doc(1L, "a", 40), doc(2L, "b", 100),
    doc(3L, "c", 300), doc(4L, "a", 60), doc(5L, "c", 500))

  test("streamed source sums == batch; live plan == batch plan") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, String, Long)]
    val stream = ms.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = Sinks.memory(MixtureStream.sourceSums(stream),
      "mixture_state", "complete").start()
    try {
      ms.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      val mid = spark.table("mixture_state").collect().map(_.toSeq).toSet
      val midBatch = MixturePlan.sourceTokenSums(
        arrivals.take(2).toDF("doc_id", "text", "lang", "source", "n_chars"))
        .collect().map(_.toSeq).toSet
      assert(mid === midBatch)

      ms.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val fin = spark.table("mixture_state").collect().map(_.toSeq).toSet
      val all = arrivals.toDF("doc_id", "text", "lang", "source", "n_chars")
      val finBatch = MixturePlan.sourceTokenSums(all)
        .collect().map(_.toSeq).toSet
      assert(fin === finBatch)

      // the waterfilling plan over the LIVE state == the batch operator
      val live = MixtureStream.planReading(
        spark.table("mixture_state"), target)
        .collect().map(_.toSeq).toSet
      val batch = MixturePlan.mixturePlan(all, target)
        .collect().map(_.toSeq).toSet
      assert(live === batch)
      assert(live.size === 3, "one plan row per source")
    } finally q.stop()
  }

  test("split-invariance: one-row batches give the same final plan") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, String, Long)]
    val stream = ms.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = Sinks.memory(MixtureStream.sourceSums(stream),
      "mixture_state_1", "complete").start()
    try {
      arrivals.foreach { d => ms.addData(d); q.processAllAvailable() }
      val live = MixtureStream.planReading(
        spark.table("mixture_state_1"), target)
        .collect().map(_.toSeq).toSet
      val batch = MixturePlan.mixturePlan(
        arrivals.toDF("doc_id", "text", "lang", "source", "n_chars"), target)
        .collect().map(_.toSeq).toSet
      assert(live === batch)
    } finally q.stop()
  }
}
