package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityModels

/** Streaming calibrated-quality gate: the frozen (weights, bounds,
  * PAV step map) model broadcasts into the stream; admission must
  * equal the batch rule on the union of everything that flowed, under
  * any micro-batch split; observed metrics reconcile exactly; and the
  * step map itself must agree with quality_calibrated's cal_bp per
  * populated bin. */
class CalibratedGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stream admission == batch gate under splits; metrics reconcile") {
    implicit val sqlCtx = spark.sqlContext
    val ref = graft.core.Tables.documents(spark, sf)
    val model = CalibratedGateStream.model(ref).localCheckpoint()

    // batch truth over the same docs (observe is batch-legal)
    val arrivals = ref.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val batchKept = CalibratedGateStream
      .gated(ref, model).select("doc_id").as[Long].collect().toSet

    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val q = Sinks.memory(CalibratedGateStream.gated(stream, model),
      "calibrated_gate_sink", "append").start()
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 3)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val sunk = spark.table("calibrated_gate_sink").select("doc_id")
        .as[Long].collect().toSet
      assert(sunk === batchKept,
        "stream admission must equal the batch gate on the union")
      assert(sunk.nonEmpty && sunk.size < arrivals.length,
        "the 5000-bp threshold must actually separate at this sf")

      val observed = q.recentProgress.toSeq
        .flatMap(p =>
          Option(p.observedMetrics.get(CalibratedGateStream.metricName)))
      assert(observed.map(_.getAs[Long]("n_rows")).sum
        === arrivals.length.toLong)
      assert(observed.map(_.getAs[Long]("n_admit")).sum
        === batchKept.size.toLong)
    } finally q.stop()
  }

  test("the frozen step map equals quality_calibrated's cal_bp per bin") {
    val ref = graft.core.Tables.documents(spark, sf)
    val calMap = CalibratedGateStream.model(ref)
      .select("cal_map").as[Map[Long, Long]].collect()(0)
    val cal = QualityModels.qualityCalibrated(ref)
      .select("bin", "cal_bp").as[(Long, Long)].collect().toMap
    cal.foreach { case (bin, bp) =>
      assert(calMap(bin) === bp,
        s"bin $bin: frozen map ${calMap(bin)} vs calibrator $bp")
    }
    // the step map is dense 0..9 and monotone (the isotonic contract
    // carried into serving)
    val vals = (0L to 9L).map(calMap)
    assert(vals.zip(vals.tail).forall { case (x, y) => x <= y })
  }
}
