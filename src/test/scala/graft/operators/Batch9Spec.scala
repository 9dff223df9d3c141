package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-9 specs: trailing rolling median, nearest as-of, Zipf fit. */
class Batch9Spec extends SparkSpec {
  import spark.implicits._

  test("rollingMedian: discrete lower median over the trailing frame") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1 values: 10, 100, 20, 30 (k=3 frames):
    // [10]=10, [10,100]=10 (lower of 2), [10,100,20]=20, [100,20,30]=30
    val ev = Seq(
      (1L, ts(1), 1L, "a", 0.10, ""), (2L, ts(2), 1L, "a", 1.00, ""),
      (3L, ts(3), 1L, "a", 0.20, ""), (4L, ts(4), 1L, "a", 0.30, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Timeseries.rollingMedian(ev, k = 3)
      .select("event_id", "median_cents").as[(Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out === Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L)))
  }

  test("rollingMedian shrugs off the spike that drags the EWMA") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = (1 to 8).map(i =>
      (i.toLong, ts(i.toLong), 1L, "a", if (i == 4) 99.0 else 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val med = Timeseries.rollingMedian(ev, k = 3)
      .filter(col("event_id") > 4).select("median_cents").as[Long].collect()
    assert(med.drop(1).forall(_ === 100L),
      "median returns to baseline one step after the spike leaves the center")
  }

  test("asofNearestOrder: picks the closer side, ties go backward") {
    val out = AsofJoin.asofNearestOrderQuery(spark, "/root/testdata/sf0.001")
      .select("event_id", "o_orderkey", "src")
      .as[(Long, Option[Long], Option[String])].collect()
    assert(out.nonEmpty)
    val back = AsofJoin.asofLatestOrderQuery(spark, "/root/testdata/sf0.001")
      .select("event_id", "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    val fwd = AsofJoin.asofNextOrderQuery(spark, "/root/testdata/sf0.001")
      .select("event_id", "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    out.foreach { case (id, key, src) =>
      src match {
        case Some("back") => assert(key === back(id))
        case Some("fwd")  => assert(key === fwd(id))
        case None         => assert(back(id).isEmpty && fwd(id).isEmpty)
        case other        => fail(s"unexpected src $other")
      }
    }
    assert(out.exists(_._3.contains("back")), "at least one backward match")
    // the distance rule itself (including fwd wins and ties) is pinned
    // bit-exactly by the DuckDB oracle at sf0.01; sf0.001's orders all
    // precede its events, so 'fwd' legitimately never wins here
  }

  test("zipfFit: an exact power law measures its own exponent") {
    // counts c(r) = round(C * r^-0.8): slope_micro must land near -0.8e6
    val docs = (1 to 50).flatMap { r =>
      val c = math.max(1, math.round(10000.0 * math.pow(r, -0.8)).toInt)
      Seq.fill(c)(s"w$r")
    }
    val df = Seq((1L, docs.mkString(" "))).toDF("doc_id", "text")
    val out = CorpusStats.zipfFit(df, topN = 50)
      .select("n_fit", "slope_micro").as[(Long, Long)].head()
    assert(out._1 === 50L)
    assert(math.abs(out._2 + 800000L) < 20000L,
      s"fitted slope ${out._2} should be close to -800000 micro")
  }

  test("zipfFit: uniform counts fit slope 0") {
    val df = Seq((1L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusStats.zipfFit(df, topN = 30)
      .select("slope_micro").as[Long].head()
    assert(out === 0L)
  }
}
