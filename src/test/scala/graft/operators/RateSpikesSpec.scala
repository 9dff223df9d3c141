package graft.operators

import graft.SparkSpec

class RateSpikesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) = {
    import java.sql.Timestamp
    rows.map { case (id, hr, t) =>
      (id, new Timestamp(hr * 3600L * 1000L), 1L, t, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("a 10x burst hour is flagged; steady hours are not") {
    // type a: 9 quiet hours of 2 events + one hour with 20
    val quiet = for { h <- 0L until 9L; i <- 0L until 2L }
      yield (h * 100 + i, h, "a")
    val burst = (0L until 20L).map(i => (9000L + i, 9L, "a"))
    val out = Timeseries.rateSpikes(ev((quiet ++ burst): _*))
      .select("hour", "cnt_h", "spike").as[(Long, Long, Boolean)].collect()
    val spikes = out.filter(_._3).map(_._1)
    assert(spikes.toSeq === Seq(9L), s"only the burst hour flags: $out")
    assert(out.length === 10)
  }

  test("a silence hour (count far below median) also flags") {
    // 9 hours of 20 events, one hour with 1 — outage detection
    val steady = for { h <- 0L until 9L; i <- 0L until 20L }
      yield (h * 100 + i, h, "a")
    val silent = Seq((9999L, 9L, "a"))
    val out = Timeseries.rateSpikes(ev((steady ++ silent): _*))
      .select("hour", "spike").as[(Long, Boolean)].collect()
    assert(out.filter(_._2).map(_._1).toSeq === Seq(9L))
  }

  test("per-type isolation: one type's burst never flags another") {
    val a = for { h <- 0L until 6L; i <- 0L until 3L }
      yield (h * 100 + i, h, "a")
    val b = for { h <- 0L until 6L; i <- 0L until 3L }
      yield (10000 + h * 100 + i, h, "b")
    val burstA = (0L until 30L).map(i => (90000L + i, 6L, "a"))
    val out = Timeseries.rateSpikes(ev((a ++ b ++ burstA): _*))
      .select("event_type", "spike").as[(String, Boolean)].collect()
    assert(out.exists { case (t, s) => t == "a" && s })
    assert(!out.exists { case (t, s) => t == "b" && s })
  }
}
