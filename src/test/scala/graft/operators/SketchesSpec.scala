package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the three properties the sketch path's 100 TB story rests on:
  * bounded error vs exact, merge-equivalence (per-partition sketches
  * unioned == one global sketch build), and storability (parquet
  * round trip). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 60k rows, 20k distinct values, 3 "days"
  private lazy val rows = (0 until 60000)
    .map(i => (i % 3, (i * 2654435761L) % 20000, i.toLong))
    .toDF("day", "uid", "seq")

  test("estimate is within the HLL error envelope of the exact count") {
    val est = Sketches.mergeEstimate(
      Sketches.buildSketches(rows, Seq("day"), "uid"), Nil)
      .select("distinct_est").as[Long].head()
    val exact = rows.select("uid").distinct().count()
    val relErr = math.abs(est.toDouble - exact) / exact
    assert(relErr < 0.05, s"est $est vs exact $exact: relErr $relErr")
  }

  test("merging per-day sketches equals sketching the whole corpus") {
    // per-day build then union-merge...
    val mergedEst = Sketches.mergeEstimate(
      Sketches.buildSketches(rows, Seq("day"), "uid"), Nil)
      .select("distinct_est").as[Long].head()
    // ...vs one global build over the same data
    val globalEst = Sketches.mergeEstimate(
      Sketches.buildSketches(rows, Nil, "uid"), Nil)
      .select("distinct_est").as[Long].head()
    assert(mergedEst === globalEst,
      "sketch merge must be lossless vs a single global build")
  }

  test("sketches survive a parquet round trip and merge incrementally") {
    val dir = Files.createTempDirectory("graft_sketch").toString
    // day 0+1 stored...
    Sketches.buildSketches(rows.filter($"day" < 2), Seq("day"), "uid")
      .write.mode("overwrite").parquet(s"$dir/old")
    // ...day 2 arrives later, stored separately
    Sketches.buildSketches(rows.filter($"day" === 2), Seq("day"), "uid")
      .write.mode("overwrite").parquet(s"$dir/new")
    val all = spark.read.parquet(s"$dir/old")
      .unionByName(spark.read.parquet(s"$dir/new"))
    val est = Sketches.mergeEstimate(all, Nil)
      .select("distinct_est").as[Long].head()
    val direct = Sketches.mergeEstimate(
      Sketches.buildSketches(rows, Nil, "uid"), Nil)
      .select("distinct_est").as[Long].head()
    assert(est === direct)
    // and a coarser re-group from stored sketches works without raw data
    val perDay = Sketches.mergeEstimate(all, Seq("day"))
    assert(perDay.count() === 3)
  }

  test("count-min heavy hitters: one-sided error, merge == whole-corpus, hot keys found") {
    // zipf-ish: token t<k> appears ~60000/(k+1) times across 3 days
    val tokens = (0 until 30000).flatMap { i =>
      val k = (0 until 12).find(k => i % (k + 1) == 0).getOrElse(0)
      Seq((i % 3, s"t$k"))
    }.toDF("day", "tok")
    val exact = tokens.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val n = tokens.count()

    val perDay = Sketches.buildFreqSketches(tokens, Seq("day"), "tok",
      eps = 0.001, confidence = 0.99)
    val candidates = tokens.select("tok").distinct()
    val hot = Sketches.heavyHitters(perDay, candidates, "tok",
      minCount = 2000L).as[(String, Long)].collect()

    // one-sided CMS error: est >= true, est <= true + eps*N (with
    // margin; the seed is fixed so this is deterministic)
    hot.foreach { case (tok, est) =>
      val truth = exact(tok)
      assert(est >= truth, s"$tok: est $est below true $truth")
      assert(est <= truth + (0.002 * n).toLong,
        s"$tok: est $est beyond the error envelope of $truth")
    }
    // the genuinely hot keys surface
    val hotSet = hot.map(_._1).toSet
    assert(hotSet.contains("t0"))
    assert(exact.filter(_._2 >= 3000).keySet.subsetOf(hotSet))

    // merging per-day sketches == sketching the whole corpus: the
    // estimates must agree key-for-key
    val whole = Sketches.buildFreqSketches(tokens, Nil, "tok",
      eps = 0.001, confidence = 0.99)
    val wholeHot = Sketches.heavyHitters(whole, candidates, "tok",
      minCount = 2000L).as[(String, Long)].collect().toMap
    assert(hot.toMap === wholeHot)
  }
}
