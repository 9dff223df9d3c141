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

  test("distributed cms union == driver-side reference merge") {
    import org.apache.spark.util.sketch.CountMinSketch
    val tokens = (0 until 9000)
      .map(i => (i % 4, s"w${i % 37}")).toDF("day", "tok")
    val perDay = Sketches.buildFreqSketches(tokens, Seq("day"), "tok")

    // reference: collect every per-day sketch and merge sequentially
    // on the driver (the shape the executor-side aggregate replaces)
    val reference = perDay.select("cms").collect()
      .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
      .reduceLeft { (a, b) => a.mergeInPlace(b); a }

    // distributed: CmsUnionAgg's partial/final split over 4 rows
    val mergedBytes = perDay
      .agg(graft.functions.CountMin.cmsUnion(col("cms")).as("cms"))
      .head().getAs[Array[Byte]](0)
    val merged = CountMinSketch.readFrom(mergedBytes)

    (0 until 37).foreach { k =>
      assert(merged.estimateCount(s"w$k") === reference.estimateCount(s"w$k"),
        s"w$k: distributed union must equal the driver reference merge")
    }
  }

  test("non-string heavy-hitter column: estimates honor est >= true") {
    // integral keys: before the build-side cast to string, the builtin
    // aggregate hashed these as longs while scoring hashed UTF-8 bytes
    // — estimates were hash-noise far below the true counts
    val ints = (0 until 8000).map(i => (i % 2, i % (1 + i % 7))).toDF("day", "k")
    val exact = ints.groupBy($"k".cast("string").as("k")).count()
      .as[(String, Long)].collect().toMap
    val hot = Sketches.heavyHitters(
      Sketches.buildFreqSketches(ints, Seq("day"), "k"),
      ints.select("k").distinct(), "k", minCount = 1L)
      .as[(String, Long)].collect()
    assert(hot.nonEmpty)
    hot.foreach { case (k, est) =>
      assert(est >= exact(k), s"$k: est $est below true ${exact(k)}")
    }
  }

  test("empty sketches frame yields an empty result, not a throw") {
    val none = Sketches.buildFreqSketches(
      Seq.empty[(Int, String)].toDF("day", "tok"), Seq("day"), "tok")
    val out = Sketches.heavyHitters(
      none, Seq("a", "b").toDF("tok"), "tok", minCount = 1L)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("tok", "est_count"))
  }

  test("heavy-hitter scoring stage is lambda-free (native probe in plan)") {
    val tokens = (0 until 600).map(i => (i % 3, s"t${i % 5}")).toDF("day", "tok")
    // range-backed candidates: a local Seq would be folded away at plan
    // time (ConvertToLocalRelation), hiding the scoring stage entirely
    val candidates = spark.range(5)
      .select(concat(lit("t"), $"id".cast("string")).as("tok"))
    val scored = Sketches.heavyHitters(
      Sketches.buildFreqSketches(tokens, Seq("day"), "tok"),
      candidates, "tok", minCount = 1L)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("count_min_probe"),
      s"scoring must go through the native CountMinProbe expression:\n$plan")
    assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"),
      s"scoring stage must stay inside whole-stage codegen:\n$plan")
  }
}
