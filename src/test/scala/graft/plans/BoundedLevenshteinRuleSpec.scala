package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein

import graft.SparkSpec

/** BoundedLevenshteinRule: thresholded unbounded `levenshtein(a, b)`
  * comparisons must plan as the banded 3-arg form, with results
  * identical to the unbounded semantics (including NULLs and operand
  * orientation). The shared SparkSpec session registers
  * GraftExtensions, so the rule is active in plain SQL here.
  */
class BoundedLevenshteinRuleSpec extends SparkSpec {

  private def pairsView(): Unit = {
    import spark.implicits._
    // RDD-backed, NOT a LocalRelation — ConvertToLocalRelation would
    // otherwise evaluate the filter at optimize time and the plan
    // assertions below would have no levenshtein call left to find.
    spark.sparkContext.parallelize(Seq(
      ("kitten", "sitting"),   // d=3
      ("flaw", "lawn"),        // d=2
      ("abc", "abc"),          // d=0
      ("abc", "abd"),          // d=1
      ("abcdefgh", "zzzzzzzz"),// d=8
      ("a", null),             // null right
      (null, "b"),             // null left
      ("", "xy")               // d=2 via inserts
    )).toDF("a", "b").createOrReplaceTempView("lev_pairs")
  }

  /** Collect every levenshtein call in the optimized plan as
    * (isBounded, threshold). */
  private def levCalls(df: DataFrame): Seq[Option[Int]] = {
    val out = scala.collection.mutable.ArrayBuffer[Option[Int]]()
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case l @ Levenshtein(_, _, t) =>
        out += t.map(_.eval().asInstanceOf[Int]); l
    }
    out.toSeq
  }

  test("upper bound rewrites to banded form with identical rows") {
    pairsView()
    val q = spark.sql(
      "SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 2")
    assert(levCalls(q) === Seq(Some(2)), "expected one banded call at k=2")
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("flaw", "lawn"), ("abc", "abc"), ("abc", "abd"), ("", "xy")))
  }

  test("strict < and reversed operand order both band") {
    pairsView()
    val q = spark.sql(
      "SELECT count(*) AS n FROM lev_pairs WHERE 2 > levenshtein(a, b)")
    assert(levCalls(q) === Seq(Some(1)))
    assert(q.collect().head.getLong(0) === 2L) // d=0 and d=1
  }

  test("BETWEEN becomes one banded call serving both bounds") {
    pairsView()
    val q = spark.sql(
      "SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) BETWEEN 1 AND 2")
    assert(levCalls(q) === Seq(Some(2)),
      "two-sided band must evaluate levenshtein once, bounded at the upper")
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("flaw", "lawn"), ("abc", "abd"), ("", "xy")))
  }

  test("equality rewrites; lone lower bound is left unbounded") {
    pairsView()
    val eq = spark.sql(
      "SELECT count(*) AS n FROM lev_pairs WHERE levenshtein(a, b) = 3")
    assert(levCalls(eq) === Seq(Some(3)))
    assert(eq.collect().head.getLong(0) === 1L) // kitten/sitting

    val lower = spark.sql(
      "SELECT count(*) AS n FROM lev_pairs WHERE levenshtein(a, b) >= 3")
    assert(levCalls(lower) === Seq(None), "no finite band — untouched")
    assert(lower.collect().head.getLong(0) === 2L) // d=3, d=8
  }

  test("projection-context rewrite keeps boolean values and NULLs") {
    pairsView()
    val q = spark.sql(
      "SELECT a, b, levenshtein(a, b) <= 1 AS close FROM lev_pairs")
    assert(levCalls(q) === Seq(Some(1)))
    val rows = q.collect()
    val byPair = rows.map(r =>
      (Option(r.getString(0)), Option(r.getString(1))) ->
        (if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap
    assert(byPair((Some("abc"), Some("abd"))) === Some(true))
    assert(byPair((Some("flaw"), Some("lawn"))) === Some(false))
    assert(byPair((Some("a"), None)) === None, "null stays null")
    assert(byPair((None, Some("b"))) === None)
  }

  test("vacuous negative threshold is not rewritten but stays correct") {
    pairsView()
    val q = spark.sql(
      "SELECT count(*) AS n FROM lev_pairs WHERE levenshtein(a, b) <= -1")
    assert(q.collect().head.getLong(0) === 0L)
  }

  test("strict bounds at the int extremes do not wrap") {
    // `lev < Int.MinValue` is always false; a naive k-1 canonicalization
    // wraps to Int.MaxValue and rewrites it to the always-TRUE
    // `lev3(MaxValue) >= 0`. Same for `lev > Int.MaxValue` via j+1.
    pairsView()
    val lo = spark.sql(
      s"SELECT count(*) AS n FROM lev_pairs WHERE levenshtein(a, b) < ${Int.MinValue}")
    assert(lo.collect().head.getLong(0) === 0L)
    val hi = spark.sql(
      s"SELECT count(*) AS n FROM lev_pairs WHERE levenshtein(a, b) > ${Int.MaxValue}")
    assert(hi.collect().head.getLong(0) === 0L)
  }
}
