package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The oracle pins bloom_semi_join's values; these pin the two things
  * a hash compare can't show — that the bloom pre-filter is really in
  * the plan (not optimized away), and that it is semantically
  * invisible (exact parity with the plain join, including the empty
  * dim edge where might_contain evaluates null). */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = (1L to 2000L).map(i => (i % 100, i))
    .toDF("f_key", "f_val")
  private val dim = (0L until 100L).filter(_ % 7 == 0).map(i => (i, s"d$i"))
    .toDF("d_key", "d_name")

  test("bloom semi join equals the plain join exactly") {
    val got = BloomJoin.bloomSemiJoin(fact, dim, "f_key", "d_key",
      estKeys = 100L)
      .select("f_key", "f_val", "d_name")
      .as[(Long, Long, String)].collect().sorted
    val want = fact.join(dim, $"f_key" === $"d_key")
      .select("f_key", "f_val", "d_name")
      .as[(Long, Long, String)].collect().sorted
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("the bloom membership test rides the fact side of the plan") {
    val plan = BloomJoin.bloomSemiJoin(fact, dim, "f_key", "d_key")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom pre-filter missing from plan:\n$plan")
  }

  test("empty dim side yields the empty join, not a pass-through") {
    val noDim = dim.filter($"d_key" < 0)
    val got = BloomJoin.bloomSemiJoin(fact, noDim, "f_key", "d_key")
    assert(got.count() === 0)
  }

  test("invalid sizing is rejected eagerly") {
    intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(fact, dim, "f_key", "d_key", estKeys = 0L)
    }
  }
}
