package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables sort-merge-join with zero exchanges") {
    val facts = (1L to 1000L).map(i => (i % 100, s"o$i")).toDF("key", "payload")
    val dims  = (0L until 100L).map(i => (i, s"d$i")).toDF("key", "name")
    Layout.writeBucketed(facts, "graft_b_facts", "key", 8, sortCols = Seq("key"))
    Layout.writeBucketed(dims, "graft_b_dims", "key", 8, sortCols = Seq("key"))

    // deterministic plan: no AQE re-planning, no broadcast shortcut
    val old = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_b_facts")
        .join(spark.table("graft_b_dims"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", old._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._2)
      spark.sql("DROP TABLE graft_b_facts")
      spark.sql("DROP TABLE graft_b_dims")
    }
  }

  test("binnedRangeJoin: same rows as the naive range join, but never a cartesian plan") {
    val rnd = new scala.util.Random(77)
    val points = (1 to 300).map(_ => rnd.nextInt(10000).toLong).toDF("p")
    val intervals = (1 to 40).map { _ =>
      val s = rnd.nextInt(9500).toLong; (s, s + 1 + rnd.nextInt(800))
    }.toDF("s", "e")

    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val binned = Layout.binnedRangeJoin(points, "p", intervals, "s", "e", binWidth = 500)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(binned === naive)
    assert(naive.nonEmpty)

    val plan = Layout.binnedRangeJoin(points, "p", intervals, "s", "e", 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join must stay an equi-join on bins:\n$plan")
  }

  test("saltedJoin: same result as the plain join, hot key spread across salts") {
    // 90% of rows share one hot key
    val left = (1L to 2000L).map(i => (if (i % 10 == 0) i % 7 else 42L, i))
      .toDF("k", "row_id")
    val right = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")

    val plain = left.join(right, left("k") === right("k"))
      .select("row_id", "v").as[(Long, String)].collect().toSet
    val salted = Layout.saltedJoin(left, right, "k", "k",
        salts = 8, saltBy = hash(col("row_id")))
      .select("row_id", "v").as[(Long, String)].collect().toSet
    assert(salted === plain)

    // the hot key's rows really do carry multiple distinct salts
    val spread = left.filter(col("k") === 42L)
      .select(pmod(hash(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 4)
  }
}
