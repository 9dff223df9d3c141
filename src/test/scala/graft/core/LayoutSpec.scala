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

  test("bucketed corpus postings feed incremental dedup with zero corpus-side shuffles") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.Dedup

    val corpus = Seq(
      (1L, "a b c d e g"), (3L, "x y z w v u"), (5L, "m n o p q r"))
      .toDF("doc_id", "text")
    val delta = Seq((10L, "a b c d e f"), (12L, "p q r s t u"))
      .toDF("doc_id", "text")
    val (postings, corpusSets) = Dedup.corpusIndex(corpus, k = 3)
    Layout.writeBucketed(postings, "graft_b_postings", "s", 8, sortCols = Seq("s"))

    val old = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Dedup.incrementalDedupWithIndex(delta,
        spark.table("graft_b_postings"), corpusSets, k = 3, tau = 0.5)
      val plan = probe.queryExecution.executedPlan

      // the bucketed scan is actually used...
      assert(plan.collectLeaves().exists {
        case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
        case _ => false
      }, "bucketed postings scan missing from plan")
      // ...and the RAW postings are never re-shuffled: every path from
      // the bucketed scan up to its first s-keyed consumer (the df
      // aggregate / the candidate join) crosses no exchange. Downstream
      // exchanges of DERIVED frames (candidate pairs keyed by doc ids)
      // are expected — they carry candidate-sized data, not the index.
      def rawPostings(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _: ShuffleExchangeExec => false
          case n if n.getClass.getSimpleName.contains("Aggregate") => false
          case n if n.getClass.getSimpleName.contains("Join") => false
          case n => n.children.exists(rawPostings)
        }
      val reshuffled = plan.collect { case s: ShuffleExchangeExec => s }
        .exists(s => rawPostings(s.child))
      assert(!reshuffled, s"raw bucketed postings were re-shuffled:\n$plan")

      assert(probe.select("delta_id", "corpus_id").as[(Long, Long)]
        .collect().toSet === Set((10L, 1L)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", old._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._2)
      spark.sql("DROP TABLE graft_b_postings")
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

  test("AQE skew join splits a hot key carrying half the fact rows (skew=true)") {
    // SURVEY §3's standing claim — "join skew handled by AQE skew join" —
    // pinned with the mechanism by name: one hot key carries 50% of the
    // fact side, the dim side is too big to broadcast (threshold -1), and
    // the FINAL adaptive plan must mark the sort-merge join skew=true
    // (OptimizeSkewedJoin split the oversized partition). Thresholds are
    // scaled to test-sized shuffles; production keeps the defaults.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 200k fact rows: 100k on hot key 0, 100k spread over 1000 cold
      // keys; md5-hex payloads keep shuffle blocks incompressible so the
      // hot partition's bytes actually exceed the scaled threshold
      val facts = spark.range(200000L).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val dims = spark.range(1000L).select(col("id").as("k"),
        md5(concat(lit("d"), col("id").cast("string"))).as("dv"))

      val joined = facts.join(dims, "k")
      // execute THIS frame's own QueryExecution (count() would spawn a
      // separate one and leave this plan un-finalized, isFinalPlan=false)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must split the hot-key partition (skew=true):\n$plan")
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
