package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dynamic partition pruning over a date-partitioned layout — the
  * standard 100 TB fact-table arrangement (one directory per day,
  * pruned at runtime by the dim side's predicate). The tests pin that
  * (a) Catalyst actually injects the runtime pruning subquery for our
  * layout, and (b) the scan then READS only the matching partitions —
  * the property that turns a 100 TB scan into a per-day scan. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._


  test("a dim filter prunes fact partitions at runtime (DPP)") {
    val tmp = Files.createTempDirectory("graft_dpp").toString
    // fact: 10 day-partitions x 1000 rows, written day-partitioned —
    // the layout a daily-ingest pipeline produces
    (0 until 10000).map(i => (i % 10, i.toLong))
      .toDF("day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(s"$tmp/fact")
    // the dim must be a SOURCE with a surviving selective filter — over
    // a local relation the optimizer folds the filter away and the DPP
    // rule no longer sees a selective dim side
    val dimDir = s"$tmp/dim"
    Seq((3, "keep"), (7, "drop")).toDF("d_day", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"tag" === "keep")

    val fact = spark.read.parquet(s"$tmp/fact")
    val joined = fact.join(dim, $"day" === $"d_day")

    assert(rowsRead(joined, partitionedScansOnly = true) === 1000L,
      "scan must read only the single surviving day partition")
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"runtime partition-pruning subquery missing:\n$planStr")
    assert(joined.count() === 1000)
  }
}
