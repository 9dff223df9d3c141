package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates src/test/resources/scan_budgets.txt — the recorded
  * per-query "Scan parquet" budget PlanPropertiesSpec enforces. Run
  * after deliberately changing a query's scan shape:
  *
  *   sbt "Test/runMain graft.ScanBudgetGen"
  *
  * Counts come from the FormattedMode explain at sf0.001 — the same
  * text the PLANS.md audit renders, so the budget and the artifact
  * can't disagree about what a "scan" is. */
object ScanBudgetGen {
  def scanCount(df: org.apache.spark.sql.DataFrame): Int =
    "(?m)^\\(\\d+\\) Scan parquet".r
      .findAllIn(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)).size

  /** The budget rule, factored out so the failure path itself is
    * unit-testable: a measured count above its recorded budget — or a
    * query with no budget at all — returns a violation message naming
    * the query. Empty result = gate passes. */
  def violations(counts: Seq[(String, Int)],
                 budgets: Map[String, Int]): Seq[String] =
    counts.flatMap { case (name, n) =>
      budgets.get(name) match {
        case None => Some(s"$name: NO BUDGET recorded ($n scans) — run " +
          "sbt \"Test/runMain graft.ScanBudgetGen\"")
        case Some(b) if n > b => Some(s"$name: $n scans > budget $b " +
          "(replicated subtree? missing localCheckpoint on a reused frame?)")
        case _ => None
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1)
      else "src/test/resources/scan_budgets.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val n = scanCount(fn(spark, sfDir))
      println(s"[scan-budget] $name $n")
      s"$name $n"
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), lines.mkString("", "\n", "\n"))
    println(s"[scan-budget] wrote $out (${lines.size} queries)")
    spark.stop()
  }
}
