package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Dev probe (run manually): enumerate every registered query whose
  * optimized plan has an unpartitioned Window, and whether the window's
  * input subtree is structurally bounded (limit / literal relation). */
object WindowGateProbe {
  def boundedBelow(p: LogicalPlan): Boolean = p.exists {
    case _: GlobalLimit | _: LocalLimit | _: LocalRelation | _: OneRowRelation => true
    case _ => false
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val wins = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
        val unbounded = wins.filterNot(w => boundedBelow(w.child))
        if (wins.nonEmpty)
          println(s"PROBE $name: ${wins.size} unpartitioned windows, " +
            s"${unbounded.size} unbounded" +
            (if (unbounded.nonEmpty)
               unbounded.map(w => "\n  CHILD: " +
                 w.child.getClass.getSimpleName + " / " +
                 w.child.toString.linesIterator.take(3).mkString(" | "))
                 .mkString
             else ""))
      } catch { case e: Throwable =>
        println(s"PROBE $name: ERROR ${e.getMessage.take(120)}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
