package org.apache.spark

import org.apache.spark.sql.SparkSession

/** Test-only bridge to the `private[spark]` listener bus:
  * `QueryExecutionListener` callbacks dispatch asynchronously on the
  * shared listener thread, so a scan-count accumulated in one (see
  * `graft.ScanBudgetGen.totalScanCount`) is only complete after the
  * bus drains. Polling for quiescence would make the scan-budget gate
  * timing-dependent; this makes it deterministic. */
object GraftBusDrain {
  def drain(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
