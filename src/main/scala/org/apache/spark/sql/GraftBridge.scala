package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the private[sql] Column ⇄ catalyst Expression converters —
  * the minimum surface a library needs to expose a custom native
  * Expression through the public Column API (the same technique
  * established Spark extension libraries use). Nothing else from the
  * private API is touched.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager local checkpoint that does NOT capture origin statistics or
    * constraints, for ITERATIVE fixpoint loops.
    *
    * Why `Dataset.localCheckpoint` can't be used there: it records the
    * checkpointed plan's estimated `Statistics` into the resulting
    * LogicalRDD. The size-only estimator multiplies join children's
    * sizeInBytes, so checkpoint-of-checkpoint chains compound the
    * estimate GEOMETRICALLY — measured in the connectedComponents loop,
    * sizeInBytes reached a 53-million-BIT BigInt by round 13 and every
    * later stats access spent whole seconds multiplying those numbers
    * (driver-side, between jobs — invisible in the Spark UI).
    *
    * This variant keeps what iteration needs — materialized RDD,
    * truncated lineage, preserved physical output partitioning /
    * ordering so co-partitioned round joins plan zero exchanges — and
    * drops the stats capture: the frame reports the default (huge)
    * size, which also guarantees the optimizer never tries to
    * auto-broadcast a frame whose size it cannot actually know.
    */
  def localCheckpointFlat(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.queryExecution.asInstanceOf[execution.QueryExecution]
    val internalRdd = qe.toRdd.map(_.copy())
    internalRdd.localCheckpoint()
    internalRdd.count()
    val plan = LogicalRDD(
      qe.analyzed.output, internalRdd,
      qe.executedPlan.outputPartitioning, qe.executedPlan.outputOrdering,
      isStreaming = false)(spark)
    classic.Dataset.ofRows(spark, plan)
  }
}
