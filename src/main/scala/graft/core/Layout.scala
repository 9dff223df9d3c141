package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the two shuffle problems a 100 TB join
  * hits: repeated shuffles of the same fact table (→ bucketing) and
  * hot keys that overwhelm one reducer (→ salting).
  */
object Layout {

  /** Write `df` as a bucketed (and optionally sorted) managed table.
    * Two tables bucketed by their join key into the same bucket count
    * sort-merge-join with NO exchange on either side — the shuffle is
    * paid once at layout time and amortized over every subsequent
    * join (the classic fact-table co-location strategy; at 100 TB this
    * is the difference between re-shuffling terabytes per query and
    * none). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.format("parquet").saveAsTable(table)
  }

  /** Range join (point-in-interval) WITHOUT an equi-key, executed as
    * an equi-join on fixed-width bins: each interval replicates to the
    * bins it spans, each point lands in exactly one bin, and only
    * co-binned rows ever meet — Spark's native plan for this predicate
    * is a nested-loop cross product, which is a non-starter at scale.
    * `binWidth` trades replication (intervals spanning many bins)
    * against bin population; pick it near the median interval span.
    * Values must be non-negative (epoch seconds, offsets). */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__graft_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__graft_bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    p.join(i, p("__graft_bin") === i("__graft_bin") &&
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_bin")
  }

  /** Salted equi-join for skewed keys (the manual fallback when AQE's
    * skew-join can't help, e.g. for aggregations-after-join or on
    * engines without AQE).
    *
    * The skewed LEFT side gets a deterministic salt in [0, salts) from
    * `saltBy` — pass a column expression that VARIES WITHIN the hot key
    * (e.g. hash of the row's other columns); the RIGHT side is
    * replicated `salts` times so every (key, salt) combination still
    * meets. The hot key's rows now spread over `salts` reducers at the
    * cost of an O(salts) blow-up of the right side — use for
    * fact⋈dim joins where the dim side is small enough to replicate
    * but too big (or too slow) to broadcast. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0)
    // coalesce: a NULL saltBy row must still join (salt 0), not
    // silently vanish because NULL === salt never matches
    val l = left.withColumn("__graft_salt",
      coalesce(pmod(saltBy, lit(salts)), lit(0)))
    val r = right.withColumn("__graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__graft_salt") === r("__graft_salt"))
      .drop("__graft_salt")
  }
}
