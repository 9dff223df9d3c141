package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Layout, Tables}

/** Query surface for the physical-layout tools (graft.core.Layout).
  *
  * `zorder_key` materializes the Morton interleave itself so the
  * DuckDB oracle can pin the exact bit arithmetic — the layout WRITE
  * path (Layout.writeZOrdered) and the row-group-skipping payoff are
  * covered by ZOrderSpec, which measures rows actually read under a
  * box filter against a single-column-sorted layout.
  */
object LayoutOps {

  /** Z-order bits for the events grid: user bucket × value bucket.
    * 10 bits/dim covers user_id (≤ 2^10) and floor(value) (≤ 327 on
    * the synthetic data; clamped defensively so the key stays valid if
    * a larger SF widens the value range — the oracle clamps the same
    * way). */
  private val ZBits = 10

  /** Per-event Z-order key on (user_id, floor(value)): the key a
    * 100 TB event table would be laid out by so per-user time/value
    * box scans prune row groups in both dimensions at once. */
  def zorderKeyQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val x = col("user_id")
    val y = least(floor(col("value")).cast("long"), lit((1L << ZBits) - 1))
    events.select(
      col("event_id"), x.as("x"), y.as("y"),
      Layout.zorderKey(Seq(x, y), ZBits).as("zkey"))
      .orderBy("event_id")
  }

  /** The identical interleave, spelled in ANSI SQL for the oracle. */
  private def zkeySql(x: String, y: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
          s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString(" | ")
  }

  val oracles: Map[String, String] = Map(
    "zorder_key" ->
      s"""SELECT event_id, x, y, ${zkeySql("x", "y", ZBits)} AS zkey
         |FROM (SELECT event_id, user_id AS x,
         |       least(CAST(floor(value) AS BIGINT), ${(1L << ZBits) - 1}) AS y
         |      FROM events)
         |ORDER BY event_id""".stripMargin
  )
}
