package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bloom-filter semi-join reduction — the "ship the filter, not the
  * table" pattern a 100 TB fact⋈dim join lives on.
  *
  * Problem shape: the dim side shrinks to a few thousand keys after
  * its predicate, but the fact side is the 100 TB table. A plain join
  * shuffles (or at best scans-and-broadcast-probes) EVERY fact row;
  * rows that can never match still pay scan → project → exchange.
  * The fix: aggregate the filtered dim keys into a Bloom filter (a
  * few hundred KB for ~1% fpp), ship that ONE value into the fact
  * scan via a scalar subquery, and drop non-members inside the scan
  * stage — before any exchange. Only the ~matching fraction of the
  * 100 TB ever leaves the scan.
  *
  * Spark has this built in as an optimizer rule
  * (`InjectRuntimeFilter`), but it is off by default and gated on
  * size thresholds/hints the plan can miss; this operator states the
  * reduction EXPLICITLY, so the plan is guaranteed, portable, and
  * visible to tests (PlanPropertiesSpec pins `might_contain` riding
  * the fact scan's filter).
  *
  * Exactness: a Bloom filter admits false positives, never false
  * negatives — membership-test rows that pass are re-checked by the
  * exact equi-join downstream, so the composed result is provably
  * identical to the plain join (the DuckDB oracle runs the plain
  * join). An EMPTY dim side yields a null filter, `might_contain`
  * evaluates null, and the pre-filter drops every row — which is the
  * empty join's answer too (spec-pinned).
  *
  * The SQL surface is used on purpose: `BloomFilterMightContain`
  * requires its filter argument to be foldable or a scalar subquery
  * (an attribute from a joined 1-row frame is rejected by its type
  * check), and a scalar subquery is exactly the broadcast-one-value
  * semantics wanted here. `might_contain` / `bloom_filter_agg` are
  * registered by [[graft.GraftExtensions]].
  *
  * Reference anchor: the reference's enrichment joins
  * (StreamingWithKafkaJoinedData.scala:43-50) are all small-dim⋈fact;
  * this is that join re-expressed for the case where "small" means
  * "fits in a Bloom filter", not "fits in RAM".
  */
object BloomJoin {

  /** Temp-view names are session-global state: a per-invocation serial
    * keeps two concurrent/nested bloom joins on the same key names from
    * clobbering each other's views. */
  private val viewSerial = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Revenue by nation for suppliers in one region, with the lineitem
    * scan pre-filtered by a Bloom filter over the qualifying supplier
    * keys. `bitsPerKey` = 8 ⇒ ~2% false-positive rate — false
    * positives only waste a row through the exact join, they never
    * change the result. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    estKeys: Long = 10000L, bitsPerKey: Int = 8): DataFrame = {
    require(estKeys > 0 && bitsPerKey > 0)
    val spark = fact.sparkSession
    val serial = viewSerial.incrementAndGet()
    val dv = s"graft_bloom_dim_${dimKey}_$serial"
    val fv = s"graft_bloom_fact_${factKey}_$serial"
    dim.createOrReplaceTempView(dv)
    fact.createOrReplaceTempView(fv)
    val pruned = spark.sql(
      s"""SELECT * FROM $fv
         |WHERE might_contain(
         |  (SELECT bloom_filter_agg(xxhash64($dimKey),
         |                           CAST($estKeys AS BIGINT),
         |                           CAST(${estKeys * bitsPerKey} AS BIGINT))
         |   FROM $dv),
         |  xxhash64($factKey))""".stripMargin)
    // exact verification join: removes bloom false positives, attaches
    // the dim attributes — output ≡ plain fact⋈dim. The views are only
    // needed while the SQL above resolves; drop them so repeated calls
    // don't accumulate catalog entries.
    spark.catalog.dropTempView(dv)
    spark.catalog.dropTempView(fv)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Query: ASIA suppliers' revenue by nation, fact side pre-pruned by
    * the supplier-key Bloom filter. ~20% of suppliers qualify, so at
    * scale ~80% of lineitem dies in the scan stage instead of
    * shuffling. */
  def bloomSemiJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    val fact = Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_extendedprice", "l_discount")
    bloomSemiJoin(fact, dim, "l_suppkey", "s_suppkey")
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val oracles: Map[String, String] = Map(
    // the bloom pre-filter is semantically invisible: the oracle is the
    // PLAIN join — any false-negative bug in the bloom path breaks the
    // hash compare
    "bloom_semi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
  )
}
