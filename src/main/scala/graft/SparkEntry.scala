package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q1_pricing_summary"     -> (Relational.q1PricingSummary _),
    "q3_top_unshipped"       -> (Relational.q3TopUnshipped _),
    "q5_region_revenue"      -> (Relational.q5RegionRevenue _),
    "top_parts_by_revenue"   -> (Relational.topPartsByRevenue _),
    "window_rank_suppliers"  -> (Relational.windowRankSuppliers _),
    "semi_anti_join"         -> (Relational.semiAntiJoin _),
    // reference-derived sensor pipeline
    "json_flatten"           -> (SensorPipeline.jsonFlattenQuery _),
    "ts_parse_format"        -> (SensorPipeline.tsParseFormatQuery _),
    "enrich_join"            -> (SensorPipeline.enrichJoinQuery _),
    "udf_double_string"      -> (SensorPipeline.udfDoubleStringQuery _),
    "to_json_struct"         -> (SensorPipeline.toJsonStructQuery _),
    // windows / state
    "tumbling_window"        -> (Windows.tumblingQuery _),
    "sliding_window"         -> (Windows.slidingQuery _),
    "stateful_running_count" -> (Windows.statefulRunningCountQuery _),
    "wordcount"              -> (Windows.wordCountQuery _),
  )

  /** DuckDB oracle SQL per query key (same parquet tables by name). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ SensorPipeline.oracles ++ Windows.oracles
}
