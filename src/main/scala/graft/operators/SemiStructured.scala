package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Semi-structured analytics over the VARIANT type (Spark 4) — the
  * scale path for JSON event payloads whose schema is open-ended.
  *
  * Why VARIANT and not `get_json_object`/`from_json` at 100 TB: string
  * JSON re-parses the full payload text on EVERY access (k accesses =
  * k parses), and `from_json` needs a closed schema up front. VARIANT
  * parses once into a binary encoding with a field dictionary; each
  * `variant_get` is then a direct binary path lookup, typed at the
  * call site, and unknown/new fields ride along untouched. Ingest
  * writes `parse_json(props)` once; every downstream query pays only
  * the lookups it performs. (Mirrors the reference's schemaless JSON
  * handling — Consumer.scala:43's parse-then-select — re-expressed as
  * the engine-native shredded encoding instead of per-query string
  * parsing.)
  *
  * The query keeps every aggregate in exact integer space (counts,
  * BIGINT sums, min/max, exact distinct) so the DuckDB oracle —
  * which replays the same typed extraction via `json_extract_string`
  * + CAST — must match bit-for-bit; no float folding order involved.
  */
object SemiStructured {

  /** Per-event-type stats of the `$.k` payload field, extracted
    * through VARIANT. parse_json runs once per row inside the scan
    * stage; the plan is scan → partial agg → final agg (one exchange
    * of 5 grouped rows). */
  def variantPropsStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(
      """SELECT event_type,
        |  count(*) AS n,
        |  count(variant_get(parse_json(props), '$.k', 'bigint')) AS n_k,
        |  sum(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k,
        |  min(variant_get(parse_json(props), '$.k', 'bigint')) AS min_k,
        |  max(variant_get(parse_json(props), '$.k', 'bigint')) AS max_k,
        |  count(DISTINCT variant_get(parse_json(props), '$.k', 'bigint'))
        |    AS distinct_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  val oracles: Map[String, String] = Map(
    "variant_props_stats" ->
      """SELECT event_type,
        |  count(*) AS n,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS distinct_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
