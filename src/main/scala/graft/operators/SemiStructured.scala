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

  /** Heterogeneous-payload CTE shared by the open-schema queries: the
    * synthetic `events.props` is uniformly `{"k": int}`, so the mixed
    * shapes VARIANT exists for are derived deterministically from
    * `event_id` — the SAME string-concat SQL runs in Spark and in the
    * DuckDB oracle, so only the extraction path differs. */
  private val mixedPayload =
    """SELECT event_type,
      |  CASE event_id % 4
      |    WHEN 0 THEN '{"k": ' || CAST(event_id % 100 AS STRING) || '}'
      |    WHEN 1 THEN '{"k": "v' || CAST(event_id % 100 AS STRING) || '"}'
      |    WHEN 2 THEN '{"k": [' || CAST(event_id % 100 AS STRING) || ', ' ||
      |      CAST((event_id + 1) % 100 AS STRING) || ']}'
      |    ELSE '{"k": {"x": ' || CAST(event_id % 100 AS STRING) || '}}'
      |  END AS p
      |FROM events""".stripMargin

  /** Ragged-array payload CTE for the explode query (1–3 elements). */
  private val itemsPayload =
    """SELECT event_type,
      |  CASE event_id % 3
      |    WHEN 0 THEN '{"items": [' || CAST(event_id % 7 AS STRING) || ']}'
      |    WHEN 1 THEN '{"items": [' || CAST(event_id % 7 AS STRING) || ', ' ||
      |      CAST(event_id * 3 % 11 AS STRING) || ']}'
      |    ELSE '{"items": [' || CAST(event_id % 7 AS STRING) || ', ' ||
      |      CAST(event_id * 3 % 11 AS STRING) || ', ' ||
      |      CAST(event_id * 7 % 13 AS STRING) || ']}'
      |  END AS p
      |FROM events""".stripMargin

  /** Per-event-type optional fields — the open-schema shape the
    * reference's JSON stream has (each producer adds its own keys). */
  private val openPayload =
    """SELECT event_type,
      |  CASE event_type
      |    WHEN 'click' THEN '{"k": ' || CAST(event_id % 100 AS STRING) ||
      |      ', "btn": "b' || CAST(event_id % 3 AS STRING) || '"}'
      |    WHEN 'view' THEN '{"k": ' || CAST(event_id % 100 AS STRING) ||
      |      ', "dur_ms": ' || CAST(event_id % 5000 AS STRING) || '}'
      |    WHEN 'purchase' THEN '{"k": ' || CAST(event_id % 100 AS STRING) ||
      |      ', "amount_cents": ' || CAST(event_id % 100000 AS STRING) ||
      |      ', "cur": "USD"}'
      |    WHEN 'error' THEN '{"k": ' || CAST(event_id % 100 AS STRING) ||
      |      ', "code": ' || CAST(400 + event_id % 100 AS STRING) || '}'
      |    ELSE '{"k": ' || CAST(event_id % 100 AS STRING) ||
      |      ', "plan": "p' || CAST(event_id % 4 AS STRING) || '"}'
      |  END AS p
      |FROM events""".stripMargin

  /** Shape census of a mixed-type field: `schema_of_variant` tags each
    * row's `$.k` (scalar int / string / array / object) and
    * `try_variant_get` null-safely extracts the int subset. At scale
    * this is the "what does this payload field actually contain" query
    * that precedes schema-on-read decisions; one scan, one 20-row
    * exchange. */
  def variantShapeStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(
      s"""WITH payload AS ($mixedPayload),
         |typed AS (
         |  SELECT event_type, variant_get(parse_json(p), '$$.k') AS v
         |  FROM payload)
         |SELECT event_type,
         |  CASE WHEN schema_of_variant(v) = 'BIGINT' THEN 'int'
         |       WHEN schema_of_variant(v) = 'STRING' THEN 'str'
         |       WHEN schema_of_variant(v) LIKE 'ARRAY%' THEN 'arr'
         |       ELSE 'obj' END AS shape,
         |  count(*) AS n,
         |  count(try_variant_get(v, '$$', 'bigint')) AS n_int,
         |  CAST(sum(try_variant_get(v, '$$', 'bigint')) AS BIGINT) AS sum_int
         |FROM typed
         |GROUP BY 1, 2
         |ORDER BY event_type, shape""".stripMargin)
  }

  /** Ragged nested arrays via the `variant_explode` lateral TVF:
    * pos/value pairs come straight out of the variant binary encoding
    * (no re-parse per element). The aggregate keeps position
    * sensitivity (`sum(pos*val)`) so element order is verified, not
    * just the multiset. */
  def variantExplodeItems(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(
      s"""WITH payload AS ($itemsPayload),
         |ex AS (
         |  SELECT t.event_type, e.pos,
         |    try_variant_get(e.value, '$$', 'bigint') AS val
         |  FROM payload t,
         |  LATERAL variant_explode(variant_get(parse_json(t.p), '$$.items')) AS e)
         |SELECT event_type,
         |  count(*) AS n_items,
         |  CAST(sum(val) AS BIGINT) AS sum_val,
         |  CAST(sum(pos * val) AS BIGINT) AS sum_pos_val,
         |  max(pos) AS max_pos
         |FROM ex
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
  }

  /** Open-schema field extraction: each event type carries its own
    * optional keys; `try_variant_get` returns NULL (not an error) for
    * absent paths, so ONE query spans the union schema without a
    * closed `from_json` struct — the VARIANT answer to the reference's
    * producer-defined JSON (StreamingWithKafka.scala:22-27). */
  def variantOpenFields(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(
      s"""WITH payload AS ($openPayload),
         |typed AS (SELECT event_type, parse_json(p) AS v FROM payload)
         |SELECT event_type,
         |  count(*) AS n,
         |  count(try_variant_get(v, '$$.k', 'bigint')) AS n_k,
         |  count(try_variant_get(v, '$$.btn', 'string')) AS n_btn,
         |  count(DISTINCT try_variant_get(v, '$$.plan', 'string')) AS n_plans,
         |  CAST(sum(try_variant_get(v, '$$.dur_ms', 'bigint')) AS BIGINT)
         |    AS sum_dur_ms,
         |  CAST(sum(try_variant_get(v, '$$.amount_cents', 'bigint')) AS BIGINT)
         |    AS sum_amount_cents,
         |  count(CASE WHEN try_variant_get(v, '$$.code', 'bigint')
         |    BETWEEN 400 AND 499 THEN 1 END) AS n_4xx
         |FROM typed
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
  }

  // The outer CAST on every sum matters: DuckDB sum(BIGINT) returns
  // HUGEINT, which the driver's hash path reads as float64 while Spark
  // emits int64 — identical values, mismatching hashes. Casting back to
  // BIGINT keeps the oracle's wire type identical to Spark's.
  val oracles: Map[String, String] = Map(
    "variant_shape_stats" ->
      s"""WITH payload AS ($mixedPayload),
         |typed AS (
         |  SELECT event_type, json_type(p, '$$.k') AS jt,
         |    TRY_CAST(json_extract_string(p, '$$.k') AS BIGINT) AS ki
         |  FROM payload)
         |SELECT event_type,
         |  CASE WHEN jt IN ('UBIGINT', 'BIGINT') THEN 'int'
         |       WHEN jt = 'VARCHAR' THEN 'str'
         |       WHEN jt = 'ARRAY' THEN 'arr'
         |       ELSE 'obj' END AS shape,
         |  count(*) AS n,
         |  count(ki) AS n_int,
         |  CAST(sum(ki) AS BIGINT) AS sum_int
         |FROM typed
         |GROUP BY 1, 2
         |ORDER BY event_type, shape""".stripMargin,
    "variant_explode_items" ->
      s"""WITH payload AS ($itemsPayload),
         |ex AS (
         |  SELECT event_type,
         |    unnest(list_transform(
         |      CAST(json_extract(p, '$$.items') AS BIGINT[]),
         |      (x, i) -> {'val': x, 'pos': i - 1})) AS e
         |  FROM payload)
         |SELECT event_type,
         |  count(*) AS n_items,
         |  CAST(sum(e.val) AS BIGINT) AS sum_val,
         |  CAST(sum(e.pos * e.val) AS BIGINT) AS sum_pos_val,
         |  CAST(max(e.pos) AS INT) AS max_pos
         |FROM ex
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,
    "variant_open_fields" ->
      s"""WITH payload AS ($openPayload)
         |SELECT event_type,
         |  count(*) AS n,
         |  count(TRY_CAST(json_extract_string(p, '$$.k') AS BIGINT)) AS n_k,
         |  count(json_extract_string(p, '$$.btn')) AS n_btn,
         |  count(DISTINCT json_extract_string(p, '$$.plan')) AS n_plans,
         |  CAST(sum(TRY_CAST(json_extract_string(p, '$$.dur_ms') AS BIGINT))
         |    AS BIGINT) AS sum_dur_ms,
         |  CAST(sum(TRY_CAST(json_extract_string(p, '$$.amount_cents') AS BIGINT))
         |    AS BIGINT) AS sum_amount_cents,
         |  count(CASE WHEN TRY_CAST(json_extract_string(p, '$$.code') AS BIGINT)
         |    BETWEEN 400 AND 499 THEN 1 END) AS n_4xx
         |FROM payload
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,
    "variant_props_stats" ->
      """SELECT event_type,
        |  count(*) AS n,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS distinct_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
