package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** The reference's Kafka sensor pipeline, re-expressed Spark-first.
  *
  * The reference (streaming/structured/StreamingWithKafka.scala:22-38,
  * ParquetOutput.scala:25-46, StreamingWithKafkaJoinedData.scala:23-52,
  * UdfRegister.scala:13-28) hand-wires each stage inside a main(). Here
  * every stage is a pure `DataFrame => DataFrame` transform, so the SAME
  * code serves batch (driver oracle) and Structured Streaming (see
  * graft.streaming.StreamPipelines) — Spark's unified model replaces the
  * reference's per-job wiring.
  */
object SensorPipeline {

  /** Schema of the `events.props` JSON payload. */
  val propsSchema: StructType = StructType(StructField("k", LongType) :: Nil)

  /** from_json decode + flatten: mirrors the reference's
    * CAST(value AS STRING) -> from_json(nested schema) -> select-flatten
    * (StreamingWithKafka.scala:23-36). Works on any frame with a string
    * `props` column — batch or stream. */
  def jsonFlatten(events: DataFrame): DataFrame =
    events
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .select(
        col("event_id"), col("event_type"),
        col("parsed.k").as("k"),
        round(col("value"), 2).as("value"))

  def jsonFlattenQuery(spark: SparkSession, dir: String): DataFrame =
    jsonFlatten(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** Timestamp parse/format + month partition column: mirrors
    * ParquetOutput.scala:42-44 (unix_timestamp/from_unixtime round-trip,
    * date_format month derivation). Emits strings/bigints for oracle
    * parity. */
  def tsParseFormat(events: DataFrame): DataFrame = {
    val dateStr = date_format(col("ts"), "yyyy/MM/dd HH:mm:ss")
    events.select(
      col("event_id"),
      dateStr.as("date_str"),
      // parse the formatted string back — exercises to_timestamp like the
      // reference's from_unixtime(unix_timestamp(..)) round-trip
      unix_timestamp(to_timestamp(dateStr, "yyyy/MM/dd HH:mm:ss")).as("epoch_s"),
      date_format(col("ts"), "yyyyMM").as("month"))
  }

  def tsParseFormatQuery(spark: SparkSession, dir: String): DataFrame =
    tsParseFormat(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** Stream-static enrichment join: mirrors
    * StreamingWithKafkaJoinedData.scala:42-52 (left_outer join of the
    * stream against a static dim, after a rename).
    *
    * The stream-static-enrich pattern WANTS a broadcast, but the dim here
    * is unbounded (customer scales with SF), so the hint is opt-in:
    * callers that know their dim is bounded (a config table, a filtered
    * slice) pass broadcastDim=true; otherwise AQE decides from actual
    * size — an unconditional hint on an unbounded dim OOMs at 100 TB. */
  def enrichJoin(events: DataFrame, dim: DataFrame,
                 broadcastDim: Boolean = false): DataFrame = {
    val renamed = events.withColumnRenamed("user_id", "cust_id")
    val d = if (broadcastDim) broadcast(dim) else dim
    renamed.join(d, renamed("cust_id") === dim("c_custkey"), "left_outer")
      .select(
        col("event_id"), col("cust_id"), col("c_name"), col("c_mktsegment"),
        round(col("value"), 2).as("value"))
  }

  def enrichJoinQuery(spark: SparkSession, dir: String): DataFrame =
    enrichJoin(Tables.events(spark, dir), Tables.customer(spark, dir))
      .orderBy(col("event_id"))

  /** Scalar UDF registration: mirrors UdfRegister.scala:13-28
    * (`doubleString`). Registered for SQL use AND provided as a native
    * codegen'd column (concat) — the hot path should use the native form. */
  def registerDoubleString(spark: SparkSession): Unit =
    // null guard: a bare s + s yields "nullnull" for NULL input,
    // diverging from both concat() and SQL || semantics
    spark.udf.register("double_string",
      (s: String) => if (s == null) null else s + s)

  def doubleStringNative(c: Column): Column = concat(c, c)

  def udfDoubleStringQuery(spark: SparkSession, dir: String): DataFrame = {
    registerDoubleString(spark)
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    spark.sql(
      """SELECT c_custkey, c_mktsegment,
        | double_string(c_mktsegment) AS doubled_udf,
        | concat(c_mktsegment, c_mktsegment) AS doubled_native
        |FROM graft_customer ORDER BY c_custkey""".stripMargin)
  }

  /** Typed view of a decoded event — the case-class Encoder path of the
    * reference's Dataset[SensorData] (cassandra/StreamingWithCasssandra
    * .scala:10-19,62-67). `k` is Option: rows whose props payload fails
    * to decode carry None, exactly like from_json's null. */
  case class SensorReading(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double, k: Option[Long])

  /** Decode the raw events frame into a typed Dataset. Works on batch
    * and streaming frames alike (the encoder is schema-driven).
    *
    * Scale note: the typed path exists for type-safe consumers
    * (ForeachWriter sinks, domain logic); typed lambdas deserialize
    * every row and break column pruning/pushdown, so HOT paths should
    * stay columnar — see the paired column-based ops above. */
  def typedReadings(events: DataFrame): Dataset[SensorReading] = {
    import events.sparkSession.implicits._
    events
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("parsed.k").as("k"))
      .as[SensorReading]
  }

  /** Typed filter + map demonstrating the encoder round-trip (the
    * reference's Dataset-lambda style): keep high-value readings,
    * double the value. Emitted via a columnar projection so the oracle
    * compares rounded doubles. */
  def typedFilterMapQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    typedReadings(Tables.events(spark, dir))
      .filter(r => r.value >= 50.0)
      .map(r => (r.event_id, r.event_type, r.value * 2))
      .toDF("event_id", "event_type", "value_x2")
      .select(col("event_id"), col("event_type"),
        round(col("value_x2"), 2).as("value_x2"))
      .orderBy(col("event_id"))
  }

  /** to_json(struct(..)) re-serialization: mirrors the Kafka-sink frame
    * shape of StreamingWithKafkaJoinedData.scala:55 (string/long fields
    * only — double JSON formatting differs across engines). */
  def toJsonStruct(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      to_json(struct(col("event_id"), col("event_type"))).as("js"))

  def toJsonStructQuery(spark: SparkSession, dir: String): DataFrame =
    toJsonStruct(Tables.events(spark, dir)).orderBy(col("event_id"))

  val oracles: Map[String, String] = Map(
    "json_flatten" ->
      """SELECT event_id, event_type,
        | CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        | round(value, 2) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "ts_parse_format" ->
      """SELECT event_id,
        | strftime(ts, '%Y/%m/%d %H:%M:%S') AS date_str,
        | CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        | strftime(ts, '%Y%m') AS month
        |FROM events ORDER BY event_id""".stripMargin,
    "enrich_join" ->
      """SELECT event_id, user_id AS cust_id, c_name, c_mktsegment,
        | round(value, 2) AS value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,
    "udf_double_string" ->
      """SELECT c_custkey, c_mktsegment,
        | c_mktsegment || c_mktsegment AS doubled_udf,
        | c_mktsegment || c_mktsegment AS doubled_native
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "to_json_struct" ->
      """SELECT event_id,
        | '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS js
        |FROM events ORDER BY event_id""".stripMargin,
    "typed_filter_map" ->
      """SELECT event_id, event_type, round(value * 2, 2) AS value_x2
        |FROM events WHERE value >= 50.0 ORDER BY event_id""".stripMargin,
  )
}
