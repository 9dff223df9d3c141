package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** Kafka source/sink configuration builders — the option plumbing every
  * reference main hand-writes (readStream.format("kafka").option(...),
  * e.g. StreamingWithKafka.scala:15-21).
  *
  * The kafka connector jar is not on this container's classpath, so
  * these builders are exercised at the configuration level in tests;
  * against a real cluster the same objects drive the actual connector.
  */
object KafkaConfig {

  /** Source-side config. `startingOffsets`: "earliest" | "latest" |
    * per-partition JSON. `maxOffsetsPerTrigger` bounds per-batch intake
    * — the backpressure knob that keeps batch duration stable when the
    * topic backlogs (critical at production scale; unbounded catch-up
    * reads stall the query). */
  case class Source(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = true,
      maxOffsetsPerTrigger: Option[Long] = None,
      extra: Map[String, String] = Map.empty) {

    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topics.mkString(","),
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
        extra

    def reader(spark: SparkSession): DataStreamReader =
      spark.readStream.format("kafka").options(options)
  }

  /** Sink-side config: target topic + checkpoint (mandatory for the
    * kafka sink's exactly-once-per-epoch offsets). */
  case class Sink(
      bootstrapServers: String,
      topic: String,
      checkpointLocation: String,
      extra: Map[String, String] = Map.empty) {

    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "topic" -> topic,
        "checkpointLocation" -> checkpointLocation) ++ extra

    def writer(df: DataFrame, keyCol: String): DataStreamWriter[Row] =
      Sinks.kafkaShaped(df, keyCol)
        .writeStream.format("kafka").options(options)
  }

  /** Decode the kafka wire frame (key/value binary + metadata) into
    * string payloads — the CAST(value AS STRING) step every reference
    * job starts with (StreamingWithKafka.scala:22). Works on any frame
    * with kafka's column layout, batch or stream. */
  def decodeWireFrame(kafka: DataFrame): DataFrame =
    kafka.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))
}
