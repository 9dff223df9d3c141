package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Survey #14: Kafka source/sink config builders (connector jar absent
  * locally — exercised at option/shape level; the same objects drive
  * the real connector on a cluster). */
class KafkaConfigSpec extends SparkSpec {
  import spark.implicits._

  test("source builder emits the full option set") {
    val src = KafkaConfig.Source(
      bootstrapServers = "broker1:9092,broker2:9092",
      topics = Seq("sensors", "sensors-dlq"),
      startingOffsets = "earliest",
      failOnDataLoss = false,
      maxOffsetsPerTrigger = Some(500000L),
      extra = Map("kafka.security.protocol" -> "SSL"))
    assert(src.options === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "sensors,sensors-dlq",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "500000",
      "kafka.security.protocol" -> "SSL"))
    // reader is constructible (format/options applied) without a broker
    src.reader(spark)
  }

  test("sink builder emits topic + checkpoint options") {
    val snk = KafkaConfig.Sink("broker:9092", "out-topic", "/tmp/ck")
    assert(snk.options === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "topic" -> "out-topic",
      "checkpointLocation" -> "/tmp/ck"))
  }

  test("wire-frame decode casts key/value binary to string") {
    val frame = Seq(
      (Array[Byte]('k'), "payload".getBytes("UTF-8"), "t", 0, 42L,
        Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val decoded = KafkaConfig.decodeWireFrame(frame)
    val r = decoded.select("key", "value").as[(String, String)].collect().head
    assert(r === (("k", "payload")))
  }
}
