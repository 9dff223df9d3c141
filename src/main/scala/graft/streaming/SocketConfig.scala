package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader

/** Socket text-source configuration builder — the last reference
  * surface (structured/Basic.scala:16-20 and BasicStreaming.scala:14-16
  * read `socketTextStream`-style line feeds). Unlike the Kafka
  * connector, the socket source ships in Spark core ("socket" format),
  * so this builder is exercised END-TO-END in tests against a real
  * local server socket.
  *
  * The socket source is a dev/debug tool (no replay, no offsets — it
  * cannot provide fault-tolerance guarantees); production line feeds
  * belong on Kafka via KafkaConfig. Kept because every reference
  * quickstart begins here.
  */
object SocketConfig {

  /** @param includeTimestamp adds the arrival `timestamp` column the
    *   reference's windowed wordcount variants group on. */
  case class Source(host: String, port: Int, includeTimestamp: Boolean = false) {

    def options: Map[String, String] = Map(
      "host" -> host,
      "port" -> port.toString,
      "includeTimestamp" -> includeTimestamp.toString)

    def reader(spark: SparkSession): DataStreamReader =
      spark.readStream.format("socket").options(options)

    /** value: string (+ timestamp when configured) line frame. */
    def lines(spark: SparkSession): DataFrame = reader(spark).load()
  }
}
