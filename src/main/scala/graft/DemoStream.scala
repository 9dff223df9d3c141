package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.streaming.{Sinks, StreamPipelines}

/** Self-contained streaming demo: the rate source stands in for Kafka
  * (same unbounded-source contract), synthesizing the sensor-event
  * wire format; the pipeline is the exact operator chain the oracle
  * checks in batch. Run with:
  *
  *   sbt "runMain graft.DemoStream"
  *
  * Prints ~4 trigger outputs of 10-second windowed aggregates to the
  * console, then stops. Swap the source for KafkaConfig.Source(...)
  * .reader(spark).load() + decodeWireFrame and nothing downstream
  * changes.
  */
object DemoStream {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, appName = "graft-demo")
    import spark.implicits._

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
    val events = rate.select(
      col("value").as("event_id"),
      col("timestamp").as("ts"),
      pmod(col("value"), lit(100L)).as("user_id"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase")),
        (pmod(col("value"), lit(3L)) + 1).cast("int")).as("event_type"),
      (pmod(col("value") * 37L, lit(1000L)).cast("double") / 10.0).as("value"),
      concat(lit("{\"k\": "), pmod(col("value"), lit(50L)), lit("}")).as("props"))

    val dim = spark.range(100).select(
      col("id").as("c_custkey"),
      concat(lit("cust_"), col("id")).as("c_name"),
      lit("DEMO").as("c_mktsegment"))

    val enriched = StreamPipelines.parseAndEnrich(events, dim, broadcastDim = true)
    val windowed = enriched
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

    val q = Sinks.console(windowed, outputMode = "update").start()
    q.awaitTermination(20000)
    q.stop()
    spark.stop()
    println("[demo] done")
  }
}
