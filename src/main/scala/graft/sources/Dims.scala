package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Dimension-table loaders for the file formats the reference wires
  * into its jobs. The reference loads its sensor→field dim as a
  * schema'd, header'd CSV (`StreamingWithKafkaJoinedData.scala:39-44`,
  * `UdfRegister.scala:15-20` — `com.databricks.spark.csv` on Spark
  * 2.2, long since Spark's built-in `csv` source).
  *
  * Graft's rules for dim ingestion at scale:
  *  - EXPLICIT schema, never `inferSchema`: inference runs a whole
  *    extra pass over the data before the real scan (a silent 2× read)
  *    and type-guesses; a dim's schema is a contract, declare it.
  *  - FAILFAST mode: a malformed row in a dimension is corrupt
  *    reference data — fail the job, don't silently null-fill and
  *    left-join misses into the fact table.
  */
object Dims {

  def csvDim(spark: SparkSession, path: String, schema: StructType,
             header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** The reference's `sensor_field.csv` dim shape
    * (`StreamingWithKafkaJoinedData.scala:39`). */
  val sensorFieldSchema: StructType = StructType(
    StructField("sensor_id", LongType) ::
    StructField("field_id", StringType) :: Nil)

  def sensorFieldDim(spark: SparkSession, path: String): DataFrame =
    csvDim(spark, path, sensorFieldSchema)
}
