package graft.sources

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CSV dim ingestion — the reference's sensor_field.csv path
  * re-expressed with an explicit schema contract and fail-fast
  * malformed-row handling. */
class DimsSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_dims").toFile
    val f = new java.io.File(dir, "dim.csv")
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    f.getAbsolutePath
  }

  test("csvDim loads the declared schema (never inferred) and joins as a dim") {
    val path = writeCsv("sensor_id,field_id", "1,temp", "2,humidity")
    val dim = Dims.sensorFieldDim(spark, path)
    assert(dim.schema === Dims.sensorFieldSchema)

    // the reference's enrich shape: facts left_outer the CSV dim
    val facts = Seq((1L, 10.5), (2L, 3.2), (9L, 7.7)).toDF("sensor_id", "value")
    val joined = facts.join(dim, Seq("sensor_id"), "left_outer")
      .select("sensor_id", "field_id").as[(Long, Option[String])]
      .collect().toSet
    assert(joined === Set(
      (1L, Some("temp")), (2L, Some("humidity")), (9L, None)))
  }

  test("csvDim fails fast on malformed rows instead of null-filling") {
    val path = writeCsv("sensor_id,field_id", "1,temp", "not_a_long,broken")
    val ex = intercept[SparkException] {
      Dims.sensorFieldDim(spark, path).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
