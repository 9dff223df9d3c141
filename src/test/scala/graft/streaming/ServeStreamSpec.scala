package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Streaming ANN query serving from the static IVF+int8 index: every
  * result depends only on its own query + frozen index, so streamed
  * serving must equal batch serving under any micro-batch split. */
class ServeStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("streamed query serving == batch serving, split across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val v = Similarity.vectors(emb)
    val cents = v.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("e").as("ce")).localCheckpoint()
    val index = Similarity.ivfInt8IndexRows(emb, cents).localCheckpoint()

    val queryRows = v.filter(col("vec_id") < 6)
      .as[(Long, Seq[Double])].collect().toSeq

    val results = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ms = MemoryStream[(Long, Seq[Double])]
    val stream = ms.toDF().toDF("query_id", "e")
    val q = ServeStream.writer(stream, index, cents, nProbe = 2, k = 3) {
      out => results ++= out.collect().map(_.toSeq)
    }.start()
    try {
      ms.addData(queryRows.take(2): _*)
      q.processAllAvailable()
      ms.addData(queryRows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = Similarity.annIvfTopKFromIndex(index,
        queryRows.toDF("query_id", "e"), cents, nProbe = 2, k = 3)
      .collect().map(_.toSeq)
    assert(results.toSet === batch.toSet)
    assert(results.size === batch.length, "no duplicates across batches")
    assert(results.nonEmpty)
  }
}
