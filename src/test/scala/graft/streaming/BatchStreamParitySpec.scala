package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Windows

/** The architectural claim behind this library: every operator is a
  * pure DataFrame transform, so the SAME code gives identical answers
  * in batch and in Structured Streaming. This spec proves it on the
  * real events table — the batch path (what the DuckDB oracle checks)
  * vs a file-source stream of the same parquet. */
class BatchStreamParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tumbling window: streaming result == batch result on real events") {
    val batch = Windows.tumbling(Tables.events(spark, dir))
      .collect().map(_.toSeq).toSet

    // same parquet, replayed as a file-source stream, normalized through
    // the SAME dtype-adaptive helper as the batch loader so a testdata
    // regeneration cannot split the two paths;
    // the file source wants a directory, so stage the file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
      spark.readStream
        .schema(rawSchema)
        .parquet(streamDir.toString))

    val q = Sinks.memory(Windows.tumbling(stream), "parity_sink", "complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("parity_sink").collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("curation pipeline: streaming summary == batch summary on real documents") {
    import graft.operators.TextAnalysis
    val batch = TextAnalysis.curationSummary(Tables.documents(spark, dir))
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("graft_curation")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)

    val q = Sinks.memory(
      StreamPipelines.curationStream(stream), "curation_parity", "complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curation_parity").collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("chunkTokens: stateless map-only transform streams in APPEND mode unchanged") {
    import graft.operators.TextAnalysis
    // no aggregation, no watermark, no state — the chunker must run on
    // an unbounded stream as a pure append transform, the property that
    // lets the context-prep stage sit directly on the ingest stream
    val batch = TextAnalysis.chunkTokens(
        Tables.documents(spark, dir), chunkTokens = 32, stride = 8)
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("graft_chunk")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)

    val q = Sinks.memory(
      TextAnalysis.chunkTokens(stream, chunkTokens = 32, stride = 8),
      "chunk_parity", "append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("chunk_parity").collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("blocklistRedact + upsampleMixture: stateless curation rules stream in APPEND mode unchanged") {
    import graft.operators.TextAnalysis
    // both ops are pure per-row column math (blocklist isin + md5
    // bucket explode) — they must run on the ingest stream with NO
    // state store at all, so redaction and mixture construction can
    // sit directly on the ingest path
    val docs = Tables.documents(spark, dir)
    val batchRedact = TextAnalysis.blocklistRedact(docs, TextAnalysis.blockTerms)
      .collect().map(_.toSeq).toSet
    val batchMix = TextAnalysis.upsampleMixture(docs, TextAnalysis.mixtureWeights)
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("graft_blockmix")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)

    val qR = Sinks.memory(
      TextAnalysis.blocklistRedact(stream, TextAnalysis.blockTerms),
      "redact_parity", "append").start()
    val qM = Sinks.memory(
      TextAnalysis.upsampleMixture(stream, TextAnalysis.mixtureWeights),
      "mixture_parity", "append").start()
    try {
      qR.processAllAvailable()
      qM.processAllAvailable()
      assert(spark.table("redact_parity").collect().map(_.toSeq).toSet === batchRedact)
      assert(spark.table("mixture_parity").collect().map(_.toSeq).toSet === batchMix)
      assert(batchRedact.nonEmpty && batchMix.nonEmpty)
    } finally { qR.stop(); qM.stop() }
  }
}
