package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}

import graft.core.Tables

/** Change-data-capture shapes: turning an append-only change log into
  * queryable history (SCD2 validity intervals) and applying a delta of
  * upserts/deletes onto a base snapshot (the MERGE half of a nightly
  * ingest, next to `Dedup.incrementalDedup*` which handles the
  * near-dup half).
  *
  * The reference's pipeline treats every Kafka record as the latest
  * truth per key (Consumer.scala's last-write-wins enrich); these
  * operators are the batch complements a warehouse needs around that:
  * point-in-time history and snapshot maintenance.
  */
object Cdc {

  private def cents: Column =
    round(col("value") * 100, 0).cast("long").as("cents")

  /** SCD2 (slowly-changing-dimension type 2) validity intervals from a
    * change log: each per-user event opens an interval at its own
    * timestamp and closes at the NEXT event's timestamp (`lead`);
    * the open interval (`valid_to_us` null) is the current row.
    *
    * Scale: one shuffle + sort — the window partitions by user_id, a
    * key whose per-partition row count is bounded by per-user activity
    * (thousands), never corpus cardinality; `lead(1)` is a streaming
    * frame, no buffering beyond one row. Timestamps are emitted as
    * epoch-micro BIGINTs (the repo-wide rule: raw timestamps don't
    * hash-compare portably); ties on ts break on the unique event_id
    * so the interval chain is deterministic. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = W.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), cents)
      .select(
        col("user_id"), col("event_id"), col("cents"),
        col("tus").as("valid_from_us"),
        lead(col("tus"), 1).over(w).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  def scd2IntervalsQuery(spark: SparkSession, dir: String): DataFrame =
    scd2Intervals(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))

  /** Apply a CDC delta onto a keyed base snapshot (MERGE semantics):
    * rows whose key appears in the delta as an upsert are REPLACED,
    * keys appearing as a delete are REMOVED, everything else passes
    * through. `delta` carries (doc_id, op ∈ upsert|delete, text).
    *
    * Scale: the base — the 100 TB side — is never shuffled. Touched
    * keys (8 bytes each; a nightly delta is ≪ the corpus) broadcast
    * into a left_anti that runs as a map-side filter on the base scan;
    * the upsert rows union in with zero exchange. Dropping the
    * broadcast hint degrades gracefully to a shuffled anti join if a
    * delta ever outgrows the driver. Output carries md5(text), not
    * text, so the result frame moves 32-byte digests (the same trick
    * as corpus_diff). */
  def mergeUpserts(base: DataFrame, delta: DataFrame): DataFrame =
    applyDelta(base, delta)
      .select(col("doc_id"), md5(col("text")).as("text_md5"), col("src"))

  /** The text-carrying form of [[mergeUpserts]] — the snapshot a
    * nightly pipeline actually persists (and re-feeds as next night's
    * base; MergeStreamRehearsalSpec chains two streamed deltas this
    * way). Same plan: base is never shuffled. */
  def applyDelta(base: DataFrame, delta: DataFrame): DataFrame = {
    val touched = delta.select(col("doc_id"))
    val kept = base
      .join(broadcast(touched), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), lit("base").as("src"))
    val applied = delta
      .filter(col("op") === "upsert")
      .select(col("doc_id"), col("text"), lit("delta").as("src"))
    kept.unionByName(applied)
  }

  /** Deterministic synthetic delta for the query entry: doc_id % 10 == 0
    * becomes an upsert with rewritten text, % 10 == 1 a delete. */
  def mergeUpsertsQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val delta = docs
      .filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, lit("upsert"))
          .otherwise(lit("delete")).as("op"),
        concat(lit("v2: "), col("text")).as("text"))
    mergeUpserts(docs, delta).orderBy(col("doc_id"))
  }

  /** Order-independent per-source content checksum: Σ hash60(row) over
    * each source's documents, summed in DECIMAL(38,0) (60-bit terms ×
    * 10¹² rows ≈ 10³⁰ ≪ 10³⁸ — no overflow, no mod needed until then;
    * emitted mod 2⁶⁰ to land in a BIGINT). Addition commutes, so ANY
    * partitioning/merge order yields the same digest — the property
    * that lets two 100 TB replicas (or a base and its merge_upserts
    * output) be compared with one cheap scan each and NO join, the
    * complement of row-level corpus_diff. concat_ws('|', …) serializes
    * a row identically in both engines (nulls skipped). */
  def corpusChecksum(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rowHash = graft.functions.TextFunctions.hash60(
      concat_ws("|", col("doc_id"), col("text"), col("lang"), col("source")))
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      (sum(rowHash.cast(DecimalType(38, 0))) % lit(1152921504606846976L))
        .cast("long").as("checksum60"))
  }

  def corpusChecksumQuery(spark: SparkSession, dir: String): DataFrame =
    corpusChecksum(Tables.documents(spark, dir)).orderBy(col("source"))

  val oracles: Map[String, String] = Map(
    "corpus_checksum" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CAST(concat('0x', substr(md5(
        |        concat_ws('|', doc_id, text, lang, source)
        |      ), 1, 15)) AS BIGINT))
        |    % 1152921504606846976 AS BIGINT) AS checksum60
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "scd2_intervals" ->
      """SELECT user_id, event_id, cents,
        |  tus AS valid_from_us,
        |  lead(tus) OVER w AS valid_to_us,
        |  lead(tus) OVER w IS NULL AS is_current
        |FROM (SELECT user_id, event_id, epoch_ns(ts)//1000 AS tus,
        |        CAST(round(value*100, 0) AS BIGINT) AS cents FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "merge_upserts" ->
      """WITH delta AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN 'upsert' ELSE 'delete' END AS op,
        |    'v2: ' || text AS text
        |  FROM documents WHERE doc_id % 10 <= 1)
        |SELECT doc_id, md5(text) AS text_md5, src FROM (
        |  SELECT b.doc_id, b.text, 'base' AS src FROM documents b
        |  WHERE b.doc_id NOT IN (SELECT doc_id FROM delta)
        |  UNION ALL
        |  SELECT doc_id, text, 'delta' AS src FROM delta
        |  WHERE op = 'upsert')
        |ORDER BY doc_id""".stripMargin
  )
}
