package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The reference's four sink shapes (console/parquet/kafka/foreach) as
  * reusable writers.
  */
object Sinks {

  /** Partitioned parquet sink with checkpoint — the reference's
    * ParquetOutput.scala (partitioned by the derived month column,
    * checkpointLocation for exactly-once file commits). */
  def partitionedParquet(df: DataFrame, path: String, checkpoint: String,
                         partitionCols: Seq[String]): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)

  /** Kafka-shaped output frame: (key, value) with value = to_json of all
    * columns — what a kafka sink requires
    * (StreamingWithKafkaJoinedData.scala:55's to_json(struct(*)) frame).
    * Kept as a transform so it works against ANY sink (including the
    * kafka connector when its jar is on the classpath). */
  def kafkaShaped(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Row-at-a-time external sink, the ForeachWriter pattern of the
    * reference's Cassandra sink (cassandra/StreamingWithCasssandra
    * .scala:65-80: open connection / process row / close). This
    * implementation collects into a process-local buffer — the test
    * double for any row-oriented external system. */
  class CollectingForeachWriter extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit =
      CollectingForeachWriter.append(row.toSeq)
    override def close(errorOrNull: Throwable): Unit = ()
  }

  object CollectingForeachWriter {
    // global because ForeachWriter instances are serialized to tasks;
    // fine for local-mode tests, which is this sink's only purpose
    private val buf = mutable.ArrayBuffer.empty[Seq[Any]]
    private[Sinks] def append(r: Seq[Any]): Unit = synchronized { buf += r }
    def rows: Seq[Seq[Any]] = synchronized { buf.toSeq }
    def clear(): Unit = synchronized { buf.clear() }
  }

  /** Keyed upsert sink — the Cassandra sink's semantics rehearsed
    * against an in-memory table (StreamingWithCasssandra.scala:31-40:
    * a per-row INSERT by primary key, which in Cassandra IS an
    * upsert/last-write-wins). What the rehearsal keeps from the real
    * connector recipe:
    *
    *  - rows buffer during process() and commit ATOMICALLY in close()
    *    — a task that dies mid-partition leaves the table untouched,
    *    so Spark's task retry re-runs a clean partition;
    *  - open() declines a (partitionId, epochId) that already
    *    committed, the dedup bookkeeping that turns at-least-once
    *    delivery into effectively-once writes;
    *  - even WITHOUT that bookkeeping, replaying an epoch is a no-op
    *    on table content because upsert-by-key is idempotent — the
    *    property the whole pattern leans on (spec-asserted).
    */
  class UpsertForeachWriter(keyIdx: Int = 0) extends ForeachWriter[Row] {
    private var pending: mutable.ArrayBuffer[(Any, Seq[Any])] = _
    private var pid: Long = 0L
    private var eid: Long = 0L
    override def open(partitionId: Long, epochId: Long): Boolean = {
      pid = partitionId; eid = epochId
      val fresh = !UpsertForeachWriter.alreadyCommitted(partitionId, epochId)
      // null (not keep) on decline: a reused instance would otherwise
      // re-commit the PREVIOUS epoch's buffer from close()
      pending = if (fresh) mutable.ArrayBuffer.empty else null
      fresh
    }
    override def process(row: Row): Unit =
      pending += ((row.get(keyIdx), row.toSeq))
    override def close(errorOrNull: Throwable): Unit =
      if (errorOrNull == null && pending != null)
        UpsertForeachWriter.commit(pid, eid, pending.toSeq)
  }

  object UpsertForeachWriter {
    // global for the same reason as CollectingForeachWriter: writer
    // instances serialize to tasks; local-mode tests only
    private val table = mutable.LinkedHashMap.empty[Any, Seq[Any]]
    private val epochs = mutable.Set.empty[(Long, Long)]
    private var applied = 0L
    private[Sinks] def alreadyCommitted(pid: Long, eid: Long): Boolean =
      synchronized(epochs.contains((pid, eid)))
    // Check-and-record runs INSIDE the lock: open()'s alreadyCommitted
    // probe alone is not atomic with close()'s commit, so two attempts
    // of the same (partition, epoch) — e.g. speculative tasks — could
    // both pass the probe. Table content was always safe (upsert-by-key
    // is idempotent) but appliedCount would double-count; the second
    // committer now no-ops entirely.
    def commit(pid: Long, eid: Long, rows: Seq[(Any, Seq[Any])]): Unit =
      synchronized {
        if (epochs.add((pid, eid)))
          rows.foreach { case (k, r) => table(k) = r; applied += 1 }
      }
    def rows: Map[Any, Seq[Any]] = synchronized(table.toMap)
    def appliedCount: Long = synchronized(applied)
    def clear(): Unit = synchronized { table.clear(); epochs.clear(); applied = 0L }
  }

  /** Fan-out to several sinks from one query — the reference's
    * SlidingWindow.scala fans the same aggregate to console AND kafka by
    * running two queries (two full computations of the stream).
    * foreachBatch computes each micro-batch ONCE, persists it, and
    * hands it to every consumer — at scale that halves (or better) the
    * source read and the window-state cost. */
  def fanOut(df: DataFrame, outputMode: String,
             consumers: Seq[DataFrame => Unit]): DataStreamWriter[Row] =
    df.writeStream.outputMode(outputMode).foreachBatch {
      (batch: DataFrame, _: Long) =>
        batch.persist()
        try consumers.foreach(c => c(batch))
        finally batch.unpersist()
    }

  /** Named in-memory sink for tests/debugging (`format("memory")`). */
  def memory(df: DataFrame, queryName: String,
             outputMode: String): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(queryName).outputMode(outputMode)

  /** Console sink — the reference's default debugging sink in every
    * job (`format("console")`, truncate off so window structs are
    * readable). */
  def console(df: DataFrame, outputMode: String,
              numRows: Int = 20): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(outputMode)
      .option("numRows", numRows.toString).option("truncate", "false")
}
