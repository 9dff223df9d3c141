package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.TextFunctions._

/** STREAMING token-budget packing — the batch `packTokenBudget`
  * (TextAnalysis.scala) continued across micro-batch boundaries: each
  * (lang, source) stratum's state is ONE long (the running token
  * offset), so a doc arriving tonight gets the pack_id it would have
  * gotten in a full batch re-run over the whole history — without
  * re-reading a single historical row. This is the ingest form of the
  * packing pipeline: the nightly delta lands, packs continue exactly
  * where yesterday's left off (parity spec'd in PackStreamSpec).
  *
  * Order contract (same as the batch operator's ORDER BY doc_id):
  * within a micro-batch, each stratum's rows are sorted by doc_id
  * before offsets are assigned; ACROSS batches, exact batch parity
  * additionally requires deltas to arrive in doc_id order (the nightly
  * ingest pattern — append-only, monotonically increasing ids). Out of
  * order across batches the operator still packs deterministically by
  * ARRIVAL stream, it just no longer equals the sorted batch oracle —
  * offsets never collide either way (the state is a running sum).
  *
  * Scale shape: state is 8 bytes per stratum (no doc content, no
  * per-doc rows), so the state store stays trivially small at any
  * corpus size; the per-batch sort is per-stratum within the batch,
  * bounded by delta size, not history. TimeMode.None — no watermark
  * needed, state never expires (strata live as long as the corpus). */
object PackStream {

  case class DocTok(lang: String, source: String, doc_id: Long,
                    ws_tokens: Long)
  case class PackedDoc(doc_id: Long, lang: String, source: String,
                       ws_tokens: Long, start_off: Long, pack_id: Long)

  class PackProcessor(budget: Long)
      extends StatefulProcessor[(String, String), DocTok, PackedDoc] {
    @transient private var offset: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      offset = getHandle.getValueState[Long]("offset",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (String, String), rows: Iterator[DocTok],
                                 timerValues: TimerValues): Iterator[PackedDoc] = {
      var off = if (offset.exists()) offset.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { d =>
        val so = off
        off += d.ws_tokens
        PackedDoc(d.doc_id, d.lang, d.source, d.ws_tokens, so, so / budget)
      }
      offset.update(off)
      out.iterator
    }

    override def handleExpiredTimer(key: (String, String),
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[PackedDoc] =
      Iterator.empty // TimeMode.None: no timers registered
  }

  /** @param docs streaming frame with (doc_id, text, lang, source);
    *   tokenization happens here so the stateful stage receives only
    *   the 4 metadata columns (state and shuffle never carry text). */
  def packStream(docs: DataFrame, budget: Long): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("lang"), col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"))
      .as[DocTok]
      .groupByKey(d => (d.lang, d.source))
      .transformWithState(new PackProcessor(budget),
        TimeMode.None(), OutputMode.Append)
  }
}
