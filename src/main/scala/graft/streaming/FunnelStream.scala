package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming ordered-funnel detection (view → click → purchase) —
  * the stateful mirror of `operators.Windows.funnelConversion`, built
  * on transformWithState.
  *
  * Why not apply events as they arrive: the funnel's stage anchors
  * are order-sensitive (a click counts only if it happens after the
  * FIRST view), and streams deliver out of order. Applying an event
  * the moment it arrives can lock in a wrong anchor — a later-arriving
  * EARLIER view would have admitted clicks the locked anchor rejects,
  * and monotone stage state cannot be un-advanced. The exact recipe is
  * the watermark-ordered replay: buffer events in ListState, and when
  * the event-time timer fires, fold exactly the events at or below the
  * watermark into the stage machine IN EVENT-TIME ORDER. Events deeper
  * than the watermark are by contract droppable, so ordered
  * application below it reproduces batch semantics — FunnelStreamSpec
  * proves parity against the batch operator under shuffled multi-batch
  * arrival.
  *
  * State per user: three stage anchors + the pending buffer, which the
  * watermark bounds (arrival lag, not history) — the 100 TB-stream
  * property that makes this run forever.
  *
  * Output (append mode): one row per user per REACHED stage, emitted
  * when the watermark confirms it; downstream counts are a plain
  * aggregation of this changelog.
  *
  * CHECKPOINT COMPATIBILITY: the pending-buffer timestamps switched
  * from milliseconds to MICROSECONDS in r8 (batch parity at sub-ms
  * resolution) with an unchanged physical state schema (Long, String)
  * — Spark's state-schema validation therefore cannot reject a
  * checkpoint written before the change, and resuming one would
  * silently read buffered ms values as µs (stale events instantly
  * ripe, emitted `tus` off by 1000×). Checkpoints from the ms era
  * must be DISCARDED, not resumed; same contract in Scd2Stream.
  */
object FunnelStream {

  case class Ev(user_id: Long, event_type: String, ts: Timestamp)
  case class StageHit(user_id: Long, stage: String, tus: Long)

  class FunnelProcessor extends StatefulProcessor[Long, Ev, StageHit] {
    @transient private var pending: ListState[(Long, String)] = _
    @transient private var tView: ValueState[Long] = _
    @transient private var tClick: ValueState[Long] = _
    @transient private var tPurchase: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val tupEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
      pending = getHandle.getListState[(Long, String)](
        "pending", tupEnc, TTLConfig.NONE)
      tView = getHandle.getValueState[Long]("tView", Encoders.scalaLong, TTLConfig.NONE)
      tClick = getHandle.getValueState[Long]("tClick", Encoders.scalaLong, TTLConfig.NONE)
      tPurchase = getHandle.getValueState[Long]("tPurchase", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[StageHit] = {
      // buffer MICROS (batch parity: funnelConversion compares
      // unix_micros — ms buffering would tie sub-ms-distinct events,
      // and the strict `>` gates below would drop real stages)
      rows.foreach(e => pending.appendValue((EventTime.micros(e.ts), e.event_type)))
      // fire once the watermark moves past the earliest buffered event;
      // re-registered on every batch/firing while anything is pending
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[StageHit] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = pending.get().toArray
      val (ripe, rest) = all.partition(p => EventTime.wmMillis(p._1) <= wm)
      if (rest.isEmpty) pending.clear()
      else { pending.clear(); rest.foreach(pending.appendValue); getHandle.registerTimer(wm + 1) }
      if (ripe.isEmpty) return Iterator.empty

      var v = if (tView.exists()) tView.get() else Long.MinValue
      var c = if (tClick.exists()) tClick.get() else Long.MinValue
      var p = if (tPurchase.exists()) tPurchase.get() else Long.MinValue
      var hits = List.empty[StageHit]
      // ordered replay: ties break by stage order (view before click
      // before purchase at the same microsecond), matching the batch operator's
      // STRICT `>` comparisons — an equal-timestamp click never counts
      val rank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
      ripe.filter(e => rank.contains(e._2))
        .sortBy(e => (e._1, rank(e._2))).foreach { case (t, tpe) =>
          tpe match {
            case "view" if v == Long.MinValue =>
              v = t; hits ::= StageHit(key, "view", t)
            case "click" if c == Long.MinValue && v != Long.MinValue && t > v =>
              c = t; hits ::= StageHit(key, "click", t)
            case "purchase" if p == Long.MinValue && c != Long.MinValue && t > c =>
              p = t; hits ::= StageHit(key, "purchase", t)
            case _ => // stage already anchored or out of order: no-op
          }
        }
      if (v != Long.MinValue) tView.update(v)
      if (c != Long.MinValue) tClick.update(c)
      if (p != Long.MinValue) tPurchase.update(p)
      hits.reverse.iterator
    }
  }

  /** @param events must already carry a watermark on `ts`. */
  def stageHits(events: Dataset[Ev]): Dataset[StageHit] = {
    implicit val outEnc = Encoders.product[StageHit]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.EventTime(), OutputMode.Append)
  }
}
