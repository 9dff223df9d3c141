package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming SCD2: the CDC stream folds into validity intervals as it
  * arrives — the stateful mirror of `operators.Cdc.scd2Intervals`.
  *
  * An interval is FINAL the moment the next change for its key is
  * confirmed: that close timestamp can never move, so closed intervals
  * stream out in append mode while the open (current) row lives only
  * in state. A batch re-run is never needed to keep history current —
  * the point of doing SCD2 on the stream.
  *
  * Ordering uses the same watermark-ordered replay as FunnelStream:
  * interval chaining is order-sensitive (each event closes the
  * PREVIOUS event's interval), and applying an out-of-order arrival
  * immediately would close an interval at the wrong boundary — state
  * that append-mode output cannot retract. Events buffer in ListState;
  * when the event-time timer confirms them ≤ watermark they fold in
  * event-time order (ties on the unique event_id, the batch
  * operator's exact sort key). Spark's event-time mode late-filters
  * rows below the watermark before the processor, so every buffered
  * event is strictly newer than everything already applied — the fold
  * is exact, proven batch-parity by Scd2StreamSpec.
  *
  * State per key: the open interval (one row) + the watermark-bounded
  * pending buffer — arrival lag, not history; a key's state does not
  * grow with its change count.
  *
  * CHECKPOINT COMPATIBILITY: pending-buffer timestamps switched from
  * milliseconds to MICROSECONDS in r8 with an unchanged physical state
  * schema, so schema validation cannot reject an old checkpoint —
  * checkpoints from the ms era must be DISCARDED, not resumed (see
  * FunnelStream for the full rationale).
  */
object Scd2Stream {

  case class Change(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class ClosedInterval(user_id: Long, event_id: Long, cents: Long,
                            valid_from_us: Long, valid_to_us: Long)

  /** (tus, event_id, cents) — event time in MICROS (batch parity:
    * scd2Intervals compares unix_micros; ms buffering would collapse
    * sub-ms-distinct events into ties). Ripeness checks floor the
    * micros back onto the watermark's ms grid. */
  private type Pend = (Long, Long, Long)

  class Scd2Processor extends StatefulProcessor[Long, Change, ClosedInterval] {
    @transient private var pending: ListState[Pend] = _
    @transient private var open: ValueState[Pend] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val pendEnc =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
      pending = getHandle.getListState[Pend]("pending", pendEnc, TTLConfig.NONE)
      open = getHandle.getValueState[Pend]("open", pendEnc, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 timerValues: TimerValues): Iterator[ClosedInterval] = {
      rows.foreach { c =>
        pending.appendValue((EventTime.micros(c.ts), c.event_id,
          EventTime.centsHalfUp(c.value)))
      }
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedInterval] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = pending.get().toArray
      val (ripe, rest) = all.partition(p => EventTime.wmMillis(p._1) <= wm)
      if (rest.isEmpty) pending.clear()
      else { pending.clear(); rest.foreach(pending.appendValue); getHandle.registerTimer(wm + 1) }
      if (ripe.isEmpty) return Iterator.empty

      var cur = if (open.exists()) Some(open.get()) else None
      var out = List.empty[ClosedInterval]
      ripe.sortBy(p => (p._1, p._2)).foreach { case next @ (tus, _, _) =>
        cur.foreach { case (otus, oid, ocents) =>
          out ::= ClosedInterval(key, oid, ocents, otus, tus)
        }
        cur = Some(next)
      }
      cur.foreach(open.update)
      out.reverse.iterator
    }
  }

  /** @param changes must already carry a watermark on `ts`. */
  def closedIntervals(changes: Dataset[Change]): Dataset[ClosedInterval] = {
    implicit val outEnc = Encoders.product[ClosedInterval]
    implicit val keyEnc = Encoders.scalaLong
    changes.groupByKey(_.user_id)
      .transformWithState(new Scd2Processor,
        TimeMode.EventTime(), OutputMode.Append)
  }
}
