package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Gap-based sessionization on transformWithState EVENT-TIME TIMERS —
  * the capability that has no flatMapGroupsWithState equivalent (its
  * timeouts are per-key singletons tied to the output mode; timers
  * here are first-class, multiple per key, fired by the watermark).
  *
  * One timer per key marks the session's would-be close (last event
  * time + gap). Every new event re-registers; when the watermark
  * passes a timer, the session closes: emit (key, event count) and
  * clear state. A timer made stale by a later event is detected by
  * comparing its expiry against the live state — deleting it eagerly
  * would also work, but the stale check keeps handleInputRows
  * single-write.
  */
object Sessionize {

  case class Event(word: String, ts: Timestamp)
  case class ClosedSession(word: String, events: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, Event, ClosedSession] {
    @transient private var count: ValueState[Long] = _
    @transient private var lastTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      lastTs = getHandle.getValueState[Long]("lastTs", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      var n = 0L
      var maxTs = if (lastTs.exists()) lastTs.get() else Long.MinValue
      rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
      count.update((if (count.exists()) count.get() else 0L) + n)
      lastTs.update(maxTs)
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // stale timer: a later event moved the session's close time
      if (!lastTs.exists() ||
          expiredTimerInfo.getExpiryTimeInMs != lastTs.get() + gapMs) {
        Iterator.empty
      } else {
        val out = ClosedSession(key, count.get())
        count.clear(); lastTs.clear()
        Iterator(out)
      }
    }
  }

  /** @param events must already carry a watermark on `ts` — event-time
    *   timers fire only when the watermark passes them. */
  def closedSessions(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val strEnc = Encoders.STRING
    events.groupByKey(_.word)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
