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
  * Sessions close two ways, both on EVENT time: inline, when a new
  * event arrives more than gap past the session's last event (the
  * watermark may not have reached the old timer yet — waiting on it
  * would merge sessions based on arrival timing); and by timer, when
  * the watermark passes last-event-time + gap and no later event ever
  * came. A timer made stale by a later event is detected by comparing
  * its expiry against the live state — deleting it eagerly would also
  * work, but the stale check keeps handleInputRows single-write.
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
      // The gap rule is EVENT-time, so it must be enforced here, not
      // only by timers: an event far past lastTs + gap can arrive
      // before the watermark ever passes the old session's timer, and
      // merging it would make sessionization depend on batch/arrival
      // timing. Walk the batch in event-time order and close inline at
      // every gap; the timer only covers the final "no more events"
      // close. Events at or before lastTs (late but within watermark)
      // extend the current session.
      val ts = rows.map(_.ts.getTime).toArray.sorted
      var closed = List.empty[ClosedSession]
      var cnt = if (count.exists()) count.get() else 0L
      var last = if (lastTs.exists()) lastTs.get() else Long.MinValue
      ts.foreach { t =>
        if (last != Long.MinValue && t > last + gapMs) {
          closed ::= ClosedSession(key, cnt)
          cnt = 0L
        }
        cnt += 1
        last = math.max(last, t)
      }
      count.update(cnt)
      lastTs.update(last)
      getHandle.registerTimer(last + gapMs)
      closed.reverse.iterator
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
