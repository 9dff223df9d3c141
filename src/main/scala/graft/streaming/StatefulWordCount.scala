package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful streaming: the reference's DStream
  * `updateStateByKey` running wordcount (streaming/BasicStreaming
  * .scala:17,24-26) re-expressed with Structured Streaming's
  * `flatMapGroupsWithState` — per-key state survives across triggers,
  * checkpointable, and (unlike updateStateByKey) the state store is
  * partitioned by key, so it scales horizontally with executors instead
  * of living in one DStream lineage.
  */
object StatefulWordCount {

  /** Per-word running total. */
  case class WordCount(word: String, count: Long)

  private def updateFn(
      word: String, batch: Iterator[String],
      state: GroupState[Long]): Iterator[WordCount] = {
    val total = state.getOption.getOrElse(0L) + batch.size
    state.update(total)
    Iterator(WordCount(word, total))
  }

  /** Running count per word across ALL triggers seen so far. Emits the
    * updated total for every word present in the current trigger
    * (update output mode — the streaming analog of updateStateByKey's
    * full-state DStream). */
  def runningCounts(words: Dataset[String]): Dataset[WordCount] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val wcEnc = Encoders.product[WordCount]
    implicit val strEnc = Encoders.STRING
    words.groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateFn)
  }

  /** The same semantics on Spark 4's transformWithState — the
    * successor API: named per-key state variables (ValueState/ListState
    * /MapState), timers, TTL, and schema evolution, all on the RocksDB
    * state store (which this operator REQUIRES — see
    * StreamingConfs.rocksDbStateStore).
    *
    * @param ttl per-key state time-to-live. With a finite TTL the
    *   store EVICTS idle keys (processing-time based) — the point of
    *   this API over flatMapGroupsWithState, where unbounded keyspaces
    *   (user ids, session ids) grow state forever unless every update
    *   hand-rolls timeout bookkeeping. An evicted key simply restarts
    *   its count at zero on its next appearance. */
  class RunningCountProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, String, WordCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[String],
                                 timerValues: TimerValues): Iterator[WordCount] = {
      val total = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(total)
      Iterator(WordCount(key, total))
    }
  }

  def runningCountsTws(words: Dataset[String]): Dataset[WordCount] = {
    implicit val wcEnc = Encoders.product[WordCount]
    implicit val strEnc = Encoders.STRING
    words.groupByKey(identity)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update)
  }

  /** Running counts whose per-key state expires after `ttl` of
    * inactivity. TTL is processing-time based, so the time mode must
    * be ProcessingTime. */
  def runningCountsTwsTtl(words: Dataset[String],
                          ttl: java.time.Duration): Dataset[WordCount] = {
    implicit val wcEnc = Encoders.product[WordCount]
    implicit val strEnc = Encoders.STRING
    words.groupByKey(identity)
      .transformWithState(new RunningCountProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update)
  }
}
