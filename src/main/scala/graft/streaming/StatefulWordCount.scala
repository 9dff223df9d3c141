package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
