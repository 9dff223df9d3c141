package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{SensorPipeline, Windows}

/** Source-pluggable streaming pipelines: the SAME operator transforms
  * the batch oracle checks (SensorPipeline / Windows) wired for
  * Structured Streaming — watermark + event-time window, exactly the
  * reference's analysis jobs (analysis/TumblingWindow.scala:49-66,
  * SlidingWindow.scala:50-69) re-expressed over any source (memory in
  * tests, kafka via KafkaConfig in production).
  *
  * Because the transforms are pure DataFrame => DataFrame, Spark's
  * unified model gives stream/batch parity for free — there is no
  * separate streaming implementation to drift out of sync.
  */
object StreamPipelines {

  /** Parse + enrich: from_json flatten of the props payload, then the
    * stream-static dim join (reference StreamingWithKafkaJoinedData).
    * Unlike the batch oracle projection (SensorPipeline.enrichJoin),
    * this keeps the event-time and grouping columns so a window can
    * follow — same join semantics, streaming-shaped projection.
    * `dim` is static; pass broadcastDim=true when it's bounded (the
    * default is false — same rule as everywhere else in this library:
    * never force a broadcast of a dim that might scale). */
  def parseAndEnrich(stream: DataFrame, dim: DataFrame,
                     broadcastDim: Boolean = false): DataFrame = {
    val parsed = stream
      .withColumn("parsed", from_json(col("props"), SensorPipeline.propsSchema))
      .withColumn("k", col("parsed.k"))
      .drop("parsed", "props")
      .withColumnRenamed("user_id", "cust_id")
    val d = if (broadcastDim) broadcast(dim) else dim
    parsed.join(d, parsed("cust_id") === d("c_custkey"), "left_outer")
      .select(col("event_id"), col("ts"), col("event_type"), col("cust_id"),
        col("c_name"), col("c_mktsegment"), col("k"), col("value"))
  }

  /** Watermarked tumbling-window aggregation (reference
    * TumblingWindow.scala:49-66: 10 min watermark + window + sums). */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    Windows.tumbling(events.withWatermark("ts", watermark))

  /** Watermarked sliding-window aggregation with the post-agg filter
    * (reference SlidingWindow.scala:50-69). */
  def sliding(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    Windows.sliding(events.withWatermark("ts", watermark))

  /** Streaming exact dedup: drop events whose key was already seen
    * within the watermark horizon. The state store keeps one entry per
    * key and the watermark bounds its growth — unbounded-state dedup
    * (no watermark) is a slow OOM at production scale, so the delay is
    * a required argument here, not an optional nicety. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming OHLC bars — the windowed-stream form of
    * `operators.Timeseries.resampleOhlc`: the same map-side-combined
    * min_by/max_by struct champions run INSIDE the streaming aggregate
    * (open/close need no sorted buffer of the bar's events — state per
    * (window, type) is two champions + two extrema + a count, constant
    * in bar size), and append mode emits each bar exactly once when the
    * watermark closes its hour. Batch/stream parity is spec-pinned
    * (OhlcStreamSpec) under shuffled multi-batch arrival. */
  def ohlcStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val aggs = graft.operators.Timeseries.ohlcAggs // shared — no drift
    events
      .withWatermark("ts", watermark)
      .select(
        col("ts"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("open_cents"), col("close_cents"),
        col("high_cents"), col("low_cents"), col("n"))
  }

  /** The curation pass as a STREAM over arriving documents: the same
    * per-doc feature expressions as the batch TextAnalysis
    * .curationSummary (shared qualityKeepExpr/predLangExpr — no
    * drift), streaming dedup on the fixed-width md5 of the text, and
    * the per-language running totals in update/complete mode.
    *
    * The summary is representative-agnostic (identical texts have
    * identical features), so which duplicate survives dropDuplicates
    * does not affect the output and batch/stream parity is EXACT —
    * proven in BatchStreamParitySpec. Production note: documents
    * carrying an event-time column should dedup via
    * dropDuplicatesWithinWatermark (see dedupStream) to bound state;
    * the unbounded form here matches the batch semantics of a finite
    * corpus. */
  def curationStream(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis
    docs.select(
        col("doc_id"),
        TextAnalysis.predLangExpr(col("text")).as("pred_lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("ws_tokens"),
        TextAnalysis.qualityKeepExpr(col("text")).as("keep"),
        md5(col("text")).as("text_md5"))
      .filter(col("keep"))
      .dropDuplicates("text_md5")
      .groupBy(col("pred_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).cast("long").as("total_tokens"),
        round(sum(col("ws_tokens")).cast("double") / count(lit(1)), 4)
          .as("avg_tokens"))
  }

  /** The curation pass over documents CARRYING EVENT TIME — the
    * production form of curationStream: dedup state is bounded by the
    * watermark (dropDuplicatesWithinWatermark keeps one fixed-width md5
    * key per text until the watermark passes it, instead of forever),
    * and the per-language accounting is windowed so the aggregation
    * state is bounded too. Dedup + windowed aggregation is the
    * supported multi-stateful-operator chain in append mode; each
    * closed (window, language) row emits exactly once.
    *
    * Semantics note: a text recurring AFTER the watermark horizon is
    * counted again — the horizon is the explicit freshness/state-size
    * trade every streaming dedup at scale has to pick (see dedupStream;
    * the unbounded curationStream above matches the batch semantics of
    * a finite corpus instead). */
  def curationStreamWatermarked(docs: DataFrame,
                                watermark: String = "1 hour",
                                windowLen: String = "1 day"): DataFrame = {
    import graft.operators.TextAnalysis
    docs.select(
        col("doc_id"), col("ts"),
        TextAnalysis.predLangExpr(col("text")).as("pred_lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("ws_tokens"),
        TextAnalysis.qualityKeepExpr(col("text")).as("keep"),
        md5(col("text")).as("text_md5"))
      .filter(col("keep"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")
      .groupBy(window(col("ts"), windowLen), col("pred_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).cast("long").as("total_tokens"),
        round(sum(col("ws_tokens")).cast("double") / count(lit(1)), 4)
          .as("avg_tokens"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("pred_lang"), col("n_docs"), col("total_tokens"), col("avg_tokens"))
  }

  /** Streaming incremental dedup: a delta document STREAM probed
    * against the static, precomputed corpus index — the ingest-time
    * form of `Dedup.incrementalDedupPairs`. Emits one row per
    * (event-time window, delta doc, corpus near-dup) with the EXACT
    * Jaccard, in append mode once the watermark closes the window.
    *
    * Shape: the delta side explodes its distinct shingle set in-row
    * (map-only, no prefix filter — per-doc df ranking needs a window,
    * which streams don't support; the corpus postings join is the same
    * candidate generator, just unpruned), stream-static joins the
    * postings, and the ONE stateful operator counts shared shingles
    * per (window, delta doc, corpus doc): the candidate rows are
    * distinct-by-construction on both sides, so count(*) IS the
    * intersection size c, and jac = c/(n + cn - c) needs only the two
    * set sizes — delta n rides the stream, corpus cn joins back
    * statically AFTER the aggregate. State is bounded by the watermark
    * horizon; the corpus index is the same artifact the batch probe
    * uses (bucket it by shingle and the per-batch join never shuffles
    * the corpus). */
  def incrementalDedupStream(delta: DataFrame, corpus: DataFrame,
                             k: Int, tau: Double,
                             watermark: String = "1 hour",
                             windowLen: String = "1 day"): DataFrame = {
    import graft.functions.TextFunctions._
    import graft.operators.Dedup
    // NOT corpusIndex: the stream's unpruned candidate join needs only
    // raw (doc_id, s) postings, and the ranked index would drag its
    // corpus-wide df aggregate + join into the static side of EVERY
    // micro-batch for columns the stream immediately projects away.
    val corpusSets = Dedup.docShingleSets(corpus, k)
    val postings = corpusSets.select(col("doc_id"), explode(col("sset")).as("s"))
    val csz = corpusSets.select(col("doc_id").as("corpus_id"),
      col("n").as("cn"))

    val shaped = delta
      .withColumn("sset",
        sort_array(array_distinct(wordShingles(tokens(col("text")), k))))
      .filter(size(col("sset")) > 0)
      .select(col("doc_id"), col("ts"),
        size(col("sset")).cast("long").as("n"),
        explode(col("sset")).as("s"))

    shaped.withWatermark("ts", watermark)
      // the ranked index carries (doc_id, s, pos, n) since the PPJoin
      // change; the stream's unpruned candidate join uses only the
      // posting itself
      .join(postings.select(col("doc_id").as("corpus_id"), col("s").as("cs")),
        col("s") === col("cs"))
      .groupBy(window(col("ts"), windowLen), col("doc_id"), col("corpus_id"))
      .agg(count(lit(1)).as("c"), first(col("n")).as("n"))
      .join(csz, "corpus_id")
      .withColumn("jac", col("c") / (col("n") + col("cn") - col("c")))
      .filter(col("jac") >= tau)
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("doc_id").as("delta_id"), col("corpus_id"),
        round(col("jac"), 4).as("jac"))
  }

  /** The full reference pipeline: parse → enrich → watermark → window.
    * One call from a kafka/memory/socket source to a windowed frame. */
  def endToEnd(stream: DataFrame, dim: DataFrame,
               watermark: String = "10 minutes",
               broadcastDim: Boolean = false): DataFrame = {
    val enriched = parseAndEnrich(stream, dim, broadcastDim)
    Windows.tumbling(enriched.withWatermark("ts", watermark))
  }
}
