package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Byte-pair-encoding TOKENIZER TRAINING over the corpus — the missing
  * half of the token-counting family (row 30 counts with a fixed
  * BPE-ish regex; this LEARNS the merge table a real tokenizer is
  * built from; Sennrich, Haddow & Birch 2016): start from characters,
  * repeatedly merge the globally most frequent adjacent symbol pair.
  *
  * The at-scale shape (the sentencepiece/subword-nmt discipline): the
  * corpus collapses to the WORD-COUNT table in ONE pass — Heaps'
  * law bounds it far below the corpus — and every merge round runs on
  * that vocab-sized table only: pair counts are a map-side-combined
  * aggregate weighted by word counts, the argmax is a 1-row
  * TakeOrdered, and the merge applies as ONE literal string replace.
  * The corpus itself is never rescanned after round 0.
  *
  * Determinism: symbol sequences are strings of `<sym>` cells (the
  * corpus is validated free of the delimiter chars — loud failure
  * otherwise); pair counting counts every adjacent index pair (the
  * overlapping-run convention, documented); merging is the engine's
  * leftmost non-overlapping literal replace — identical semantics in
  * Spark and DuckDB, so TRAINING replays bit-for-bit in the oracle;
  * argmax ties break (count desc, left asc, right asc).
  *
  * The merge loop itself runs DRIVER-SIDE over the collected word
  * table (r12 verdict #5: the old one-Spark-job-per-merge round loop
  * was pure scheduler latency at production merge counts — 30k merges
  * x ~0.5s/job is hours at ANY corpus size). The word table is
  * model-sized by the same Heaps argument that justifies collecting
  * 1-row gradients (quality_train) and merge tables (the old round
  * loop): collect ONCE, train locally (a 1000-merge loop over a
  * 5k-word vocab is milliseconds), ship the trained table back as a
  * broadcast-sized frame. The distributed round loop is kept as
  * [[trainBpeDistributed]] and spec-pinned equal to the local loop —
  * the rewrite is an execution-strategy change, not a semantics
  * change, and the DuckDB oracles replay the SAME rounds either way. */
object BpeTrain {

  final case class BpeMerge(rank: Int, lsym: String, rsym: String,
                            merged: String, pair_count: Long)

  /** The one corpus pass: (word, cnt, wrapped) with each character as
    * a `<c>` cell. Words containing the delimiter chars fail loudly —
    * silent mis-merges are worse than a crash. (private[operators]:
    * the distributed unigram trainer reads the same frame WITHOUT
    * the collect.) */
  private[operators] def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("word",
        when(col("word").rlike("[<>'\\\\]"),
          raise_error(concat(lit("trainBpe: word contains delimiter/quote: "),
            col("word")))).otherwise(col("word")))
      .withColumn("wrapped", regexp_replace(col("word"), "(.)", "<$1>"))

  private def symbols(wrapped: Column): Column =
    split(regexp_replace(wrapped, "^<|>$", ""), "><")

  /** Unsigned UTF-8 byte comparison — Spark UTF8String and DuckDB
    * VARCHAR both order by binary bytes; Java String.compareTo orders
    * by UTF-16 code units, which differs for supplementary-plane
    * characters. The local argmax must tie-break exactly like the
    * engines it replaces. */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Split a wrapped word (`<a><bc><d>`) into its symbol cells. Words
    * are validated free of `<`/`>` so a linear scan is exact. */
  private def cells(wrapped: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < wrapped.length) {
      val j = wrapped.indexOf('>', i)
      out += wrapped.substring(i + 1, j)
      i = j + 1
    }
    out.toArray
  }

  /** The driver-side merge loop: `rows` is the collected word table
    * as (wrapped, cnt); returns the merge list plus each row's final
    * wrapped form. Semantics are the distributed round loop's,
    * verbatim: every adjacent index pair counts (overlapping-run
    * convention), argmax ties (count desc, l asc, r asc) in binary
    * byte order, merging is leftmost non-overlapping literal replace
    * (Java String.replace == Spark replace == DuckDB replace), stop
    * when no adjacent pair remains anywhere. */
  private[graft] def trainMergesLocal(rows: Array[(String, Long)],
      numMerges: Int): (Vector[BpeMerge], Array[String]) = {
    val wrapped = rows.map(_._1)
    val cnts = rows.map(_._2)
    val out = Vector.newBuilder[BpeMerge]
    var m = 1
    var exhausted = false
    while (m <= numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < wrapped.length) {
        val sy = cells(wrapped(w))
        var i = 0
        while (i < sy.length - 1) {
          val k = (sy(i), sy(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + cnts(w))
          i += 1
        }
        w += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pc.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && (utf8Lt(kv._1._1, best._1._1) ||
              (kv._1._1 == best._1._1 && utf8Lt(kv._1._2, best._1._2)))))
            best = kv
        }
        val ((l, r), c) = best
        out += BpeMerge(m, l, r, l + r, c)
        val from = "<" + l + "><" + r + ">"
        val to = "<" + l + r + ">"
        var i = 0
        while (i < wrapped.length) {
          wrapped(i) = wrapped(i).replace(from, to)
          i += 1
        }
        m += 1
      }
    }
    (out.result(), wrapped)
  }

  /** The INDEXED driver-side trainer — identical semantics to
    * [[trainMergesLocal]] (spec-pinned merge-for-merge), different
    * complexity class: the naive loop re-counts EVERY word's pairs
    * every round (O(merges × table) — fine at the 400-word test
    * vocab, ~13 minutes at a production 100k-word table × 5k merges,
    * the r13 verdict-#7 probe's finding), where this one keeps
    *
    *   - a global pair-count map updated INCREMENTALLY: a merge only
    *     touches the words that actually contain the merged pair
    *     (Zipf makes that a tiny fraction of the table per round),
    *   - a pair → word-ids index (lazily stale, adjacency re-checked
    *     at use) to find those words without scanning, and
    *   - a lazy-deletion max-heap for the argmax (count desc, then
    *     l/r ascending in UTF-8 byte order — the engines' tiebreak):
    *     stale entries pop and are discarded against the live count,
    *
    * which is the subword-nmt/sentencepiece trainer shape. Measured
    * (ScaleProbe `bpe_big`): 100k-word Zipf table, 5k merges in
    * seconds — see NOTES_r14. */
  private[graft] def trainMergesLocalIndexed(rows: Array[(String, Long)],
      numMerges: Int): (Vector[BpeMerge], Array[String]) = {
    val cnts = rows.map(_._2)
    val words: Array[Array[String]] = rows.map(r => cells(r._1))
    val pairCount = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.ArrayBuffer[Int]]
    final case class HE(c: Long, l: String, r: String)
    val heap = new java.util.PriorityQueue[HE](11,
      new java.util.Comparator[HE] {
        def compare(a: HE, b: HE): Int = {
          if (a.c != b.c) return java.lang.Long.compare(b.c, a.c)
          if (a.l != b.l) return if (utf8Lt(a.l, b.l)) -1 else 1
          if (a.r != b.r) return if (utf8Lt(a.r, b.r)) -1 else 1
          0
        }
      })
    def bump(k: (String, String), delta: Long, w: Int): Unit = {
      val nc = pairCount.getOrElse(k, 0L) + delta
      if (nc <= 0L) pairCount.remove(k) else pairCount.update(k, nc)
      if (delta > 0) {
        pairWords.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty[Int]) += w
        if (nc > 0L) heap.add(HE(nc, k._1, k._2))
      } else if (nc > 0L) heap.add(HE(nc, k._1, k._2))
    }
    def forPairs(w: Int)(f: ((String, String)) => Unit): Unit = {
      val sy = words(w)
      var i = 0
      while (i < sy.length - 1) { f((sy(i), sy(i + 1))); i += 1 }
    }
    var w = 0
    while (w < words.length) {
      forPairs(w)(k => bump(k, cnts(w), w))
      w += 1
    }
    val out = Vector.newBuilder[BpeMerge]
    var m = 1
    var exhausted = false
    while (m <= numMerges && !exhausted) {
      // pop to the first LIVE entry (lazy deletion)
      var top: HE = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCount.getOrElse((e.l, e.r), 0L) == e.c) top = e
      }
      if (top == null) exhausted = true
      else {
        val k = (top.l, top.r)
        out += BpeMerge(m, top.l, top.r, top.l + top.r, top.c)
        val affected = pairWords.remove(k)
          .getOrElse(scala.collection.mutable.ArrayBuffer.empty[Int])
        val seen = scala.collection.mutable.HashSet.empty[Int]
        affected.foreach { wi =>
          if (seen.add(wi)) {
            val sy = words(wi)
            var has = false
            var i = 0
            while (!has && i < sy.length - 1) {
              if (sy(i) == top.l && sy(i + 1) == top.r) has = true
              i += 1
            }
            if (has) {
              forPairs(wi)(p => bump(p, -cnts(wi), wi))
              // leftmost non-overlapping merge — the literal-replace rule
              val nw = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < sy.length) {
                if (j < sy.length - 1 && sy(j) == top.l &&
                    sy(j + 1) == top.r) {
                  nw += top.l + top.r; j += 2
                } else { nw += sy(j); j += 1 }
              }
              words(wi) = nw.toArray
              forPairs(wi)(p => bump(p, cnts(wi), wi))
            }
          }
        }
        pairCount.remove(k)
        m += 1
      }
    }
    (out.result(), words.map(_.map(s => "<" + s + ">").mkString))
  }

  /** The Heaps-law contract's load-bearing bound: collectedWordTable
    * refuses to collect a distinct-word table above this many rows
    * (override via maxDistinctWords). 5M short strings is a few
    * hundred MB of driver heap — comfortably model-sized; a corpus
    * whose vocabulary blows past it (ID/hash/URL-heavy text growing
    * ~linearly in corpus size) is violating the assumption the whole
    * driver-side trainer rests on, and must fail LOUDLY (the
    * raise_error delimiter discipline) instead of OOMing the driver.
    * The graceful fallback is [[trainBpeDistributed]], which never
    * collects the table. */
  private[graft] val defaultMaxDistinctWords: Long = 5000000L

  /** One corpus pass + collect of the Heaps-bounded word table — the
    * shared entry for the local trainer and the trained-table
    * consumers. The table is localCheckpointed so the guard count and
    * the collect read ONE materialization, not two corpus scans. */
  private[graft] def collectedWordTable(docs: DataFrame,
      maxWords: Long = defaultMaxDistinctWords): Array[(String, Long, String)] = {
    val wt = wordTable(docs).select(col("word"), col("cnt"), col("wrapped"))
      .localCheckpoint()
    val n = wt.count()
    require(n <= maxWords,
      s"trainBpe: $n distinct words exceeds the Heaps-contract bound " +
        s"$maxWords — this corpus's vocabulary is not collect-safe; " +
        "use trainBpeDistributed (never collects the word table) or " +
        "raise maxDistinctWords deliberately")
    wt.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
  }

  /** Train `numMerges` merges; returns (rank, lsym, rsym, merged,
    * pair_count) in merge order. Stops early if the corpus runs out
    * of repeated pairs. ONE corpus pass (the word-table collapse +
    * collect); the merge loop is local — see the object doc. */
  def trainBpe(docs: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges >= 1)
    val spark = docs.sparkSession
    val rows = collectedWordTable(docs)
    val (merges, _) =
      trainMergesLocalIndexed(rows.map(r => (r._3, r._2)), numMerges)
    import spark.implicits._
    merges.toDF()
  }

  /** The pre-r13 one-Spark-job-per-merge round loop, kept as the
    * parity REFERENCE for the local trainer (BpeTrainSpec pins
    * local == distributed merge-for-merge) — not wired to any query. */
  private[graft] def trainBpeDistributed(docs: DataFrame,
                                         numMerges: Int): DataFrame = {
    require(numMerges >= 1)
    val spark = docs.sparkSession
    var words = wordTable(docs).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var exhausted = false
    for (m <- 1 to numMerges if !exhausted) {
      val best = words
        .select(col("cnt"), symbols(col("wrapped")).as("sy"))
        // sequence(1, 0) counts DOWNWARD in Spark — guard 1-symbol
        // words (the spanCorruptionPlan pattern)
        .select(col("cnt"), explode(expr(
          "transform(CASE WHEN size(sy) >= 2 THEN sequence(1, size(sy) - 1) " +
            "ELSE CAST(array() AS array<int>) END, " +
            "i -> struct(sy[i-1] AS l, sy[i] AS r))"))
          .as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        out += BpeMerge(m, l, r, l + r, c)
        words = words.withColumn("wrapped",
            expr(s"replace(wrapped, '<' || '$l' || '><' || '$r' || '>', " +
              s"'<' || '$l' || '$r' || '>')"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    out.toSeq.toDF()
  }

  def trainBpeQuery(spark: SparkSession, dir: String): DataFrame =
    trainBpe(Tables.documents(spark, dir), numMerges = 8)
      .orderBy(col("rank"))

  /** Encode the corpus with a freshly trained merge table and report
    * per-doc compression: whitespace words join the post-training
    * vocab (each word's final symbol count = its `<` cells), so
    * ENCODING is one keyed join against the Heaps-bounded vocab —
    * documents are never re-segmented. compression_bp = 10000 ·
    * n_bpe_symbols div n_chars (10000 = no compression; smaller is
    * better). */
  /** The word table AFTER applying a freshly trained merge list in
    * rank order — shared by the encoder and the vocab dump. One
    * corpus pass + collect; training AND application run locally on
    * the Heaps-bounded table, which ships back as a broadcast-sized
    * frame (the downstream encode join auto-broadcasts it). */
  private[graft] def trainedWordTable(docs: DataFrame, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val rows = collectedWordTable(docs)
    val (_, trained) =
      trainMergesLocalIndexed(rows.map(r => (r._3, r._2)), numMerges)
    import spark.implicits._
    rows.indices.map(i => (rows(i)._1, rows(i)._2, trained(i)))
      .toDF("word", "cnt", "wrapped")
  }

  def bpeEncode(docs: DataFrame, numMerges: Int): DataFrame = {
    val words = trainedWordTable(docs, numMerges)
    val ws = words.select(col("word"),
      (length(col("wrapped"))
        - length(expr("replace(wrapped, '<', '')"))).cast("long").as("n_syms"),
      length(col("word")).cast("long").as("n_chars"))
    docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(ws, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_syms")).as("n_bpe_symbols"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_bpe_symbols"),
        expr("(10000 * n_bpe_symbols) div n_chars").as("compression_bp"))
  }

  def bpeEncodeQuery(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(Tables.documents(spark, dir), numMerges = 8)
      .orderBy(col("doc_id"))

  /** The trained tokenizer's SHIPPING artifact — the symbol vocabulary
    * with corpus statistics: per final symbol, how many distinct words
    * contain it and its total weighted occurrence count (Σ word-count
    * × in-word occurrences), with the single-char alphabet and the
    * merge products flagged apart. Bounded by |alphabet| + numMerges
    * symbols — model-sized by construction; computed entirely from
    * the Heaps-bounded trained word table. */
  def bpeVocab(docs: DataFrame, numMerges: Int): DataFrame =
    trainedWordTable(docs, numMerges)
      .select(col("word"), col("cnt"),
        explode(symbols(col("wrapped"))).as("symbol"))
      .groupBy("symbol")
      .agg(countDistinct(col("word")).as("n_words"),
        sum(col("cnt")).as("n_occurrences"))
      .withColumn("is_merged", length(col("symbol")) > 1)

  def bpeVocabQuery(spark: SparkSession, dir: String): DataFrame =
    bpeVocab(Tables.documents(spark, dir), numMerges = 8)
      .orderBy(col("n_occurrences").desc, col("symbol"))

  // ------------------------------------------------------ byte-level BPE

  /** BYTE-level BPE (r15 verdict #2) — the GPT-2/Llama-3 production
    * default (Radford et al. 2019 tokenize UTF-8 BYTES, not chars):
    * the base alphabet is the 256 byte values, so ANY text — any
    * script, emoji, text unseen at training time — encodes with ZERO
    * out-of-vocabulary symbols by construction, where char-BPE's
    * alphabet is the training corpus's characters and an unseen
    * codepoint is a hole.
    *
    * Representation: each byte is its 2-digit uppercase hex cell —
    * `hex(encode(word, 'UTF-8'))` (Spark) and `hex(encode(word))`
    * (DuckDB) agree byte-for-byte (verified on this host pair), the
    * wrapped form is `<68><C3><A9>`, and ALL downstream machinery —
    * trainMergesLocalIndexed, the leftmost non-overlapping literal
    * replace, the unrolled round CTEs — is shared verbatim with
    * char-BPE: only the w0 cell alphabet differs. Hex cells also moot
    * the delimiter guard (the alphabet is [0-9A-F] — no '<'/'>'
    * collision is possible), which is itself the point: char-BPE must
    * REJECT delimiter-carrying words, byte-BPE encodes anything.
    * Tiebreaks are unchanged — hex cells are ASCII, so utf8Lt is
    * plain ASCII order in both engines. */
  private def byteWordTable(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("wrapped",
        regexp_replace(hex(encode(col("word"), "UTF-8")), "(..)", "<$1>"))

  /** One corpus pass + Heaps-guarded collect of the BYTE word table
    * (collectedWordTable's contract verbatim; the byte table has the
    * same row count — one row per distinct word). */
  private[graft] def collectedByteWordTable(docs: DataFrame,
      maxWords: Long = defaultMaxDistinctWords): Array[(String, Long, String)] = {
    val wt = byteWordTable(docs).select(col("word"), col("cnt"), col("wrapped"))
      .localCheckpoint()
    val n = wt.count()
    require(n <= maxWords,
      s"bpeByteTrain: $n distinct words exceeds the Heaps-contract bound " +
        s"$maxWords — this corpus's vocabulary is not collect-safe")
    wt.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
  }

  /** Train `numMerges` BYTE merges — trainMergesLocalIndexed on the
    * hex-celled table; symbols in the output are hex strings ("61",
    * "C3A9", …). Same early stop, same tiebreaks. */
  def bpeByteTrain(docs: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges >= 1)
    val spark = docs.sparkSession
    val rows = collectedByteWordTable(docs)
    val (merges, _) =
      trainMergesLocalIndexed(rows.map(r => (r._3, r._2)), numMerges)
    import spark.implicits._
    merges.toDF()
  }

  def bpeByteTrainQuery(spark: SparkSession, dir: String): DataFrame =
    bpeByteTrain(Tables.documents(spark, dir), numMerges = 8)
      .orderBy(col("rank"))

  /** The byte word table AFTER the trained merges — the byte-side
    * twin of [[trainedWordTable]]. */
  private[graft] def byteTrainedWordTable(docs: DataFrame,
                                          numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val rows = collectedByteWordTable(docs)
    val (_, trained) =
      trainMergesLocalIndexed(rows.map(r => (r._3, r._2)), numMerges)
    import spark.implicits._
    rows.indices.map(i => (rows(i)._1, rows(i)._2, trained(i)))
      .toDF("word", "cnt", "wrapped")
  }

  /** bpe_byte_encode: per-doc byte-symbol counts + compression against
    * the BYTE length (octet_length — the denominator a byte tokenizer
    * is judged on; 10000 = one symbol per byte, smaller is better). */
  def bpeByteEncode(docs: DataFrame, numMerges: Int): DataFrame = {
    val words = byteTrainedWordTable(docs, numMerges)
    val ws = words.select(col("word"),
      (length(col("wrapped"))
        - length(expr("replace(wrapped, '<', '')"))).cast("long").as("n_syms"),
      octet_length(col("word")).cast("long").as("n_bytes"))
    docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(ws, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_bytes")).as("n_bytes"),
        sum(col("n_syms")).as("n_byte_symbols"))
      .select(col("doc_id"), col("n_words"), col("n_bytes"),
        col("n_byte_symbols"),
        expr("(10000 * n_byte_symbols) div n_bytes").as("compression_bp"))
  }

  def bpeByteEncodeQuery(spark: SparkSession, dir: String): DataFrame =
    bpeByteEncode(Tables.documents(spark, dir), numMerges = 8)
      .orderBy(col("doc_id"))

  /** Apply a TRAINED byte merge table to ARBITRARY new words — the
    * zero-OOV serving path: unseen text (any script, emoji) wraps to
    * hex byte cells and each merge applies in rank order as the same
    * leftmost non-overlapping literal replace training used, entirely
    * as chained column expressions (no UDF — the merge table is
    * model-sized, ≤ numMerges rows, collected once and folded into
    * the plan). Returns (word, syms) where concat(unhex(sym)*) is the
    * original word's bytes EXACTLY — the round-trip the zero-OOV spec
    * pins. */
  def bpeByteApply(words: DataFrame, merges: DataFrame): DataFrame = {
    val ms = merges.orderBy(col("rank"))
      .select(col("lsym"), col("rsym")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val start = words.select(col("word"),
      regexp_replace(hex(encode(col("word"), "UTF-8")), "(..)", "<$1>")
        .as("wrapped"))
    // literal replace (not regexp) — hex cells need no quoting, and
    // it is training's exact merge semantics
    val folded = ms.foldLeft(start) { case (df, (l, r)) =>
      df.withColumn("wrapped",
        expr(s"replace(wrapped, '<$l><$r>', '<$l$r>')"))
    }
    folded.select(col("word"),
      split(regexp_replace(col("wrapped"), "^<|>$", ""), "><").as("syms"))
  }

  // ---------------------------------------------------------------- oracles

  /** The training rounds unrolled as SQL CTEs: w0 = the word table,
    * then per round m: pair counts over w{m-1}'s symbol cells, the
    * 1-row argmax b{m}, and w{m} = the literal replace. MATERIALIZED
    * word tables (the k-core lesson — each is referenced twice). */
  /** The shared word-table CTE `w0(word, cnt, wr)` — the CASE mirrors
    * wordTable's raise_error guard (ADVICE r12): a word carrying a
    * delimiter/quote char fails LOUDLY in BOTH engines instead of
    * silently mis-merging if the oracle is ever run standalone on an
    * unguarded corpus. Shared with the unigram-LM oracles. */
  private[graft] val wordTableCteSql: String =
    """w0 AS MATERIALIZED (
      | SELECT CASE WHEN regexp_matches(word, '[<>'']') OR contains(word, chr(92))
      |    THEN error('bpe oracle: word contains delimiter/quote: ' || word)
      |    ELSE word END AS word,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  regexp_replace(word, '(.)', '<\1>', 'g') AS wr
      | FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      | WHERE word <> '' GROUP BY word)""".stripMargin

  private[graft] def bpeRoundsCtes(numMerges: Int): String =
    bpeRoundsCtesWith(wordTableCteSql, "", numMerges)

  /** The BYTE-side w0: hex-celled UTF-8 bytes, no delimiter guard
    * (the alphabet is [0-9A-F] — collision-free by construction). */
  private[graft] val byteWordTableCteSql: String =
    """byw0 AS MATERIALIZED (
      | SELECT word, CAST(count(*) AS BIGINT) AS cnt,
      |  regexp_replace(hex(encode(word)), '(..)', '<\1>', 'g') AS wr
      | FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      | WHERE word <> '' GROUP BY word)""".stripMargin

  /** Round CTEs over an arbitrary w0 — shared by the char chain
    * (pfx "", wordTableCteSql) and the byte chain (pfx "by",
    * byteWordTableCteSql); both chains can coexist in ONE query
    * (tokenizer_compare's oracle does exactly that). */
  private[graft] def bpeRoundsCtesWith(w0Sql: String, pfx: String,
                                       numMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= w0Sql
    for (m <- 1 to numMerges) {
      sb ++= s""",
        |${pfx}p$m AS (
        | SELECT sy[i] AS l, sy[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
        | FROM (SELECT cnt, string_split(trim(wr, '<>'), '><') AS sy
        |       FROM ${pfx}w${m - 1}),
        |  UNNEST(range(1, len(sy))) t(i)
        | GROUP BY 1, 2),
        |${pfx}b$m AS MATERIALIZED (
        | SELECT l, r, c FROM ${pfx}p$m ORDER BY c DESC, l, r LIMIT 1),
        |${pfx}w$m AS MATERIALIZED (
        | SELECT word, cnt,
        |  replace(wr, '<' || b.l || '><' || b.r || '>',
        |          '<' || b.l || b.r || '>') AS wr
        | FROM ${pfx}w${m - 1} CROSS JOIN ${pfx}b$m b)""".stripMargin
    }
    sb.toString
  }

  private def bpeTrainOracle(numMerges: Int): String = {
    val rows = (1 to numMerges).map(m =>
      s"SELECT $m AS rank, l AS lsym, r AS rsym, l || r AS merged, " +
        s"c AS pair_count FROM b$m").mkString("\n UNION ALL ")
    s"""WITH ${bpeRoundsCtes(numMerges)}
       |SELECT * FROM (
       | $rows
       |) ORDER BY rank""".stripMargin
  }

  private def bpeEncodeOracle(numMerges: Int): String =
    s"""WITH ${bpeRoundsCtes(numMerges)},
       |ws AS (
       | SELECT word, CAST(length(word) AS BIGINT) AS n_chars,
       |  CAST(length(wr) - length(replace(wr, '<', '')) AS BIGINT) AS n_syms
       | FROM w$numMerges),
       |enc AS (
       | SELECT doc_id, word FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents) WHERE word <> '')
       |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       | CAST(sum(ws.n_chars) AS BIGINT) AS n_chars,
       | CAST(sum(ws.n_syms) AS BIGINT) AS n_bpe_symbols,
       | (10000 * CAST(sum(ws.n_syms) AS BIGINT))
       |   // CAST(sum(ws.n_chars) AS BIGINT) AS compression_bp
       |FROM enc e JOIN ws ON e.word = ws.word
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  private def bpeVocabOracle(numMerges: Int): String =
    s"""WITH ${bpeRoundsCtes(numMerges)},
       |sy AS (
       | SELECT word, cnt, unnest(string_split(trim(wr, '<>'), '><')) AS symbol
       | FROM w$numMerges)
       |SELECT symbol, CAST(count(DISTINCT word) AS BIGINT) AS n_words,
       | CAST(sum(cnt) AS BIGINT) AS n_occurrences,
       | length(symbol) > 1 AS is_merged
       |FROM sy GROUP BY symbol
       |ORDER BY n_occurrences DESC, symbol""".stripMargin

  private def bpeByteTrainOracle(numMerges: Int): String = {
    val rows = (1 to numMerges).map(m =>
      s"SELECT $m AS rank, l AS lsym, r AS rsym, l || r AS merged, " +
        s"c AS pair_count FROM byb$m").mkString("\n UNION ALL ")
    s"""WITH ${bpeRoundsCtesWith(byteWordTableCteSql, "by", numMerges)}
       |SELECT * FROM (
       | $rows
       |) ORDER BY rank""".stripMargin
  }

  /** n_bytes = strlen (DuckDB's byte length of a VARCHAR — verified
    * equal to Spark's octet_length on this host pair). */
  private def bpeByteEncodeOracle(numMerges: Int): String =
    s"""WITH ${bpeRoundsCtesWith(byteWordTableCteSql, "by", numMerges)},
       |byws AS (
       | SELECT word, CAST(strlen(word) AS BIGINT) AS n_bytes,
       |  CAST(length(wr) - length(replace(wr, '<', '')) AS BIGINT) AS n_syms
       | FROM byw$numMerges),
       |byenc AS (
       | SELECT doc_id, word FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents) WHERE word <> '')
       |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       | CAST(sum(ws.n_bytes) AS BIGINT) AS n_bytes,
       | CAST(sum(ws.n_syms) AS BIGINT) AS n_byte_symbols,
       | (10000 * CAST(sum(ws.n_syms) AS BIGINT))
       |   // CAST(sum(ws.n_bytes) AS BIGINT) AS compression_bp
       |FROM byenc e JOIN byws ws ON e.word = ws.word
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "bpe_train" -> bpeTrainOracle(8),
    "bpe_encode" -> bpeEncodeOracle(8),
    "bpe_vocab" -> bpeVocabOracle(8),
    "bpe_byte_train" -> bpeByteTrainOracle(8),
    "bpe_byte_encode" -> bpeByteEncodeOracle(8))
}
