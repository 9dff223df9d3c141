package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** UNIGRAM-LM tokenizer (the SentencePiece family — Kudo 2018,
  * "Subword Regularization"): the other production tokenizer family
  * next to BPE (row 220) — Llama/T5/Gemma ship unigram-LM vocabs. BPE
  * builds its vocab bottom-up by greedy merges; unigram-LM goes top
  * down: seed a large candidate-piece inventory, fit per-piece costs
  * by EM, and segment by Viterbi — the segmentation that MINIMIZES
  * total cost under the current model.
  *
  * This is the hard-EM (Viterbi-EM) variant: the E-step counts pieces
  * along each word's single best segmentation (weighted by word
  * count), the M-step re-fits costs from those counts and drops
  * pieces the corpus stopped using — the top-down prune that shrinks
  * the seed inventory to the surviving vocabulary. Single-character
  * pieces are never dropped (coverage floor: every word must stay
  * segmentable), exactly SentencePiece's required-character rule.
  *
  * The at-scale shape is BpeTrain's verbatim: ONE corpus pass
  * collapses to the Heaps-bounded word table (collect guarded at 5M
  * rows, loud failure past it), training runs driver-side over that
  * model-sized table (seed inventory ≤ maxPieceLen · total word
  * chars — Heaps-bounded too), and the trained piece table /
  * per-word segmentation stats ship back as broadcast-sized frames.
  * The corpus is never rescanned after round 0.
  *
  * Exactness (the cross-engine contract):
  *  - costs are integer micro-nats, rounded ONCE per piece:
  *    cost = round((ln(tot) − ln(cnt)) · 10⁶) — two ln of EXACT
  *    integer arguments in pinned order (the lm_surprisal / row-162
  *    discipline; driver-side math.log is the same JVM intrinsic
  *    Spark's codegen calls, and DuckDB's ln has agreed at micro
  *    rounding across the whole ln family for three rounds);
  *  - Viterbi DP state is a SORTABLE STRING — 13-digit zero-padded
  *    cost ‖ 2-digit piece count ‖ the '>'-joined piece key — so the
  *    argmin is a plain binary-order min both engines evaluate
  *    identically (ties: fewer pieces, then lexicographic key); the
  *    word table is validated free of '<' '>' quotes (wordTable's
  *    raise_error guard), making '>' a safe join char;
  *  - the oracle replays seeding, BOTH EM rounds and the final
  *    encode as unrolled MATERIALIZED CTEs — the DP unrolls one CTE
  *    per position up to [[maxWordLenBound]], and the trainer
  *    requires every word under that bound (loud failure, not a
  *    silent truncation). */
object UnigramLm {

  /** The oracle's DP unroll bound — the trainer refuses words longer
    * than this (testdata max is 8; the bound leaves headroom for a
    * driver regen without blowing up the generated SQL). */
  private[graft] val maxWordLenBound = 16

  /** Every driver-side index in this trainer is a CODEPOINT index
    * (r15 review): DuckDB substr/length and Spark SQL length() count
    * codepoints, while Java String indexes UTF-16 code units — on a
    * supplementary-plane character (emoji) naive substring would mint
    * lone-surrogate "pieces" and every oracle count would diverge.
    * Words decompose once into codepoint cells and pieces are cell
    * slices. */
  private def codepoints(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Seed inventory: every substring of length ≤ maxPieceLen, counted
    * per OCCURRENCE (overlapping convention, like BPE's pair counts)
    * and weighted by word count. */
  private[graft] def seedCounts(words: Array[(String, Long)],
                                maxPieceLen: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      val cps = codepoints(w)
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= cps.length) {
          val p = cps.slice(i, i + l).mkString
          m.update(p, m.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    m.toMap
  }

  /** Integer micro-nat costs from counts: round((ln tot − ln cnt)·10⁶),
    * both ln args exact integers passed through double exactly. */
  private def costsOf(counts: Map[String, Long]): Map[String, Long] = {
    val tot = counts.valuesIterator.sum
    val lnTot = math.log(tot.toDouble)
    counts.map { case (p, c) =>
      p -> math.round((lnTot - math.log(c.toDouble)) * 1000000.0d)
    }
  }

  /** Viterbi DP over one word with the EXACT state representation the
    * oracle's SQL uses (13-digit cost ‖ 2-digit n ‖ '>'-joined key,
    * binary-order min). Returns (costMicro, nPieces, pieces). Every
    * single char is in vocab by construction, so dp never dead-ends. */
  private[graft] def viterbi(word: String, cost: Map[String, Long],
                             maxPieceLen: Int): (Long, Int, Seq[String]) = {
    val cps = codepoints(word)
    val n = cps.length
    val dp = new Array[String](n + 1)
    dp(0) = "0" * 13 + "00"
    var i = 1
    while (i <= n) {
      var best: String = null
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dp(j) != null) {
          val piece = cps.slice(j, i).mkString
          val c = cost.get(piece)
          if (c.isDefined) {
            val nc = dp(j).substring(0, 13).toLong + c.get
            val nn = dp(j).substring(13, 15).toInt + 1
            val v = f"$nc%013d" + f"$nn%02d" + dp(j).substring(15) +
              ">" + piece
            if (best == null || BpeTrain.utf8Lt(v, best)) best = v
          }
        }
        j += 1
      }
      dp(i) = best
      i += 1
    }
    val v = dp(n)
    require(v != null, s"unigram viterbi dead-ended on '$word' — a " +
      "single-char piece is missing from the vocab (must not happen)")
    (v.substring(0, 13).toLong, v.substring(13, 15).toInt,
      v.substring(15).split('>').filter(_.nonEmpty).toSeq)
  }

  /** The driver-side trainer: seed → emIters × (Viterbi E-step,
    * re-fit M-step, drop dead pieces, char floor) → final costs.
    * Returns (piece, cnt, costMicro) for the surviving vocab. */
  private[graft] def trainLocal(words: Array[(String, Long)],
                                maxPieceLen: Int,
                                emIters: Int): Seq[(String, Long, Long)] = {
    require(words.nonEmpty, "unigram trainer: empty word table")
    require(words.forall(w => cpLen(w._1) <= maxWordLenBound),
      s"unigram trainer: a word exceeds the $maxWordLenBound-char DP " +
        "unroll bound — raise maxWordLenBound and regenerate the oracle")
    var vocab: Map[String, Long] = seedCounts(words, maxPieceLen)
    for (_ <- 1 to emIters) {
      val cost = costsOf(vocab)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        viterbi(w, cost, maxPieceLen)._3.foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        }
      }
      vocab = vocab.flatMap { case (p, _) =>
        val nc =
          if (cpLen(p) == 1) math.max(counts.getOrElse(p, 0L), 1L)
          else counts.getOrElse(p, 0L)
        if (nc > 0L) Some(p -> nc) else None
      }
    }
    val cost = costsOf(vocab)
    vocab.toSeq.map { case (p, c) => (p, c, cost(p)) }
      .sortBy(_._1)
  }

  private def collectedWords(docs: DataFrame): Array[(String, Long)] =
    BpeTrain.collectedWordTable(docs).map(r => (r._1, r._2))

  /** unigram_lm_train: the surviving vocab with counts and micro-nat
    * costs after `emIters` hard-EM rounds. */
  def unigramTrain(docs: DataFrame, maxPieceLen: Int = 4,
                   emIters: Int = 2): DataFrame = {
    require(maxPieceLen >= 1 && emIters >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    trainLocal(collectedWords(docs), maxPieceLen, emIters)
      .map { case (p, c, k) => (p, cpLen(p) == 1, c, k) }
      .toDF("piece", "is_char", "cnt", "cost_micro")
  }

  def unigramTrainQuery(spark: SparkSession, dir: String): DataFrame =
    unigramTrain(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("piece"))

  /** The DISTRIBUTED trainer (r15 verdict #4) — the same hard-EM,
    * with the collect GONE: [[unigramTrain]] pulls the word table to
    * the driver (5M-row loud-fail guard) because EM iterates; but the
    * E-step — Viterbi per word — is embarrassingly parallel, so here
    * it runs IN-PLAN and the guard lifts to corpus-bounded:
    *
    *  - the word table stays a DataFrame (one corpus pass, never
    *    collected), localCheckpointed once;
    *  - per round, each word's candidate pieces come from ONE
    *    broadcast hash join (explode the ≤ 16·L (start,len) windows,
    *    equi-join the vocab — O(1) lookups, vs. O(|vocab|) scans a
    *    broadcast MAP would cost) and collapse back to a per-word
    *    (start·32+len) → (cost, piece) map of ≤ 16·L entries;
    *  - the Viterbi DP is the SAME sortable-string recurrence as
    *    [[viterbi]], expressed as an in-row `aggregate` fold over
    *    positions (codegen'd HOFs — no UDF, no driver loop): state
    *    strings compare by UTF8 binary order in array_min exactly as
    *    the oracle's SQL min and the local trainer's utf8Lt;
    *  - the E-step counts are one map-side-combined groupBy(piece);
    *    the M-step (char floor, dead-piece drop, cost re-fit) runs on
    *    the VOCAB frame only — model-sized, localCheckpointed per
    *    round to truncate the growing HOF lineage.
    *
    * Nothing corpus-sized is ever collected or broadcast as a map;
    * the vocab broadcast is Heaps-bounded (≤ L · distinct word
    * chars). Spec-pinned piece-for-piece equal to [[trainLocal]];
    * the oracle is unigram_lm_train's VERBATIM — same model, same
    * rounds, different execution strategy. */
  def unigramTrainDistributed(docs: DataFrame, maxPieceLen: Int = 4,
                              emIters: Int = 2): DataFrame = {
    require(maxPieceLen >= 1 && emIters >= 1)
    val L = maxPieceLen
    val wt = BpeTrain.wordTable(docs)
      .select(when(length(col("word")) > maxWordLenBound,
        raise_error(concat(lit("unigramTrainDistributed: a word exceeds " +
          s"the $maxWordLenBound-char DP unroll bound: "), col("word"))))
        .otherwise(col("word")).as("word"), col("cnt"))
      .localCheckpoint()
    // candidate windows: every (start, len) substring occurrence —
    // shared by the seed count and each round's hit join
    val windows = wt
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("cnt"), col("i"),
        explode(sequence(lit(1),
          least(lit(L), length(col("word")) - col("i") + 1))).as("l"))
      .select(col("word"), col("cnt"), col("i"), col("l"),
        col("word").substr(col("i"), col("l")).as("piece"))
    var vocab = windows.groupBy("piece").agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint()
    def withCosts(voc: DataFrame): DataFrame =
      voc.crossJoin(broadcast(voc.agg(sum(col("cnt")).as("tot"))))
        .select(col("piece"), col("cnt"),
          round((log(col("tot")) - log(col("cnt"))) * lit(1000000.0d))
            .cast("long").as("cost"))
    // one Viterbi pass of the whole word table against a vocab-cost
    // frame: (word, cnt, state) with state the sortable final DP cell
    def viterbiPass(vocCost: DataFrame): DataFrame = {
      val hits = windows
        .join(broadcast(vocCost.select(col("piece"), col("cost"))), "piece")
        .groupBy(col("word"), col("cnt"))
        .agg(map_from_entries(collect_list(struct(
          (col("i") * 32 + col("l")).as("k"),
          struct(col("cost").as("c"), col("piece").as("p")).as("v"))))
          .as("m"))
      hits.select(col("word"), col("cnt"),
        aggregate(
          sequence(lit(1), length(col("word"))),
          array(lit("0" * 13 + "00")),
          (acc, t) => concat(acc, array(
            array_min(transform(
              sequence(greatest(t - L, lit(0)), t - 1),
              j => {
                val st = try_element_at(acc, j + 1)
                val hit = try_element_at(col("m"), (j + 1) * 32 + (t - j))
                when(st.isNotNull && hit.isNotNull,
                  concat(
                    lpad((st.substr(lit(1), lit(13)).cast("long")
                      + hit.getField("c")).cast("string"), 13, "0"),
                    lpad((st.substr(lit(14), lit(2)).cast("int") + 1)
                      .cast("string"), 2, "0"),
                    st.substr(lit(16), lit(1000)),
                    lit(">"), hit.getField("p")))
              })))),
          acc => element_at(acc, lit(-1))).as("state"))
    }
    for (_ <- 1 to emIters) {
      val counts = viterbiPass(withCosts(vocab))
        .select(col("cnt"),
          explode(split(col("state").substr(lit(16), lit(1000)), ">"))
            .as("piece"))
        .filter(col("piece") =!= "")
        .groupBy("piece").agg(sum(col("cnt")).as("ncnt"))
      vocab = vocab.join(counts, Seq("piece"), "left")
        .select(col("piece"),
          when(length(col("piece")) === 1,
            greatest(coalesce(col("ncnt"), lit(0L)), lit(1L)))
            .otherwise(coalesce(col("ncnt"), lit(0L))).as("cnt"))
        .filter(col("cnt") > 0)
        .localCheckpoint()
    }
    withCosts(vocab)
      .select(col("piece"), (length(col("piece")) === 1).as("is_char"),
        col("cnt"), col("cost").as("cost_micro"))
  }

  def unigramTrainDistributedQuery(spark: SparkSession,
                                   dir: String): DataFrame =
    unigramTrainDistributed(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("piece"))

  /** Per-word segmentation stats under the TRAINED model — the
    * broadcast-sized frame the encode join consumes (the bpe_encode
    * shape: documents are never re-segmented, words join the vocab). */
  private def trainedWordStats(docs: DataFrame, maxPieceLen: Int,
                               emIters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = collectedWords(docs)
    val cost = trainLocal(words, maxPieceLen, emIters)
      .map(r => r._1 -> r._3).toMap
    words.toSeq.map { case (w, _) =>
      val (k, n, _) = viterbi(w, cost, maxPieceLen)
      (w, cpLen(w).toLong, n.toLong, k)
    }.toDF("word", "n_chars", "n_pieces", "w_cost")
  }

  /** unigram_encode: per-doc piece counts + the corpus NLL under the
    * trained unigram LM (nll_micro = Σ viterbi cost — the tokenizer
    * doubles as a language model, which BPE does not). */
  def unigramEncode(docs: DataFrame, maxPieceLen: Int = 4,
                    emIters: Int = 2): DataFrame = {
    val ws = trainedWordStats(docs, maxPieceLen, emIters)
    docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word"))
      .filter(col("word") =!= "")
      .join(ws, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("w_cost")).as("nll_micro"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_pieces"), col("nll_micro"),
        expr("(10000 * n_pieces) div n_chars").as("compression_bp"))
  }

  def unigramEncodeQuery(spark: SparkSession, dir: String): DataFrame =
    unigramEncode(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** tokenizer_compare: char-BPE vs BYTE-BPE (r15 verdict #2 — the
    * GPT-2/Llama-3 family) vs unigram-LM vs the whitespace baseline
    * on the SAME corpus — corpus-level fertility (pieces per word,
    * micro) and compression (pieces per 10k CHARS — one shared
    * denominator so the families compare; byte-BPE's own
    * bytes-denominated number lives in bpe_byte_encode). All four
    * read the one Heaps-bounded word table; weighted sums are exact
    * BIGINTs. */
  def tokenizerCompare(docs: DataFrame, numMerges: Int = 8,
                       maxPieceLen: Int = 4, emIters: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE collected word table feeds the unigram trainer, the Viterbi
    // pass and the whitespace baseline; the BPE side runs its own
    // (already Heaps-guarded) collect inside trainedWordTable
    val words = collectedWords(docs)
    val cost = trainLocal(words, maxPieceLen, emIters)
      .map(r => r._1 -> r._3).toMap
    // BPE: symbols per word after the trained merge table
    val bpe = BpeTrain.trainedWordTable(docs, numMerges)
      .select(col("word"), col("cnt"),
        (length(col("wrapped"))
          - length(expr("replace(wrapped, '<', '')"))).cast("long")
          .as("n_pieces"))
    // byte-BPE: same cell-count read off the byte-trained table
    val bpeByte = BpeTrain.byteTrainedWordTable(docs, numMerges)
      .select(col("word"), col("cnt"),
        (length(col("wrapped"))
          - length(expr("replace(wrapped, '<', '')"))).cast("long")
          .as("n_pieces"))
    val uni = words.toSeq
      .map { case (w, c) => (w, c, viterbi(w, cost, maxPieceLen)._2.toLong) }
      .toDF("word", "cnt", "n_pieces")
    val ws = words.toSeq.map { case (w, c) => (w, c, 1L) }
      .toDF("word", "cnt", "n_pieces")
    def totals(tag: String, perWord: DataFrame) =
      perWord
        .agg(sum(col("cnt")).as("n_words"),
          sum(length(col("word")).cast("long") * col("cnt")).as("n_chars"),
          sum(col("n_pieces") * col("cnt")).as("n_pieces"))
        .select(lit(tag).as("tokenizer"), col("n_words"), col("n_chars"),
          col("n_pieces"),
          expr("(1000000 * n_pieces) div n_words").as("fertility_micro"),
          expr("(10000 * n_pieces) div n_chars").as("compression_bp"))
    totals("bpe", bpe)
      .unionByName(totals("bpe_byte", bpeByte))
      .unionByName(totals("unigram", uni))
      .unionByName(totals("whitespace", ws))
  }

  def tokenizerCompareQuery(spark: SparkSession, dir: String): DataFrame =
    tokenizerCompare(Tables.documents(spark, dir))
      .orderBy(col("tokenizer"))

  /** unigram_vocab_curve — the tokenizer-SIZING sweep (the tau_sweep
    * one-pass-for-the-whole-curve discipline pointed at vocab size,
    * SentencePiece's one real knob): train ONCE, then for each target
    * size V keep all single chars (the coverage floor) plus the top
    * (V − |chars|) multi-char pieces by (cnt desc, piece asc), RE-FIT
    * costs over the kept subset (probabilities renormalize — smaller
    * vocabs give the survivors lower costs, so neither fertility nor
    * NLL is a cross-size invariant; the curve is the measurement),
    * and Viterbi-resegment the word table. One corpus pass total; the
    * sweep runs driver-side over the Heaps-bounded table and each V's
    * DP replays in the oracle. */
  def unigramVocabCurve(docs: DataFrame,
                        targets: Seq[Int] = Seq(26, 32, 48, 9999),
                        maxPieceLen: Int = 4,
                        emIters: Int = 2): DataFrame = {
    require(targets.nonEmpty)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = collectedWords(docs)
    val trained = trainLocal(words, maxPieceLen, emIters)
    val chars = trained.filter(r => cpLen(r._1) == 1)
    val multis = trained.filter(r => cpLen(r._1) > 1)
      .sortWith((a, b) =>
        a._2 > b._2 || (a._2 == b._2 && BpeTrain.utf8Lt(a._1, b._1)))
    val rows = targets.map { v =>
      val kept = chars ++ multis.take(math.max(0, v - chars.length))
      val cost = costsOf(kept.map(r => (r._1, r._2)).toMap)
      var nPieces = 0L; var nChars = 0L; var nWords = 0L; var nll = 0L
      words.foreach { case (w, c) =>
        val (k, n, _) = viterbi(w, cost, maxPieceLen)
        nPieces += n.toLong * c; nll += k * c
        nChars += cpLen(w).toLong * c; nWords += c
      }
      (v.toLong, kept.size.toLong, nWords, nPieces,
        1000000L * nPieces / nWords, 10000L * nPieces / nChars, nll)
    }
    rows.toDF("vocab_target", "vocab_actual", "n_words", "n_pieces",
      "fertility_micro", "compression_bp", "nll_micro")
  }

  def unigramVocabCurveQuery(spark: SparkSession, dir: String): DataFrame =
    unigramVocabCurve(Tables.documents(spark, dir))
      .orderBy(col("vocab_target"))

  // ---------------------------------------------------------------- oracles

  /** Seed + EM rounds as CTEs over the shared `w0(word, cnt, wr)`
    * word table. Emits uv0 … uv$emIters (piece, cnt, cost). */
  private def unigramTrainCtes(maxPieceLen: Int, emIters: Int): String = {
    val L = maxPieceLen
    val sb = new StringBuilder
    sb ++= s"""upieces AS (
      | SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
      |  SELECT w.cnt, substr(w.word, i, l) AS piece
      |  FROM w0 w, UNNEST(range(1, length(w.word) + 1)) t(i),
      |   UNNEST(range(1, $L + 1)) u(l)
      |  WHERE i + l <= length(w.word) + 1)
      | GROUP BY piece),
      |uv0 AS MATERIALIZED (
      | SELECT piece, cnt,
      |  CAST(round((ln(CAST((SELECT sum(cnt) FROM upieces) AS DOUBLE))
      |    - ln(CAST(cnt AS DOUBLE))) * 1000000) AS BIGINT) AS cost
      | FROM upieces)""".stripMargin
    for (p <- 0 until emIters) sb ++= emRoundCtes(p, L)
    sb.toString
  }

  /** One Viterbi pass against uv$p + the E/M step producing uv${p+1}. */
  private def emRoundCtes(p: Int, L: Int): String = {
    val sb = new StringBuilder
    sb ++= viterbiCtes(s"udp${p}_", s"uv$p", s"uvit$p", L)
    sb ++= s""",
      |ucnt$p AS (
      | SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
      |  SELECT w.cnt,
      |   unnest(string_split(substr(v.val, 16), '>')) AS piece
      |  FROM uvit$p v JOIN w0 w USING (word))
      | WHERE piece <> '' GROUP BY piece),
      |uvn${p + 1} AS (
      | SELECT piece, cnt FROM (
      |  SELECT v.piece,
      |   CASE WHEN length(v.piece) = 1
      |        THEN greatest(COALESCE(c.cnt, 0), 1)
      |        ELSE COALESCE(c.cnt, 0) END AS cnt
      |  FROM uv$p v LEFT JOIN ucnt$p c USING (piece))
      | WHERE cnt > 0),
      |uv${p + 1} AS MATERIALIZED (
      | SELECT piece, cnt,
      |  CAST(round((ln(CAST((SELECT sum(cnt) FROM uvn${p + 1}) AS DOUBLE))
      |    - ln(CAST(cnt AS DOUBLE))) * 1000000) AS BIGINT) AS cost
      | FROM uvn${p + 1})""".stripMargin
    sb.toString
  }

  /** The Viterbi DP unrolled to maxWordLenBound positions against
    * vocab CTE `$vocab(piece, cnt, cost)`: dp state = the sortable
    * 13-digit-cost ‖ 2-digit-n ‖ key string, min = binary order.
    * Emits `$out(word, val)` — each word's best final state. */
  private def viterbiCtes(pfx: String, vocab: String, out: String,
                          L: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
      |${pfx}0 AS (SELECT word, repeat('0', 13) || '00' AS val FROM w0)""".stripMargin
    for (i <- 1 to maxWordLenBound) {
      val branches = (math.max(0, i - L) until i).map { j =>
        // concat operators sit at line ENDS: this fragment passes
        // through three stripMargin levels (branch -> viterbiCtes ->
        // the oracle template), and a leading '||' loses one pipe per
        // level
        s"""  SELECT d.word,
           |   lpad(CAST(CAST(substr(d.val, 1, 13) AS BIGINT) + v.cost
           |        AS VARCHAR), 13, '0') ||
           |   lpad(CAST(CAST(substr(d.val, 14, 2) AS BIGINT) + 1
           |        AS VARCHAR), 2, '0') ||
           |   substr(d.val, 16) || '>' || v.piece AS val
           |  FROM $pfx$j d JOIN $vocab v
           |   ON v.piece = substr(d.word, ${j + 1}, ${i - j})
           |  WHERE length(d.word) >= $i""".stripMargin
      }.mkString("\n  UNION ALL\n")
      // MATERIALIZED is load-bearing (the k-core lesson): each dp CTE
      // is referenced by up to L later positions, and DuckDB inlines
      // plain CTEs per reference — an un-materialized 16-level DP
      // replays ~L^16 subtrees and never finishes
      sb ++= s""",
        |$pfx$i AS MATERIALIZED (
        | SELECT word, min(val) AS val FROM (
        |$branches
        | ) GROUP BY word)""".stripMargin
    }
    val finals = (1 to maxWordLenBound).map(i =>
      s" SELECT word, val FROM $pfx$i WHERE length(word) = $i")
      .mkString("\n UNION ALL\n")
    sb ++= s""",
      |$out AS MATERIALIZED (
      |$finals)""".stripMargin
    sb.toString
  }

  private def unigramTrainOracle(maxPieceLen: Int, emIters: Int): String =
    s"""WITH ${BpeTrain.wordTableCteSql},
       |${unigramTrainCtes(maxPieceLen, emIters)}
       |SELECT piece, length(piece) = 1 AS is_char, cnt,
       | cost AS cost_micro
       |FROM uv$emIters ORDER BY cnt DESC, piece""".stripMargin

  private def unigramEncodeOracle(maxPieceLen: Int, emIters: Int): String =
    s"""WITH ${BpeTrain.wordTableCteSql},
       |${unigramTrainCtes(maxPieceLen, emIters)}
       |${viterbiCtes("uenc_", s"uv$emIters", "uvitenc", maxPieceLen)},
       |uwstat AS (
       | SELECT word, CAST(length(word) AS BIGINT) AS n_chars,
       |  CAST(substr(val, 1, 13) AS BIGINT) AS w_cost,
       |  CAST(substr(val, 14, 2) AS BIGINT) AS n_pieces
       | FROM uvitenc),
       |uencw AS (
       | SELECT doc_id, word FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents) WHERE word <> '')
       |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       | CAST(sum(s.n_chars) AS BIGINT) AS n_chars,
       | CAST(sum(s.n_pieces) AS BIGINT) AS n_pieces,
       | CAST(sum(s.w_cost) AS BIGINT) AS nll_micro,
       | (10000 * CAST(sum(s.n_pieces) AS BIGINT))
       |   // CAST(sum(s.n_chars) AS BIGINT) AS compression_bp
       |FROM uencw e JOIN uwstat s ON e.word = s.word
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  private def tokenizerCompareOracle(numMerges: Int, maxPieceLen: Int,
                                     emIters: Int): String =
    s"""WITH ${BpeTrain.bpeRoundsCtes(numMerges)},
       |${BpeTrain.bpeRoundsCtesWith(BpeTrain.byteWordTableCteSql, "by",
            numMerges)},
       |${unigramTrainCtes(maxPieceLen, emIters)}
       |${viterbiCtes("ucmp_", s"uv$emIters", "uvitcmp", maxPieceLen)},
       |per_word AS (
       | SELECT 'bpe' AS tokenizer, word, cnt,
       |  CAST(length(wr) - length(replace(wr, '<', '')) AS BIGINT)
       |   AS n_pieces
       | FROM w$numMerges
       | UNION ALL
       | SELECT 'bpe_byte', word, cnt,
       |  CAST(length(wr) - length(replace(wr, '<', '')) AS BIGINT)
       | FROM byw$numMerges
       | UNION ALL
       | SELECT 'unigram', w.word, w.cnt,
       |  CAST(substr(v.val, 14, 2) AS BIGINT)
       | FROM w0 w JOIN uvitcmp v USING (word)
       | UNION ALL
       | SELECT 'whitespace', word, cnt, CAST(1 AS BIGINT) FROM w0)
       |SELECT tokenizer, CAST(sum(cnt) AS BIGINT) AS n_words,
       | CAST(sum(length(word) * cnt) AS BIGINT) AS n_chars,
       | CAST(sum(n_pieces * cnt) AS BIGINT) AS n_pieces,
       | (1000000 * CAST(sum(n_pieces * cnt) AS BIGINT))
       |   // CAST(sum(cnt) AS BIGINT) AS fertility_micro,
       | (10000 * CAST(sum(n_pieces * cnt) AS BIGINT))
       |   // CAST(sum(length(word) * cnt) AS BIGINT) AS compression_bp
       |FROM per_word GROUP BY tokenizer ORDER BY tokenizer""".stripMargin

  /** One vocab-size branch: kept pieces, re-fit costs, a fresh
    * Viterbi DP, the aggregate row. */
  private def vocabCurveBranch(v: Int, maxPieceLen: Int,
                               emIters: Int): String =
    s""",
       |kept_$v AS MATERIALIZED (
       | SELECT piece, cnt FROM uv$emIters WHERE length(piece) = 1
       | UNION ALL
       | SELECT piece, cnt FROM (
       |  SELECT piece, cnt,
       |   row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |  FROM uv$emIters WHERE length(piece) > 1)
       | WHERE rn <= greatest($v - (SELECT count(*) FROM uv$emIters
       |                            WHERE length(piece) = 1), 0)),
       |vk_$v AS MATERIALIZED (
       | SELECT piece, cnt,
       |  CAST(round((ln(CAST((SELECT sum(cnt) FROM kept_$v) AS DOUBLE))
       |    - ln(CAST(cnt AS DOUBLE))) * 1000000) AS BIGINT) AS cost
       | FROM kept_$v)
       |${viterbiCtes(s"ucv${v}_", s"vk_$v", s"uvitcv$v", maxPieceLen)},
       |row_$v AS (
       | SELECT CAST($v AS BIGINT) AS vocab_target,
       |  (SELECT CAST(count(*) AS BIGINT) FROM kept_$v) AS vocab_actual,
       |  CAST(sum(w.cnt) AS BIGINT) AS n_words,
       |  CAST(sum(CAST(substr(t.val, 14, 2) AS BIGINT) * w.cnt)
       |   AS BIGINT) AS n_pieces,
       |  CAST(sum(length(w.word) * w.cnt) AS BIGINT) AS n_chars,
       |  CAST(sum(CAST(substr(t.val, 1, 13) AS BIGINT) * w.cnt)
       |   AS BIGINT) AS nll_micro
       | FROM uvitcv$v t JOIN w0 w USING (word))""".stripMargin

  private def unigramVocabCurveOracle(targets: Seq[Int], maxPieceLen: Int,
                                      emIters: Int): String = {
    val branches = targets.map(v =>
      vocabCurveBranch(v, maxPieceLen, emIters)).mkString("")
    val rows = targets.map(v =>
      s"""SELECT vocab_target, vocab_actual, n_words, n_pieces,
         | (1000000 * n_pieces) // n_words AS fertility_micro,
         | (10000 * n_pieces) // n_chars AS compression_bp,
         | nll_micro FROM row_$v""".stripMargin)
      .mkString("\n UNION ALL\n")
    s"""WITH ${BpeTrain.wordTableCteSql},
       |${unigramTrainCtes(maxPieceLen, emIters)}$branches
       |SELECT * FROM (
       |$rows
       |) ORDER BY vocab_target""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "unigram_lm_train" -> unigramTrainOracle(maxPieceLen = 4, emIters = 2),
    // the distributed trainer is the SAME model on the same rounds —
    // execution strategy changed, semantics didn't, so the oracle is
    // unigram_lm_train's verbatim
    "unigram_lm_train_dist" ->
      unigramTrainOracle(maxPieceLen = 4, emIters = 2),
    "unigram_encode" -> unigramEncodeOracle(maxPieceLen = 4, emIters = 2),
    "tokenizer_compare" -> tokenizerCompareOracle(numMerges = 8,
      maxPieceLen = 4, emIters = 2),
    "unigram_vocab_curve" -> unigramVocabCurveOracle(
      targets = Seq(26, 32, 48, 9999), maxPieceLen = 4, emIters = 2))
}
