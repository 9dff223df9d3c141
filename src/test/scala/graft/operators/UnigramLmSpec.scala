package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer (r14 verdict #1): hand-computed EM + Viterbi
  * on a corpus small enough to verify on paper, encode parity against
  * that hand segmentation, and the tokenizer_compare invariants.
  *
  * Hand corpus: "abab"×3, "ab"×2 (maxPieceLen=2, emIters=1).
  * Seed counts (every substring occurrence, weighted):
  *   a=8, b=8, ab=8, ba=3; tot=27.
  * Seed costs (micro-nats): c(a)=c(b)=c(ab)=round(ln(27/8)e6)=1216395,
  *   c(ba)=round(ln 9 e6)=2197225.
  * Viterbi: "abab" → ab·ab (2c < 4c for a·b·a·b), "ab" → ab.
  * E-step counts: ab = 3·2 + 2·1 = 8; a,b unused → char floor 1;
  *   ba dead → dropped. Final tot=10:
  *   c(ab)=round(ln(10/8)e6)=223144, c(a)=c(b)=round(ln10·e6)=2302585. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def handDocs = Seq(
    (0L, "abab ab"),
    (1L, "abab abab ab")).toDF("doc_id", "text")

  test("hand-computed EM: seed -> viterbi counts -> char floor -> " +
      "dead-piece drop -> final micro-nat costs") {
    val got = UnigramLm.unigramTrain(handDocs, maxPieceLen = 2,
        emIters = 1)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().toSet
    assert(got === Set(
      ("ab", false, 8L, 223144L),
      ("a", true, 1L, 2302585L),
      ("b", true, 1L, 2302585L)))
  }

  test("viterbi segments by minimal total cost with the sortable-" +
      "state tiebreak (fewer pieces, then key)") {
    val cost = Map("a" -> 1216395L, "b" -> 1216395L, "ab" -> 1216395L,
      "ba" -> 2197225L)
    val (c, n, pieces) = UnigramLm.viterbi("abab", cost, 2)
    assert(pieces === Seq("ab", "ab") && n === 2 && c === 2432790L)
    // a word the multi-char vocab can't cover falls back to chars
    val (_, n2, p2) = UnigramLm.viterbi("ba", Map("b" -> 5L, "a" -> 5L), 2)
    assert(p2 === Seq("b", "a") && n2 === 2)
  }

  test("encode parity vs the hand segmentation") {
    val got = UnigramLm.unigramEncode(handDocs, maxPieceLen = 2,
        emIters = 1)
      .select("doc_id", "n_words", "n_chars", "n_pieces", "nll_micro",
        "compression_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // doc 0: abab(ab·ab) + ab(ab) = 3 pieces, nll 2·223144 + 223144
    // doc 1: two abab + ab = 5 pieces
    assert(got === Set(
      (0L, 2L, 6L, 3L, 669432L, 5000L),
      (1L, 3L, 10L, 5L, 1115720L, 5000L)))
  }

  test("supplementary-plane safety: pieces are CODEPOINT slices, " +
      "never lone surrogates (r15 review fix)") {
    // "a😀b" is 4 UTF-16 units but 3 codepoints — the trainer must
    // see 3 chars, classify 😀 as a single char, and never mint a
    // half-surrogate piece
    val docs = Seq((0L, "a😀b a😀b"))
      .toDF("doc_id", "text")
    val got = UnigramLm.unigramTrain(docs, maxPieceLen = 2, emIters = 1)
      .select("piece", "is_char", "cnt")
      .as[(String, Boolean, Long)].collect()
    got.foreach { case (p, isChar, _) =>
      assert(!p.exists(ch => Character.isSurrogate(ch) &&
        p.codePointCount(0, p.length) == p.length),
        s"lone surrogate leaked into piece '$p'")
      assert(isChar === (p.codePointCount(0, p.length) == 1))
    }
    val enc = UnigramLm.unigramEncode(docs, maxPieceLen = 2, emIters = 1)
      .select("n_chars").as[Long].collect()
    assert(enc.toSeq === Seq(6L),
      "n_chars must count codepoints (2 words x 3 cp), not UTF-16 units")
  }

  test("trainer refuses words past the DP unroll bound, loudly") {
    val long = Seq((0L, "a" * (UnigramLm.maxWordLenBound + 1)))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      UnigramLm.unigramTrain(long).collect()
    }
    assert(ex.getMessage.contains("unroll bound"))
  }

  test("distributed trainer == local trainer piece-for-piece on the " +
      "hand corpus and on real testdata (r15 verdict #4)") {
    // hand corpus first: small enough to eyeball a divergence
    val h1 = UnigramLm.unigramTrain(handDocs, maxPieceLen = 2, emIters = 1)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().sortBy(_._1)
    val h2 = UnigramLm.unigramTrainDistributed(handDocs, maxPieceLen = 2,
        emIters = 1)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().sortBy(_._1)
    assert(h1.toSeq === h2.toSeq)
    // the real corpus at the default knobs — the strategies must agree
    // on every (piece, cnt, cost) triple
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = UnigramLm.unigramTrain(docs)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().sortBy(_._1)
    val b = UnigramLm.unigramTrainDistributed(docs)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().sortBy(_._1)
    assert(a.length === b.length,
      s"vocab sizes diverge: local ${a.length} vs distributed ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("distributed trainer: codepoint discipline holds without the " +
      "driver (supplementary-plane corpus)") {
    val docs = Seq((0L, "a😀b a😀b")).toDF("doc_id", "text")
    val a = UnigramLm.unigramTrain(docs, maxPieceLen = 2, emIters = 1)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().sortBy(_._1)
    val b = UnigramLm.unigramTrainDistributed(docs, maxPieceLen = 2,
        emIters = 1)
      .select("piece", "is_char", "cnt", "cost_micro")
      .as[(String, Boolean, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("distributed trainer refuses over-bound words in-plan, loudly") {
    val long = Seq((0L, "a" * (UnigramLm.maxWordLenBound + 1)))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      UnigramLm.unigramTrainDistributed(long).collect()
    }
    assert(ex.getMessage.contains("unroll bound") ||
      (ex.getCause != null &&
        ex.getCause.getMessage.contains("unroll bound")))
  }

  test("vocab curve hand case: chars-only vs full vocab re-cost and " +
      "re-segment exactly") {
    // V=2 keeps only {a, b} (tot 2, cost ln2 = 693147 each): "abab"
    // segments to 4 chars, "ab" to 2 — 16 weighted pieces, nll
    // 16·693147. V=3 restores {ab} and the EM-final costs: 8 pieces.
    val rows = UnigramLm.unigramVocabCurve(handDocs, targets = Seq(2, 3),
        maxPieceLen = 2, emIters = 1)
      .select("vocab_target", "vocab_actual", "n_words", "n_pieces",
        "fertility_micro", "compression_bp", "nll_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(rows === Set(
      (2L, 2L, 5L, 16L, 3200000L, 10000L, 16L * 693147L),
      (3L, 3L, 5L, 8L, 1600000L, 5000L, 1785152L)))
  }

  test("vocab curve structural invariants: coverage floor, clamped " +
      "actual size, shared corpus totals") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = UnigramLm.unigramVocabCurve(docs)
      .select("vocab_target", "vocab_actual", "n_words", "n_pieces",
        "fertility_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(rows.map(_._3).toSet.size === 1, "one shared n_words")
    val nChars = UnigramLm.unigramTrain(docs)
      .filter(col("is_char")).count()
    rows.foreach { case (t, a, w, p, f) =>
      // coverage floor <= actual <= max(target, floor): the real
      // clamp law (the first draft of this assertion was a tautology)
      assert(a >= nChars && a <= math.max(t, nChars),
        s"target $t: actual $a outside [$nChars, max($t, $nChars)]")
      assert(p >= w && f >= 1000000L)
    }
    // actual size is monotone in target and clamps at the trained size
    val actual = rows.map(_._2)
    assert(actual.zip(actual.tail).forall { case (x, y) => x <= y })
    assert(rows.last._1 === 9999L && rows.last._2 < 9999L,
      "the top target must clamp to the trained vocab")
  }

  test("tokenizer_compare invariants on real testdata: shared word/" +
      "char totals, fertility >= 1e6 (pieces never cross words)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = UnigramLm.tokenizerCompare(docs)
      .select("tokenizer", "n_words", "n_chars", "n_pieces",
        "fertility_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).toSet ===
      Set("bpe", "bpe_byte", "unigram", "whitespace"))
    assert(rows.map(_._2).toSet.size === 1, "one shared n_words")
    assert(rows.map(_._3).toSet.size === 1, "one shared n_chars")
    rows.foreach { case (t, w, _, p, f) =>
      assert(p >= w && f >= 1000000L, s"$t fertility below 1 piece/word")
    }
    val ws = rows.find(_._1 == "whitespace").get
    assert(ws._4 === ws._2 && ws._5 === 1000000L)
  }
}
