package graft.operators

import graft.SparkSpec

/** Byte-level BPE (r15 verdict #2): hex-celled UTF-8 bytes as the
  * alphabet, zero OOV by construction. */
class BpeByteSpec extends SparkSpec {
  import spark.implicits._

  private def hexOf(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").mkString

  test("bpeByteTrain: ASCII corpus — byte merges are the char merges " +
      "mapped through hex (2-digit hex is monotonic in byte value, so " +
      "tiebreaks agree)") {
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val charM = BpeTrain.trainBpe(docs, 3)
      .select("rank", "lsym", "rsym", "pair_count")
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    val byteM = BpeTrain.bpeByteTrain(docs, 3)
      .select("rank", "lsym", "rsym", "pair_count")
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(byteM.toSeq ===
      charM.toSeq.map(m => (m._1, hexOf(m._2), hexOf(m._3), m._4)))
    // and the textbook first merge, in hex: (e,s) = (65,73), count 9
    assert(byteM(0) === ((1, "65", "73", 9L)))
  }

  test("bpeByteTrain: merges CROSS character boundaries — the byte-level " +
      "distinctive (é = C3 A9; in 'éé' the A9–C3 seam pair exists)") {
    // 'éé' x3: bytes C3 A9 C3 A9 → pairs (C3,A9)x2, (A9,C3)x1 per word
    val docs = Seq((1L, Array.fill(3)("éé").mkString(" ")))
      .toDF("doc_id", "text")
    val out = BpeTrain.bpeByteTrain(docs, 2)
      .select("rank", "lsym", "rsym", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1, "C3", "A9", "C3A9", 6L)))
    // after <C3A9><C3A9>: the pair (C3A9, C3A9) x3
    assert(out(1) === ((2, "C3A9", "C3A9", "C3A9C3A9", 3L)))
  }

  test("bpeByteEncode: byte accounting is exact on multibyte text") {
    // doc 'é é x': words é(2 bytes) x2, x(1 byte) x1; 1 merge trains
    // (C3,A9) → é is ONE symbol, x one
    val docs = Seq((1L, "é é x")).toDF("doc_id", "text")
    val out = BpeTrain.bpeByteEncode(docs, 1)
      .select("doc_id", "n_words", "n_bytes", "n_byte_symbols",
        "compression_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 3L, 5L, 3L, 6000L)))
  }

  test("bpeByteApply: ZERO OOV on astral-plane input unseen at training " +
      "— encodes, round-trips the exact bytes, and still applies the " +
      "trained merges where they match") {
    // train on pure-ASCII text; 'ab' is frequent so (61,62) merges
    val docs = Seq((1L, Array.fill(9)("ab").mkString(" ") + " cd"))
      .toDF("doc_id", "text")
    val merges = BpeTrain.bpeByteTrain(docs, 1)
    assert(merges.select("merged").as[String].collect().toSeq ===
      Seq("6162"))
    // unseen words: an astral-plane char (𝄞 U+1D11E = F0 9D 84 9E,
    // a surrogate PAIR in UTF-16 — the NOTES_r15 §11.1 class) between
    // trained context, plus a pure-emoji word
    val novel = Seq("a𝄞b", "ab𝄞ab", "🎼").toDF("word")
    val out = BpeTrain.bpeByteApply(novel, merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    // every word encodes (no dead-end — zero OOV), and the symbol
    // concatenation is the word's EXACT UTF-8 bytes
    for ((w, syms) <- out) {
      assert(syms.nonEmpty && syms.forall(s =>
        s.length % 2 == 0 && s.matches("[0-9A-F]+")), s"bad syms for $w")
      assert(syms.mkString === hexOf(w), s"round-trip failed for $w")
    }
    // the trained merge applied inside the unseen word where adjacent
    assert(out("ab𝄞ab") ===
      Seq("6162", "F0", "9D", "84", "9E", "6162"))
    // and 𝄞's bytes did NOT merge (never seen at training)
    assert(out("a𝄞b") === Seq("61", "F0", "9D", "84", "9E", "62"))
  }

  test("tokenizerCompare: carries all four families with exact totals") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val rows = UnigramLm.tokenizerCompare(docs, numMerges = 1,
        maxPieceLen = 2, emIters = 1)
      .select("tokenizer", "n_words", "n_chars", "n_pieces")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows.keySet ===
      Set("bpe", "bpe_byte", "unigram", "whitespace"))
    // 3 words, 6 chars everywhere; whitespace = 3 pieces; char-BPE
    // merges (a,b) [count 2 beats (c,d) 1] → ab=1 sym, cd=2 syms → 4;
    // byte-BPE identical on ASCII → 4
    assert(rows("whitespace") === ((3L, 6L, 3L)))
    assert(rows("bpe") === ((3L, 6L, 4L)))
    assert(rows("bpe_byte") === ((3L, 6L, 4L)))
    // unigram with maxPieceLen 2: 'ab' and 'cd' are 1-piece words
    assert(rows("unigram") === ((3L, 6L, 3L)))
  }
}
