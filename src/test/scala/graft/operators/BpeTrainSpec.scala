package graft.operators

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("trainBpe: learns the textbook merges on a hand-checkable corpus") {
    // the subword-nmt README corpus shape: 'low' x5, 'lower' x2,
    // 'newest' x6, 'widest' x3 — by hand, pair counts round 1:
    // (e,s)=9, (s,t)=9, (w,e)=8, (e,w)=6, ... tie (e,s)/(s,t) breaks
    // lexicographically to (e,s)
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val out = BpeTrain.trainBpe(docs, 3)
      .select("rank", "lsym", "rsym", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1, "e", "s", "es", 9L)))
    // after es: (es,t)=9 wins (ties with nothing); then (w, est)?
    assert(out(1) === ((2, "es", "t", "est", 9L)))
    // round 3: 'newest'x6 gives (w,est)=6+... 'widest' has (d,est)=3,
    // 'newest' (w,est)=6; (l,o)=7 from low/lower wins
    assert(out(2) === ((3, "l", "o", "lo", 7L)))
  }

  test("trainBpe: merging is leftmost non-overlapping") {
    // 'aaaa' x3: pairs (a,a) counted at 3 adjacent index positions x3
    // = 9; after merging, 'aaaa' -> 'aa','aa' (leftmost pairing, not
    // 'a','aa','a')
    val docs = Seq((1L, Array.fill(3)("aaaa").mkString(" ")))
      .toDF("doc_id", "text")
    val out = BpeTrain.trainBpe(docs, 2)
      .select("rank", "merged", "pair_count")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1, "aa", 9L)))
    // round 2: each word is now 'aa','aa' -> pair (aa,aa) x1 x3 words
    assert(out(1) === ((2, "aaaa", 3L)))
  }

  test("bpeEncode: compression accounting is exact per doc") {
    val docs = Seq(
      (1L, "newest newest lowest"),
      (2L, "xy"))
      .toDF("doc_id", "text")
    val out = BpeTrain.bpeEncode(docs, 2)
      .select("doc_id", "n_words", "n_chars", "n_bpe_symbols", "compression_bp")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // merges on this corpus: (e,s)=3 -> es; (es,t)=3 -> est
    // 'newest' -> n,e,w,est (4 syms); 'lowest' -> l,o,w,est (4 syms)
    assert(out(1L) === ((1L, 3L, 18L, 12L, 6666L)))
    // 'xy' untouched: 2 syms of 2 chars
    assert(out(2L) === ((2L, 1L, 2L, 2L, 10000L)))
  }

  test("bpeVocab: symbols partition every word's characters exactly") {
    val docs = Seq((1L, "newest newest lowest")).toDF("doc_id", "text")
    val out = BpeTrain.bpeVocab(docs, 2)
      .select("symbol", "n_words", "n_occurrences", "is_merged")
      .as[(String, Long, Long, Boolean)].collect()
    val bySym = out.map(r => r._1 -> r).toMap
    // merges: es, est; 'newest' (x2) -> n,e,w,est; 'lowest' -> l,o,w,est
    assert(bySym("est") === (("est", 2L, 3L, true)))
    assert(bySym("w") === (("w", 2L, 3L, false)))
    assert(bySym("n") === (("n", 1L, 2L, false)))
    // total symbol-weighted chars == corpus chars
    val chars = out.map(r => r._1.length * r._3).sum
    assert(chars === 2 * 6 + 6, "vocab must account for every character")
  }

  test("local trainer == distributed round loop, merge for merge") {
    // the r13 rewrite moved the merge loop driver-side; this pins the
    // two implementations equal on real testdata at a merge count
    // deep enough to hit count-1 ties and multi-char symbols
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val local = BpeTrain.trainBpe(docs, 20)
      .select("rank", "lsym", "rsym", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val dist = BpeTrain.trainBpeDistributed(docs, 20)
      .select("rank", "lsym", "rsym", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(local === dist)
    assert(local.length === 20)
  }

  test("indexed trainer == naive local trainer, merges AND final words") {
    // the r14 incremental trainer (pair-count deltas + lazy-deletion
    // heap) must be an execution-strategy change only: identical merge
    // list (counts, tiebreaks, exhaustion) and identical final wrapped
    // word table, on real testdata deep enough to hit ties, repeated
    // symbols and overlapping runs
    val rows = BpeTrain
      .collectedWordTable(graft.core.Tables.documents(spark,
        "/root/testdata/sf0.001"))
      .map(r => (r._3, r._2))
    val (mN, wN) = BpeTrain.trainMergesLocal(rows, 200)
    val (mI, wI) = BpeTrain.trainMergesLocalIndexed(rows, 200)
    assert(mI === mN)
    assert(wI.toSeq === wN.toSeq)
    // overlapping-run edge: "aaaa" merges (a,a) count 3 then (aa,aa)
    val tiny = Array(("<a><a><a><a>", 1L))
    val (mT, wT) = BpeTrain.trainMergesLocalIndexed(tiny, 3)
    val (mTn, wTn) = BpeTrain.trainMergesLocal(tiny, 3)
    assert(mT === mTn && wT.toSeq === wTn.toSeq)
    assert(mT.head.pair_count === 3L, "overlapping convention: aaaa has 3 (a,a)")
  }

  test("local trainer: 1000 merges on a production-shaped vocab") {
    // r12 verdict #5: the old loop was one Spark job per merge —
    // hours of scheduler latency at tokenizer-scale merge counts.
    // The driver-side loop must handle >= 1000 merges in seconds.
    // Fixture: 400 deterministic 8-char words (md5-derived), total
    // symbols 3200, so >= 1000 merges exist by the sum-of-symbols
    // argument (each merge removes >= 1 symbol, 3200 - 1000 > 400).
    val words = (0 until 400).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w$i".getBytes("UTF-8"))
      (h.take(8).map(b => ('a' + ((b & 0xff) % 26)).toChar).mkString
        .foldLeft("")((acc, c) => acc + s"<$c>"), (i % 7 + 1).toLong)
    }.toArray
    val t0 = System.nanoTime()
    val (merges, trained) = BpeTrain.trainMergesLocal(words, 1000)
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(merges.length === 1000, s"expected 1000 merges, got ${merges.length}")
    // ranks dense, counts non-negative, merged = l + r throughout
    assert(merges.map(_.rank) === (1 to 1000).toVector)
    assert(merges.forall(m => m.merged == m.lsym + m.rsym && m.pair_count >= 1))
    // character conservation: merging never loses a character
    assert(trained.map(w => w.count(_ == '<')).sum <= 3200)
    assert(trained.zip(words).forall { case (t, (w, _)) =>
      t.replace("<", "").replace(">", "") == w.replace("<", "").replace(">", "") })
    // generous CI bound; the measured wall (NOTES_r13) is ~100x under it
    assert(wallMs < 30000, s"1000 merges took ${wallMs}ms")
    info(s"1000 merges over 400 words: ${wallMs}ms")
  }

  test("trainBpe: stops early when no repeated pair remains") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // round 1 merges the lexicographically first count-1 pair (a,b);
    // subsequent rounds still find count-1 pairs until words are
    // single symbols: 'ab' -> ab, 'cd' -> cd after 2 merges; round 3
    // has NO adjacent pairs left anywhere -> early stop at 2 rows
    val out = BpeTrain.trainBpe(docs, 10)
      .select("rank", "merged").as[(Int, String)].collect().sortBy(_._1)
    assert(out.length === 2)
    assert(out.map(_._2).toSet === Set("ab", "cd"))
  }
}
