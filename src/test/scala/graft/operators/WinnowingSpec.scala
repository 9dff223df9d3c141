package graft.operators

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)], k: Int = 3, w: Int = 4) =
    Winnowing.winnowingFingerprints(docs.toDF("doc_id", "text"), k, w)
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("coverage guarantee: every w-window contains a selected position") {
    val text = (0 until 40).map(i => s"tok${i * 7 % 13}").mkString(" ")
    val k = 3; val w = 4
    val nShingles = 40 - k + 1
    val selected = fps(Seq((1L, text)), k, w).map(_._2).toSet
    (0 to nShingles - w).foreach { i =>
      assert((i until i + w).exists(p => selected.contains(p.toLong)),
        s"window starting at $i has no fingerprint")
    }
  }

  test("density: tie-free doc selects at most one fingerprint per window") {
    val text = (0 until 40).map(i => s"u$i").mkString(" ") // all distinct
    val sel = fps(Seq((1L, text)))
    // n windows can select at most n distinct positions, and far fewer
    // after dedup: expected density 2/(w+1) = 0.4
    assert(sel.size <= 40 - 3 + 1 - 4 + 1)
    assert(sel.size >= (40 - 3 + 1) / 4, "at least one per disjoint window")
  }

  test("robustness: docs sharing a >= w+k-1 token run share a fingerprint") {
    val shared = (0 until 10).map(i => s"common$i").mkString(" ") // 10 >= 4+3-1
    val a = s"alpha beta gamma delta $shared"
    val b = s"$shared zeta eta theta iota kappa"
    val out = fps(Seq((1L, a), (2L, b)))
    val ha = out.filter(_._1 == 1L).map(_._3).toSet
    val hb = out.filter(_._1 == 2L).map(_._3).toSet
    assert(ha.intersect(hb).nonEmpty,
      "shared run must contribute an identical fingerprint on both sides")
  }

  test("tie rule: constant doc selects the RIGHTMOST min of every window") {
    // k=1 on a constant doc: every hash equal, so window i selects
    // position i+w-1; selected set = {w-1 .. n-1}
    val out = fps(Seq((1L, Seq.fill(8)("x").mkString(" "))), k = 1, w = 3)
    assert(out.map(_._2) === (2L until 8L))
  }

  test("short doc (fewer than w shingles) still emits one fingerprint") {
    // 4 tokens, k=3 -> 2 shingles < w=4: one truncated whole-doc window
    val out = fps(Seq((1L, "a b c d")))
    assert(out.size === 1)
    // and the empty doc emits nothing
    assert(fps(Seq((2L, "a b"))) === Seq.empty)
  }

  test("winnowPairs: long shared run yields a pair; unrelated docs do not") {
    val shared = (0 until 20).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta $shared"),
      (2L, s"$shared zeta eta theta iota"),
      (3L, "totally unrelated words only here nothing shared at all"))
      .toDF("doc_id", "text")
    val out = Winnowing.winnowPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L)))
  }

  test("winnowPairs: overlap_bp is shared over the smaller fingerprint set") {
    val d = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val out = Winnowing.winnowPairs(d, minShared = 1)
      .select("shared", "n_a", "n_b", "overlap_bp")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.length === 1)
    val (shared, na, nb, bp) = out.head
    assert(na === nb && shared === na, "identical docs share everything")
    assert(bp === 10000L)
  }

  test("winnowPairs: maxDf drops hot postings and with them their pairs") {
    // one shingle shared by all three docs; df cap at 2 removes it
    val d = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y z"))
      .toDF("doc_id", "text")
    assert(Winnowing.winnowPairs(d, minShared = 1).count() === 3)
    assert(Winnowing.winnowPairs(d, minShared = 1, maxDf = 2L).count() === 0)
  }

  test("selection is position-correct: selected hash matches its shingle") {
    val text = "the quick brown fox jumps over the lazy dog today"
    val toks = text.split(" ")
    val out = fps(Seq((1L, text)))
    val hs = toks.sliding(3).map(_.mkString(" ")).toSeq.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    out.foreach { case (_, pos, h) =>
      assert(hs(pos.toInt) === h, s"hash at pos $pos mismatches")
    }
  }
}
