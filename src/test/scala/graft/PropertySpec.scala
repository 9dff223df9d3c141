package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.core.Layout
import graft.functions.CosineSimilarity
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Randomized-input checks of the library's core invariants — seeded,
  * so every run exercises the same deterministic cases (a flaky gate
  * would be worse than a narrow one). Bounded rounds: each case runs
  * real Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: native cosine == declarative fold cosine on random vectors") {
    val rnd = new Random(421)
    for (_ <- 1 to 5) {
      val vecs = List.fill(6)(List.fill(8)(rnd.nextDouble() * 20 - 10))
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "e")
      val a = df.toDF("ia", "ea")
      val b = df.toDF("ib", "eb")
      val out = a.join(b, a("ia") < b("ib"))
        .select(
          CosineSimilarity(col("ea"), col("eb")).as("native"),
          (dot(col("ea"), col("eb")) / (l2norm(col("ea")) * l2norm(col("eb"))))
            .as("folded"))
      assert(out.filter(col("native") =!= col("folded")).count() === 0L)
    }
  }

  test("property: LSH-verified pairs == exhaustive Jaccard pairs at the same threshold") {
    val rnd = new Random(422)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (_ <- 1 to 4) {
      // random base texts plus PLANTED near-dups (one token mutated →
      // trigram Jaccard ~0.8+), mirroring how near-dup corpora look
      val bases = List.fill(4)(List.fill(16)(vocab(rnd.nextInt(vocab.size))))
      val nearDups = bases.take(2).map { toks =>
        toks.updated(rnd.nextInt(toks.size), vocab(rnd.nextInt(vocab.size)))
      }
      val texts = (bases ++ nearDups).map(_.mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val lsh = Dedup.minhashLshPairs(docs, tau = 0.8)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val exact = Dedup.ngramJaccardPairs(docs, k = 3, tau = 0.8)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // LSH candidates are verified exactly, so false positives are
      // impossible. Misses: a 16x4 banding misses a pair at Jaccard s
      // with probability (1-s^4)^16 — ~2e-4 at s=0.8 and far lower for
      // the planted ~0.85+ pairs (do NOT lower tau here: at s=0.5 the
      // miss rate is ~35% and equality would be flaky by design).
      // With fixed seeds this is deterministic: a failure means the
      // hashing/banding changed, not bad luck.
      assert(lsh === exact, s"texts: $texts")
    }
  }

  test("property: maxDf caps hot-shingle candidate blowup; rare-shingle pairs survive") {
    val rnd = new Random(424)
    // skewed corpus: one boilerplate trigram in 50% of docs (a web-scale
    // header/footer in miniature), unique filler everywhere else, plus a
    // planted near-dup pair whose shared shingles are all RARE (df=2)
    val hot = "copy right footer"
    def filler(i: Int) = List.fill(12)(s"w${i}_${rnd.nextInt(1000)}").mkString(" ")
    val base = (0 until 20).map { i =>
      val t = filler(i)
      (i.toLong, if (i % 2 == 0) s"$hot $t" else t)
    }
    val dup = (20L, base(1)._2 + " tail") // near-dup of doc 1, rare shingles
    val hotOnlyA = (21L, hot)             // identical pair whose ONLY shingle
    val hotOnlyB = (22L, hot)             // is the hot one (jac = 1.0)
    val docs = (base :+ dup :+ hotOnlyA :+ hotOnlyB).toDF("doc_id", "text")

    val uncapped = Dedup.ngramCandidates(docs, k = 3, tau = 0.7, maxDf = Long.MaxValue).count()
    val capped = Dedup.ngramCandidates(docs, k = 3, tau = 0.7, maxDf = 5L).count()
    // the hot shingle (df=12) pairs up to 12*11/2 docs; the cap must
    // collapse candidates to only genuinely co-rare pairs
    assert(capped < uncapped, s"cap must prune: capped=$capped uncapped=$uncapped")
    assert(capped <= 3, s"only rare-shingle pairs may survive, got $capped")

    val cappedPairs = Dedup.ngramJaccardPairs(docs, k = 3, tau = 0.7, maxDf = 5L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncappedPairs = Dedup.ngramJaccardPairs(docs, k = 3, tau = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // exact verification means the cap can only LOSE pairs, never add
    assert(cappedPairs.subsetOf(uncappedPairs))
    // rare-shingle near-dup survives the cap
    assert(cappedPairs.contains((1L, 20L)))
    // the documented recall caveat, concretely: a pair whose shared
    // shingles are ALL hotter than maxDf is missed by the capped index
    assert(uncappedPairs.contains((21L, 22L)) && !cappedPairs.contains((21L, 22L)))
  }

  test("property: PPJoin prunes candidates but never a qualifying pair") {
    val rnd = new Random(427)
    for (round <- 1 to 3) {
      // random docs over a small vocab (lots of shared shingles) plus
      // planted near-dups at varied sizes — including boundary cases
      // where tau*n arithmetic is exercised at the integer edge
      val vocab = Vector.tabulate(15)(i => s"t$i")
      def doc(len: Int) = List.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (0 until 15).map(i => (i.toLong, doc(6 + rnd.nextInt(10))))
      val dups = base.take(4).zipWithIndex.map { case ((_, t), j) =>
        (100L + j, t + (if (j % 2 == 0) " extra" else ""))
      }
      val docs = (base ++ dups).toDF("doc_id", "text")
      for (tau <- Seq(0.5, 0.7, 0.8)) {
        val pp = Dedup.ngramCandidates(docs, k = 3, tau = tau,
          maxDf = Long.MaxValue, ppjoin = true)
          .as[(Long, Long)].collect().toSet
        val classic = Dedup.ngramCandidates(docs, k = 3, tau = tau,
          maxDf = Long.MaxValue, ppjoin = false)
          .as[(Long, Long)].collect().toSet
        assert(pp.subsetOf(classic),
          s"round=$round tau=$tau: PPJoin emitted a pair AllPairs didn't")
        // the filters must never drop a pair the EXACT verifier keeps:
        // ground-truth jaccard over ALL pairs == the operator's output
        // through the pruned candidates (the identity that keeps the
        // DuckDB oracle hash-matching)
        val sets = Dedup.docShingleSets(docs, 3)
          .select("doc_id", "sset").as[(Long, Seq[String])]
          .collect().toMap.view.mapValues(_.toSet).toMap
        val want = (for {
          a <- sets.keys; b <- sets.keys if a < b
          inter = sets(a).intersect(sets(b)).size
          jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
          if jac >= tau
        } yield (a, b)).toSet
        val got = Dedup.ngramJaccardPairs(docs, k = 3, tau = tau)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        assert(got === want,
          s"round=$round tau=$tau: pruned operator output != exhaustive truth")
      }
    }
  }

  test("property: containment prefix filter never drops a qualifying pair") {
    val rnd = new Random(431)
    for (round <- 1 to 3) {
      // random docs over a small vocab plus PLANTED containments: a
      // short doc whose text is a verbatim substring of a long one —
      // the asymmetric shape Jaccard's size filter rejects
      val vocab = Vector.tabulate(12)(i => s"w$i")
      def toks(len: Int) = List.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val longs = (0 until 8).map(i => (i.toLong, toks(14 + rnd.nextInt(8))))
      val contained = longs.take(3).zipWithIndex.map { case ((_, t), j) =>
        val start = rnd.nextInt(3)
        (100L + j, t.slice(start, start + 6 + rnd.nextInt(4)))
      }
      val docs = (longs ++ contained)
        .map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
      for (tau <- Seq(0.6, 0.8, 0.9)) {
        val sets = Dedup.docShingleSets(docs, 3)
          .select("doc_id", "sset").as[(Long, Seq[String])]
          .collect().toMap.view.mapValues(_.toSet).toMap
        val want = (for {
          a <- sets.keys; b <- sets.keys
          if a != b
          na = sets(a).size; nb = sets(b).size
          if na < nb || (na == nb && a < b) // a is the contained side
          c = sets(a).intersect(sets(b)).size
          if c.toDouble / na >= tau
        } yield (a, b)).toSet
        val got = Dedup.containmentPairs(docs, k = 3, tau = tau)
          .select("doc_small", "doc_big").as[(Long, Long)].collect().toSet
        assert(got === want,
          s"round=$round tau=$tau: containment output != exhaustive truth")
      }
    }
  }

  test("property: connectedComponents matches a driver-side union-find on random graphs") {
    val rnd = new Random(424)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = List.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (a min b, a max b) }.distinct
      // reference: classic union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val want = (0 until n).map { v =>
        v.toLong -> (0 until n).filter(u => find(u) == find(v)).min.toLong
      }.toMap

      val got = Dedup.connectedComponents(
          (0L until n.toLong).toDF("doc_id"),
          edges.toDF("doc_a", "doc_b"))
        .select("doc_id", "rep_id").as[(Long, Long)].collect().toMap
      assert(got === want)
    }
  }

  test("property: dupSpans matches a driver-side reference on random corpora with planted passages") {
    val rnd = new Random(428)
    val vocab = (1 to 40).map(i => s"w$i")
    val w = 3
    for (_ <- 1 to 4) {
      // random docs plus a PLANTED shared passage inserted at random
      // offsets in two of them — the alignment case the operator exists
      // to catch
      val passage = List.fill(5)(vocab(rnd.nextInt(vocab.size)))
      val texts = List.fill(5)(List.fill(12)(vocab(rnd.nextInt(vocab.size))))
        .zipWithIndex.map { case (toks, i) =>
          if (i < 2) {
            val at = rnd.nextInt(toks.size)
            toks.take(at) ++ passage ++ toks.drop(at)
          } else toks
        }
      val docs = texts.map(_.mkString(" ")).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

      // reference: brute-force windows, global df, interval union
      val wins = texts.zipWithIndex.flatMap { case (toks, d) =>
        toks.sliding(w).zipWithIndex.collect {
          case (win, p) if win.size == w => (d.toLong, p + 1L, win.mkString(" "))
        }
      }
      val df = wins.groupBy(_._3).map { case (k, v) => k -> v.map(_._1).distinct.size }
      val expected = texts.zipWithIndex.map { case (toks, d) =>
        val dupPos = wins.filter(x => x._1 == d && df(x._3) >= 2).map(_._2).sorted
        val coveredTokens = dupPos.flatMap(p => p until (p + w)).distinct
        // island count: break when the next window starts > w past the prev
        val spans = dupPos.foldLeft(0 -> -1L) { case ((n, prev), p) =>
          (if (prev < 0 || p - prev > w) n + 1 else n) -> p
        }._1
        (d.toLong, toks.size.toLong, dupPos.size.toLong, spans.toLong,
          coveredTokens.size.toLong)
      }.toSet

      val got = Dedup.dupSpans(docs, w = w, minDf = 2)
        .select("doc_id", "n_tokens", "n_dup_windows", "n_spans", "dup_tokens")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expected)
    }
  }

  test("property: dupSpansExact matches brute-force maximal repeated substrings; spans stay inside dupSpans coverage") {
    val rnd = new Random(1142)
    val vocab = (1 to 40).map(i => s"w$i")
    val w = 3
    for (_ <- 1 to 4) {
      val passage = List.fill(5)(vocab(rnd.nextInt(vocab.size)))
      val texts = List.fill(5)(List.fill(12)(vocab(rnd.nextInt(vocab.size))))
        .zipWithIndex.map { case (toks, i) =>
          if (i < 2) {
            val at = rnd.nextInt(toks.size)
            toks.take(at) ++ passage ++ toks.drop(at)
          } else toks
        }
      val docs = texts.map(_.mkString(" ")).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

      // reference: ENUMERATE every interval of length >= w, df over
      // distinct docs of the literal substring, keep df >= 2, reduce
      // to containment-maximal — same ground truth as the DuckDB
      // oracle, but driver-side and independent of both engines
      val subs = texts.zipWithIndex.flatMap { case (toks, d) =>
        for {
          s <- 0 until toks.size
          e <- (s + w - 1) until toks.size
        } yield (d.toLong, s + 1L, e + 1L, toks.slice(s, e + 1).mkString(" "))
      }
      val df = subs.groupBy(_._4).map { case (k, v) => k -> v.map(_._1).distinct.size }
      val rep = subs.collect { case (d, s, e, t) if df(t) >= 2 => (d, s, e) }
      val expected = rep.filter { case (d, s, e) =>
        !rep.exists { case (d2, s2, e2) =>
          d2 == d && s2 <= s && e2 >= e && (s2 < s || e2 > e) }
      }.map { case (d, s, e) => (d, s, e, e - s + 1) }.toSet

      val got = Dedup.dupSpansExact(docs, w = w)
        .select("doc_id", "s", "e", "len")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === expected)

      // containment: every exact span lies inside dupSpans' window-
      // union coverage of the same doc (the exact family can only
      // TIGHTEN the audit, never claim new positions)
      val coverage = Dedup.dupSpans(docs, w = w, minDf = 2)
        .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
      val exactTokens = got.groupBy(_._1).view.mapValues(spans =>
        spans.flatMap(sp => sp._2 to sp._3).size.toLong).toMap
      exactTokens.foreach { case (d, n) =>
        assert(n <= coverage.getOrElse(d, 0L),
          s"doc $d: exact covers $n tokens > dupSpans ${coverage.getOrElse(d, 0L)}")
      }
    }
  }

  test("property: saltedJoin is result-equivalent to the plain join") {
    val rnd = new Random(423)
    for (_ <- 1 to 4) {
      val rows = List.fill(30)((rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong))
      val left = rows.toDF("k", "row_id")
      val right = (0L to 5L).map(i => (i, s"v$i")).toDF("k", "v")
      val plain = left.join(right, left("k") === right("k"))
        .select("row_id", "v").as[(Long, String)].collect().toSeq.sorted
      val salted = Layout.saltedJoin(left, right, "k", "k",
          salts = 4, saltBy = hash(col("row_id")))
        .select("row_id", "v").as[(Long, String)].collect().toSeq.sorted
      assert(salted === plain)
    }
  }
}
