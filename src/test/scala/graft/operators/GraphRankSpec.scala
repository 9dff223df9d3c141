package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int = 10) =
    GraphRank.pageRank(edges.toDF("src", "dst", "w"), iters)
      .select("node", "out_w", "rank_micro")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("pageRank: hand-traced chain with a dangling sink") {
    // A→B only. r0 = 500000 each; A never receives ⇒ settles at the
    // base 75000; B receives A's full (damped) mass: 75000 from round
    // 3 on ⇒ 75000 + (85·75000) div 100 = 138750. B is dangling — its
    // mass leaks, but it is still ranked INTO.
    val out = ranks(Seq(("A", "B", 1L)))
    assert(out("A") === ((1L, 75000L)))
    assert(out("B") === ((0L, 138750L)))
  }

  test("pageRank: a symmetric cycle is an exact fixed point conserving mass") {
    val out = ranks(Seq(("A", "B", 1L), ("B", "A", 1L)))
    assert(out("A") === ((1L, 500000L)))
    assert(out("B") === ((1L, 500000L)))
    assert(out.values.map(_._2).sum === 1000000L, "no truncation loss here")
  }

  test("pageRank: link mass concentrates on the hub") {
    // star A→C, B→C with a C self-loop: accumulation is monotone (a
    // back-link instead would make the rank oscillate with period 2
    // and the comparison parity-dependent on the iteration count)
    val out = ranks(Seq(("A", "C", 1L), ("B", "C", 1L), ("C", "C", 1L)))
    assert(out("C")._2 > out("A")._2 && out("C")._2 > out("B")._2)
    assert(out("A") === out("B"), "A and B are symmetric sources")
    assert(out("A")._2 === 50000L, "sources settle at the base mass")
  }

  test("pageRank: iters=0 returns the uniform prior") {
    val out = ranks(Seq(("A", "B", 1L), ("B", "C", 1L)), iters = 0)
    assert(out.values.map(_._2).toSet === Set(1000000L / 3))
  }

  private def tris(edges: Seq[(String, String)]) =
    GraphRank.triangleCount(edges.toDF("u", "v"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("triangleCount: one triangle, every vertex counts it once") {
    val out = tris(Seq(("A", "B"), ("B", "C"), ("C", "A")))
    assert(out === Map("A" -> ((2L, 1L)), "B" -> ((2L, 1L)), "C" -> ((2L, 1L))))
  }

  test("triangleCount: a 4-cycle has no triangles") {
    val out = tris(Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")))
    assert(out.values.forall(_._2 === 0L))
    assert(out.values.forall(_._1 === 2L))
  }

  test("triangleCount: K4 — four triangles, each vertex in three") {
    val vs = Seq("A", "B", "C", "D")
    val out = tris(for { a <- vs; b <- vs if a < b } yield (a, b))
    assert(out.values.forall(_ === ((3L, 3L))))
    // each triangle counted at exactly one source ⇒ Σ per-node = 3·4
    assert(out.values.map(_._2).sum === 12L)
  }

  test("triangleCount: reversed duplicates and self-loops canonicalize away") {
    val out = tris(Seq(("A", "B"), ("B", "A"), ("B", "C"), ("A", "C"),
      ("C", "C")))
    assert(out("A") === ((2L, 1L)) && out.size === 3)
  }

  test("triangleCount: bowtie — the shared apex sees both triangles") {
    val out = tris(Seq(("A", "B"), ("B", "X"), ("X", "A"),
      ("C", "D"), ("D", "X"), ("X", "C")))
    assert(out("X") === ((4L, 2L)))
    assert(out("A")._2 === 1L && out("C")._2 === 1L)
  }

  test("tokenCooccurrence: per-mille threshold against the doc count") {
    // 4 docs: (a b) together in 3 → 750‰; (a c) in 1 → 250‰
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val hi = GraphRank.tokenCooccurrence(docs, perMille = 700)
      .as[(String, String, Long)].collect().toSet
    assert(hi === Set(("a", "b", 3L)))
    val lo = GraphRank.tokenCooccurrence(docs, perMille = 250)
      .as[(String, String, Long)].collect().toSet
    assert(lo === Set(("a", "b", 3L), ("a", "c", 1L)))
  }

  private def lpa(edges: Seq[(String, String, Long)], iters: Int = 5) =
    GraphRank.labelPropagation(edges.toDF("u", "v", "w"), iters)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("labelPropagation: two disjoint triangles settle on their min labels") {
    val out = lpa(Seq(("A", "B", 1L), ("B", "C", 1L), ("A", "C", 1L),
      ("X", "Y", 1L), ("Y", "Z", 1L), ("X", "Z", 1L)))
    assert(out("A") === (("A", 3L)) && out("B") === (("A", 3L)) &&
      out("C") === (("A", 3L)))
    assert(out("X") === (("X", 3L)) && out("Y") === (("X", 3L)) &&
      out("Z") === (("X", 3L)))
  }

  test("labelPropagation: edge weight outvotes label-id preference") {
    // X's neighbors: A (w=3) vs B,C (w=1 each). Round 1: X adopts A's
    // label by weight even though B < C labels exist with equal count.
    val out = lpa(Seq(("X", "A", 3L), ("X", "B", 1L), ("X", "C", 1L)),
      iters = 1)
    assert(out("X")._1 === "A")
    // leaves each see only X ⇒ all adopt "X"
    assert(out("A")._1 === "X" && out("B")._1 === "X" && out("C")._1 === "X")
  }

  test("labelPropagation: synchronous oscillation is deterministic by iteration count") {
    // star: center M, leaves a,b,c — classic period-2 oscillator.
    // Odd iters: leaves hold M's previous label, center holds min leaf.
    val edges = Seq(("M", "a", 1L), ("M", "b", 1L), ("M", "c", 1L))
    val odd = lpa(edges, iters = 5)
    assert(odd("M")._1 === "a" && odd("a")._1 === "M")
    val even = lpa(edges, iters = 4)
    assert(even("M")._1 === "M" && even("a")._1 === "a")
  }

  test("eventTransitions builds per-user consecutive pairs in (ts, event_id) order") {
    val ev = Seq(
      // user 1: a @t1, b @t2, a @t3 ⇒ a→b, b→a
      (1L, 10L, "2021-01-01 00:00:01", "a"),
      (2L, 10L, "2021-01-01 00:00:02", "b"),
      (3L, 10L, "2021-01-01 00:00:03", "a"),
      // user 2: same-ts tie broken by event_id: b(4) then a(5) ⇒ b→a
      (4L, 20L, "2021-01-01 00:00:05", "b"),
      (5L, 20L, "2021-01-01 00:00:05", "a"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val ed = GraphRank.eventTransitions(ev)
      .as[(String, String, Long)].collect().toSet
    assert(ed === Set(("a", "b", 1L), ("b", "a", 2L)))
  }
}
