package graft.operators

import graft.SparkSpec

class TopComponentSpec extends SparkSpec {
  import spark.implicits._

  test("power iteration recovers a planted dominant direction") {
    // vectors = strong e3 component + small deterministic noise
    val rnd = new scala.util.Random(42)
    val data = (0L until 200L).map { id =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat * 0.05f)
      base(3) = (if (rnd.nextBoolean()) 1.0f else -1.0f) * 1.0f
      (id, base, 0)
    }.toDF("vec_id", "embedding", "label")
    val v = Similarity.topComponent(data, iters = 6, dim = 8)
      .as[(Int, Long)].collect().toMap
    assert(math.abs(v(3)) === 10000L,
      s"the planted axis must carry the max-norm unit: $v")
    (0 until 8).filterNot(_ == 3).foreach { j =>
      assert(math.abs(v(j)) < 2000L,
        s"off-axis component $j = ${v(j)} should be small")
    }
  }

  test("an isotropic pair of axes still converges deterministically") {
    // exactly two orthogonal directions with DIFFERENT masses
    val data = (
      (0L until 30L).map(i => (i, Array(1.0f, 0.0f), 0)) ++
      (30L until 40L).map(i => (i, Array(0.0f, 1.0f), 0))
    ).toDF("vec_id", "embedding", "label")
    val v = Similarity.topComponent(data, iters = 6, dim = 2)
      .as[(Int, Long)].collect().toMap
    assert(math.abs(v(0)) === 10000L, "the heavier axis dominates")
    assert(math.abs(v(1)) < 100L)
  }

  test("repeated runs are bit-identical (no RNG anywhere)") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Similarity.topComponent(emb).collect().map(_.toSeq).toSeq
    val b = Similarity.topComponent(emb).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === 64)
  }

  test("all-but-the-top residuals are orthogonal to the top component " +
       "and unit-normalized") {
    // planted anisotropy: every vector shares a fat e1 component
    val rnd = new scala.util.Random(7)
    val data = (0L until 120L).map { id =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat * 0.2f)
      base(1) += 2.0f
      (id, base, 0)
    }.toDF("vec_id", "embedding", "label")
    val v = Similarity.topComponent(data, iters = 6, dim = 8)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val rows = Similarity.embedAllButTop(data, iters = 6, dim = 8)
      .as[(Long, Option[Long], Option[Long], String)].collect()
    assert(rows.length === 120)
    rows.foreach { case (id, cosT, resN, csv) =>
      val e = csv.split(",").map(_.toLong)
      // residual ⟂ v: micro-rounded components against the integer
      // direction — |Σ e_i·v_i| is bounded by dim/2 rounding units × |v|
      val dot = e.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) <= 8L * 10000L / 2 + 10000L,
        s"vec $id residual not orthogonal: dot=$dot")
      // unit norm in micro units (±dim rounding slack)
      val n2 = e.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(math.sqrt(n2) - 1e6) < 50.0,
        s"vec $id residual norm ${math.sqrt(n2)}")
      // the planted common direction was most of each vector's mass:
      // alignment high, surviving fraction well below 1
      assert(cosT.exists(c => math.abs(c) > 800000L), s"vec $id cos $cosT")
      assert(resN.exists(r => r < 600000L && r > 0L), s"vec $id res $resN")
    }
  }

  test("all-but-the-top degrades zero vectors to NULL diagnostics") {
    val data = Seq(
      (0L, Array(1.0f, 0.5f), 0),
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(0.8f, 0.6f), 0)).toDF("vec_id", "embedding", "label")
    val rows = Similarity.embedAllButTop(data, iters = 3, dim = 2)
      .as[(Long, Option[Long], Option[Long], String)].collect()
      .sortBy(_._1)
    assert(rows(1)._2.isEmpty && rows(1)._3.isEmpty)
    assert(rows(1)._4 === "0,0")
    assert(rows(0)._2.isDefined && rows(2)._2.isDefined)
  }

  test("a dead dimension 0 no longer dead-ends the power iteration " +
       "(argmax-diagonal seed)") {
    // every vector's component 0 is exactly zero: a fixed e0 seed
    // produced w = G·e0 = 0 and a 0/0 in the max-norm rescale — the
    // seed must find a live axis instead
    val rnd = new scala.util.Random(11)
    val data = (0L until 60L).map { id =>
      val base = Array.fill(6)(rnd.nextGaussian().toFloat)
      base(0) = 0.0f
      base(2) += 1.5f
      (id, base, 0)
    }.toDF("vec_id", "embedding", "label")
    val top = Similarity.topComponent(data, iters = 6, dim = 6)
      .as[(Int, Long)].collect().toMap
    assert(top(0) === 0L, "the dead axis carries nothing")
    assert(math.abs(top(2)) === 10000L, "the planted axis dominates")
  }

  test("an all-zero embedding table raise_errors instead of 0/0") {
    val data = (0L until 5L).map(id => (id, Array(0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.topComponent(data, iters = 2, dim = 2).collect()
    }
    assert(e.getMessage.contains("gram diagonal is all zero") ||
      e.getCause != null)
  }

  test("topComponents2 recovers the second-heaviest planted axis, " +
       "orthogonal to the first") {
    val data = (
      (0L until 30L).map(i => (i, Array(1.0f, 0.0f, 0.0f, 0.0f), 0)) ++
      (30L until 40L).map(i => (i, Array(0.0f, 0.0f, 1.0f, 0.0f), 0))
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.topComponents2(data, iters = 6, dim = 4)
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(out((1L, 0))) === 10000L, "v1 = heavier axis e0")
    assert(math.abs(out((2L, 2))) === 10000L, "v2 = second axis e2")
    assert(math.abs(out((2L, 0))) < 100L, "v2 carries no e0")
  }

  test("topComponents2 on real data: v2 is orthogonal to v1 within " +
       "per-component rounding") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.topComponents2(emb)
      .as[(Long, Int, Long)].collect()
    val v1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val v2 = out.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(v1.length === 64 && v2.length === 64)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    // the Gram-Schmidt step is exact; only the final 10^4 rescale
    // rounds, so |<v1,v2>| <= 0.5 * sum|v1_j| <= 0.5 * 64 * 10^4
    assert(math.abs(dot) <= 400000L, s"v2 not orthogonal: dot=$dot")
  }

  test("a rank-1 corpus raise_errors instead of fabricating a v2") {
    val data = (0L until 20L).map(i =>
      (i, Array(0.6f, 0.8f), 0)).toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.topComponents2(data, iters = 3, dim = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("rank-1")), s"got: ${msgs(e)}")
  }

  test("embedAllButTop2 residuals are orthogonal to BOTH directions " +
       "and unit-normalized") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dirs = Similarity.topComponents2(emb)
      .as[(Long, Int, Long)].collect()
    val v1 = dirs.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val v2 = dirs.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    val rows = Similarity.embedAllButTop2(emb)
      .as[(Long, Option[Long], Option[Long], String)].collect()
    assert(rows.length === 500)
    rows.filter(_._2.isDefined).take(50).foreach {
      case (id, _, _, csv) =>
        val e = csv.split(",").map(_.toLong)
        val d1 = e.zip(v1).map { case (a, b) => a * b }.sum
        val d2 = e.zip(v2).map { case (a, b) => a * b }.sum
        // micro components round twice (two sequential projections):
        // allow 2x the single-projection rounding envelope
        assert(math.abs(d1) <= 2L * (32L * 10000L + 10000L),
          s"vec $id not orthogonal to v1: $d1")
        assert(math.abs(d2) <= 2L * (32L * 10000L + 10000L),
          s"vec $id not orthogonal to v2: $d2")
        val n = math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
        assert(math.abs(n - 1e6) < 100.0, s"vec $id norm $n")
    }
  }

  test("abt recall eval emits one bounded row per query on real data") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = Similarity.embedAllButTopRecall(emb, numQueries = 8, k = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq === (0L until 8L).toSeq)
    r.foreach { case (q, hits, bp) =>
      assert(hits >= 0L && hits <= 5L, s"query $q hits $hits")
      assert(bp === (10000L * hits) / 5L,
        s"query $q recall_bp $bp inconsistent with hits $hits")
    }
  }
}
