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
}
