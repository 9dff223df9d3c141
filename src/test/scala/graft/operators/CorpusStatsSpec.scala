package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("sourceJaccard: hand-computed overlap at k=1") {
    // A = {x,y,z}, B = {y,z,w}, C = {q} — AB inter 2, union 4
    val d = Seq(
      (1L, "x y z", "A"), (2L, "y z w", "B"), (3L, "q", "C"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceJaccard(d, k = 1)
      .select("source_a", "source_b", "inter", "size_a", "size_b", "jaccard_bp")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("A", "B", 2L, 3L, 3L, 10000L * 2 / 4)))
  }

  test("sourceJaccard: duplicate shingles within a source count once") {
    val d = Seq(
      (1L, "x x x y", "A"), (2L, "x y y y", "B"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceJaccard(d, k = 1)
      .select("inter", "size_a", "size_b", "jaccard_bp")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 2L, 2L, 10000L))) // identical SETS {x,y}
  }

  test("sourceJaccard: disjoint sources emit no pair row") {
    val d = Seq((1L, "x y", "A"), (2L, "p q", "B"))
      .toDF("doc_id", "text", "source")
    assert(CorpusStats.sourceJaccard(d, k = 1).count() === 0)
  }

  test("centroidDrift: identical slices score cos 1e6, opposite -1e6") {
    val d = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(2.0f, 0.0f), 1),                      // same direction
      (4L, Array(-1.0f, 0.0f), 2))                     // opposite
      .toDF("vec_id", "embedding", "label")
    val out = CorpusStats.centroidDrift(d)
      .select("label_a", "label_b", "n_a", "n_b", "cos_micro")
      .as[(Int, Int, Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq(
      (0, 1, 2L, 1L, 1000000L),
      (0, 2, 2L, 1L, -1000000L),
      (1, 2, 1L, 1L, -1000000L)))
  }

  test("centroidDrift: orthogonal slice centroids score 0") {
    val d = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = CorpusStats.centroidDrift(d)
      .select("cos_micro").as[Long].collect().toSeq
    assert(out === Seq(0L))
  }

  test("centroidDrift: centroid is the component-wise sum direction") {
    // label 0: (1,0) and (0,1) -> centroid (1,1); label 1: (1,1)
    // cos((1,1),(1,1)) = 1
    val d = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = CorpusStats.centroidDrift(d)
      .select("cos_micro").as[Long].collect().toSeq
    assert(out === Seq(1000000L))
  }
}
