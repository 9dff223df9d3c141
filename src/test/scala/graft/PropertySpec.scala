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
    val vocab = Seq("a", "b", "c", "d", "e")
    for (_ <- 1 to 4) {
      val texts = List.fill(6)(List.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val lsh = Dedup.minhashLshPairs(docs, tau = 0.5, persistSignatures = false)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val exact = Dedup.ngramJaccardPairs(docs, k = 3, tau = 0.5, persistPostings = false)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // LSH candidates are verified exactly, so false positives are
      // impossible; at tau=0.5 a 16x4 banding misses a qualifying pair
      // with probability < 1e-3 — with fixed seeds any miss here is a
      // real regression, not flakiness.
      assert(lsh === exact, s"texts: $texts")
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
