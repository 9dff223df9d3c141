package graft.operators

import graft.SparkSpec

/** Unit-level checks for the dedup family on crafted frames (the
  * oracle gate covers the real tables; these pin edge-case semantics). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("shingleSet: shorter-than-k texts produce no shingles, k-length texts one") {
    val sh = Dedup.shingleSet(docs(1L -> "a b", 2L -> "a b c", 3L -> "a b c d"), k = 3)
      .as[(Long, String)].collect().toSet
    assert(sh === Set((2L, "a b c"), (3L, "a b c"), (3L, "b c d")))
  }

  test("shingleSet is a set: repeated shingles collapse") {
    val sh = Dedup.shingleSet(docs(1L -> "x y x y x y"), k = 2)
      .as[(Long, String)].collect().toSet
    assert(sh === Set((1L, "x y"), (1L, "y x")))
  }

  test("ngramJaccardPairs: identical docs score 1.0, disjoint docs absent") {
    val pairs = Dedup.ngramJaccardPairs(
      docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "p q r s t"),
      k = 3, tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs === Set((1L, 2L, 1.0)))
  }

  test("minhashLshPairs finds the same pairs as exact Jaccard here") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "completely different text with no overlap at all whatsoever now")
    val lsh = Dedup.minhashLshPairs(d, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(d, k = 3, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
    assert(lsh === Set((1L, 2L)))
  }

  test("simhashPairs: identical docs at Hamming 0; banding rejects maxHamming > 3") {
    val pairs = Dedup.simhashPairs(
      docs(1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "z y x w v u"),
      maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 0L)))
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs(1L -> "a b c"), maxHamming = 4)
    }
  }
}
