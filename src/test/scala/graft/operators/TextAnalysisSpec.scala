package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang")

  test("dedupExact: identical texts collapse to min doc_id") {
    val out = TextAnalysis.dedupExact(
      docs((1L, "same text", "en"), (2L, "same text", "en"), (3L, "other", "en")))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("langId: stopword scores pick the language, priority breaks ties, 'und' when silent") {
    val out = TextAnalysis.langId(docs(
      (1L, "the cat and the dog", "en"),
      (2L, "der hund und die katze", "de"),
      (3L, "xylophone zebra quartz", "zh")))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("curationSummary: filters short docs, drops dups, groups by predicted lang") {
    val out = TextAnalysis.curationSummary(docs(
      (1L, "the cat sat of the mat and ran", "en"),
      (2L, "the cat sat of the mat and ran", "en"), // exact dup of 1 — dropped
      (3L, "x y", "en"),                            // too short — filtered
      (4L, "der die das und ist ein wort extra", "de")))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(out === Set(("en", 1L, 8L, 8.0), ("de", 1L, 8L, 8.0)))
  }

  test("textQuality: keep flag rejects too-short docs") {
    val out = TextAnalysis.textQuality(docs(
      (1L, "a b", "en"),
      (2L, "one two three four five six seven", "en")))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true))
  }

  test("docFingerprint: order-sensitive — swapped words change the polynomial") {
    val fps = TextAnalysis.docFingerprint(docs(
      (1L, "alpha beta gamma", "en"),
      (2L, "beta alpha gamma", "en")))
      .select("doc_id", "poly_fp").as[(Long, Long)].collect().toMap
    assert(fps(1L) !== fps(2L))
  }

  private def sourcedDocs(rows: (Long, String, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source")

  test("packTokenBudget: pack_id = exclusive-prefix-sum div budget, per (lang, source) stream") {
    // tokens: 3, 4, 5 in one (en, s1) stream; offsets 0, 3, 7; budget 5
    // → packs 0, 0, 1. The (de, s1) doc starts its own stream at pack 0.
    val out = TextAnalysis.packTokenBudget(sourcedDocs(
        (1L, "a b c", "en", "s1"),
        (2L, "d e f g", "en", "s1"),
        (3L, "h i j k l", "en", "s1"),
        (4L, "x y z w", "de", "s1")), budget = 5)
      .select("doc_id", "start_off", "pack_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 1L), (4L, 0L, 0L)))
  }

  test("packTokenBudget: a doc longer than the budget still gets exactly one pack") {
    val out = TextAnalysis.packTokenBudget(sourcedDocs(
        (1L, "a b c d e f g h i j k l", "en", "s1"), // 12 tokens, budget 4
        (2L, "m n", "en", "s1")), budget = 4)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 3L)) // doc 2 starts at offset 12
    intercept[IllegalArgumentException] {
      TextAnalysis.packTokenBudget(sourcedDocs((1L, "a", "en", "s1")), budget = 0)
    }
  }

  test("stratifiedSample: deterministic across runs, rate 0 for unlisted strata, monotone in rate") {
    val d = sourcedDocs((0L until 100L).map(i =>
      (i, "text", if (i % 2 == 0) "en" else "fr", "s")): _*)
    val half = TextAnalysis.stratifiedSample(d, Seq("en" -> 0.5))
      .as[(Long, String, Long)].collect().toSet
    assert(half === TextAnalysis.stratifiedSample(d, Seq("en" -> 0.5))
      .as[(Long, String, Long)].collect().toSet)
    assert(half.forall(_._2 == "en")) // fr unlisted → rate 0
    assert(half.nonEmpty)
    val all = TextAnalysis.stratifiedSample(d, Seq("en" -> 1.0))
      .as[(Long, String, Long)].collect().toSet
    assert(all.size === 50) // rate 1.0 keeps every en doc
    assert(half.subsetOf(all)) // raising the rate only ADDS docs
  }
}
