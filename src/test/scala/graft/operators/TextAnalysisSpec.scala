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
}
