package graft.operators

import graft.SparkSpec

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source")

  test("corpusPrep: filter, dedup, sample, pack compose in that order") {
    val t1 = "the cat sat on the mat and ran far"            // 9 tokens
    val t4 = "completely different quality text with many fine words here" // 9
    val out = CorpusPrep.corpusPrep(docs(
        (1L, t1, "en", "s1"),
        (2L, t1, "en", "s1"),      // exact dup of 1 → cluster-deduped
        (3L, "a b c", "en", "s1"), // < 5 words → quality-dropped
        (4L, t4, "en", "s1")),
      k = 3, tau = 0.7, rates = Seq("en" -> 1.0), budget = 6)
      .select("doc_id", "ws_tokens", "start_off", "pack_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    // survivors 1 and 4 form one (en, s1) stream: offsets 0 and 9 —
    // packing sees ONLY survivors (doc 2's and 3's tokens must not
    // shift doc 4's offset)
    assert(out === Set((1L, 9L, 0L, 0L), (4L, 9L, 9L, 1L)))
  }

  test("corpusPrep: unsampled strata vanish entirely") {
    val out = CorpusPrep.corpusPrep(docs(
        (1L, "the cat sat on the mat and ran far", "en", "s1"),
        (2L, "der hund und die katze laufen gern schnell heute", "de", "s1")),
      k = 3, tau = 0.7, rates = Seq("de" -> 1.0), budget = 512)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(2L))
  }
}
