package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-8 specs: perceptual image hash over real PNG bytes and the
  * trained char-trigram language ID. */
class PhashLangIdSpec extends SparkSpec {
  import spark.implicits._

  test("imageDHash: identical pixel content hashes identically; pairs at Hamming 0") {
    // same text => same md5 dims AND same doc-dependent fill only if
    // doc_id matches; craft equality by using the SAME doc_id twice
    val docs = Seq((7L, "alpha beta gamma"), (7L, "alpha beta gamma"),
      (9L, "totally different words here"))
      .toDF("doc_id", "text")
    val hashes = Multimodal.imageDHash(Multimodal.withPngPayloads(docs)).toDF()
    val hs = hashes.select("doc_id", "dhash").as[(Long, Long)].collect()
    val of7 = hs.filter(_._1 == 7L).map(_._2).distinct
    assert(of7.length === 1, "same bytes must hash identically")
    assert(hashes.filter(col("width") > 0).count() === 3,
      "all three payloads decode")
  }

  test("phashPairs: near-identical images pair, distant ones do not") {
    // build two hash rows at Hamming 1 and one far away, bypass decode
    val rows = Seq(
      (1L, 20, 20, 0x0F0F0F0F0F0F0F0FL),
      (2L, 20, 20, 0x0F0F0F0F0F0F0F0EL), // Hamming 1
      (3L, 20, 20, 0x7030507090B0D0F0L))
      .toDF("doc_id", "width", "height", "dhash")
    val out = Multimodal.phashPairs(rows)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L)))
  }

  test("phashPairs: error rows (width -1) never enter the banding") {
    val rows = Seq((1L, -1, -1, -1L), (2L, -1, -1, -1L))
      .toDF("doc_id", "width", "height", "dhash")
    assert(Multimodal.phashPairs(rows).count() === 0)
  }

  test("langIdNgram: separable corpora classify correctly") {
    // unambiguous char distributions per 'language'
    val docs = Seq(
      (1L, "aaa aab aba abb aaa aab", "en"),
      (2L, "aab aaa abb aba aab aaa", "en"),
      (3L, "zzz zzy zyz zyy zzz zzy", "de"),
      (4L, "zzy zzz zyy zyz zzy zzz", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdNgram(docs)
      .select("doc_id", "pred_lang", "correct")
      .as[(Long, String, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out.forall(_._3), s"all separable docs must classify: $out")
  }

  test("langIdNgram: ties break to the alphabetically first language") {
    // two languages with IDENTICAL training text: every doc scores
    // equal under both; 'de' < 'en' wins
    val docs = Seq(
      (1L, "mmm nnn ooo", "en"),
      (2L, "mmm nnn ooo", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdNgram(docs)
      .select("pred_lang").as[String].collect().toSet
    assert(out === Set("de"))
  }

  test("langIdNgram: measured accuracy on the real corpus is non-trivial") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.langIdNgram(docs)
    val n = out.count()
    val right = out.filter("correct").count()
    assert(n === docs.count())
    // a 5-class coin flips ~20%; the trained model must beat it well
    assert(right * 5 > n, s"accuracy ${right}/$n not better than chance")
  }
}
