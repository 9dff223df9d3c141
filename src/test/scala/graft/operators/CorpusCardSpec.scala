package graft.operators

import graft.SparkSpec

class CorpusCardSpec extends SparkSpec {
  import spark.implicits._

  test("corpusCard: hand-computed card on a crafted corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "s1"),
      (2L, "the cat sat on the mat", "en", "s2"), // exact dup text
      (3L, "uno dos tres quatro cinco seis", "es", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val card = CorpusStats.corpusCard(docs)
      .as[(String, Long)].collect().toMap
    assert(card("n_docs") === 3L)
    assert(card("n_distinct_texts") === 2L)
    assert(card("exact_dup_docs") === 1L)
    assert(card("n_sources") === 2L)
    assert(card("n_langs") === 2L)
    assert(card("n_tokens") === 6L + 6L + 6L)
    assert(card("n_token_types") === 5L + 6L) // 'the' repeats within doc 1
    assert(card("mean_doc_tokens_milli") === 6000L)
    assert(card("quality_keep_bp") === 10000L)
  }

  test("corpusCard: quality gate failures lower quality_keep_bp") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "s1"),
      (2L, "1 2 3 4 5 6", "en", "s1")) // alpha ratio 0: fails keep
      .toDF("doc_id", "text", "lang", "source")
    val card = CorpusStats.corpusCard(docs)
      .as[(String, Long)].collect().toMap
    assert(card("quality_keep_bp") === 5000L)
  }

  test("corpusCard drift panel: the card's verdict rows equal the " +
       "standalone gates' own aggregates (one query == six gates)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    val isNew = col("source").isin("src0", "src1")
    val card = CorpusStats.corpusCard(docs, emb, isNew)
      .as[(String, Long)].collect().toMap
    // base rows still present and the panel appends, never replaces
    assert(card.size === 17)
    assert(card.contains("n_docs") && card.contains("quality_keep_bp"))
    val ksLen = CorpusStats.ksDrift(docs)
      .agg(max("ks_micro")).as[Long].head()
    val psiLen = CorpusStats.psiDrift(docs)
      .agg(max("psi_micro")).as[Long].head()
    val ksNorm = CorpusStats.ksNormDrift(emb)
      .agg(max("ks_micro")).as[Long].head()
    val psiNorm = CorpusStats.psiNormDrift(emb)
      .agg(max("psi_micro")).as[Long].head()
    val (klSum, klDrivers) = QualityModels.vocabKlDrift(docs, isNew)
      .agg(sum("kl_contrib_micro"),
        sum(when(col("driver"), 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    val centMin = CorpusStats.centroidDrift(emb)
      .agg(min("cos_micro")).as[Long].head()
    assert(card("drift_ks_len_max_micro") === ksLen)
    assert(card("drift_psi_len_max_micro") === psiLen)
    assert(card("drift_ks_norm_max_micro") === ksNorm)
    assert(card("drift_psi_norm_max_micro") === psiNorm)
    assert(card("drift_vocab_kl_sum_micro") === klSum)
    assert(card("drift_vocab_kl_driver_types") === klDrivers)
    assert(card("drift_centroid_min_cos_micro") === centMin)
  }

  test("multimodalPhashPairs finds the exhaustive Hamming<=3 set end to end") {
    import org.apache.spark.sql.functions._
    // end-to-end banding output == exhaustive popcount over the hashes
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val hashes = Multimodal.imageDHash(Multimodal.withPngPayloads(docs)).toDF()
      .select("doc_id", "dhash").as[(Long, Long)].collect()
    val exhaustive = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val banded = Multimodal.multimodalPhashPairsQuery(spark, "/root/testdata/sf0.001")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded === exhaustive)
  }
}
