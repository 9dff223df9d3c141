package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-7 audit operators: LSH recall measurement, cluster size
  * distribution, FK integrity, out-of-order arrival stats. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ lsh_recall_eval

  test("lshRecallEval: full banding (64 bands of 1 row) finds every pair") {
    // identical docs: jac 1.0 — every banding must catch them
    val d = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val rows = Dedup.lshRecallEval(d, tau = 0.8, numHashes = 64,
      bandings = Seq(64, 1))
      .select("bands", "n_true", "n_found", "recall_bp")
      .as[(Int, Long, Long, Long)].collect()
    rows.foreach { case (bands, nTrue, nFound, bp) =>
      assert(nTrue === 1L)
      assert(nFound === 1L, s"banding $bands missed an IDENTICAL pair")
      assert(bp === 10000L)
    }
  }

  test("lshRecallEval: candidates shrink as bands coarsen (monotone knob)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.lshRecallEval(docs, bandings = Seq(16, 8, 4, 2))
      .select("bands", "n_cand", "n_found", "n_true")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    val cands = out.map(_._2)
    assert(cands.zip(cands.tail).forall { case (coarse, fine) => coarse <= fine },
      "fewer bands (more rows per band) must produce fewer candidates")
    out.foreach { case (_, _, found, truth) => assert(found <= truth) }
  }

  test("lshRecallEval: found pairs are a subset of truth (precision 1)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.lshRecallEval(docs, bandings = Seq(16))
      .select("n_found", "n_true").as[(Long, Long)].head()
    assert(out._1 <= out._2)
    assert(out._2 > 0, "sf0.001 has planted pairs at tau 0.8")
  }

  // ------------------------------------------------------- bloom_fpr_eval

  test("bloomFprEval: no false negatives, FPR monotone in bits per key") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val rows = Seq(1, 4, 16).map { bits =>
      Dedup.bloomFprEval(corpus, bench, k = 3, bitsPerKey = bits)
        .select("bits_per_key", "n_postings", "n_member", "n_passed",
          "false_pos", "fpr_bp")
        .as[(Int, Long, Long, Long, Long, Long)].head()
    }
    rows.foreach { case (_, nPost, nMem, nPassed, fp, _) =>
      assert(nPassed >= nMem, "Bloom must never drop a true member")
      assert(fp === nPassed - nMem || fp >= 0)
      assert(nPassed <= nPost)
    }
    val fprs = rows.map(_._6)
    assert(fprs.zip(fprs.tail).forall { case (loose, tight) => loose >= tight },
      s"more bits per key cannot raise the FPR: $fprs")
    assert(fprs.last <= 300L,
      s"16 bits/key should measure under ~3% FPR, got ${fprs.last} bp")
  }

  // --------------------------------------------------- cluster_size_stats

  test("clusterSizeStats: sizes partition the corpus") {
    // {1,2,3} chain into one cluster of 3 via transitivity; 4 alone
    val d = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"),
      (4L, "v w x y z")).toDF("doc_id", "text")
    val out = Dedup.clusterSizeStats(d)
      .select("cluster_size", "n_clusters", "n_docs")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 1L, 1L), (3L, 1L, 3L)))
  }

  test("clusterSizeStats: n_docs sums to the corpus size on real data") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.clusterSizeStats(docs)
    val total = out.agg(sum("n_docs")).as[Long].head()
    assert(total === docs.count())
  }

  // --------------------------------------------------------- fk_integrity

  test("auditEdge: orphans and nulls counted separately") {
    val child = Seq(
      (1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, Some(10L)))
      .toDF("id", "fk")
    val parent = Seq((10L, "x")).toDF("pk", "v")
    val out = IntegrityAudit.auditEdge("t", child, "fk", parent, "pk")
      .select("relation", "n_rows", "n_null", "n_orphans")
      .as[(String, Long, Long, Long)].head()
    assert(out === (("t", 4L, 1L, 1L)))
  }

  test("fkIntegrity: the synthetic star schema is referentially clean") {
    val out = IntegrityAudit.fkIntegrity(spark, "/root/testdata/sf0.001")
      .select("relation", "n_orphans", "n_null")
      .as[(String, Long, Long)].collect()
    assert(out.length === 7)
    assert(out.forall(r => r._2 === 0L && r._3 === 0L),
      s"unexpected integrity defects: ${out.mkString(", ")}")
  }

  // --------------------------------------------------- out_of_order_stats

  test("outOfOrderStats: hand-computed lateness on a crafted arrival order") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // arrival order (event_id): event-times 10, 30, 20, 40, 25
    // hwm before each: -, 10, 30, 30, 40 -> late: 0, 0, 10s, 0, 15s
    val ev = Seq(
      (1L, ts(10), 7L, "a", 0.0, ""), (2L, ts(30), 7L, "a", 0.0, ""),
      (3L, ts(20), 8L, "a", 0.0, ""), (4L, ts(40), 8L, "b", 0.0, ""),
      (5L, ts(25), 9L, "b", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Timeseries.outOfOrderStats(ev)
      .select("event_type", "n", "n_late", "late_permille",
        "max_late_us", "sum_late_us")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq(
      ("a", 3L, 1L, 333L, 10000000L, 10000000L),
      ("b", 2L, 1L, 500L, 15000000L, 15000000L)))
  }

  test("outOfOrderStats: two-phase == tiny-bucket two-phase (split invariance)") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val a = Timeseries.outOfOrderStats(ev, bucketSize = 1024L)
      .collect().map(_.toSeq).toSet
    val b = Timeseries.outOfOrderStats(ev, bucketSize = 7L)
      .collect().map(_.toSeq).toSet
    assert(a === b, "bucket size is pure partitioning")
    assert(a.nonEmpty)
  }
}
