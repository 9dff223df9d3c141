package graft

import org.apache.spark.sql.SparkSession

/** The extension must make cosine_similarity resolvable from plain SQL
  * in a session built with withExtensions. */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_similarity is callable from SQL in an extended session") {
    // force-create a NEW session (over the shared SparkContext) so the
    // extension actually applies, then restore the shared session for
    // the other suites
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = extended.sql(
        """SELECT cosine_similarity(array(3.0D, 0.0D), array(7.0D, 0.0D)) AS c,
          |       cosine_similarity(array(1.0D, 0.0D), array(0.0D, 5.0D)) AS o
          |""".stripMargin).collect().head
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) === 0.0)
      // hyperplane_bucket with a literal plane matrix: plane 0 = +x
      // (dot>0 → bit 0), plane 1 = -x (dot<0 → bit clear) → bucket 1
      val b = extended.sql(
        """SELECT hyperplane_bucket(array(2.0D, 1.0D),
          |         array(array(1.0D, 0.0D), array(-1.0D, 0.0D))) AS b
          |""".stripMargin).collect().head
      assert(b.getInt(0) === 1)
      // a non-foldable matrix must be rejected eagerly
      val err = intercept[Exception] {
        extended.sql(
          """SELECT hyperplane_bucket(e, array(e)) FROM
            | (SELECT array(1.0D) AS e)""".stripMargin).collect()
      }
      assert(err.getMessage.contains("foldable"))
      // minhash_sig: width must be a foldable int; signature arity = width
      val m = extended.sql(
        "SELECT minhash_sig(array('a', 'b'), 8) AS sig").collect().head
      assert(m.getSeq[Long](0).size === 8)
      val merr = intercept[Exception] {
        extended.sql(
          "SELECT minhash_sig(s, CAST(n AS INT)) FROM (SELECT array('a') s, 4 n)"
        ).collect()
      }
      assert(merr.getMessage.contains("foldable"))
      // simhash60: in [0, 2^60)
      val sh = extended.sql(
        "SELECT simhash60(array('a', 'b', 'c')) AS fp").collect().head
      assert(sh.getLong(0) >= 0L && sh.getLong(0) < (1L << 60))
      // int8_quantize: max-magnitude component maps to ±127
      val iq = extended.sql(
        "SELECT int8_quantize(array(0.5D, -1.0D)) AS q").collect().head
      assert(iq.getSeq[Double](0) === Seq(64.0, -127.0))
      // cms_union_agg + count_min_probe round trip: sketch per group,
      // union, probe — 'a' appears 3 times, est >= true (one-sided)
      val cm = extended.sql(
        """WITH raw AS (SELECT * FROM VALUES (0, 'a'), (0, 'a'), (1, 'a'),
          |                                  (1, 'b') AS t(day, tok)),
          |     per AS (SELECT count_min_sketch(tok, 0.01D, 0.99D, 42) cms
          |             FROM raw GROUP BY day)
          |SELECT count_min_probe('a', (SELECT cms_union_agg(cms) FROM per)) AS a
          |""".stripMargin).collect().head
      assert(cm.getLong(0) >= 3L)
      // a per-row (non-foldable) sketch operand must be rejected eagerly
      val cerr = intercept[Exception] {
        extended.sql(
          "SELECT count_min_probe('a', s) FROM (SELECT CAST(NULL AS BINARY) s)"
        ).collect()
      }
      assert(cerr.getMessage.contains("foldable"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  // NOTE: the spark.sql.extensions CONFIG path reads the SparkContext's
  // conf, fixed at context creation — it cannot be exercised in this
  // shared-context test JVM (it works on a cluster because the context
  // is created with the config present). withExtensions above runs the
  // identical GraftExtensions code path.
}
