package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Tf-idf WEIGHTED-cosine similarity pairs — the all-pairs
  * similarity-search shape of Bayardo et al. 2007 ("Scaling Up All
  * Pairs Similarity Search", WWW'07) next to the SET-overlap family in
  * Dedup (Jaccard/containment treat a repeated shingle as one; the
  * weighted form credits repetition through tf and discounts
  * boilerplate through idf — two docs sharing only template shingles
  * score LOW here even when their Jaccard is high).
  *
  * Exactness contract (the property the whole repo's dedup family
  * holds): scores are computed in integer fixed point end to end —
  *  - idf is rounded ONCE per term to integer milli-nats,
  *    i = round(ln(N/df)·1000); term weight u = tf·i is a BIGINT;
  *  - per-doc squared norm na2 = Σu² and pair dot = Σ u_a·u_b are
  *    BIGINT sums (magnitudes: tf ≤ doc length, i ≤ ln(N)·1000 ≈
  *    23000 even at N = 10^10, so u ≤ ~10^7 and the sums sit far
  *    inside int64);
  *  - the threshold test cos ≥ τ = tn/td is evaluated WITHOUT any
  *    division or sqrt: td²·dot² ≥ tn²·na2·nb2 in 128-bit integer
  *    arithmetic (decimal(38,0) here, HUGEINT in the oracle) — a
  *    BIT-EXACT keep decision on both engines. The reported cos_micro
  *    is display-only (exact BIGINTs through IEEE sqrt, identical on
  *    both engines).
  *
  * Scale shape:
  *  - tf and df are map-side-combined aggregates ((doc, term) and
  *    term keys — never a window over the term key);
  *  - the corpus-count scalar N is ONE broadcast row;
  *  - terms appearing in EVERY doc have idf exactly 0 and are dropped
  *    from the index — provably score-neutral (their weight is 0 on
  *    both sides of every pair), so this is pruning WITHOUT a recall
  *    caveat: the web-scale boilerplate that makes inverted-index
  *    self-joins quadratic is exactly the high-df mass idf suppresses;
  *  - candidate pairs come from the inverted-index self-join on the
  *    term key with partial products aggregated map-side — only docs
  *    sharing a term ever meet, the AllPairs fundamental;
  *  - `maxDf` optionally bounds every posting list (and with it the
  *    per-term join fan-out, ≤ maxDf²) by REDEFINING the term space:
  *    terms hotter than the cap leave the vectors entirely — weights,
  *    norms AND dots — exactly like a stop-word list, so capped runs
  *    report exact cosines in the capped space rather than
  *    approximations of the uncapped one. (Contrast ngramCandidates'
  *    cap, which prunes candidate generation only; here consistency
  *    of the SCORE demands the space itself shrink.)
  *
  * Reference semantics: lightbitbird/spark-streaming-kafka-example has
  * no similarity operator; this extends the dedup family the training-
  * data pipeline needs (SURVEY §2 row 161-family).
  */
object TfIdfSim {

  /** All doc pairs with tf-idf cosine ≥ tauNum/tauDen over word
    * k-shingle terms. Output: (doc_a < doc_b, dot, na2, nb2,
    * cos_micro) for qualifying pairs only. */
  def tfidfCosinePairs(docs: DataFrame, k: Int = 3,
                       tauNum: Int = 7, tauDen: Int = 10,
                       maxDf: Long = Long.MaxValue): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen,
      s"tau $tauNum/$tauDen must be in (0, 1]")
    val tf = Dedup.shingles(docs, k)
      .groupBy(col("doc_id"), col("s"))
      .agg(count(lit(1)).as("tf"))
    val dfBy = tf.groupBy("s").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val idf = dfBy
      .filter(col("df") <= maxDf)
      .crossJoin(broadcast(nDocs))
      .select(col("s"),
        round(log(col("n") / col("df")) * lit(1000.0d))
          .cast("long").as("i"))
      .filter(col("i") > 0) // df = N terms weigh exactly 0: exact prune
    val w = tf.join(idf, "s")
      .select(col("doc_id"), col("s"), (col("tf") * col("i")).as("u"))
    val norms = w.groupBy("doc_id").agg(sum(col("u") * col("u")).as("n2"))

    val a = w.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("u").as("ua"))
    val b = w.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("u").as("ub"))
    val dots = a.join(b, col("sa") === col("sb") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("ua") * col("ub")).as("dot"))

    val tn2 = tauNum.toLong * tauNum
    val td2 = tauDen.toLong * tauDen
    dots
      .join(norms.toDF("ia", "na2"), col("doc_a") === col("ia"))
      .join(norms.toDF("ib", "nb2"), col("doc_b") === col("ib"))
      // τ-test in 128-bit integer arithmetic: no division, no sqrt
      .filter(lit(td2) * col("dot").cast("decimal(38,0)") * col("dot")
        >= lit(tn2) * col("na2").cast("decimal(38,0)") * col("nb2"))
      .select(col("doc_a"), col("doc_b"), col("dot"), col("na2"), col("nb2"),
        round(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2")))
          * lit(1000000.0d)).cast("long").as("cos_micro"))
  }

  def tfidfCosinePairsQuery(spark: SparkSession, dir: String): DataFrame =
    tfidfCosinePairs(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  val oracles: Map[String, String] = Map(
    // same fixed-point pipeline replicated: milli-nat idf rounded once
    // per term, BIGINT weights/norms/dots, HUGEINT τ-test
    "tfidf_cosine_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        | SELECT doc_id, unnest(CASE WHEN len(t) >= 3
        |   THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE [] END) AS s
        | FROM toks),
        |tf AS (SELECT doc_id, s, CAST(count(*) AS BIGINT) AS tf
        |       FROM sh GROUP BY 1, 2),
        |dfv AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |idf AS (
        | SELECT s, CAST(round(ln(n / df) * 1000) AS BIGINT) AS i
        | FROM dfv CROSS JOIN nn),
        |w AS (
        | SELECT tf.doc_id, tf.s, tf.tf * idf.i AS u
        | FROM tf JOIN idf USING (s) WHERE idf.i > 0),
        |norms AS (SELECT doc_id, CAST(sum(u * u) AS BIGINT) AS n2
        |          FROM w GROUP BY 1),
        |dots AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(sum(a.u * b.u) AS BIGINT) AS dot
        | FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b, dot, na.n2 AS na2, nb.n2 AS nb2,
        | CAST(round(dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1000000) AS BIGINT)
        |   AS cos_micro
        |FROM dots
        |JOIN norms na ON dots.doc_a = na.doc_id
        |JOIN norms nb ON dots.doc_b = nb.doc_id
        |WHERE 100 * CAST(dot AS HUGEINT) * dot
        |  >= 49 * CAST(na.n2 AS HUGEINT) * nb.n2
        |ORDER BY doc_a, doc_b""".stripMargin)
}
