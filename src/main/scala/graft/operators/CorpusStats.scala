package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Corpus-level monitoring statistics: which SOURCES mirror each other
  * (set-level Jaccard between per-source shingle vocabularies) and
  * whether a slice's EMBEDDING distribution has drifted (pairwise
  * cosine between per-label centroid directions) — the slice-granular
  * complements to the per-doc dedup and per-token vocab_kl_drift
  * operators.
  *
  * Reference semantics: lightbitbird/spark-streaming-kafka-example has
  * no corpus-monitoring operators; these extend the curation family
  * (SURVEY §2 rows 89, 163) a training-data pipeline needs.
  */
object CorpusStats {

  /** Pairwise source-level Jaccard over distinct word k-shingle sets —
    * mirror/boilerplate-farm detection at SOURCE granularity ("are
    * src3 and src11 the same site crawled twice?"), where doc-level
    * dedup sees only scattered pairs.
    *
    * Exactness: |A∩B| from the distinct-(source, shingle) self-join,
    * |A|, |B| from per-source counts, jaccard_bp = 10000·inter div
    * union in BIGINTs — no floats anywhere.
    *
    * Scale shape: the per-source distinct sets come from ONE map-side-
    * combined groupBy (never a corpus-wide distinct over raw text);
    * the self-join fans out per shingle only to the sources that share
    * it (≤ |sources| copies, and |sources| is thousands at web scale,
    * not corpus-sized); the pair aggregate is map-side combined over
    * ≤ |sources|² keys. Pairs with ZERO shared shingles are absent by
    * construction (their Jaccard is 0; emitting them would make the
    * output |sources|²-dense for no signal). */
  def sourceJaccard(docs: DataFrame, k: Int = 3): DataFrame = {
    val srcSh = docs
      .select(col("source"), explode(wordShingles(tokens(col("text")), k)).as("s"))
      .groupBy("source", "s").agg(count(lit(1)).as("cnt")) // distinct, map-side
      .select("source", "s")
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("sz"))
    val a = srcSh.toDF("source_a", "sa")
    val b = srcSh.toDF("source_b", "sb")
    val inter = a.join(b, col("sa") === col("sb") && col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("source_a", "size_a"), "source_a")
      .join(sizes.toDF("source_b", "size_b"), "source_b")
      .select(col("source_a"), col("source_b"), col("inter"),
        col("size_a"), col("size_b"),
        expr("(10000 * inter) div (size_a + size_b - inter)")
          .as("jaccard_bp"))
  }

  def sourceJaccardQuery(spark: SparkSession, dir: String): DataFrame =
    sourceJaccard(Tables.documents(spark, dir))
      .orderBy(col("source_a"), col("source_b"))

  /** Pairwise cosine between per-label embedding CENTROID directions —
    * the embedding-space drift monitor next to vocab_kl_drift's token
    * view: a new crawl slice whose centroid swings away from the
    * corpus centroid (or two label slices whose centroids collapse
    * together) is the admit-gate signal.
    *
    * Determinism: distributed float sums are order-dependent, so each
    * component is rounded ONCE to integer micro-units in-row and the
    * centroid is an exact BIGINT component sum — bit-identical in any
    * aggregation order and replicable in SQL. Cosine needs only the
    * centroid DIRECTION, so the un-normalized sum vector serves as the
    * centroid (the 1/n scale cancels); dot and norms are exact
    * decimal(38,0) products (component sums reach n·10^6·|x|, so
    * int64 would overflow near ~10^9 rows — HUGEINT/decimal(38,0)
    * holds to ~10^19 per component). cos_micro is the one display
    * float (exact integers through IEEE sqrt, identical cross-engine).
    *
    * Scale shape: ONE map-side-combined (label, dim) aggregate over
    * the exploded corpus (output |labels|·dim rows — model-sized);
    * everything downstream operates on the model-sized centroid frame.
    */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val q = emb.select(col("label"),
        posexplode(toDoubleArray(col("embedding"))).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        round(col("x") * lit(1000000.0d)).cast("long").as("xm"))
    val cent = q.groupBy("label", "dim").agg(sum("xm").as("c"))
    val sizes = emb.groupBy("label").agg(count(lit(1)).as("n"))
    val norms = cent.groupBy("label")
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("n2"))
    val a = cent.toDF("label_a", "dim", "ca")
    val b = cent.toDF("label_b", "dimb", "cb")
    val dots = a.join(b, col("dim") === col("dimb") && col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("dot"))
    dots
      .join(norms.toDF("label_a", "na2"), "label_a")
      .join(norms.toDF("label_b", "nb2"), "label_b")
      .join(sizes.toDF("label_a", "n_a"), "label_a")
      .join(sizes.toDF("label_b", "n_b"), "label_b")
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("dot").cast("double")
            / (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))
            * lit(1000000.0d)).cast("long").as("cos_micro"))
  }

  def centroidDriftQuery(spark: SparkSession, dir: String): DataFrame =
    centroidDrift(Tables.embeddings(spark, dir))
      .orderBy(col("label_a"), col("label_b"))

  val oracles: Map[String, String] = Map(
    "source_jaccard" ->
      """WITH toks AS (
        | SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        | SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 3
        |   THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE [] END) AS s
        | FROM toks),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
        |          FROM sh GROUP BY 1),
        |inter AS (
        | SELECT a.source AS source_a, b.source AS source_b,
        |        CAST(count(*) AS BIGINT) AS inter
        | FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        | GROUP BY 1, 2)
        |SELECT i.source_a, i.source_b, i.inter,
        |  sa.sz AS size_a, sb.sz AS size_b,
        |  10000 * i.inter // (sa.sz + sb.sz - i.inter) AS jaccard_bp
        |FROM inter i
        | JOIN sizes sa ON i.source_a = sa.source
        | JOIN sizes sb ON i.source_b = sb.source
        |ORDER BY source_a, source_b""".stripMargin,

    // the same once-rounded micro components, HUGEINT sums/products,
    // and the display-only IEEE sqrt tail
    "embed_centroid_drift" ->
      """WITH q AS (
        | SELECT label, unnest(range(1, len(embedding) + 1)) AS i,
        |        embedding::DOUBLE[] AS e
        | FROM embeddings),
        |qm AS (
        | SELECT label, i - 1 AS dim,
        |        CAST(round(e[i] * 1000000.0) AS BIGINT) AS xm
        | FROM q),
        |cent AS (
        | SELECT label, dim, CAST(sum(xm) AS HUGEINT) AS c
        | FROM qm GROUP BY 1, 2),
        |sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |          FROM embeddings GROUP BY 1),
        |norms AS (SELECT label, sum(c * c) AS n2 FROM cent GROUP BY 1),
        |dots AS (
        | SELECT a.label AS label_a, b.label AS label_b, sum(a.c * b.c) AS dot
        | FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        | GROUP BY 1, 2)
        |SELECT d.label_a, d.label_b, sa.n AS n_a, sb.n AS n_b,
        |  CAST(round(CAST(d.dot AS DOUBLE)
        |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) AS cos_micro
        |FROM dots d
        | JOIN norms na ON d.label_a = na.label
        | JOIN norms nb ON d.label_b = nb.label
        | JOIN sizes sa ON d.label_a = sa.label
        | JOIN sizes sb ON d.label_b = sb.label
        |ORDER BY label_a, label_b""".stripMargin)
}
