package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Winnowing document fingerprints (Schleimer, Wilkinson & Aiken 2003,
  * the MOSS algorithm) — ROBUST fingerprint selection: instead of
  * sampling hashes by value (`h mod p == 0` keeps nothing of some docs
  * and everything of others), winnowing slides a window of `w`
  * consecutive k-shingle hashes over each doc and selects the window's
  * MINIMUM (rightmost on ties), deduplicated across overlapping
  * windows. Two guarantees fall out, both spec-pinned:
  *
  *  - coverage: every window of w consecutive shingle positions
  *    contributes at least one selected fingerprint (expected density
  *    2/(w+1)), so no doc region goes unfingerprinted;
  *  - robustness: any shared token run of length >= w+k-1 between two
  *    docs produces at least one IDENTICAL selected (hash) on both
  *    sides — the property that makes fingerprint equi-joins a sound
  *    candidate generator for plagiarism/near-dup detection.
  *
  * Scale shape: selection is ENTIRELY map-only — tokens, shingles,
  * hashes, per-window argmin and the cross-window dedup are all in-row
  * array expressions, so the operator adds ZERO shuffles at any corpus
  * size; downstream consumers equi-join the (h)-keyed output exactly
  * like the dup-hash index family (Dedup.dupHashIndex). Per-doc work
  * is O(n·w) with w a small constant; output is ~2n/(w+1) rows per
  * doc.
  *
  * Docs shorter than w shingles degrade to a single whole-doc window
  * (the paper's boundary convention: one fingerprint still gets
  * selected as long as one shingle exists).
  *
  * Reference semantics: lightbitbird/spark-streaming-kafka-example has
  * no fingerprinting operator; this extends the dedup/fingerprint
  * family (SURVEY §2 rows 31, 140) the training-data pipeline needs.
  */
object Winnowing {

  /** Selected fingerprints (doc_id, pos, h): pos is the 0-based
    * shingle position of the selected hash, h its 60-bit md5 hash.
    * @param k shingle width in tokens
    * @param w winnowing window in shingles */
  def winnowingFingerprints(docs: DataFrame, k: Int = 3,
                            w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
    val hs = transform(wordShingles(tokens(col("text")), k),
      s => hash60(s))
    // window starts 0 .. max(n-w, 0): full windows, plus the single
    // truncated whole-doc window when n < w (slice truncates at the
    // array end, so the same expression serves both cases)
    val fps = transform(
      sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
      i => {
        val win = slice(col("hs"), i + 1, lit(w))
        val mn = array_min(win)
        // rightmost occurrence of the min inside the window:
        // reverse + first-occurrence, mapped back to a 0-based pos
        val pos = i.cast("long") +
          (size(win).cast("long") - array_position(reverse(win), mn))
        struct(pos.as("pos"), mn.as("h"))
      })
    docs
      .select(col("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) >= 1)
      .select(col("doc_id"),
        explode(array_distinct(fps)).as("fp"))
      .select(col("doc_id"), col("fp.pos").as("pos"), col("fp.h").as("h"))
  }

  def winnowingFingerprintQuery(spark: SparkSession, dir: String): DataFrame =
    winnowingFingerprints(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("pos"))

  /** Near-dup candidate pairs FROM the winnowed index (the MOSS
    * application): docs sharing >= minShared distinct selected
    * fingerprint hashes, with overlap_bp = 10000·shared div
    * min(|A|,|B|) as the containment-style score over fingerprint
    * SETS. The robustness guarantee makes this sound: any shared run
    * of >= w+k-1 tokens is represented in BOTH docs' fingerprint sets,
    * so long verbatim overlaps cannot be missed — while the index is
    * ~2/(w+1) the size of the full shingle index the ngram/containment
    * family joins (the winnowing trade: a deterministic index-size cut
    * for a coarser score).
    *
    * Scale shape: per-doc fingerprint SETS derive map-side from the
    * map-only selection; the self-join fans out per HASH only to the
    * docs selecting it; `maxDf` drops hotter-than-cap postings (the
    * boilerplate guard, same knob discipline as ngramCandidates — a
    * candidate-generation cut, documented recall caveat). The pair
    * aggregate is map-side combined. */
  def winnowPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                  minShared: Long = 2L,
                  maxDf: Long = Long.MaxValue): DataFrame = {
    val fpSet = winnowingFingerprints(docs, k, w)
      .select(col("doc_id"), col("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("cnt")) // distinct, map-side
      .select("doc_id", "h")
    val sizes = fpSet.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dfBy = fpSet.groupBy("h").agg(count(lit(1)).as("df"))
    val posting = fpSet.join(dfBy.filter(col("df") <= maxDf), "h")
    val a = posting.select(col("doc_id").as("doc_a"), col("h").as("ha"))
    val b = posting.select(col("doc_id").as("doc_b"), col("h").as("hb"))
    a.join(b, col("ha") === col("hb") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("n_a"), col("n_b"),
        expr("(10000 * shared) div least(n_a, n_b)").as("overlap_bp"))
  }

  def winnowPairsQuery(spark: SparkSession, dir: String): DataFrame =
    winnowPairs(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  val oracles: Map[String, String] = Map(
    // same pipeline over DuckDB lists: k=3 shingles, 60-bit md5 hash,
    // per-window rightmost min via list_reverse + list_position, and
    // DISTINCT as the cross-window dedup
    "winnowing_fingerprint" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |   THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE [] END AS s
        | FROM toks),
        |hs AS (
        | SELECT doc_id,
        |  list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS h
        | FROM sh WHERE len(s) >= 1),
        |win AS (
        | SELECT doc_id, h,
        |  unnest(range(1, greatest(len(h) - 4 + 1, 1) + 1)) AS i
        | FROM hs),
        |pick AS (
        | SELECT doc_id,
        |  CAST(i - 1 + len(h[i:i+3])
        |       - list_position(list_reverse(h[i:i+3]), list_min(h[i:i+3]))
        |   AS BIGINT) AS pos,
        |  list_min(h[i:i+3]) AS h
        | FROM win)
        |SELECT DISTINCT doc_id, pos, h FROM pick
        |ORDER BY doc_id, pos""".stripMargin,

    // the pair report over the same winnowed index: distinct per-doc
    // fingerprint hash sets, self-join, min-size containment score
    "winnow_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |   THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE [] END AS s
        | FROM toks),
        |hs AS (
        | SELECT doc_id,
        |  list_transform(s, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS h
        | FROM sh WHERE len(s) >= 1),
        |win AS (
        | SELECT doc_id, h,
        |  unnest(range(1, greatest(len(h) - 4 + 1, 1) + 1)) AS i
        | FROM hs),
        |fp AS (
        | SELECT DISTINCT doc_id, list_min(h[i:i+3]) AS h FROM win),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
        |          FROM fp GROUP BY 1),
        |pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(count(*) AS BIGINT) AS shared
        | FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
        | GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.doc_a, p.doc_b, p.shared, sa.sz AS n_a, sb.sz AS n_b,
        |  (10000 * p.shared) // least(sa.sz, sb.sz) AS overlap_bp
        |FROM pairs p
        | JOIN sizes sa ON p.doc_a = sa.doc_id
        | JOIN sizes sb ON p.doc_b = sb.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin)
}
