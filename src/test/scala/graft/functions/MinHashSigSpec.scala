package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The native in-row signature must be BIT-identical to the r5
  * aggregate form it replaced (explode → md5 hex → conv → 64 min()
  * aggregates) — that equivalence is what carries the banding recall
  * math (and the exhaustive-oracle-verified end-to-end recall) over
  * to the map-only path. The old form is kept here verbatim as the
  * executable specification. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  /** The OLD r5 aggregate signature: one row per doc_id, columns
    * m0..m{n-1}. */
  private def aggregateSig(docSets: DataFrame, numHashes: Int): DataFrame = {
    val hashed = docSets
      .select(col("doc_id"), explode(col("sset")).as("s"))
      .withColumn("m", md5(col("s")))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
    val sigCols = (0 until numHashes)
      .map(i => min((col("h1") + lit(i.toLong) * col("h2")) % lit(4294967296L)).as(s"m$i"))
    hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  test("native signature == aggregate signature on real documents (64 hashes)") {
    val docSets = Dedup.docShingleSets(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 3)
    val native = docSets.select(col("doc_id"),
      MinHashSig(col("sset"), 64).as("sig"))
    val old = aggregateSig(docSets, 64)
    val joined = native.join(old, "doc_id")
    val mismatch = (0 until 64).map(i =>
        element_at(col("sig"), i + 1) =!= col(s"m$i"))
      .reduce(_ || _)
    assert(joined.count() === docSets.count(), "row sets must match")
    assert(joined.filter(mismatch).count() === 0L)
  }

  test("non-default width (numHashes = 8) also matches") {
    val docSets = Dedup.docShingleSets(
      Seq((1L, "a b c d e f"), (2L, "c d e f g h i"), (3L, "a b c"))
        .toDF("doc_id", "text"), 3)
    val native = docSets.select(col("doc_id"), MinHashSig(col("sset"), 8).as("sig"))
    val old = aggregateSig(docSets, 8)
    val joined = native.join(old, "doc_id")
    val mismatch = (0 until 8).map(i =>
        element_at(col("sig"), i + 1) =!= col(s"m$i"))
      .reduce(_ || _)
    assert(joined.filter(mismatch).count() === 0L)
  }

  test("null array, empty array, and null ELEMENTS yield null") {
    val df = Seq(
      (0, Some(Seq[String]("a", "b"))),
      (1, None),
      (2, Some(Seq.empty[String])),
      (3, Some(Seq[String]("a", null))))
      .toDF("id", "sset")
    val out = df.orderBy("id")
      .select(MinHashSig(col("sset"), 4).as("sig")).collect()
      .map(r => !r.isNullAt(0))
    assert(out.toSeq === Seq(true, false, false, false))
  }

  test("signature schema is array<long> non-null elements; column nullable") {
    val df = Seq((1L, Seq("x y z"))).toDF("doc_id", "sset")
    val proj = df.select(MinHashSig(col("sset"), 16).as("sig"))
    val at = proj.schema("sig").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(at.elementType === org.apache.spark.sql.types.LongType)
    assert(!at.containsNull)
    assert(proj.schema("sig").nullable)
    assert(proj.head().getSeq[Long](0).size === 16)
  }

  test("width preconditions and input type are rejected eagerly") {
    intercept[IllegalArgumentException] { MinHashSig(col("sset"), 0) }
    intercept[IllegalArgumentException] { MinHashSig(col("sset"), 513) }
    val bad = Seq((1L, 2.0)).toDF("doc_id", "v")
    intercept[Exception] {
      bad.select(MinHashSig(col("v"), 4)).collect()
    }
  }
}
