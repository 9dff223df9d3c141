package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-function building blocks for the text / dedup / similarity
  * operators. Everything here is built from `org.apache.spark.sql.
  * functions._` (codegen'd or JVM-native Catalyst expressions) — no
  * Scala UDFs — and every hash is md5-derived so a SQL oracle (DuckDB)
  * can replicate it bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokenization (the synthetic corpus is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles: ["a b c","b c d",...] from the token array.
    * Guarded for texts shorter than k tokens (Spark's sequence(0, n)
    * with n<0 would count DOWNWARD, not produce an empty array). */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array())

  /** 60-bit non-negative hash: first 15 hex chars of md5, base-16 → long.
    * Oracle equivalent: CAST('0x' || substr(md5(s),1,15) AS BIGINT). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 28-bit hash (fits products with positional weights in a long).
    * Oracle: CAST('0x' || substr(md5(s),1,7) AS BIGINT). */
  def hash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Sequential-fold dot product of two double arrays. Left-to-right
    * summation order matches DuckDB's list_sum/list_reduce bit-for-bit
    * (verified empirically on the embeddings table). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm via the same sequential fold. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** float[] parquet column → double[] (exact: every float32 is
    * representable as float64, and double products of floats are exact
    * to 48 bits < 53). A native array cast, NOT `transform(_, cast)`:
    * the element-wise lambda form drags an interpreted lambdafunction
    * into every ANN plan's scan stage, while Cast stays codegen'd. */
  def toDoubleArray(a: Column): Column = a.cast("array<double>")
}
