package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: MinHash(numHashes) signature of a
  * shingle-set array, computed IN-ROW — the map-only signature path.
  *
  * sig(i) = min over shingles s of (h1(s) + i·h2(s)) mod 2^32, where
  * h1/h2 are the first/second 32-bit words of md5(s)
  * (Kirsch–Mitzenmacher double hashing — same derivation, bit for bit,
  * as the aggregate form it replaces: h1 = conv(substring(md5(s),1,8),
  * 16,10), h2 = the next 8 hex chars; see Dedup.minhashLshPairs).
  *
  * Why an Expression: the documents table has ONE row per doc, so the
  * signature is a per-row fold over the doc's (pre-deduped) shingle
  * array. The previous form exploded the sets and ran 64 min()
  * aggregates — map-side combined, but still ONE full-corpus exchange
  * of 64-column signature rows plus hex-string conv() decoding per
  * shingle. This expression keeps the whole signature inside the scan
  * stage: md5 bytes are consumed directly (no hex round-trip) and the
  * 64 mins update in a primitive loop, so LSH banding starts with ZERO
  * shuffles at any corpus size. An interpreted higher-order-function
  * fold was never an option (~12 µs/element of lambda interpretation,
  * see Dedup's scaladoc); a native expression is the third path that
  * scaladoc's dichotomy predates.
  *
  * Bit-parity contract (pinned by MinHashSigSpec against the inlined
  * aggregate form): md5 over the shingle's UTF-8 bytes; h1 = bytes
  * 0..3 and h2 = bytes 4..7 as unsigned 32-bit big-endian — exactly
  * the first/second 8 hex chars of the md5 hex string; derived hash
  * (h1 + i·h2) & 0xFFFFFFFF ≡ mod 2^32 (both operands non-negative);
  * min over the set, element order irrelevant (min commutes).
  *
  * Nulls: null array → null (UnaryExpression default); empty array or
  * a NULL ELEMENT → null — the upstream docShingleSets filters empty
  * sets and cannot produce null shingles, so neither fires on real
  * data; they exist so a malformed row can't silently contribute a
  * Long.MaxValue signature, and the element check keeps the
  * interpreted and codegen paths identical.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 512,
    s"numHashes must be in [1, 512], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // Empty-set / null-element rows null the result even for a
  // non-nullable child (same rationale as HyperplaneBucket.nullable).
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val mins = MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = graft.functions.MinHashSig.compute($a, $numHashes);
         |if ($mins == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Column API: minhash_sig(sset) → array<long> of numHashes minima. */
  def apply(sset: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(sset), numHashes))

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared by the interpreted and codegen paths (called from generated
    * Java — keep the signature Java-friendly). Returns null for an
    * empty array or a null element. */
  def compute(a: ArrayData, numHashes: Int): Array[Long] = {
    val n = a.numElements()
    if (n == 0) return null
    val md = digests.get()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return null
      val d = md.digest(a.getUTF8String(j).getBytes)
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var i = 0
      var v = h1
      while (i < numHashes) {
        // (h1 + i*h2) mod 2^32, accumulated additively: v_{i+1} = v_i + h2
        val m = v & 0xffffffffL
        if (m < mins(i)) mins(i) = m
        v += h2
        i += 1
      }
      j += 1
    }
    mins
  }
}
