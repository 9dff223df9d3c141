package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 60-bit SimHash fingerprint of a
  * shingle-set array, computed IN-ROW — the map-only fingerprint path.
  *
  * Per shingle s: hv(s) = the top 60 bits of md5(s)'s first 8 bytes —
  * exactly conv(substring(md5(s),1,15),16,10) (TextFunctions.hash60),
  * i.e. the first 15 hex chars = (unsigned big-endian bytes 0..7) >>> 4.
  * Per bit b: majority vote (+1 if set, −1 if clear) over the set;
  * fingerprint bit b = 1 iff the vote sum is > 0 (ties → 0, matching
  * the aggregate form's `when(c > 0, ...)`).
  *
  * Why an Expression: same argument as MinHashSig — one row per doc
  * means the fingerprint is a per-row fold; the previous form exploded
  * the shingle sets into 60 conditional-sum aggregates (map-side
  * combined, but still a full-corpus exchange of 60-column vote rows
  * plus a 15-hex-char conv() per shingle). This keeps the fingerprint
  * inside the scan stage — pigeonhole banding starts with ZERO
  * shuffles — and updates the 60 votes in a primitive loop on the md5
  * bytes directly.
  *
  * Bit-parity contract (pinned by SimHash60Spec against the inlined
  * aggregate form): identical hv derivation, vote rule, and tie
  * handling, so fingerprints are bit-identical and the 4×15 pigeonhole
  * recall guarantee (Hamming ≤ 3 forces one exact 15-bit piece match)
  * carries over unchanged.
  *
  * Nulls: null array → null; empty array or null element → null (same
  * rationale as MinHashSig — upstream filters make these unreachable
  * on real data; the checks keep eval/codegen identical and keep
  * malformed rows out of band 0).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val fp = SimHash60.compute(input.asInstanceOf[ArrayData])
    if (fp < 0) null else fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fp = ctx.freshName("fp")
      s"""
         |long $fp = graft.functions.SimHash60.compute($a);
         |if ($fp < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Column API: simhash60(sset) → 60-bit fingerprint (long). */
  def apply(sset: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(sset)))

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared by the interpreted and codegen paths. A 60-bit fingerprint
    * is always non-negative, so -1 is a safe null sentinel (keeps the
    * generated-Java call signature primitive). */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return -1L
    val md = digests.get()
    val votes = new Array[Int](60)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return -1L
      val d = md.digest(a.getUTF8String(j).getBytes)
      // top 60 bits of the unsigned big-endian first 8 bytes = the
      // first 15 hex chars of the md5 hex string (hash60's conv).
      var hv = 0L
      var k = 0
      while (k < 8) { hv = (hv << 8) | (d(k) & 0xffL); k += 1 }
      hv >>>= 4
      var b = 0
      while (b < 60) {
        if (((hv >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
