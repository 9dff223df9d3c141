package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: symmetric per-vector int8 quantization,
  * emitted as exact small-integer DOUBLES so the result feeds straight
  * into `CosineSimilarity` (which requires array<double>) with no cast.
  *
  * q_i = sign(x_i) · floor(|x_i| · 127 / max_j|x_j| + 0.5)
  *
  * — the same formula as `Similarity.quantizeInt8`'s storage pass
  * (explicit IEEE floor rounding both engines evaluate identically;
  * Int8QuantizeSpec pins elementwise parity with that declarative
  * transform). All-zero vectors quantize to all zeros.
  *
  * Why an Expression: the quantize-then-score ANN serving path applies
  * this to EVERY corpus vector inside the scan stage — the one place
  * an interpreted `transform` lambda costs 10-30x (the same argument
  * as HyperplaneBucket/CosineSimilarity; the ANN lambda-free plan rule
  * is spec-pinned). The storage-pass operator keeps its declarative
  * transform because it runs once per corpus version, not per query.
  *
  * Values are in [-127, 127]: dot products of quantized 64-dim vectors
  * stay ≤ 64·127² ≈ 1.03e6 — exactly representable in double, so the
  * downstream cosine is EXACT integer arithmetic finished by two
  * correctly-rounded IEEE sqrts and one division: bit-replicable by
  * the DuckDB oracle with no summation-order concerns.
  *
  * Nulls: null array → null; empty array or null element → null (same
  * rationale as MinHashSig — unreachable on the fixed-dim non-null
  * embeddings schema; keeps eval/codegen identical).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_quantize"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = Int8Quantize.compute(input.asInstanceOf[ArrayData])
    if (q == null) null else new GenericArrayData(q)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val q = ctx.freshName("q")
      s"""
         |double[] $q = graft.functions.Int8Quantize.compute($a);
         |if ($q == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($q);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {

  /** Column API: int8_quantize(e) → array<double> of quantized values. */
  def apply(e: Column): Column =
    GraftBridge.column(Int8Quantize(GraftBridge.expression(e)))

  /** Shared by the interpreted and codegen paths. Returns null for an
    * empty array or a null element. */
  def compute(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    if (n == 0) return null
    var maxAbs = 0.0d
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return null
      val v = math.abs(a.getDouble(j))
      if (v > maxAbs) maxAbs = v
      j += 1
    }
    val q = new Array[Double](n)
    if (maxAbs == 0.0d) return q // all-zero vector → all zeros
    j = 0
    while (j < n) {
      val x = a.getDouble(j)
      q(j) = math.signum(x) * math.floor(math.abs(x) * 127.0d / maxAbs + 0.5d)
      j += 1
    }
    q
  }
}
