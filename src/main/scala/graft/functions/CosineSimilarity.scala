package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * Why an Expression and not a UDF or higher-order-function composition:
  * `doGenCode` emits a primitive loop directly into whole-stage codegen
  * — no per-pair array allocation (zip_with materializes the product
  * array), no lambda-function interpretation, no serialization wall a
  * Scala UDF would add. The evaluation order (ascending index, dot and
  * norms accumulated left-to-right, norms multiplied before dividing)
  * is EXACTLY TextFunctions.dot/l2norm's fold order, so results remain
  * bit-identical to both the declarative form and the DuckDB oracle.
  *
  * Nulls: null array → null result (BinaryExpression's default
  * null-intolerant contract); a NULL ELEMENT on either side also
  * nulls the result — ArrayData.getDouble on a null slot is undefined
  * (NPE interpreted, garbage under codegen), so the explicit check
  * keeps both evaluation paths identical. The embeddings schema has
  * non-null elements, so this path never triggers on real data.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // Ragged-length inputs null the result even when both children are
  // non-nullable, so the default left.nullable || right.nullable would
  // under-report. Worse, with nullable=false nullSafeCodeGen replaces
  // ev.isNull with the literal "false" and the emitted "false = true;"
  // is a Java compile error — codegen falls back to the interpreted
  // path, which then breaks the schema's nullability promise downstream.
  override def nullable: Boolean = true

  // Mismatched lengths yield NULL — same observable behavior as the
  // declarative zip_with+fold (whose null-padded products null the
  // sum), never a silently-truncated prefix cosine.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var j = 0
    while (j < n) {
      if (x.isNullAt(j) || y.isNullAt(j)) return null
      j += 1
    }
    var dot = 0.0d; var nx = 0.0d; var ny = 0.0d
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val j = ctx.freshName("j")
      s"""
         |final int $n = $a.numElements();
         |boolean ${dot}_bad = ($n != $b.numElements());
         |for (int $j = 0; !${dot}_bad && $j < $n; $j++) {
         |  ${dot}_bad = $a.isNullAt($j) || $b.isNullAt($j);
         |}
         |if (${dot}_bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column API: cosine_similarity(a, b) over array<double> columns. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
