package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: random-hyperplane LSH bucket id of a
  * double vector against a FIXED plane matrix.
  *
  * bucket = Σ_p [ (Σ_i e(i)·plane(p)(i)) > 0 ] · 2^p
  *
  * Why an Expression: the declarative form is numPlanes interpreted
  * `aggregate(transform(e, x·plane_i))` folds — at ~12 µs/element of
  * lambda interpretation that is numPlanes × dim (384 for 6×64)
  * interpreted ops on the ONE stage that must touch every corpus
  * vector. `doGenCode` emits a primitive double loop with the plane
  * matrix as a constant reference object, so bucket assignment stays
  * inside whole-stage codegen like every other hot column op.
  *
  * Bit-parity contract (pinned by HyperplaneBucketSpec): per-plane dot
  * is accumulated in ASCENDING index order, `> 0` decides the bit, and
  * bits are OR'd — exactly the old fold's left-to-right `acc + x`
  * summation and `when(dot > 0, 1<<p)` sum, and exactly the DuckDB
  * oracle's `list_sum` + `CASE WHEN d > 0 THEN (1 << pi)`.
  *
  * Nulls: null array → null (UnaryExpression's null-intolerant
  * default); a vector whose length differs from the plane dimension,
  * or containing a NULL ELEMENT, → null (the embeddings schema is
  * fixed-dim non-null, so neither fires on real data — they exist so
  * a malformed row can't silently land in bucket 0 and create phantom
  * candidates, and the element check keeps the interpreted and
  * codegen paths identical: ArrayData.getDouble on a null slot is
  * undefined — NPE interpreted, garbage under codegen).
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 31,
    s"numPlanes must be in [1, 31] to fit an int bucket, got ${planes.size}")
  require(planes.forall(_.size == planes.head.size),
    "all hyperplanes must share one dimension")

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  // Dimension-mismatch rows null the result even for a non-nullable
  // child (same rationale as CosineSimilarity.nullable).
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val dim = mat(0).length
    if (e.numElements() != dim) return null
    var j = 0
    while (j < dim) { if (e.isNullAt(j)) return null; j += 1 }
    var bucket = 0
    var p = 0
    while (p < mat.length) {
      val plane = mat(p)
      var dot = 0.0d
      var i = 0
      while (i < dim) { dot += e.getDouble(i) * plane(i); i += 1 }
      if (dot > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", mat, "double[][]")
      val dim = ctx.freshName("dim")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val plane = ctx.freshName("plane")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      s"""
         |final int $dim = $planesRef[0].length;
         |boolean ${bucket}_bad = ($a.numElements() != $dim);
         |for (int $j = 0; !${bucket}_bad && $j < $dim; $j++) {
         |  ${bucket}_bad = $a.isNullAt($j);
         |}
         |if (${bucket}_bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planesRef.length; $p++) {
         |    final double[] $plane = $planesRef[$p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $a.getDouble($i) * $plane[$i];
         |    }
         |    if ($dot > 0) $bucket |= (1 << $p);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Column API: hyperplane_bucket(e) for a fixed plane matrix. */
  def apply(e: Column, planes: Seq[Seq[Double]]): Column =
    GraftBridge.column(HyperplaneBucket(GraftBridge.expression(e), planes))
}
