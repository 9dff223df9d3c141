package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Executor-side union of serialized count-min sketches — the
  * frequency-sketch mirror of Spark's builtin `hll_union_agg`.
  *
  * Why an aggregate and not a driver loop: per-ingest-unit CMS rows are
  * bounded, but each sketch is O(width·depth) bytes (~100 KB at
  * eps=0.001), so collecting a year of days × sources to the driver is
  * tens of GB moved to one JVM and merged SEQUENTIALLY. As a
  * `TypedImperativeAggregate` the merge runs where the sketch rows
  * live: partial merges map-side, one final combine, and the driver
  * ever sees exactly ONE merged sketch. CMS merge is entry-wise
  * addition of identically-seeded tables, so the union is exact and
  * order-insensitive — partial/final split loses nothing (spec-pinned
  * against a driver-side reference merge in SketchesSpec).
  *
  * Null/empty handling: null inputs are skipped; an empty group yields
  * NULL (not a throw — the empty-window case is a legal query result).
  * Sketches built with different (eps, confidence, seed) fail the
  * underlying `mergeInPlace` compatibility check — incompatible tables
  * must never be silently added.
  */
case class CmsUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized count-min sketch) " +
        s"column, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_union_agg"

  // The buffer adopts the first sketch it sees (its eps/confidence/seed
  // parameters travel inside the serialized form), so the aggregate
  // needs no parameter arguments of its own.
  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val bytes = child.eval(input)
    if (bytes == null) buffer
    else {
      val s = CountMinSketch.readFrom(bytes.asInstanceOf[Array[Byte]])
      if (buffer == null) s else { buffer.mergeInPlace(s); buffer }
    }
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (buffer == null) other
    else if (other == null) buffer
    else { buffer.mergeInPlace(other); buffer }

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bos = new ByteArrayOutputStream()
      buffer.writeTo(bos)
      bos.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
}

/** Native Catalyst expression: estimated count of a string value in a
  * FIXED merged count-min sketch.
  *
  * Why an Expression and not `mapPartitions`: the scoring stage is the
  * only object-code island in the heavy-hitters plan — `mapPartitions`
  * forces a Deserialize/Serialize pair around what is otherwise one
  * hash-probe per row, breaking whole-stage codegen exactly where every
  * candidate flows. `doGenCode` emits a direct `estimateCount` call on
  * a constant-reference sketch object, so scoring fuses into the
  * surrounding filter/sort stage like any builtin.
  *
  * The sketch operand must be a query-level constant — a foldable
  * binary literal or a scalar subquery (the same contract Spark's
  * `BloomFilterMightContain` uses for its filter operand): it is
  * deserialized ONCE (driver side, lazy, after subqueries complete)
  * and ships as a plan reference object — never per-row data. At
  * eps=0.001 that is ~100 KB in the task binary, the same order as a
  * broadcast-table reference; callers with radically bigger sketches
  * should lower the sketch resolution, not inline megabytes.
  *
  * Hash-domain contract: the probe hashes the value's UTF-8 bytes —
  * exactly what Spark's builtin `count_min_sketch` aggregate feeds the
  * sketch for a string column — so `Sketches.buildFreqSketches` casts
  * every build column to string and this expression requires a string
  * operand. Probing a sketch built over a non-string column in its
  * native type would compare different hash domains and return noise
  * (the r8 advisor finding this design closes off).
  */
case class CountMinProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string value operand, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType ||
        !(right.foldable || right.isInstanceOf[PlanExpression[_]]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the sketch operand to be a foldable " +
          s"binary literal or scalar subquery, got ${right.dataType.sql} " +
          s"(foldable=${right.foldable})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_probe"

  // Deserialized once per plan, not per row. Null only when the sketch
  // literal itself is null — then the operand null check short-circuits
  // evaluation before any dereference (both eval paths).
  @transient private lazy val cms: CountMinSketch = {
    val bytes = right.eval()
    if (bytes == null) null else CountMinSketch.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def nullSafeEval(value: Any, sketchBytes: Any): Any =
    cms.estimateCount(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $cmsRef.estimateCount($v.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinProbe =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  /** Column API: union-merge a column of serialized count-min sketches. */
  def cmsUnion(sketches: Column): Column =
    GraftBridge.column(CmsUnionAgg(GraftBridge.expression(sketches))
      .toAggregateExpression())

  /** Column API: probe a merged sketch for a string value's estimate. */
  def probe(value: Column, sketch: Array[Byte]): Column =
    GraftBridge.column(CountMinProbe(
      GraftBridge.expression(value), Literal.create(sketch, BinaryType)))
}
