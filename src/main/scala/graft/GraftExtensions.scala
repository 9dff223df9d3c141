package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types

import graft.functions.{CmsUnionAgg, CosineSimilarity, CountMinProbe, HyperplaneBucket, Int8Quantize, MinHashSig, SimHash60}
import graft.plans.BoundedLevenshteinRule

/** Session extension registering graft's native expressions with the
  * SQL function registry, so pure-SQL users get them too:
  *
  *   spark.sql.extensions=graft.GraftExtensions      (config), or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * then: SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *
  * This is the (c)-tier extension point of the library's design rules:
  * compose built-ins first, then a native Expression, then — as here —
  * register it so the optimizer and SQL surface treat it like any
  * built-in (codegen included).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Plan rewrite: thresholded unbounded levenshtein → banded 3-arg
    // form (O(k·len) with early bail-out instead of the O(len²) matrix).
    ext.injectOptimizerRule(_ => BoundedLevenshteinRule)

    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, null, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_similarity expects 2 arguments, got ${children.length}")
        CosineSimilarity(children(0), children(1))
      }))

    // hyperplane_bucket(e, planes): the plane matrix argument must be a
    // FOLDABLE array<array<double>> literal — it is the model constant
    // the expression compiles into its codegen'd loop, not per-row data.
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(
        classOf[HyperplaneBucket].getName, null, "hyperplane_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"hyperplane_bucket expects 2 arguments, got ${children.length}")
        val planesExpr = children(1)
        require(planesExpr.foldable,
          "hyperplane_bucket's plane matrix must be a foldable literal " +
            "(it becomes a compile-time constant of the codegen'd loop)")
        planesExpr.dataType match {
          case types.ArrayType(types.ArrayType(types.DoubleType, _), _) =>
          case t => throw new IllegalArgumentException(
            s"hyperplane_bucket's plane matrix must be array<array<double>>, " +
              s"got ${t.sql}")
        }
        val evaled = planesExpr.eval()
        require(evaled != null, "hyperplane_bucket's plane matrix must not be null")
        val arr = evaled.asInstanceOf[ArrayData]
        val planes = (0 until arr.numElements()).map { p =>
          val row = arr.getArray(p)
          require(row != null,
            s"hyperplane_bucket's plane matrix must not contain null rows (row $p)")
          (0 until row.numElements()).map(row.getDouble).toSeq
        }
        HyperplaneBucket(children(0), planes)
      }))

    // minhash_sig(sset, numHashes): the signature width must be a
    // foldable int literal — it fixes the expression's output arity,
    // not per-row data.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, null, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"minhash_sig expects 2 arguments, got ${children.length}")
        val widthExpr = children(1)
        require(widthExpr.foldable && widthExpr.dataType == types.IntegerType,
          "minhash_sig's width must be a foldable int literal")
        val evaled = widthExpr.eval()
        require(evaled != null, "minhash_sig's width must not be null")
        MinHashSig(children(0), evaled.asInstanceOf[Int])
      }))

    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, null, "simhash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"simhash60 expects 1 argument, got ${children.length}")
        SimHash60(children(0))
      }))

    ext.injectFunction((
      new FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, null, "int8_quantize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"int8_quantize expects 1 argument, got ${children.length}")
        Int8Quantize(children(0))
      }))

    // cms_union_agg(cms): executor-side union of serialized count-min
    // sketches — the frequency mirror of the builtin hll_union_agg,
    // which Spark (4.1) has no builtin for.
    ext.injectFunction((
      new FunctionIdentifier("cms_union_agg"),
      new ExpressionInfo(classOf[CmsUnionAgg].getName, null, "cms_union_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"cms_union_agg expects 1 argument, got ${children.length}")
        CmsUnionAgg(children(0)).toAggregateExpression()
      }))

    // count_min_probe(value, sketch): the sketch operand must be a
    // query-level constant (foldable literal or scalar subquery) — the
    // expression deserializes it once, not per row. Validated by the
    // expression's own checkInputDataTypes (a subquery is still
    // unresolved at injection time, so no eager require here).
    ext.injectFunction((
      new FunctionIdentifier("count_min_probe"),
      new ExpressionInfo(classOf[CountMinProbe].getName, null, "count_min_probe"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"count_min_probe expects 2 arguments, got ${children.length}")
        CountMinProbe(children(0), children(1))
      }))

    // Spark ships BloomFilterMightContain / BloomFilterAggregate but
    // (4.1) registers neither for SQL — they normally appear only via
    // the InjectRuntimeFilter optimizer rule. BloomJoin's explicit
    // semi-join reduction needs them callable, so register whichever
    // is absent from the builtin registry (guarded: a future Spark
    // that registers them builtin wins, we don't shadow it).
    if (!FunctionRegistry.builtin.functionExists(
        new FunctionIdentifier("might_contain"))) {
      ext.injectFunction((
        new FunctionIdentifier("might_contain"),
        new ExpressionInfo(
          classOf[BloomFilterMightContain].getName, null, "might_contain"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"might_contain expects 2 arguments, got ${children.length}")
          BloomFilterMightContain(children(0), children(1))
        }))
    }
    if (!FunctionRegistry.builtin.functionExists(
        new FunctionIdentifier("bloom_filter_agg"))) {
      ext.injectFunction((
        new FunctionIdentifier("bloom_filter_agg"),
        new ExpressionInfo(
          classOf[BloomFilterAggregate].getName, null, "bloom_filter_agg"),
        (children: Seq[Expression]) => {
          require(children.length == 3,
            s"bloom_filter_agg expects 3 arguments, got ${children.length}")
          new BloomFilterAggregate(children(0), children(1), children(2))
            .toAggregateExpression()
        }))
    }
  }
}
