package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

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
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, null, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_similarity expects 2 arguments, got ${children.length}")
        CosineSimilarity(children(0), children(1))
      }))
  }
}
