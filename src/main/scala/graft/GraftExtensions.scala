package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{DotProduct, HammingDistance, SortedIntersectCount}

/**
 * SparkSessionExtensions entry point registering the library's
 * native functions for the SQL surface:
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions) ...
 * // or: spark.sql.extensions=graft.GraftExtensions
 * spark.sql("SELECT dot_product(a, b) FROM t")
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingDistance(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(exprs(0), exprs(1))))
  }
}
