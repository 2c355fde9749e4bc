package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftExpressions

/**
 * Public facade for the library's native Catalyst expressions (the
 * implementations live under org.apache.spark.sql.graft because
 * Catalyst's extension surfaces are private[sql]).
 */
object ArrayMath {
  /** Codegen'd dot product over two ARRAY<DOUBLE> columns — see
   * org.apache.spark.sql.graft.DotProduct. */
  def dotProduct(a: Column, b: Column): Column =
    GraftExpressions.dotProduct(a, b)
}
