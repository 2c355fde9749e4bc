package graft

import graft.SparkSpec
import org.apache.spark.sql.graft.GraftExpressions

class GraftExtensionsSpec extends SparkSpec {
  test("dot_product is callable from SQL after registration") {
    GraftExpressions.registerSql(spark)
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v === 11.0)
  }

  test("GraftExtensions injects without error") {
    // the builder-time path: injection must register cleanly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
