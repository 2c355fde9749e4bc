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

  test("hamming is callable from SQL and matches the interpreted fold") {
    GraftExpressions.registerSql(spark)
    assert(spark.sql("SELECT hamming('0101', '0011') AS h").head().getInt(0) === 2)
    assert(spark.sql("SELECT hamming('1111', '1111') AS h").head().getInt(0) === 0)
    // equal-length random bit strings vs the interpreted formulation
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 50).map { _ =>
      (Seq.fill(16)(rnd.nextInt(2)).mkString, Seq.fill(16)(rnd.nextInt(2)).mkString)
    }
    import spark.implicits._
    val df = rows.toDF("a", "b")
    val both = df.select(
      graft.ops.Dedup.hammingBits(col("a"), col("b")).as("nat"),
      aggregate(zip_with(split(col("a"), ""), split(col("b"), ""),
        (x, y) => when(x =!= y, 1).otherwise(0)), lit(0), (acc, x) => acc + x).as("itp"))
      .collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("intersect_count matches array_intersect size on sorted distinct arrays") {
    GraftExpressions.registerSql(spark)
    assert(spark.sql(
      "SELECT intersect_count(array(1L,3L,5L,9L), array(2L,3L,5L,10L)) AS c")
      .head().getInt(0) === 2)
    assert(spark.sql(
      "SELECT intersect_count(array(1L,2L), array(3L,4L)) AS c")
      .head().getInt(0) === 0)
    // randomized parity vs the built-in on sorted distinct inputs
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { _ =>
      (Seq.fill(20)(rnd.nextInt(40).toLong).distinct.sorted,
        Seq.fill(20)(rnd.nextInt(40).toLong).distinct.sorted)
    }
    rows.toDF("a", "b")
      .select(GraftExpressions.intersectCount(col("a"), col("b")).as("nat"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
      .foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("GraftExtensions injects without error") {
    // the builder-time path: injection must register cleanly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
