package graft
import org.apache.spark.sql.SparkSession
object WccProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.currentTimeMillis()
    val n = graft.queries.GraphQueries.wccPartition(spark, "/root/testdata/sf0.1").count()
    System.err.println(s"[graft-wcc] profile-total: ${System.currentTimeMillis()-t0} ms, rows=$n")
    spark.stop()
  }
}
