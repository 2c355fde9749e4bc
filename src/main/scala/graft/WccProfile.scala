package graft
import org.apache.spark.sql.SparkSession
object WccProfile {
  def main(args: Array[String]): Unit = {
    val what = sys.env.getOrElse("GRAFT_PROFILE", "partition")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.currentTimeMillis()
    val n = what match {
      case "incremental" => graft.queries.GraphQueries.wccIncremental(spark, sf).count()
      case _ => graft.queries.GraphQueries.wccPartition(spark, sf).count()
    }
    System.err.println(s"[graft-wcc] profile-total($what): ${System.currentTimeMillis()-t0} ms, rows=$n")
    spark.stop()
  }
}
