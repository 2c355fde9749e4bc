package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the harness contract is local[32] on a
    // 32-cpu box; a hardcoded small default would quietly benchmark
    // at a fraction of the machine
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS); Spark reads it as Long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    // deterministic run order (alphabetical), errors surfaced on stderr
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // 3-decimal times keep the whole JSON line under ~2.5 KB: the
    // harness captures only the last ~4 KB of stdout, and a full-
    // precision line (~4.8 KB) gets its head truncated → unparseable
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) d3(v) else "-1")
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    graft.queries.SessionMemo.clear(spark)
    spark.stop()
  }
}
