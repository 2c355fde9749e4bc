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
    // optional comma-separated name filter for local iteration (the
    // driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // host load (1/5/15-min averages) at run start and end: single
    // runs on this host swing +/-50% with background load (PERF.md),
    // so every bench artifact carries the load it was measured under
    // — cross-round comparisons are mechanically load-annotated
    def loadAvg(): String =
      try {
        val s = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        s.trim.split("\\s+").take(3).mkString(" ")
      } catch { case _: Throwable => "unknown" }
    // Quiet-box gate: a loaded host inflates the scored total ~1.6x
    // (round 8 ran at load 5.9-13.2 and measured 505.7 s vs 299-329 s
    // unloaded on identical code), so wait for the 1-min load to
    // drop below the threshold before starting — bounded, so a
    // permanently busy box still produces an artifact (annotated
    // with the load it actually ran under).
    def load1(): Double =
      try loadAvg().split(" ")(0).toDouble catch { case _: Throwable => -1.0 }
    val maxStartLoad = sys.env.get("SPARK_GRAFT_MAX_LOAD").map(_.toDouble).getOrElse(2.0)
    val maxWaitMs = sys.env.get("SPARK_GRAFT_LOAD_WAIT_SEC").map(_.toLong * 1000L)
      .getOrElse(600000L)
    val waitT0 = System.currentTimeMillis()
    var waitedMs = 0L
    while (load1() > maxStartLoad &&
        (System.currentTimeMillis() - waitT0) < maxWaitMs) {
      System.err.println(s"[bench] 1-min load ${load1()} > $maxStartLoad — waiting")
      Thread.sleep(15000L)
      waitedMs = System.currentTimeMillis() - waitT0
    }
    val loadStart = loadAvg()
    // deterministic run order (alphabetical), errors surfaced on stderr
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // The harness captures only the last ~4 KB of stdout; at 130+
    // queries a full per-query map (~4.5 KB even at 3 decimals) gets
    // its head truncated → unparseable (BENCH_r03 "parsed": null).
    // Stdout therefore carries a compact line — group subtotals plus
    // the slowest 25 queries — and the complete map goes to stderr
    // and bench_full.json for diagnostics.
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val loadEnd = loadAvg()
    val loadJson =
      s"""{"start":"$loadStart","end":"$loadEnd","waited_sec":${waitedMs / 1000}}"""
    val fullMap = jmap(results.map { case (k, v, ok) =>
      k -> (if (ok) d3(v) else "-1") })
    System.err.println(s"[bench-full] $fullMap")
    System.err.println(s"[bench-load] $loadJson")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        s"""{"load":$loadJson,"queries":$fullMap}""".getBytes("UTF-8")); ()
    } catch { case _: Throwable => () }
    val groups = results.groupBy(_._1.takeWhile(_ != '_')).toSeq.sortBy(_._1)
      .map { case (g, rs) => s"grp_$g" -> d3(rs.collect { case (_, v, true) => v }.sum) }
    val slow = results.filter(_._3).sortBy(-_._2).take(25)
      .map { case (k, v, _) => k -> d3(v) }
    val failed = results.filter(!_._3).map { case (k, _, _) => k -> "-1" }
    // SPARK_GRAFT_FULL_QUERIES=1: per-query times for EVERY query in
    // the stdout line (for capture paths without the ~4 KB stdout
    // cap); default stays the compact groups+slowest form
    val qs =
      if (sys.env.get("SPARK_GRAFT_FULL_QUERIES").contains("1")) fullMap
      else jmap(groups ++ failed ++ slow)
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","n":${results.size},"failed":${failed.size},"load":$loadJson,"queries":$qs,"sf":"$sfDir"}""")
    graft.queries.SessionMemo.clear(spark)
    spark.stop()
  }
}
