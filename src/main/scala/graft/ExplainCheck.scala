package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans of representative queries and assert
 * the plan properties the engine is designed around (pushdown,
 * pruning, broadcast, whole-stage codegen). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def plan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.count() // finalize the AQE plan before inspecting it
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $name =====")
      println(p.linesIterator.take(40).mkString("\n"))
      p
    }
    val fp = plan("r_filter_pushdown")
    assert(fp.contains("PushedFilters: [IsNotNull(l_quantity)"), "filter not pushed")
    assert(fp.contains("ReadSchema") &&
      !fp.contains("l_returnflag"), "column pruning failed")
    val ja = plan("r_join_agg")
    assert(ja.contains("BroadcastHashJoin"), "dim joins not broadcast")
    val ann = plan("p_ann_bruteforce")
    // AQE's toString omits WholeStageCodegen markers; assert the
    // structural properties instead: native codegen-capable dot
    // product, broadcast of the small query side, and partial top-k
    // pushdown below the shuffle (WindowGroupLimit).
    assert(ann.toLowerCase.contains("dotproduct"), "native dot product absent")
    assert(ann.contains("BroadcastNestedLoopJoin"), "query side not broadcast")
    assert(ann.contains("WindowGroupLimit"), "top-k not pushed below the shuffle")
    val nd = plan("p_embed_neardup")
    assert(!nd.contains("BroadcastNestedLoopJoin") && !nd.contains("CartesianProduct"),
      "near-dup candidates must come from the LSH band equi-join, not an all-pairs product")
    assert(nd.toLowerCase.contains("dotproduct"),
      "native dot product absent in the near-dup re-rank")
    val nj = plan("g_neighbor_jaccard")
    assert(nj.toLowerCase.contains("sortedintersectcount"),
      "native merge-scan intersection absent")
    assert(!nj.contains("CartesianProduct"), "jaccard plan degenerated to cross product")
    val nf = plan("p_ngram_freq")
    assert(nf.contains("WindowGroupLimit"), "ngram top-k not pushed below the shuffle")
    val gf = plan("r_gap_fill")
    assert(gf.contains("BroadcastHashJoin"), "gap-fill grid join not broadcast")
    val sj = plan("r_star_join")
    assert(sj.split("BroadcastHashJoin").length - 1 >= 3,
      "star join must broadcast all three dimensions")
    assert(!sj.contains("SortMergeJoin"), "star join must not shuffle the fact side")
    val zs = plan("p_zipf_slope")
    assert(zs.contains("TakeOrderedAndProject"),
      "zipf top-500 must be a partial top-k (TakeOrderedAndProject), not a global sort")
    val la = plan("r_listagg")
    assert(la.contains("BroadcastHashJoin"), "region dim join not broadcast")
    val lj = plan("r_lateral_join")
    assert(lj.contains("WindowGroupLimit") && lj.contains("Partial"),
      "correlated LATERAL LIMIT must decorrelate to a partial window group limit")
    assert(lj.contains("BroadcastHashJoin"), "lateral rejoin not broadcast")
    assert(!lj.contains("NestedLoop") && !lj.contains("CartesianProduct"),
      "lateral join degenerated to a per-row loop")
    println("ALL PLAN CHECKS PASSED")
    spark.stop()
  }
}
