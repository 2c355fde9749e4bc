package graft.graph

import org.apache.spark.graphx._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph algorithms beyond the reference's WCC pipeline, expressed
 * over the same canonical-edge (src < dst, stored once) graphs that
 * `EdgeOps.toGraph` builds. Undirected semantics come from
 * both-direction messaging, not doubled edges (see EdgeOps scale
 * notes).
 */
object GraphAlgs {

  /**
   * BFS hop distances from `source` via Pregel: messages carry
   * candidate distances, vprog keeps the minimum; converges in
   * O(diameter) supersteps — only frontier vertices send messages,
   * so each superstep is a frontier-sized aggregateMessages, the
   * canonical scalable BFS on a partitioned graph.
   *
   * `maxHops` bounds the superstep count (and therefore the deepest
   * reported distance) so a pathological diameter cannot run away;
   * unreached vertices keep Long.MaxValue and are dropped by
   * [[bfsHopsDF]].
   */
  def bfsHops[V](g: Graph[V, Int], source: VertexId, maxHops: Int = 30): Graph[Long, Int] = {
    val init = g.mapVertices((id, _) => if (id == source) 0L else Long.MaxValue)
    init.pregel(Long.MaxValue, maxIterations = maxHops,
      activeDirection = EdgeDirection.Either)(
      (_, d, m) => math.min(d, m),
      t => {
        val fromSrc =
          if (t.srcAttr != Long.MaxValue && t.srcAttr + 1 < t.dstAttr)
            Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty
        val fromDst =
          if (t.dstAttr != Long.MaxValue && t.dstAttr + 1 < t.srcAttr)
            Iterator((t.srcId, t.dstAttr + 1)) else Iterator.empty
        fromSrc ++ fromDst
      },
      math.min)
  }

  /** (vid, hops) rows for vertices reached within maxHops. */
  def bfsHopsDF[V](g: Graph[V, Int], source: VertexId, maxHops: Int = 30): DataFrame = {
    val bfs = bfsHops(g, source, maxHops)
    val rows = bfs.vertices.filter(_._2 != Long.MaxValue)
    val out = rows.map { case (id, d) => (id, d) }
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(out).toDF("vid", "hops")
    bfs.unpersistVertices(blocking = false)
    bfs.edges.unpersist(blocking = false)
    df
  }

  /**
   * Per-edge neighborhood Jaccard similarity (common neighbors over
   * union of neighborhoods) for each canonical edge — the standard
   * link-prediction / tie-strength feature.
   *
   * Relational plan: one shuffle to build sorted adjacency arrays,
   * then two vertex-table joins feeding a codegen'd
   * `array_intersect` — no per-pair shuffle, no triangle-join
   * explosion; adjacency arrays are degree-bounded so the row width
   * is bounded by max degree (skewed hubs are the known caveat, the
   * same one every adjacency-list algorithm carries).
   *
   * `canonical` is the (src < dst, distinct) edge set; `symmetrized`
   * its doubled form (both produced by EdgeOps).
   */
  def neighborJaccard(canonical: DataFrame, symmetrized: DataFrame): DataFrame = {
    val adj = symmetrized.groupBy(col("src").as("vid"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val common = size(array_intersect(col("na.nbrs"), col("nb.nbrs")))
    canonical
      .join(adj.as("na"), col("src") === col("na.vid"))
      .join(adj.as("nb"), col("dst") === col("nb.vid"))
      .select(col("src"), col("dst"),
        common.cast("long").as("common"),
        size(col("na.nbrs")).cast("long").as("deg_src"),
        size(col("nb.nbrs")).cast("long").as("deg_dst"),
        graft.ops.TextOps.rnd(
          common.cast("double") /
            (size(col("na.nbrs")) + size(col("nb.nbrs")) - common), 9)
          .as("jaccard"))
  }
}
