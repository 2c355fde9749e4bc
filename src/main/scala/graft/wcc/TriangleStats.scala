package graft.wcc

import org.apache.spark.graphx._
import org.apache.spark.storage.StorageLevel

/**
 * Triangle statistics + preprocessing prune (G1/G2/G3/P4 in
 * SURVEY.md §2).
 *
 * Computes, for every vertex of an undirected graph (stored with
 * canonical single-direction edges):
 *   - t  = number of triangles through the vertex,
 *   - vt = number of neighbors sharing >=1 triangle with it,
 * and prunes the graph to its triangle-closing core: vertices with
 * t > 0, edges closing >=1 triangle.
 *
 * Semantics contract: the reference's 4-superstep degree-ordered
 * Pregel (`CountTriangle.scala:17-117`) followed by the subgraph
 * prune and the vt := degree/2 assignment
 * (`DistributedWCC.scala:88-130`). Both compute per-vertex triangle
 * counts via adjacency-list intersection.
 *
 * Scale: the adjacency exchange is DEGREE-ORIENTED — each edge
 * assigns its higher-(degree, id)-ranked endpoint to the lower one's
 * out-list, so every shipped array holds only higher-ranked
 * neighbors: O(sqrt(2E)) amortized per vertex instead of O(deg).
 * Without the orientation a 10^5-degree power-law hub ships its full
 * 10^5-entry array over each of its 10^5 edges (10^10 ids — the
 * straggler/OOM scale cliff); with it the hub's out-list is near
 * empty and its leaves each ship a handful of ids. Each triangle
 * {x,y,z} (rank x<y<z) is enumerated exactly once, at the merge
 * scan of edge (x,y), and credits all THREE of its edges, so the
 * per-edge support — the prune predicate the rest of the pipeline
 * consumes (`DistributedWCC.scala:111`) — stays exact. Message
 * volume is 3*T for T triangles (output-bound) plus one
 * reduceByKey/join on the edge set.
 */
object TriangleStats {

  /** Count of common elements of two sorted arrays. */
  private[wcc] def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  final case class Result(
      /** pruned triangle-core graph; vertex attr has t, vt filled,
       * cId = own id; edge attr = common-neighbor count (>0) */
      pruned: Graph[VertexData, Int],
      /** (vId, t, vt) for EVERY vertex of the input graph, including
       * non-triangle ones (t=0) — the reference's
       * TriangleCountResult dump surface */
      fullStats: VertexRDD[(Int, Int)])

  /** Per-edge triangle support via the hub-safe ORIENTED exchange:
   * each edge assigns its higher-(degree, id)-ranked endpoint to the
   * lower one's out-list, bounding every shipped array by the
   * vertex's out-degree (O(sqrt(2E)) amortized) instead of its full
   * degree. Each triangle {x,y,z} with rank x<y<z appears exactly
   * once, in the merge scan of edge (x,y) (z is in BOTH out-lists
   * only there), and credits all three of its edges — so the value
   * per canonical (min, max) edge key is the FULL common-neighbor
   * count. Self-loops were dropped at load, so endpoints never
   * appear in an intersection. Edges with zero support are absent. */
  private[wcc] def edgeSupport[V: scala.reflect.ClassTag](
      graph: Graph[V, _]): org.apache.spark.rdd.RDD[((Long, Long), Int)] = {
    val gDeg: Graph[Int, _] =
      graph.outerJoinVertices(graph.degrees)((_, _, d) => d.getOrElse(0))
    val outAdj: VertexRDD[Array[Long]] = gDeg.aggregateMessages[Array[Long]](
      ctx => {
        val srcLower = ctx.srcAttr < ctx.dstAttr ||
          (ctx.srcAttr == ctx.dstAttr && ctx.srcId < ctx.dstId)
        if (srcLower) ctx.sendToSrc(Array(ctx.dstId))
        else ctx.sendToDst(Array(ctx.srcId))
      }, _ ++ _)
    val withAdj: Graph[Array[Long], _] =
      graph.outerJoinVertices(outAdj)((_, _, a) =>
        a.map(_.sorted).getOrElse(Array.empty[Long]))
    withAdj.triplets.flatMap { t =>
      val a = t.srcAttr; val b = t.dstAttr
      val s = t.srcId; val d = t.dstId
      val out = scala.collection.mutable.ArrayBuffer.empty[((Long, Long), Int)]
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val x = a(i); val y = b(j)
        if (x == y) {
          out += (((math.min(s, d), math.max(s, d)), 1))
          out += (((math.min(s, x), math.max(s, x)), 1))
          out += (((math.min(d, x), math.max(d, x)), 1))
          i += 1; j += 1
        } else if (x < y) i += 1
        else j += 1
      }
      out
    }.reduceByKey(_ + _)
  }

  /** Per-VERTEX triangle counts via the same oriented enumeration:
   * each triangle is found once (at its lowest-ranked edge) and
   * credits its three vertices — so values need NO halving. Message
   * volume is 3*T plus the bounded out-adjacency exchange. Vertices
   * in no triangle are absent. */
  private[wcc] def vertexTriangles[V: scala.reflect.ClassTag](
      graph: Graph[V, _]): org.apache.spark.rdd.RDD[(Long, Int)] = {
    val gDeg: Graph[Int, _] =
      graph.outerJoinVertices(graph.degrees)((_, _, d) => d.getOrElse(0))
    val outAdj: VertexRDD[Array[Long]] = gDeg.aggregateMessages[Array[Long]](
      ctx => {
        val srcLower = ctx.srcAttr < ctx.dstAttr ||
          (ctx.srcAttr == ctx.dstAttr && ctx.srcId < ctx.dstId)
        if (srcLower) ctx.sendToSrc(Array(ctx.dstId))
        else ctx.sendToDst(Array(ctx.srcId))
      }, _ ++ _)
    val withAdj: Graph[Array[Long], _] =
      graph.outerJoinVertices(outAdj)((_, _, a) =>
        a.map(_.sorted).getOrElse(Array.empty[Long]))
    withAdj.triplets.flatMap { t =>
      val a = t.srcAttr; val b = t.dstAttr
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val x = a(i); val y = b(j)
        if (x == y) {
          out += ((t.srcId, 1)); out += ((t.dstId, 1)); out += ((x, 1))
          i += 1; j += 1
        } else if (x < y) i += 1
        else j += 1
      }
      out
    }.reduceByKey(_ + _)
  }

  def run(graph: Graph[Int, Int]): Result = {
    val support = edgeSupport(graph)

    // graft supports back onto the canonical edge set (0 for
    // triangle-free edges)
    val countedEdges = graph.edges
      .map(e => ((math.min(e.srcId, e.dstId), math.max(e.srcId, e.dstId)), ()))
      .leftOuterJoin(support)
      .map { case ((s, d), (_, c)) => Edge(s, d, c.getOrElse(0)) }

    // default storage levels: Graph.apply re-persists the vertex RDD
    // it is handed, and GraphX refuses to change an existing level —
    // every graph in this library therefore uses the GraphX default.
    val counted: Graph[Int, Int] = Graph(graph.vertices, countedEdges, 0)
    counted.cache()

    // G1+G3: per-vertex (2t, vt) in one pass — map-side combine free.
    val stats: VertexRDD[(Int, Int)] = counted.aggregateMessages[(Int, Int)](
      ctx => {
        val inc = (ctx.attr, if (ctx.attr > 0) 1 else 0)
        ctx.sendToSrc(inc); ctx.sendToDst(inc)
      },
      (x, y) => (x._1 + y._1, x._2 + y._2))

    val fullStats: VertexRDD[(Int, Int)] =
      graph.vertices.leftJoin(stats) { (_, _, s) =>
        val (twoT, vt) = s.getOrElse((0, 0)); (twoT / 2, vt)
      }

    val dataGraph: Graph[VertexData, Int] =
      counted.outerJoinVertices(fullStats) { (id, _, s) =>
        val (t, vt) = s.getOrElse((0, 0))
        VertexData(id, t, vt, id)
      }

    // P4: prune to the triangle core (reference
    // `DistributedWCC.scala:109-112`). An edge with common count > 0
    // implies both endpoints have t > 0, so vt (counted above over
    // triangle edges) equals the pruned-graph degree.
    val pruned = dataGraph.subgraph(
      epred = e => e.attr > 0,
      vpred = (_, vd) => vd.t > 0)

    // Materialize the two output surfaces, then drop the scratch
    // graphs — cached intermediates otherwise accumulate across the
    // bulk + incremental pipelines that each call run().
    pruned.cache()
    fullStats.cache()
    pruned.numVertices
    fullStats.count()
    counted.unpersistVertices(blocking = false)
    counted.edges.unpersist(blocking = false)
    Result(pruned, fullStats)
  }
}
