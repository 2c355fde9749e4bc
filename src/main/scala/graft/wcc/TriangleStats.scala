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
 * counts via adjacency-list intersection; here the whole job is ONE
 * adjacency exchange + ONE aggregateMessages pass over triplets:
 * per edge (u,v) the sorted adjacency arrays are merge-intersected
 * once, producing simultaneously the per-edge common-neighbor count
 * (edge prune predicate, `DistributedWCC.scala:111`), 2*t per
 * endpoint, and vt (count of incident triangle edges = pruned-graph
 * degree, `DistributedWCC.scala:125-129`).
 *
 * Scale: message volume is one Array[Long] per edge endpoint
 * (the same as the reference's superstep-2 adjacency shipment);
 * intersection is O(d_u + d_v) on sorted arrays, not O(d_u * d_v).
 * Skewed hubs are bounded by EdgePartition2D placement.
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

  def run(graph: Graph[Int, Int]): Result = {
    // G2: adjacency arrays (sorted for merge-intersection)
    val adj: VertexRDD[Array[Long]] =
      graph.collectNeighborIds(EdgeDirection.Either).mapValues(_.sorted)

    val withAdj: Graph[Array[Long], Int] =
      graph.outerJoinVertices(adj)((_, _, a) => a.getOrElse(Array.empty[Long]))
    withAdj.cache()

    // Per-edge common neighbor count (self-loops were dropped at load,
    // so neither endpoint can appear in the intersection).
    val countedEdges = withAdj.triplets.map { t =>
      Edge(t.srcId, t.dstId, sortedIntersectCount(t.srcAttr, t.dstAttr))
    }

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
    withAdj.unpersist(blocking = false)
    counted.unpersistVertices(blocking = false)
    counted.edges.unpersist(blocking = false)
    Result(pruned, fullStats)
  }
}
