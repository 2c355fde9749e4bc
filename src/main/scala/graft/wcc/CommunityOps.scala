package graft.wcc

import org.apache.spark.graphx._

/**
 * Community-level aggregations over a partitioned graph (A1/A3/A8,
 * G7 in SURVEY.md §2).
 *
 * Graphs are stored with canonical single-direction undirected edges;
 * every aggregation sends to both endpoints, which reproduces the
 * reference's doubled-edge per-source aggregations
 * (`DistributedWCC.scala:331-573`) without the /2 halving corrections
 * it needs (`:564`, `:505`).
 */
object CommunityOps {

  /** Community stats (cId -> (r, a, b)) collected to the driver.
   * #communities << |V|, so a driver-side map + broadcast is the
   * right distribution strategy at any scale (reference
   * `DistributedWCC.scala:535-573`: two group-reduces + collect).
   *
   * One pass for sizes, one for edges; both partial-aggregate
   * map-side before the shuffle. */
  def computeCommunityStats(graph: Graph[VertexData, Int]): Map[Long, CommunityData] = {
    // One job for both granularities: vertex rows tagged 0 (sizes),
    // edge rows tagged 1/2 (INT/EXT). INT edges count once toward
    // their community; EXT edges count once toward EACH endpoint
    // community (reference `DistributedWCC.scala:553-564` after
    // un-doubling).
    val vertexPairs = graph.vertices
      .map { case (_, vd) => ((0, vd.cId), 1) }
    val edgePairs = graph.triplets
      .flatMap { t =>
        val cs = t.srcAttr.cId; val cd = t.dstAttr.cId
        if (cs == cd) Iterator(((1, cs), 1))
        else Iterator(((2, cs), 1), ((2, cd), 1))
      }
    val counts: Map[(Int, Long), Int] = vertexPairs.union(edgePairs)
      .reduceByKey(_ + _)
      .collectAsMap().toMap

    counts.collect { case ((0, c), r) => (c, r) }.map { case (c, r) =>
      val a = counts.getOrElse((1, c), 0)
      val b = counts.getOrElse((2, c), 0)
      (c, CommunityData(r, a.toDouble, b))
    }.toMap
  }

  /** Per-vertex map of neighbor-community -> edge count (A3,
   * reference `DistributedWCC.scala:348-356`). Used by the movement
   * step; map-side combine keeps message volume at
   * O(E * avg distinct communities per neighborhood). */
  def vertexCommunityDegrees(graph: Graph[VertexData, Int]): VertexRDD[Map[Long, Int]] =
    graph.aggregateMessages[Map[Long, Int]](
      ctx => {
        ctx.sendToSrc(Map(ctx.dstAttr.cId -> 1))
        ctx.sendToDst(Map(ctx.srcAttr.cId -> 1))
      },
      mergeCountMaps)

  /** Community stats derived from the per-vertex community-degree
   * maps the movement step computes anyway — NO extra pass over the
   * edges: r(c) counts members; a(c) = half the sum of members'
   * same-community degrees (each internal edge seen from both ends);
   * b(c) = sum of members' external degrees (each external edge seen
   * once per endpoint community). Pure integer arithmetic, so the
   * result is VALUE-IDENTICAL to `computeCommunityStats` — the
   * refinement trajectory cannot move.
   *
   * Replaces one full triplet scan per refinement iteration in both
   * hill-climbing loops; the collect stays O(#communities). */
  def statsFromDegrees(graph: Graph[VertexData, Int],
      deg: VertexRDD[Map[Long, Int]]): Map[Long, CommunityData] = {
    val perVertex = graph.vertices.leftJoin(deg) { (_, vd, mOpt) =>
      val m = mOpt.getOrElse(Map.empty[Long, Int])
      var own = 0; var ext = 0
      m.foreach { case (c, n) => if (c == vd.cId) own += n else ext += n }
      (vd.cId, own, ext)
    }
    val counts = perVertex
      .map { case (_, (c, own, ext)) => (c, (1, own, ext)) }
      .reduceByKey((x, y) => (x._1 + y._1, x._2 + y._2, x._3 + y._3))
      .collectAsMap()
    counts.map { case (c, (r, sameDeg, ext)) =>
      (c, CommunityData(r, (sameDeg / 2).toDouble, ext))
    }.toMap
  }

  private[wcc] def mergeCountMaps(a: Map[Long, Int], b: Map[Long, Int]): Map[Long, Int] =
    if (a.size >= b.size) b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0) + v) }
    else a.foldLeft(b) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0) + v) }

  /**
   * G7: global WCC = (sum over vertices of WCC_V) / vertexCount.
   *
   * Two aggregateMessages passes (same-community adjacency arrays,
   * then per-edge array intersections for intra-community triangle
   * counts) + a broadcast of the community-stats map — the reference's
   * `computeGlobalWCC` (`DistributedWCC.scala:422-460`) with its two
   * edge-decoration joins replaced by triplet access.
   *
   * @param vertexCount divisor — the ORIGINAL (unpruned) vertex count
   *                    (reference passes `this.vertexCount`, `:41`)
   */
  def computeGlobalWCC(graph: Graph[VertexData, Int],
      stats: Map[Long, CommunityData], vertexCount: Long): Double = {
    val sc = graph.vertices.sparkContext
    val bStats = sc.broadcast(stats)

    // vtC first, with Int messages (same-community degree) — always
    // cheaper than the reference's array shipment for this value.
    val vtC: VertexRDD[Int] = graph.aggregateMessages[Int](
      ctx => if (ctx.srcAttr.cId == ctx.dstAttr.cId) {
        ctx.sendToSrc(1); ctx.sendToDst(1)
      }, _ + _)
    vtC.cache()
    val maxSameDeg = vtC.map(_._2).fold(0)(math.max)

    // tC, adaptive on the same hub threshold as TriangleStats: the
    // common case (every community's internal degree bounded) ships
    // same-community neighbor arrays per edge and merge-intersects
    // them per same-community edge — two aggregateMessages, the
    // reference's own plan (`:462-533`), each triangle seen from two
    // incident edges hence /2. A community with an internal hub
    // above the threshold would concentrate O(deg_c^2) merge work in
    // that hub's tasks, so the oriented once-per-triangle
    // enumeration takes over (bounded out-lists, credits all three
    // vertices, no halving). Exact integers either way — the WCC
    // doubles cannot move.
    val tC: org.apache.spark.rdd.RDD[(Long, Int)] =
      if (maxSameDeg <= TriangleStats.HubDegreeThreshold) {
        val commNbors: VertexRDD[Array[Long]] = graph.aggregateMessages[Array[Long]](
          ctx => if (ctx.srcAttr.cId == ctx.dstAttr.cId) {
            ctx.sendToSrc(Array(ctx.dstId)); ctx.sendToDst(Array(ctx.srcId))
          }, _ ++ _)
        val gA: Graph[(VertexData, Array[Long]), Int] =
          graph.outerJoinVertices(commNbors)((_, vd, a) =>
            (vd, a.map(_.sorted).getOrElse(Array.empty[Long])))
        gA.aggregateMessages[Int](
          ctx => if (ctx.srcAttr._1.cId == ctx.dstAttr._1.cId) {
            val c = TriangleStats.sortedIntersectCount(ctx.srcAttr._2, ctx.dstAttr._2)
            if (c > 0) { ctx.sendToSrc(c); ctx.sendToDst(c) }
          }, _ + _)
          .map { case (id, twoT) => (id, twoT / 2) }
      } else {
        TriangleStats.vertexTriangles(
          graph.subgraph(epred = t => t.srcAttr.cId == t.dstAttr.cId))
      }

    val sumWcc = graph
      .outerJoinVertices(vtC)((_, vd, o) => (vd, o.getOrElse(0)))
      .outerJoinVertices(tC)((_, p, o) => (p._1, p._2, o.getOrElse(0)))
      .vertices
      .map { case (_, (vd, vtc, tc)) =>
        WCCMetric.computeWccV(vd, bStats.value(vd.cId), vtc, tc)
      }
      .sum()
    vtC.unpersist(blocking = false)
    bStats.destroy()
    sumWcc / vertexCount
  }
}
