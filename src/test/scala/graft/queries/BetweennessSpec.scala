package graft.queries

import graft.SparkSpec

/** g_betweenness must equal a sequential textbook Brandes run
 * (bounded 8-hop horizon, same 5 hash-picked roots) on the real
 * sf0.001 graph — including bit-exact doubles, because both sides
 * fold successor terms in ascending successor-id order and the
 * per-vertex total in ascending root order. */
class BetweennessSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("sampled betweenness equals the sequential Brandes replay") {
    val got = GraphQueries.betweenness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

    val edges = GraphQueries.symmetrizedEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).sorted }
    val roots = GraphQueries.bfsSources(spark, sf).sorted

    // per root: BFS layers with sigma, then depth-descending deltas
    val perRoot = roots.map { s =>
      val dist = scala.collection.mutable.Map[Long, Int](s -> 0)
      val sigma = scala.collection.mutable.Map[Long, Long](s -> 1L)
      var frontier = Seq(s)
      var d = 0
      while (frontier.nonEmpty && d < 8) {
        d += 1
        val next = scala.collection.mutable.Map[Long, Long]()
        frontier.foreach { v =>
          adj.getOrElse(v, Array.empty[Long]).foreach { u =>
            if (!dist.contains(u))
              next(u) = Math.addExact(next.getOrElse(u, 0L), sigma(v))
          }
        }
        next.foreach { case (u, sg) => dist(u) = d; sigma(u) = sg }
        frontier = next.keys.toSeq
      }
      val maxD = if (dist.isEmpty) 0 else dist.values.max
      val delta = scala.collection.mutable.Map[Long, Double]()
      (maxD to 1 by -1).foreach { depth =>
        dist.toSeq.filter(_._2 == depth - 1).foreach { case (v, _) =>
          val succs = adj.getOrElse(v, Array.empty[Long])
            .filter(w => dist.get(w).contains(depth)).sorted
          if (succs.nonEmpty) {
            var acc = 0.0
            succs.foreach { w =>
              acc = acc + (sigma(v).toDouble / sigma(w).toDouble) *
                (1.0 + delta.getOrElse(w, 0.0))
            }
            delta(v) = acc
          }
        }
      }
      (s, dist, delta)
    }

    val vids = perRoot.flatMap(_._2.keys).distinct
    val expected = vids.flatMap { v =>
      val entries = perRoot.filter { case (s, dist, _) =>
        dist.contains(v) && v != s }
      if (entries.isEmpty) None
      else {
        var acc = 0.0
        entries.foreach { case (_, _, delta) =>
          acc = acc + delta.getOrElse(v, 0.0) }
        Some((v, entries.size.toLong, math.floor(acc * 1e9 + 0.5) / 1e9))
      }
    }.sorted.toSeq

    assert(got == expected)
    // the sample must produce real intermediaries
    assert(got.exists(_._3 > 0.0))
  }
}
