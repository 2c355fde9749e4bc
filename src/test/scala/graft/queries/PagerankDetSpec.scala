package graft.queries

import graft.SparkSpec

/** The deterministic integer PageRank must equal a sequential
 * replay of its micro-unit recurrence exactly — no tolerance — on
 * the real sf0.001 co-purchase graph. This is the property that
 * makes it the reproducible twin of the float g_pagerank: integer
 * sums are order-free, so distribution cannot move a single bit. */
class PagerankDetSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("deterministic pagerank equals the sequential recurrence bit-for-bit") {
    val got = GraphQueries.pagerankDeterministic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // brute sequential replay of the same recurrence
    val edges = GraphQueries.symmetrizedEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (v, es) => (v, es.map(_._2)) }
    val deg = adj.map { case (v, ns) => (v, ns.length.toLong) }
    var rank: Map[Long, Long] = deg.map { case (v, _) => (v, 1000000L) }.toMap
    (1 to 10).foreach { _ =>
      val r = rank
      rank = adj.map { case (v, ns) =>
        val s = ns.map(u => r(u) / deg(u)).sum
        (v, 150000L + (850000L * s) / 1000000L)
      }.toMap
    }
    assert(got.keySet === rank.keySet)
    got.foreach { case (v, g) => assert(g === rank(v), s"vid=$v") }

    // and a second distributed run reproduces it exactly
    val again = GraphQueries.pagerankDeterministic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again === got)
  }
}
