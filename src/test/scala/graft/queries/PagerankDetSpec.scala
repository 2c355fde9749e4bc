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

  private def adjOf(edges: Array[(Long, Long)]): Map[Long, Seq[Long]] =
    edges.groupBy(_._1).map { case (v, es) => (v, es.map(_._2).toSeq) }

  test("deterministic eigencentrality equals the sequential recurrence bit-for-bit") {
    val got = GraphQueries.eigenCentralityDeterministic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = GraphQueries.symmetrizedEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = adjOf(edges)
    var x: Map[Long, Long] = adj.map { case (v, _) => (v, 1000000L) }
    (1 to 12).foreach { _ =>
      val s = adj.map { case (v, ns) => (v, x(v) + ns.map(x).sum) }
      val mx = s.values.max
      x = s.map { case (v, sv) => (v, sv * 1000000L / mx) }
    }
    assert(got === x)
    // the argmax vertex sits at exactly one million
    assert(got.values.max === 1000000L)
  }

  test("mulDiv: exact where a raw 64-bit multiply would wrap") {
    import graft.graph.GraphAlgs.mulDiv
    // fast path: bit-identical to the plain formula
    assert(mulDiv(7L, 850000L, 1000000L) === (7L * 850000L) / 1000000L)
    assert(mulDiv(0L, 850000L, 1000000L) === 0L)
    // the pagerank hub-sum regime the raw multiply corrupted:
    // s = 2e13 -> 850000 * s = 1.7e19 wraps negative in 64 bits
    assert(20000000000000L * 850000L < 0L) // the old bug, pinned
    assert(mulDiv(20000000000000L, 850000L, 1000000L) === 17000000000000L)
    // the eigencentrality normalization regime (v * 1e6 wraps past
    // hub degree ~9.2e6): exact quotient via the 128-bit path
    assert(mulDiv(10000000000000L, 1000000L, 3L) === 3333333333333333333L)
    // randomized agreement with BigInteger on both paths
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = math.abs(rnd.nextLong()) % 100000000000000L
      val b = if (rnd.nextBoolean()) 850000L else 1000000L
      val d = 1L + math.abs(rnd.nextLong()) % 10000000L
      val exact = java.math.BigInteger.valueOf(a)
        .multiply(java.math.BigInteger.valueOf(b))
        .divide(java.math.BigInteger.valueOf(d)).longValueExact()
      assert(mulDiv(a, b, d) === exact, s"a=$a b=$b d=$d")
    }
  }

  test("deterministic personalized pagerank equals the sequential recurrence") {
    val got = GraphQueries.pprDeterministic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val seeds = GraphQueries.bfsSources(spark, sf).toSet
    val edges = GraphQueries.symmetrizedEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = adjOf(edges)
    val deg = adj.map { case (v, ns) => (v, ns.length.toLong) }
    var rank: Map[Long, Long] = adj.map { case (v, _) =>
      (v, if (seeds(v)) 1000000L else 0L) }
    (1 to 10).foreach { _ =>
      val r = rank
      rank = adj.map { case (v, ns) =>
        val s = ns.map(u => r(u) / deg(u)).sum
        (v, (if (seeds(v)) 150000L else 0L) + (850000L * s) / 1000000L)
      }
    }
    assert(got === rank)
    // restart mass is concentrated: every seed outranks the median
    val med = got.values.toSeq.sorted.apply(got.size / 2)
    seeds.foreach(s => assert(got(s) >= med))
  }

  test("deterministic label propagation equals the sequential recurrence") {
    val got = GraphQueries.labelPropagationDeterministic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = GraphQueries.symmetrizedEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = adjOf(edges)
    var lab: Map[Long, Long] = adj.map { case (v, _) => (v, v) }
    (1 to 4).foreach { _ =>
      lab = adj.map { case (v, ns) =>
        val byLabel = ns.map(lab).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        // most frequent, smallest label on ties — the total order
        val best = byLabel.toSeq.minBy { case (l, c) => (-c, l) }._1
        (v, best)
      }
    }
    assert(got === lab)
  }
}
