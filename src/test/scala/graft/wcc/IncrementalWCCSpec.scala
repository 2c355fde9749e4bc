package graft.wcc

import graft.SparkSpec
import graft.graph.EdgeOps
import org.apache.spark.graphx.{Edge, Graph}

class IncrementalWCCSpec extends SparkSpec {
  import GraphFixtures._

  test("merge classifies border vs new and updates triangle deltas") {
    // bulk: triangle {1,2,3}; batch adds triangle {3,4,5} -> 3 is
    // border, 4 and 5 are new
    val bulk = graphOf(spark, Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val state = IncrementalWCC.prepare(bulk)
    val newEdges = spark.sparkContext.parallelize(Seq(
      Edge(3L, 4L, 1), Edge(4L, 5L, 1), Edge(3L, 5L, 1)))
    val m = IncrementalWCC.merge(state, newEdges)
    assert(m.borderIds.value === Set(3L))
    assert(m.newIds.value === Set(4L, 5L))
    assert(m.vertexCount === 5L)
    val verts = m.fullGraph.vertices.collect().toMap
    // new vertices 4,5: one new triangle each
    assert(verts(4L).t === 1)
    assert(verts(5L).t === 1)
    // border vertex 3: delta-adds the new triangle to its STATE count,
    // which the bulk graft-back ZEROED — 3 is the bulk triangle's
    // center (highest (cc, vt, vId) rank), and the reference's
    // conditional graft (`DistributedWCC.scala:68-77`) resets
    // self-labeled vertices to (t=0, vt=0). So 0 + 1, not 1 + 1.
    assert(verts(3L).t === 1)
    assert(verts(3L).vt === 2)
    // untouched non-center vertices keep their true data (cId = 3)
    assert(verts(1L).t === 1)
    assert(verts(2L).t === 1)
  }

  test("run returns previous vertex universe with updated communities") {
    val bulk = graphOf(spark, Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val state = IncrementalWCC.prepare(bulk)
    val newEdges = spark.sparkContext.parallelize(Seq(
      Edge(3L, 4L, 1), Edge(4L, 5L, 1), Edge(3L, 5L, 1)))
    val out = IncrementalWCC.run(state, newEdges)
    // reference quirk: grafted onto the PREVIOUS graph's vertex set
    assert(out.graph.vertices.collect().map(_._1).toSet === Set(1L, 2L, 3L))
    // reference quirk: returns the stale incoming stats
    assert(out.stats === state.stats)
  }

  test("testStream on email-Eu-core: full driver loop terminates with sane output") {
    val raw = EdgeOps.loadCsvEdges(spark, "/root/reference/test_graph.csv")
    val canon = EdgeOps.canonicalize(raw)
    val result = IncrementalWCC.testStream(spark, canon, 0.8, 1)
    val rows = result.collect()
    // vertex universe = the bulk graph's vertices (both endpoints
    // below splitVertex), per the reference's graft-back quirk
    assert(rows.length > 0)
    // communities may be centered on merged-graph vertices OUTSIDE the
    // returned bulk universe (reference graft-back quirk) — every cid
    // is some vertex of the full canonical graph
    val allIds = canon.select("src").union(canon.select("dst"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => allIds.contains(r.getLong(1))))
    // deterministic across runs
    val again = IncrementalWCC.testStream(spark, canon, 0.8, 1).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("testStream with derived bulk stats equals the from-scratch replay") {
    val raw = EdgeOps.loadCsvEdges(spark, "/root/reference/test_graph.csv")
    val canon = EdgeOps.canonicalize(raw)
    val plain = IncrementalWCC.testStream(spark, canon, 0.8, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adj = graft.graph.GraphAlgs.weightedAdjacency(EdgeOps.symmetrize(canon))
    val derived = IncrementalWCC.testStream(spark, canon, 0.8, 1,
      bulkStatsFor = Some(split =>
        TriangleStats.restrictedResult(adj, canon, split))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(derived === plain)
  }

  test("delta triangle flags equal the from-scratch merged-graph support flags") {
    // email-Eu-core, reference split: bulk = both endpoints < 0.8*maxId
    val raw = EdgeOps.loadCsvEdges(spark, "/root/reference/test_graph.csv")
    val canon = EdgeOps.canonicalize(raw)
    val maxVertex = canon.selectExpr("max(greatest(src, dst))").head().getLong(0)
    val split = math.floor(maxVertex * 0.8)
    val bulkEdges = canon.where(s"src < $split and dst < $split").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val batchRdd = canon.where(s"src >= $split or dst >= $split").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val state = IncrementalWCC.prepare(
      Graph.fromEdges(bulkEdges, 0)
        .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D))
    assert(state.bulkFlagged.isDefined)
    val m = IncrementalWCC.merge(state, batchRdd)
    val fromScratch = TriangleStats.edgeSupport(m.fullGraph)
      .filter(_._2 > 0).map(_._1).collect().toSet
    val incremental = state.bulkFlagged.get
      .union(IncrementalWCC.deltaFlags(batchRdd, m.touchedNbrs))
      .distinct().collect().toSet
    assert(incremental === fromScratch)
  }

  test("run with bulkFlagged emits the same labels as the from-scratch path") {
    val raw = EdgeOps.loadCsvEdges(spark, "/root/reference/test_graph.csv")
    val canon = EdgeOps.canonicalize(raw)
    val maxVertex = canon.selectExpr("max(greatest(src, dst))").head().getLong(0)
    val split = math.floor(maxVertex * 0.8)
    val bulkEdges = canon.where(s"src < $split and dst < $split").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val batchRdd = canon.where(s"src >= $split or dst >= $split").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val state = IncrementalWCC.prepare(
      Graph.fromEdges(bulkEdges, 0)
        .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D))
    // force the delta path regardless of the adaptive touched-fraction
    // crossover (this fixture's 0.8-split batch is far from micro)
    val fast = IncrementalWCC.run(state, batchRdd, releaseInput = false,
      deltaFlagMaxTouchedFraction = 1.0)
      .graph.vertices.map { case (id, vd) => (id, vd.cId) }.collect().sorted.toSeq
    val slow = IncrementalWCC.run(state.copy(bulkFlagged = None), batchRdd,
      releaseInput = false)
      .graph.vertices.map { case (id, vd) => (id, vd.cId) }.collect().sorted.toSeq
    assert(fast === slow)
  }

  test("testStream with multiple micro-batches runs the full replay loop") {
    val raw = EdgeOps.loadCsvEdges(spark, "/root/reference/test_graph.csv")
    val canon = EdgeOps.canonicalize(raw)
    val result = IncrementalWCC.testStream(spark, canon, 0.8, 3).collect()
    assert(result.length > 0)
    // same bulk universe as the single-batch variant (graft-back quirk)
    val single = IncrementalWCC.testStream(spark, canon, 0.8, 1).collect()
    assert(result.map(_.getLong(0)).toSet === single.map(_.getLong(0)).toSet)
  }
}
