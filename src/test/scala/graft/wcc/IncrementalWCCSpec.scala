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
    // force the delta path regardless of the adaptive volume
    // crossover (this fixture's 0.8-split batch is far from micro)
    val fast = IncrementalWCC.run(state, batchRdd, releaseInput = false,
      deltaFlagMaxVolumeFraction = Double.PositiveInfinity)
      .graph.vertices.map { case (id, vd) => (id, vd.cId) }.collect().sorted.toSeq
    val slow = IncrementalWCC.run(state.copy(bulkFlagged = None), batchRdd,
      releaseInput = false)
      .graph.vertices.map { case (id, vd) => (id, vd.cId) }.collect().sorted.toSeq
    assert(fast === slow)
  }

  test("deltaVolume prices each batch edge at the sum of its endpoint degrees") {
    // star: hub 0 - {1..200}, plus triangle edge (1,2) for nonzero stats
    val bulkEdges = (1L to 200L).map(i => (0L, i)) :+ (1L, 2L)
    val state = IncrementalWCC.prepare(graphOf(spark, bulkEdges))
    // batch: 5 new leaves on the hub — merged deg(0) = 205, deg(new) = 1
    val batch = spark.sparkContext.parallelize(
      (201L to 205L).map(i => Edge(0L, i, 1)))
    val m = IncrementalWCC.merge(state, batch)
    // hub endpoint: 5 incident batch edges x degree 205; each new
    // leaf: 1 incident batch edge x degree 1
    assert(IncrementalWCC.deltaVolume(batch, m.touchedNbrs) === 5L * 205L + 5L)
  }

  test("volume gate falls back on a hub-heavy batch that a count gate would pass") {
    val bulkEdges = (1L to 200L).map(i => (0L, i)) :+ (1L, 2L)
    val state = IncrementalWCC.prepare(graphOf(spark, bulkEdges))
    // 6 touched vertices of 206 (~3% — far under any count gate), but
    // the delta join would ship the hub's 205-length neighborhood per
    // batch edge (volume 1030 vs gate 2 * 206 * 0.1 = 41.2): the
    // volume gate must take the from-scratch exchange, which
    // expectDeltaPath surfaces loudly (ADVICE hub-skew hazard)
    val batch = spark.sparkContext.parallelize(
      (201L to 205L).map(i => Edge(0L, i, 1)))
    val e = intercept[IllegalArgumentException] {
      IncrementalWCC.run(state, batch, releaseInput = false,
        expectDeltaPath = true)
    }
    assert(e.getMessage.contains("expectDeltaPath"))
    // a genuinely light batch on the same state passes the gate:
    // one leaf-leaf edge ships degree-3 + degree-1 neighborhoods
    val light = spark.sparkContext.parallelize(Seq(Edge(1L, 201L, 1)))
    val out = IncrementalWCC.run(state, light, releaseInput = false,
      expectDeltaPath = true)
    assert(out.graph.vertices.count() > 0)
  }

  test("driver-side precheck skips the volume probe for non-micro batches, keeps it for micro ones") {
    // ADVICE r15: the whole-region streaming fold paid a distributed
    // probe join just to decide to fall back. The precheck's 2x
    // batch-edge lower bound settles obviously-large batches on the
    // driver: 60% of edges arriving can never fit a 10% volume budget
    assert(!IncrementalWCC.deltaPrecheck(totalEdges = 1000L,
      batchEdges = 600L, fraction = 0.1))
    // a genuinely micro batch passes the precheck — the exact volume
    // probe (which prices hub skew the count bound cannot see) then
    // decides, exactly as before
    assert(IncrementalWCC.deltaPrecheck(totalEdges = 1000L,
      batchEdges = 50L, fraction = 0.1))
    // boundary: the bound equals the budget — probe still runs (<=)
    assert(IncrementalWCC.deltaPrecheck(totalEdges = 1000L,
      batchEdges = 100L, fraction = 0.1))
    // end-to-end: a batch past the precheck bound falls back loudly
    // under expectDeltaPath, same observable contract as the hub case
    val bulkEdges = (1L to 200L).map(i => (0L, i)) :+ (1L, 2L)
    val state = IncrementalWCC.prepare(graphOf(spark, bulkEdges))
    val bigBatch = spark.sparkContext.parallelize(
      (1L to 150L).map(i => Edge(300L + i, 600L + i, 1)))
    val e = intercept[IllegalArgumentException] {
      IncrementalWCC.run(state, bigBatch, releaseInput = false,
        expectDeltaPath = true)
    }
    assert(e.getMessage.contains("expectDeltaPath"))
  }

  test("testStream fails LOUDLY on an empty canonical edge set") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      IncrementalWCC.testStream(spark, Seq.empty[(Long, Long)].toDF("src", "dst"))
    }
    assert(e.getMessage.contains("empty canonical edge set"))
  }

  test("post-merge phase failures release every cached surface (ADVICE r16)") {
    // inject a failure after each post-merge phase and assert the
    // catch drops EVERYTHING run() materialized — initial partition,
    // refined graph and graft-back result included, not just the
    // merge's own caches (the leak class ADVICE r16 flagged)
    val bulk = graphOf(spark, Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val state = IncrementalWCC.prepare(bulk)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    for (phase <- Seq("initial-partition", "refine", "graft")) {
      IncrementalWCC.testFailAfter = Some(phase)
      try {
        val newEdges = spark.sparkContext.parallelize(Seq(
          Edge(3L, 4L, 1), Edge(4L, 5L, 1), Edge(3L, 5L, 1)))
        val e = intercept[RuntimeException] {
          IncrementalWCC.run(state, newEdges, releaseInput = false)
        }
        assert(e.getMessage.contains(phase))
      } finally IncrementalWCC.testFailAfter = None
      val leaked = spark.sparkContext.getPersistentRDDs.view
        .filterKeys(!before.contains(_)).toMap
      assert(leaked.isEmpty,
        s"'$phase' failure leaked persisted RDDs: " +
          leaked.map { case (id, r) => s"$id=$r" }.mkString("; "))
    }
    // seam off: the same state still runs clean end to end
    val out = IncrementalWCC.run(state, spark.sparkContext.parallelize(Seq(
      Edge(3L, 4L, 1), Edge(4L, 5L, 1), Edge(3L, 5L, 1))), releaseInput = false)
    assert(out.graph.vertices.collect().map(_._1).toSet === Set(1L, 2L, 3L))
    out.graph.unpersistVertices(blocking = false)
    out.graph.edges.unpersist(blocking = false)
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
