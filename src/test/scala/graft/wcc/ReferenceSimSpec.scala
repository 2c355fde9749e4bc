package graft.wcc

import graft.SparkSpec
import graft.graph.EdgeOps
import scala.collection.mutable

/**
 * Parity evidence for the initial-partition translation: a
 * sequential, DIRECT simulation of the reference's Gelly
 * vertex-centric iteration (`DistributedWCC.scala:159-255`) —
 * INCLUDING the two mechanics the distributed port drops as no-ops
 * (self-messages, and the empty-mailbox keep-alive re-broadcasts
 * that arise because Flink's coGroup invokes compute for every
 * vertex each superstep). If the port's fixpoint equals the
 * simulator's on a real graph, the no-op argument holds empirically.
 */
object ReferenceSim {

  final case class Msg(vId: Long, vt: Int, cc: Double, cId: Long) {
    def isCenter: Boolean = vId == cId
  }
  private val ord: Ordering[Msg] = Ordering.by(m => (m.cc, m.vt, m.vId))

  final class V(val vId: Long, val t: Int, val vt: Int) {
    var cId: Long = vId
    var changed: Boolean = false
    var neighbors: mutable.LinkedHashMap[Long, Msg] = mutable.LinkedHashMap.empty
    def cc: Double = if (vt < 2) 0.0 else 2.0 * t / (vt.toLong * (vt - 1))
    def snapshot: Msg = Msg(vId, vt, cc, cId)
    def isCenter: Boolean = vId == cId
  }

  /** Run the reference's semantics for maxIterations supersteps.
   * adj: pruned-graph adjacency; stats: vId -> (t, vt). */
  def initialPartition(adj: Map[Long, Seq[Long]], stats: Map[Long, (Int, Int)],
      maxIterations: Int = 50): Map[Long, Long] = {
    val verts = stats.map { case (id, (t, vt)) => id -> new V(id, t, vt) }
    // mailbox(target) = combined map keyed by sender (`:243-255`)
    var mailbox = Map.empty[Long, Map[Long, Msg]]

    for (superstep <- 1 to maxIterations) {
      val outbox = mutable.Map.empty[Long, mutable.Map[Long, Msg]]
      def send(target: Long, m: Msg): Unit =
        outbox.getOrElseUpdate(target, mutable.Map.empty).update(m.vId, m)

      verts.values.foreach { v =>
        if (superstep == 1) {
          // (`:161-166`)
          v.changed = true
          adj(v.vId).foreach(n => send(n, v.snapshot))
        } else {
          val messages = mailbox.getOrElse(v.vId, Map.empty)
          if (messages.nonEmpty) {
            v.changed = false
            if (messages.size == 1 && messages.head._2.vId == v.vId) {
              // only the self-message: do nothing (`:178-179`)
            } else {
              if (v.neighbors.isEmpty) {
                // (`:181-183`)
                (messages - v.vId).foreach { case (id, m) => v.neighbors.update(id, m) }
              } else {
                // refresh cached communities (`:230-235`)
                v.neighbors.mapValuesInPlace { (id, cached) =>
                  messages.get(id).map(m => cached.copy(cId = m.cId)).getOrElse(cached)
                }
              }
              val highest = v.neighbors.values.filter(_.isCenter)
                .reduceOption((a, b) => ord.max(a, b))
              if (highest.isDefined && ord.gt(highest.get, v.snapshot)) {
                v.changed = v.isCenter // evaluated on the OLD cId (`:192`)
                v.cId = highest.get.vId
              } else {
                v.changed = !v.isCenter
                v.cId = v.vId
              }
            }
          } else {
            // Flink coGroup invokes compute with an empty iterator:
            // the keep-alive branch (`:203-205`)
            v.changed = true
          }
          // send phase incl. self-messages (`:210-218`)
          val cur = v.snapshot
          if (v.changed) {
            v.neighbors.values.foreach { nb =>
              if (ord.gt(cur, nb)) {
                send(nb.vId, cur)
                send(v.vId, cur)
              }
            }
          }
        }
      }
      mailbox = outbox.map { case (k, m) => k -> m.toMap }.toMap
      if (mailbox.isEmpty && superstep > 1) return verts.map { case (id, v) => id -> v.cId }
    }
    verts.map { case (id, v) => id -> v.cId }
  }
}

class ReferenceSimSpec extends SparkSpec {

  test("distributed initial partition matches the faithful reference simulation (email-Eu-core)") {
    val raw = EdgeOps.loadCsvEdges(spark, "/root/reference/test_graph.csv")
    val g = EdgeOps.toGraph(EdgeOps.canonicalize(raw))
    val tri = TriangleStats.run(g)

    // pruned-graph adjacency + stats for the simulator
    val adjPairs = tri.pruned.edges.collect()
      .flatMap(e => Seq((e.srcId, e.dstId), (e.dstId, e.srcId)))
    val adj: Map[Long, Seq[Long]] = adjPairs.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSeq }
    val stats: Map[Long, (Int, Int)] = tri.pruned.vertices.collect()
      .map { case (id, vd) => id -> (vd.t, vd.vt) }.toMap

    val simulated = ReferenceSim.initialPartition(adj, stats)
    val distributed = InitialPartition.run(tri.pruned)
      .vertices.collect().map { case (id, vd) => id -> vd.cId }.toMap

    assert(distributed.size === simulated.size)
    val diffs = distributed.keys.filter(k => distributed(k) != simulated(k)).toSeq.sorted
    assert(diffs.isEmpty,
      s"${diffs.size} vertices diverge from the reference simulation, first 10: ${diffs.take(10)}")
  }

  test("simulation parity on micro-graphs too") {
    import GraphFixtures._
    val cases = Seq(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L)),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
        (5L, 6L), (6L, 7L), (5L, 7L), (2L, 6L)))
    cases.foreach { edges =>
      val tri = TriangleStats.run(graphOf(spark, edges))
      val adj = tri.pruned.edges.collect()
        .flatMap(e => Seq((e.srcId, e.dstId), (e.dstId, e.srcId)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
      val stats = tri.pruned.vertices.collect()
        .map { case (id, vd) => id -> (vd.t, vd.vt) }.toMap
      val simulated = ReferenceSim.initialPartition(adj, stats)
      val distributed = InitialPartition.run(tri.pruned)
        .vertices.collect().map { case (id, vd) => id -> vd.cId }.toMap
      assert(distributed === simulated, s"divergence on $edges")
    }
  }
}
