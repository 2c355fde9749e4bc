package graft.wcc

import org.apache.spark.graphx._
import org.apache.spark.storage.StorageLevel

/**
 * Clustering-coefficient-seeded initial partition (G4 in SURVEY.md
 * §2.8): a Pregel loop in which every vertex repeatedly adopts the
 * highest-ranked *center* neighbor by the total order (cc, vt, vId),
 * or reverts to being its own center.
 *
 * Semantics contract: the reference's
 * `InitialPartitionComputeFunction` / `InitialPartitionCombiner`
 * (`DistributedWCC.scala:159-255`, duplicated at
 * `IncrementalWCC.scala:233-329`), with two no-op mechanics dropped
 * (documented in SURVEY.md §7.1 quirk ledger):
 *
 *  - self-messages (`DistributedWCC.scala:215`): the only receiver
 *    effect is the "single message from self" no-op branch
 *    (`:178-179`), which changes no state and sends nothing;
 *  - keep-alive re-broadcasts from message-less vertices (the Flink
 *    coGroup invokes compute with an empty iterator →
 *    `newData.changed = true`, `:203-205`): the re-sent payload is
 *    decision-irrelevant — receivers only consult a cached
 *    neighbor's (cc, vt, vId) (immutable during the loop) and its
 *    center-ness, and every center-ness transition is already sent
 *    by the normal path because `changed` is exactly the
 *    center-transition flag (`:192,196`).
 *
 * Both drops leave the fixpoint identical while letting the loop
 * terminate on true message quiescence instead of always burning
 * maxIterations supersteps.
 *
 * Messages are Map[senderId -> NborMsg]; a target receives at most
 * one message per sender per superstep, so the map-union combine
 * (`DistributedWCC.scala:243-255`) is collision-free and
 * deterministic.
 */
object InitialPartition {

  private val ord = NborMsg.ordering

  /** One vertex-program step for a vertex that received messages
   * (reference `DistributedWCC.scala:169-207`). The neighbor cache
   * is the compact [[NborCache]]: a message can only flip its
   * sender's center flag ((cc, vt, id) are immutable during the
   * loop), and the flag array is copy-on-write so superseded state
   * generations are never mutated. */
  private[wcc] def vprog(st: PState, messages: Map[Long, NborMsg]): PState = {
    val self = st.data
    // refresh cached neighbor communities (`:181-185,230-235`)
    val cache: NborCache =
      if (st.neighbors.isEmpty) {
        val entries = (messages - self.vId).toArray.sortBy(_._1)
        NborCache(entries.map(_._1), entries.map(_._2.vt),
          entries.map(_._2.cc), entries.map(_._2.isCenter))
      } else {
        val c = st.neighbors
        var center = c.center
        var copied = false
        messages.foreach { case (id, m) =>
          val idx = java.util.Arrays.binarySearch(c.ids, id)
          if (idx >= 0 && center(idx) != m.isCenter) {
            if (!copied) { center = center.clone(); copied = true }
            center(idx) = m.isCenter
          }
        }
        if (copied) NborCache(c.ids, c.vts, c.ccs, center) else c
      }
    // highest center neighbor (`:226-228`) — same (cc, vt, vId) order
    var best: NborMsg = null
    var i = 0
    while (i < cache.ids.length) {
      if (cache.center(i)) {
        val m = NborMsg(cache.ids(i), cache.vts(i), cache.ccs(i), cache.ids(i))
        if (best == null || ord.gt(m, best)) best = m
      }
      i += 1
    }
    if (best != null && ord.gt(best, NborMsg.of(self))) {
      // adopt the best center neighbor (`:190-194`)
      PState(self.copy(cId = best.vId), changed = self.isCenter, cache)
    } else {
      // become (stay) own center (`:195-198`)
      PState(self.copy(cId = self.vId), changed = !self.isCenter, cache)
    }
  }

  def run(pruned: Graph[VertexData, Int], maxIterations: Int = 50): Graph[VertexData, Int] = {
    // The graph shipped to edge partitions carries only the lean
    // (VertexData, changed) pair; the per-vertex neighbor caches
    // (degree-sized maps) stay in a vertex-side VertexRDD and never
    // cross the vertex->edge replication boundary — shipping them made
    // each superstep ~20x more expensive on dense graphs.
    var lean: Graph[(VertexData, Boolean), Int] =
      pruned.mapVertices((_, vd) => (vd, true)).cache()
    // full Pregel state (incl. neighbor caches), vertex-side only
    var state: VertexRDD[PState] =
      lean.vertices.mapValues((v: (VertexData, Boolean)) =>
        PState(v._1, changed = true, NborCache.empty)).cache()

    // Superstep 1: every vertex broadcasts itself to all neighbors
    // (`DistributedWCC.scala:161-166`).
    var msgs: VertexRDD[Map[Long, NborMsg]] = lean.aggregateMessages(
      ctx => {
        ctx.sendToDst(Map(ctx.srcId -> NborMsg.of(ctx.srcAttr._1)))
        ctx.sendToSrc(Map(ctx.dstId -> NborMsg.of(ctx.dstAttr._1)))
      },
      (a: Map[Long, NborMsg], b: Map[Long, NborMsg]) => a ++ b)
    msgs.cache()

    var activeMessages = msgs.count()
    var i = 1
    while (activeMessages > 0 && i < maxIterations) {
      val prevLean = lean
      val prevState = state
      val prevMsgs = msgs

      // vprog vertex-side: receivers update state+cache; the consumed
      // send-gate clears on non-receivers so a vertex only sends in
      // the superstep it ran.
      state = state.leftJoin(msgs) { (_, st, mOpt) =>
        mOpt match {
          case Some(m) => vprog(st, m)
          case None    => if (st.changed) st.copy(changed = false) else st
        }
      }.cache()

      lean = prevLean.outerJoinVertices(state) { (_, old, p) =>
        p.map(s => (s.data, s.changed)).getOrElse(old)
      }.cache()

      // send phase (`DistributedWCC.scala:210-218`): a changed vertex
      // sends its state to every strictly lower-ranked neighbor. The
      // rank comparison uses immutable (cc, vt, vId), so evaluating it
      // on live triplet attrs equals the reference's cached-message
      // comparison. Senders necessarily received messages this
      // superstep (non-receivers have their send-gate cleared), so
      // restricting the scan to the receivers' active set skips
      // quiescent edge partitions with identical output.
      msgs = org.apache.spark.graphx.GraftGraphShims
        .aggregateMessagesWithActiveSet[(VertexData, Boolean), Int, Map[Long, NborMsg]](
          lean,
          ctx => {
            val (sd, sc) = ctx.srcAttr
            val (dd, dc) = ctx.dstAttr
            if (sc || dc) {
              val sm = NborMsg.of(sd)
              val dm = NborMsg.of(dd)
              if (sc && ord.gt(sm, dm)) ctx.sendToDst(Map(ctx.srcId -> sm))
              if (dc && ord.gt(dm, sm)) ctx.sendToSrc(Map(ctx.dstId -> dm))
            }
          },
          (a, b) => a ++ b,
          org.apache.spark.graphx.TripletFields.All,
          prevMsgs)
      msgs.cache()
      // materializes msgs, the new lean vertices, and (as lean's
      // lineage parent) the new state before the previous generation
      // is dropped
      activeMessages = msgs.count()

      prevMsgs.unpersist(blocking = false)
      prevState.unpersist(blocking = false)
      prevLean.unpersistVertices(blocking = false)
      prevLean.edges.unpersist(blocking = false)
      i += 1
    }
    System.err.println(s"[graft-wcc] initial-partition supersteps: $i")
    msgs.unpersist(blocking = false)
    val out = lean.mapVertices((_, st) => st._1)
    out.cache()
    // force vertices AND edges so the final lean generation (whose
    // edge partitions `out` derives from) can be fully dropped
    out.vertices.count()
    out.edges.count()
    lean.unpersistVertices(blocking = false)
    lean.edges.unpersist(blocking = false)
    state.unpersist(blocking = false)
    out
  }
}
