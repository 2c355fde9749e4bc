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

  /** Reference `DistributedWCC.scala:226-228`. */
  private def highestCenterNeighbor(nbors: Map[Long, NborMsg]): Option[NborMsg] = {
    var best: NborMsg = null
    val it = nbors.valuesIterator
    while (it.hasNext) {
      val m = it.next()
      if (m.isCenter && (best == null || ord.gt(m, best))) best = m
    }
    Option(best)
  }

  /** One vertex-program step for a vertex that received messages
   * (reference `DistributedWCC.scala:169-207`). */
  private[wcc] def vprog(st: PState, messages: Map[Long, NborMsg]): PState = {
    val self = st.data
    // refresh cached neighbor communities (`:181-185,230-235`)
    val nbors: Map[Long, NborMsg] =
      if (st.neighbors.isEmpty) messages - self.vId
      else st.neighbors.map { case (id, cached) =>
        id -> messages.getOrElse(id, cached)
      }
    val highest = highestCenterNeighbor(nbors)
    if (highest.isDefined && ord.gt(highest.get, NborMsg.of(self))) {
      // adopt the best center neighbor (`:190-194`)
      PState(self.copy(cId = highest.get.vId), changed = self.isCenter, nbors)
    } else {
      // become (stay) own center (`:195-198`)
      PState(self.copy(cId = self.vId), changed = !self.isCenter, nbors)
    }
  }

  def run(pruned: Graph[VertexData, Int], maxIterations: Int = 50): Graph[VertexData, Int] = {
    var g: Graph[PState, Int] = pruned
      .mapVertices((_, vd) => PState(vd, changed = true, Map.empty))
      .cache()

    // Superstep 1: every vertex broadcasts itself to all neighbors
    // (`DistributedWCC.scala:161-166`).
    var msgs: VertexRDD[Map[Long, NborMsg]] = g.aggregateMessages(
      ctx => {
        ctx.sendToDst(Map(ctx.srcId -> NborMsg.of(ctx.srcAttr.data)))
        ctx.sendToSrc(Map(ctx.dstId -> NborMsg.of(ctx.dstAttr.data)))
      },
      (a: Map[Long, NborMsg], b: Map[Long, NborMsg]) => a ++ b)
    msgs.cache()

    var activeMessages = msgs.count()
    var i = 1
    while (activeMessages > 0 && i < maxIterations) {
      val prevG = g
      val prevMsgs = msgs
      // apply vprog to receivers; clear the consumed send-gate on
      // non-receivers so a vertex only sends in the superstep it ran.
      g = g.outerJoinVertices(msgs) { (_, st, m) =>
        m match {
          case Some(mm) => vprog(st, mm)
          case None     => if (st.changed) st.copy(changed = false) else st
        }
      }.cache()

      // send phase (`DistributedWCC.scala:210-218`): a changed vertex
      // sends its state to every strictly lower-ranked neighbor. The
      // rank comparison uses immutable (cc, vt, vId), so evaluating it
      // on live triplet attrs equals the reference's cached-message
      // comparison.
      msgs = g.aggregateMessages[Map[Long, NborMsg]](
        ctx => {
          val sm = NborMsg.of(ctx.srcAttr.data)
          val dm = NborMsg.of(ctx.dstAttr.data)
          if (ctx.srcAttr.changed && ord.gt(sm, dm))
            ctx.sendToDst(Map(ctx.srcId -> sm))
          if (ctx.dstAttr.changed && ord.gt(dm, sm))
            ctx.sendToSrc(Map(ctx.dstId -> dm))
        },
        (a, b) => a ++ b)
      msgs.cache()
      activeMessages = msgs.count()

      prevMsgs.unpersist(blocking = false)
      prevG.unpersistVertices(blocking = false)
      prevG.edges.unpersist(blocking = false)
      i += 1
    }
    msgs.unpersist(blocking = false)
    val out = g.mapVertices((_, st) => st.data)
    out.cache()
    out.vertices.count()
    g.unpersistVertices(blocking = false)
    out
  }
}
