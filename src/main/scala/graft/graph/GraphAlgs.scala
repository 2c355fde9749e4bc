package graft.graph

import org.apache.spark.graphx._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph algorithms beyond the reference's WCC pipeline, expressed
 * over the same canonical-edge (src < dst, stored once) graphs that
 * `EdgeOps.toGraph` builds. Undirected semantics come from
 * both-direction messaging, not doubled edges (see EdgeOps scale
 * notes).
 */
/** Delta message for the incremental k-core rounds: parallel
 * (old, new) neighbor-estimate arrays, merged in place with doubling
 * growth (O(deg) total per hub combine tree — in-place doubling
 * growth, never an array-concat merge). A receiver applies each pair to its persistent
 * histogram: bucket(min(old, deg)) -= 1, bucket(min(new, deg)) += 1. */
final class CoreDelta(o: Int, n: Int) extends Serializable {
  var olds: Array[Int] = { val a = new Array[Int](4); a(0) = o; a }
  var news: Array[Int] = { val a = new Array[Int](4); a(0) = n; a }
  var size: Int = 1

  private def ensure(extra: Int): Unit = {
    if (size + extra > olds.length) {
      val cap = math.max(size + extra, olds.length * 2)
      olds = java.util.Arrays.copyOf(olds, cap)
      news = java.util.Arrays.copyOf(news, cap)
    }
  }

  def add(o: Int, n: Int): CoreDelta = {
    ensure(1)
    olds(size) = o
    news(size) = n
    size += 1
    this
  }

  private[graph] def addAll(other: CoreDelta): CoreDelta = {
    ensure(other.size)
    System.arraycopy(other.olds, 0, olds, size, other.size)
    System.arraycopy(other.news, 0, news, size, other.size)
    size += other.size
    this
  }
}

object CoreDelta {
  def merge(a: CoreDelta, b: CoreDelta): CoreDelta =
    if (a.size >= b.size) a.addAll(b) else b.addAll(a)
}

/** Per-vertex k-core loop state: current estimate, the previous
 * round's estimate (`prev != est` is the send gate), and the
 * neighbor-estimate histogram clipped at the vertex's fixed degree
 * (`counts.length - 1`). The histogram is copy-on-write: rounds that
 * deliver no delta to a vertex reuse the same array reference. */
final case class CoreState(est: Int, prev: Int, counts: Array[Int])

object GraphAlgs {

  /**
   * BFS hop distances from `source` via Pregel: messages carry
   * candidate distances, vprog keeps the minimum; converges in
   * O(diameter) supersteps — only frontier vertices send messages,
   * so each superstep is a frontier-sized aggregateMessages, the
   * canonical scalable BFS on a partitioned graph.
   *
   * `maxHops` bounds the superstep count (and therefore the deepest
   * reported distance) so a pathological diameter cannot run away;
   * unreached vertices keep Long.MaxValue and are dropped by
   * [[bfsHopsDF]].
   */
  def bfsHops[V](g: Graph[V, Int], source: VertexId, maxHops: Int = 30): Graph[Long, Int] = {
    val init = g.mapVertices((id, _) => if (id == source) 0L else Long.MaxValue)
    init.pregel(Long.MaxValue, maxIterations = maxHops,
      activeDirection = EdgeDirection.Either)(
      (_, d, m) => math.min(d, m),
      t => {
        val fromSrc =
          if (t.srcAttr != Long.MaxValue && t.srcAttr + 1 < t.dstAttr)
            Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty
        val fromDst =
          if (t.dstAttr != Long.MaxValue && t.dstAttr + 1 < t.srcAttr)
            Iterator((t.srcId, t.dstAttr + 1)) else Iterator.empty
        fromSrc ++ fromDst
      },
      math.min)
  }

  /** (vid, hops) rows for vertices reached within maxHops.
   * The result is materialized (cached + counted) BEFORE the Pregel
   * surfaces are unpersisted — the DataFrame is lazy, so releasing
   * first would force a full lineage recompute at evaluation time. */
  def bfsHopsDF[V](g: Graph[V, Int], source: VertexId, maxHops: Int = 30): DataFrame = {
    val (state, release) = multiSourceBfsRDD(g, Array(source), maxHops)
    val rows = state.map { case (id, ds) => (id, ds(0).toLong) }
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(rows).toDF("vid", "hops").cache()
    df.count()
    release()
    df
  }

  /**
   * Frontier BFS from k sources on co-partitioned pair RDDs — the
   * same execution shape as the k-core loop: a per-partition
   * adjacency hash map is built once, and each round is ONE
   * frontier-sized shuffle job (vertices first reached last round
   * send a k-bit source mask to their neighbors; receivers set the
   * still-unset distances). Unweighted BFS sets each (vertex,
   * source) distance exactly once, so message volume tracks the
   * expanding wavefront, never |E| per round. Distances are
   * identical to the Pregel formulation (both compute hop-layer
   * fixpoints); only reached vertices appear in the result.
   *
   * Returns the persisted (vid, per-source hop distances) RDD
   * (Int.MaxValue = unreached) plus a release handle.
   */
  def multiSourceBfsRDD[V](g: Graph[V, Int], sources: Array[VertexId],
      maxHops: Int): (org.apache.spark.rdd.RDD[(Long, Array[Int])], () => Unit) = {
    require(sources.length <= 64, "source mask is a Long")
    val k = sources.length
    val INF = Int.MaxValue
    val sc = g.edges.sparkContext
    val nEdges = g.edges.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(g.edges.getNumPartitions, (2 * nEdges / 500000L).toInt)))
    val adjMap: org.apache.spark.rdd.RDD[java.util.HashMap[Long, Array[Long]]] =
      g.edges.flatMap(e => Iterator((e.srcId, e.dstId), (e.dstId, e.srcId)))
        .groupByKey(p).mapPartitions { it =>
          val m = new java.util.HashMap[Long, Array[Long]]()
          it.foreach(kv => m.put(kv._1, kv._2.toArray))
          Iterator.single(m)
        }.persist()
    adjMap.count()

    // state value: (per-source hops, mask of sources set LAST round)
    val src0: Seq[(Long, (Array[Int], Long))] = sources.zipWithIndex
      .groupBy(_._1).toSeq.map { case (id, ss) =>
        val a = Array.fill(k)(INF)
        var mask = 0L
        ss.foreach { case (_, i) => a(i) = 0; mask |= 1L << i }
        (id, (a, mask))
      }
    var state: org.apache.spark.rdd.RDD[(Long, (Array[Int], Long))] =
      sc.parallelize(src0).partitionBy(p).persist()

    var prevState: org.apache.spark.rdd.RDD[(Long, (Array[Int], Long))] = null
    var prevMsgs: org.apache.spark.rdd.RDD[(Long, Long)] = null
    var round = 0
    var quiescent = false
    while (!quiescent && round < maxHops) {
      val frontier = state.mapPartitions(
        _.collect { case (v, (_, m)) if m != 0L => (v, m) },
        preservesPartitioning = true)
      val msgs = frontier.zipPartitions(adjMap) { (fIt, mIt) =>
        val m = mIt.next()
        fIt.flatMap { case (v, mask) =>
          val nbrs = m.get(v)
          if (nbrs == null) Iterator.empty
          else nbrs.iterator.map(u => (u, mask))
        }
      }.reduceByKey(p, _ | _)
      msgs.persist()
      val n = msgs.count() // materializes `state` (its one consumer)
      if (prevState != null) prevState.unpersist(blocking = false)
      if (prevMsgs != null) prevMsgs.unpersist(blocking = false)
      if (n == 0) {
        quiescent = true
        msgs.unpersist(blocking = false)
      } else {
        round += 1
        val d = round
        prevState = state
        prevMsgs = msgs
        // both sides live under p, but the state GROWS (first-reached
        // vertices enter), so the merge streams the state against a
        // hashed message side and then drains the unmatched messages
        // as new entries — a zipPartitions full-outer without the
        // cogroup's re-buffering of every reached vertex per round.
        // The remainder iterator touches the map only after the
        // streamed side is exhausted (Iterator.++ is lazy), so the
        // removes during the first phase are safe.
        state = prevState.zipPartitions(msgs, preservesPartitioning = true) {
          (sIt, mIt) =>
            val mm = new java.util.HashMap[Long, java.lang.Long]()
            mIt.foreach(kv => mm.put(kv._1, kv._2))
            val updated = sIt.map { case (v, (a, _)) =>
              val boxed = mm.remove(v)
              if (boxed == null) (v, (a, 0L))
              else {
                val mask: Long = boxed.longValue
                var arr = a; var set = 0L; var copied = false
                var i = 0
                while (i < k) {
                  if (((mask >> i) & 1L) == 1L && arr(i) == INF) {
                    if (!copied) { arr = a.clone(); copied = true }
                    arr(i) = d; set |= 1L << i
                  }
                  i += 1
                }
                (v, (arr, set))
              }
            }
            val fresh = new scala.collection.AbstractIterator[(Long, (Array[Int], Long))] {
              private lazy val it = mm.entrySet().iterator()
              def hasNext: Boolean = it.hasNext
              def next(): (Long, (Array[Int], Long)) = {
                val e = it.next()
                val mask: Long = e.getValue
                val arr = Array.fill(k)(INF)
                var set = 0L
                var i = 0
                while (i < k) {
                  if (((mask >> i) & 1L) == 1L) { arr(i) = d; set |= 1L << i }
                  i += 1
                }
                (e.getKey, (arr, set))
              }
            }
            updated ++ fresh
        }.persist()
      }
    }
    state.count() // materialize the final generation
    if (prevState != null) prevState.unpersist(blocking = false)
    if (prevMsgs != null) prevMsgs.unpersist(blocking = false)

    val finalState = state
    val dists = state.mapValues(_._1)
    (dists, () => {
      finalState.unpersist(blocking = false)
      adjMap.unpersist(blocking = false)
    })
  }

  /**
   * Sampled bounded-horizon betweenness centrality (Brandes, "A
   * faster algorithm for betweenness centrality", J. Math. Sociol.
   * 2001, §4 accumulation; sampled-pivot form per Brandes/Pich 2007)
   * from the given source vertices, truncated at `maxHops` — the
   * same 5-root / 8-hop sampling contract the closeness and harmonic
   * rows use.
   *
   * Execution shape: a batched multi-source forward BFS that also
   * accumulates per-source shortest-path counts sigma (one
   * frontier-sized shuffle per hop, exactly like multiSourceBfsRDD —
   * sigma sums use Math.addExact, loud-or-exact on overflow), then
   * the Brandes dependency accumulation walked depth-by-depth
   * backwards (one frontier-sized shuffle per hop: depth-d vertices
   * send (sigma, delta) to their neighbors, depth-(d-1) receivers
   * fold their successor terms sigma_v/sigma_w * (1 + delta_w) in
   * ascending successor-id order — the deterministic-fold contract,
   * bit-identical to the oracle's list_reduce replay). State lives
   * on pair RDDs under one fixed HashPartitioner with the
   * generational persist/release discipline of the other loops here.
   *
   * Returns (vid, n_roots, bc) where bc folds the per-source
   * dependencies in ascending SOURCE-ID order over the (source,
   * vertex) pairs with hop distance >= 1 (a root never counts
   * itself); rows cover exactly the vertices with at least one such
   * pair.
   */
  def sampledBetweennessRDD[V](g: Graph[V, Int], sources: Array[VertexId],
      maxHops: Int): org.apache.spark.rdd.RDD[(Long, Long, Double)] = {
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    require(sources.length <= 64, "source set is a small sample")
    // probe-only phase timing (graft.betweenness.log=on or env
    // SPARK_GRAFT_BC_LOG=on): attributes the wall to the adjacency
    // build vs the forward sigma BFS vs the backward Brandes
    // accumulation — the per-phase split the 10x slope probe needs
    // (VERDICT r19 item 2)
    val logOn = sys.props.get("graft.betweenness.log")
      .orElse(sys.env.get("SPARK_GRAFT_BC_LOG")).contains("on")
    var tMark = System.nanoTime()
    def tlog(msg: => String): Unit = if (logOn) {
      val now = System.nanoTime()
      System.err.println(
        f"[graft-betweenness] $msg (${(now - tMark) / 1e9}%.2f s)")
      tMark = now
    }
    val k = sources.length
    val INF = Int.MaxValue
    val sc = g.edges.sparkContext
    val nEdges = g.edges.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(g.edges.getNumPartitions, (2 * nEdges / 500000L).toInt)))
    // neighbor order is irrelevant here: forward sigma sums are
    // order-free reduceByKey folds and the backward pass re-sorts
    // its terms per receiver — no O(Σ deg log deg) sort at build
    val adjMap: RDD[java.util.HashMap[Long, Array[Long]]] =
      g.edges.flatMap(e => Iterator((e.srcId, e.dstId), (e.dstId, e.srcId)))
        .groupByKey(p).mapPartitions { it =>
          val m = new java.util.HashMap[Long, Array[Long]]()
          it.foreach(kv => m.put(kv._1, kv._2.toArray))
          Iterator.single(m)
        }.persist(StorageLevel.MEMORY_AND_DISK)
    adjMap.count()
    tlog(s"adjacency built (|E|=$nEdges)")

    // ---- forward: dist + sigma, synchronous hop layers ----
    // state: vid -> (dist per source, sigma per source, lastMask)
    type FState = (Array[Int], Array[Long], Long)
    val src0: Seq[(Long, FState)] = sources.zipWithIndex
      .groupBy(_._1).toSeq.map { case (id, ss) =>
        val d = Array.fill(k)(INF); val s = Array.fill(k)(0L)
        var mask = 0L
        ss.foreach { case (_, i) => d(i) = 0; s(i) = 1L; mask |= 1L << i }
        (id, (d, s, mask))
      }
    var state: RDD[(Long, FState)] =
      sc.parallelize(src0).partitionBy(p).persist(StorageLevel.MEMORY_AND_DISK)
    var prevState: RDD[(Long, FState)] = null
    var prevMsgs: RDD[(Long, Array[Long])] = null
    var round = 0
    var quiescent = false
    while (!quiescent && round < maxHops) {
      val msgs = state.zipPartitions(adjMap, preservesPartitioning = false) {
        (sIt, mIt) =>
          val m = mIt.next()
          sIt.flatMap { case (v, (_, sig, mask)) =>
            if (mask == 0L) Iterator.empty
            else {
              val nbrs = m.get(v)
              if (nbrs == null) Iterator.empty
              else {
                val contrib = Array.tabulate(k)(i =>
                  if (((mask >> i) & 1L) == 1L) sig(i) else 0L)
                nbrs.iterator.map(u => (u, contrib))
              }
            }
          }
      }.reduceByKey(p, (a, b) => Array.tabulate(k)(i => Math.addExact(a(i), b(i))))
      msgs.persist(StorageLevel.MEMORY_AND_DISK)
      val n = msgs.count()
      if (prevState != null) prevState.unpersist(blocking = false)
      if (prevMsgs != null) prevMsgs.unpersist(blocking = false)
      if (n == 0) {
        quiescent = true
        msgs.unpersist(blocking = false)
      } else {
        round += 1
        val d = round
        prevState = state
        prevMsgs = msgs
        state = prevState.zipPartitions(msgs, preservesPartitioning = true) {
          (sIt, mIt) =>
            val mm = new java.util.HashMap[Long, Array[Long]]()
            mIt.foreach(kv => mm.put(kv._1, kv._2))
            val updated = sIt.map { case (v, (da, sa, _)) =>
              val inc = mm.remove(v)
              if (inc == null) (v, (da, sa, 0L))
              else {
                var dn = da; var sn = sa; var set = 0L; var copied = false
                var i = 0
                while (i < k) {
                  if (inc(i) > 0L && dn(i) == INF) {
                    if (!copied) { dn = da.clone(); sn = sa.clone(); copied = true }
                    dn(i) = d; sn(i) = inc(i); set |= 1L << i
                  }
                  i += 1
                }
                (v, (dn, sn, set))
              }
            }
            val fresh = new scala.collection.AbstractIterator[(Long, FState)] {
              private lazy val it = mm.entrySet().iterator()
              def hasNext: Boolean = it.hasNext
              def next(): (Long, FState) = {
                val e = it.next()
                val inc = e.getValue
                val dn = Array.fill(k)(INF); val sn = Array.fill(k)(0L)
                var set = 0L; var i = 0
                while (i < k) {
                  if (inc(i) > 0L) { dn(i) = d; sn(i) = inc(i); set |= 1L << i }
                  i += 1
                }
                (e.getKey, (dn, sn, set))
              }
            }
            updated ++ fresh
        }.persist(StorageLevel.MEMORY_AND_DISK)
      }
    }
    state.count()
    if (prevState != null) prevState.unpersist(blocking = false)
    if (prevMsgs != null) prevMsgs.unpersist(blocking = false)
    val maxD = round // deepest layer actually reached
    tlog(s"forward BFS done ($maxD hop layers)")

    // ---- backward: Brandes dependency accumulation per depth ----
    // bstate: vid -> (dist, sigma, delta)
    type BState = (Array[Int], Array[Long], Array[Double])
    var bstate: RDD[(Long, BState)] = state
      .mapValues { case (d, s, _) => (d, s, Array.fill(k)(0.0)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    bstate.count()
    state.unpersist(blocking = false)
    var prevB: RDD[(Long, BState)] = null
    var dDepth = maxD
    while (dDepth >= 1) {
      val depth = dDepth
      // depth-d vertices ship ONE packed message per incident edge
      // carrying every active source index at once — [i, sigma_w,
      // doubleToRawLongBits(delta_w)] triples in a primitive Long
      // array (k times fewer shuffled records and k times smaller
      // hub-receiver buffers than a per-(edge, source) tuple);
      // only depth-(d-1) receivers keep a triple
      val msgs: RDD[(Long, Iterable[(Long, Array[Long])])] =
        bstate.zipPartitions(adjMap, preservesPartitioning = false) {
          (sIt, mIt) =>
            val m = mIt.next()
            sIt.flatMap { case (w, (da, sa, ga)) =>
              var nActive = 0
              var i = 0
              while (i < k) { if (da(i) == depth) nActive += 1; i += 1 }
              if (nActive == 0) Iterator.empty
              else {
                val nbrs = m.get(w)
                if (nbrs == null) Iterator.empty
                else {
                  val packed = new Array[Long](nActive * 3)
                  var j = 0; var ii = 0
                  while (ii < k) {
                    if (da(ii) == depth) {
                      packed(j) = ii.toLong
                      packed(j + 1) = sa(ii)
                      packed(j + 2) = java.lang.Double.doubleToRawLongBits(ga(ii))
                      j += 3
                    }
                    ii += 1
                  }
                  nbrs.iterator.map(u => (u, (w, packed)))
                }
              }
            }
        }.groupByKey(p)
      // msgs has exactly one consumer (the state merge below) — no
      // persist/count: each backward round is ONE Spark job
      prevB = bstate
      bstate = prevB.zipPartitions(msgs, preservesPartitioning = true) {
        (sIt, mIt) =>
          val mm = new java.util.HashMap[Long, Iterable[(Long, Array[Long])]]()
          mIt.foreach(kv => mm.put(kv._1, kv._2))
          sIt.map { case (v, (da, sa, ga)) =>
            val inc = mm.get(v)
            if (inc == null) (v, (da, sa, ga))
            else {
              var gn: Array[Double] = null
              var i = 0
              while (i < k) {
                if (da(i) == depth - 1) {
                  // gather this index's (w, sigma_w, delta_w) terms
                  val terms = scala.collection.mutable.ArrayBuffer
                    .empty[(Long, Long, Double)]
                  inc.foreach { case (w, packed) =>
                    var j = 0
                    while (j < packed.length) {
                      if (packed(j).toInt == i)
                        terms += ((w, packed(j + 1),
                          java.lang.Double.longBitsToDouble(packed(j + 2))))
                      j += 3
                    }
                  }
                  if (terms.nonEmpty) {
                    // ascending successor-id fold — the deterministic
                    // order the oracle's list_reduce replays
                    var acc = 0.0
                    terms.sortInPlace()(Ordering.by(_._1))
                    terms.foreach { case (_, sw, dw) =>
                      acc = acc + (sa(i).toDouble / sw.toDouble) * (1.0 + dw)
                    }
                    if (gn == null) gn = ga.clone()
                    gn(i) = acc // one-shot: each (v, i) has one depth
                  }
                }
                i += 1
              }
              if (gn == null) (v, (da, sa, ga)) else (v, (da, sa, gn))
            }
          }
      }.persist(StorageLevel.MEMORY_AND_DISK)
      bstate.count()
      prevB.unpersist(blocking = false)
      dDepth -= 1
    }
    tlog(s"backward accumulation done ($maxD depth layers)")

    // ascending-source-id fold over the (source, vertex) pairs with
    // hop distance >= 1
    val idxBySrc = sources.zipWithIndex.sortBy(_._1).map(_._2)
    val result = bstate.flatMap { case (v, (da, _, ga)) =>
      var n = 0L
      var acc = 0.0
      idxBySrc.foreach { i =>
        if (da(i) != INF && da(i) >= 1) { n += 1L; acc = acc + ga(i) }
      }
      if (n > 0L) Iterator.single((v, n, acc)) else Iterator.empty
    }
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    bstate.unpersist(blocking = false)
    adjMap.unpersist(blocking = false)
    out
  }

  /**
   * K-core decomposition (coreness per vertex) via iterative H-index
   * propagation (Montresor et al., "Distributed k-Core
   * Decomposition", IEEE TPDS 2013): every vertex starts at its
   * degree and repeatedly lowers its estimate to the H-index of its
   * neighbors' estimates (the largest h with >= h neighbors at
   * >= h). Estimates decrease monotonically and converge to the
   * true coreness — the standard decentralized formulation, no
   * global peeling order needed, so it partitions like any other
   * aggregateMessages loop.
   *
   * Only round 0 is a full-|E| exchange (each vertex collects its
   * neighbors' degrees into a persistent histogram, clipped at its
   * own fixed degree). Every later round ships only (old, new)
   * DELTAS from vertices whose estimate changed — message volume
   * tracks the change frontier, not |E|. The loop runs on plain
   * co-partitioned pair RDDs (adjacency arrays + per-vertex state
   * under one HashPartitioner), NOT GraphX: a Pregel-shaped graph
   * loop re-ships every vertex attribute to the edge partitions on
   * every round, which dominates once the frontier collapses; here a
   * round is a frontier-sized shuffle plus two narrow joins.
   * Histograms are copy-on-write; the per-round synchronous
   * estimates (and hence the fixpoint and round count) are identical
   * to the full-rebroadcast formulation: clipping at the fixed
   * degree instead of the current estimate re-buckets only entries
   * above the h-index scan's return range. At 100 TB the tail
   * rounds of a power-law graph are frontier-sized, which is
   * exactly what this formulation pays.
   */
  def coreness[V: scala.reflect.ClassTag](g: Graph[V, Int], maxIter: Int = 50): Graph[Int, Int] = {
    val (ests, release) = corenessStates(g, maxIter)
    val out = g.outerJoinVertices(ests)((_, _, e) => e.getOrElse(0))
    out.cache()
    out.vertices.count()
    release()
    out
  }

  /** Core of the k-core loop: final (vid, coreness) for every
   * non-isolated vertex (isolated vertices have coreness 0 and are
   * absent), plus a release handle for the loop's cached RDDs. The
   * returned RDD stays persisted until `release()`. */
  private def corenessStates[V](g: Graph[V, Int],
      maxIter: Int): (org.apache.spark.rdd.RDD[(Long, Int)], () => Unit) = {
    // probe-only per-round log (graft.kcore.log=on or env
    // SPARK_GRAFT_KCORE_LOG=on): VERDICT r19 item 3 asks whether this
    // peel needs the k-truss overlay treatment — the decisive numbers
    // are the per-round WRITE volumes (CoreState objects actually
    // allocated: receivers + send-gate clears; everything else passes
    // through by reference) against the frontier, and the wall of the
    // tail rounds against the job-dispatch floor
    val logOn = sys.props.get("graft.kcore.log")
      .orElse(sys.env.get("SPARK_GRAFT_KCORE_LOG")).contains("on")
    // largest k <= bound with >= k neighbor estimates >= k, from a
    // histogram clipped at deg (cum accumulates the >= k tail,
    // including buckets above bound)
    def hIndexOf(bound: Int, deg: Int, c: Array[Int]): Int = {
      var cum = 0; var k = deg
      while (k >= 1) {
        cum += c(k)
        if (k <= bound && cum >= k) return k
        k -= 1
      }
      0
    }
    // size the loop's partitioner to the data: tens of frontier
    // rounds each launch a job over every partition, so empty-task
    // overhead dominates when partitions far outnumber the state
    // (~500k adjacency entries per partition; never more partitions
    // than the edge RDD has)
    val nEdges = g.edges.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(g.edges.getNumPartitions, (2 * nEdges / 500000L).toInt)))
    val adj: org.apache.spark.rdd.RDD[(Long, Array[Long])] = g.edges
      .flatMap(e => Iterator((e.srcId, e.dstId), (e.dstId, e.srcId)))
      .groupByKey(p).mapValues(_.toArray).persist()
    adj.count()

    // round 0: the one full exchange — every vertex's degree to every
    // neighbor. The histogram is built RECEIVER-side, already clipped
    // at the receiver's own degree (coreness(v) <= deg(v), so buckets
    // above deg(v) collapse into the top bucket): the array for v is
    // exactly deg(v)+1 ints, making round-0 state Σ(deg+1) = O(|E|)
    // regardless of skew. A value-indexed dense combiner here (the
    // previous shape) is a hub hazard — every neighbor of a
    // degree-D hub allocates a D-sized array before clipping, an
    // O(D²) aggregate that the 10x Zipf probe measured OOMing a
    // 100 GiB heap at D≈200k. Raw (vid, deg) messages shuffle
    // without map-side combining; 2|E| fixed-width pairs, the same
    // volume the det-fold rounds ship.
    val degMsgs = adj
      .flatMap { case (_, nbrs) =>
        val d = nbrs.length
        nbrs.iterator.map(v => (v, d))
      }
      .partitionBy(p)

    var state: org.apache.spark.rdd.RDD[(Long, CoreState)] =
      adj.zipPartitions(degMsgs, preservesPartitioning = true) { (aIt, mIt) =>
        val hm = new java.util.HashMap[Long, Array[Int]]()
        aIt.foreach { case (v, nbrs) => hm.put(v, new Array[Int](nbrs.length + 1)) }
        mIt.foreach { case (v, d) =>
          // NPE loudly on a routing bug: adj and degMsgs derive from
          // the same doubled edge set, so every receiver has a slot
          val c = hm.get(v)
          val deg = c.length - 1
          c(math.min(d, deg)) += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Long, CoreState)](hm.size)
        val it = hm.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val counts = e.getValue
          val deg = counts.length - 1
          out += ((e.getKey, CoreState(hIndexOf(deg, deg, counts), deg, counts)))
        }
        out.iterator
      }.persist()
    state.count()

    // one hash map of the partition's adjacency per partition: a
    // round then costs O(frontier) lookups, not a cogroup that
    // re-iterates (and re-buffers) the full adjacency every round
    val adjMap: org.apache.spark.rdd.RDD[java.util.HashMap[Long, Array[Long]]] =
      adj.mapPartitions { it =>
        val m = new java.util.HashMap[Long, Array[Long]]()
        it.foreach(kv => m.put(kv._1, kv._2))
        Iterator.single(m)
      }.persist()
    adjMap.count()
    adj.unpersist(blocking = false)

    // One Spark job per round: the dmsgs count below is the round's
    // only action, and computing it materializes the (persisted)
    // current state generation en route — so unpersists trail by one
    // generation (a generation's blocks are only dropped once the
    // NEXT generation is safely cached).
    var prevState: org.apache.spark.rdd.RDD[(Long, CoreState)] = null
    var prevDmsgs: org.apache.spark.rdd.RDD[(Long, CoreDelta)] = null
    var it = 1
    var quiescent = false
    while (!quiescent && it < maxIter) {
      val tRound = System.nanoTime()
      val writeAcc =
        if (logOn) Some(g.edges.sparkContext.longAccumulator("kcoreWrites"))
        else None
      val frontierAcc =
        if (logOn) Some(g.edges.sparkContext.longAccumulator("kcoreFrontier"))
        else None
      // the frontier filter preserves keys, so the co-partitioning
      // with adjMap (derived from adj under the same partitioner)
      // survives and zipPartitions lines up
      val frontier = state.mapPartitions(
        _.collect { case (v, st) if st.prev != st.est =>
          frontierAcc.foreach(_.add(1L))
          (v, (st.prev, st.est)) },
        preservesPartitioning = true)
      val dmsgs = frontier.zipPartitions(adjMap) { (fIt, mIt) =>
        val m = mIt.next()
        fIt.flatMap { case (v, (o, n)) =>
          val nbrs = m.get(v)
          if (nbrs == null) Iterator.empty
          else nbrs.iterator.map(u => (u, (o, n)))
        }
      }
        .combineByKey[CoreDelta](
          (on: (Int, Int)) => new CoreDelta(on._1, on._2),
          (d: CoreDelta, on: (Int, Int)) => d.add(on._1, on._2),
          (a: CoreDelta, b: CoreDelta) => CoreDelta.merge(a, b),
          p)
      dmsgs.persist()
      val n = dmsgs.count() // materializes `state` (its one consumer)
      if (prevState != null) prevState.unpersist(blocking = false)
      if (prevDmsgs != null) prevDmsgs.unpersist(blocking = false)
      if (n == 0) {
        quiescent = true
        dmsgs.unpersist(blocking = false)
      } else {
        it += 1
        prevState = state
        prevDmsgs = dmsgs
        // both sides live under p: hash the (frontier-sized) delta
        // side per partition and stream the state — a zipPartitions
        // merge, not a cogroup that re-buffers the full state every
        // round
        state = prevState.zipPartitions(dmsgs, preservesPartitioning = true) {
          (sIt, mIt) =>
            val mm = new java.util.HashMap[Long, CoreDelta]()
            mIt.foreach(kv => mm.put(kv._1, kv._2))
            sIt.map { case (id, st) =>
              val m = mm.get(id)
              val next = if (m != null) {
                val deg = st.counts.length - 1
                val c = st.counts.clone()
                var j = 0
                while (j < m.size) {
                  c(math.min(m.olds(j), deg)) -= 1
                  c(math.min(m.news(j), deg)) += 1
                  j += 1
                }
                writeAcc.foreach(_.add(1L))
                CoreState(math.min(st.est, hIndexOf(st.est, deg, c)), st.est, c)
              } else {
                // clear the send gate on non-receivers: a vertex only
                // re-sends in the round after it changed
                if (st.prev != st.est) {
                  writeAcc.foreach(_.add(1L))
                  st.copy(prev = st.est)
                } else st
              }
              (id, next)
            }
        }.persist()
        if (logOn) {
          // probe-only extra action: materialize this generation NOW
          // so the round's accumulators read complete (the production
          // path keeps one job per round and lets the next round's
          // count materialize it)
          state.count()
          System.err.println(f"[graft-kcore] round $it: frontier=${frontierAcc.fold(-1L)(_.value)} receivers=$n rewritten=${writeAcc.fold(-1L)(_.value)} wall=${(System.nanoTime() - tRound) / 1e9}%.3f s")
        }
      }
    }
    state.count() // materialize the final generation
    if (prevState != null) prevState.unpersist(blocking = false)
    if (prevDmsgs != null) prevDmsgs.unpersist(blocking = false)
    System.err.println(s"[graft-kcore] converged in $it rounds")
    val finalState = state
    val ests = state.mapValues(_.est)
    (ests, () => {
      finalState.unpersist(blocking = false)
      adjMap.unpersist(blocking = false)
    })
  }

  /** (vid, core) rows for the whole vertex set (isolated vertices at
   * coreness 0), materialized before the loop surfaces are released
   * — see bfsHopsDF. Goes through `corenessStates` directly so no
   * graph sharing the caller's cached edge RDD is ever unpersisted. */
  def corenessDF[V: scala.reflect.ClassTag](g: Graph[V, Int], maxIter: Int = 50): DataFrame = {
    val (ests, release) = corenessStates(g, maxIter)
    val rows = g.vertices.leftOuterJoin(ests)
      .map { case (id, (_, e)) => (id, e.getOrElse(0).toLong) }
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(rows).toDF("vid", "core").cache()
    df.count()
    release()
    df
  }

  /**
   * Per-edge neighborhood Jaccard similarity (common neighbors over
   * union of neighborhoods) for each canonical edge — the standard
   * link-prediction / tie-strength feature.
   *
   * Relational plan: one shuffle to build sorted adjacency arrays,
   * then two vertex-table joins feeding the native codegen'd
   * `intersect_count` merge scan (zero allocation per row, vs
   * array_intersect's hash set + output array) — no per-pair
   * shuffle, no triangle-join explosion; adjacency arrays are
   * degree-bounded so the row width is bounded by max degree (skewed
   * hubs are the known caveat, the same one every adjacency-list
   * algorithm carries).
   *
   * `canonical` is the (src < dst, distinct) edge set; `symmetrized`
   * its doubled form (both produced by EdgeOps).
   */
  /**
   * Resource-Allocation link-prediction index per existing edge
   * (Zhou/Lü/Zhang 2009): RA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/deg(z) — the
   * log-free cousin of Adamic-Adar (chosen deliberately: 1/deg is
   * rational, so the DuckDB oracle is bit-comparable after shared
   * floor-rounding, where 1/log(deg) would drag in libm differences).
   *
   * Shape: NOT the wedge-enumeration join (Σ deg(z)² shuffled rows —
   * measured 37 s on the sf0.1 co-purchase graph). Instead each
   * vertex's sorted adjacency array is built once carrying a parallel
   * 1/deg(neighbor) weight array, and every canonical edge does one
   * O(deg_a+deg_b) merge scan via the native codegen'd
   * [[org.apache.spark.sql.graft.SortedIntersectWeightedSum]] —
   * two adjacency joins total, the identical plan class as
   * [[neighborJaccard]] (2 s on the same graph). At 100 TB the
   * adjacency build is one shuffle keyed on vertex id and the edge
   * joins shuffle on the endpoint — no deg² term anywhere.
   */
  /** (vid, nbrs sorted asc, wts parallel: 1/deg(nbr)) — the shared
   * input of [[resourceAllocation]] (and reusable by any
   * Adamic-Adar-family score with a different weight column). */
  def weightedAdjacency(symmetrized: DataFrame): DataFrame = {
    val deg = symmetrized.groupBy(col("src").as("zvid"))
      .agg(count(lit(1)).cast("double").as("zdeg"))
    symmetrized
      .join(broadcast(deg), col("dst") === col("zvid"))
      .groupBy(col("src").as("vid"))
      .agg(sort_array(collect_list(struct(col("dst"), (lit(1.0) / col("zdeg")).as("w"))))
        .as("nw"))
      .select(col("vid"),
        transform(col("nw"), s => s.getField("dst")).as("nbrs"),
        transform(col("nw"), s => s.getField("w")).as("wts"))
  }

  def resourceAllocation(canonical: DataFrame, symmetrized: DataFrame): DataFrame =
    resourceAllocationFromAdj(canonical, weightedAdjacency(symmetrized))

  def resourceAllocationFromAdj(canonical: DataFrame, adj: DataFrame): DataFrame = {
    val common = org.apache.spark.sql.graft.GraftExpressions
      .intersectCount(col("na.nbrs"), col("nb.nbrs"))
    val ra = org.apache.spark.sql.graft.GraftExpressions
      .intersectWeightedSum(col("na.nbrs"), col("na.wts"), col("nb.nbrs"))
    canonical
      .join(adj.as("na"), col("src") === col("na.vid"))
      .join(adj.as("nb"), col("dst") === col("nb.vid"))
      .select(col("src"), col("dst"),
        common.cast("long").as("common"),
        graft.ops.TextOps.rnd(ra, 6).as("ra"))
      .where(col("common") > 0)
  }

  /**
   * Multi-source BFS in ONE Pregel run: the vertex attribute is a
   * dense Array[Int] of per-source distances (k sources → k ints, not
   * k separate traversals over the same edge partitions). Messages
   * are candidate-distance arrays merged by elementwise min; a vertex
   * only messages neighbors when at least one entry improved, so each
   * superstep touches only the union frontier. This is the standard
   * batched-BFS layout (e.g. MS-BFS, Then et al., VLDB 2014) — at
   * 100 TB the edge set is scanned O(diameter) times total instead of
   * O(k · diameter).
   */
  def multiSourceBfs[V: scala.reflect.ClassTag](
      g: Graph[V, Int], sources: Array[VertexId], maxHops: Int = 10): Graph[Array[Int], Int] = {
    val k = sources.length
    val idx = sources.zipWithIndex.toMap
    val INF = Int.MaxValue
    def mergeMin(a: Array[Int], b: Array[Int]): Array[Int] = {
      val out = new Array[Int](k)
      var i = 0
      while (i < k) { out(i) = math.min(a(i), b(i)); i += 1 }
      out
    }
    val init = g.mapVertices { (id, _) =>
      val a = Array.fill(k)(INF)
      idx.get(id).foreach(a(_) = 0)
      a
    }
    init.pregel(Array.fill(k)(INF), maxIterations = maxHops,
      activeDirection = EdgeDirection.Either)(
      (_, d, m) => mergeMin(d, m),
      t => {
        def candidate(from: Array[Int], to: Array[Int]): Option[Array[Int]] = {
          var improved = false
          val out = new Array[Int](k)
          var i = 0
          while (i < k) {
            val c = if (from(i) == INF) INF else from(i) + 1
            out(i) = math.min(c, to(i))
            if (out(i) < to(i)) improved = true
            i += 1
          }
          if (improved) Some(out) else None
        }
        val toDst = candidate(t.srcAttr, t.dstAttr).map(a => (t.dstId, a))
        val toSrc = candidate(t.dstAttr, t.srcAttr).map(a => (t.srcId, a))
        (toDst.iterator ++ toSrc.iterator)
      },
      mergeMin)
  }

  /** Integer-exact per-vertex reachability summary over the k
   * sources: (vid, n_reached, sum_dist, min_dist) — all integral so
   * the oracle hash never touches a float. Materialized before the
   * Pregel surfaces are released (see bfsHopsDF). */
  def multiSourceBfsDF[V: scala.reflect.ClassTag](
      g: Graph[V, Int], sources: Array[VertexId], maxHops: Int = 10): DataFrame = {
    val (state, release) = multiSourceBfsRDD(g, sources, maxHops)
    val rows = state.flatMap { case (id, ds) =>
      val reached = ds.filter(_ != Int.MaxValue)
      if (reached.isEmpty) None
      else Some((id, reached.length.toLong, reached.map(_.toLong).sum, reached.min.toLong))
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(rows)
      .toDF("vid", "n_reached", "sum_dist", "min_dist").cache()
    df.count()
    release()
    df
  }

  /** Symmetric adjacency arrays from a canonical edge DataFrame —
   * the shared input of the deterministic integer fixpoints below,
   * which all stream it against a per-partition state hash.
   * `partitions <= 0` sizes the partitioner from the input RDD
   * (its own parallelism, floored at 8) so the build scales with
   * the data while small loop states avoid empty-task overhead. */
  def adjacencyArrays(canonical: DataFrame, partitions: Int = 0)
      : org.apache.spark.rdd.RDD[(Long, Array[Long])] = {
    val rows = canonical
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
    val n = if (partitions > 0) partitions
      else math.max(8, rows.getNumPartitions / 4)
    val p = new org.apache.spark.HashPartitioner(n)
    rows
      .flatMap(r => Iterator((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupByKey(p).mapValues(_.toArray)
  }

  /** Exact floor(a * b / d) for non-negative operands, safe for any
   * 128-bit intermediate product: the fast path is the plain 64-bit
   * `a * b / d` whenever the product provably fits (identical
   * bits to the historical formula), and the overflow path computes
   * the same mathematical value through BigInteger instead of
   * silently wrapping. Keeps the deterministic fixpoints'
   * bit-reproducibility contract intact at hub degrees / vertex
   * counts where a raw 64-bit multiply would go negative. */
  private[graft] def mulDiv(a: Long, b: Long, d: Long): Long = {
    val lo = a * b
    if (Math.multiplyHigh(a, b) == 0L && lo >= 0L) lo / d
    else java.math.BigInteger.valueOf(a)
      .multiply(java.math.BigInteger.valueOf(b))
      .divide(java.math.BigInteger.valueOf(d))
      .longValueExact()
  }

  /** Deterministic fixed-point PageRank in integer micro-units:
   * rank_0 = 10^6; rank' = 150000 + (850000 * Σ rank div deg) div
   * 10^6. Integer sums are order-free, so the scores are
   * BIT-IDENTICAL across engines, partitionings, and runs — the
   * reproducibility contract a training pipeline needs when a score
   * must regenerate byte-for-byte. The adjacency must be partitioned
   * (as [[adjacencyArrays]] returns) and persisted by the caller.
   * Overflow-safe: the 850000 * Σ product routes through [[mulDiv]]
   * (exact at any Σ a Long can hold) and the contribution sum
   * itself adds via Math.addExact, so mass concentration beyond
   * Long range fails loud instead of silently corrupting scores. */
  def pagerankDetRDD(adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      rounds: Int = 10): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val p = adj.partitioner.get
    // ONE Spark job for the whole fixed-round loop (the hitsDetRDD
    // job-elision discipline, extended): no round needs a
    // driver-side scalar, so the generations chain LAZILY —
    // `rounds` shuffle stages inside the single job the final
    // count() launches — instead of paying a persist + count job
    // per round (10 jobs -> 1; on a scheduler-latency-bound local
    // run the dispatch floor was most of the wall). Values are
    // byte-identical: the same recurrence evaluates once, stagewise,
    // and each generation is consumed by exactly one downstream
    // round, so nothing recomputes. Lineage depth = `rounds`
    // (fixed, ~10) — the standard depth of any multi-stage SQL job;
    // shuffle outputs provide the usual stage-level recovery.
    var rank: org.apache.spark.rdd.RDD[(Long, Long)] =
      adj.mapValues(_ => 1000000L)
    (1 to rounds).foreach { _ =>
      rank = adj.zipPartitions(rank) { (aIt, rIt) =>
        val m = new java.util.HashMap[Long, Long]()
        rIt.foreach(kv => m.put(kv._1, kv._2))
        aIt.flatMap { case (u, nbrs) =>
          val c = m.get(u) / nbrs.length
          nbrs.iterator.map(n => (n, c))
        }
      }.reduceByKey(p, Math.addExact(_, _))
        .mapValues(s => 150000L + mulDiv(s, 850000L, 1000000L))
    }
    rank.persist()
    rank.count()
    rank
  }

  /** Personalized PageRank in the det family's integer micro-unit
   * contract: restart mass lands only on the seed set
   * (r_{k+1}(v) = [v ∈ S]·150000 + (850000 · Σ_{u∈N(v)} r_k(u) div
   * deg(u)) div 10^6, r_0 = [v ∈ S]·10^6) — the graph-proximity
   * score a training pipeline uses to expand a trusted document
   * set. Same loop shape and bit-reproducibility guarantees as
   * [[pagerankDetRDD]]; integer floor truncation zeroes far-away
   * mass, which is the deterministic analogue of PPR's natural
   * locality. Seeds ride a broadcast set (bounded by construction
   * — callers pass a handful of hash-picked roots). */
  def pprDetRDD(adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      seeds: Set[Long], rounds: Int = 10): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val p = adj.partitioner.get
    val bc = adj.sparkContext.broadcast(seeds)
    // lazy fixed-round chain, one job total — see pagerankDetRDD
    var rank: org.apache.spark.rdd.RDD[(Long, Long)] =
      adj.mapPartitions(_.map { case (v, _) =>
        (v, if (bc.value(v)) 1000000L else 0L) },
        preservesPartitioning = true)
    (1 to rounds).foreach { _ =>
      rank = adj.zipPartitions(rank) { (aIt, rIt) =>
        val m = new java.util.HashMap[Long, Long]()
        rIt.foreach(kv => m.put(kv._1, kv._2))
        aIt.flatMap { case (u, nbrs) =>
          val c = m.get(u) / nbrs.length
          nbrs.iterator.map(n => (n, c))
        }
      }.reduceByKey(p, Math.addExact(_, _))
        .mapPartitions(_.map { case (v, s) =>
          (v, (if (bc.value(v)) 150000L else 0L) + mulDiv(s, 850000L, 1000000L)) },
          preservesPartitioning = true)
    }
    rank.persist()
    rank.count()
    rank
  }

  /** Deterministic integer eigenvector centrality: shifted power
   * iteration s = x + Σ_nbr x with integer max-normalization
   * x' = (s * 10^6) div max(s) — same bit-identical contract as
   * [[pagerankDetRDD]]; the argmax vertex sits at exactly 10^6.
   * Overflow-safe: the s * 10^6 normalization routes through
   * [[mulDiv]] (exact for any s — with a raw 64-bit multiply a hub
   * of degree ~9.2e6 would already wrap) and the neighbor sums add
   * via Math.addExact, failing loud past Long range. */
  def eigenCentralityDetRDD(adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      rounds: Int = 12): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val p = adj.partitioner.get
    // ONE Spark job per round (the hitsDetRDD job-elision
    // discipline): the max-normalization needs a driver-side scalar,
    // so a round cannot be fully lazy — but the max-fold is the
    // round's ONLY action. It materializes the persisted raw-sum
    // generation en route, and the normalized scores are a LAZY
    // mapValues view over that cache (partitioning preserved),
    // consumed by the next round's zipPartitions — no separate
    // count() job per round (24 jobs -> 13 for 12 rounds). The raw
    // generation backing a lazy view must outlive its consumer, so
    // unpersists trail by one round; the FINAL round materializes a
    // concrete persisted RDD so the caller's existing
    // unpersist-after-copy contract keeps working and no backing
    // cache leaks. Values byte-identical — same recurrence, same
    // integer ops, evaluated once per round either way.
    var x: org.apache.spark.rdd.RDD[(Long, Long)] =
      adj.mapValues(_ => 1000000L)
    var rawLive: org.apache.spark.rdd.RDD[(Long, Long)] = null
    var prevRaw: org.apache.spark.rdd.RDD[(Long, Long)] = null
    (1 to rounds).foreach { r =>
      val sums = adj.zipPartitions(x) { (aIt, xIt) =>
        val m = new java.util.HashMap[Long, Long]()
        xIt.foreach(kv => m.put(kv._1, kv._2))
        aIt.flatMap { case (u, nbrs) =>
          val xu = m.get(u)
          nbrs.iterator.map(n => (n, xu))
        }
      }.reduceByKey(p, Math.addExact(_, _))
      // x and sums share partitioner p: a zipPartitions hash merge
      // instead of the cogroup — same values, no per-key buffer
      // machinery (sums covers only vertices with >= 1 neighbor, so
      // absent keys contribute 0)
      val s = x.zipPartitions(sums, preservesPartitioning = true) { (xIt, sIt) =>
        val m = new java.util.HashMap[Long, Long]()
        sIt.foreach(kv => m.put(kv._1, kv._2))
        xIt.map { case (id, own) =>
          (id, Math.addExact(own, m.getOrDefault(id, 0L)))
        }
      }.persist()
      val mx = s.map(_._2).fold(1L)(math.max) // materializes s
      if (prevRaw != null) prevRaw.unpersist(blocking = false)
      prevRaw = rawLive
      rawLive = s
      x = s.mapValues(v => mulDiv(v, 1000000L, mx))
      if (r == rounds) {
        // concrete final generation: callers unpersist the returned
        // RDD after copying, so the result must own its own cache
        x = x.persist()
        x.count()
        rawLive.unpersist(blocking = false)
        rawLive = null
      }
    }
    if (prevRaw != null) prevRaw.unpersist(blocking = false)
    x
  }

  /** Deterministic synchronous label propagation: each vertex adopts
   * the most frequent neighbor label, ties broken by SMALLEST label
   * — a total order, so unlike classic LPA (implementation-defined
   * tie-breaks) the result is exact and SQL-replayable. */
  def labelPropagationDetRDD(adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      rounds: Int = 4): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val p = adj.partitioner.get
    // Round shape: ONE exchange instead of two. The previous form
    // shuffled ((receiver, label), 1) pairs, reduced, then paid a
    // SECOND shuffle of the distinct (receiver, (count, label))
    // triples to the receiver's partition for the argmax. Keying by
    // the receiver directly with a map-side label->count combiner
    // ships the same information in the first exchange (combiners
    // collapse duplicate (receiver, label) pairs per map partition,
    // exactly like the old first reduceByKey) and the argmax runs
    // locally — the second exchange's ~2|E|-bounded triples never
    // move. Counts and the (count DESC, label ASC) argmax are
    // integer-exact and total-ordered, so the labels are
    // byte-identical. Also lazily chained across the fixed rounds
    // (one job total — see pagerankDetRDD).
    var lab: org.apache.spark.rdd.RDD[(Long, Long)] =
      adj.mapPartitions(_.map { case (v, _) => (v, v) }, preservesPartitioning = true)
    (1 to rounds).foreach { _ =>
      lab = adj.zipPartitions(lab) { (aIt, lIt) =>
        val m = new java.util.HashMap[Long, Long]()
        lIt.foreach(kv => m.put(kv._1, kv._2))
        aIt.flatMap { case (u, nbrs) =>
          val lu = m.get(u)
          nbrs.iterator.map(n => (n, lu))
        }
      }.combineByKey[java.util.HashMap[Long, Long]](
        (l: Long) => {
          val m = new java.util.HashMap[Long, Long](); m.put(l, 1L); m
        },
        (m: java.util.HashMap[Long, Long], l: Long) => {
          m.merge(l, 1L, (a, b) => a + b); m
        },
        (a: java.util.HashMap[Long, Long], b: java.util.HashMap[Long, Long]) => {
          // merge the smaller map into the larger: O(min) inserts per
          // combine, bounded total by the receiver's degree
          val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
          small.forEach((l, c) => big.merge(l, c, (x, y) => x + y))
          big
        },
        p)
        .mapValues { counts =>
          var bestL = Long.MaxValue; var bestC = 0L
          counts.forEach { (l, c) =>
            if (c > bestC || (c == bestC && l < bestL)) { bestL = l; bestC = c }
          }
          bestL
        }
    }
    lab.persist()
    lab.count()
    lab
  }

  /**
   * Deterministic integer HITS (hubs & authorities, Kleinberg) over
   * a DIRECTED edge set, in the det family's micro-unit contract:
   * h_0 = 10^6 on every source node; each round
   * a'(v) = Σ_{u→v} h(u), max-normalized to a = (a' * 10^6) div
   * max(a'), then h'(u) = Σ_{u→v} a(v), normalized the same way.
   * Integer sums are order-free and the normalization routes through
   * [[mulDiv]] (exact for any Long sum), so scores are BIT-IDENTICAL
   * across engines, partitionings, and runs — SQL-replayable as
   * unrolled CTE rounds with HUGEINT sums.
   *
   * Loop shape: the out-adjacency (u → [v]) and in-adjacency
   * (v → [u]) are built once on fixed HashPartitioners; each
   * half-round is one zipPartitions hash-merge (scores hashed,
   * adjacency streamed) + one reduceByKey on the receiving
   * partitioner — two message shuffles per round, no cogroups, no
   * graph rebuild. Hub state covers nodes with out-edges, authority
   * state nodes with in-edges (general HITS: a node with both keeps
   * both scores).
   *
   * Returns (hubs, authorities) keyed by node id — LAZY normalized
   * views over the final persisted raw-sum generations (cheap
   * mapValues per action; materialize once and reuse). The release
   * thunk unpersists the backing raws and adjacencies — after it,
   * any further action on the views recomputes the full lineage.
   */
  def hitsDetRDD(edges: org.apache.spark.rdd.RDD[(Long, Long)],
      rounds: Int = 8): (org.apache.spark.rdd.RDD[(Long, Long)],
        org.apache.spark.rdd.RDD[(Long, Long)], () => Unit) = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    require(rounds >= 1, s"hitsDetRDD needs >= 1 round, got $rounds")
    val nE = edges.count()
    val parts = math.max(8, math.min(edges.getNumPartitions,
      math.max(1, (2 * nE / 500000L).toInt)))
    val pOut = new HashPartitioner(parts)
    val pIn = new HashPartitioner(parts)
    val adjOut: RDD[(Long, Array[Long])] = edges.groupByKey(pOut)
      .mapValues(_.toArray).persist(StorageLevel.MEMORY_AND_DISK)
    val adjIn: RDD[(Long, Array[Long])] = edges
      .map { case (u, v) => (v, u) }.groupByKey(pIn)
      .mapValues(_.toArray).persist(StorageLevel.MEMORY_AND_DISK)
    adjOut.count(); adjIn.count()

    val hub0: RDD[(Long, Long)] = adjOut
      .mapPartitions(_.map { case (u, _) => (u, 1000000L) },
        preservesPartitioning = true).persist()
    var hub: RDD[(Long, Long)] = hub0
    var auth: RDD[(Long, Long)] = null
    // ONE Spark job per half-round: the max-fold below is the
    // half-round's only action, and running it materializes the
    // persisted raw sums en route; the normalized scores are then a
    // LAZY mapValues view over that cache (partitioning preserved),
    // consumed by the next half-round's zipPartitions — no separate
    // count() job per normalization. On a scheduler-latency-bound
    // host this halves the loop's job count (32 -> 16 for 8 rounds).
    // The raw generation backing a lazy view must outlive its
    // consumer, so unpersists trail by one half-round.
    var aRawLive: RDD[(Long, Long)] = null
    var hRawLive: RDD[(Long, Long)] = null
    var prevARaw: RDD[(Long, Long)] = null
    var prevHRaw: RDD[(Long, Long)] = null
    (1 to rounds).foreach { _ =>
      // authority half-round: a'(v) = Σ_{u→v} h(u)
      val aRaw = adjOut.zipPartitions(hub) { (aIt, hIt) =>
        val m = new java.util.HashMap[Long, Long]()
        hIt.foreach(kv => m.put(kv._1, kv._2))
        aIt.flatMap { case (u, outs) =>
          val hu = m.get(u)
          outs.iterator.map(v => (v, hu))
        }
      }.reduceByKey(pIn, Math.addExact(_, _)).persist()
      val aMax = aRaw.map(_._2).fold(1L)(math.max) // materializes aRaw
      if (prevARaw != null) prevARaw.unpersist(blocking = false)
      prevARaw = aRawLive
      aRawLive = aRaw
      auth = aRaw.mapValues(v => mulDiv(v, 1000000L, aMax))
      // hub half-round: h'(u) = Σ_{u→v} a(v)
      val hRaw = adjIn.zipPartitions(auth) { (aIt, sIt) =>
        val m = new java.util.HashMap[Long, Long]()
        sIt.foreach(kv => m.put(kv._1, kv._2))
        aIt.flatMap { case (v, ins) =>
          val av = m.get(v)
          ins.iterator.map(u => (u, av))
        }
      }.reduceByKey(pOut, Math.addExact(_, _)).persist()
      val hMax = hRaw.map(_._2).fold(1L)(math.max) // materializes hRaw
      if (prevHRaw != null) prevHRaw.unpersist(blocking = false)
      prevHRaw = hRawLive
      hRawLive = hRaw
      hub = hRaw.mapValues(v => mulDiv(v, 1000000L, hMax))
    }
    if (prevARaw != null) prevARaw.unpersist(blocking = false)
    if (prevHRaw != null) prevHRaw.unpersist(blocking = false)
    hub0.unpersist(blocking = false) // superseded after round 1
    val lastA = aRawLive; val lastH = hRawLive
    (hub, auth, () => {
      if (lastA != null) lastA.unpersist(blocking = false)
      if (lastH != null) lastH.unpersist(blocking = false)
      adjOut.unpersist(blocking = false)
      adjIn.unpersist(blocking = false)
    })
  }

  def neighborJaccard(canonical: DataFrame, symmetrized: DataFrame): DataFrame =
    neighborJaccardFromAdj(canonical,
      symmetrized.groupBy(col("src").as("vid"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs")))

  /** Jaccard over a precomputed (vid, nbrs) adjacency — lets one
   * cached adjacency feed every link-prediction score in a session
   * (see GraphQueries.adjW). */
  def neighborJaccardFromAdj(canonical: DataFrame, adj: DataFrame): DataFrame = {
    val common = org.apache.spark.sql.graft.GraftExpressions
      .intersectCount(col("na.nbrs"), col("nb.nbrs"))
    canonical
      .join(adj.as("na"), col("src") === col("na.vid"))
      .join(adj.as("nb"), col("dst") === col("nb.vid"))
      .select(col("src"), col("dst"),
        common.cast("long").as("common"),
        size(col("na.nbrs")).cast("long").as("deg_src"),
        size(col("nb.nbrs")).cast("long").as("deg_dst"),
        graft.ops.TextOps.rnd(
          common.cast("double") /
            (size(col("na.nbrs")) + size(col("nb.nbrs")) - common), 9)
          .as("jaccard"))
  }

  /** Connected components as (vid, component) with component = min
   * vertex id reachable — GraphX's library min-label propagation
   * (Pregel, O(diameter) supersteps, frontier-only messages). The
   * result is materialized before the component graph's surfaces
   * are released (same lazy-DataFrame discipline as bfsHopsDF). */
  def connectedComponentsDF[V: scala.reflect.ClassTag](g: Graph[V, Int]): DataFrame = {
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(g)
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(cc.vertices.map { case (id, c) => (id, c) })
      .toDF("vid", "component").cache()
    df.count()
    cc.unpersistVertices(blocking = false)
    cc.edges.unpersist(blocking = false)
    df
  }

  /**
   * Deterministic synchronous label propagation: every vertex starts
   * labelled with its own id; each round it adopts the most frequent
   * label among its neighbors, ties broken by SMALLEST label (GraphX's
   * library LPA breaks ties by hash-map iteration order, which is not
   * stable across runs/partitionings — this one is reproducible, which
   * the correctness harness requires). Runs a FIXED number of rounds:
   * synchronous LPA can oscillate between two labelings on bipartite
   * structures, so a fixed round count is the deterministic stopping
   * rule.
   *
   * Messages are per-label count maps merged IN PLACE (the hub
   * lesson: a combine tree must do O(deg) total map inserts, and
   * map size is bounded by the number of distinct neighbor labels,
   * which shrinks as communities coalesce).
   */
  def labelPropagationDF[V: scala.reflect.ClassTag](
      g: Graph[V, Int], rounds: Int = 5): DataFrame = {
    var lg: Graph[Long, Int] = g.mapVertices((id, _) => id).cache()
    lg.vertices.count()
    var i = 0
    while (i < rounds) {
      val msgs = lg.aggregateMessages[scala.collection.mutable.HashMap[Long, Int]](
        ctx => {
          ctx.sendToDst(scala.collection.mutable.HashMap(ctx.srcAttr -> 1))
          ctx.sendToSrc(scala.collection.mutable.HashMap(ctx.dstAttr -> 1))
        },
        (a, b) => {
          val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
          small.foreach { case (l, c) =>
            big.update(l, big.getOrElse(l, 0) + c)
          }
          big
        })
      val next = lg.outerJoinVertices(msgs) { (_, old, m) =>
        m match {
          case Some(counts) =>
            var bestL = Long.MaxValue; var bestC = -1
            counts.foreach { case (l, c) =>
              if (c > bestC || (c == bestC && l < bestL)) { bestL = l; bestC = c }
            }
            bestL
          case None => old
        }
      }.cache()
      next.vertices.count()
      lg.unpersistVertices(blocking = false)
      lg.edges.unpersist(blocking = false)
      lg = next
      i += 1
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(lg.vertices.map { case (id, l) => (id, l) })
      .toDF("vid", "label").cache()
    df.count()
    lg.unpersistVertices(blocking = false)
    lg.edges.unpersist(blocking = false)
    df
  }

  /** Single-source shortest paths over Double edge lengths (Pregel
   * relaxation — the distributed Bellman-Ford: frontier vertices
   * offer `dist + len` to neighbors, vprog keeps the min; converges
   * once no relaxation fires, bounded by maxIter supersteps). Only
   * vertices whose distance improved send in the next round, so the
   * per-superstep cost tracks the relaxation frontier, not |E|. */
  def ssspWeighted[V](g: Graph[V, Double], source: VertexId,
      maxIter: Int = 50): Graph[Double, Double] = {
    val init = g.mapVertices((id, _) =>
      if (id == source) 0.0 else Double.PositiveInfinity)
    init.pregel(Double.PositiveInfinity, maxIterations = maxIter,
      activeDirection = EdgeDirection.Either)(
      (_, d, m) => math.min(d, m),
      t => {
        val fromSrc =
          if (t.srcAttr + t.attr < t.dstAttr)
            Iterator((t.dstId, t.srcAttr + t.attr)) else Iterator.empty
        val fromDst =
          if (t.dstAttr + t.attr < t.srcAttr)
            Iterator((t.srcId, t.dstAttr + t.attr)) else Iterator.empty
        fromSrc ++ fromDst
      },
      math.min)
  }

  /** (vid, dist) rows for vertices reached from `source`;
   * materialize-then-release like bfsHopsDF. */
  def ssspWeightedDF[V](g: Graph[V, Double], source: VertexId,
      maxIter: Int = 50): DataFrame = {
    val sp = ssspWeighted(g, source, maxIter)
    val reached = sp.vertices.filter(_._2 != Double.PositiveInfinity)
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(reached.map { case (id, d) => (id, d) })
      .toDF("vid", "dist").cache()
    df.count()
    sp.unpersistVertices(blocking = false)
    sp.edges.unpersist(blocking = false)
    df
  }

  /**
   * Eigenvector centrality by shifted power iteration: x' = (A+I)·x,
   * max-normalized each round. The +I shift keeps the dominant
   * eigenvector while breaking the period-2 oscillation pure A·x
   * exhibits on bipartite graphs (a star never converges without
   * it); max-normalization keeps the arithmetic inside +/· — no
   * sqrt, no libm. Each round is one message shuffle over the
   * edge set with both surfaces materialized before the previous
   * generation is released (the iterative-GraphX contract pinned in
   * PERF.md). Per-vertex sums fold the incoming contributions in
   * ascending sender-id order (see [[detFoldSums]]), so the float
   * result is BIT-IDENTICAL across partitionings and runs and the
   * DuckDB oracle can replay the recurrence exactly with an
   * order-preserving list fold; structural properties (hub
   * dominance, symmetry) are additionally pinned by unit tests.
   */
  def eigenCentrality[V: scala.reflect.ClassTag](
      g: Graph[V, Int], iters: Int = 20): Graph[Double, Int] = {
    val (scores, release) = eigenCentralityRDD(g, iters)
    val out = g.outerJoinVertices(scores)((_, _, s) => s.getOrElse(0.0))
    out.cache()
    out.vertices.count()
    release()
    out
  }

  /** Deterministic per-vertex float-sum engine: fold each
   * receiver's incoming contributions in ascending sender-id order.
   * Float addition is not associative, so a `reduceByKey(_ + _)`
   * sum depends on partitioning and merge order; fixing the fold
   * order makes the double result bit-identical across
   * partitionings, executor counts, and runs — and replayable in
   * SQL as a fold over `list(value ORDER BY sender)`.
   *
   * Loop-invariant surfaces, built ONCE per fixpoint (this replaced
   * a per-round `repartitionAndSortWithinPartitions` of the full
   * 2|E| message set — the round 8 bench's dominant det-family
   * cost; sorting is now paid once at build):
   *  - `inAdj`: per-receiver in-neighbor ids, ASCENDING — the fold
   *    order is frozen into the array;
   *  - `route`: per-sender (degree, distinct receiver PARTITIONS).
   * A round then ships each sender's single message value once per
   * receiver partition (≤ min(deg, P) copies — a 10^8-degree hub
   * ships P values instead of 10^8) and folds locally over the
   * pre-sorted arrays. Hub-safe on the receive side too: a hub's
   * contributions are read from the partition-local score map in
   * array order — no per-key shuffle buffer.
   *
   * `m.get` unboxing NPEs loudly if a neighbor's message is missing
   * (route and inAdj derive from the same edge set, so only a
   * routing bug could cause it) — never a silent 0.0. */
  private final case class DetFoldCtx(
      inAdj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      route: org.apache.spark.rdd.RDD[(Long, (Int, Array[Int]))],
      byPid: org.apache.spark.Partitioner,
      release: () => Unit)

  /** Build the loop-invariant fold surfaces from the DOUBLED edge
   * set (both RDDs partitioned by `p`, so rounds co-partition with
   * the score RDD). */
  private def detFoldCtx(
      sym: org.apache.spark.rdd.RDD[(Long, Long)],
      p: org.apache.spark.Partitioner): DetFoldCtx = {
    val inAdj = sym.groupByKey(p).mapValues { a =>
      val arr = a.toArray
      java.util.Arrays.sort(arr)
      arr
    }.persist()
    inAdj.count()
    // receiver partitions per sender, derived from the (symmetric)
    // adjacency locally — no extra shuffle
    val route = inAdj.mapValues { nbrs =>
      val bits = new java.util.BitSet(p.numPartitions)
      var i = 0
      while (i < nbrs.length) { bits.set(p.getPartition(nbrs(i))); i += 1 }
      val pids = new Array[Int](bits.cardinality())
      var k = 0
      var b = bits.nextSetBit(0)
      while (b >= 0) { pids(k) = b; k += 1; b = bits.nextSetBit(b + 1) }
      (nbrs.length, pids)
    }.persist()
    route.count()
    val byPid = new org.apache.spark.Partitioner {
      def numPartitions: Int = p.numPartitions
      def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    DetFoldCtx(inAdj, route, byPid, () => {
      inAdj.unpersist(blocking = false)
      route.unpersist(blocking = false)
      ()
    })
  }

  /** One deterministic-fold round: per-sender message value
   * `msgOf(score, degree)` shipped once per receiver partition,
   * folded per receiver in ascending sender order. Result is keyed
   * by receiver under `inAdj`'s partitioner. */
  private def detFoldRound(ctx: DetFoldCtx,
      cur: org.apache.spark.rdd.RDD[(Long, Double)])(
      msgOf: (Double, Int) => Double): org.apache.spark.rdd.RDD[(Long, Double)] = {
    val msgs = ctx.route.zipPartitions(cur) { (rIt, cIt) =>
      val m = new java.util.HashMap[Long, Double]()
      cIt.foreach(kv => m.put(kv._1, kv._2))
      rIt.flatMap { case (u, (deg, pids)) =>
        val s = msgOf(m.get(u), deg)
        pids.iterator.map(pid => (pid, (u, s)))
      }
    }.partitionBy(ctx.byPid)
    ctx.inAdj.zipPartitions(msgs, preservesPartitioning = true) { (aIt, sIt) =>
      val m = new java.util.HashMap[Long, Double]()
      sIt.foreach { case (_, (u, s)) => m.put(u, s) }
      aIt.map { case (v, nbrs) =>
        var acc = 0.0
        var i = 0
        while (i < nbrs.length) { acc += m.get(nbrs(i)); i += 1 }
        (v, acc)
      }
    }
  }

  /** Classic float PageRank (10 rounds of rank' = 0.15 + 0.85 ·
   * Σ_{u∈N(v)} rank(u)/deg(u) over the symmetrized graph, rank_0 =
   * 1.0) in the det family's loop shape: co-partitioned adjacency +
   * score pair RDDs, one message shuffle per round, per-round
   * materialization with generational release. The per-vertex sums
   * go through [[detFoldSums]], so unlike GraphX's staticPageRank
   * the double ranks are bit-identical across partitionings and
   * runs — which is what lets the DuckDB oracle replay the float
   * recurrence exactly (cf. the integer-exact [[pagerankDetRDD]]
   * twin; this is the float surface with the same reproducibility
   * contract). */
  def pagerankFloatRDD[V: scala.reflect.ClassTag](g: Graph[V, Int],
      iters: Int = 10): (org.apache.spark.rdd.RDD[(Long, Double)], () => Unit) = {
    val nEdges = g.edges.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(g.edges.getNumPartitions, (2 * nEdges / 500000L).toInt)))
    val ctx = detFoldCtx(
      g.edges.flatMap(e => Iterator((e.srcId, e.dstId), (e.dstId, e.srcId))), p)
    // lazy fixed-round chain, one job total (see pagerankDetRDD): no
    // round needs a driver-side scalar, so the final count() runs the
    // whole loop as `iters` chained shuffle stages instead of a
    // persist + count job per round. Doubles byte-identical — the
    // identical sender-sorted folds evaluate once, stagewise.
    var cur: org.apache.spark.rdd.RDD[(Long, Double)] = g.vertices
      .map { case (id, _) => (id, 1.0) }.partitionBy(p)
    var i = 0
    while (i < iters) {
      // share = rank/deg exactly like the oracle's rank/deg; the
      // division repeats per receiver PARTITION — same double.
      // Symmetric graph: every vertex has >= 1 neighbor, so the sum
      // covers the full vertex set — no dangling-vertex patch-up
      cur = detFoldRound(ctx, cur)((x, deg) => x / deg)
        .mapValues(s => 0.15 + 0.85 * s)
      i += 1
    }
    val last = cur.persist()
    last.count()
    (last, () => {
      ctx.release()
      last.unpersist(blocking = false)
      ()
    })
  }

  /** The power-iteration loop on co-partitioned pair RDDs: scores +
   * a per-partition adjacency hash map (built once). Every round is
   * inherently a full exchange (all scores change), but the RDD form
   * still skips the per-round GraphX graph rebuild and
   * vertex-attribute re-shipping: one message shuffle + one
   * normalization job per round. */
  private def eigenCentralityRDD[V](g: Graph[V, Int],
      iters: Int): (org.apache.spark.rdd.RDD[(Long, Double)], () => Unit) = {
    val nEdges = g.edges.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(g.edges.getNumPartitions, (2 * nEdges / 500000L).toInt)))
    val ctx = detFoldCtx(
      g.edges.flatMap(e => Iterator((e.srcId, e.dstId), (e.dstId, e.srcId))), p)
    // every vertex of g scores 1.0 initially, including isolated ones
    var cur: org.apache.spark.rdd.RDD[(Long, Double)] = g.vertices
      .map { case (id, _) => (id, 1.0) }.partitionBy(p).persist()
    cur.count()

    // ONE Spark job per round (the hitsDetRDD job-elision
    // discipline): the max-normalization needs a driver-side scalar,
    // so the round cannot be fully lazy — but the max-fold is the
    // round's ONLY action (it materializes the persisted raw
    // generation en route), and the normalized scores ride a LAZY
    // mapValues view over that cache. The previous raw generation is
    // fully materialized before its successor's fold returns, so it
    // is released right after; the FINAL round materializes a
    // concrete persisted RDD so the release() contract keeps
    // working. Doubles byte-identical — same ops, same order.
    var backer: org.apache.spark.rdd.RDD[(Long, Double)] = cur
    var i = 0
    while (i < iters) {
      // deterministic sender-sorted fold (see detFoldCtx) — the
      // float sums are order-free: bit-identical across
      // partitionings and replayable by the DuckDB oracle's ordered
      // list fold
      val sums = detFoldRound(ctx, cur)((x, _) => x)
      // x' = (A+I)x: the self term keeps isolated vertices and breaks
      // bipartite oscillation. cur and sums share partitioner p, so
      // the merge is a zipPartitions hash join (same doubles, no
      // cogroup buffers — the det-family round's measured win)
      val raw = cur.zipPartitions(sums, preservesPartitioning = true) { (cIt, sIt) =>
        val m = new java.util.HashMap[Long, Double]()
        sIt.foreach(kv => m.put(kv._1, kv._2))
        cIt.map { case (id, own) => (id, own + m.getOrDefault(id, 0.0)) }
      }
      raw.persist()
      val mx = math.max(raw.map(_._2).fold(0.0)(math.max), Double.MinPositiveValue)
      backer.unpersist(blocking = false) // raw fully materialized above
      backer = raw
      cur = raw.mapValues(_ / mx)
      i += 1
    }
    if (iters > 0) {
      cur = cur.persist()
      cur.count()
      backer.unpersist(blocking = false)
    }
    val finalScores = cur
    (cur, () => {
      finalScores.unpersist(blocking = false)
      ctx.release()
      ()
    })
  }

  /** (vid, score) rows rounded to 1e-6; materialize-then-release. */
  def eigenCentralityDF[V: scala.reflect.ClassTag](
      g: Graph[V, Int], iters: Int = 20): DataFrame = {
    val (scores, release) = eigenCentralityRDD(g, iters)
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(
      scores.map { case (id, s) => (id, math.floor(s * 1e6 + 0.5) / 1e6) })
      .toDF("vid", "score").cache()
    df.count()
    release()
    df
  }

  /**
   * Connected components as PURE relational iteration — the
   * alternating large-star / small-star contraction of Kiveris et
   * al., "Connected Components in MapReduce and Beyond" (SOCC 2014):
   *
   *  - large-star: every neighbor LARGER than u re-attaches to u's
   *    current minimum m(u) = min(N(u) ∪ {u});
   *  - small-star: every neighbor at most u re-attaches to m(u).
   *
   * Each half-round is one groupBy(min) + one join + one projection
   * — no Pregel, no vertex state, and the edge set contracts toward
   * star graphs rooted at component minima in O(log n) rounds (vs
   * O(diameter) for plain min-label propagation). The same
   * generational-release discipline as ktrussPeel: each round's RDD
   * is persisted explicitly, the superseded one freed, because the
   * union-free but twice-referenced lineage would otherwise grow
   * exponentially.
   *
   * Input: canonical (src < dst) edges. Output: (vid, component)
   * with component = the component's minimum vertex id — identical
   * to [[connectedComponentsDF]]'s GraphX result, which is what
   * makes the two implementations cross-checkable under one oracle.
   */
  /** Two-phase CC result: per-vertex labels (cached — call
   * `release()` when done), the round count, and whether the
   * star-contraction fixpoint was reached within the round budget.
   * A non-converged run can carry WRONG labels (the min-per-vid
   * fallback merges whatever the last round produced), so callers
   * must check `converged` — the query wrapper throws on it. */
  final case class CCTwoPhase(labels: DataFrame, rounds: Int, converged: Boolean,
      release: () => Unit)

  /** `materializeLargeStar = false` is a TEST-CALIBRATION knob only
   * (ADVICE r18): LoopPlanGuardSpec pins the materialization win as a
   * same-JVM RATIO between the two regimes — absolute shuffle-record
   * counts drift with Spark/AQE versions, a ratio cancels that drift.
   * Production callers must leave it true (the lazy regime replays the
   * large-star's shuffles once per small-star reference). */
  def connectedComponentsTwoPhase(canonical: DataFrame, maxRounds: Int = 25,
      materializeLargeStar: Boolean = true): CCTwoPhase = {
    val spark = canonical.sparkSession
    import org.apache.spark.storage.StorageLevel
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // star step: the selected neighbors of u re-attach to
    // m(u) = min(N(u) ∪ {u}); small-star additionally attaches u
    // itself (a hub whose neighbors are all smaller would otherwise
    // detach — its own edges are large-star's responsibility only
    // from the smaller endpoints' perspective)
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val m = sym(e).groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("u"), least(col("mn"), col("src")).as("m"))
      val nbrs = if (large) sym(e).where(col("dst") > col("src"))
        else sym(e).where(col("dst") <= col("src"))
      val reattached = nbrs.join(m, nbrs("src") === m("u"))
        .select(col("dst"), col("m"))
      val withSelf = if (large) reattached
        else reattached.union(m.select(col("u").as("dst"), col("m")))
      withSelf
        .where(col("dst") =!= col("m"))
        .select(least(col("dst"), col("m")).as("src"),
          greatest(col("dst"), col("m")).as("dst"))
        .distinct()
    }
    var cur = canonical.select("src", "dst")
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    // hoisted so the failure path can release the in-flight round's
    // persists (review r17: a failed round job otherwise leaves up to
    // three MEMORY_AND_DISK generations pinned for the session)
    var curLarge: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    var curRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    var outDf: DataFrame = null
    var stable = false
    var round = 0
    try {
    var curN = cur.count()
    while (!stable && round < maxRounds) {
      // materialize the large-star half-round: the small-star plan
      // references its input FOUR times (sym doubles it for the min
      // side and again for the neighbor side), and Catalyst does not
      // dedupe unmaterialized common subplans — without this cache
      // the large-star's shuffles replay once per reference
      val largePlan = star(cur, large = true)
      val largeDf = if (materializeLargeStar) {
        curLarge = largePlan.rdd.persist(StorageLevel.MEMORY_AND_DISK)
        spark.createDataFrame(curLarge, largePlan.schema)
      } else largePlan
      val nextPlan = star(largeDf, large = false)
      curRdd = nextPlan.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val next = spark.createDataFrame(curRdd, nextPlan.schema)
      val nextN = curRdd.count()
      if (curLarge != null) // superseded once next is cached
        curLarge.unpersist(blocking = false)
      curLarge = null
      // fixpoint: the star steps are idempotent on a forest of
      // depth-1 stars, so an unchanged edge COUNT at these semantics
      // means an unchanged edge set (both steps only ever lower dst
      // labels; equal cardinality with monotone relabeling = no move)
      stable = nextN == curN && next.except(cur).isEmpty
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = curRdd
      curRdd = null
      cur = next
      curN = nextN
      round += 1
    }
    // at the fixpoint every edge is (componentMin, member)
    val members = cur.select(col("dst").as("vid"), col("src").as("component"))
    val roots = cur.select(col("src").as("vid"), col("src").as("component"))
      .distinct()
    val out = members.union(roots)
      .groupBy("vid").agg(min(col("component")).as("component"))
      .cache()
    outDf = out
    out.count()
    val last = prevRdd
    if (last != null) last.unpersist(blocking = false)
    CCTwoPhase(out, round, stable, () => { out.unpersist(blocking = false); () })
    } catch {
      case t: Throwable =>
        // swallowed cleanup failures: a throwing unpersist (stopped
        // context — often the root cause itself) must not mask `t`
        try {
          if (curLarge != null) curLarge.unpersist(blocking = false)
          if (curRdd != null) curRdd.unpersist(blocking = false)
          if (prevRdd != null) prevRdd.unpersist(blocking = false)
          if (outDf != null) outDf.unpersist(blocking = false)
        } catch { case _: Throwable => () }
        throw t
    }
  }

  /** K-truss fixpoint result: the surviving canonical edges (backed
   * by a persisted RDD — call [[KTruss.release]] when done, plain
   * DataFrame.unpersist cannot free it), the round-1 survivor count,
   * and whether the peel loop reached its fixpoint within the round
   * budget. */
  final case class KTruss(edges: DataFrame, r1Count: Long, converged: Boolean,
      release: () => Unit)

  /** Merge-scan intersection of two sorted distinct Long arrays,
   * returning the COMMON ELEMENTS (the delta peel needs the triangle
   * apexes, not just their count). */
  /** Merge-scan intersection COUNT over two sorted distinct Long
   * arrays (the plain-Scala twin of the native `intersect_count`
   * expression, local to the RDD loops here). */
  private[graph] def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** `a` minus `rm` over sorted distinct Long arrays; result stays
   * sorted (the k-truss overlay's lazy neighbor removal). */
  private[graph] def sortedRemove(a: Array[Long], rm: Array[Long]): Array[Long] = {
    if (rm.isEmpty) return a
    val out = new scala.collection.mutable.ArrayBuffer[Long](a.length)
    var i = 0; var j = 0
    while (i < a.length) {
      val x = a(i)
      while (j < rm.length && rm(j) < x) j += 1
      if (j < rm.length && rm(j) == x) { i += 1; j += 1 }
      else { out += x; i += 1 }
    }
    out.toArray
  }

  /** Union of two sorted distinct Long arrays, sorted distinct —
   * associative, so safe as a reduceByKey merge. */
  private[graph] def sortedMergeDistinct(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](a.length + b.length)
    var i = 0; var j = 0
    while (i < a.length || j < b.length) {
      if (j >= b.length || (i < a.length && a(i) < b(j))) { out += a(i); i += 1 }
      else if (i >= a.length || b(j) < a(i)) { out += b(j); j += 1 }
      else { out += a(i); i += 1; j += 1 }
    }
    out.toArray
  }

  private[graph] def sortedIntersect(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.min(a.length, b.length))
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { out += x; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    out.toArray
  }

  /**
   * Co-locate the two CURRENT adjacency arrays of every query edge
   * (u, v) and apply `f(u, v, nu, nv)` where they meet — WITHOUT
   * ever shipping a hub-sized array blind. Each edge is routed so
   * the SMALLER endpoint array (ties by vertex id) travels to the
   * larger endpoint's partition: shipped bytes are
   * Σ min(deg_u, deg_v) — the arboricity-type bound that stays
   * near-linear on power-law graphs — where a fixed ship-the-src
   * side pays Σ deg(src), whose hub term is O(hub²) (the 10x Zipf
   * probe measured the old k-truss shape OOMing on exactly that).
   *
   * Protocol, one constant-width hop per line except the single
   * min-array ship:
   *   1. at u: attach deg(u)                  → (v, (u, du))
   *   2. at v: if (dv, v) < (du, u) ship N(v) → (u, (v, N(v)))
   *      else request N(u)                    → (u, (v, null))
   *   3. at u: shipped N(v) → f(u, v, N(u), N(v)) emitted here;
   *      request → forward N(u)               → (v, (u, N(u)))
   *   4. at v: f(u, v, N(u), N(v)) for the forwarded half
   * Hop 3's tagged output is persisted (it feeds both the local
   * results and the forwards); the returned release() frees it once
   * the caller has materialized the result. Exactly one f record is
   * produced per query edge. `adj` must be partitioned by `pv` and
   * contain every query endpoint (both derive from the same edge
   * set; a missing endpoint indicates a routing bug upstream).
   */
  private def coLocatedIntersect[T: scala.reflect.ClassTag](
      queries: org.apache.spark.rdd.RDD[(Long, Long)],
      adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      pv: org.apache.spark.Partitioner)(
      f: (Long, Long, Array[Long], Array[Long]) => T)
    : (org.apache.spark.rdd.RDD[T], () => Unit) = {
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    import scala.jdk.CollectionConverters._
    // Routing invariant, enforced LOUDLY: every query endpoint must
    // have an adjacency slot on its partition. The lookups below are
    // adjacency-driven, so a missing endpoint would silently drop
    // the query (and in ktrussPeel silently lose support records —
    // a quietly wrong truss). After the adjacency side is exhausted,
    // any unconsumed query entry throws at materialization time —
    // zero extra Spark jobs, same loud-or-correct discipline as the
    // coreness round-0 NPE.
    def drained[A](m: java.util.HashMap[Long, _], what: String)(
        it: Iterator[A]): Iterator[A] =
      it ++ new Iterator[A] {
        def hasNext: Boolean = {
          if (!m.isEmpty)
            throw new IllegalStateException(
              s"coLocatedIntersect: ${m.size} $what entries reference " +
                s"vertices absent from the adjacency (first: ${m.keySet.iterator.next()})")
          false
        }
        def next(): A = Iterator.empty.next()
      }
    // hop 1 (at u): attach deg(u)
    val byU = queries.partitionBy(pv)
    val withDu: RDD[(Long, (Long, Int))] = adj.zipPartitions(byU) { (aIt, eIt) =>
      val m = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
      eIt.foreach { case (u, v) =>
        var l = m.get(u)
        if (l == null) { l = new java.util.ArrayList[Long](); m.put(u, l) }
        l.add(v)
      }
      drained(m, "query-src")(aIt.flatMap { case (u, nu) =>
        val l = m.remove(u)
        if (l == null) Iterator.empty
        else l.asScala.iterator.map(v => (v, (u, nu.length)))
      })
    }.partitionBy(pv)
    // hop 2 (at v): the smaller side by (deg, id) ships, the larger
    // side hosts; a null array is the "please ship N(u) back" marker
    val decided: RDD[(Long, (Long, Array[Long]))] =
      adj.zipPartitions(withDu) { (aIt, qIt) =>
        val m = new java.util.HashMap[Long, java.util.ArrayList[(Long, Int)]]()
        qIt.foreach { case (v, ud) =>
          var l = m.get(v)
          if (l == null) { l = new java.util.ArrayList[(Long, Int)](); m.put(v, l) }
          l.add(ud)
        }
        drained(m, "query-dst")(aIt.flatMap { case (v, nv) =>
          val l = m.remove(v)
          if (l == null) Iterator.empty
          else l.asScala.iterator.map { case (u, du) =>
            val vSmaller = nv.length < du || (nv.length == du && v < u)
            if (vSmaller) (u, (v, nv)) else (u, (v, null: Array[Long]))
          }
        })
      }.partitionBy(pv)
    // hop 3 (at u): resolve shipped arrays locally, forward N(u) for
    // the requests. Tagged rows: done=true carries (u, v, result
    // inputs applied); done=false carries (v, u, N(u)) to hop 4.
    val hop3: RDD[(Boolean, Long, Long, Array[Long], Any)] =
      adj.zipPartitions(decided) { (aIt, dIt) =>
        val m = new java.util.HashMap[Long, java.util.ArrayList[(Long, Array[Long])]]()
        dIt.foreach { case (u, vn) =>
          var l = m.get(u)
          if (l == null) { l = new java.util.ArrayList[(Long, Array[Long])](); m.put(u, l) }
          l.add(vn)
        }
        aIt.flatMap { case (u, nu) =>
          val l = m.get(u)
          if (l == null) Iterator.empty
          else l.asScala.iterator.map { case (v, nvOrNull) =>
            if (nvOrNull != null)
              (true, u, v, null: Array[Long], f(u, v, nu, nvOrNull))
            else (false, v, u, nu, null)
          }
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)
    val resLocal = hop3.filter(_._1).map(_._5.asInstanceOf[T])
    val fwd: RDD[(Long, (Long, Array[Long]))] = hop3
      .filter(!_._1)
      .map { case (_, v, u, nu, _) => (v, (u, nu)) }
      .partitionBy(pv)
    // hop 4 (at v): the forwarded half
    val resFwd: RDD[T] = adj.zipPartitions(fwd) { (aIt, fIt) =>
      val m = new java.util.HashMap[Long, java.util.ArrayList[(Long, Array[Long])]]()
      fIt.foreach { case (v, un) =>
        var l = m.get(v)
        if (l == null) { l = new java.util.ArrayList[(Long, Array[Long])](); m.put(v, l) }
        l.add(un)
      }
      aIt.flatMap { case (v, nv) =>
        val l = m.get(v)
        if (l == null) Iterator.empty
        else l.asScala.iterator.map { case (u, nu) => f(u, v, nu, nv) }
      }
    }
    (resLocal.union(resFwd), () => { hop3.unpersist(blocking = false); () })
  }

  /**
   * K-truss peel, full-recompute form: each round rebuilds the
   * survivor adjacency (groupBy over the symmetrized survivors) and
   * re-intersects EVERY surviving edge's endpoint neighbor lists —
   * O(|E| + Σdeg) shuffled rows per round regardless of how few
   * edges the round deletes. Kept as the semantic anchor for the
   * delta peel's parity spec; [[ktrussPeel]] is the production path.
   */
  def ktrussPeelRecompute(canonical: DataFrame, k: Int = 4, maxRounds: Int = 30): KTruss = {
    import org.apache.spark.sql.graft.GraftExpressions.intersectCount
    val spark = canonical.sparkSession
    var cur = canonical.select("src", "dst")
    var r1N = -1L
    var converged = false
    var round = 0
    var keepDf: DataFrame = cur
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    // hoisted for the failure path (review r17, same class as the
    // two-phase CC loop): a failed round job must not leave the
    // in-flight or previous generation pinned for the session
    var curRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    try {
    var curN = cur.count()
    while (!converged && round < maxRounds) {
      val sym = cur.union(
        cur.select(col("dst").as("src"), col("src").as("dst")))
      val adj = sym.groupBy(col("src").as("vid"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      // Cut the logical lineage EVERY round by persisting the round's
      // row RDD and wrapping it in a fresh LogicalRDD: `cur` appears
      // twice per round (union with its swap), so an uncut plan
      // DOUBLES each round — 2^rounds nodes; at sf0.1 the analyzer
      // hit a 2 GiB plan string around round 30. An explicit RDD
      // (unlike localCheckpoint, whose blocks DataFrame.unpersist
      // cannot release) lets each superseded generation be freed —
      // leaked generations evicted every cached graph downstream and
      // doubled the whole graph suite's bench.
      val keepPlan = cur
        .join(adj.select(col("vid").as("src"), col("nbrs").as("na")), "src")
        .join(adj.select(col("vid").as("dst"), col("nbrs").as("nb")), "dst")
        .select(col("src"), col("dst"),
          intersectCount(col("na"), col("nb")).as("support"))
        .where(col("support") >= k - 2)
      curRdd = keepPlan.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      keepDf = spark.createDataFrame(curRdd, keepPlan.schema)
      val keepN = curRdd.count()
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = curRdd
      curRdd = null
      if (round == 0) r1N = keepN
      converged = keepN == curN
      curN = keepN
      cur = keepDf.select("src", "dst")
      round += 1
    }
    val last = prevRdd
    KTruss(keepDf, r1N, converged,
      () => if (last != null) { last.unpersist(blocking = false); () })
    } catch {
      case t: Throwable =>
        // swallowed cleanup failures — same contract as the CC loop
        try {
          if (curRdd != null) curRdd.unpersist(blocking = false)
          if (prevRdd != null) prevRdd.unpersist(blocking = false)
        } catch { case _: Throwable => () }
        throw t
    }
  }

  /**
   * K-truss peel, delta form (the production path): supports are
   * computed ONCE over the full edge set, then each round only
   * enumerates the triangles that DIE — those through this round's
   * deleted edges — and decrements the two surviving edges of each
   * dead triangle. Identical synchronous fixpoint to
   * [[ktrussPeelRecompute]] (parity-pinned by KTrussSpec): with
   * S_r the round-r survivor set and sup_r taken w.r.t. S_r,
   * a surviving edge (u,w) loses exactly the S_r-triangles
   * (u,w,x) with (u,x) or (w,x) deleted, each counted once
   * (dedup by triangle id — a triangle with TWO deleted edges
   * still decrements its surviving edge by one).
   *
   * Scale shape: round 0 is the one full pass (adjacency groupBy +
   * per-edge merge-scan intersect, the same O(|E| + Σdeg) exchange
   * as one recompute round); every later round costs O(|S| scan)
   * for the co-partitioned zipPartitions merges plus work
   * proportional to the DELETED edges' degree sums — on a peel
   * whose deletions shrink geometrically this turns ~30 full
   * passes into ~1 plus change. State (supports keyed by edge,
   * adjacency keyed by vertex) lives on pair RDDs under fixed
   * HashPartitioners with the generational persist/release
   * discipline of every other loop here; messages (deleted edges,
   * triangle decrements, adjacency removals) are frontier-sized
   * and always the hashed side of a zipPartitions merge, never a
   * cogroup over the full state.
   *
   * PRECONDITION for the [[coLocatedIntersect]] hops (ADVICE r10):
   * every intersect query's endpoints must appear in the adjacency
   * the call is given. Both call sites here satisfy it by
   * construction (round 0 queries the edge set its own adjacency was
   * built from; the delta rounds query survivor edges against the
   * survivor adjacency) — coLocatedIntersect enforces it LOUDLY with
   * an IllegalStateException deep in a zipPartitions iterator, so a
   * future caller whose queries are NOT derived from the adjacency's
   * edge set (degree-0 or external vertices) must pre-filter its
   * queries against the adjacency's vertex set rather than expect
   * empty results for the missing endpoints.
   */
  def ktrussPeel(canonical: DataFrame, k: Int = 4, maxRounds: Int = 30): KTruss = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = canonical.sparkSession
    // probe-only phase timing (graft.ktruss.log=on or env
    // SPARK_GRAFT_KTRUSS_LOG=on): attributes the peel's wall to
    // round-0 support vs the per-round delta phases — the r18 10x
    // slope (6.4x per 5x volume) needed exactly this split
    val logOn = sys.props.get("graft.ktruss.log")
      .orElse(sys.env.get("SPARK_GRAFT_KTRUSS_LOG")).contains("on")
    var tMark = System.nanoTime()
    def tlog(msg: => String): Unit = if (logOn) {
      val now = System.nanoTime()
      System.err.println(
        f"[graft-ktruss] $msg (${(now - tMark) / 1e9}%.2f s)")
      tMark = now
    }
    val edges0 = canonical.select("src", "dst").rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nE = edges0.count()
    val parts = math.max(8, math.min(edges0.getNumPartitions,
      math.max(1, (2 * nE / 500000L).toInt)))
    val pv = new HashPartitioner(parts) // vertex-keyed state
    val pe = new HashPartitioner(parts) // edge-keyed state

    // A_0: sorted distinct neighbor arrays over the full edge set
    var adj: RDD[(Long, Array[Long])] = edges0
      .flatMap { case (u, v) => Iterator((u, v), (v, u)) }
      .groupByKey(pv)
      .mapValues { it => val a = it.toArray; java.util.Arrays.sort(a); a }
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    tlog(s"adjacency built (|E|=$nE, parts=$parts)")

    // sup_0: both endpoint arrays co-located with min-side shipping
    // (see coLocatedIntersect) — exactly one support record per
    // edge, Σ min(deg_u, deg_v) shipped bytes, hub-safe where the
    // old ship-N(src)-to-dst pass paid O(hub²) on skewed graphs
    val (sup0, rel0) = coLocatedIntersect(edges0, adj, pv) {
      (u, v, nu, nv) => ((u, v), sortedIntersectCount(nu, nv))
    }
    var base: RDD[((Long, Long), Int)] =
      sup0.partitionBy(pe).persist(StorageLevel.MEMORY_AND_DISK)
    var survivors = base.count()
    rel0()
    edges0.unpersist(blocking = false)
    tlog(s"round-0 supports ($survivors edges)")

    // OVERLAY STATE (VERDICT r18 item 2): the r17 shape re-persisted
    // the FULL survivor state and adjacency every round, so a tail
    // round deleting 40 edges still rewrote 11M cached entries —
    // per-round cost ∝ survivors, the one super-linear trend on the
    // r18 10x board (and at cluster scale, a full TB-state rewrite
    // per peel round). Instead the persisted `base`/`adj` stay fixed
    // while two SMALL persisted overlays accumulate the peel's
    // effects — `mods` (per-edge cumulative decrement + deleted
    // flag) and `remAdj` (per-vertex removed-neighbor arrays) — and
    // the effective state/adjacency are 1-level zipPartitions views
    // (read-only scans, no cache writes). When the overlay exceeds
    // 1/8 of the live edges, base and adjacency are compacted (the
    // old full rewrite) and the overlays reset — so heavy early
    // rounds behave as before while the geometric tail pays only
    // frontier-sized writes. Live cache footprint stays constant
    // (base + one overlay generation, each persisted and counted
    // before the previous is released); lineage still CHAINS through
    // the unpersisted generations, so a cached-block loss late in
    // the peel recomputes through the overlay/union chain — same
    // exposure as the old per-round state chain, nil in local mode;
    // checkpoint at compaction points if executor-loss recovery
    // matters (ADVICE r19).
    def emptyMods(): RDD[((Long, Long), (Int, Boolean))] =
      spark.sparkContext.emptyRDD[((Long, Long), (Int, Boolean))].partitionBy(pe)
    def emptyRem(): RDD[(Long, Array[Long])] =
      spark.sparkContext.emptyRDD[(Long, Array[Long])].partitionBy(pv)
    var mods: RDD[((Long, Long), (Int, Boolean))] = emptyMods()
    var modsN = 0L
    var remAdj: RDD[(Long, Array[Long])] = emptyRem()

    // effective survivor state: base minus deleted, supports less
    // cumulative decrements
    def effState(b: RDD[((Long, Long), Int)],
        m: RDD[((Long, Long), (Int, Boolean))]): RDD[((Long, Long), Int)] =
      b.zipPartitions(m, preservesPartitioning = true) { (sIt, mIt) =>
        val mm = new java.util.HashMap[(Long, Long), (Int, Boolean)]()
        mIt.foreach { case (e, v) => mm.put(e, v) }
        if (mm.isEmpty) sIt
        else sIt.flatMap { case (e, s) =>
          val mod = mm.get(e)
          if (mod == null) Iterator.single((e, s))
          else if (mod._2) Iterator.empty
          else Iterator.single((e, s - mod._1))
        }
      }
    // effective adjacency: removed neighbors stripped, every vertex
    // slot KEPT (even when its array empties) — coLocatedIntersect's
    // loud routing check requires a slot for every query endpoint
    def effAdj(a: RDD[(Long, Array[Long])],
        r: RDD[(Long, Array[Long])]): RDD[(Long, Array[Long])] =
      a.zipPartitions(r, preservesPartitioning = true) { (aIt, rIt) =>
        val mm = new java.util.HashMap[Long, Array[Long]]()
        rIt.foreach { case (v, arr) => mm.put(v, arr) }
        if (mm.isEmpty) aIt
        else aIt.map { case (v, nbrs) =>
          val rm = mm.get(v)
          if (rm == null) (v, nbrs) else (v, sortedRemove(nbrs, rm))
        }
      }

    var r1N = -1L
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val d = effState(base, mods).filter(_._2 < k - 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nD = d.count()
      tlog(s"round $round: delete-set scan (nD=$nD)")
      if (nD == 0L) {
        converged = true
        if (r1N < 0) r1N = survivors
        d.unpersist(blocking = false)
      } else {
        // dead triangles: for each deleted (u,v), the apexes
        // x ∈ N(u) ∩ N(v) in A_r (min-side-shipped co-location, same
        // hub-safety as sup_0); each dead triangle decrements its
        // OTHER two edges, dedup'd by (edge, triangle). A_r (this
        // round's effective adjacency) still CONTAINS this round's
        // deleted edges — decrements landing on them are dropped by
        // the deleted flag, exactly as the old physical filter did.
        val (dApex, relD) = coLocatedIntersect(
          d.map { case ((u, v), _) => (u, v) }, effAdj(adj, remAdj), pv) {
          (u, v, nu, nv) => ((u, v), sortedIntersect(nu, nv))
        }
        val dec: RDD[((Long, Long), Int)] = dApex
          .flatMap { case ((u, v), apexes) =>
            apexes.iterator.flatMap { x =>
              // triangle (u,v,x) with (u,v) deleted; other edges
              val e1 = (math.min(u, x), math.max(u, x))
              val e2 = (math.min(v, x), math.max(v, x))
              val a = math.min(u, math.min(v, x))
              val c = math.max(u, math.max(v, x))
              val b = u + v + x - a - c
              Iterator((e1, (a, b, c)), (e2, (a, b, c)))
            }
          }.distinct(parts)
          .map { case (e, _) => (e, 1) }
          .reduceByKey(pe, _ + _)
        // fold this round's deletions + decrements into the overlay
        // (frontier-sized shuffle; the only cache WRITE of the round)
        val newMods = mods
          .union(dec.map { case (e, c) => (e, (c, false)) })
          .union(d.map { case (e, _) => (e, (0, true)) })
          .reduceByKey(pe, (x: (Int, Boolean), y: (Int, Boolean)) =>
            (x._1 + y._1, x._2 || y._2))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val newModsN = newMods.count()
        relD()
        survivors -= nD
        if (round == 0) r1N = survivors
        tlog(s"round $round: nD=$nD, survivors -> $survivors, overlay=$newModsN")
        // removed-neighbor overlay: merge this round's deleted pairs
        val remNew: RDD[(Long, Array[Long])] = d
          .flatMap { case ((u, v), _) => Iterator((u, Array(v)), (v, Array(u))) }
        val newRemAdj = remAdj.union(remNew)
          .reduceByKey(pv, sortedMergeDistinct _)
          .persist(StorageLevel.MEMORY_AND_DISK)
        newRemAdj.count()
        tlog(s"round $round: removed-adjacency folded")
        mods.unpersist(blocking = false)
        remAdj.unpersist(blocking = false)
        d.unpersist(blocking = false)
        mods = newMods
        modsN = newModsN
        remAdj = newRemAdj
        // compact when the overlay stops being small relative to the
        // live state: heavy rounds rewrite (as the old shape always
        // did), the geometric tail never does
        if (modsN * 8 > survivors) {
          val nb = effState(base, mods).persist(StorageLevel.MEMORY_AND_DISK)
          nb.count()
          val na = effAdj(adj, remAdj).persist(StorageLevel.MEMORY_AND_DISK)
          na.count()
          base.unpersist(blocking = false)
          adj.unpersist(blocking = false)
          mods.unpersist(blocking = false)
          remAdj.unpersist(blocking = false)
          base = nb
          adj = na
          mods = emptyMods()
          remAdj = emptyRem()
          modsN = 0L
          tlog(s"round $round: compacted (base=$survivors)")
        }
      }
      round += 1
    }
    // final state: materialize the overlay view BEFORE releasing its
    // parents (an unpersisted parent would silently recompute the
    // whole peel from the source on the caller's first action)
    val finalState = effState(base, mods)
      .persist(StorageLevel.MEMORY_AND_DISK)
    finalState.count()
    base.unpersist(blocking = false)
    mods.unpersist(blocking = false)
    remAdj.unpersist(blocking = false)
    adj.unpersist(blocking = false)
    val edgesDf = spark.createDataFrame(
      finalState.map { case ((u, v), s) => (u, v, s) })
      .toDF("src", "dst", "support")
    if (r1N < 0) r1N = survivors
    KTruss(edgesDf, r1N, converged,
      () => { finalState.unpersist(blocking = false); () })
  }

  /**
   * Minimum spanning forest via distributed Borůvka over a
   * canonical (u < v, distinct) edge set with integer nano-unit
   * lengths. Edges are compared by the strict total order
   * (len, u, v), which makes every weight distinct, so (a) the MSF
   * is UNIQUE — a deterministic, engine-independent contract like
   * the det fixpoint family's — and (b) every cycle in a round's
   * component→min-edge parent digraph is a 2-cycle (the classic
   * Borůvka argument: a longer choice cycle needs non-increasing
   * weights all the way around, impossible when they're distinct),
   * so cycle-breaking is a single parent-of-parent join.
   *
   * Loop shape: the candidate set entering a round is the previous
   * round's surviving cross edges, partition-aligned on one
   * endpoint (alternating u/v) — annotating that endpoint is a
   * shuffle-free zipPartitions hash-merge, so a round costs exactly
   * one |cross|-sized re-key shuffle plus the min-edge reduce; the
   * parent forest is collapsed by pointer doubling (O(log depth)
   * joins over the component-sized — i.e. geometrically shrinking —
   * parent map). Components at least halve per round, so the whole
   * peel is O(log |V|) rounds over a shrinking edge set: the
   * textbook scale shape for distributed MSF. All state lives on
   * pair RDDs under one fixed HashPartitioner with generational
   * persist/release.
   *
   * Returns (msfEdges (u, v, lenNano), labels (vid → component as
   * min member vid), release).
   */
  def boruvkaMsfRDD(edges: org.apache.spark.rdd.RDD[(Long, Long, Long)],
      maxRounds: Int = 40): (org.apache.spark.rdd.RDD[(Long, Long, Long)],
        org.apache.spark.rdd.RDD[(Long, Long)], () => Unit) = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val nE = edges.count()
    val parts = math.max(8, math.min(edges.getNumPartitions,
      math.max(1, (2 * nE / 500000L).toInt)))
    val pv = new HashPartitioner(parts)

    // Surviving candidate edge set. Labels only coarsen, so an edge
    // internal to a component once is internal forever: each
    // round's input is the previous round's cross set, which the
    // previous round left PARTITION-ALIGNED on one endpoint
    // (zipPartitions zips by partition index, so alignment — not a
    // partitioner object — is all the hash-merge lookup needs).
    // The alignment endpoint alternates per round (u, v, u, ...):
    // annotating the aligned endpoint is shuffle-free, so a round
    // costs exactly ONE |cross|-sized re-key shuffle — round 1 pays
    // it for the full set, later rounds only for the survivors.
    val eByU: RDD[(Long, (Long, Long, Long))] = edges
      .map { case (u, v, len) => (u, (u, v, len)) }
      .partitionBy(pv).persist(StorageLevel.MEMORY_AND_DISK)
    eByU.count()
    var curEdges: RDD[(Long, (Long, Long, Long))] = eByU
    var curN = nE
    var keyIsU = true

    var labels: RDD[(Long, Long)] = eByU
      .flatMap { case (_, (u, v, _)) => Iterator(u, v) }
      .distinct(parts).map(v => (v, v))
      .partitionBy(pv).persist()
    labels.count()

    // strict total order on edges: (len, u, v)
    def less(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = {
      val (u1, v1, l1) = a; val (u2, v2, l2) = b
      l1 < l2 || (l1 == l2 && (u1 < u2 || (u1 == u2 && v1 < v2)))
    }

    val chosen = scala.collection.mutable.ArrayBuffer.empty[RDD[(Long, Long, Long)]]
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // annotate the aligned endpoint shuffle-free, re-key to the
      // other endpoint (the round's one cross-sized shuffle),
      // annotate it, and keep only the still-cross edges
      val kIsU = keyIsU
      val ann1 = labels.zipPartitions(curEdges) { (lIt, eIt) =>
        val m = new java.util.HashMap[Long, Long]()
        lIt.foreach(kv => m.put(kv._1, kv._2))
        eIt.map { case (_, e) =>
          val k1 = if (kIsU) e._1 else e._2
          val k2 = if (kIsU) e._2 else e._1
          (k2, (e, m.get(k1)))
        }
      }.partitionBy(pv)
      // records (k2, e, l1, l2) stay physically in k2's partitions
      val cross = labels.zipPartitions(ann1) { (lIt, eIt) =>
        val m = new java.util.HashMap[Long, Long]()
        lIt.foreach(kv => m.put(kv._1, kv._2))
        eIt.flatMap { case (k2, (e, l1)) =>
          val l2 = m.get(k2)
          if (l1 == l2) Iterator.empty
          else Iterator((k2, e, l1, l2))
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)
      if (cross.isEmpty()) {
        converged = true
        cross.unpersist(blocking = false)
      } else {
        // min cross edge per component, by the strict total order
        val minEdge: RDD[(Long, ((Long, Long, Long), Long))] = cross
          .flatMap { case (_, e, l1, l2) =>
            Iterator((l1, (e, l2)), (l2, (e, l1))) }
          .reduceByKey(pv, (a, b) => if (less(a._1, b._1)) a else b)
          .persist()
        val sel = minEdge.map(_._2._1).distinct(parts)
          .persist(StorageLevel.MEMORY_AND_DISK)
        sel.count()
        chosen += sel

        // parent digraph over component labels; break 2-cycles at
        // the smaller endpoint, then collapse by pointer doubling
        val parent0: RDD[(Long, Long)] = minEdge
          .map { case (c, (_, other)) => (c, other) }.partitionBy(pv)
        val pOfP = parent0.map(_.swap).partitionBy(pv)
          .zipPartitions(parent0) { (sIt, pIt) =>
            val m = new java.util.HashMap[Long, Long]()
            pIt.foreach(kv => m.put(kv._1, kv._2))
            sIt.map { case (p, c) => (c, (p, m.get(p))) }
          }
        var ptr: RDD[(Long, Long)] = pOfP.map { case (c, (p, pp)) =>
          if (pp == c) (c, math.min(c, p)) else (c, p)
        }.partitionBy(pv).persist()
        ptr.count()
        minEdge.unpersist(blocking = false)

        var jumping = true
        while (jumping) {
          val next = ptr.map(_.swap).partitionBy(pv)
            .zipPartitions(ptr) { (sIt, pIt) =>
              val m = new java.util.HashMap[Long, Long]()
              pIt.foreach(kv => m.put(kv._1, kv._2))
              sIt.map { case (p, c) =>
                (c, if (m.containsKey(p)) m.get(p) else p)
              }
            }.partitionBy(pv).persist()
          val moved = next.zipPartitions(ptr) { (nIt, pIt) =>
            val m = new java.util.HashMap[Long, Long]()
            pIt.foreach(kv => m.put(kv._1, kv._2))
            var changed = 0L
            nIt.foreach { case (c, r) => if (m.get(c) != r) changed += 1 }
            Iterator.single(changed)
          }.sum()
          if (moved == 0) { next.unpersist(blocking = false); jumping = false }
          else { ptr.unpersist(blocking = false); ptr = next }
        }

        // relabel: a component with a parent chain takes its root,
        // the rest keep their label
        val newLabels = labels.map(_.swap).partitionBy(pv)
          .zipPartitions(ptr) { (sIt, pIt) =>
            val m = new java.util.HashMap[Long, Long]()
            pIt.foreach(kv => m.put(kv._1, kv._2))
            sIt.map { case (l, v) =>
              (v, if (m.containsKey(l)) m.get(l) else l)
            }
          }.partitionBy(pv).persist()
        newLabels.count()
        ptr.unpersist(blocking = false)
        // Adopt this round's cross set as the next candidate set
        // ONLY when it at least halves the candidates: adopting
        // costs one |cross| materialization, and in the
        // giant-component regime (cross ≈ cur for most rounds —
        // measured 87 s -> 132 s at the 10x probe when adopting
        // unconditionally) that persist churn never pays for
        // itself. In the many-small-components regime cross
        // collapses after the first rounds and every later round
        // runs on the shrunken set. The set stays partition-aligned
        // on k2 (a map in place, no shuffle); the alignment
        // endpoint flips on adoption.
        val crossN = cross.count()
        if (crossN * 2 < curN) {
          val nextEdges = cross
            .mapPartitions(_.map { case (k2, e, _, _) => (k2, e) },
              preservesPartitioning = true)
            .persist(StorageLevel.MEMORY_AND_DISK)
          nextEdges.count()
          cross.unpersist(blocking = false)
          if (curEdges ne eByU) curEdges.unpersist(blocking = false)
          curEdges = nextEdges
          curN = crossN
          keyIsU = !keyIsU
        } else {
          cross.unpersist(blocking = false)
        }
        labels.unpersist(blocking = false)
        labels = newLabels
      }
      round += 1
    }
    if (curEdges ne eByU) curEdges.unpersist(blocking = false)

    val msf: RDD[(Long, Long, Long)] =
      if (chosen.isEmpty) edges.sparkContext.emptyRDD
      else edges.sparkContext.union(chosen.toSeq)
        .persist(StorageLevel.MEMORY_AND_DISK)
    msf.count()

    // canonical component label = min member vid
    val minV = labels.map(_.swap).reduceByKey(pv, math.min(_: Long, _: Long))
    val outLabels = labels.map(_.swap).partitionBy(pv)
      .zipPartitions(minV) { (sIt, mIt) =>
        val m = new java.util.HashMap[Long, Long]()
        mIt.foreach(kv => m.put(kv._1, kv._2))
        sIt.map { case (l, v) => (v, m.get(l)) }
      }.persist()
    outLabels.count()
    val lab = labels
    (msf, outLabels, () => {
      msf.unpersist(blocking = false)
      outLabels.unpersist(blocking = false)
      lab.unpersist(blocking = false)
      eByU.unpersist(blocking = false)
      chosen.foreach(_.unpersist(blocking = false))
    })
  }

  /** Deterministic Luby-style MAXIMAL INDEPENDENT SET over the
   * symmetrized edge set: per round, an undecided vertex joins the
   * MIS iff its (md5(vid), vid) priority precedes every undecided
   * neighbor's; joiners knock their neighbors out, and the loop
   * repeats on the shrunken graph until no vertex is undecided. The
   * md5 priorities are the repo's standard content-independent
   * pseudo-random order (the same derivation the BFS-root picks
   * use), so the expected round count is O(log n) exactly as with
   * Luby's random draws — but every round is bit-reproducible and
   * the whole trajectory replays in SQL as unrolled rounds (ties in
   * the hex priority, were md5 ever to collide, break on vid on
   * both engines).
   *
   * Execution shape: adjacency and the undecided set live as
   * co-partitioned pair RDDs (the k-core loop's layout); each round
   * is two bounded shuffles — an undecided-edge min-priority
   * exchange, then the knockout subtract — over the SHRINKING
   * undecided set, so message volume is O(Σ deg(undecided)) per
   * round, hub-safe by the same argument as the k-core exchange,
   * and total work is a few multiples of |E| across all rounds. No
   * driver-side state beyond the round counter and per-round counts.
   *
   * Returns (vid, mis_round): MIS members only, tagged with the
   * round that selected them (round tags certify the trajectory,
   * not just the final set). */
  /** Lower-hex md5 of a string through a caller-owned digest
   * instance (MessageDigest.digest resets itself after every call):
   * the det-fixpoint hot paths hoist ONE instance per partition
   * instead of paying a getInstance allocation per record. */
  private def md5HexWith(md: java.security.MessageDigest, s: String): String =
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def misDetDF(edges: DataFrame, maxIter: Int = 60): DataFrame = {
    val spark = edges.sparkSession
    val nSym = edges.count() * 2
    val sym = edges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .flatMap(r => Iterator((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0))))
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(sym.getNumPartitions, (2 * nSym / 500000L).toInt)))
    val eBySrc = sym.partitionBy(p).persist()
    val adj = eBySrc.groupByKey(p).mapValues(_.toArray).persist()
    var undecided = adj.mapPartitions({ it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (v, _) => (v, md5HexWith(md, v.toString)) }
    }, preservesPartitioning = true).persist()
    var nUndecided = undecided.count()
    var round = 0L
    val misParts =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[(Long, Long)]]
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (nUndecided > 0) {
      round += 1
      require(round <= maxIter,
        s"misDet: $nUndecided vertices undecided after $maxIter rounds — raise maxIter")
      val r = round
      // min undecided-neighbor priority, delivered only to vertices
      // with at least one undecided neighbor
      val minNbr = eBySrc.join(undecided, p)
        .map { case (src, (dst, prSrc)) => (dst, (prSrc, src)) }
        .reduceByKey(p, (a, b) =>
          if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
      val newMis = undecided.leftOuterJoin(minNbr, p)
        .filter { case (v, (prV, m)) =>
          m.forall(mm => prV < mm._1 || (prV == mm._1 && v < mm._2)) }
        .mapValues(_ => r).persist()
      val knocked = newMis.join(adj, p)
        .flatMap { case (_, (_, nbrs)) => nbrs.iterator.map((_, ())) }
        .union(newMis.mapValues(_ => ()))
        .reduceByKey(p, (a, _) => a)
      val next = undecided.subtractByKey(knocked, p).persist()
      // reliable checkpoint every 16 rounds (when a dir is set, as
      // in every entry point): an uncut state lineage grows by ~4
      // stages per round, and a deep run overflows the task
      // serializer's stack long before maxIter
      if (round % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined)
        next.checkpoint()
      nUndecided = next.count()
      retired += undecided
      undecided = next
      misParts += newMis
    }
    val df = spark.createDataFrame(
      spark.sparkContext.union(misParts.toSeq))
      .toDF("vid", "mis_round").cache()
    df.count()
    (retired.toSeq :+ undecided).foreach(_.unpersist(blocking = false))
    misParts.foreach(_.unpersist(blocking = false))
    eBySrc.unpersist(blocking = false)
    adj.unpersist(blocking = false)
    df
  }

  /** Deterministic Jones–Plassmann GRAPH COLORING over the
   * symmetrized edge set, sharing [[misDetDF]]'s priority order: per
   * round, an uncolored vertex whose (md5(vid), vid) priority
   * precedes every uncolored neighbor's picks the MINIMUM EXCLUDED
   * color of its already-colored neighbors. The per-round eligible
   * set is an independent set (two adjacent uncolored vertices are
   * ordered, so only one can precede the other), which makes the
   * greedy mex safe — same-round vertices are never adjacent — and
   * gives a proper coloring with at most Δ+1 colors. Unlike
   * [[misDetDF]], colored vertices' neighbors STAY in the loop, so
   * the round count is the longest priority-decreasing path
   * (O(log n / log log n) expected under the pseudo-random md5
   * order), and the whole trajectory — who colors when, and with
   * what — replays in SQL as unrolled rounds.
   *
   * Execution shape: the same co-partitioned pair-RDD layout as
   * [[misDetDF]]. Per round: one O(Σ deg(uncolored)) min-priority
   * exchange; then each newly colored vertex notifies its still
   * uncolored neighbors of its color — each edge delivers at most
   * ONE such notification across the entire run, so the
   * accumulated used-color state totals O(|E|) ints and a
   * degree-D hub holds at most D ints (~8 bytes each), never a
   * materialized neighbor list per round. Driver state is the
   * round counter only.
   *
   * Returns (vid, color, jp_round) for EVERY vertex: 1-based
   * colors, the round tag certifying when each vertex committed. */
  def colorDetDF(edges: DataFrame, maxIter: Int = 80): DataFrame = {
    val spark = edges.sparkSession
    val nSym = edges.count() * 2
    val sym = edges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .flatMap(r => Iterator((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0))))
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(sym.getNumPartitions, (2 * nSym / 500000L).toInt)))
    val eBySrc = sym.partitionBy(p).persist()
    // smallest positive int absent from a sorted-ascending array
    def mex(sorted: Array[Long]): Long = {
      var want = 1L
      var i = 0
      while (i < sorted.length && sorted(i) <= want) {
        if (sorted(i) == want) want += 1
        i += 1
      }
      want
    }
    // uncolored state: vid -> (priority, used neighbor colors so far)
    var uncolored = eBySrc.mapValues(_ => ())
      .reduceByKey(p, (a, _) => a)
      .mapPartitions({ it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (v, _) =>
          (v, (md5HexWith(md, v.toString), Array.empty[Long])) }
      }, preservesPartitioning = true).persist()
    var nUncolored = uncolored.count()
    var round = 0L
    val colorParts = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, (Long, Long))]]
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (nUncolored > 0) {
      round += 1
      require(round <= maxIter,
        s"colorDet: $nUncolored vertices uncolored after $maxIter rounds — raise maxIter")
      val r = round
      val minNbr = eBySrc.join(uncolored, p)
        .map { case (src, (dst, (prSrc, _))) => (dst, (prSrc, src)) }
        .reduceByKey(p, (a, b) =>
          if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
      // eligible vertices commit to mex(used): (vid, (color, round))
      val newColored = uncolored.leftOuterJoin(minNbr, p)
        .filter { case (v, ((prV, _), m)) =>
          m.forall(mm => prV < mm._1 || (prV == mm._1 && v < mm._2)) }
        .map { case (v, ((_, used), _)) => (v, (mex(used), r)) }
        .persist()
      // each colored vertex notifies neighbors once, ever; merge the
      // arriving colors into the surviving uncolored states
      val notify = eBySrc.join(newColored, p)
        .map { case (_, (dst, (c, _))) => (dst, c) }
      val arrived = notify.groupByKey(p).mapValues(_.toArray.sorted)
      val next = uncolored.subtractByKey(newColored, p)
        .leftOuterJoin(arrived, p)
        .mapValues { case ((pr, used), add) =>
          (pr, add.fold(used)(a => (used ++ a).sorted))
        }.persist()
      // cut the state lineage every 16 rounds (see misDetDF): JP on
      // denser-than-backbone inputs legitimately runs hundreds of
      // rounds, which an uncut lineage cannot survive
      if (round % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined) {
        next.checkpoint()
        newColored.checkpoint()
      }
      nUncolored = next.count()
      retired += uncolored
      uncolored = next
      colorParts += newColored
    }
    val df = spark.createDataFrame(
      spark.sparkContext.union(colorParts.toSeq)
        .map { case (v, (c, r)) => (v, c, r) })
      .toDF("vid", "color", "jp_round").cache()
    df.count()
    (retired.toSeq :+ uncolored).foreach(_.unpersist(blocking = false))
    colorParts.foreach(_.unpersist(blocking = false))
    eBySrc.unpersist(blocking = false)
    df
  }

  /** MIS-DRIVEN coloring schedule (the O(log n)-depth fix for
   * [[colorDetDF]]'s data-dependent schedule, VERDICT r11 order #3):
   * the SAME greedy-mex commit rule, but the per-round eligible set
   * is one Luby-style MIS selection under priorities REFRESHED every
   * round — pr_r(v) = md5("v-r") — instead of Jones–Plassmann's one
   * fixed order. JP's round count is the longest priority-DECREASING
   * path of the fixed order (a data property: 217 rounds on the 10x
   * hub-star + tail probe, PERF.md), because a vertex stuck behind a
   * chain re-loses with the same priorities every round. Fresh
   * salts re-draw the race each round, so an uncolored vertex with
   * d uncolored neighbors commits with probability ~1/(d+1) per
   * round independently of past rounds — geometric decay, expected
   * O(log n) rounds on bounded-degree regions and probe-measured
   * sub-JP depth on the skew fixture. Same properness argument
   * (same-round vertices are never adjacent: one of two adjacent
   * uncolored vertices precedes the other under ANY total order),
   * same <= Δ+1 color bound, and the whole trajectory — who colors
   * when, with what — still replays in SQL as unrolled rounds with
   * the salt inlined per round.
   *
   * Execution shape: identical per-round cost to [[colorDetDF]]
   * (the refreshed priority is a map over the uncolored state, no
   * extra shuffle); the used-color accumulation argument is
   * unchanged — each edge delivers at most one color notification
   * across the run.
   *
   * Returns (vid, color, mis_round) for EVERY vertex. */
  def coloringMisDF(edges: DataFrame, maxIter: Int = 80): DataFrame = {
    val spark = edges.sparkSession
    val nSym = edges.count() * 2
    val sym = edges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .flatMap(r => Iterator((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0))))
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(sym.getNumPartitions, (2 * nSym / 500000L).toInt)))
    val eBySrc = sym.partitionBy(p).persist()
    // smallest positive int absent from a sorted-ascending array
    def mex(sorted: Array[Long]): Long = {
      var want = 1L
      var i = 0
      while (i < sorted.length && sorted(i) <= want) {
        if (sorted(i) == want) want += 1
        i += 1
      }
      want
    }
    // uncolored state: vid -> used neighbor colors so far (sorted);
    // priorities are NOT state — they are re-derived per round
    var uncolored = eBySrc.mapValues(_ => ())
      .reduceByKey(p, (a, _) => a)
      .mapValues(_ => Array.empty[Long]).persist()
    var nUncolored = uncolored.count()
    var round = 0L
    val colorParts = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, (Long, Long))]]
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (nUncolored > 0) {
      round += 1
      require(round <= maxIter,
        s"coloringMis: $nUncolored vertices uncolored after $maxIter rounds — raise maxIter")
      val r = round
      // this round's salted priorities over the uncolored set
      val pri = uncolored.mapPartitions({ it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (v, used) => (v, (md5HexWith(md, s"$v-$r"), used)) }
      }, preservesPartitioning = true).persist()
      val minNbr = eBySrc.join(pri, p)
        .map { case (src, (dst, (prSrc, _))) => (dst, (prSrc, src)) }
        .reduceByKey(p, (a, b) =>
          if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
      // eligible vertices commit to mex(used): (vid, (color, round))
      val newColored = pri.leftOuterJoin(minNbr, p)
        .filter { case (v, ((prV, _), m)) =>
          m.forall(mm => prV < mm._1 || (prV == mm._1 && v < mm._2)) }
        .map { case (v, ((_, used), _)) => (v, (mex(used), r)) }
        .persist()
      val notify = eBySrc.join(newColored, p)
        .map { case (_, (dst, (c, _))) => (dst, c) }
      val arrived = notify.groupByKey(p).mapValues(_.toArray.sorted)
      val next = uncolored.subtractByKey(newColored, p)
        .leftOuterJoin(arrived, p)
        .mapValues { case (used, add) =>
          add.fold(used)(a => (used ++ a).sorted)
        }.persist()
      if (round % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined) {
        next.checkpoint()
        newColored.checkpoint()
      }
      nUncolored = next.count()
      retired += uncolored
      retired += pri
      uncolored = next
      colorParts += newColored
    }
    val df = spark.createDataFrame(
      spark.sparkContext.union(colorParts.toSeq)
        .map { case (v, (c, r)) => (v, c, r) })
      .toDF("vid", "color", "mis_round").cache()
    df.count()
    (retired.toSeq :+ uncolored).foreach(_.unpersist(blocking = false))
    colorParts.foreach(_.unpersist(blocking = false))
    eBySrc.unpersist(blocking = false)
    df
  }

  /** TRIAL-COLOR (Δ+1)-coloring — the genuinely O(log n)-depth
   * schedule (Johansson's algorithm, determinized): every round,
   * each uncolored vertex PROPOSES one color from its remaining
   * palette [1..deg+1] \ {colors of colored neighbors}, picked by
   * the integer mix floorMod(v*1000003 + r*10007, |palette|) (the
   * node2vec-family convention — order-free, engine-identical), and
   * COMMITS unless an uncolored neighbor proposed the same color
   * with a smaller (md5("u-r"), u) tie-break. Unlike the
   * local-minimum schedules ([[colorDetDF]], [[coloringMisDF]]),
   * whose commit probability is ~1/(d+1) — so moderate-degree
   * pockets pay O(d log n) rounds — a trial-color vertex commits
   * whenever its PROPOSAL is locally unique, which happens with
   * constant probability at ANY degree (the palette is always
   * larger than the number of uncolored neighbors still competing):
   * expected O(log n) rounds on any graph. The md5 tie-break (not
   * mutual deferral) also makes progress unconditional — the
   * globally minimum (md5, vid) uncolored vertex wins all its ties
   * every round, so the loop can never livelock on correlated
   * proposals. Proper by construction: palettes exclude committed
   * neighbor colors, and of two adjacent same-proposal vertices at
   * most one commits; colors stay within deg(v)+1 <= Δ+1.
   *
   * Execution shape: per round one proposal exchange over edges
   * with BOTH endpoints uncolored (O(Σ deg(uncolored)), shrinking
   * geometrically) + the one-shot color notification of
   * [[colorDetDF]]. The whole trajectory replays in SQL as unrolled
   * rounds (palette k-th-smallest via a windowed generate_series,
   * the same mix arithmetic, the same md5 tie-break).
   *
   * Returns (vid, color, trial_round) for EVERY vertex. */
  def coloringTrialDF(edges: DataFrame, maxIter: Int = 80): DataFrame = {
    val spark = edges.sparkSession
    val nSym = edges.count() * 2
    val sym = edges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .flatMap(r => Iterator((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0))))
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(sym.getNumPartitions, (2 * nSym / 500000L).toInt)))
    val eBySrc = sym.partitionBy(p).persist()
    // k-th smallest of [1..deg+1] \ used (used sorted ascending and
    // DISTINCT — the merge below dedupes, and the scan below skips
    // runs anyway; entries past deg+1 can appear — a neighbor's own
    // palette bound differs — and never shrink this palette)
    def pick(deg: Int, used: Array[Long], k: Long): Long = {
      var want = 1L; var i = 0; var skip = k
      while (true) {
        while (i < used.length && used(i) < want) i += 1
        if (i < used.length && used(i) == want) {
          while (i < used.length && used(i) == want) i += 1
        }
        else if (skip == 0L) return want
        else skip -= 1
        want += 1
      }
      throw new IllegalStateException("unreachable")
    }
    // uncolored state: vid -> (original degree, used colors sorted)
    var uncolored = eBySrc.mapValues(_ => 1)
      .reduceByKey(p, _ + _)
      .mapValues(d => (d, Array.empty[Long])).persist()
    var nUncolored = uncolored.count()
    var round = 0L
    val colorParts = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, (Long, Long))]]
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (nUncolored > 0) {
      round += 1
      require(round <= maxIter,
        s"coloringTrial: $nUncolored vertices uncolored after $maxIter rounds — raise maxIter")
      val r = round
      // this round's proposal + tie-break priority per uncolored vertex
      val prop = uncolored.mapPartitions({ it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (v, (deg, used)) =>
          var inPal = 0
          var i = 0
          while (i < used.length) {
            if (used(i) <= deg + 1 && (i == 0 || used(i) != used(i - 1))) inPal += 1
            i += 1
          }
          val m = deg + 1 - inPal
          // the proposal mix below multiplies the raw vid; for
          // vId >= ~9.2e12 the Long product silently wraps while the
          // DuckDB oracle's BIGINT multiply RAISES — the exact silent
          // cross-engine divergence class matchingDetDF guards. Fail
          // loudly instead; to go wider, remap ids (or mix via
          // Math.multiplyHigh) on BOTH engines in lockstep.
          require(v < 9000000000000L,
            s"coloringTrial: vertex id $v >= 9e12 overflows the Long " +
              "proposal mix (v * 1000003 + round * 10007) that the " +
              "oracle replays with raising BIGINT arithmetic — remap " +
              "ids or widen the mix on both engines together")
          val k = Math.floorMod(v * 1000003L + r * 10007L, m.toLong)
          (v, (pick(deg, used, k), md5HexWith(md, s"$v-$r")))
        }
      }, preservesPartitioning = true).persist()
      // conflict: an uncolored neighbor proposed the SAME color and
      // precedes me in (md5, vid) — one exchange over live edges
      val beaten = eBySrc.join(prop, p)
        .map { case (src, (dst, (cand, pr))) => (dst, (cand, pr, src)) }
        .join(prop, p)
        .filter { case (v, ((cand, pr, src), (own, ownPr))) =>
          cand == own && (pr < ownPr || (pr == ownPr && src < v)) }
        .mapValues(_ => ())
        .reduceByKey(p, (a, _) => a)
      val newColored = prop.subtractByKey(beaten, p)
        .map { case (v, (cand, _)) => (v, (cand, r)) }.persist()
      val notify = eBySrc.join(newColored, p)
        .map { case (_, (dst, (c, _))) => (dst, c) }
      val arrived = notify.groupByKey(p).mapValues(_.toArray.sorted)
      val next = uncolored.subtractByKey(newColored, p)
        .leftOuterJoin(arrived, p)
        .mapValues { case ((deg, used), add) =>
          (deg, add.fold(used)(a => (used ++ a).distinct.sorted))
        }.persist()
      if (round % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined) {
        next.checkpoint()
        newColored.checkpoint()
      }
      nUncolored = next.count()
      retired += uncolored
      retired += prop
      uncolored = next
      colorParts += newColored
    }
    val df = spark.createDataFrame(
      spark.sparkContext.union(colorParts.toSeq)
        .map { case (v, (c, r)) => (v, c, r) })
      .toDF("vid", "color", "trial_round").cache()
    df.count()
    (retired.toSeq :+ uncolored).foreach(_.unpersist(blocking = false))
    colorParts.foreach(_.unpersist(blocking = false))
    eBySrc.unpersist(blocking = false)
    df
  }

  /** Mutable per-vertex argmin slot for matchingDetDF's streaming
   * min-map: mutated in place on improvement so a partition pass
   * allocates one object per distinct vertex, not per row. */
  private final class MatchMinEnt(var y: Long, var w1: Long, var w2: Long)

  /** The matching tie-break total order on PACKED keys: (w1, w2) are
   * the md5 digest's two big-endian 64-bit words compared UNSIGNED,
   * then the canonical endpoints (u, v) numerically. Identical to
   * lexicographic order on the abstract 56-char string key
   * md5hex ++ lpad(u,12) ++ lpad(v,12): fixed-width lowercase hex is
   * order-isomorphic to the unsigned 128-bit digest ('0'..'9' < 'a'
   * ..'f' in ASCII, two digits per byte in byte order), fixed-width
   * decimal to the numeric endpoints (ids are guarded < 10^12).
   * Package-visible so MatchingSpec can pin the isomorphism
   * property directly. */
  private[graft] def keyPackedLess(w1a: Long, w2a: Long, ua: Long, va: Long,
      w1b: Long, w2b: Long, ub: Long, vb: Long): Boolean = {
    val c1 = java.lang.Long.compareUnsigned(w1a, w1b)
    if (c1 != 0) return c1 < 0
    val c2 = java.lang.Long.compareUnsigned(w2a, w2b)
    if (c2 != 0) return c2 < 0
    if (ua != ub) ua < ub else va < vb
  }

  /** Deterministic greedy MAXIMAL MATCHING (Israeli–Itai shape)
   * over the canonical undirected edge set: per round, an undecided
   * edge is matched iff its key — md5("src-dst") followed by the
   * zero-padded endpoints, so keys are globally distinct — is the
   * minimum among undecided edges at BOTH endpoints; matched
   * endpoints knock out every incident edge, and the loop repeats
   * until no edge is undecided. Equivalent to Luby MIS on the line
   * graph without materializing it (the per-vertex min plays the
   * neighborhood-argmin role), so the expected round count is
   * O(log |E|) on ANY graph — dense inputs included, unlike the
   * coloring schedule — and the trajectory replays in SQL as
   * unrolled rounds.
   *
   * Execution shape: undecided edges live keyed by src on a vertex
   * partitioner; each round is a bounded per-vertex min reduce
   * (map-side combined — a degree-D hub contributes D messages but
   * they combine to one per partition), two equality probes against
   * it, and two hash semi-joins for the incident knockout — all
   * O(undecided) work over a geometrically shrinking set. Driver
   * state is the round counter only.
   *
   * Returns (src, dst, match_round): matched edges only, round tags
   * certifying the trajectory. */
  def matchingDetDF(edges: DataFrame, maxIter: Int = 60): DataFrame = {
    val spark = edges.sparkSession
    val canon = edges
      .select(least(col("src"), col("dst")).cast("long").as("src"),
        greatest(col("src"), col("dst")).cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val nE = canon.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(canon.rdd.getNumPartitions, (nE / 250000L).toInt)))
    // SYMMETRIC copy set: each undecided edge is stored under BOTH
    // endpoints, the two copies sharing ONE tie-break key built from
    // the canonical orientation. The ABSTRACT key is the 56-char
    // string md5hex("u-v") ++ lpad(u,12) ++ lpad(v,12) the oracle
    // replays; the REPRESENTATION here (optimization r21) is the two
    // unsigned 64-bit digest words plus the endpoints the copy
    // already carries — fixed-width lowercase hex compares exactly
    // like the unsigned 128-bit digest, and fixed-width decimal
    // exactly like the numeric endpoints (keyPackedLess), so the
    // total order is IDENTICAL while each resident/shuffled copy
    // carries 16 key bytes instead of a ~56-char string. The oracle's
    // lpad(...,12,'0') TRUNCATES rather than widens, so an id >=
    // 10^12 would silently diverge across engines; fail loudly
    // instead — to go wider, widen the padding on the oracle side in
    // lockstep (the packed comparison itself is width-independent).
    //
    // Why symmetric (optimization r20): with every incident edge's
    // key locally present at each endpoint's partition, the
    // per-endpoint MINIMUM is a partition-local fold — the old
    // shape's 2|E| key exchange (flatMap + reduceByKey) is gone —
    // and the survives-both-minima test needs ONE vertex-bounded
    // shuffle (each endpoint forwards at most its single minimum
    // edge) instead of the |E|-sized re-key join. The knocked-edge
    // drop exploits that the copy set is CLOSED UNDER SWAP: filter
    // x-knocked copies locally, swap every survivor to its other
    // endpoint (the round's one O(E) exchange — the same re-key the
    // old chain paid TWICE around its two subtracts), filter again —
    // the result is exactly the symmetric copy set of the surviving
    // edges. Per-round matched set, round numbering, and emitted
    // rows are IDENTICAL to the old formulation (same minima, same
    // total order, canonical orientation) — MatchingSpec and the
    // oracle replay pin it.
    var undecided: org.apache.spark.rdd.RDD[(Long, (Long, Long, Long))] = canon.rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (u, v) =>
          require(u < 1000000000000L && v < 1000000000000L,
            s"matchingDet: vertex id >= 1e12 overflows the fixed-width " +
              s"12-digit tie-break key (edge $u-$v) — widen the padding " +
              "in matchingDetDF AND its oracle lpad together")
          val d = md.digest(s"$u-$v".getBytes("UTF-8"))
          var w1 = 0L; var w2 = 0L; var i = 0
          while (i < 8) {
            w1 = (w1 << 8) | (d(i) & 0xffL)
            w2 = (w2 << 8) | (d(i + 8) & 0xffL)
            i += 1
          }
          Iterator((u, (v, w1, w2)), (v, (u, w1, w2)))
        }
      }
      .partitionBy(p).persist()
    // Partition-local per-endpoint minimum over the symmetric copies
    // (every edge incident to x has a copy at x's partition), built
    // in ONE streaming pass — the map holds one mutated-in-place
    // argmin entry per vertex; rows are never retained (VERDICT r20
    // item 4: the old shape materialized the partition with toArray
    // twice per round just to re-scan it).
    def localMin(it: Iterator[(Long, (Long, Long, Long))]): java.util.HashMap[Long, MatchMinEnt] = {
      val m = new java.util.HashMap[Long, MatchMinEnt]()
      it.foreach { case (x, (y, w1, w2)) =>
        val cur = m.get(x)
        if (cur == null) m.put(x, new MatchMinEnt(y, w1, w2))
        else {
          val u = math.min(x, y); val v = math.max(x, y)
          val cu = math.min(x, cur.y); val cv = math.max(x, cur.y)
          if (keyPackedLess(w1, w2, u, v, cur.w1, cur.w2, cu, cv)) {
            cur.y = y; cur.w1 = w1; cur.w2 = w2
          }
        }
      }
      m
    }
    var nUndecided = nE
    var round = 0L
    val matchedParts = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, Long, Long)]]
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (nUndecided > 0) {
      round += 1
      // "~" because the count comes from a transformation-side
      // accumulator (at-least-once under task retries, ADVICE r17):
      // the > 0 loop decision is retry-exact, the magnitude may read
      // high on a retried run
      require(round <= maxIter,
        s"matchingDet: ~$nUndecided edges undecided after $maxIter rounds — raise maxIter")
      val r = round
      // copies that ARE their endpoint's minimum, forwarded to the
      // other endpoint: at most one record per undecided vertex —
      // emitted straight from the argmin map (the map entry IS the
      // minimum copy, so no second pass over the rows is needed)
      val cand = undecided.mapPartitions { it =>
        val m = localMin(it)
        val es = m.entrySet().iterator()
        new Iterator[(Long, (Long, Long, Long))] {
          def hasNext: Boolean = es.hasNext
          def next(): (Long, (Long, Long, Long)) = {
            val e = es.next(); val ent = e.getValue
            (ent.y, (e.getKey.longValue(), ent.w1, ent.w2))
          }
        }
      }.partitionBy(p)
      // matched = key is the minimum at BOTH endpoints. Both copies
      // of a matched edge pass both tests, so the edge is seen at
      // both receivers — emit exactly once, from the max-endpoint
      // receiver, already in canonical (min, max) orientation. Keys
      // are unique per edge (md5 + endpoint tie-break), so "the
      // forwarded key equals y's minimum" is exactly "y's argmin
      // edge IS (x, y)" — an edge-identity probe, no key compare.
      val matched = undecided.zipPartitions(cand) { (uIt, cIt) =>
        val m = localMin(uIt)
        cIt.filter { case (y, (x, _, _)) =>
          if (y <= x) false
          else { val e = m.get(y); e != null && e.y == x }
        }.map { case (y, (x, _, _)) => (x, y, r) }
      }.persist()
      val knocked = matched
        .flatMap { case (u, v, _) => Iterator((u, ()), (v, ())) }
        .reduceByKey(p, (a, _) => a)
      // drop every copy incident to a matched vertex (either side):
      // filter the keyed side locally, swap, re-key (the round's one
      // O(E) exchange), filter the other side locally. Termination
      // count (VERDICT r16 item 1): bumped by an accumulator inside
      // the round's own materializing job — each surviving EDGE
      // contributes exactly its two copies, so the count is acc / 2;
      // the loop only tests > 0, which retries cannot fabricate.
      val nUndecidedAcc = spark.sparkContext.longAccumulator(s"matching-undecided-r$r")
      val phaseA = undecided.zipPartitions(knocked) { (uIt, kIt) =>
        val dead = new java.util.HashSet[Long]()
        kIt.foreach(kv => dead.add(kv._1))
        uIt.collect { case (x, (y, w1, w2)) if !dead.contains(x) =>
          (y, (x, w1, w2)) }
      }.partitionBy(p)
      val next = phaseA.zipPartitions(knocked) { (aIt, kIt) =>
        val dead = new java.util.HashSet[Long]()
        kIt.foreach(kv => dead.add(kv._1))
        aIt.collect { case (x, (y, w1, w2)) if !dead.contains(x) =>
          nUndecidedAcc.add(1L); (x, (y, w1, w2)) }
      }.persist()
      // cut the state lineage every 16 rounds (see misDetDF)
      if (round % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined)
        next.checkpoint()
      next.foreachPartition(_ => ()) // materialize; populates the accumulator
      nUndecided = nUndecidedAcc.value / 2
      retired += undecided
      undecided = next
      matchedParts += matched
    }
    val df = spark.createDataFrame(
      spark.sparkContext.union(matchedParts.toSeq))
      .toDF("src", "dst", "match_round").cache()
    df.count()
    (retired.toSeq :+ undecided).foreach(_.unpersist(blocking = false))
    matchedParts.foreach(_.unpersist(blocking = false))
    df
  }

  /** Longest-path-from-source LEVELS of a DAG (topological
   * layering): level(v) = 1 + the longest path length ending at v —
   * the standard dependency-layering output over a condensation
   * DAG. Iterative max-propagation on co-partitioned pair RDDs
   * (level(dst) >= level(src) + 1 until fixpoint); round count is
   * the DAG depth, message volume O(E) per round. Cycles never
   * converge, so the maxIter guard doubles as a loud input
   * validator. Returns (vid, level) for every vertex. */
  def dagLevelsDF(dedges: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = dedges.sparkSession
    val nE = dedges.count()
    val e0 = dedges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(e0.getNumPartitions, (nE / 250000L).toInt)))
    val eF = e0.partitionBy(p).persist()
    var st = eF.mapValues(_ => ()).union(e0.map(e => (e._2, ())))
      .reduceByKey(p, (a, _) => a)
      .mapPartitions(_.map { case (v, _) => (v, 1L) },
        preservesPartitioning = true).persist()
    var changed = 1L
    var round = 0
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (changed > 0) {
      round += 1
      require(round <= maxIter,
        s"dagLevels: not converged after $maxIter rounds — cycle in input, or raise maxIter")
      val msg = eF.join(st, p)
        .map { case (_, (dst, l)) => (dst, l + 1L) }
        .reduceByKey(p, math.max(_: Long, _: Long))
      // changed-count fused into the round's materializing job via a
      // transformation-side accumulator (see sccDetDF): the old shape
      // paid an extra JOIN of next against st plus a count pass per
      // round just to detect convergence. Retry-exact for the same
      // reason — only zero-ness is read.
      val changedAcc = spark.sparkContext
        .longAccumulator(s"daglevels-changed-$round")
      val next = st.leftOuterJoin(msg, p)
        .mapValues { case (l, m) =>
          val l2 = math.max(l, m.getOrElse(l))
          if (l2 != l) changedAcc.add(1L)
          l2
        }
        .persist()
      if (round % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined)
        next.checkpoint()
      next.foreachPartition(_ => ()) // materialize; populates the accumulator
      changed = changedAcc.value
      retired += st
      st = next
    }
    val df = spark.createDataFrame(st).toDF("vid", "level").cache()
    df.count()
    (retired.toSeq :+ st).foreach(_.unpersist(blocking = false))
    eF.unpersist(blocking = false)
    df
  }

  /** Deterministic STRONGLY CONNECTED COMPONENTS over a DIRECTED
   * edge set, by min-label forward/backward peeling (the FW-BW /
   * ISPAN family without randomness): each outer round runs one
   * min-propagation fixpoint per direction over the active
   * subgraph — fmin(v) = min vertex reaching v, bmin(v) = min
   * vertex v reaches (both including v) — and finalizes every
   * vertex with fmin(v) = bmin(v) = m, which is provably exactly
   * SCC(m) (m reaches v and v reaches m; conversely reaching-set
   * containment forces every SCC(m) member to the same pair). The
   * globally smallest active vertex of every weak component always
   * qualifies, so each round peels >= 1 SCC per weak component and
   * the loop terminates. Labels are min member vids — canonical and
   * order-free, so the result replays in SQL as mutual reachability
   * over the transitive closure (affordable on the registered
   * fixture; the algorithm itself never materializes a closure).
   *
   * Execution shape: ONE exchange RDD keyed by the sending vertex
   * carries both directions (payload (receiver, isForward)), so
   * every inner round is a single co-partitioned join + one
   * map-side-combined pairwise-min reduce + one state merge whose
   * third slot carries the changed flag (convergence costs no extra
   * join) — message volume O(E_active) per round, hub-safe like the
   * k-core exchange. Inner depth is the directed diameter of the largest
   * active SCC (min-label propagation cannot pointer-double across
   * asymmetric reachability); outer depth is the peel recursion,
   * >= 1 weak-component peel per round. Driver state: counters
   * only.
   *
   * Returns (vid, scc, scc_size) for every vertex of the edge set. */
  def sccDetDF(dedges: DataFrame, maxOuter: Int = 40,
      maxInner: Int = 200): DataFrame = {
    val spark = dedges.sparkSession
    val nE = dedges.count()
    val e0 = dedges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    val p = new org.apache.spark.HashPartitioner(
      math.max(8, math.min(e0.getNumPartitions, (nE / 250000L).toInt)))
    // one exchange RDD for BOTH directions: keyed by the SENDING
    // vertex, payload (receiver, isForward) — halves the per-round
    // job count vs separate forward/backward joins
    var eAll = e0.map { case (u, v) => (u, (v, true)) }
      .union(e0.map { case (u, v) => (v, (u, false)) })
      .partitionBy(p).persist()
    var active = eAll.mapValues(_ => ())
      .reduceByKey(p, (a, _) => a).persist()
    var nActive = active.count()
    var outer = 0
    val done = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, Long)]]
    val retired =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    val INF = Long.MaxValue
    while (nActive > 0) {
      outer += 1
      require(outer <= maxOuter,
        s"sccDet: $nActive vertices active after $maxOuter peel rounds — raise maxOuter")
      // inner fixpoint: (fmin, bmin, fp, bp, changed) over the
      // active subgraph. fp/bp are POINTER-DOUBLING chase pointers
      // (VERDICT r11 order #6 / r12 order #6, the depth escape):
      // fp(v) starts at v's min IN-neighbor (an id one step up any
      // path reaching v) and squares its distance every jump via
      // fp <- fp(fp); bp symmetrically chases the min OUT-neighbor.
      // A jump pulls f(fp(v)) into f(v) — sound because fp(v)
      // reaches v, so any id reaching fp(v) reaches v — and b(bp(v))
      // into b(v). Plain min-LABEL jumping (f <- f(f)) is NOT a
      // depth escape: on an id-ascending cycle b(v) stays v (a
      // self-pointer carrying no progress) until 0's label walks
      // over linearly, which is exactly how the old code tripped the
      // 200-round guard on a 3000-cycle. Explicit pointers make the
      // inner fixpoint O(log diameter). The FIXPOINT is unchanged
      // (jumps only inject ids provably in the reaching/reachable
      // sets), so the emitted labels — and the g_scc oracle hashes —
      // are bit-identical; convergence is still detected on a plain
      // edge round with zero label changes, BEFORE any jump runs.
      val fwdE = eAll.filter(_._2._2)
      val fpInit = fwdE.map { case (u, (v, _)) => (v, u) }
        .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
      val bpInit = fwdE.map { case (u, (v, _)) => (u, v) }
        .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
      var st = active.leftOuterJoin(fpInit, p).leftOuterJoin(bpInit, p)
        .map { case (v, ((_, fp), bp)) =>
          (v, (v, v, fp.getOrElse(v), bp.getOrElse(v), true)) }
        .partitionBy(p).persist()
      var changed = 1L
      var inner = 0
      while (changed > 0) {
        inner += 1
        require(inner <= maxInner,
          s"sccDet: min-propagation not converged after $maxInner rounds — raise maxInner")
        val msg = eAll.join(st, p)
          .map { case (_, ((nbr, isFwd), (f, b, _, _, _))) =>
            (nbr, if (isFwd) (f, INF) else (INF, b)) }
          .reduceByKey(p, (x, y) =>
            (math.min(x._1, y._1), math.min(x._2, y._2)))
        // changed-count via a transformation-side accumulator bumped
        // inside the round's own materializing job (the matchingDetDF
        // discipline) — the old shape paid a SECOND full pass over
        // the persisted state per inner round just to count flags.
        // At-least-once under task retries: the loop only tests > 0,
        // and a retry can never inflate a true zero (retried
        // partitions with no changes add nothing) — the convergence
        // decision is retry-exact, like matching's.
        val changedAcc = spark.sparkContext
          .longAccumulator(s"scc-changed-$outer-$inner")
        val next = st.leftOuterJoin(msg, p)
          .mapValues { case ((f, b, fp, bp, _), m) =>
            val f2 = math.min(f, m.fold(INF)(_._1))
            val b2 = math.min(b, m.fold(INF)(_._2))
            val ch = f2 != f || b2 != b
            if (ch) changedAcc.add(1L)
            (f2, b2, fp, bp, ch)
          }.persist()
        // cut the state lineage every 16 rounds (see misDetDF)
        if (inner % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined)
          next.checkpoint()
        next.foreachPartition(_ => ()) // materialize; populates the accumulator
        changed = changedAcc.value
        retired += st
        st = next
        if (changed > 0 && inner % 2 == 0) {
          val req = st.flatMap { case (v, (_, _, fp, bp, _)) =>
            Iterator((fp, (v, true)), (bp, (v, false))) }
          val resolved = req.join(st, p)
            .map { case (_, ((v, isFwd), (fw, bw, fpw, bpw, _))) =>
              (v, if (isFwd) (fw, fpw, INF, INF) else (INF, INF, bw, bpw)) }
            .reduceByKey(p, (x, y) =>
              (math.min(x._1, y._1), math.min(x._2, y._2),
                math.min(x._3, y._3), math.min(x._4, y._4)))
          val jumped = st.join(resolved, p)
            .mapValues { case ((f, b, _, _, ch), (fj, fp2, bj, bp2)) =>
              val f2 = math.min(f, fj)
              val b2 = math.min(b, bj)
              (f2, b2, fp2, bp2, ch || f2 != f || b2 != b)
            }.persist()
          if (inner % 16 == 0 && spark.sparkContext.getCheckpointDir.isDefined)
            jumped.checkpoint()
          jumped.count()
          retired += st
          st = jumped
        }
      }
      println(s"[graft-scc] peel round $outer: fixpoint in $inner rounds over $nActive active")
      val peel = st
        .filter { case (_, (f, b, _, _, _)) => f == b }
        .map { case (v, (f, _, _, _, _)) => (v, f) }.persist()
      peel.count()
      done += peel
      retired += st
      val nextActive = active.subtractByKey(peel, p).persist()
      nActive = nextActive.count()
      retired += active
      active = nextActive
      if (nActive > 0) {
        // restrict edges to the surviving vertex set (both endpoints)
        val eAll2 = eAll.join(nextActive, p)
          .map { case (u, ((v, dir), _)) => (v, (u, dir)) }.partitionBy(p)
          .join(nextActive, p)
          .map { case (v, ((u, dir), _)) => (u, (v, dir)) }
          .partitionBy(p).persist()
        eAll2.count()
        retired += eAll
        eAll = eAll2
      }
    }
    val lab = spark.sparkContext.union(done.toSeq)
    val sizes = lab.map { case (_, s) => (s, 1L) }
      .reduceByKey(p, _ + _)
    val rows = lab.map(_.swap).partitionBy(p)
      .join(sizes, p)
      .map { case (s, (v, n)) => (v, s, n) }
    val df = spark.createDataFrame(rows)
      .toDF("vid", "scc", "scc_size").cache()
    df.count()
    (retired.toSeq :+ active).foreach(_.unpersist(blocking = false))
    done.foreach(_.unpersist(blocking = false))
    eAll.unpersist(blocking = false)
    df
  }
}
