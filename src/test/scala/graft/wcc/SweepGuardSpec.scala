package graft.wcc

import graft.SparkSpec

/** Guard rails on the failure-path cache sweep (ADVICE r17): the
 * context-wide sweep is only exact when pipeline scopes are
 * sequential, so a detectably violated precondition must degrade to
 * a loud no-op (leak the failed call's garbage) instead of silently
 * unpersisting a concurrent scope's caches, and a shared-session
 * deployment can disable the sweep outright. */
class SweepGuardSpec extends SparkSpec {

  private def persisted(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.contains(id)

  test("sweep removes exactly the RDDs registered after the snapshot") {
    val sc = spark.sparkContext
    val before = sc.parallelize(1 to 4).persist()
    before.count()
    val snap = WccUtil.cacheSnapshot(sc)
    val mine = sc.parallelize(1 to 8).persist()
    mine.count()
    WccUtil.sweepNewCaches(sc, snap)
    assert(persisted(before.id), "pre-snapshot cache must survive the sweep")
    assert(!persisted(mine.id), "post-snapshot cache must be swept")
    before.unpersist(blocking = false)
  }

  test("a NEWER snapshot from another thread vetoes the sweep (overlap = loud no-op)") {
    val sc = spark.sparkContext
    val snap = WccUtil.cacheSnapshot(sc)
    val mine = sc.parallelize(1 to 8).persist()
    mine.count()
    // another pipeline scope opens on a different thread AFTER ours —
    // its fresh caches are exactly what a context-wide sweep would drop
    val other = new Thread(() => { WccUtil.cacheSnapshot(sc); () })
    other.start(); other.join()
    val foreign = sc.parallelize(1 to 2).persist()
    foreign.count()
    WccUtil.sweepNewCaches(sc, snap)
    assert(persisted(mine.id) && persisted(foreign.id),
      "an overlapping scope must veto the sweep entirely")
    // an OLDER other-thread snapshot is stale, not an overlap: a later
    // same-thread scope sweeps normally
    val snap2 = WccUtil.cacheSnapshot(sc)
    val mine2 = sc.parallelize(1 to 8).persist()
    mine2.count()
    WccUtil.sweepNewCaches(sc, snap2)
    assert(!persisted(mine2.id),
      "a stale other-thread snapshot must not veto later sweeps")
    Seq(mine, foreign).foreach(_.unpersist(blocking = false))
  }

  test("graft.wcc.failureSweep=off disables the sweep for shared-session deployments") {
    val sc = spark.sparkContext
    val key = "graft.wcc.failureSweep"
    val before = sys.props.get(key)
    val snap = WccUtil.cacheSnapshot(sc)
    val mine = sc.parallelize(1 to 8).persist()
    mine.count()
    try {
      sys.props(key) = "off"
      WccUtil.sweepNewCaches(sc, snap)
      assert(persisted(mine.id), "sweep must be a no-op when disabled")
    } finally {
      sys.props.remove(key)
      before.foreach(sys.props(key) = _)
    }
    WccUtil.sweepNewCaches(sc, snap)
    assert(!persisted(mine.id))
  }
}
