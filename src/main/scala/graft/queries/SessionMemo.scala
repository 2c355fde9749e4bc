package graft.queries

import org.apache.spark.sql.SparkSession

/**
 * Per-session artifact memo shared by the query modules.
 *
 * Cached DataFrames/Graphs are bound to the SparkContext that built
 * them, so entries must never outlive their session: the outer map is
 * a [[java.util.WeakHashMap]] keyed by the session itself, which
 * guarantees a later session (even one reusing the same identity
 * hash) always starts from an empty memo. Identity keying alone does
 * NOT make stopped-session entries collectable — the memoized
 * DataFrames hold a strong reference back to their session (the
 * WeakHashMap values-must-not-refer-to-keys caveat) — so long-lived
 * multi-session JVMs should call [[clear]] before `spark.stop()`
 * (Verify/Bench do).
 */
private[graft] object SessionMemo {
  private val memo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, Any]]()

  def memoize[T](spark: SparkSession, key: String)(f: => T): T =
    memo.synchronized {
      memo.computeIfAbsent(spark, _ => scala.collection.mutable.HashMap.empty)
        .getOrElseUpdate(key, f)
        .asInstanceOf[T]
    }

  /** Run `f` once per (session, key); later calls are no-ops. */
  def once(spark: SparkSession, key: String)(f: => Unit): Unit =
    memoize(spark, key) { f; () }

  /** Drop every artifact memoized for `spark`, making the entry (and
   * the cached plans it pins) collectable once the session is
   * dropped. Call before `spark.stop()` in long-lived JVMs. */
  def clear(spark: SparkSession): Unit =
    memo.synchronized { memo.remove(spark); () }
}
