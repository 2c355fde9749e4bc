package graft.queries

import org.apache.spark.sql.SparkSession

/**
 * Per-session artifact memo shared by the query modules.
 *
 * Cached DataFrames/Graphs are bound to the SparkContext that built
 * them, so entries must never outlive their session: the outer map is
 * a [[java.util.WeakHashMap]] keyed by the session itself — when a
 * session is stopped and dropped, its whole entry map becomes
 * collectable, so a later session (even one that happens to reuse the
 * same identity hash) always starts from an empty memo.
 */
private[queries] object SessionMemo {
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
}
