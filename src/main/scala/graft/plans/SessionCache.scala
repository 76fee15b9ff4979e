package graft.plans

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memoized handles for a query family's shared
  * build — the common-subexpression materialization a production engine
  * applies when several queries mine the same intermediate (the
  * co-purchase graph, the tokenized corpus). Values are usually cached
  * DataFrames.
  *
  * The key side is WEAK (`WeakHashMap` on the session) and the value map
  * is held through a `SoftReference`: cached DataFrames strongly
  * reference their session, so a strong value would pin the weak key
  * forever (the classic WeakHashMap value-retains-key leak), while a
  * WeakReference made the memoization a GC lottery — any minor collection
  * could clear it between queries. Soft referents survive until actual
  * memory pressure, so the cross-query sharing is reliable in practice
  * and the session is still never pinned to OOM (soft refs are cleared
  * before an OutOfMemoryError by spec). Losing the inner map only drops
  * the memoized handles: rebuilding the identical plan and calling
  * `.cache()` re-attaches to the same CacheManager entry (Spark dedups
  * cached plans by canonicalized logical plan), so no blocks leak and no
  * work repeats beyond plan construction.
  */
final class SessionCache[V] {
  private val byedSession = new java.util.WeakHashMap[
    SparkSession, java.lang.ref.SoftReference[
      scala.collection.mutable.Map[String, V]]]

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V =
    byedSession.synchronized {
      val inner = Option(byedSession.get(s)).flatMap(r => Option(r.get))
        .getOrElse {
          val m = scala.collection.mutable.Map.empty[String, V]
          byedSession.put(s, new java.lang.ref.SoftReference(m)); m
        }
      inner.getOrElseUpdate(key, build)
    }

  /** Drop every memoized handle for `s` — call on session stop so a
    * short-lived session's plan graph doesn't linger until heap
    * pressure clears the soft reference (the documented SoftReference
    * tradeoff). The CacheManager blocks themselves die with the
    * session; this only releases the driver-side handles. */
  def invalidate(s: SparkSession): Unit =
    byedSession.synchronized { byedSession.remove(s); () }
}
