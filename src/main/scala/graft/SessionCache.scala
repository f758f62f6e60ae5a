package graft

import org.apache.spark.sql.SparkSession

/** Per-(session, corpus dir) memoization for built-once/served-many
  * artifacts — the materialized index frames (shingle sets, quality
  * features, SRP bucket rows) and fitted models (IVF centroids) that
  * every consumer query serves from instead of recomputing. One
  * implementation so the key recipe lives in exactly one place.
  *
  * Lifecycle: entries live for the session (the posture of a production
  * index — built once per corpus, reused by every query); persisted
  * frames spill via their own StorageLevel rather than being evicted.
  */
final class SessionCache[V] {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(String, String), V]

  /** r18 (ADVICE): NOT TrieMap.getOrElseUpdate — that can evaluate
    * `build` in two racing threads and silently drop one result, leaking
    * the losing build's persisted blocks (tangible for the persisted
    * index frames; the concurrent-serving path hits first access from
    * many requests). putIfAbsent keeps exactly one winner and the loser's
    * frames are explicitly unpersisted.
    */
  def getOrElseUpdate(s: SparkSession, dir: String)(build: => V): V = {
    val k = SessionCache.key(s, dir)
    entries.get(k) match {
      case Some(v) => v
      case None =>
        val built = build
        entries.putIfAbsent(k, built) match {
          case Some(winner) => SessionCache.discard(built); winner
          case None => built
        }
    }
  }

  /** Drop the entry (returning it for cleanup, e.g. unpersist) — the
    * invalidation hook for durable-index appends: the next read rebuilds
    * from the now-larger on-disk store.
    */
  def remove(s: SparkSession, dir: String): Option[V] =
    entries.remove(SessionCache.key(s, dir))
}

object SessionCache {
  /** applicationId PLUS the session's object identity: a restarted
    * session (new SparkSession instance, possibly same appId) must never
    * be handed a frame bound to a stopped one.
    */
  private def key(s: SparkSession, dir: String): (String, String) =
    (s.sparkContext.applicationId + "@" + System.identityHashCode(s), dir)

  /** Release whatever a losing race build may have persisted: DataFrames
    * unpersist (no-op if never persisted); tuples of frames recurse;
    * plain model values need nothing.
    */
  private def discard(v: Any): Unit = v match {
    case df: org.apache.spark.sql.Dataset[_] => df.unpersist(false); ()
    case p: Product => p.productIterator.foreach(discard)
    case _ => ()
  }
}
