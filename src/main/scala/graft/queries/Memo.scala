package graft.queries

/** One-per-JVM memo with the LOCKED getOrElseUpdate idiom — the single
  * home for the race-safety every gate-level cache needs: the lock
  * spans the BUILD, so two racing threads cannot both pay an expensive
  * build and leak the loser's side effects (temp dirs, catalog tables,
  * duplicate training jobs). A bare `TrieMap.getOrElseUpdate` evaluates
  * the thunk in both racers; any new cache in the query registries must
  * go through this class rather than re-rolling the pattern. */
private[queries] final class Memo[K, V] {
  private val cache = scala.collection.concurrent.TrieMap.empty[K, V]
  def apply(k: K)(build: => V): V =
    cache.synchronized(cache.getOrElseUpdate(k, build))
}
