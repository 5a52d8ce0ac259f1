package graft.operators

/** Bounded LRU for the per-(session, sfDir) FAMILY CACHES — the
  * materialized frames (MinHash pair set, pair stats, CC labels, streaming
  * sink readers, the Gram/power-iteration triple) shared by several
  * inventory queries over the same data dir.
  *
  * Why bounded: the r6/r7 caches were plain TrieMaps keyed on
  * (SparkSession, sfDir) that held their materialized frames forever —
  * correct for the driver/bench lifecycles (one sfDir per JVM), a leak for
  * a long-lived [[graft.server.JobServer]] session cycling many data dirs:
  * every dir pinned its localCheckpoint blocks until JVM exit. This cache
  * keeps the `maxEntries` most-recently-used entries and releases evicted
  * values' storage via `onEvict` (→ unpersist) so a session's resident
  * block set is bounded by the cap, not by its history.
  *
  * Eviction safety: a released localCheckpoint frame cannot be recomputed
  * (lineage truncated), so an entry must not be evicted while a consumer
  * is still mid-action on it. Eviction requires `maxEntries` DISTINCT
  * newer keys, so with W concurrent consumers a cap of >= 2W means an
  * in-flight job's frame is only evictable if `maxEntries` other data
  * dirs are submitted while it runs — impossible with W workers unless
  * one job itself touches cap+1 dirs. That 2W bound is ENFORCED where
  * concurrency is configured: [[graft.server.JobServer]] `require`s its
  * worker count against [[FamilyCache.DefaultCap]] at construction, so
  * raising server concurrency without widening the caches fails loudly
  * instead of silently re-opening the evict-while-in-flight failure
  * (unrecomputable missing blocks).
  *
  * Access is fully synchronized INCLUDING the build thunk — same
  * discipline as the TrieMaps it replaces (a racing thunk is a duplicate
  * eagerly-materialized checkpoint whose blocks nothing would release).
  */
private[graft] final class FamilyCache[K, V](maxEntries: Int = FamilyCache.DefaultCap,
                                             onEvict: V => Unit) {
  require(maxEntries >= 1, s"bad cap $maxEntries")
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]
  // hit/miss tallies under the same lock as the map — the staging/eviction
  // economics the JobServer /metrics route surfaces (a cache whose misses
  // grow per submit is being thrashed past its cap; a cache with zero hits
  // is staging work nothing consumes)
  private var hitCount = 0L
  private var missCount = 0L

  def getOrElseUpdate(k: K, thunk: => V): V = synchronized {
    m.get(k) match {
      case Some(v) =>
        hitCount += 1
        m.remove(k); m.put(k, v) // LRU touch: re-insert at the tail
        v
      case None =>
        missCount += 1
        val v = thunk
        m.put(k, v)
        while (m.size > maxEntries) {
          val (ek, ev) = m.head // head = least recently used
          m.remove(ek)
          onEvict(ev)
        }
        v
    }
  }

  /** Test/inspection surface for the bound. */
  private[graft] def size: Int = synchronized(m.size)

  /** (entries, hits, misses) — one consistent snapshot. */
  private[graft] def stats: (Int, Long, Long) =
    synchronized((m.size, hitCount, missCount))
}

private[graft] object FamilyCache {
  /** The library-wide default cap every family cache is constructed with.
    * A single named constant (not a per-site literal) so the eviction-
    * safety check in [[graft.server.JobServer]] (cap >= 2 x workers) is
    * checked against the value the caches actually use.
    */
  val DefaultCap = 4

  /** A cache over single materialized frames released with
    * [[Dedup.release]] — the common case.
    */
  def frames[K](maxEntries: Int = DefaultCap): FamilyCache[K, org.apache.spark.sql.DataFrame] =
    new FamilyCache[K, org.apache.spark.sql.DataFrame](maxEntries, Dedup.release)
}
