package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded LRU for the per-(session, sfDir) FAMILY CACHES — the
  * materialized frames (MinHash pair set, pair stats, CC labels, streaming
  * sink readers) shared by several inventory queries over the same data
  * dir.
  *
  * Why bounded: the r6/r7 caches were plain TrieMaps keyed on
  * (SparkSession, sfDir) that held their materialized frames forever —
  * correct for the driver/bench lifecycles (one sfDir per JVM), a leak for
  * a long-lived [[graft.server.JobServer]] session cycling many data dirs:
  * every dir pinned its localCheckpoint blocks until JVM exit. This cache
  * keeps the `maxEntries` most-recently-used entries and releases evicted
  * frames' storage ([[Dedup.release]] → unpersist) so a session's resident
  * block set is bounded by the cap, not by its history.
  *
  * Eviction safety: a released localCheckpoint frame cannot be recomputed
  * (lineage truncated), so an entry must not be evicted while a consumer
  * is still mid-action on it. Eviction requires `maxEntries` DISTINCT
  * newer keys, so with the JobServer's 2 worker threads a cap of 4 means
  * an in-flight job's frame is only evictable if 4 other data dirs are
  * submitted while it runs — impossible with 2 workers unless one job
  * itself touches 5 dirs. Size the cap to at least 2× the concurrent
  * consumer count.
  *
  * Access is fully synchronized INCLUDING the build thunk — same
  * discipline as the TrieMaps it replaces (a racing thunk is a duplicate
  * eagerly-materialized checkpoint whose blocks nothing would release).
  */
private[graft] final class FamilyCache[K](maxEntries: Int = 4,
                                          onEvict: DataFrame => Unit = Dedup.release) {
  require(maxEntries >= 1, s"bad cap $maxEntries")
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, DataFrame]

  def getOrElseUpdate(k: K, thunk: => DataFrame): DataFrame = synchronized {
    m.get(k) match {
      case Some(df) =>
        m.remove(k); m.put(k, df) // LRU touch: re-insert at the tail
        df
      case None =>
        val df = thunk
        m.put(k, df)
        while (m.size > maxEntries) {
          val (ek, edf) = m.head // head = least recently used
          m.remove(ek)
          onEvict(edf)
        }
        df
    }
  }

  /** Test/inspection surface for the bound. */
  private[graft] def size: Int = synchronized(m.size)
}
