package graft.sources

import scala.collection.concurrent.TrieMap

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped BUCKETED copies of the orders/lineitem pair — the storage
  * layout that makes repeated fact-to-fact equi-joins shuffle-free: both
  * tables are pre-hashed into the same number of buckets on their join key
  * at WRITE time (via [[BucketedSink]]), so every later join on that key
  * plans without an Exchange on either side (asserted in PlanQualitySpec).
  *
  * At 100 TB this is the difference between re-shuffling two fact tables on
  * every pipeline run and paying the partitioning once at ingest — the same
  * "land the layout once, reuse it every query" pattern as
  * [[PartitionedView]] (DPP) but for join distribution instead of partition
  * pruning.
  */
object BucketedView {

  /** Keyed on (session, sfDir): bucketing metadata lives in the session's
    * catalog, so a fresh session must re-register (cheap — the same
    * warehouse write is simply overwritten). Bench warms on sf0.001 and
    * times sf0.1 in one session, hence the per-sfDir table names.
    */
  private val cache = TrieMap.empty[(SparkSession, String), (String, String)]

  private val Buckets = 8

  /** Returns (ordersTable, lineitemTable) catalog names, both bucketed by
    * their orderkey into [[Buckets]] buckets.
    *
    * Synchronized, not getOrElseUpdate: TrieMap only arbitrates the CACHED
    * value, it still evaluates a racing thunk in every caller — and unlike
    * PartitionedView/IvfView (whose racing writers target unique TempDirs),
    * two concurrent first callers here would Overwrite-race the SAME
    * catalog table names (e.g. two simultaneous JobServer submissions of
    * the bucketed-join query on a fresh session).
    */
  def ordersLineitem(s: SparkSession, sfDir: String): (String, String) =
    synchronized {
      cache.getOrElseUpdate((s, sfDir), {
        val tag = java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL)
        val ot = s"graft_b_orders_$tag"
        val lt = s"graft_b_lineitem_$tag"
        BucketedSink.writeBucketed(Tables.t(s, sfDir, "orders"), ot, Buckets,
          Seq("o_orderkey"))
        BucketedSink.writeBucketed(Tables.t(s, sfDir, "lineitem"), lt, Buckets,
          Seq("l_orderkey"))
        (ot, lt)
      })
    }

  def tables(s: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val (ot, lt) = ordersLineitem(s, sfDir)
    (s.table(ot), s.table(lt))
  }
}
