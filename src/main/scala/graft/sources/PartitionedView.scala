package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Session-scoped DATE-PARTITIONED copy of the events table plus a tiny
  * date-dimension parquet — the storage layout that makes dynamic partition
  * pruning (DPP) observable: at 100 TB a fact table is laid out exactly like
  * this (one directory per ingest date), and a join against a filtered dim
  * prunes whole date partitions at RUNTIME from the dim's broadcast result —
  * the scan never opens the pruned directories, the single biggest I/O lever
  * for selective scans over date-partitioned corpora.
  *
  * Written once per (session, sfDir) and reused (same caching pattern as
  * PipelineQueries' minhash pair view): a production pipeline lands the
  * partitioned layout at ingest, it is not recreated per query.
  */
object PartitionedView {

  // Keyed on the SOURCE DIR only: the layout's content is a pure function
  // of the input table, so a recreated session reuses it (and the cache
  // never pins a SparkSession object). JVM-exit cleanup via [[TempDirs]].
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Returns a base dir containing `events_by_date/` (parquet partitioned by
    * the `d = to_date(ts)` column, ~30 partitions on the test data) and
    * `date_dim/` (one row per date: d, dow with ISO Monday=1).
    */
  def eventsByDate(s: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(sfDir, {
      val base = TempDirs.create("graft_part_events").toString
      val ev = Tables.t(s, sfDir, "events")
      ev.withColumn("d", to_date(col("ts")))
        .write.partitionBy("d").mode("overwrite")
        .parquet(s"$base/events_by_date")
      ev.select(to_date(col("ts")).as("d")).distinct()
        .withColumn("dow", (weekday(col("d")) + 1).cast("int"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$base/date_dim")
      base
    })
}
