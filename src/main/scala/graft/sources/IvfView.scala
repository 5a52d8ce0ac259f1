package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Session-scoped LABEL-PARTITIONED landing of the embeddings table — the
  * storage half of an IVF index: one directory per cluster, so a routed
  * search joined against its broadcast probe set prunes whole directories
  * at runtime (the vector twin of [[PartitionedView]]'s date layout). At
  * 100 TB this is the layout an ANN serving tier lands at index-build
  * time; the probe then scans ~1/k of the corpus regardless of total size.
  *
  * Written once per source dir and reused (same caching pattern as
  * PartitionedView); JVM-exit cleanup via [[TempDirs]].
  */
object IvfView {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Returns a dir containing the embeddings written `partitionBy("label")`
    * (vec_id, embedding payload columns; label as the partition column).
    */
  def embeddingsByLabel(s: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(sfDir, {
      val base = TempDirs.create("graft_ivf_embs").toString
      Tables.t(s, sfDir, "embeddings")
        .write.partitionBy("label").mode("overwrite")
        .parquet(s"$base/embeddings_by_label")
      s"$base/embeddings_by_label"
    })
}
