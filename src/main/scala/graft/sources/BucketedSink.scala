package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed parquet sink: pre-shuffles a table ONCE at write time so that
  * every later equi-join/aggregation on the bucket key plans without an
  * exchange (the scan's output partitioning already satisfies the join's
  * distribution requirement).
  *
  * This is the storage half of the multimodal/join scale story: at 100 TB,
  * documents and embeddings bucketed on the shared id co-locate, and the
  * repeated id-joins of a training-data pipeline stop paying a shuffle each
  * (FormatsSpec asserts the exchange-free plan). `sortBy` additionally
  * orders rows inside each bucket so single-file buckets can merge-join
  * without an in-memory sort.
  */
object BucketedSink {

  /** Write `df` as a bucketed + in-bucket-sorted parquet table (bucketBy
    * requires the table catalog — a path-only parquet write cannot record
    * bucketing metadata).
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    keyCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
