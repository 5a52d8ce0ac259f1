package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet directly — scans stay columnar/vectorized and Catalyst pushes
  * filters + pruned columns into the parquet reader.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize events.ts to TimestampType (UTC sessions) regardless of how
    * the driver generated the parquet: TIMESTAMP(NANOS) arrives as a raw
    * nanos BIGINT under spark.sql.legacy.parquet.nanosAsLong (`div` is
    * exact integer division — a double roundtrip would lose precision at
    * 1e18 nanos); TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    * TIMESTAMP_NTZ, whose cast to TimestampType under the UTC session
    * timezone preserves the wall-clock instant. Downstream operators
    * (unix_micros, epoch casts, watermarks) all assume TimestampType.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}
