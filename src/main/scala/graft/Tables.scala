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
  /** Spread a DERIVATION-HEAVY scan across the session's default
    * parallelism when the landing under-fills it. The driver testdata
    * tables are single-row-group parquet files, so every scan is ONE
    * partition and everything before the first exchange — tokenization,
    * per-position hashing, explode fan-out, payload encode/decode — runs
    * on one core of the whole session (guide §6 input-split sizing /
    * §2.6 idle capacity; measured: the 4-token span-hash pipeline over
    * documents reads 0.82 s single-partition vs 0.57 s spread at sf0.1
    * on 32 cores, and CPU-bound decode pipelines gain proportionally
    * more). The repartition is CONDITIONAL on the scan actually
    * under-filling the session, so at warehouse scale — where the scan
    * already splits into >= parallelism tasks — no exchange is added and
    * the plan is unchanged; this is deliberately NOT applied to plain
    * scan->partial-aggregate shapes, where shuffling full rows forfeits
    * map-side pre-aggregation and measured 2x SLOWER than the
    * single-partition scan.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}
