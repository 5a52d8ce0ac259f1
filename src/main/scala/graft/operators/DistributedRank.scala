package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale form of
  * `row_number().over(Window.orderBy(...))` on a fact-sized input.
  *
  * An unpartitioned ordered window funnels the whole input through ONE
  * task; fine on a 60k-row audit, fatal at 100 TB. The scalable identity is
  * the one every distributed sort uses: range-partition by the sort keys
  * (each task owns a contiguous key range), rank locally, then add the
  * exclusive prefix sum of partition sizes. Spark gives all three pieces
  * natively: `repartitionByRange` (sampled range boundaries),
  * `row_number` partitioned by `spark_partition_id`, and a partition-count-
  * sized offsets frame (the only unpartitioned window left runs over
  * numPartitions rows, never the fact table).
  */
object DistributedRank {

  /** Appends `out` = the 1-based GLOBAL row number under `keys` without an
    * unpartitioned fact-sized window. `keys` must be a total order (include
    * unique tie-breakers), or ranks within ties are nondeterministic —
    * exactly as with the window it replaces.
    *
    * Cost: one range shuffle + one extra (materialized) pass for partition
    * sizes, vs. the single-task global sort it replaces. The partition ids
    * are captured AFTER an eager materialize so the size pass and the rank
    * pass see identical partitioning (a recompute could legally re-sample
    * range boundaries).
    *
    * Lifecycle of the per-call materialize (here and in
    * [[globalRunningMin]]): the checkpointed blocks are referenced only
    * through the returned frame — once the caller's query completes and
    * the frame is garbage-collected, Spark's ContextCleaner
    * (referenceTracking, on by default) drops the blocks. Unlike the
    * family caches (strong references held in a map — why FamilyCache
    * exists), nothing pins these across queries.
    */
  def globalRowNumber(df: DataFrame, keys: Seq[Column], out: String): DataFrame = {
    val ranged = Dedup.materialize(
      df.repartitionByRange(keys: _*).withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = Window.partitionBy("__pid").orderBy(keys: _*)
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(out, row_number().over(local).cast("bigint") + col("__off"))
      .drop("__pid", "__off")
  }

  /** Appends `out` = min of `value` over all rows STRICTLY BEFORE the
    * current one in global `keys` order (the `min(v).over(orderBy(keys)
    * .rowsBetween(unboundedPreceding, -1))` frame), without an
    * unpartitioned fact-sized window: range-partition by the sort keys,
    * take the per-partition local running min, and fold in the prefix min
    * of PRIOR partitions' minima (a numPartitions-sized frame, broadcast).
    * NULL for the global first row, like the window it replaces. `least`
    * skips NULLs, so a partition's first row correctly sees only the prior
    * partitions' minimum. Backs rel_skyline's Pareto-front pass.
    */
  def globalRunningMin(df: DataFrame, keys: Seq[Column], value: Column,
                       out: String): DataFrame = {
    val ranged = Dedup.materialize(
      df.repartitionByRange(keys: _*).withColumn("__pid", spark_partition_id()))
    val prevW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = ranged.groupBy("__pid").agg(min(value).as("__pm"))
      .withColumn("__pmin", min(col("__pm")).over(prevW))
      .select(col("__pid"), col("__pmin"))
    val local = Window.partitionBy("__pid").orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(prefix), "__pid")
      .withColumn(out, least(min(value).over(local), col("__pmin")))
      .drop("__pid", "__pmin")
  }

  /** Appends `out` = sum of `value` over all rows AT OR BEFORE the current
    * one in global `keys` order (the inclusive running total — the
    * `sum(v).over(orderBy(keys))` frame) without an unpartitioned
    * fact-sized window: range-partition by the sort keys, take the
    * per-partition local running sum, and add the exclusive prefix sum of
    * PRIOR partitions' totals (a numPartitions-sized frame, broadcast).
    * The cumulative-distribution builder behind inverse-transform
    * sampling (gr_sgns_batch's quantized negative-sampling slot table).
    */
  def globalRunningSum(df: DataFrame, keys: Seq[Column], value: Column,
                       out: String): DataFrame = {
    val ranged = Dedup.materialize(
      df.repartitionByRange(keys: _*).withColumn("__pid", spark_partition_id()))
    val prevW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = ranged.groupBy("__pid").agg(sum(value).as("__ps"))
      .withColumn("__off", coalesce(sum(col("__ps")).over(prevW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = Window.partitionBy("__pid").orderBy(keys: _*)
    ranged.join(broadcast(prefix), "__pid")
      .withColumn(out, sum(value).over(local) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Floor division for NON-NEGATIVE bigint columns. The intermediate
    * double is exact while the quotient stays under 2^53 — i.e. for any
    * table under ~9e15 rows — which keeps the expression codegen-friendly
    * without an expr()-string detour for SQL `div`.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("bigint")

  /** ntile(n) as a pure function of a global row number and the total count
    * N (ntile's spec: the first N mod n tiles take floor(N/n)+1 rows, the
    * rest floor(N/n)) — so an exact equi-depth bucketing needs no global
    * window at all, just [[globalRowNumber]] plus this arithmetic against a
    * broadcast scalar N.
    */
  def ntileFromRank(rank: Column, total: Column, n: Int): Column = {
    val base = idiv(total, lit(n))
    val rem = total % n
    val cut = rem * (base + lit(1))
    when(rank <= cut, idiv(rank - 1, base + lit(1)) + lit(1))
      .otherwise(rem + idiv(rank - lit(1) - cut, base) + lit(1))
  }
}
