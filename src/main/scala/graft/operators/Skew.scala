package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation primitives. AQE's skew-join splitting covers most
  * cases at runtime; salting is the plan-level tool for when a join key is so
  * hot that even split partitions overwhelm a task (the classic 100 TB
  * web-corpus "null key / top domain" problem).
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt in
    * [0, salts) derived from `saltSource` (any column(s) that vary within a
    * key — NOT random, so results are reproducible); the small side is
    * replicated `salts` times. The join key becomes (key, salt), spreading
    * each hot key over `salts` tasks. Result set is identical to the plain
    * equi-join.
    *
    * The shuffle_hash hint pins the SHUFFLED join path: salting only does
    * anything for a join that partitions by key — left to itself Catalyst
    * broadcast the salts-times-replicated small side (its pre-replication
    * estimate still looked broadcastable), which both negates the
    * mitigation being demonstrated and pays a driver-side hash build of
    * the replicated relation (measured 3.5s -> 1.7s at sf0.1 for the
    * bench shape). A genuinely hot-keyed 100 TB join is far past the
    * broadcast threshold anyway — the hint makes the demo the real plan.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val l = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
    val s = small.withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(s.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: pre-aggregate on (key, salt), then
    * final-aggregate on key. Spark's partial aggregation already does this
    * for algebraic aggregates; this form is for aggregates where the
    * map-side combine doesn't engage (e.g. exact collect-based aggs).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, saltSource: Column,
                salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
