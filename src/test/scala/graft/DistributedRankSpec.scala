package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the distributed global-rank helper that replaced the
  * single-task Window.orderBy in rel_histogram_eqdepth / rel_zorder: on
  * random multisets (duplicates included — ties broken by the unique id in
  * the key tuple), the range-partitioned rank must equal the plain global
  * window's, and ntileFromRank must equal ntile() for every n, INCLUDING
  * the n > rows and rows % n != 0 edge cases that exercise the uneven-tile
  * arithmetic.
  */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def randomDf(seed: Int, rows: Int) = {
    val rng = new scala.util.Random(seed)
    // small value domain forces heavy ties; id disambiguates
    (0 until rows).map(i => (i.toLong, rng.nextInt(7).toLong)).toDF("id", "v")
  }

  test("globalRowNumber equals the single-task global window rank") {
    for (seed <- Seq(1, 2, 3); rows <- Seq(0, 1, 97, 1000)) {
      val df = randomDf(seed, rows)
      val keys = Seq(col("v"), col("id"))
      val got = DistributedRank.globalRowNumber(df, keys, "rnk")
        .select("id", "rnk").as[(Long, Long)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window.orderBy(keys: _*)
      val want = df.withColumn("rnk", row_number().over(w).cast("bigint"))
        .select("id", "rnk").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("globalRunningMin equals the single-task strict-prefix min window") {
    for (seed <- Seq(5, 6); rows <- Seq(0, 1, 97, 1000)) {
      val df = randomDf(seed, rows)
        .withColumn("m", (col("id") * 7919L) % 101L) // value to minimize
      val keys = Seq(col("v").desc, col("id"))
      val got = DistributedRank.globalRunningMin(df, keys, col("m"), "mp")
        .select("id", "mp").as[(Long, Option[Long])].collect().toMap
      val w = org.apache.spark.sql.expressions.Window.orderBy(keys: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val want = df.withColumn("mp", min(col("m")).over(w))
        .select("id", "mp").as[(Long, Option[Long])].collect().toMap
      assert(got == want, s"seed=$seed rows=$rows")
      // the global first row (and only it) must see NULL
      if (rows > 0) assert(want.values.count(_.isEmpty) == 1)
    }
  }

  test("globalRunningSum equals the single-task inclusive-prefix sum window") {
    for (seed <- Seq(7, 8); rows <- Seq(0, 1, 97, 1000)) {
      val df = randomDf(seed, rows)
      // unique keys only (id), matching the gr_sgns_batch cumulative —
      // under ties the RANGE-frame window sums whole peer groups, which a
      // rows-local running sum legitimately need not reproduce
      val got = DistributedRank.globalRunningSum(df, Seq(col("id")), col("v"), "cum")
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      val want = df.withColumn("cum", sum(col("v")).over(w))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("ntileFromRank equals ntile() across uneven and degenerate splits") {
    for (rows <- Seq(1, 7, 10, 23, 100); n <- Seq(1, 3, 10, 16)) {
      val df = randomDf(seed = 42, rows)
      val keys = Seq(col("v"), col("id"))
      val ranked = DistributedRank.globalRowNumber(df, keys, "rnk")
      val total = ranked.agg(count(lit(1)).as("n_rows"))
      val got = ranked.crossJoin(broadcast(total))
        .select(col("id"),
          DistributedRank.ntileFromRank(col("rnk"), col("n_rows"), n).as("t"))
        .as[(Long, Long)].collect().toMap
      val w = org.apache.spark.sql.expressions.Window.orderBy(keys: _*)
      val want = df.withColumn("t", ntile(n).over(w).cast("bigint"))
        .select("id", "t").as[(Long, Long)].collect().toMap
      assert(got == want, s"rows=$rows n=$n")
    }
  }
}
