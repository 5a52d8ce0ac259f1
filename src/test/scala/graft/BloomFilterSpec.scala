package graft

import graft.functions.BloomFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit gate for the mergeable Bloom filter behind rel_bloom_join: the
  * structural no-false-negative guarantee, an FP-rate sanity band at design
  * load, the merge = single-build equivalence that makes shard rollups
  * lossless, and cross-form agreement between the Scala bit positions and
  * the generated Spark SQL probe predicate (the same generator feeds the
  * DuckDB oracle, so this pins all three forms together).
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private val members = (0L until 5000L).map(_ * 7 + 3)
  private val nonMembers = (0L until 20000L).map(_ * 13 + 1).filterNot(members.toSet)

  private lazy val probed = {
    val bloom = members.toDF("k").agg(BloomFns.bloom_agg(col("k")).as("bits"))
    (members.map((_, true)) ++ nonMembers.map((_, false))).toDF("k", "member")
      .crossJoin(broadcast(bloom))
      .select(col("k"), col("member"),
        expr(BloomFns.mightContainSql("bits", "k")).as("might"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
  }

  test("no false negatives: every inserted key passes the probe") {
    val fn = probed.count { case (_, m, might) => m && !might }
    assert(fn == 0, s"$fn members failed the membership probe")
  }

  test("false-positive rate stays in the designed band at m/n ~ 13") {
    val (fp, negs) = (probed.count { case (_, m, might) => !m && might },
      probed.count(!_._2))
    val rate = fp.toDouble / negs
    // k=7, m=65536, n=5000: (1 - e^{-kn/m})^k ~ 0.2%; assert an order of
    // magnitude of headroom, not the exact analytic value
    assert(rate < 0.02, s"FP rate $rate out of band ($fp of $negs non-members)")
    info(f"fp rate = $rate%.5f ($fp of $negs non-members)")
  }

  test("sharded build + merge equals the single-shard build bit for bit") {
    val whole = members.foldLeft(BloomFns.bloomAgg.zero)(BloomFns.bloomAgg.reduce)
    val merged = members.grouped(1000)
      .map(_.foldLeft(BloomFns.bloomAgg.zero)(BloomFns.bloomAgg.reduce))
      .reduce(BloomFns.bloomAgg.merge)
    assert(whole.toSeq == merged.toSeq)
  }

  test("Spark-dialect and DuckDB-dialect bit positions agree on the engine") {
    // both dialect strings evaluated BY SPARK must agree — DuckDB-side
    // equivalence is the oracle gate's job; this pins the generator itself
    val df = (1L to 500L).toDF("k")
    (0 until BloomFns.NumHash).foreach { i =>
      val diff = df.select(
          expr(BloomFns.bitPosSql(i, "k", spark = true)).as("a"),
          expr(BloomFns.bitPosSql(i, "k", spark = false)).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"hash $i dialects disagree on $diff keys")
    }
  }
}
