package graft

import graft.operators.IntervalJoin
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Property test for the bucketed interval join: for ANY bucket width, the
  * binning (interval → covered buckets, point → its bucket, equi-join,
  * refine) must produce exactly the naive inequality-join pair set — the
  * bucket arithmetic (floor division on truncated epoch seconds at both
  * interval ends) is the easiest place for an off-by-one to hide, e.g. at
  * points landing exactly on a bucket or interval boundary.
  */
class IntervalJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ts(sec: Int): Timestamp = new Timestamp(1704067200000L + sec * 1000L)

  // seconds in a small range with heavy collision probability; spans chosen
  // to land exactly on bucket multiples sometimes
  private val keyGen = Gen.choose(0L, 2L)
  private val secGen = Gen.choose(0, 400)
  private val spanGen = Gen.oneOf(0, 1, 60, 90, 120)

  private val intervalsGen = Gen.listOfN(20, Gen.zip(keyGen, secGen, spanGen))
    .map(_.zipWithIndex.map { case ((k, s, sp), i) => (i.toLong, k, s, s + sp) })
  private val pointsGen = Gen.listOfN(40, Gen.zip(keyGen, secGen))
    .map(_.zipWithIndex.map { case ((k, s), i) => (i.toLong, k, s) })

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  test("bucketed == naive for every bucket width on randomized boundary-heavy data") {
    (0 until 3).foreach { i =>
      val ivs = sample(intervalsGen, 3000L + i)
      val pts = sample(pointsGen, 4000L + i)
      val ivDf = ivs.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
        .toDF("iv_id", "key", "start_ts", "end_ts")
      val ptDf = pts.map { case (id, k, s) => (id, k, ts(s)) }
        .toDF("pt_id", "p_key", "p_ts")
      val naive = ivDf.join(ptDf,
        $"key" === $"p_key" && $"p_ts" >= $"start_ts" && $"p_ts" <= $"end_ts")
        .select($"iv_id", $"pt_id").as[(Long, Long)].collect().toSet
      assert(naive.nonEmpty, s"degenerate sample at seed $i")
      Seq(1L, 7L, 60L, 300L).foreach { width =>
        val bucketed = IntervalJoin.pointInInterval(ivDf, ptDf,
          "key", "p_key", "start_ts", "end_ts", "p_ts", bucketSeconds = width)
          .select($"iv_id", $"pt_id").as[(Long, Long)].collect().toSet
        assert(bucketed == naive, s"width=$width seed=$i")
      }
    }
  }
}
