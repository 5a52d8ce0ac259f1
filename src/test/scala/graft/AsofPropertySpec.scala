package graft

import graft.operators.AsofJoin
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Property tests for the as-of join: on randomized null-heavy inputs, the
  * composed union+window plan, the native AsofJoinExec merge, and a direct
  * in-Scala evaluation of the SQL semantics (latest right row with
  * rts <= lts per equal non-null key; ties broken by max payload) must all
  * agree. Seeded generators, same pattern as MapReducePropertySpec.
  */
class AsofPropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // small domains force key collisions, (key, ts) ties, and null hits
  private val keyGen = Gen.frequency(9 -> Gen.choose(0L, 3L).map(Option(_)), 1 -> Gen.const(None))
  private val tsGen = Gen.frequency(9 -> Gen.choose(0, 15).map(Option(_)), 1 -> Gen.const(None))

  private val leftGen = Gen.listOfN(25, Gen.zip(keyGen, tsGen))
    .map(_.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
  private val rightGen = Gen.listOfN(25, Gen.zip(keyGen, tsGen, Gen.choose(0, 5)))
    .map(_.zipWithIndex.map { case ((k, t, p), i) => (k, t, p.toDouble, i.toLong) })

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  /** Direct evaluation of the as-of semantics both Spark plans implement. */
  private def reference(left: Seq[(Option[Long], Option[Int], Long)],
                        right: Seq[(Option[Long], Option[Int], Double, Long)])
      : Map[Long, Option[(Double, Long)]] =
    left.map { case (k, t, id) =>
      id -> (for { kk <- k; tt <- t } yield {
        val cands = right.collect {
          case (Some(rk), Some(rt), px, rid) if rk == kk && rt <= tt => (rt, px, rid)
        }
        if (cands.isEmpty) None else Some(cands.max).map(c => (c._2, c._3))
      }).flatten
    }.toMap

  test("composed, native, and in-Scala as-of agree on randomized null-heavy data") {
    (0 until 5).foreach { i =>
      val l = sample(leftGen, 1000L + i)
      val r = sample(rightGen, 2000L + i)
      val lDf = l.map { case (k, t, id) => (k, t.map(ts), id) }.toDF("key", "ts", "id")
      val rDf = r.map { case (k, t, px, rid) => (k, t.map(ts), px, rid) }
        .toDF("qkey", "qts", "px", "rid")

      val exp = reference(l, r)

      val composed = AsofJoin.asof(
        lDf, rDf.toDF("key", "ts", "px", "rid"), "key", "ts", Seq("px", "rid"))
        .select($"id", $"matched_px", $"matched_rid")
        .as[(Long, Option[Double], Option[Long])].collect()
        .map { case (id, px, rid) => id -> px.zip(rid).headOption }.toMap

      val native = AsofJoin.asofNative(lDf, rDf, "key", "qkey", "ts", "qts")
        .select($"id", $"px", $"rid")
        .as[(Long, Option[Double], Option[Long])].collect()
        .map { case (id, px, rid) => id -> px.zip(rid).headOption }.toMap

      assert(composed == exp, s"composed != reference at seed $i")
      assert(native == exp, s"native != reference at seed $i")
    }
  }
}
