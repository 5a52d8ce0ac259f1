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

  test("tolerance-bounded native as-of equals unbounded with stale matches nulled") {
    // Exact equivalence, not approximation: the latest preceding right row
    // is the ONLY tolerance candidate (earlier rows are staler), so the
    // bounded join must equal the unbounded join with matches whose gap
    // exceeds the bound dropped to null. Also checks the in-Scala reference
    // with the gap bound applied directly.
    val tolMin = 5
    (0 until 5).foreach { i =>
      val l = sample(leftGen, 3000L + i)
      val r = sample(rightGen, 4000L + i)
      val lDf = l.map { case (k, t, id) => (k, t.map(ts), id) }.toDF("key", "ts", "id")
      val rDf = r.map { case (k, t, px, rid) => (k, t.map(ts), px, rid) }
        .toDF("qkey", "qts", "px", "rid")

      // reference with the bound: match survives iff gap <= tol minutes
      val lTimes = l.map { case (_, t, id) => id -> t }.toMap
      val rTimes = r.map { case (_, t, _, rid) => rid -> t }.toMap
      val exp = reference(l, r).map { case (id, m) =>
        id -> m.filter { case (_, rid) =>
          (for { lt <- lTimes(id); rt <- rTimes(rid) } yield lt - rt <= tolMin)
            .getOrElse(false)
        }
      }

      val bounded = AsofJoin.asofNative(lDf, rDf, "key", "qkey", "ts", "qts",
          toleranceMicros = Some(tolMin * 60L * 1000000))
        .select($"id", $"px", $"rid")
        .as[(Long, Option[Double], Option[Long])].collect()
        .map { case (id, px, rid) => id -> px.zip(rid).headOption }.toMap

      val unboundedNulled = AsofJoin.asofNative(lDf, rDf, "key", "qkey", "ts", "qts")
        .select($"id", $"px", $"rid", $"ts", $"qts")
        .as[(Long, Option[Double], Option[Long], Option[Timestamp], Option[Timestamp])]
        .collect()
        .map { case (id, px, rid, lt, rt) =>
          val within = (for { a <- lt; b <- rt }
            yield a.getTime - b.getTime <= tolMin * 60L * 1000).getOrElse(false)
          id -> (if (within) px.zip(rid).headOption else None)
        }.toMap

      assert(bounded == exp, s"bounded != reference at seed $i")
      assert(bounded == unboundedNulled, s"bounded != nulled-unbounded at seed $i")
    }
  }
}
