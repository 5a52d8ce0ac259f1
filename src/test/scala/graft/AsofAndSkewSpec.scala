package graft

import graft.operators.{AsofJoin, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsofAndSkewSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("asof join picks the latest right row at or before each left row") {
    val trades = Seq((1L, ts(5), "t1"), (1L, ts(10), "t2"), (2L, ts(3), "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, ts(4), 100.0), (1L, ts(9), 110.0), (1L, ts(11), 120.0))
      .toDF("key", "ts", "px")
    val got = AsofJoin.asof(trades, quotes, "key", "ts", Seq("px"))
      .select($"trade", $"matched_px").as[(String, Option[Double])].collect().toMap
    assert(got == Map("t1" -> Some(100.0), "t2" -> Some(110.0), "t3" -> None))
  }

  test("asof join matches a right row at exactly the same timestamp (<=)") {
    val l = Seq((1L, ts(5), "x")).toDF("key", "ts", "tag")
    val r = Seq((1L, ts(5), 42.0)).toDF("key", "ts", "px")
    val got = AsofJoin.asof(l, r, "key", "ts", Seq("px"))
      .select($"matched_px").as[Option[Double]].head()
    assert(got.contains(42.0))
  }

  test("native asof join picks the latest right row at or before each left row") {
    val trades = Seq((1L, ts(5), "t1"), (1L, ts(10), "t2"), (2L, ts(3), "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, ts(4), 100.0), (1L, ts(9), 110.0), (1L, ts(11), 120.0))
      .toDF("qkey", "qts", "px")
    val got = AsofJoin.asofNative(trades, quotes, "key", "qkey", "ts", "qts")
      .select($"trade", $"px").as[(String, Option[Double])].collect().toMap
    assert(got == Map("t1" -> Some(100.0), "t2" -> Some(110.0), "t3" -> None))
  }

  test("native asof join: <= match, null keys/times never match, ties take max payload") {
    val l = Seq(
      (Some(1L), Some(ts(5)), "exact"),   // right row at exactly ts(5) matches
      (Some(1L), Some(ts(6)), "tie"),     // two right rows at ts(5): max px wins
      (None, Some(ts(9)), "nullkey"),     // NULL key never matches
      (Some(1L), None, "nullts"))         // NULL left time never matches
      .toDF("key", "ts", "tag")
    val r = Seq(
      (Some(1L), Some(ts(5)), Some(42.0)),
      (Some(1L), Some(ts(5)), Some(43.0)),
      (Some(1L), None, Some(99.0)),       // NULL right time never matches
      (Option.empty[Long], Some(ts(1)), Some(77.0))) // NULL right key never matches
      .toDF("qkey", "qts", "px")
    val got = AsofJoin.asofNative(l, r, "key", "qkey", "ts", "qts")
      .select($"tag", $"px").as[(String, Option[Double])].collect().toMap
    assert(got == Map("exact" -> Some(43.0), "tie" -> Some(43.0),
      "nullkey" -> None, "nullts" -> None))
  }

  test("native asof join fails fast on shared columns or mismatched time types") {
    val l = Seq((1L, ts(5), "t1")).toDF("key", "ts", "trade")
    val sharedName = Seq((1L, ts(4), 1.0)).toDF("qkey", "ts", "px") // "ts" collides
    val e1 = intercept[IllegalArgumentException](
      AsofJoin.asofNative(l, sharedName, "key", "qkey", "ts", "ts"))
    assert(e1.getMessage.contains("disjoint"))
    val dateTime = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("qkey", "qts", "px") // DATE vs TIMESTAMP
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.asofNative(l, dateTime, "key", "qkey", "ts", "qts"))
    assert(e2.getMessage.contains("time column types differ"))
  }

  test("native asof join handles empty sides") {
    val l = Seq((1L, ts(5), "t1")).toDF("key", "ts", "trade")
    val emptyR = Seq.empty[(Long, Timestamp, Double)].toDF("qkey", "qts", "px")
    val got = AsofJoin.asofNative(l, emptyR, "key", "qkey", "ts", "qts")
      .select($"trade", $"px").as[(String, Option[Double])].collect().toMap
    assert(got == Map("t1" -> None))
    val emptyL = Seq.empty[(Long, Timestamp, String)].toDF("key", "ts", "trade")
    val r = Seq((1L, ts(4), 100.0)).toDF("qkey", "qts", "px")
    assert(AsofJoin.asofNative(emptyL, r, "key", "qkey", "ts", "qts").count() == 0)
  }

  test("native asof join equals the composed union+window asof on events") {
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"), $"ts".as("cts"))
    val composed = AsofJoin.asof(purchases, clicks, "user_id", "ts", Seq("click_id", "cts"))
      .select($"event_id", $"matched_click_id")
      .as[(Long, Option[Long])].collect().toMap
    val clicksR = clicks.select($"user_id".as("c_user_id"), $"cts", $"click_id")
    val native = AsofJoin.asofNative(purchases, clicksR, "user_id", "c_user_id", "ts", "cts")
      .select($"event_id", $"click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("native asof join plan shuffles both sides on the key exactly once") {
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"ts".as("cts"), $"event_id".as("click_id"))
    val plan = AsofJoin.asofNative(l, r, "user_id", "c_user_id", "ts", "cts")
      .queryExecution.executedPlan
    val s = plan.toString
    // physical nodes print without the Exec suffix
    assert(s.contains("AsofJoin ["), s)
    assert(s.linesIterator.count(_.contains("Exchange")) == 2, s)
  }

  test("bucketed interval join equals the naive inequality join") {
    import graft.operators.IntervalJoin
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"),
        ($"ts" + expr("INTERVAL 30 MINUTES")).as("p_end"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val bucketed = IntervalJoin.pointInInterval(purchases, clicks,
      "user_id", "c_user_id", "p_ts", "p_end", "c_ts", bucketSeconds = 600L)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    val naive = purchases.join(clicks,
      $"user_id" === $"c_user_id" && $"c_ts" >= $"p_ts" && $"c_ts" <= $"p_end")
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    assert(bucketed == naive)
  }

  test("bucketed interval join plans as an equi-join, not a nested loop") {
    import graft.operators.IntervalJoin
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"),
        ($"ts" + expr("INTERVAL 30 MINUTES")).as("p_end"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val p = IntervalJoin.pointInInterval(purchases, clicks,
      "user_id", "c_user_id", "p_ts", "p_end", "c_ts", bucketSeconds = 600L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("salted join equals plain join") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val o = Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(o, "l_orderkey").groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(li, o, "l_orderkey", $"l_linenumber", 8)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val plain = li.groupBy("l_returnflag").agg(sum($"l_quantity").as("s"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", $"l_orderkey", 8)
      .as[(String, Double)].collect().toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-6) }
  }
}
