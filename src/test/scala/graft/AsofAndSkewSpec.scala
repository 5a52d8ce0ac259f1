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
