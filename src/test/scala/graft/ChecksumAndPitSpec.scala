package graft

import graft.operators.RelationalQueries4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChecksumAndPitSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("table checksum is partition- and order-independent") {
    val li = Tables.t(spark, sf, "lineitem")
    val base = RelationalQueries4.lineitemChecksum(li)
      .as[(String, Long, Long)].collect().toSeq
    // shuffled row order + different partitioning must fingerprint equal
    val scrambled = RelationalQueries4.lineitemChecksum(
      li.repartition(13, col("l_partkey")))
      .as[(String, Long, Long)].collect().toSeq
    assert(base == scrambled)
    assert(base.map(_._3).distinct.size == base.size,
      "per-group checksums should differ (non-degenerate hash)")
  }

  test("table checksum detects a single-cell mutation") {
    val li = Tables.t(spark, sf, "lineitem")
    val (ok, ln) = li.select(col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber").as[(Long, Int)].head()
    val mutated = li.withColumn("l_quantity",
      when(col("l_orderkey") === ok && col("l_linenumber") === ln,
        col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    val a = RelationalQueries4.lineitemChecksum(li)
      .as[(String, Long, Long)].collect().toMap2
    val b = RelationalQueries4.lineitemChecksum(mutated)
      .as[(String, Long, Long)].collect().toMap2
    assert(a != b, "mutation must change some group checksum")
    assert(a.keySet == b.keySet && a.count { case (k, v) => b(k) != v } == 1,
      "exactly one group fingerprint should move")
  }

  test("PIT join via native as-of equals the explicit interval join") {
    // reference implementation: the SCD2 interval form (from <= ts < to)
    // computed directly with Spark joins, compared against the registered
    // ts_pit_join (single-pass as-of operator) row for row.
    val ev = Tables.t(spark, sf, "events")
    val touches = ev.filter(col("event_type").isin("view", "click"))
    val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wTyp = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val runs = touches
      .withColumn("rn", row_number().over(wAll))
      .withColumn("rt", row_number().over(wTyp))
      .groupBy(col("user_id").as("d_user"), col("event_type").as("d_state"),
        (col("rn") - col("rt")).as("island"))
      .agg(min(col("ts")).as("d_from"), min(col("event_id")).as("d_first"))
    val wv = Window.partitionBy("d_user").orderBy(col("d_from"), col("d_first"))
    val dim = runs.withColumn("d_to", lead(col("d_from"), 1).over(wv))
    val interval = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(dim, col("user_id") === col("d_user") && col("ts") >= col("d_from")
        && (col("d_to").isNull || col("ts") < col("d_to")), "left")
      .select(col("event_id"),
        col("d_state").as("state_at_purchase"),
        col("d_first").as("state_version"))
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1).toSeq
    val asof = SparkEntry.queries("ts_pit_join")(spark, sf)
      .select(col("event_id"), col("state_at_purchase"), col("state_version"))
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1).toSeq
    assert(asof == interval)
    assert(asof.exists(_._2.isDefined) && asof.exists(_._2.isEmpty),
      "fixture should produce both matched and pre-first-touch purchases")
  }

  private implicit class Tup3Ops(rs: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rs.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
