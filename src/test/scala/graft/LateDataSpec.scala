package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-level proof for st_late_data: the phased three-batch arrival
  * actually DROPS the held-back stragglers inside the streaming engine —
  * the emitted totals differ from the everything-in-one-batch execution
  * (st_windowed_counts) by exactly the straggler rows whose windows were
  * already closed when they arrived. This pins the two-watermark behavior
  * the operator depends on (late filtering by the previous batch's
  * watermark): if a Spark upgrade changed batch admission or watermark
  * semantics, this delta would shift and fail loudly.
  */
class LateDataSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("phased arrival drops exactly the closed-window stragglers", Slow) {
    val d = "/root/testdata/sf0.001"
    val late = SparkEntry.queries("st_late_data")(spark, d)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val all = SparkEntry.queries("st_windowed_counts")(spark, d)
      .agg(sum(col("n"))).collect()(0).getLong(0)

    // batch replay of the drop rule: stragglers (early fifth of the
    // timeline, event_id % 10 = 7) whose 1h window end is at or before the
    // max non-straggler ts AND inside the emission horizon (max all ts)
    val e = Tables.normalizeTs(spark.read.parquet(s"$d/events.parquet"))
      .withColumn("us", unix_micros(col("ts")))
    val b = broadcast(e.agg(min(col("us")).as("mn"), max(col("us")).as("mx"),
      max(col("ts")).as("mxts")))
    val f = e.crossJoin(b).withColumn("str",
      expr("us <= mn + (mx - mn) div 5 AND event_id % 10 = 7"))
    val w1 = f.filter(!col("str")).agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val expectedDropped = f.filter(col("str") &&
        expr(s"date_trunc('hour', ts) + INTERVAL 1 HOUR <= timestamp'$w1'") &&
        expr("date_trunc('hour', ts) + INTERVAL 1 HOUR <= mxts"))
      .count()

    info(s"all=$all late=$late expectedDropped=$expectedDropped")
    assert(expectedDropped > 0, "fixture has no droppable stragglers — rule degenerate")
    assert(all - late == expectedDropped,
      s"engine dropped ${all - late} rows, batch replay says $expectedDropped")
  }
}
