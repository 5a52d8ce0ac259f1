package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is strictly batch (hard
  * map->reduce barrier, SURVEY §2.3 "Streaming: ABSENT"), so this is part of
  * the ✚ extension surface: the same event-table transforms, expressed so
  * they run identically on a batch DataFrame or a `readStream` DataFrame.
  *
  * Scale notes: watermarks bound state; windowed aggregates shuffle on
  * (window, key); session windows keep per-key state merged by gap — all
  * standard Structured Streaming state-store behavior.
  */
object EventStreams {

  /** Tumbling-window counts with a watermark for late data. Works on batch
    * and streaming inputs; on a stream use append/update mode downstream.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization via the native session_window — identical
    * semantics to the batch ts_session_window query.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
}
