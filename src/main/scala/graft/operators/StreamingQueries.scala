package graft.operators

import graft.{QueryDef, Tables}
import graft.streaming.{EventStreams, StreamGate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming inventory: the EventStreams transforms executed THROUGH the
  * Structured Streaming engine (file stream source → watermarked stateful
  * operator → append-mode parquet sink, `Trigger.AvailableNow`) and gated by
  * the same DuckDB SQL as their batch twins — see [[graft.streaming.StreamGate]].
  *
  * Append-mode horizon semantics: with a 0-second watermark delay the final
  * watermark is max(ts), so the emitted rows are exactly the windows/sessions
  * whose END is <= max(ts); the oracles replay that cut with a predicate
  * against `(SELECT max(ts) FROM events)`. Windows still open at end-of-input
  * are state, not output — on an unbounded stream they would emit once the
  * watermark passes them.
  */
object StreamingQueries {

  /** events schema as the stream source will see it (nanos BIGINT under
    * nanosAsLong, or TIMESTAMP_NTZ for micros parquet).
    */
  private def eventsSchema(s: SparkSession, d: String) =
    s.read.parquet(s"$d/events.parquet").schema

  private def toTs(df: org.apache.spark.sql.DataFrame) = Tables.normalizeTs(df)

  /** One streaming execution of the tumbling-window counts per (session,
    * sfDir), shared by every query that post-processes its emissions
    * (st_windowed_counts, st_windowed_topk) — the production shape is one
    * streaming job feeding several downstream readers of its sink, not one
    * streaming job per reader. The cached value is a lazy reader over the
    * sink parquet; the execution itself ran exactly once.
    */
  // bounded LRU (see FamilyCache): the cached value is a LAZY reader over
  // the sink parquet (the execution ran once; eviction just drops the
  // reference — the sink dir itself is TempDirs JVM-exit-cleaned), so
  // eviction can never invalidate an in-flight consumer the way a
  // released checkpoint could; re-entry after eviction re-RUNS the stream
  private val winEmitCache = FamilyCache.frames[(SparkSession, String)]()

  private def windowedEmissions(s: SparkSession, d: String) =
    winEmitCache.getOrElseUpdate((s, d),
      StreamGate.runAppendToParquet(
        s, s"$d/events.parquet", eventsSchema(s, d),
        df => EventStreams.windowedCounts(toTs(df), watermark = "0 seconds"),
        "st_win"))

  val queries: Seq[QueryDef] = Seq(

    // Watermark LATE-DATA DROP under the oracle — the one watermark
    // observable a single-batch execution can never show (the global
    // watermark only advances BETWEEN micro-batches). Arrival is forced
    // into three real micro-batches: the first 60% of the timeline, then
    // the rest, then held-back STRAGGLERS (early-timeline rows with
    // event_id % 10 = 7). Three, not two, because late-event filtering
    // runs against the PREVIOUS batch's watermark while eviction uses the
    // current one (a row arriving in the same batch that advances the
    // watermark is never dropped by it) — verified empirically: with the
    // stragglers in batch 1 the engine merges all 4199 of them,
    // numRowsDroppedByWatermark = 0. Arriving in batch 2, their filter
    // watermark is max(non-straggler ts), their windows are long closed,
    // and the engine drops them. The oracle replays exactly that: keep a
    // row iff it is not a straggler OR its window end > max(non-straggler
    // ts); emit windows with end <= the final watermark. Same
    // windowedCounts transform as st_windowed_counts — the count deltas
    // between the two queries ARE the dropped rows.
    QueryDef("st_late_data",
      (s, d) => {
        val emitted = StreamGate.runAppendPhased(
          s, s"$d/events.parquet",
          df => {
            val n = Tables.normalizeTs(df)
              .withColumn("__us", unix_micros(col("ts")))
            val b = broadcast(n.agg(min(col("__us")).as("__mn"),
              max(col("__us")).as("__mx")))
            n.crossJoin(b)
              .withColumn("__phase", expr(
                "CASE WHEN __us <= __mn + (__mx - __mn) div 5 AND event_id % 10 = 7 THEN 2 " +
                  "WHEN __us <= __mn + (__mx - __mn) * 3 div 5 THEN 0 ELSE 1 END"))
              .drop("__us", "__mn", "__mx")
          },
          nPhases = 3,
          df => EventStreams.windowedCounts(df, watermark = "0 seconds"),
          "st_late")
        emitted.select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("hr"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("hr", "event_type")
      },
      Some("""WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
             |           FROM events),
             |f AS (SELECT ts, event_type, value,
             |             CASE WHEN epoch_us(ts) <= mn + (mx - mn) // 5
             |                   AND event_id % 10 = 7
             |                  THEN 1 ELSE 0 END AS str
             |      FROM events, b),
             |w1 AS (SELECT max(ts) AS wm FROM f WHERE str = 0),
             |m AS (SELECT max(ts) AS mx FROM events),
             |kept AS (SELECT f.ts, f.event_type, f.value FROM f, w1
             |         WHERE str = 0
             |            OR date_trunc('hour', ts) + INTERVAL 1 HOUR > w1.wm)
             |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
             |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM kept, m
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m.mx
             |GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    // Tumbling 1-hour counts through the streaming engine; same SQL shape as
    // ts_tumbling_window restricted to watermark-closed windows.
    QueryDef("st_windowed_counts",
      (s, d) => {
        val emitted = windowedEmissions(s, d)
        emitted.select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("hr"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("hr", "event_type")
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events)
             |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
             |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events, m
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m.mx
             |GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    // Per-window top-k over the streaming emissions: the "trending now"
    // shape — a streaming job lands closed windows, a ranking reader tops
    // them per window. Reuses the SAME streaming execution as
    // st_windowed_counts (shared sink read), so the gate proves the
    // one-job/many-readers layout end-to-end.
    QueryDef("st_windowed_topk",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("hr").orderBy(col("n").desc, col("event_type"))
        windowedEmissions(s, d)
          .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("hr"),
            col("event_type"), col("n"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .orderBy("hr", "rnk")
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             |c AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
             |             event_type, count(*) AS n
             |      FROM events, m
             |      WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m.mx
             |      GROUP BY 1, 2),
             |r AS (SELECT hr, event_type, n,
             |             CAST(row_number() OVER (PARTITION BY hr
             |                  ORDER BY n DESC, event_type) AS INT) AS rnk
             |      FROM c)
             |SELECT hr, event_type, n, rnk FROM r WHERE rnk <= 2
             |ORDER BY hr, rnk""".stripMargin)),

    // CHAINED stateful aggregation — two windowed aggregates stacked in one
    // streaming query (15-min partials re-aggregated to the hour through
    // window_time), the Spark-3.4+ multiple-stateful-operator shape that
    // replaces sink-then-re-read rollup hierarchies. Horizon: an hour
    // window closes iff its end <= the final watermark, and a closed hour
    // implies every 15-min sub-window inside it closed too, so the oracle
    // needs only the one hour-level cut. n_subwindows counts NON-EMPTY
    // sub-windows (the burstiness signal the flat hourly count hides).
    QueryDef("st_chained_agg",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => EventStreams.chainedWindowRollup(toTs(df),
            watermark = "0 seconds"),
          "st_chain")
        emitted.select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("hr"),
            col("event_type"), col("n"), col("n_subwindows"), col("sum_value"))
          .orderBy("hr", "event_type")
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             |sub AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS w15,
             |               event_type, count(*) AS n15, sum(value) AS v15
             |        FROM events GROUP BY 1, 2)
             |SELECT strftime(date_trunc('hour', w15), '%Y-%m-%d %H:%M') AS hr,
             |       event_type, CAST(sum(n15) AS BIGINT) AS n,
             |       count(*) AS n_subwindows, round(sum(v15), 2) AS sum_value
             |FROM sub, m
             |WHERE date_trunc('hour', w15) + INTERVAL 1 HOUR <= m.mx
             |GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    // SLIDING (hopping) windows through the streaming engine: each event
    // lands in 4 overlapping 1-hour windows on a 15-minute hop — the
    // stateful shape whose state is windows/slide × keys. Horizon cut as
    // ever: only windows whose END clears the final watermark emit.
    QueryDef("st_sliding_counts",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => EventStreams.windowedCounts(toTs(df), watermark = "0 seconds",
            slide = Some("15 minutes")),
          "st_slide")
        emitted.select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("w_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("w_start", "event_type")
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             |e AS (SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS t15,
             |             event_type, value
             |      FROM events),
             |ks AS (SELECT unnest(generate_series(0, 3)) AS k),
             |w AS (SELECT make_timestamp((t15 - k * 900) * 1000000) AS ws, event_type, value
             |      FROM e CROSS JOIN ks)
             |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS w_start, event_type,
             |       count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM w, m WHERE ws + INTERVAL 1 HOUR <= m.mx
             |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // Gap-based sessionization through the streaming engine (session_window
    // state merged by gap, emitted once the watermark passes session end =
    // last event + gap). Same sessionization SQL as ts_session_window with
    // the horizon cut on max(ts).
    // Complete-mode running totals: an unbounded (no-watermark) aggregate
    // whose sink is overwritten with the FULL result table every batch —
    // the live-dashboard output mode, and the third of the three streaming
    // output modes gated here (append: st_windowed_counts, update:
    // st_mgstate). After the final batch the sink equals the whole-input
    // aggregate — exactly the batch oracle.
    QueryDef("st_complete_totals",
      (s, d) => {
        val emitted = StreamGate.runCompleteToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => toTs(df).groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")),
          "st_complete")
        emitted.orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Stream-static enrichment: the customer dimension broadcast-joins into
    // every micro-batch and the enriched segment keys a windowed count —
    // the dim-enrichment-then-aggregate front half of every event pipeline,
    // executed through the engine. Oracle: batch join + horizon cut.
    QueryDef("st_enrich",
      (s, d) => {
        val dim = graft.Tables.t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => EventStreams.enrichedWindowedCounts(toTs(df), dim,
            watermark = "0 seconds"),
          "st_enrich")
        emitted.select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("hr"),
            col("segment"), col("n"))
          .orderBy("hr", "segment")
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events)
             |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
             |       c_mktsegment AS segment, count(*) AS n
             |FROM events JOIN customer ON user_id = c_custkey, m
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m.mx
             |GROUP BY 1, 2 ORDER BY hr, segment""".stripMargin)),

    QueryDef("st_session_counts",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => EventStreams.sessionCounts(toTs(df), gap = "30 minutes",
            watermark = "0 seconds"),
          "st_sess")
        emitted.select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             |g AS (SELECT user_id, ts,
             |        CASE WHEN lag(ts) OVER w IS NULL
             |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |             THEN 1 ELSE 0 END AS new_sess
             |      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |se AS (SELECT user_id, ts,
             |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |                            ROWS UNBOUNDED PRECEDING) AS sid
             |       FROM g)
             |SELECT user_id,
             |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       count(*) AS n_events
             |FROM se, m
             |GROUP BY user_id, sid, m.mx
             |HAVING max(ts) + INTERVAL 30 MINUTE <= m.mx
             |ORDER BY user_id, session_start""".stripMargin)),

    // Watermarked streaming dedup (dropDuplicatesWithinWatermark) through
    // the engine: emits the FIRST occurrence of each (user_id, event_type)
    // and evicts seen-keys past the watermark horizon — the bounded-state
    // ingest-dedup shape. Only the dedup KEY columns are kept, so the
    // emitted set is exactly the distinct keys regardless of which copy of
    // a key's row happened to arrive first.
    QueryDef("st_dedup",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => EventStreams.streamingDedup(toTs(df),
            dedupCols = Seq("user_id", "event_type"), watermark = "0 seconds")
            .select("user_id", "event_type"),
          "st_dedup")
        emitted.orderBy("user_id", "event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),

    // transformWithState (Spark 4's typed-state successor to
    // mapGroupsWithState) through the engine, on the RocksDB state-store
    // provider the operator requires. Update-mode emissions go through the
    // foreachBatch gate; the input is one AvailableNow batch, so each user's
    // single emitted row IS its final running total — which the batch
    // aggregate oracle replays exactly.
    QueryDef("st_twstate",
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val emitted = StreamGate.runUpdateToParquet(
            s, s"$d/events.parquet", eventsSchema(s, d),
            df => {
              import s.implicits._
              EventStreams.runningUserTotalsTws(
                df.select(col("user_id"), col("value")).as[(Long, Double)]).toDF()
            },
            "st_tws")
          emitted.orderBy("user_id")
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None    => s.conf.unset(key)
        }
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |       round(sum(value), 2) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Idle-key TTL eviction via transformWithState EVENT-TIME TIMERS — the
    // state-bounding primitive an unbounded stream needs when keys churn:
    // each user's idle timer re-arms at last-seen + 12h; when the
    // watermark (1h delay) passes an armed timer the key emits an eviction
    // record and clears its state. One data batch emits one update row per
    // user; the AvailableNow no-data finalization batch then advances the
    // watermark to max(ts) − 1h and fires every timer at expiry <= wm
    // (boundary pinned NON-STRICT by StreamingSpec's tie case), which the
    // oracle replays as the horizon cut last_ms + TTL <= max_ms − delay
    // on millisecond-floored event times (Spark tracks watermarks and
    // Timestamp.getTime in ms). See EventStreams.TtlEvictProcessor.
    QueryDef("st_ttl",
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val emitted = StreamGate.runUpdateToParquet(
            s, s"$d/events.parquet", eventsSchema(s, d),
            df => {
              import s.implicits._
              EventStreams.userTotalsWithTtl(
                toTs(df).select(col("user_id"), col("value"), col("ts"))
                  .withWatermark("ts", "1 hour")
                  .as[(Long, Double, java.sql.Timestamp)],
                ttlMs = 43200000L).toDF()
            },
            "st_ttl")
          emitted.orderBy("user_id", "evicted")
        } finally prev match {
          case Some(p) => s.conf.set(key, p)
          case None    => s.conf.unset(key)
        }
      },
      Some("""WITH t AS (SELECT user_id, count(*) AS n_events,
             |               round(sum(value), 2) AS total_value,
             |               epoch_us(max(ts)) // 1000 AS last_ms
             |        FROM events GROUP BY 1),
             |w AS (SELECT max(last_ms) - 3600000 AS wm FROM t)
             |SELECT user_id, n_events, total_value, false AS evicted FROM t
             |UNION ALL
             |SELECT user_id, n_events, total_value, true AS evicted
             |FROM t, w WHERE t.last_ms + 43200000 <= w.wm
             |ORDER BY user_id, evicted""".stripMargin)),

    // mapGroupsWithState running totals through the engine (the classic
    // arbitrary-stateful API; st_twstate covers its transformWithState
    // successor). Same one-batch = final-totals reasoning as st_twstate.
    QueryDef("st_mgstate",
      (s, d) => {
        val emitted = StreamGate.runUpdateToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => {
            import s.implicits._
            EventStreams.runningUserTotals(
              df.select(col("user_id"), col("value")).as[(Long, Double)]).toDF()
          },
          "st_mgs")
        emitted.orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |       round(sum(value), 2) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Stream-stream bounded-interval join through the engine: purchases and
    // clicks are two filters of the SAME file stream (a streaming
    // self-join); the time-range conjunct + both watermarks bound each
    // side's join state. An INNER stream-stream join emits matches as they
    // are found, so the one-batch AvailableNow run emits exactly the
    // complete inner join — no horizon cut needed in the oracle. Output is
    // the (purchase, click) id pairs, which are deterministic.
    QueryDef("st_interval_join",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => {
            val ev = toTs(df)
            val purchases = ev.filter(col("event_type") === "purchase")
              .select(col("event_id").as("p_id"), col("user_id"),
                col("ts").as("p_ts"))
            val clicks = ev.filter(col("event_type") === "click")
              .select(col("event_id").as("c_id"),
                col("user_id").as("c_user_id"), col("ts").as("c_ts"))
            EventStreams.intervalJoin(purchases, clicks,
              maxSpan = "30 minutes", watermark = "0 seconds")
              .select("p_id", "c_id")
          },
          "st_ij")
        emitted.orderBy("p_id", "c_id")
      },
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id
             |FROM (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'purchase') p
             |JOIN (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
             |ORDER BY p_id, c_id""".stripMargin)),

    // Stream-stream LEFT SEMI interval join: the existence form — each
    // purchase with at least one click in its 30-minute span emits exactly
    // once, EAGERLY on its first witnessed click (match latency, not
    // horizon latency — the semantic difference from the outer forms, and
    // why this oracle needs NO watermark-horizon cut: every emission is
    // triggered by data, none by watermark-proven absence). Left schema
    // out, at-most-once per purchase.
    QueryDef("st_semi_join",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => {
            val ev = toTs(df)
            val purchases = ev.filter(col("event_type") === "purchase")
              .select(col("event_id").as("p_id"), col("user_id"),
                col("ts").as("p_ts"))
            val clicks = ev.filter(col("event_type") === "click")
              .select(col("event_id").as("c_id"),
                col("user_id").as("c_user_id"), col("ts").as("c_ts"))
            EventStreams.semiIntervalJoin(purchases, clicks,
              maxSpan = "30 minutes", watermark = "0 seconds")
              .select("p_id")
          },
          "st_semi")
        emitted.orderBy("p_id")
      },
      Some("""SELECT DISTINCT p.event_id AS p_id
             |FROM (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'purchase') p
             |JOIN (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
             |ORDER BY p_id""".stripMargin)),

    // Stream-stream LEFT OUTER interval join: st_interval_join plus the
    // watermark-driven "absence is final" decision — a purchase that never
    // sees a click inside its 30-minute span is emitted null-padded once
    // the engine can prove no future click will land there. The engine
    // makes that call CONSERVATIVELY: measured on this input, null-pads
    // trail the final watermark by ~(watermark delay + 2×interval) rather
    // than the tight p_ts + 30min bound, and that margin is an
    // implementation detail, not a semantic one. So the gate compares the
    // two engines on a CLOSED 2-hour horizon (safely past the observed
    // margin): both sides keep only purchases with p_ts + 2h <= the final
    // WATERMARK, where matched+null-padded emissions are complete in both
    // — the same "compare only what the watermark has finalized" move
    // every append-mode st_* gate already makes. The horizon base is
    // least(max p_ts, max c_ts), NOT max(ts) (r12 fix, the st_full_outer
    // insight applied back): with two withWatermark nodes the engine's
    // global watermark under the default min policy is the MIN of the two
    // sides' maxima, and left eviction needs watermark > p_ts + 30min — a
    // max(ts)-based cut left a gap (nearly 4h wide at sf0.001, where the
    // last click trails the last purchase) in which an unmatched purchase
    // would be cut-eligible yet never null-padded; measured in_gap = 0 at
    // all three SFs today, i.e. the old gate passed by data luck. NULL
    // sort order differs between the engines by default → both pin
    // NULLS FIRST.
    QueryDef("st_outer_join",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => {
            val ev = toTs(df)
            val purchases = ev.filter(col("event_type") === "purchase")
              .select(col("event_id").as("p_id"), col("user_id"),
                col("ts").as("p_ts"))
            val clicks = ev.filter(col("event_type") === "click")
              .select(col("event_id").as("c_id"),
                col("user_id").as("c_user_id"), col("ts").as("c_ts"))
            EventStreams.leftOuterIntervalJoin(purchases, clicks,
              maxSpan = "30 minutes", watermark = "0 seconds")
              .select(col("p_id"), col("c_id"), col("p_ts"))
          },
          "st_oj")
        val horizon = broadcast(Tables.t(s, d, "events")
          .agg(least(
            max(when(col("event_type") === "purchase", col("ts"))),
            max(when(col("event_type") === "click", col("ts")))).as("wm")))
        emitted.crossJoin(horizon)
          .filter(col("p_ts") + expr("INTERVAL 2 HOURS") <= col("wm"))
          .select(col("p_id"), col("c_id"))
          .orderBy(col("p_id"), col("c_id").asc_nulls_first)
      },
      Some("""WITH m AS (SELECT least(
             |         max(CASE WHEN event_type = 'purchase' THEN ts END),
             |         max(CASE WHEN event_type = 'click' THEN ts END)) AS wm
             |       FROM events),
             |p AS (SELECT event_id, user_id, ts FROM events, m
             |      WHERE event_type = 'purchase' AND ts + INTERVAL 2 HOUR <= m.wm),
             |c AS (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'click'),
             |j AS (SELECT p.event_id AS p_id, c.event_id AS c_id
             |      FROM p JOIN c ON p.user_id = c.user_id
             |        AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE)
             |SELECT p_id, c_id FROM j
             |UNION ALL
             |SELECT p.event_id, CAST(NULL AS BIGINT) FROM p
             |WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.p_id = p.event_id)
             |ORDER BY p_id, c_id NULLS FIRST""".stripMargin)),

    // Stream-stream FULL OUTER interval join: both directions of the
    // watermark-driven "absence is final" decision at once — unmatched
    // purchases null-pad on the right watermark, unmatched clicks on the
    // left one (the remaining eviction shape after st_interval_join and
    // st_outer_join). Gate: the st_outer_join CLOSED-horizon move applied
    // SYMMETRICALLY, with one refinement the full-outer shape forces: the
    // horizon base is least(max p_ts, max c_ts), NOT max(ts) — with two
    // withWatermark nodes the query's global watermark under the default
    // min policy is the MIN of the two sides' maxima, and right-side
    // eviction is strict (a click AT the final watermark is never
    // null-padded; observed at sf0.001 where the latest click is exactly
    // the min-side maximum). A row is compared only when every timestamp
    // it carries sits 2h before that watermark (safely past the engine's
    // conservative ~watermark+2×interval null-pad margin): matched rows
    // need both cuts, left-nulls the p_ts cut, right-nulls the c_ts cut;
    // "unmatched" itself is decided against the FULL other side in both
    // engines. NULL sort order pinned NULLS FIRST on both keys.
    QueryDef("st_full_outer",
      (s, d) => {
        val emitted = StreamGate.runAppendToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => {
            val ev = toTs(df)
            val purchases = ev.filter(col("event_type") === "purchase")
              .select(col("event_id").as("p_id"), col("user_id"),
                col("ts").as("p_ts"))
            val clicks = ev.filter(col("event_type") === "click")
              .select(col("event_id").as("c_id"),
                col("user_id").as("c_user_id"), col("ts").as("c_ts"))
            EventStreams.fullOuterIntervalJoin(purchases, clicks,
              maxSpan = "30 minutes", watermark = "0 seconds")
              .select(col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))
          },
          "st_foj")
        val horizon = broadcast(Tables.t(s, d, "events")
          .agg(least(
            max(when(col("event_type") === "purchase", col("ts"))),
            max(when(col("event_type") === "click", col("ts")))).as("wm")))
        emitted.crossJoin(horizon)
          .filter(
            (col("p_ts").isNull
              || col("p_ts") + expr("INTERVAL 2 HOURS") <= col("wm"))
            && (col("c_ts").isNull
              || col("c_ts") + expr("INTERVAL 2 HOURS") <= col("wm")))
          .select(col("p_id"), col("c_id"))
          .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
      },
      Some("""WITH m AS (SELECT least(
             |         max(CASE WHEN event_type = 'purchase' THEN ts END),
             |         max(CASE WHEN event_type = 'click' THEN ts END)) AS wm
             |       FROM events),
             |p AS (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'purchase'),
             |c AS (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'click'),
             |j AS (SELECT p.event_id AS p_id, c.event_id AS c_id,
             |             p.ts AS p_ts, c.ts AS c_ts
             |      FROM p JOIN c ON p.user_id = c.user_id
             |        AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE)
             |SELECT p_id, c_id FROM j, m
             |WHERE p_ts + INTERVAL 2 HOUR <= m.wm
             |  AND c_ts + INTERVAL 2 HOUR <= m.wm
             |UNION ALL
             |SELECT p.event_id, CAST(NULL AS BIGINT) FROM p, m
             |WHERE p.ts + INTERVAL 2 HOUR <= m.wm
             |  AND NOT EXISTS (SELECT 1 FROM j WHERE j.p_id = p.event_id)
             |UNION ALL
             |SELECT CAST(NULL AS BIGINT), c.event_id FROM c, m
             |WHERE c.ts + INTERVAL 2 HOUR <= m.wm
             |  AND NOT EXISTS (SELECT 1 FROM j WHERE j.c_id = c.event_id)
             |ORDER BY p_id NULLS FIRST, c_id NULLS FIRST""".stripMargin)),

    // Streaming UPSERT: each micro-batch merges into a keyed sink table
    // (latest event per user wins, ties broken by event_id) via the
    // read-merge-overwrite foreachBatch pattern — the lakehouse MERGE sink
    // shape. The final table is the per-user argmax over the whole input
    // regardless of how the stream was batched, which is exactly what the
    // batch oracle states via the same (ts, event_id, value) struct-max.
    QueryDef("st_upsert",
      (s, d) => {
        val emitted = StreamGate.runMergeToParquet(
          s, s"$d/events.parquet", eventsSchema(s, d),
          df => toTs(df).select(col("user_id"), col("ts"), col("event_id"), col("value")),
          (existing, batch) => existing.union(batch)
            .groupBy("user_id")
            .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
            .select(col("user_id"), col("m.ts").as("ts"),
              col("m.event_id").as("event_id"), col("m.value").as("value")),
          "st_upsert")
        emitted
          .select(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
            col("event_id"), round(col("value"), 2).as("value"))
          .orderBy("user_id")
      },
      Some("""WITH m AS (SELECT user_id,
             |                  max({'ts': ts, 'event_id': event_id, 'value': value}) AS s
             |           FROM events GROUP BY 1)
             |SELECT user_id, strftime((s).ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
             |       (s).event_id AS event_id, round((s).value, 2) AS value
             |FROM m ORDER BY user_id""".stripMargin))
  )
}
