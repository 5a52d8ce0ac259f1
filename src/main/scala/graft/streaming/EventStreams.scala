package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import java.sql.Timestamp

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

  /** Tumbling-window (or, with `slide` < `windowLen`, sliding/hopping)
    * counts with a watermark for late data. Works on batch and streaming
    * inputs; on a stream use append/update mode downstream.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "1 hour",
                     slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide.getOrElse(windowLen)).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-static enrichment then windowed aggregation: the dimension side
    * is a plain batch frame joined into every micro-batch (broadcast — at
    * scale this is the dim-table enrichment every event pipeline starts
    * with), and the enriched attribute becomes the aggregation key. Works
    * on batch and streaming inputs.
    */
  def enrichedWindowedCounts(events: DataFrame, dim: DataFrame,
                             windowLen: String = "1 hour",
                             watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"),
        col("c_mktsegment").as("segment"), col("n"))

  /** Chained windowed re-aggregation — TWO stateful aggregations stacked
    * in ONE streaming query (the multiple-stateful-operator support of
    * Spark 3.4+): 15-minute partial aggregates re-aggregated to the hour.
    * This is the production rollup hierarchy (minute → hour → day) run as
    * a single pipeline instead of sink-then-re-read-then-re-aggregate; the
    * inner window struct is carried forward through `window_time()`, which
    * is what lets the watermark propagate into the outer aggregate. Emits
    * per closed hour: total events, the number of NON-EMPTY 15-minute
    * sub-windows (the intra-hour burstiness signal the flat hourly count
    * hides), and the value sum.
    *
    * Scale shape: the inner aggregate acts as the outer one's map-side
    * combine — the second shuffle moves only O(windows × keys) partial
    * rows, never event-sized data, and both state stores are
    * watermark-bounded. Works on batch and streaming inputs.
    */
  def chainedWindowRollup(events: DataFrame,
                          watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "15 minutes").as("w15"), col("event_type"))
      .agg(count(lit(1)).as("n15"), sum(col("value")).as("v15"))
      .groupBy(window(window_time(col("w15")), "1 hour").as("w"),
        col("event_type"))
      .agg(sum(col("n15")).as("n"), count(lit(1)).as("n_subwindows"),
        round(sum(col("v15")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("n_subwindows"), col("sum_value"))

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

  /** Streaming exact dedup for a training-data ingest pipeline: keep the
    * first occurrence of each `dedupCol` value, with state BOUNDED by the
    * event-time watermark (dropDuplicatesWithinWatermark evicts seen-keys
    * older than the horizon — a plain dropDuplicates would grow state
    * forever on an unbounded corpus stream).
    */
  def streamingDedup(docs: DataFrame, dedupCols: Seq[String] = Seq("text"),
                     watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(dedupCols)

  /** Stream-stream bounded-interval join: clicks within `maxSpan` after
    * each purchase, per user — the streaming twin of
    * [[graft.operators.IntervalJoin]]'s batch bucketed plan. Structured
    * Streaming handles the binning itself: the time-range conjunct plus
    * watermarks on BOTH sides bound each side's join state (a purchase can
    * stop waiting once the click watermark passes p_ts + maxSpan), so
    * state is O(events inside the watermark horizon), not unbounded.
    * Expects columns (p_id, user_id, p_ts) and (c_id, c_user_id, c_ts).
    */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame,
                   maxSpan: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    purchases.withWatermark("p_ts", watermark)
      .join(clicks.withWatermark("c_ts", watermark),
        expr(s"user_id = c_user_id AND c_ts >= p_ts AND c_ts <= p_ts + interval $maxSpan"))

  /** Stream-stream LEFT OUTER interval join — [[intervalJoin]] plus the
    * null-padded emission for purchases that never see a click: Structured
    * Streaming holds each unmatched left row in state until the right-side
    * watermark proves no future click can land inside
    * [p_ts, p_ts + maxSpan], then emits it once with nulls. That
    * watermark-driven completeness decision is the semantic step up from
    * the inner join (a batch engine just anti-joins; a stream has to KNOW
    * when absence is final), and it is why the outer side's state bound
    * needs the time-range conjunct — without it left state would be
    * unbounded. Same column contract as [[intervalJoin]].
    */
  def leftOuterIntervalJoin(purchases: DataFrame, clicks: DataFrame,
                            maxSpan: String = "30 minutes",
                            watermark: String = "1 hour"): DataFrame =
    purchases.withWatermark("p_ts", watermark)
      .join(clicks.withWatermark("c_ts", watermark),
        expr(s"user_id = c_user_id AND c_ts >= p_ts AND c_ts <= p_ts + interval $maxSpan"),
        "left_outer")

  /** Stream-stream FULL OUTER interval join — the remaining
    * watermark-eviction shape after [[intervalJoin]] (inner) and
    * [[leftOuterIntervalJoin]]: BOTH directions of the "absence is final"
    * decision in one operator. An unmatched purchase null-pads once the
    * CLICK watermark proves nothing can land in [p_ts, p_ts + maxSpan];
    * an unmatched click null-pads once the PURCHASE watermark proves no
    * purchase with p_ts in [c_ts − maxSpan, c_ts] can still arrive. The
    * time-range conjunct is two-sided (it bounds p_ts from c_ts and vice
    * versa), which is what keeps BOTH join states evictable — a full
    * outer join without it would hold every row forever on both sides.
    * Same column contract as [[intervalJoin]].
    */
  def fullOuterIntervalJoin(purchases: DataFrame, clicks: DataFrame,
                            maxSpan: String = "30 minutes",
                            watermark: String = "1 hour"): DataFrame =
    purchases.withWatermark("p_ts", watermark)
      .join(clicks.withWatermark("c_ts", watermark),
        expr(s"user_id = c_user_id AND c_ts >= p_ts AND c_ts <= p_ts + interval $maxSpan"),
        "full_outer")

  /** Stream-stream LEFT SEMI interval join — the EXISTENCE shape that
    * completes the eviction family (inner emits every match pair, outer
    * adds null-padded absence, semi emits each left row AT MOST ONCE on
    * evidence a match exists): "did this purchase get a click inside its
    * span — and tell me the moment one lands". Distinct state economics
    * from the outer forms: emission is EAGER (the first witnessed click
    * releases the purchase — no watermark wait, so the answer has match
    * latency, not horizon latency) and the engine only needs a
    * matched-flag per held row; the time-range conjunct still bounds both
    * states via the watermarks. Output is the left schema only, each row
    * at most once — no dedup needed downstream. Same column contract as
    * [[intervalJoin]].
    */
  def semiIntervalJoin(purchases: DataFrame, clicks: DataFrame,
                       maxSpan: String = "30 minutes",
                       watermark: String = "1 hour"): DataFrame =
    purchases.withWatermark("p_ts", watermark)
      .join(clicks.withWatermark("c_ts", watermark),
        expr(s"user_id = c_user_id AND c_ts >= p_ts AND c_ts <= p_ts + interval $maxSpan"),
        "left_semi")

  /** Running per-user totals via arbitrary stateful processing
    * (`mapGroupsWithState`) — the custom-state surface for logic that
    * windowed aggregation can't express. State is one (count, sum) pair per
    * user; timeout-free for simplicity. Works only on streaming Datasets;
    * batch equivalents use plain groupBy.
    */
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  def runningUserTotals(events: Dataset[(Long, Double)]): Dataset[UserTotals] = {
    implicit val stateEnc = Encoders.product[(Long, Double)]
    implicit val outEnc = Encoders.product[UserTotals]
    events
      .groupByKey(_._1)(Encoders.scalaLong)
      .mapGroupsWithState[(Long, Double), UserTotals](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          UserTotals(user, n, math.round(s * 100).toDouble / 100)
      }
  }

  /** The same running totals on the transformWithState API (Spark 4's
    * successor to mapGroupsWithState: typed state handles, timers, TTL,
    * RocksDB-backed). Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider` on the session — the new operator
    * only runs on the RocksDB provider. StreamingSpec asserts it produces
    * exactly the mapGroupsWithState results across multi-batch input.
    */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, Double), UserTotals] {
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.product[(Long, Double)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
                                 timers: TimerValues): Iterator[UserTotals] = {
      val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0; var s = s0
      rows.foreach { r => n += 1; s += r._2 }
      totals.update((n, s))
      Iterator.single(UserTotals(user, n, math.round(s * 100).toDouble / 100))
    }
  }

  def runningUserTotalsTws(events: Dataset[(Long, Double)]): Dataset[UserTotals] = {
    implicit val outEnc = Encoders.product[UserTotals]
    events
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user totals row with the eviction flag — update emissions carry
    * evicted = false, timer-fired eviction records evicted = true.
    */
  case class UserActivity(user_id: Long, n_events: Long, total_value: Double,
                          evicted: Boolean)

  /** Idle-key TTL eviction via transformWithState EVENT-TIME TIMERS — the
    * state-bounding primitive an unbounded 100 TB stream needs when keys
    * churn (without it, one state row per ever-seen key grows forever;
    * with it, resident state is only the keys active in the last `ttlMs`).
    * Per input batch each user's totals update and the user's single idle
    * timer is re-armed at last-seen + ttl (delete-old + register-new — the
    * standard timer-rotation idiom, since timers are keyed by expiry).
    * When the event-time watermark passes an armed timer, the engine calls
    * [[handleExpiredTimer]]: the key emits its eviction record (final
    * totals, evicted = true) and clears its state — so the state store
    * SHRINKS while the output stream keeps an auditable record of every
    * eviction.
    */
  class TtlEvictProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, (Long, Double, java.sql.Timestamp),
        UserActivity] {
    @transient private var st: ValueState[(Long, Double, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Long)]("totals",
        Encoders.product[(Long, Double, Long)], TTLConfig.NONE)
    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, Double, java.sql.Timestamp)],
                                 timers: TimerValues): Iterator[UserActivity] = {
      val (n0, s0, t0) = if (st.exists()) st.get() else (0L, 0.0, Long.MinValue)
      var n = n0; var s = s0; var last = t0
      rows.foreach { r =>
        n += 1; s += r._2
        val ms = r._3.getTime
        if (ms > last) last = ms
      }
      if (t0 != Long.MinValue && t0 + ttlMs != last + ttlMs)
        getHandle.deleteTimer(t0 + ttlMs)
      getHandle.registerTimer(last + ttlMs)
      st.update((n, s, last))
      Iterator.single(
        UserActivity(user, n, math.round(s * 100).toDouble / 100, evicted = false))
    }
    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[UserActivity] = {
      val (n, s, _) = st.get()
      st.clear()
      Iterator.single(
        UserActivity(user, n, math.round(s * 100).toDouble / 100, evicted = true))
    }
  }

  /** Running user totals with idle-TTL eviction (see [[TtlEvictProcessor]]):
    * event-time mode, so `events` must already carry a watermark on its
    * timestamp column. Update rows flow per batch; eviction rows fire when
    * the watermark passes last-seen + ttl.
    */
  def userTotalsWithTtl(events: Dataset[(Long, Double, java.sql.Timestamp)],
                        ttlMs: Long): Dataset[UserActivity] = {
    implicit val outEnc = Encoders.product[UserActivity]
    events
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new TtlEvictProcessor(ttlMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
