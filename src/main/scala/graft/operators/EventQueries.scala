package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / JSON operators over the `events` table: tumbling windows,
  * gap-based sessionization (Spark `session_window`), lag/lead, date
  * functions, JSON extraction.
  *
  * Timestamp hygiene: the parquet stores nanosecond timestamps; Spark reads
  * micros, DuckDB reads nanos. All outputs therefore go through second-level
  * truncation (unix_timestamp / epoch floor) or date_trunc + string
  * formatting, which agree on both engines.
  */
object EventQueries {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** SAX symbol table (event_type, frame, n, paa_e4, sax) — THE single
    * Spark-side definition of the discretization, shared by ts_paa_sax
    * (reports it) and ts_sax_motifs (mines it); [[saxCtes]] is its oracle
    * twin. One groupBy over the facts, then the ntile window on the
    * O(frames x types) bucket spine. Cheap enough to recompute per
    * consumer (no family cache — the staging convention is for expensive
    * multi-round producers, and this is one aggregate).
    */
  private def saxFrames(s: SparkSession, d: String): DataFrame = {
    val frames = T(s, d, "events")
      .groupBy(col("event_type"), window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("bigint")).as("cents"))
      .select(col("event_type"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("frame"),
        col("n"), expr("(cents * 100) div n").as("paa_e4"))
    val byPaa = Window.partitionBy("event_type").orderBy("paa_e4", "frame")
    frames
      .withColumn("sym", ntile(4).over(byPaa))
      .select(col("event_type"), col("frame"), col("n"), col("paa_e4"),
        expr("chr(96 + sym)").as("sax"))
  }

  /** 4-symbol SAX words with exact occurrence counts per event type —
    * the shared word table under ts_sax_motifs (top REPEATED words) and
    * ts_sax_discords (RAREST words): one lead-3 window over the
    * [[saxFrames]] spine assembles each word from consecutive observed
    * frames, one keyed count. [[saxWordCtes]] is the oracle twin.
    */
  private def saxWordCounts(s: SparkSession, d: String): DataFrame = {
    val byFrame = Window.partitionBy("event_type").orderBy("frame")
    saxFrames(s, d)
      .select(col("event_type"), col("frame"), col("sax"))
      .withColumn("word", concat(col("sax"),
        lead(col("sax"), 1).over(byFrame),
        lead(col("sax"), 2).over(byFrame),
        lead(col("sax"), 3).over(byFrame)))
      .filter(col("word").isNotNull)
      .groupBy("event_type", "word")
      .agg(count(lit(1)).as("n_occ"), min(col("frame")).as("first_frame"))
  }

  /** WITH-chain fragment ending in CTE `sax(event_type, frame, n, paa_e4,
    * sax)` — [[saxFrames]] replayed in ANSI SQL; ts_paa_sax,
    * ts_sax_motifs and ts_sax_discords all interpolate it so the frame
    * width / alphabet / lattice cannot drift between the producer and
    * the miners.
    */
  private val saxCtes: String =
    """f AS (SELECT event_type,
      |             strftime(time_bucket(INTERVAL '30 minutes', ts),
      |                      '%Y-%m-%d %H:%M') AS frame,
      |             count(*) AS n,
      |             CAST(sum(CAST(round(value * 100) AS BIGINT))
      |                  AS BIGINT) AS cents
      |      FROM events GROUP BY 1, 2),
      |sax AS (SELECT event_type, frame, n,
      |               (cents * 100) // n AS paa_e4,
      |               chr(96 + CAST(ntile(4) OVER (PARTITION BY event_type
      |                             ORDER BY (cents * 100) // n, frame) AS INT))
      |                 AS sax
      |        FROM f)""".stripMargin

  /** Extends [[saxCtes]] with `cnts(event_type, word, n_occ, first_frame)`
    * — [[saxWordCounts]] replayed in ANSI SQL, shared by the motif and
    * discord miners.
    */
  private val saxWordCtes: String =
    s"""$saxCtes,
      |words AS (SELECT event_type, frame,
      |                 sax || lead(sax, 1) OVER w || lead(sax, 2) OVER w ||
      |                    lead(sax, 3) OVER w AS word
      |          FROM sax
      |          WINDOW w AS (PARTITION BY event_type ORDER BY frame)),
      |cnts AS (SELECT event_type, word, count(*) AS n_occ,
      |                min(frame) AS first_frame
      |         FROM words WHERE word IS NOT NULL
      |         GROUP BY 1, 2)""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window via Spark's window(); oracle via date_trunc.
    QueryDef("ts_tumbling_window",
      (s, d) => T(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hr"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hr", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
             |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    // Sliding (hopping) window: 1-hour windows every 15 minutes — each event
    // lands in exactly ceil(60/15) = 4 windows. Spark's window(ts, w, s)
    // assigns windows aligned to the epoch; the oracle replays that by
    // exploding each event into start times floor15(ts) - k*15min, k=0..3.
    // make_timestamp keeps the oracle timezone-naive (to_timestamp would
    // yield TIMESTAMPTZ and strftime would then depend on session tz).
    QueryDef("ts_sliding_window",
      (s, d) => T(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type"),
      Some("""WITH e AS (SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS t15,
             |                  event_type, value
             |           FROM events),
             |ks AS (SELECT unnest(generate_series(0, 3)) AS k),
             |w AS (SELECT make_timestamp((t15 - k * 900) * 1000000) AS ws, event_type, value
             |      FROM e CROSS JOIN ks)
             |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS w_start, event_type,
             |       count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // Gap-based sessions: Spark's native session_window (30 min gap); the
    // oracle replays the same semantics with lag + running sum. Session ids
    // are per-user ordinals of session start. At scale this is one shuffle
    // on user_id; streaming uses the same session_window on readStream.
    QueryDef("ts_session_window",
      (s, d) => {
        val sess = T(s, d, "events")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_s"),
            min(col("ts")).as("t0"))
        sess.select(col("user_id"),
            row_number().over(Window.partitionBy("user_id").orderBy("t0")).as("session_id"),
            col("n_events"), col("duration_s"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |se AS (
             |  SELECT user_id, ts,
             |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g)
             |SELECT user_id, CAST(session_id AS INT) AS session_id,
             |       count(*) AS n_events,
             |       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s
             |FROM se GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Time-RANGE window frame: rolling 1-hour sum per user — RANGE (all rows
    // within the last 3599 SECONDS of event time), not ROWS (last N rows);
    // ties at equal timestamps are frame peers in both engines, so the
    // frame SET is identical and the rounded sum is representation-stable.
    QueryDef("win_range_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
          .rangeBetween(-3599, 0)
        T(s, d, "events")
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("ts_sec"), col("value"))
          .select(col("event_id"), col("user_id"),
            round(sum(col("value")).over(w), 2).as("rolling_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       round(sum(value) OVER (
             |         PARTITION BY user_id
             |         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             |         RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW), 2) AS rolling_1h
             |FROM events ORDER BY event_id""".stripMargin)),

    QueryDef("win_running",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .select(col("event_id"), col("user_id"),
            row_number().over(w).as("rn"),
            round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
              .as("running_value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       CAST(row_number() OVER w AS INT) AS rn,
             |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("win_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .select(col("event_id"), col("user_id"),
            lag(col("event_id"), 1).over(w).as("prev_event"),
            lead(col("event_id"), 1).over(w).as("next_event"),
            (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).as("gap_s"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       lag(event_id, 1) OVER w AS prev_event,
             |       lead(event_id, 1) OVER w AS next_event,
             |       CAST(floor(epoch(ts)) - floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) AS gap_s
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // As-of join (point-in-time lookup): each purchase matched to the user's
    // latest preceding click. Oracle uses DuckDB's native ASOF JOIN; the
    // Spark side is the union + running-last window plan (AsofJoin).
    QueryDef("ts_asof_join",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
            col("ts").as("cts"))
        AsofJoin.asof(purchases, clicks, "user_id", "ts", Seq("click_id", "cts"))
          .select(col("event_id").as("p_event_id"), col("user_id"),
            col("matched_click_id").as("click_event_id"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("matched_cts"))).as("gap_s"))
          .orderBy("p_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id AS user_id,
             |       c.event_id AS click_event_id,
             |       CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS gap_s
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p_event_id""".stripMargin)),

    // Same point-in-time lookup through the native Catalyst operator
    // (graft.plans.AsofJoin → AsofJoinExec single-pass partition merge)
    // instead of the union+window composition — same DuckDB ASOF oracle
    // gates both physical strategies.
    QueryDef("ts_asof_native",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user_id"), col("ts").as("cts"),
            col("event_id").as("click_id"))
        AsofJoin.asofNative(purchases, clicks, "user_id", "c_user_id", "ts", "cts")
          .select(col("event_id").as("p_event_id"), col("user_id"),
            col("click_id").as("click_event_id"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("cts"))).as("gap_s"))
          .orderBy("p_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id AS user_id,
             |       c.event_id AS click_event_id,
             |       CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS gap_s
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p_event_id""".stripMargin)),

    // FORWARD as-of (earliest right row at or after the left time) by time
    // negation over the same native operator: backward-asof on (-t) finds
    // max(-rt) <= -lt, i.e. min(rt) >= lt — no second operator needed, the
    // merge stays one pass. Output carries the forward gap (a deterministic
    // scalar even when several clicks tie on the minimal time), oracled by
    // a LEFT JOIN + min() replay.
    QueryDef("ts_asof_forward",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
          .withColumn("nts", -unix_micros(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user_id"), col("ts").as("cts"))
          .withColumn("ncts", -unix_micros(col("cts")))
        AsofJoin.asofNative(purchases, clicks, "user_id", "c_user_id", "nts", "ncts")
          .select(col("event_id").as("p_event_id"), col("user_id"),
            (unix_timestamp(col("cts")) - unix_timestamp(col("ts"))).as("fwd_gap_s"))
          .orderBy("p_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id AS user_id,
             |       CAST(floor(epoch(min(c.ts))) - floor(epoch(p.ts)) AS BIGINT) AS fwd_gap_s
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND c.ts >= p.ts
             |GROUP BY p.event_id, p.user_id, p.ts
             |ORDER BY p_event_id""".stripMargin)),

    // NEAREST as-of (closest right row in either direction): the backward
    // and forward passes of the SAME native operator combined on the left
    // key — ties in whole seconds break toward the backward match
    // (deterministic; stated identically in the oracle's CASE). Completes
    // the as-of family: backward / forward / tolerance-bounded / nearest.
    QueryDef("ts_asof_nearest",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user_id"), col("ts").as("cts"))
        val back = AsofJoin.asofNative(
            purchases.withColumn("uts", unix_micros(col("ts"))),
            clicks.withColumn("ucts", unix_micros(col("cts"))),
            "user_id", "c_user_id", "uts", "ucts")
          .select(col("event_id"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("cts"))).as("gb"))
        val fwd = AsofJoin.asofNative(
            purchases.withColumn("nts", -unix_micros(col("ts"))),
            clicks.withColumn("ncts", -unix_micros(col("cts"))),
            "user_id", "c_user_id", "nts", "ncts")
          .select(col("event_id"), col("user_id"),
            (unix_timestamp(col("cts")) - unix_timestamp(col("ts"))).as("gf"))
        fwd.join(back, Seq("event_id"))
          .select(col("event_id").as("p_event_id"), col("user_id"),
            when(col("gb").isNull && col("gf").isNull, lit(null))
              .when(col("gf").isNull, col("gb"))
              .when(col("gb").isNull, col("gf"))
              .otherwise(least(col("gb"), col("gf"))).as("nearest_gap_s"),
            when(col("gb").isNull && col("gf").isNull, lit(null))
              .when(col("gf").isNull, lit("back"))
              .when(col("gb").isNull, lit("fwd"))
              .when(col("gb") <= col("gf"), lit("back"))
              .otherwise(lit("fwd")).as("dir"))
          .orderBy("p_event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
             |b AS (SELECT p.event_id,
             |             CAST(floor(epoch(p.ts)) - floor(epoch(max(c.ts))) AS BIGINT) AS gb
             |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
             |      GROUP BY p.event_id, p.ts),
             |f AS (SELECT p.event_id,
             |             CAST(floor(epoch(min(c.ts))) - floor(epoch(p.ts)) AS BIGINT) AS gf
             |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts
             |      GROUP BY p.event_id, p.ts)
             |SELECT p.event_id AS p_event_id, p.user_id,
             |       CASE WHEN gb IS NULL AND gf IS NULL THEN NULL
             |            WHEN gf IS NULL THEN gb
             |            WHEN gb IS NULL THEN gf
             |            ELSE least(gb, gf) END AS nearest_gap_s,
             |       CASE WHEN gb IS NULL AND gf IS NULL THEN NULL
             |            WHEN gf IS NULL THEN 'back'
             |            WHEN gb IS NULL THEN 'fwd'
             |            WHEN gb <= gf THEN 'back'
             |            ELSE 'fwd' END AS dir
             |FROM p JOIN b ON b.event_id = p.event_id
             |JOIN f ON f.event_id = p.event_id
             |ORDER BY p_event_id""".stripMargin)),

    // Gap-filled hourly series: generate the full hour spine between the
    // corpus bounds (sequence + explode — the spine is O(hours), a
    // dimension-sized frame) and left-join the sparse per-hour aggregate
    // onto it, zero-filling the holes — the standard resample shape for
    // time-series features.
    QueryDef("ts_gapfill",
      (s, d) => {
        val ev = T(s, d, "events")
        val hourly = ev.filter(col("event_type") === "purchase")
          .groupBy(date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        val spine = ev
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hr"))
        spine.join(hourly, Seq("hr"), "left")
          .select(date_format(col("hr"), "yyyy-MM-dd HH:mm").as("hr"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
          .orderBy("hr")
      },
      Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
             |                  date_trunc('hour', max(ts)) AS hi FROM events),
             |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
             |h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n,
             |             round(sum(value), 2) AS sum_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT strftime(spine.hr, '%Y-%m-%d %H:%M') AS hr,
             |       coalesce(h.n, 0) AS n, coalesce(h.sum_value, 0.0) AS sum_value
             |FROM spine LEFT JOIN h ON spine.hr = h.hr
             |ORDER BY hr""".stripMargin)),

    // Linear-interpolation imputation — the numeric sibling of ts_ffill
    // (LOCF holds a level; lerp estimates a trend between observations):
    // hourly means of a SPARSE slice on the full calendar spine, gaps
    // filled by time-weighted interpolation between the bracketing
    // observations (edges extend flat). The interpolation fraction is a
    // ratio of exact integer seconds; observed means are rounded before
    // use so every lerp input is cross-engine identical. Windows run over
    // the O(hours) spine — at scale this is per-series (add the key to
    // the window partition).
    QueryDef("ts_lerp",
      (s, d) => {
        val ev = T(s, d, "events")
        val sparse = ev.filter(col("event_type") === "purchase" && col("user_id") < 3)
          .groupBy(date_trunc("hour", col("ts")).as("hr"))
          // exact order-independent mean, deliberately UNROUNDED: decimal
          // sum + integer-count division is one IEEE op on identical
          // inputs, so v (and everything derived from it) is bit-identical
          // across engines; quantization happens once at output via
          // floor(x*1e4) — round() would diverge on exact .00005
          // boundaries (Spark rounds the decimal string HALF_UP, DuckDB
          // rounds the binary double; the interpolation's power-of-two
          // fractions land on such boundaries)
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double")
            / count(lit(1))).as("v"))
        val spine = ev
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hr"))
        val w = Window.orderBy("hr")
        val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
        val wNext = w.rowsBetween(0, Window.unboundedFollowing)
        spine.join(sparse, Seq("hr"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
          .withColumn("ph", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
          .withColumn("nh", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wNext))
          .withColumn("filled",
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (unix_timestamp(col("hr")) - unix_timestamp(col("ph"))).cast("double") /
                (unix_timestamp(col("nh")) - unix_timestamp(col("ph"))).cast("double")))
          .select(date_format(col("hr"), "yyyy-MM-dd HH:mm").as("hr"),
            col("v").isNotNull.cast("int").as("is_observed"),
            (floor(col("filled") * 10000) / 10000.0).as("filled"))
          .orderBy("hr")
      },
      Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
             |                  date_trunc('hour', max(ts)) AS hi FROM events),
             |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
             |h AS (SELECT date_trunc('hour', ts) AS hr,
             |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             |               / count(*) AS v
             |      FROM events WHERE event_type = 'purchase' AND user_id < 3 GROUP BY 1),
             |j AS (SELECT spine.hr AS hr, h.v FROM spine LEFT JOIN h ON spine.hr = h.hr),
             |x AS (SELECT hr, v,
             |        last_value(v IGNORE NULLS) OVER (ORDER BY hr
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |        last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
             |          OVER (ORDER BY hr
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             |        first_value(v IGNORE NULLS) OVER (ORDER BY hr
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |        first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
             |          OVER (ORDER BY hr
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
             |      FROM j)
             |SELECT strftime(hr, '%Y-%m-%d %H:%M') AS hr,
             |       CAST(v IS NOT NULL AS INT) AS is_observed,
             |       floor((CASE WHEN v IS NOT NULL THEN v
             |                   WHEN pv IS NULL THEN nv
             |                   WHEN nv IS NULL THEN pv
             |                   ELSE pv + (nv - pv) *
             |                        CAST(epoch(hr) - epoch(ph) AS DOUBLE) /
             |                        CAST(epoch(nh) - epoch(ph) AS DOUBLE) END) * 10000)
             |         / 10000.0 AS filled
             |FROM x ORDER BY hr""".stripMargin)),

    // Inner as-of semantics (DuckDB's default ASOF JOIN): the left-outer
    // native operator + a not-null filter on the matched key — Catalyst
    // evaluates the filter on the join output, so unmatched purchases drop
    // exactly as the inner join would drop them.
    QueryDef("ts_asof_inner",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user_id"), col("ts").as("cts"),
            col("event_id").as("click_id"))
        AsofJoin.asofNative(purchases, clicks, "user_id", "c_user_id", "ts", "cts")
          .filter(col("click_id").isNotNull)
          .select(col("event_id").as("p_event_id"), col("user_id"),
            col("click_id").as("click_event_id"))
          .orderBy("p_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id AS user_id,
             |       c.event_id AS click_event_id
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |ASOF JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p_event_id""".stripMargin)),

    // Tolerance-bounded as-of join: the latest preceding click counts only
    // if it is at most 10 minutes stale — the practical time-series lookup
    // (a stale quote is no quote). Runs through the native operator's
    // tolerance parameter; the oracle is DuckDB's unbounded ASOF JOIN with
    // the gap bound applied to the match (equivalent: the latest preceding
    // row is the ONLY candidate — any earlier row is staler).
    QueryDef("ts_asof_tol",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user_id"), col("ts").as("cts"),
            col("event_id").as("click_id"))
        AsofJoin.asofNative(purchases, clicks, "user_id", "c_user_id", "ts", "cts",
            toleranceMicros = Some(600L * 1000000))
          .select(col("event_id").as("p_event_id"), col("user_id"),
            col("click_id").as("click_event_id"))
          .orderBy("p_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id AS user_id,
             |       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 600000000
             |            THEN c.event_id END AS click_event_id
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p_event_id""".stripMargin)),

    // Bounded-interval join via time-bucketed equi-join (IntervalJoin):
    // clicks within 30 minutes after each purchase, counted per purchase.
    // Oracle is the naive inequality LEFT JOIN; the Spark plan is the
    // scale path — explode intervals into 10-minute buckets, hash-join on
    // (user, bucket), refine exactly. PlanQualitySpec asserts no
    // nested-loop join survives.
    QueryDef("ts_interval_join",
      (s, d) => {
        val ev = T(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("user_id"),
            col("ts").as("p_ts"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("p_end"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
            col("event_id").as("c_event_id"))
        val matched = IntervalJoin.pointInInterval(purchases, clicks,
          "user_id", "c_user_id", "p_ts", "p_end", "c_ts", bucketSeconds = 600L)
          .groupBy("p_event_id").agg(count(lit(1)).as("n_clicks"))
        purchases.select("p_event_id", "user_id")
          .join(matched, Seq("p_event_id"), "left")
          .select(col("p_event_id"), col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy("p_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id AS user_id,
             |       count(c.event_id) AS n_clicks
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // DAU / trailing-7-day WAU / stickiness per day — the canonical growth
    // metric. The trailing-window DISTINCT cannot ride a window frame, so
    // the day spine joins the per-(user, day) activity table over a
    // 7-day band: the activity table is users×days-sized (≪ events), the
    // spine is days-sized, so the band join is dimension-scale however
    // large the raw event log is.
    QueryDef("ts_dau_wau",
      (s, d) => {
        val active = T(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val days = active.select(col("day").as("spine_day")).distinct()
        val wau = days.join(active,
            col("day") > date_sub(col("spine_day"), 7) && col("day") <= col("spine_day"))
          .groupBy("spine_day").agg(count_distinct(col("user_id")).as("wau"))
        val dau = active.groupBy("day").agg(count_distinct(col("user_id")).as("dau"))
        dau.join(wau, col("day") === col("spine_day"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("dau"), col("wau"),
            // floor quantization, not round: dau/wau is an exact rational
            // whose double can sit a hair under a .00005 boundary, where
            // Spark's shortest-string HALF_UP and DuckDB's binary round
            // disagree (the ts_twa lesson)
            (floor(col("dau") * 10000 / col("wau")) / 10000).as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |days AS (SELECT DISTINCT day AS spine_day FROM a),
             |wau AS (SELECT spine_day, count(DISTINCT user_id) AS wau
             |        FROM days JOIN a ON a.day > spine_day - 7 AND a.day <= spine_day
             |        GROUP BY 1),
             |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM a GROUP BY 1)
             |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau,
             |       floor(dau * 10000 / wau) / 10000 AS stickiness
             |FROM dau JOIN wau ON dau.day = wau.spine_day
             |ORDER BY day""".stripMargin)),

    // Cumulative distinct users by day via the FIRST-SEEN trick: a running
    // count-distinct is O(n·days) if computed per frame, but each user
    // contributes exactly once — at their min date — so one groupBy(user)
    // plus a running sum over the tiny per-day table gives the exact curve.
    // The only full-data pass is the user-keyed aggregate; the window runs
    // over O(days) rows. This is THE scalable form of "users to date".
    QueryDef("ts_cume_users",
      (s, d) => {
        val first = T(s, d, "events")
          .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d0"))
          .groupBy("d0").agg(count(lit(1)).as("new_users"))
        val cum = Window.orderBy("d0")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        first
          .select(date_format(col("d0"), "yyyy-MM-dd").as("day"),
            col("new_users"),
            sum(col("new_users")).over(cum).cast("bigint").as("cume_users"))
          .orderBy("day")
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1),
             |n AS (SELECT d0, count(*) AS new_users FROM f GROUP BY 1)
             |SELECT strftime(d0, '%Y-%m-%d') AS day, new_users,
             |       CAST(sum(new_users) OVER (ORDER BY d0 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cume_users
             |FROM n ORDER BY day""".stripMargin)),

    // Exponentially weighted moving average of daily event volume
    // (alpha = 1/2, adjust-style normalization): ewma_n =
    // sum(x_i * 2^i) / sum(2^i) over i <= n. Weights are EXACT powers of
    // two anchored at the LAST day (exponent i - N <= 0), so scaling never
    // rounds, days beyond the ~1075-day double range underflow to exact 0
    // (a self-windowing tail, no overflow at any history length), and the
    // two running sums accumulate in the same ORDER BY order on both
    // engines — the ratio is bit-reproducible. O(days) rows after the
    // one date aggregate.
    QueryDef("ts_ewma",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy("d0")
        val all = Window.orderBy("d0")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val cum = Window.orderBy("d0")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("wt",
            pow(lit(2.0), (row_number().over(w) - count(lit(1)).over(all)).cast("double")))
          .select(date_format(col("d0"), "yyyy-MM-dd").as("day"),
            col("n").as("n_events"),
            round(sum(col("n") * col("wt")).over(cum) / sum(col("wt")).over(cum), 4)
              .as("ewma"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d0, count(*) AS n FROM events GROUP BY 1),
             |wtd AS (SELECT d0, n,
             |               pow(2.0, CAST(row_number() OVER (ORDER BY d0)
             |                             - count(*) OVER () AS DOUBLE)) AS wt
             |        FROM daily)
             |SELECT strftime(d0, '%Y-%m-%d') AS day, n AS n_events,
             |       round(sum(n * wt) OVER (ORDER BY d0 ROWS UNBOUNDED PRECEDING)
             |             / sum(wt) OVER (ORDER BY d0 ROWS UNBOUNDED PRECEDING), 4) AS ewma
             |FROM wtd ORDER BY day""".stripMargin)),

    // Holt double-exponential smoothing (level + trend, alpha = beta = 0.5)
    // per event_type series — the next-step volume forecaster ts_ewma can't
    // be (EWMA has no trend state; on a ramping series it lags forever).
    // The recursion l' = a·x + (1-a)(l+b), b' = b·(l'-l) + (1-b)·b is a
    // sequential fold per series: expressed as the codegen'd higher-order
    // `aggregate` over the date-sorted value array — the right Spark shape
    // for per-KEY recursions (state stays in one combiner; no driver loop,
    // no UDF). Scale: the corpus collapses to O(types × days) first; each
    // series folds independently, so millions of series parallelize by key;
    // a series too long for one array would chunk via per-segment folds
    // (the (l,b) state is the only carry). Determinism: both engines fold
    // the same doubles in the same date order with operand-identical
    // arithmetic (l' restated verbatim inside b'), so the final state is
    // bit-identical; rounding happens once at output.
    QueryDef("ts_holt",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("d0"), col("x")))).as("ser"))
          .select(col("event_type"),
            expr("transform(ser, e -> CAST(e.x AS DOUBLE))").as("xs"))
          .select(col("event_type"), size(col("xs")).cast("bigint").as("n_days"),
            expr("""aggregate(slice(xs, 2, size(xs) - 1),
                    named_struct('l', xs[0], 'b', CAST(0.0 AS DOUBLE)),
                    (a, x) -> named_struct(
                      'l', 0.5 * x + 0.5 * (a.l + a.b),
                      'b', 0.5 * ((0.5 * x + 0.5 * (a.l + a.b)) - a.l) + 0.5 * a.b))""")
              .as("st"))
          .select(col("event_type"), col("n_days"),
            round(col("st.l"), 4).as("level"),
            round(col("st.b"), 4).as("trend"),
            round(col("st.l") + col("st.b"), 4).as("forecast_next"))
          .orderBy("event_type")
      },
      // The oracle unrolls the recursion as a RECURSIVE CTE keyed on the
      // day index, not a list_reduce lambda: DuckDB 1.0's list_reduce does
      // not reproduce a strict sequential left fold for a multi-field
      // struct state (verified against an independent in-Scala/Python
      // reference — only associative folds agree), so the lambda form
      // cannot serve as a truth side. The CTE recursion applies the
      // operand-identical update once per day row.
      Some("""WITH RECURSIVE
             |daily AS (SELECT event_type, CAST(ts AS DATE) AS d0, count(*) AS x
             |          FROM events GROUP BY 1, 2),
             |drn AS (SELECT event_type, x,
             |               row_number() OVER (PARTITION BY event_type
             |                                  ORDER BY d0) AS rn
             |        FROM daily),
             |nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1),
             |holt(event_type, i, l, b) AS (
             |  SELECT event_type, 1, CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)
             |  FROM drn WHERE rn = 1
             |  UNION ALL
             |  SELECT d.event_type, h.i + 1,
             |         0.5 * d.x + 0.5 * (h.l + h.b),
             |         0.5 * ((0.5 * d.x + 0.5 * (h.l + h.b)) - h.l) + 0.5 * h.b
             |  FROM holt h JOIN drn d ON d.event_type = h.event_type
             |                        AND d.rn = h.i + 1)
             |SELECT h.event_type, nd.n_days, round(h.l, 4) AS level,
             |       round(h.b, 4) AS trend,
             |       round(h.l + h.b, 4) AS forecast_next
             |FROM holt h JOIN nd ON nd.event_type = h.event_type
             |                   AND h.i = nd.n_days
             |ORDER BY h.event_type""".stripMargin)),

    // SAX symbolic discretization (Lin et al. 2003): PAA over 30-minute
    // frames (mean-per-frame dimensionality reduction), then an equi-depth
    // 4-letter alphabet assigned by ntile over each type's PAA distribution
    // — the symbolic series form motif/anomaly miners consume. Equi-depth
    // rank breakpoints instead of the paper's Gaussian table: the N(0,1)
    // breakpoints need erfinv (libm, not cross-engine reproducible) and
    // assume z-normalized input, while ntile is exact given the total
    // (paa, frame) order. The PAA mean is computed on the exact integer
    // lattice — cents in, (sum·100) div n out (1e-4 units) — because a
    // round(avg(double), 4) flips at the boundary under summation-order
    // noise (hit at sf0.1: 52.64625 rounded both ways). The window runs
    // over the O(frames × types) bucket spine — bounded by the time
    // range, never fact-sized.
    QueryDef("ts_paa_sax",
      (s, d) => saxFrames(s, d).orderBy("event_type", "frame"),
      Some(s"""WITH $saxCtes
             |SELECT event_type, frame, n, paa_e4, sax
             |FROM sax ORDER BY event_type, frame""".stripMargin)),

    // SAX motif mining — the consumer the discretization above exists
    // for (Lin et al. 2003 §4): assemble every 4-symbol SAX word from
    // consecutive OBSERVED frames (lead-3 window over the frame spine;
    // calendar gaps compress away, as in the paper's sliding word
    // extraction), count exact occurrences per (event_type, word), and
    // report each type's top repeated words — the recurring shapelets a
    // monitoring pipeline promotes to alert templates. A word occurring
    // once is noise, not a motif, so n_occ >= 2 gates the report; ties
    // rank deterministically on the word itself. Scale shape: the word
    // assembly is one lead-window over the O(frames x types) PAA spine
    // (already bounded by the time range, never fact-sized); the count
    // is a keyed aggregate on (type, word), and the top-10 rank runs on
    // the O(distinct words) frame — at 100 TB the facts are touched only
    // by saxFrames' one groupBy.
    QueryDef("ts_sax_motifs",
      (s, d) => {
        val byCnt = Window.partitionBy("event_type")
          .orderBy(col("n_occ").desc, col("word"))
        saxWordCounts(s, d)
          .filter(col("n_occ") >= 2)
          .withColumn("rk", row_number().over(byCnt).cast("bigint"))
          .filter(col("rk") <= 10)
          .orderBy("event_type", "rk")
      },
      Some(s"""WITH $saxWordCtes
             |SELECT event_type, word, n_occ, first_frame,
             |       CAST(rk AS BIGINT) AS rk
             |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
             |                ORDER BY n_occ DESC, word) AS rk
             |      FROM cnts WHERE n_occ >= 2)
             |WHERE rk <= 10
             |ORDER BY event_type, rk""".stripMargin)),

    // SAX discord candidates — the anomaly half of the motif/discord pair
    // (Lin et al. 2003 §4.2: a discord is the subsequence FURTHEST from
    // every other; in symbol space the rarest words are the candidate
    // set a miner verifies): per event type, the 5 least-frequent
    // 4-symbol words with their occurrence count and first frame — the
    // "when did the weird shape happen" pointer an on-call panel wants.
    // Same shared word table and scale shape as ts_sax_motifs; ranking
    // ties break on the word itself, deterministically.
    QueryDef("ts_sax_discords",
      (s, d) => {
        val byRarity = Window.partitionBy("event_type")
          .orderBy(col("n_occ"), col("word"))
        saxWordCounts(s, d)
          .withColumn("rk", row_number().over(byRarity).cast("bigint"))
          .filter(col("rk") <= 5)
          .orderBy("event_type", "rk")
      },
      Some(s"""WITH $saxWordCtes
             |SELECT event_type, word, n_occ, first_frame,
             |       CAST(rk AS BIGINT) AS rk
             |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
             |                ORDER BY n_occ, word) AS rk
             |      FROM cnts)
             |WHERE rk <= 5
             |ORDER BY event_type, rk""".stripMargin)),

    // Winsorization report — the robust-prep companion to ts_hampel:
    // per event_type, clip values to the [5th, 95th] percentile bounds and
    // report the bounds, the clipped-row count, and the mean before/after
    // (how much the tails were dragging the estimate). Percentile
    // selection is DISCRETE by rank (value at rank max(1, (5n) div 100)
    // and its mirror), not interpolated: quantile_cont's fractional
    // interpolation multiplies by a non-dyadic f where the two engines'
    // formula association differs at the ulp — rank selection on the
    // total (cents, event_id) order is exact. Means on the 1e-4 lattice
    // ((sum·100) div n). Shape: one row_number per type + an O(types)
    // bound frame broadcast back — two passes over the facts, no
    // self-join.
    QueryDef("ts_winsorize",
      (s, d) => {
        val base = T(s, d, "events")
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100).cast("bigint").as("c"))
        val byC = Window.partitionBy("event_type").orderBy("c", "event_id")
        val r = base.withColumn("r", row_number().over(byC).cast("bigint"))
        val n = base.groupBy("event_type").agg(count(lit(1)).as("n"))
        val bounds = r.join(n, "event_type")
          .withColumn("klo", greatest(lit(1L), expr("(5 * n) div 100")))
          .filter(col("r") === col("klo") || col("r") === col("n") + 1 - col("klo"))
          .groupBy("event_type")
          .agg(max(when(col("r") === col("klo"), col("c"))).as("lo"),
            max(when(col("r") =!= col("klo"), col("c"))).as("hi0"))
          // n = 1 collapses the mirror rank onto klo (hi0 NULL — the upper
          // clip would silently vanish); degrade to lo = hi, a zero-width
          // clip window, same guard stated in the oracle
          .select(col("event_type"), col("lo"),
            coalesce(col("hi0"), col("lo")).as("hi"))
        base.join(bounds, "event_type")
          .select(col("event_type"), col("c"),
            least(greatest(col("c"), col("lo")), col("hi")).as("w"),
            col("lo"), col("hi"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max(col("lo")).as("lo_cents"),
            max(col("hi")).as("hi_cents"),
            sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
              .otherwise(0L)).as("n_clipped"),
            sum(col("c")).as("sc"), sum(col("w")).as("sw"))
          .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
            col("n_clipped"),
            expr("(sc * 100) div n").as("mean_e4"),
            expr("(sw * 100) div n").as("wmean_e4"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (SELECT event_id, event_type,
             |                  CAST(round(value * 100) AS BIGINT) AS c
             |           FROM events),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
             |                     ORDER BY c, event_id) AS BIGINT) AS r
             |      FROM b),
             |n AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
             |k AS (SELECT r.*, n.n, greatest(1, (5 * n.n) // 100) AS klo
             |      FROM r JOIN n USING (event_type)),
             |bd AS (SELECT event_type,
             |              max(CASE WHEN r = klo THEN c END) AS lo,
             |              coalesce(max(CASE WHEN r <> klo THEN c END),
             |                       max(CASE WHEN r = klo THEN c END)) AS hi
             |       FROM k WHERE r = klo OR r = n + 1 - klo
             |       GROUP BY 1)
             |SELECT b.event_type, count(*) AS n,
             |       max(bd.lo) AS lo_cents, max(bd.hi) AS hi_cents,
             |       CAST(sum(CASE WHEN b.c < bd.lo OR b.c > bd.hi
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
             |       (CAST(sum(b.c) AS BIGINT) * 100) // count(*) AS mean_e4,
             |       (CAST(sum(least(greatest(b.c, bd.lo), bd.hi)) AS BIGINT)
             |        * 100) // count(*) AS wmean_e4
             |FROM b JOIN bd USING (event_type)
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Hampel outlier filter (Hampel 1974; Pearson's robust de-spiking):
    // flag x_t where |x_t − rolling_median_7| > 3·1.4826·rolling_MAD_7 —
    // the robust sibling of ts_anomaly's global z-score (one spike
    // inflates a stddev and masks itself; the median/MAD window doesn't).
    // Entirely on exact integer lattices: cents doubled so every rolling
    // median (midpoint of two evens) is an exact integer, MAD doubled
    // again (mad4), and the 3·1.4826 threshold cross-multiplied as
    // 20000·dev > 44478·mad4 — no float touches the gate. The rolling MAD
    // needs each window's own median, so the member pass is an explode of
    // sequence(-3,3) + one equi-join on (type, rn) — a bounded 7× blow-up,
    // the relational form of the sliding window. At 100 TB the
    // row_number runs per (type, day)-bucket spine instead of per type
    // (the DistributedRank move); the semantics here are the operator's.
    QueryDef("ts_hampel",
      (s, d) => {
        val base = T(s, d, "events")
          .select(col("event_id"), col("event_type"), col("ts"),
            (round(col("value") * 100).cast("bigint") * 2).as("x2"))
        val byTs = Window.partitionBy("event_type").orderBy("ts", "event_id")
        val r = base.withColumn("rn", row_number().over(byTs).cast("bigint"))
        val frame = Window.partitionBy("event_type").orderBy("rn")
          .rowsBetween(-3, 3)
        // One window pass collects each row's <= 7 frame members; both
        // rolling medians then come from pure codegen'd array arithmetic on
        // that array. Exactness is unchanged: with n members, lower index
        // (n+1) div 2 and upper n div 2 + 1 coincide for odd n and are the
        // two middle elements for even n, and every midpoint
        // (a + b) div 2 is an exact integer because x2 (and 2·dev) are even
        // by construction — the same lattice values percentile()'s
        // a + (b−a)·0.5 interpolation produced. What this removes (guide
        // §2.4, §1.2): the per-frame interpreted percentile window
        // aggregate, the 7× sequence-explode, the (type, rn) equi-join
        // re-shuffle of the whole series, the per-event_id MAD aggregate
        // shuffle, and the final med⋈mad join — the plan drops from 14
        // exchanges to 4 (solo A/B 2.89 s → 2.23 s at sf0.1 — solo pays
        // cold staging; the in-suite REPEAT=3 median reads 2.64 → 1.39 s.
        // The residual floor is the series windows' parallelism, which is
        // the event-type count by the operator's semantics).
        //
        // med2/mad4 are deliberately WINDOW outputs (first() over a
        // current-row frame on the partitioning already established — no
        // new exchange, no new sort): as plain projection aliases,
        // PushPredicateThroughNonJoin inlined the whole array pipeline
        // into the final filter's condition — ~6 array_sort copies per row
        // plus med2 re-evaluated per transform() element — and the
        // "optimized" plan ran 2.4× SLOWER than the original (7.0 s solo).
        // A window output is an optimizer barrier: each value is computed
        // once per row, and the filter references the attribute.
        val w00 = Window.partitionBy("event_type").orderBy("rn")
          .rowsBetween(Window.currentRow, Window.currentRow)
        val med2Expr = expr(
          "(element_at(sv, CAST((size(sv) + 1) div 2 AS INT)) " +
            "+ element_at(sv, CAST(size(sv) div 2 + 1 AS INT))) div 2")
        val mad4Expr = expr(
          "(element_at(array_sort(transform(sv, v -> 2 * abs(v - med2))), " +
            "  CAST((size(sv) + 1) div 2 AS INT)) " +
            "+ element_at(array_sort(transform(sv, v -> 2 * abs(v - med2))), " +
            "  CAST(size(sv) div 2 + 1 AS INT))) div 2")
        val m = r.withColumn("vs", collect_list(col("x2")).over(frame))
          .withColumn("sv", array_sort(col("vs")))
          .withColumn("med2", first(med2Expr).over(w00))
          .withColumn("mad4", first(mad4Expr).over(w00))
        m.select(col("event_id"), col("event_type"),
            expr("x2 div 2").as("cents"), col("med2"),
            abs(col("x2") - col("med2")).as("dev2"), col("mad4"))
          .filter(expr("20000 * dev2 > 44478 * mad4"))
          .orderBy("event_id")
      },
      Some("""WITH b AS (SELECT event_id, event_type, ts,
             |                  CAST(round(value * 100) AS BIGINT) * 2 AS x2
             |           FROM events),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
             |                     ORDER BY ts, event_id) AS BIGINT) AS rn
             |      FROM b),
             |m AS (SELECT *, CAST(median(x2) OVER (PARTITION BY event_type
             |                     ORDER BY rn ROWS BETWEEN 3 PRECEDING
             |                     AND 3 FOLLOWING) AS BIGINT) AS med2
             |      FROM r),
             |mem AS (SELECT c.event_id, abs(m2.x2 - c.med2) AS dev
             |        FROM m c JOIN r m2 ON m2.event_type = c.event_type
             |                          AND m2.rn BETWEEN c.rn - 3 AND c.rn + 3),
             |md AS (SELECT event_id,
             |              CAST(quantile_cont(2 * dev, 0.5) AS BIGINT) AS mad4
             |       FROM mem GROUP BY 1)
             |SELECT m.event_id, m.event_type, m.x2 // 2 AS cents, m.med2,
             |       abs(m.x2 - m.med2) AS dev2, md.mad4
             |FROM m JOIN md USING (event_id)
             |WHERE 20000 * abs(m.x2 - m.med2) > 44478 * md.mad4
             |ORDER BY m.event_id""".stripMargin)),

    // Theil–Sen robust trend per event_type series: the median of all
    // pairwise day-slopes — outlier-days move an OLS slope arbitrarily but
    // shift a slope median by at most one rank (the robust-regression
    // classic). Pair space is days², but DAYS per series, not events: the
    // corpus collapses to O(types × days) first, the pair join is equi on
    // the series key (AQE-splittable), and the median is picked by rank
    // inside a PARTITIONED window — bounded days²-per-series frames, no
    // global sort. Lower median ((n+1) div 2) stated on both engines; ties
    // in slope make the row choice arbitrary but the VALUE picked
    // identical, so the output is deterministic. Each slope is exact
    // integers divided once; rounding happens once at output.
    QueryDef("ts_theil_sen",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        val a = daily.select(col("event_type"), col("d0").as("da"), col("x").as("xa"))
        val b = daily.select(col("event_type"), col("d0").as("db"), col("x").as("xb"))
        val slopes = a.join(b, Seq("event_type"))
          .filter(col("da") < col("db"))
          .select(col("event_type"),
            ((col("xb") - col("xa")) * lit(1.0)
              / datediff(col("db"), col("da"))).as("slope"))
        val wOrd = Window.partitionBy("event_type").orderBy("slope")
        val wAll = Window.partitionBy("event_type")
        slopes
          .withColumn("rn", row_number().over(wOrd).cast("bigint"))
          .withColumn("n_pairs", count(lit(1)).over(wAll))
          .filter(col("rn") === expr("CAST((n_pairs + 1) DIV 2 AS BIGINT)"))
          .select(col("event_type"), col("n_pairs"),
            round(col("slope"), 6).as("theil_slope"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0, count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |sl AS (SELECT a.event_type,
             |              (b.x - a.x) * 1.0 / date_diff('day', a.d0, b.d0) AS slope
             |       FROM daily a JOIN daily b ON a.event_type = b.event_type
             |                                AND a.d0 < b.d0),
             |rk AS (SELECT event_type, slope,
             |              row_number() OVER (PARTITION BY event_type
             |                                 ORDER BY slope) AS rn,
             |              count(*) OVER (PARTITION BY event_type) AS n_pairs
             |       FROM sl)
             |SELECT event_type, n_pairs, round(slope, 6) AS theil_slope
             |FROM rk WHERE rn = (n_pairs + 1) // 2
             |ORDER BY event_type""".stripMargin)),

    // Mann–Kendall trend test per event_type series — the nonparametric
    // significance companion to ts_theil_sen's slope estimate: S = Σ
    // sign(x_j − x_i) over ordered day pairs, Kendall's tau = S scaled by
    // the pair count in basis points. EVERY quantity is an exact integer
    // (sign sums, pair counts, a single integer-floored scaling), so the
    // result is bit-identical cross-engine with no rounding conventions at
    // all. Same O(types × days²) equi-join pair space as the slope — days
    // per series, not events — rolled up to one row per series.
    QueryDef("ts_mk_trend",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        val a = daily.select(col("event_type"), col("d0").as("da"), col("x").as("xa"))
        val b = daily.select(col("event_type"), col("d0").as("db"), col("x").as("xb"))
        a.join(b, Seq("event_type"))
          .filter(col("da") < col("db"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            sum(signum(col("xb") - col("xa")).cast("bigint")).as("mk_s"))
          .select(col("event_type"), col("n_pairs"), col("mk_s"),
            floor(col("mk_s") * lit(10000L) / col("n_pairs")).cast("bigint")
              .as("tau_bp"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0, count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |pr AS (SELECT a.event_type,
             |              CAST(sign(b.x - a.x) AS BIGINT) AS sg
             |       FROM daily a JOIN daily b ON a.event_type = b.event_type
             |                                AND a.d0 < b.d0),
             |ag AS (SELECT event_type, count(*) AS n_pairs,
             |              CAST(sum(sg) AS BIGINT) AS mk_s
             |       FROM pr GROUP BY 1)
             |SELECT event_type, n_pairs, mk_s,
             |       CAST(floor(mk_s * 10000 / n_pairs) AS BIGINT) AS tau_bp
             |FROM ag ORDER BY event_type""".stripMargin)),

    // Lag-1 autocorrelation of daily event volume per event type: is
    // traffic momentum-driven (r > 0), mean-reverting (r < 0), or white
    // noise? corr over the (x_t, x_{t-1}) pairs of the tiny per-day
    // aggregate — one full-data pass, then O(days) window work. Counts are
    // exact integers; the corr division is the only float op, round(3)
    // clears the cross-engine 1e-15 tail.
    QueryDef("ts_autocorr",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).cast("double").as("x"))
        val w = Window.partitionBy("event_type").orderBy("d0")
        daily
          .withColumn("x_prev", lag(col("x"), 1).over(w))
          .filter(col("x_prev").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            round(corr(col("x"), col("x_prev")), 3).as("autocorr"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0,
             |                      CAST(count(*) AS DOUBLE) AS x
             |               FROM events GROUP BY 1, 2),
             |lagged AS (SELECT event_type, x,
             |                  lag(x) OVER (PARTITION BY event_type ORDER BY d0) AS x_prev
             |           FROM daily)
             |SELECT event_type, count(*) AS n_pairs,
             |       round(corr(x, x_prev), 3) AS autocorr
             |FROM lagged WHERE x_prev IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Time-weighted average per user: each observation holds until the next
    // one, so its weight is the interval it covered — THE correct mean for
    // irregularly-sampled series (a sensor that reports hourly then
    // minutely would otherwise over-count the chatty period; plain_avg is
    // emitted alongside to show the skew). Gaps are exact integer
    // microseconds (unix_micros/epoch_us agree); one lead + one keyed
    // aggregate.
    QueryDef("ts_twa",
      (s, d) => {
        // values are 2-decimal and gaps are integer micros, so both sums
        // are EXACT decimals — averaged means can land exactly on round(4)
        // half-boundaries (plain_avg hit 44.94875 at sf0.1, where Spark's
        // decimal-string half-up and DuckDB's binary round diverge). Keep
        // every sum exact and quantize ONCE with floor — the ts_lerp rule.
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val q4 = (c: org.apache.spark.sql.Column) => floor(c) / 10000
        T(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("value").cast("decimal(18,2)").as("value"))
          .withColumn("gap",
            unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .filter(col("gap").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            q4(sum(col("value") * col("gap")).cast("double") * lit(10000.0) /
              sum(col("gap")).cast("double")).as("twa"),
            q4(sum(col("value")).cast("double") * lit(10000.0) /
              count(lit(1))).as("plain_avg"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, CAST(value AS DECIMAL(18,2)) AS value,
             |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             |       - epoch_us(ts) AS gap
             |  FROM events)
             |SELECT user_id, count(*) AS n_intervals,
             |       floor(CAST(sum(value * gap) AS DOUBLE) * 10000.0
             |             / CAST(sum(gap) AS DOUBLE)) / 10000 AS twa,
             |       floor(CAST(sum(value) AS DOUBLE) * 10000.0 / count(*)) / 10000
             |         AS plain_avg
             |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 7-day rolling Pearson correlation between two daily event-volume
    // series (click vs. view) — the co-movement diagnostic behind metric
    // dashboards and anomaly root-causing. corr as a WINDOW aggregate over
    // the tiny per-day frame (O(days) rows after one full-data aggregate);
    // only complete 7-row windows are emitted, so the statistic is always
    // well-defined on both engines.
    QueryDef("ts_rolling_corr",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(to_date(col("ts")).as("d0"))
          .agg(count(when(col("event_type") === "click", 1)).cast("double").as("c"),
            count(when(col("event_type") === "view", 1)).cast("double").as("v"))
        val w7 = Window.orderBy("d0").rowsBetween(-6, Window.currentRow)
        val wrn = Window.orderBy("d0")
        daily
          .withColumn("rn", row_number().over(wrn))
          .withColumn("corr7", round(corr(col("c"), col("v")).over(w7), 3))
          .filter(col("rn") >= 7)
          .select(date_format(col("d0"), "yyyy-MM-dd").as("day"),
            col("c").cast("bigint").as("n_click"),
            col("v").cast("bigint").as("n_view"),
            col("corr7"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d0,
             |                      count(*) FILTER (WHERE event_type = 'click') AS c,
             |                      count(*) FILTER (WHERE event_type = 'view') AS v
             |               FROM events GROUP BY 1),
             |r AS (SELECT d0, c, v,
             |             row_number() OVER (ORDER BY d0) AS rn,
             |             round(corr(c, v) OVER (ORDER BY d0 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 3) AS corr7
             |      FROM daily)
             |SELECT strftime(d0, '%Y-%m-%d') AS day, CAST(c AS BIGINT) AS n_click,
             |       CAST(v AS BIGINT) AS n_view, corr7
             |FROM r WHERE rn >= 7 ORDER BY day""".stripMargin)),

    // First-order Markov transition counts of user behavior: (previous
    // event type → current) frequencies — the sequence statistic behind
    // behavioral models and next-action prediction. One lag over the
    // user_id shuffle, then a 25-cell aggregate.
    QueryDef("ts_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("prev_type", "event_type")
      },
      Some("""SELECT prev_type, event_type, count(*) AS n FROM (
             |  SELECT event_type,
             |         lag(event_type) OVER (PARTITION BY user_id
             |                               ORDER BY ts, event_id) AS prev_type
             |  FROM events)
             |WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Association rules (the Apriori/market-basket classic) over daily
    // per-user baskets: basket = (user_id, day), items = the distinct
    // event types it contains; for every unordered pair the support,
    // both directed confidences, and lift. ts_transitions above is the
    // ORDERED sequential pair (Markov); this is the unordered
    // co-occurrence miner a recommender/affinity pipeline runs. Scale
    // shape: the corpus collapses to O(baskets × item-kinds) distinct
    // rows in one shuffle; the pair join is EQUI on the basket key
    // (co-partitioned, per-basket fan-out bounded by the item-kind count,
    // AQE-splittable); counts roll up to O(item-kinds²) rows; the basket
    // total is a broadcast scalar. Every count is an exact integer and
    // each ratio rounds once with operand order stated identically on
    // both engines.
    QueryDef("rel_assoc_rules",
      (s, d) => {
        val bt = T(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("event_type").as("t"))
          .distinct()
        val nb = broadcast(bt.select("user_id", "day").distinct()
          .agg(count(lit(1)).as("n_baskets")))
        val ic = bt.groupBy("t").agg(count(lit(1)).as("n_t"))
        bt.select(col("user_id"), col("day"), col("t").as("a"))
          .join(bt.select(col("user_id"), col("day"), col("t").as("b")),
            Seq("user_id", "day"))
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
          .join(broadcast(ic.select(col("t").as("a"), col("n_t").as("n_a"))), "a")
          .join(broadcast(ic.select(col("t").as("b"), col("n_t").as("n_b"))), "b")
          .crossJoin(nb)
          .select(col("a").as("antecedent"), col("b").as("consequent"),
            col("n_ab"),
            round(col("n_ab") * lit(1.0) / col("n_baskets"), 4).as("support"),
            round(col("n_ab") * lit(1.0) / col("n_a"), 4).as("conf_a_to_b"),
            round(col("n_ab") * lit(1.0) / col("n_b"), 4).as("conf_b_to_a"),
            round(col("n_ab") * lit(1.0) * col("n_baskets")
              / (col("n_a") * lit(1.0) * col("n_b")), 4).as("lift"))
          .orderBy("antecedent", "consequent")
      },
      Some("""WITH bt AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |                   event_type AS t
             |            FROM events),
             |nb AS (SELECT count(*) AS n_baskets
             |       FROM (SELECT DISTINCT user_id, day FROM bt)),
             |ic AS (SELECT t, count(*) AS n_t FROM bt GROUP BY 1),
             |pr AS (SELECT a.t AS a, b.t AS b, count(*) AS n_ab
             |       FROM bt a JOIN bt b ON a.user_id = b.user_id
             |                          AND a.day = b.day AND a.t < b.t
             |       GROUP BY 1, 2)
             |SELECT pr.a AS antecedent, pr.b AS consequent, n_ab,
             |       round(n_ab * 1.0 / nb.n_baskets, 4) AS support,
             |       round(n_ab * 1.0 / ia.n_t, 4) AS conf_a_to_b,
             |       round(n_ab * 1.0 / ib.n_t, 4) AS conf_b_to_a,
             |       round(n_ab * 1.0 * nb.n_baskets / (ia.n_t * 1.0 * ib.n_t), 4)
             |         AS lift
             |FROM pr JOIN ic ia ON ia.t = pr.a JOIN ic ib ON ib.t = pr.b
             |CROSS JOIN nb
             |ORDER BY 1, 2""".stripMargin)),

    // Local-maximum (peak) detection: rows whose value strictly exceeds
    // both time-neighbors within their type — alert/spike extraction with
    // one lag + one lead over a single (event_type) shuffle. Endpoint rows
    // (null neighbor) are not peaks, stated identically in both engines.
    QueryDef("ts_peaks",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .select(col("event_id"), col("event_type"), col("value"), col("ts"))
          .withColumn("prev_v", lag(col("value"), 1).over(w))
          .withColumn("next_v", lead(col("value"), 1).over(w))
          .filter(col("value") > col("prev_v") && col("value") > col("next_v"))
          .filter(col("event_id") < 3000)
          .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, round(value, 2) AS value FROM (
             |  SELECT event_id, event_type, value,
             |         lag(value) OVER w AS prev_v, lead(value) OVER w AS next_v
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
             |WHERE value > prev_v AND value > next_v AND event_id < 3000
             |ORDER BY event_id""".stripMargin)),

    // Week-over-week growth per event type: weekly volume joined to the
    // PREVIOUS CALENDAR week (date-arithmetic join, not a row lag — the same
    // gappy-series correctness argument as ts_naive_backtest: a type that
    // skips a week compares against nothing, not against two weeks ago),
    // growth as a floor-quantized ratio of exact counts. The standard KPI
    // trend table. Both engines truncate to ISO Monday-start weeks.
    QueryDef("ts_wow_growth",
      (s, d) => {
        val weekly = T(s, d, "events")
          .groupBy(col("event_type"), trunc(col("ts").cast("date"), "week").as("w0"))
          .agg(count(lit(1)).as("x"))
        weekly
          .join(weekly.select(col("event_type"),
            date_add(col("w0"), 7).as("w0"), col("x").as("x_prev")),
            Seq("event_type", "w0"))
          .select(col("event_type"), date_format(col("w0"), "yyyy-MM-dd").as("w0"),
            col("x"), col("x_prev"),
            (floor((col("x") - col("x_prev")) * lit(1000000.0) / col("x_prev")) / 10000)
              .as("growth_pct"))
          .orderBy("event_type", "w0")
      },
      Some("""WITH m AS (SELECT event_type, CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w0,
             |                  count(*) AS x
             |           FROM events GROUP BY 1, 2),
             |j AS (SELECT c.event_type, c.w0, c.x, p.x AS x_prev
             |      FROM m c JOIN m p ON p.event_type = c.event_type
             |                       AND p.w0 + INTERVAL 7 DAY = c.w0)
             |SELECT event_type, strftime(w0, '%Y-%m-%d') AS w0, x, x_prev,
             |       floor((x - x_prev) * 1000000.0 / x_prev) / 10000 AS growth_pct
             |FROM j ORDER BY event_type, w0""".stripMargin)),

    // Marketing attribution: for every purchase, the user's FIRST and LAST
    // non-purchase touch in the preceding 24h — conditional struct min/max
    // over a RANGE frame (the frame is time-bounded, the condition picks
    // which rows count; purchases with no prior touch keep NULLs). One
    // user-keyed window shuffle, no self-join — the shape that replaces
    // the quadratic "join each conversion to all its prior events" at
    // scale. Sub-second order folds into the (sec, event_id) struct key.
    QueryDef("ts_attribution",
      (s, d) => {
        val touch = when(col("event_type") =!= "purchase",
          struct(col("sec").as("s"), col("event_id").as("e"), col("event_type").as("t")))
        val w = Window.partitionBy("user_id").orderBy(col("sec"))
          .rangeBetween(-86400, -1)
        T(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts").cast("long").as("sec"), col("ts"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            min(touch).over(w).as("ft"),
            max(touch).over(w).as("lt"),
            count(touch).over(w).as("n_touches"))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ft.t").as("first_touch"), col("lt.t").as("last_touch"),
            col("n_touches"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |                   date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec, ts
             |            FROM events),
             |w AS (SELECT event_id, user_id, event_type, ts,
             |             min(CASE WHEN event_type <> 'purchase'
             |                      THEN {'s': sec, 'e': event_id, 't': event_type} END)
             |               OVER win AS ft,
             |             max(CASE WHEN event_type <> 'purchase'
             |                      THEN {'s': sec, 'e': event_id, 't': event_type} END)
             |               OVER win AS lt,
             |             count(CASE WHEN event_type <> 'purchase' THEN 1 END)
             |               OVER win AS n_touches
             |      FROM ev
             |      WINDOW win AS (PARTITION BY user_id ORDER BY sec
             |                     RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
             |       ft.t AS first_touch, lt.t AS last_touch, n_touches
             |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // CUSUM changepoint scan: per type, the running sum of deviations from
    // the series mean over daily volumes, reported at its max-|CUSUM| day —
    // the classic drift detector next to ts_meanshift's two-window test.
    // Kept in EXACT integer space: cusum_t = Σ(x_i − mean) scaled by n days
    // is n·cumsum_t − t·total (all BIGINTs), so the argmax (and the
    // tie-break to the earliest day) is bit-identical cross-engine — no
    // float mean ever enters a comparison.
    QueryDef("ts_cusum",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("x"))
        val wt = Window.partitionBy("event_type")
        val wc = Window.partitionBy("event_type").orderBy("day")
        daily
          .select(col("event_type"), col("day"), col("x"),
            count(lit(1)).over(wt).as("n"),
            sum(col("x")).over(wt).as("tot"),
            sum(col("x")).over(wc).as("cum"),
            row_number().over(wc).cast("bigint").as("t"))
          .select(col("event_type"), col("day"), col("n"), col("t"),
            (col("n") * col("cum") - col("t") * col("tot")).as("num"))
          .groupBy("event_type")
          .agg(max(struct(abs(col("num")).as("a"), (-col("t")).as("nt"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("num").as("num"),
            col("n").as("n"))).as("m"))
          .select(col("event_type"), col("m.day").as("peak_day"),
            col("m.num").as("cusum_num"), col("m.n").as("n_days"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |cur AS (SELECT event_type, day, x,
             |               count(*) OVER wt AS n,
             |               CAST(sum(x) OVER wt AS BIGINT) AS tot,
             |               CAST(sum(x) OVER wc AS BIGINT) AS cum,
             |               row_number() OVER wc AS t
             |        FROM daily
             |        WINDOW wt AS (PARTITION BY event_type),
             |               wc AS (PARTITION BY event_type ORDER BY day)),
             |num AS (SELECT event_type, day, n, n * cum - t * tot AS num, t FROM cur),
             |agg AS (SELECT event_type,
             |               max({'a': abs(num), 'nt': -t,
             |                    'day': strftime(day, '%Y-%m-%d'),
             |                    'num': num, 'n': n}) AS m
             |        FROM num GROUP BY 1)
             |SELECT event_type, m.day AS peak_day, m.num AS cusum_num, m.n AS n_days
             |FROM agg ORDER BY event_type""".stripMargin)),

    // Row-pattern matching (CEP-lite): strictly CONSECUTIVE view→click→
    // purchase triples per user — two leads over one user-keyed window, a
    // filter, and a count. The MATCH_RECOGNIZE-style sequence detector
    // without a quadratic self-join; sub-second order pinned by
    // (sec, event_id) like ts_attribution.
    QueryDef("ts_sequence_match",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").cast("long"), col("event_id"))
        T(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
            lead(col("event_type"), 1).over(w).as("t1"),
            lead(col("event_type"), 2).over(w).as("t2"))
          .filter(col("event_type") === "view" &&
            col("t1") === "click" && col("t2") === "purchase")
          .groupBy("user_id").agg(count(lit(1)).as("n_matches"))
          .orderBy("user_id")
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
             |                    lead(event_type, 1) OVER w AS t1,
             |                    lead(event_type, 2) OVER w AS t2
             |             FROM events
             |             WINDOW w AS (PARTITION BY user_id
             |                          ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts),
             |                                   event_id))
             |SELECT user_id, count(*) AS n_matches FROM seq
             |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sweep-line concurrency: treating each event as a 10-minute activity
    // interval, the peak number of simultaneously-active intervals per
    // type and the first instant it is reached — the classic
    // max-overlap/occupancy op (capacity sizing, rate-limit calibration).
    // Boundary points (+1 start, -1 end) under a running sum; the DEFAULT
    // RANGE window frame makes tied timestamps collapse to their group
    // cumulative on both engines, so tie order never matters. Ends sort
    // before starts at the same instant (delta asc), so back-to-back
    // intervals don't count as overlapping.
    QueryDef("ts_concurrency",
      (s, d) => {
        val ev = T(s, d, "events")
        val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("delta"))
          .unionAll(ev.select(col("event_type"),
            (col("ts") + expr("INTERVAL 10 MINUTES")).as("t"), lit(-1L).as("delta")))
        val w = Window.partitionBy("event_type").orderBy(col("t"), col("delta"))
        val runs = pts.withColumn("run", sum(col("delta")).over(w))
        val peaks = runs.groupBy("event_type").agg(max(col("run")).as("peak"))
        runs.join(peaks, "event_type")
          .filter(col("run") === col("peak"))
          .groupBy("event_type")
          .agg(max(col("run")).as("peak"),
            date_format(min(col("t")), "yyyy-MM-dd HH:mm:ss").as("first_peak_at"))
          .orderBy("event_type")
      },
      Some("""WITH pts AS (
             |  SELECT event_type, ts AS t, 1 AS delta FROM events
             |  UNION ALL
             |  SELECT event_type, ts + INTERVAL 10 MINUTE, -1 FROM events),
             |runs AS (SELECT event_type, t,
             |                CAST(sum(delta) OVER (PARTITION BY event_type
             |                                      ORDER BY t, delta) AS BIGINT) AS run
             |         FROM pts),
             |pk AS (SELECT event_type, max(run) AS peak FROM runs GROUP BY 1)
             |SELECT r.event_type, CAST(max(r.run) AS BIGINT) AS peak,
             |       strftime(min(r.t), '%Y-%m-%d %H:%M:%S') AS first_peak_at
             |FROM runs r JOIN pk ON pk.event_type = r.event_type AND r.run = pk.peak
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Calendar-completeness audit per event type: observed days vs the
    // min..max calendar span, missing-day count and coverage ratio — the
    // data-quality gate that decides whether day-granular analyses
    // (seasonality, backtests, changepoints) can be trusted, and the check
    // that would have caught a gappy series before a row-lagged forecast
    // misaligned (see ts_naive_backtest's calendar join). One daily rollup
    // + an O(types) aggregate; exact integer day arithmetic.
    QueryDef("ts_completeness",
      (s, d) => T(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(min(col("d0")).as("dmin"), max(col("d0")).as("dmax"),
          count(lit(1)).as("n_days"))
        .select(col("event_type"),
          date_format(col("dmin"), "yyyy-MM-dd").as("first_day"),
          date_format(col("dmax"), "yyyy-MM-dd").as("last_day"),
          col("n_days"),
          (datediff(col("dmax"), col("dmin")) + 1).cast("bigint").as("n_span"),
          ((datediff(col("dmax"), col("dmin")) + 1).cast("bigint") - col("n_days"))
            .as("n_missing"),
          (floor(col("n_days") * lit(10000.0) /
            ((datediff(col("dmax"), col("dmin")) + 1).cast("bigint"))) / 10000)
            .as("coverage"))
        .orderBy("event_type"),
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0
             |               FROM events GROUP BY 1, 2),
             |s AS (SELECT event_type, min(d0) AS dmin, max(d0) AS dmax,
             |             count(*) AS n_days
             |      FROM daily GROUP BY 1)
             |SELECT event_type,
             |       strftime(dmin, '%Y-%m-%d') AS first_day,
             |       strftime(dmax, '%Y-%m-%d') AS last_day,
             |       n_days,
             |       CAST(date_diff('day', dmin, dmax) + 1 AS BIGINT) AS n_span,
             |       CAST(date_diff('day', dmin, dmax) + 1 - n_days AS BIGINT) AS n_missing,
             |       floor(n_days * 10000.0 / (date_diff('day', dmin, dmax) + 1)) / 10000
             |         AS coverage
             |FROM s ORDER BY event_type""".stripMargin)),

    // Seasonal-naive forecast backtest: predict each day's volume as the
    // same weekday's volume one week earlier, score MAE and signed bias
    // per event type — the baseline every real forecaster must beat. The
    // forecast joins on the CALENDAR date (d0 - 7 days), not a row lag: a
    // missing day in the series would silently misalign every subsequent
    // row-lagged forecast to the wrong weekday. One co-keyed self-join of
    // the tiny daily rollup. Exact integer errors; floor quantization is
    // toward -inf on BOTH engines, so the signed bias is safe.
    QueryDef("ts_naive_backtest",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        daily
          .join(daily.select(col("event_type"),
            date_add(col("d0"), 7).as("d0"), col("x").as("f")),
            Seq("event_type", "d0"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("x") - col("f"))).as("abs_err"),
            sum(col("x") - col("f")).as("sgn_err"))
          .select(col("event_type"), col("n_eval"),
            (floor(col("abs_err") * lit(10000.0) / col("n_eval")) / 10000).as("mae"),
            (floor(col("sgn_err") * lit(10000.0) / col("n_eval")) / 10000).as("bias"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0, count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |l AS (SELECT d.event_type, d.x, p.x AS f
             |      FROM daily d
             |      JOIN daily p ON p.event_type = d.event_type
             |                  AND p.d0 = d.d0 - INTERVAL 7 DAY),
             |e AS (SELECT event_type, count(*) AS n_eval,
             |             CAST(sum(abs(x - f)) AS BIGINT) AS abs_err,
             |             CAST(sum(x - f) AS BIGINT) AS sgn_err
             |      FROM l GROUP BY 1)
             |SELECT event_type, n_eval,
             |       floor(abs_err * 10000.0 / n_eval) / 10000 AS mae,
             |       floor(sgn_err * 10000.0 / n_eval) / 10000 AS bias
             |FROM e ORDER BY event_type""".stripMargin)),

    // Day-of-week seasonality index per event type: mean daily volume on
    // each weekday relative to the type's overall mean daily volume (1.0 =
    // flat week). The decomposition step before any weekly-seasonal
    // forecast or anomaly baseline. Index = (dow_sum * n_days) /
    // (dow_days * total) — a ratio of exact integer products, quantized
    // once with floor. Two tiny keyed aggregates over the daily rollup.
    QueryDef("ts_dow_seasonality",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        val byDow = daily
          .groupBy(col("event_type"), dayofweek(col("d0")).cast("bigint").as("dow"))
          .agg(count(lit(1)).as("n_days"), sum("x").as("dow_sum"))
        val totals = daily.groupBy("event_type")
          .agg(count(lit(1)).as("tot_days"), sum("x").as("tot_sum"))
        byDow.join(totals, "event_type")
          .select(col("event_type"), col("dow"), col("n_days"), col("dow_sum"),
            (floor(col("dow_sum") * col("tot_days") * lit(10000.0) /
              (col("n_days") * col("tot_sum"))) / 10000).as("idx"))
          .orderBy("event_type", "dow")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0, count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |bydow AS (SELECT event_type, CAST(dayofweek(d0) + 1 AS BIGINT) AS dow,
             |                 count(*) AS n_days, CAST(sum(x) AS BIGINT) AS dow_sum
             |          FROM daily GROUP BY 1, 2),
             |tot AS (SELECT event_type, count(*) AS tot_days, CAST(sum(x) AS BIGINT) AS tot_sum
             |        FROM daily GROUP BY 1)
             |SELECT b.event_type, b.dow, b.n_days, b.dow_sum,
             |       floor(b.dow_sum * t.tot_days * 10000.0 / (b.n_days * t.tot_sum)) / 10000 AS idx
             |FROM bydow b JOIN tot t ON b.event_type = t.event_type
             |ORDER BY b.event_type, b.dow""".stripMargin)),

    // Additive seasonal decomposition (STL-lite) per event_type series:
    // trend = centered 7-day moving sum, detrended value kept as the EXACT
    // INTEGER 7·x − trend7 (no division on the hot path, so every
    // aggregate sums exact integers and the per-dow seasonal index is the
    // single rounding site). Interior days only (full 7-row frame; on a
    // gappy series the frame spans the 7 nearest OBSERVED days — the
    // ts_meanshift convention). Unlike ts_dow_seasonality above (raw dow
    // share), this removes the trend first, so a ramping series doesn't
    // masquerade as weekday seasonality. Scale shape: the raw corpus
    // collapses to O(types × days) in one keyed aggregate; the window is
    // PARTITIONED by series id with a bounded 7-row frame — the per-metric
    // decomposition shape at millions of series; the rollup is O(types×7).
    QueryDef("ts_decompose",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        val w7 = Window.partitionBy("event_type").orderBy("d0").rowsBetween(-3, 3)
        daily
          .withColumn("trend7", sum(col("x")).over(w7))
          .withColumn("n7", count(lit(1)).over(w7))
          .filter(col("n7") === 7)
          .withColumn("dd", lit(7) * col("x") - col("trend7"))
          .groupBy(col("event_type"), dayofweek(col("d0")).cast("bigint").as("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("dd")).as("sum_d"))
          .select(col("event_type"), col("dow"), col("n_days"), col("sum_d"),
            round(col("sum_d") * lit(1.0) / (lit(7) * col("n_days")), 4).as("seasonal"))
          .orderBy("event_type", "dow")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0, count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |tr AS (SELECT event_type, d0, x,
             |              CAST(sum(x) OVER w AS BIGINT) AS trend7,
             |              count(*) OVER w AS n7
             |       FROM daily
             |       WINDOW w AS (PARTITION BY event_type ORDER BY d0
             |                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (SELECT event_type, CAST(dayofweek(d0) + 1 AS BIGINT) AS dow,
             |               7 * x - trend7 AS dd
             |        FROM tr WHERE n7 = 7),
             |agg AS (SELECT event_type, dow, count(*) AS n_days,
             |               CAST(sum(dd) AS BIGINT) AS sum_d
             |        FROM det GROUP BY 1, 2)
             |SELECT event_type, dow, n_days, sum_d,
             |       round(sum_d * 1.0 / (7 * n_days), 4) AS seasonal
             |FROM agg ORDER BY event_type, dow""".stripMargin)),

    // Two-window mean-shift changepoint detection over the daily volume
    // series: for each day with k=7 OBSERVED days on both sides (row
    // frames — on a gappy series the windows span the 7 nearest observed
    // days, which is the usual changepoint convention), the before/after
    // mean difference — the distributed form of changepoint scanning
    // (every candidate day scored in one windowed pass, no
    // per-candidate re-aggregation). Counts are exact integers; each mean
    // is (exact sum)/7 and the shift is quantized once with floor, so the
    // score is bit-identical cross-engine. One (event_type) shuffle.
    QueryDef("ts_meanshift",
      (s, d) => {
        val daily = T(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d0"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy("event_type").orderBy("d0")
        val pre = w.rowsBetween(-7, -1)
        val post = w.rowsBetween(1, 7)
        daily
          .withColumn("n_pre", count(col("x")).over(pre))
          .withColumn("n_post", count(col("x")).over(post))
          .withColumn("s_pre", sum(col("x")).over(pre))
          .withColumn("s_post", sum(col("x")).over(post))
          .filter(col("n_pre") === 7 && col("n_post") === 7)
          .select(col("event_type"), date_format(col("d0"), "yyyy-MM-dd").as("d0"),
            col("x"),
            (floor((col("s_post") - col("s_pre")) * lit(10000.0) / 7) / 10000).as("shift"))
          .orderBy("event_type", "d0")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d0,
             |                      count(*) AS x
             |               FROM events GROUP BY 1, 2),
             |sc AS (SELECT event_type, d0, x,
             |              count(x) OVER pre AS n_pre, count(x) OVER post AS n_post,
             |              sum(x) OVER pre AS s_pre, sum(x) OVER post AS s_post
             |       FROM daily
             |       WINDOW pre AS (PARTITION BY event_type ORDER BY d0
             |                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
             |            post AS (PARTITION BY event_type ORDER BY d0
             |                     ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING))
             |SELECT event_type, strftime(d0, '%Y-%m-%d') AS d0, x,
             |       floor(CAST(s_post - s_pre AS BIGINT) * 10000.0 / 7) / 10000 AS shift
             |FROM sc WHERE n_pre = 7 AND n_post = 7
             |ORDER BY event_type, d0""".stripMargin)),

    // Hour-of-day load profile: per-hour median and tail (p95) of event
    // value plus volume — the capacity-planning / diurnal-pattern readout.
    // Exact interpolated percentiles (both engines linear-interpolate), 24
    // groups after map-side partials.
    QueryDef("ts_hourly_profile",
      (s, d) => T(s, d, "events")
        .select(hour(col("ts")).cast("bigint").as("hr"), col("value"))
        .groupBy("hr")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy("hr"),
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n,
             |       round(quantile_cont(value, 0.5), 4) AS p50,
             |       round(quantile_cont(value, 0.95), 4) AS p95
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Inter-arrival time distribution: per-user gaps between consecutive
    // events, bucketed on a log2 scale — the traffic-shape fingerprint
    // (burstiness, bot detection, session-gap calibration for
    // ts_session_window's 30-minute choice). lag + floor(log2): one
    // user_id shuffle, then an O(buckets) aggregate.
    QueryDef("ts_interarrival",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("gap_s",
            unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .filter(col("gap_s").isNotNull)
          // EXACT integer log2 (binary-digit count): float log2 sits a ulp
          // from integral exactly at the bucket boundaries (gap+1 = 2^k),
          // where engines' libm may disagree and flip the floor
          .select((length(bin(col("gap_s") + 1)) - 1).cast("bigint").as("log2_gap"))
          .groupBy("log2_gap").agg(count(lit(1)).as("n"))
          .orderBy("log2_gap")
      },
      Some("""WITH g AS (SELECT CAST(floor(epoch(ts)) AS BIGINT)
             |                  - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
             |                         ORDER BY ts, event_id))) AS BIGINT) AS gap_s
             |           FROM events)
             |SELECT CAST(length(bin(gap_s + 1)) - 1 AS BIGINT) AS log2_gap,
             |       count(*) AS n
             |FROM g WHERE gap_s IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Z-score anomaly detection: events whose value sits far from their
    // type's mean in population-stddev units — the outlier-filtering /
    // monitoring shape (data-quality gates run exactly this before
    // training ingest). Group moments ride a whole-partition window frame
    // (single shuffle on event_type); the filter applies to the ROUNDED
    // score so both engines cut the same set.
    QueryDef("ts_anomaly",
      (s, d) => {
        val wf = Window.partitionBy("event_type")
        val z = (col("value") - avg(col("value")).over(wf)) /
          stddev_pop(col("value")).over(wf)
        T(s, d, "events")
          .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"),
            round(z, 3).as("zscore"))
          .filter(abs(col("zscore")) >= 2.5)
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
             |       round((e.value - g.m) / g.sd, 3) AS zscore
             |FROM events e
             |JOIN (SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
             |      FROM events GROUP BY 1) g
             |  ON e.event_type = g.event_type
             |WHERE abs(round((e.value - g.m) / g.sd, 3)) >= 2.5
             |ORDER BY e.event_id""".stripMargin)),

    // Gaps-and-islands: maximal runs of consecutive same-type events per
    // user (sessionization by ATTRIBUTE CHANGE, vs time-gap session_window).
    // The classic difference-of-row_numbers trick: rn(user) - rn(user,type)
    // is constant exactly within a run, so islands fall out of one groupBy —
    // two window passes + one aggregate, all sharing the user_id shuffle.
    // Type-2 slowly-changing-dimension build: version each user's observed
    // state (event_type) into [valid_from, valid_to) intervals with a
    // current-row flag — the warehouse-dimension shape rel_upsert's CDC
    // feeds. Runs come from the ts_islands gaps-and-islands identity; the
    // interval close is one lead() over the per-user RUN table (tiny), so
    // the only O(events) work is the two row_number windows.
    QueryDef("ts_scd2",
      (s, d) => {
        val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wTyp = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        val runs = T(s, d, "events")
          .filter(col("user_id") < 20)
          .withColumn("rn", row_number().over(wAll))
          .withColumn("rt", row_number().over(wTyp))
          .groupBy(col("user_id"), col("event_type").as("state"),
            (col("rn") - col("rt")).as("island"))
          .agg(min(col("ts")).as("from_ts"),
            min(col("event_id")).as("first_event"),
            count(lit(1)).as("n_events"))
        val wv = Window.partitionBy("user_id").orderBy(col("from_ts"), col("first_event"))
        runs
          .withColumn("to_ts", lead(col("from_ts"), 1).over(wv))
          .select(col("user_id"), col("state"), col("first_event"),
            date_format(col("from_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
            coalesce(date_format(col("to_ts"), "yyyy-MM-dd HH:mm:ss"),
              lit("9999-12-31 00:00:00")).as("valid_to"),
            col("to_ts").isNull.cast("int").as("is_current"),
            col("n_events"))
          .orderBy("user_id", "first_event")
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts, event_id) AS rn,
             |         row_number() OVER (PARTITION BY user_id, event_type
             |                            ORDER BY ts, event_id) AS rt
             |  FROM events WHERE user_id < 20),
             |runs AS (SELECT user_id, event_type AS state, rn - rt AS island,
             |                min(ts) AS from_ts, min(event_id) AS first_event,
             |                count(*) AS n_events
             |         FROM r GROUP BY 1, 2, 3),
             |v AS (SELECT user_id, state, first_event, from_ts, n_events,
             |             lead(from_ts) OVER (PARTITION BY user_id
             |                                 ORDER BY from_ts, first_event) AS to_ts
             |      FROM runs)
             |SELECT user_id, state, first_event,
             |       strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |       coalesce(strftime(to_ts, '%Y-%m-%d %H:%M:%S'),
             |                '9999-12-31 00:00:00') AS valid_to,
             |       CAST(to_ts IS NULL AS INT) AS is_current, n_events
             |FROM v ORDER BY user_id, first_event""".stripMargin)),

    QueryDef("ts_islands",
      (s, d) => {
        val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wTyp = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .filter(col("user_id") < 20)
          .withColumn("rn", row_number().over(wAll))
          .withColumn("rt", row_number().over(wTyp))
          .groupBy(col("user_id"), col("event_type"), (col("rn") - col("rt")).as("island"))
          .agg(count(lit(1)).as("run_len"),
            min(col("event_id")).as("first_event"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("run_start"))
          .select("user_id", "event_type", "run_len", "first_event", "run_start")
          .orderBy("user_id", "first_event")
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts, event_id) AS rn,
             |         row_number() OVER (PARTITION BY user_id, event_type
             |                            ORDER BY ts, event_id) AS rt
             |  FROM events WHERE user_id < 20)
             |SELECT user_id, event_type, count(*) AS run_len,
             |       min(event_id) AS first_event,
             |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS run_start
             |FROM r GROUP BY user_id, event_type, rn - rt
             |ORDER BY user_id, first_event""".stripMargin)),

    // Longest same-type streak per user: the gaps-and-islands runs reduced
    // to each user's maximum, with the streak's type carried through a
    // (len, type, first_event) struct-max — engagement/addiction metrics'
    // canonical shape. Ties break toward the lexicographically larger
    // (type, first_event), stated identically in both engines.
    QueryDef("ts_longest_streak",
      (s, d) => {
        val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wTyp = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        T(s, d, "events")
          .withColumn("rn", row_number().over(wAll))
          .withColumn("rt", row_number().over(wTyp))
          .groupBy(col("user_id"), col("event_type"), (col("rn") - col("rt")).as("island"))
          .agg(count(lit(1)).as("len"), min(col("event_id")).as("first_event"))
          .groupBy("user_id")
          .agg(max(struct(col("len"), col("event_type"), col("first_event"))).as("best"))
          .select(col("user_id"), col("best.len").as("streak_len"),
            col("best.event_type").as("streak_type"))
          .orderBy("user_id")
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts, event_id) AS rn,
             |         row_number() OVER (PARTITION BY user_id, event_type
             |                            ORDER BY ts, event_id) AS rt
             |  FROM events),
             |runs AS (SELECT user_id, event_type, count(*) AS len,
             |                min(event_id) AS first_event
             |         FROM r GROUP BY user_id, event_type, rn - rt)
             |SELECT user_id,
             |       (max({'len': len, 'event_type': event_type,
             |             'first_event': first_event})).len AS streak_len,
             |       (max({'len': len, 'event_type': event_type,
             |             'first_event': first_event})).event_type AS streak_type
             |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Forward-fill imputation (LOCF — last observation carried forward):
    // null out a deterministic subset (error events carry no reading), then
    // carry the last non-null value forward per user in event-time order via
    // last_value(IGNORE NULLS) over a growing frame — the standard
    // time-series gap-patching operator. One window pass, one shuffle on
    // user_id.
    QueryDef("ts_ffill",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, d, "events")
          .filter(col("event_id") < 2000)
          .withColumn("reading",
            when(col("event_type") =!= "error", col("value")))
          .select(col("event_id"), col("user_id"),
            round(coalesce(last(col("reading"), ignoreNulls = true).over(w),
              lit(0.0)), 2).as("filled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       round(coalesce(
             |         last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         0.0), 2) AS filled
             |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    // Point-in-time snapshot: each user's latest event at or before T — the
    // feature-store / training-cutoff shape (no future leakage). Filter
    // pushes T into the scan, then one window pass keeps row_number = 1
    // under a deterministic (ts, event_id) DESC order; Catalyst's
    // WindowGroupLimit prunes to one row per user map-side.
    QueryDef("ts_snapshot",
      (s, d) => {
        val cutoff = "2024-01-15 00:00:00"
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        T(s, d, "events")
          .filter(col("ts") <= lit(cutoff).cast("timestamp"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("last_type"),
            round(col("value"), 2).as("last_value"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_type AS last_type,
             |       round(value, 2) AS last_value,
             |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |                ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // Hourly OHLC bars per event type — the classic downsampling shape for
    // metric/tick streams. Open/close are pure SELECTIONS (row_number = 1
    // under (ts, event_id) asc/desc) rather than arithmetic, so every
    // output value is bit-exact in both engines; high/low/count are
    // order-independent aggregates. Two windows + one groupBy over the
    // same hour partition — one shuffle total, windows and final aggregate
    // share the (hr, event_type) partitioning.
    QueryDef("ts_ohlc",
      (s, d) => {
        val hr = date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm")
        val part = Window.partitionBy("hr", "event_type")
        val asc = part.orderBy(col("ts"), col("event_id"))
        val desc = part.orderBy(col("ts").desc, col("event_id").desc)
        T(s, d, "events")
          .select(hr.as("hr"), col("event_type"), col("ts"), col("event_id"), col("value"))
          .withColumn("rn", row_number().over(asc))
          .withColumn("rd", row_number().over(desc))
          .groupBy("hr", "event_type")
          .agg(max(when(col("rn") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rd") === 1, col("value"))).as("close"),
            count(lit(1)).as("n"))
          .orderBy("hr", "event_type")
      },
      Some("""WITH e AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
             |                  event_type, ts, event_id, value FROM events),
             |r AS (SELECT *,
             |             row_number() OVER (PARTITION BY hr, event_type
             |                                ORDER BY ts, event_id) AS rn,
             |             row_number() OVER (PARTITION BY hr, event_type
             |                                ORDER BY ts DESC, event_id DESC) AS rd
             |      FROM e)
             |SELECT hr, event_type,
             |       max(CASE WHEN rn = 1 THEN value END) AS open,
             |       max(value) AS high,
             |       min(value) AS low,
             |       max(CASE WHEN rd = 1 THEN value END) AS close,
             |       count(*) AS n
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Ordered conversion funnel (view -> click -> purchase): each stage's
    // entry time is the user's first qualifying event STRICTLY AFTER the
    // previous stage's entry. Stage frontiers are tiny per-user aggregates
    // (one row per user), so each refinement is a broadcast-sized join onto
    // the next stage's filtered scan — at 100 TB the event table is only
    // read once per stage, pre-filtered to that stage's type, and the
    // min-aggregates combine map-side.
    QueryDef("ts_funnel",
      (s, d) => {
        val ev = T(s, d, "events")
        def stage(evType: String, prev: org.apache.spark.sql.DataFrame,
                  prevT: String, tName: String) =
          ev.filter(col("event_type") === evType)
            .join(prev, "user_id")
            .filter(col("ts") > col(prevT))
            .groupBy("user_id").agg(min(col("ts")).as(tName))
        val viewed = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        val clicked = stage("click", viewed, "t_view", "t_click")
        val purchased = stage("purchase", clicked, "t_click", "t_purchase")
        val one = (df: org.apache.spark.sql.DataFrame, nm: String) =>
          df.agg(count(lit(1)).as(nm))
        one(viewed, "n_view")
          .crossJoin(one(clicked, "n_view_click"))
          .crossJoin(one(purchased, "n_full_funnel"))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |           WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click
             |      FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             |      FROM events e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
             |SELECT (SELECT count(*) FROM v) AS n_view,
             |       (SELECT count(*) FROM c) AS n_view_click,
             |       (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin)),

    // Weekly retention cohorts: users grouped by the ISO week of their
    // first event; each later event lands in a (cohort_week, week offset)
    // cell counted by distinct users. One small per-user aggregate (the
    // cohort map) re-joined to the event scan — the standard cohort shape;
    // distinct-user counting per cell is the only wide aggregation.
    QueryDef("ts_retention",
      (s, d) => {
        val ev = T(s, d, "events")
        val firsts = ev.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
        ev.join(firsts, "user_id")
          .select(col("cohort_week"),
            floor(datediff(col("ts").cast("date"), col("cohort_week")) / 7)
              .as("week_offset"), col("user_id"))
          .groupBy("cohort_week", "week_offset")
          .agg(count_distinct(col("user_id")).as("active_users"))
          .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"), col("active_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH f AS (SELECT user_id,
             |                  CAST(date_trunc('week', min(ts)) AS DATE) AS cw
             |           FROM events GROUP BY 1)
             |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
             |       CAST(floor(date_diff('day', f.cw, CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
             |         AS week_offset,
             |       count(DISTINCT e.user_id) AS active_users
             |FROM events e JOIN f ON e.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("fn_datetime",
      (s, d) => T(s, d, "events")
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          year(col("ts")).cast("bigint").as("yr"),
          month(col("ts")).cast("bigint").as("mo"),
          dayofmonth(col("ts")).cast("bigint").as("dom"),
          hour(col("ts")).cast("bigint").as("hr"),
          minute(col("ts")).cast("bigint").as("mi"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day_str"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("bigint").as("days_since"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |       year(ts) AS yr, month(ts) AS mo, day(ts) AS dom,
             |       hour(ts) AS hr, minute(ts) AS mi,
             |       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_str,
             |       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
             |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin)),

    // Date arithmetic family: interval add, month add (end-of-month clamped
    // in BOTH engines), last_day, quarter, ISO weekday, month truncation.
    QueryDef("fn_datetime2",
      (s, d) => T(s, d, "events")
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          date_add(col("ts").cast("date"), 30).as("plus_30d"),
          add_months(col("ts").cast("date"), 2).as("plus_2mo"),
          last_day(col("ts").cast("date")).as("month_end"),
          quarter(col("ts")).cast("bigint").as("qtr"),
          (weekday(col("ts")) + lit(1)).cast("bigint").as("isodow"),
          trunc(col("ts").cast("date"), "MM").as("month_start"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |       CAST(ts AS DATE) + INTERVAL 30 DAY AS plus_30d,
             |       CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
             |       last_day(CAST(ts AS DATE)) AS month_end,
             |       quarter(ts) AS qtr,
             |       isodow(ts) AS isodow,
             |       CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month_start
             |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin)),

    QueryDef("fn_json",
      (s, d) => T(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k_struct"))
        .withColumn("k_bucket", col("k") % 10)
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
             |FROM events ORDER BY event_id""".stripMargin)),

    // VariantType battery (Spark 4's semi-structured column type — the
    // schema-on-read replacement for stringly JSON): try_parse_json over a
    // closed-form JSON doc with a deterministic 2.5% corrupt slice,
    // variant_get typed path extraction (incl. a nested path), and
    // try_variant_get on a missing path. A failed parse yields a NULL
    // variant whose extractions are all NULL — the dirty-feed contract.
    // The oracle replays every value from the source columns.
    QueryDef("fn_variant",
      (s, d) => {
        val js = concat(lit("{\"id\":"), col("event_id"),
          lit(",\"t\":\""), col("event_type"),
          lit("\",\"n\":{\"u\":"), col("user_id"), lit("}}"))
        // corruption = an UNTERMINATED string: rejected by any JSON parser
        // (a trailing-garbage suffix turned out to be tolerated by the
        // variant parser's first-value read)
        val dirty = when(col("event_id") % 40 === 0,
          concat(lit("{\"id\":"), col("event_id"), lit(",\"t\":\"broken"))).otherwise(js)
        T(s, d, "events")
          .filter(col("event_id") < 2000)
          .select(col("event_id"), try_parse_json(dirty).as("v"))
          .select(col("event_id"),
            col("v").isNull.cast("bigint").as("bad"),
            variant_get(col("v"), "$.id", "bigint").as("id_v"),
            variant_get(col("v"), "$.t", "string").as("t_v"),
            variant_get(col("v"), "$.n.u", "bigint").as("u_v"),
            try_variant_get(col("v"), "$.nope", "bigint").as("miss"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |       CAST(CASE WHEN event_id % 40 = 0 THEN 1 ELSE 0 END AS BIGINT) AS bad,
             |       CASE WHEN event_id % 40 = 0 THEN NULL ELSE event_id END AS id_v,
             |       CASE WHEN event_id % 40 = 0 THEN NULL ELSE event_type END AS t_v,
             |       CASE WHEN event_id % 40 = 0 THEN NULL ELSE user_id END AS u_v,
             |       CAST(NULL AS BIGINT) AS miss
             |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    // Map-typed column battery: construct, extract, merge, keys/values,
    // entry iteration — the metadata-bag shape (typed per-record key/value
    // attributes) multimodal and feature-store schemas carry. The ORACLE
    // needs no maps at all: every output is a scalar whose value is known
    // from the source columns, so DuckDB recomputes them directly — the
    // point under test is Spark's map surface, not map SQL portability.
    QueryDef("fn_map",
      (s, d) => {
        val m = map(lit("qty"), col("l_quantity"),
          lit("price"), col("l_extendedprice"))
        T(s, d, "lineitem")
          .filter(col("l_orderkey") < 200)
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            element_at(m, "qty").as("qty"),
            size(m).cast("bigint").as("n_keys"),
            concat_ws(",", array_sort(map_keys(m))).as("keys"),
            element_at(map_concat(m, map(lit("disc"), col("l_discount"))), "disc")
              .as("disc"),
            aggregate(map_values(map_filter(m, (k, _) => k =!= "price")),
              lit(0.0), (a, x) => a + x).as("qty_again"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |       l_quantity AS qty,
             |       CAST(2 AS BIGINT) AS n_keys,
             |       'price,qty' AS keys,
             |       l_discount AS disc,
             |       l_quantity AS qty_again
             |FROM lineitem WHERE l_orderkey < 200
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef("fn_array",
      (s, d) => {
        val t = split(col("text"), " ")
        T(s, d, "documents")
          .select(col("doc_id"),
            array_join(array_sort(array_distinct(t)), ",").as("uniq_sorted"),
            size(filter(t, x => length(x) > 4)).cast("bigint").as("n_long"),
            aggregate(transform(t, x => length(x).cast("bigint")), lit(0L), (a, x) => a + x)
              .as("total_len"),
            array_contains(t, "spark").as("has_spark"),
            array_join(slice(t, 1, 3), ",").as("first3"),
            element_at(t, 1).as("first_tok"),
            size(zip_with(t, reverse(t), (a, b) => concat(a, b))).cast("bigint").as("n_zipped"))
          .orderBy("doc_id")
      },
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
             |SELECT doc_id,
             |       array_to_string(list_sort(list_distinct(t)), ',') AS uniq_sorted,
             |       CAST(len(list_filter(t, x -> length(x) > 4)) AS BIGINT) AS n_long,
             |       CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_len,
             |       list_contains(t, 'spark') AS has_spark,
             |       array_to_string(t[1:3], ',') AS first3,
             |       t[1] AS first_tok,
             |       CAST(len(t) AS BIGINT) AS n_zipped
             |FROM tt ORDER BY doc_id""".stripMargin)),

    // Point-in-time (PIT) dimension join — the warehouse query every SCD2
    // build exists to serve: enrich each fact row with the dimension
    // version VALID AT the fact's own timestamp (here: each purchase with
    // the marketing-touch state in effect when it happened). Because SCD2
    // versions tile each key's timeline contiguously, "the version whose
    // [valid_from, valid_to) interval contains fact.ts" is exactly a
    // backward as-of join on valid_from — so the native single-pass as-of
    // operator executes it with NO interval predicate, no range join, no
    // window over the fact table. The oracle deliberately states the
    // BETWEEN-interval form (LEFT JOIN on from <= ts < to), pinning the
    // run-tiling equivalence itself. Ties between two versions' from_ts
    // (same user, same instant) would make the earlier interval empty;
    // event timestamps are collision-free here and the as-of payload
    // tie-break picks the later version — the same row the interval form
    // keeps.
    QueryDef("ts_pit_join",
      (s, d) => {
        val ev = T(s, d, "events")
        val touches = ev.filter(col("event_type").isin("view", "click"))
        val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wTyp = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        val dim = touches
          .withColumn("rn", row_number().over(wAll))
          .withColumn("rt", row_number().over(wTyp))
          .groupBy(col("user_id").as("d_user"), col("event_type").as("d_state"),
            (col("rn") - col("rt")).as("island"))
          .agg(min(col("ts")).as("d_from"), min(col("event_id")).as("d_first"))
          .select("d_user", "d_state", "d_from", "d_first")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        AsofJoin.asofNative(purchases, dim, "user_id", "d_user", "ts", "d_from")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_time"),
            col("d_state").as("state_at_purchase"),
            col("d_first").as("state_version"))
          .orderBy("event_id")
      },
      Some("""WITH t AS (SELECT user_id, event_type, ts, event_id FROM events
             |           WHERE event_type IN ('view', 'click')),
             |r AS (SELECT user_id, event_type, ts, event_id,
             |             row_number() OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS rn,
             |             row_number() OVER (PARTITION BY user_id, event_type
             |                                ORDER BY ts, event_id) AS rt
             |      FROM t),
             |runs AS (SELECT user_id, event_type AS state, rn - rt AS island,
             |                min(ts) AS from_ts, min(event_id) AS first_event
             |         FROM r GROUP BY 1, 2, 3),
             |v AS (SELECT user_id, state, first_event, from_ts,
             |             lead(from_ts) OVER (PARTITION BY user_id
             |                                 ORDER BY from_ts, first_event) AS to_ts
             |      FROM runs)
             |SELECT p.event_id AS event_id, p.user_id AS user_id,
             |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_time,
             |       v.state AS state_at_purchase,
             |       v.first_event AS state_version
             |FROM (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'purchase') p
             |LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.from_ts
             |           AND (v.to_ts IS NULL OR p.ts < v.to_ts)
             |ORDER BY event_id""".stripMargin))
  )
}
