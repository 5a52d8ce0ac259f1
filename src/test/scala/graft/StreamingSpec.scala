package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("windowed counts over a memory stream match batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(events, windowLen = "10 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(date_format($"window_start", "HH:mm").as("w"), $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("00:00", "click", 2L), ("00:10", "view", 1L)))
    } finally q.stop()
  }

  test("sliding windows over a memory stream assign events to every hop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(events, windowLen = "10 minutes",
        slide = Some("5 minutes"))
      .writeStream.format("memory").queryName("slide_counts").outputMode("complete").start()
    try {
      input.addData((ts(7), "click", 1.0), (ts(12), "click", 2.0))
      q.processAllAvailable()
      val got = spark.table("slide_counts")
        .select(date_format($"window_start", "HH:mm").as("w"), $"n")
        .as[(String, Long)].collect().toSet
      // event@7 -> windows starting 00:00, 00:05; event@12 -> 00:05, 00:10
      assert(got == Set(("00:00", 1L), ("00:05", 2L), ("00:10", 1L)))
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = EventStreams.sessionCounts(events, gap = "5 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // user 1: events at 00:01, 00:03 (one session), 00:20 (new session)
      input.addData((ts(1), 1L), (ts(3), 1L), (ts(20), 1L), (ts(2), 2L))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select($"user_id", $"n_events").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(got == Map(1L -> Seq(1L, 2L), 2L -> Seq(1L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks within the span, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val purchases = pIn.toDF().toDF("p_id", "user_id", "p_ts")
    val clicks = cIn.toDF().toDF("c_id", "c_user_id", "c_ts")
    val q = EventStreams.intervalJoin(purchases, clicks)
      .select($"p_id", $"c_id")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      pIn.addData((100L, 1L, ts(5)), (101L, 2L, ts(5)))
      cIn.addData(
        (200L, 1L, ts(10)),  // user 1, 5 min after purchase -> match
        (201L, 1L, ts(40)),  // user 1, 35 min after -> outside 30-min span
        (202L, 2L, ts(4)),   // user 2, before the purchase -> no match
        (203L, 3L, ts(6)))   // user 3 never purchased -> no match
      q.processAllAvailable()
      val got = spark.table("ij").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 200L)))
    } finally q.stop()
  }

  test("full-outer interval join null-pads both sides once watermarks finalize") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val purchases = pIn.toDF().toDF("p_id", "user_id", "p_ts")
    val clicks = cIn.toDF().toDF("c_id", "c_user_id", "c_ts")
    val q = EventStreams.fullOuterIntervalJoin(purchases, clicks,
        watermark = "0 seconds")
      .select($"p_id", $"c_id")
      .writeStream.format("memory").queryName("foj").outputMode("append").start()
    try {
      pIn.addData(
        (100L, 1L, ts(5)),   // matched by click 200
        (101L, 2L, ts(5)))   // never clicked -> left null-pad
      cIn.addData(
        (200L, 1L, ts(10)),  // user 1, in span -> match
        (201L, 3L, ts(6)))   // user 3 never purchased -> right null-pad
      q.processAllAvailable()
      // advance BOTH watermarks far past every row's eviction bound (the
      // global watermark is the MIN of the two sides) so the unmatched
      // state on each side is provably final and emits null-padded
      pIn.addData((900L, 9L, ts(600)))
      cIn.addData((901L, 9L, ts(601)))
      q.processAllAvailable()
      val got = spark.table("foj")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(Set[(Option[Long], Option[Long])](
        (Some(100L), Some(200L)),     // the match
        (Some(101L), None),           // unclicked purchase
        (None, Some(201L))            // purchase-less click
      ).subsetOf(got), got)
    } finally q.stop()
  }

  test("semi interval join emits eagerly on first match, never on absence") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val purchases = pIn.toDF().toDF("p_id", "user_id", "p_ts")
    val clicks = cIn.toDF().toDF("c_id", "c_user_id", "c_ts")
    val q = EventStreams.semiIntervalJoin(purchases, clicks,
        watermark = "0 seconds")
      .select($"p_id")
      .writeStream.format("memory").queryName("semij").outputMode("append").start()
    try {
      pIn.addData(
        (100L, 1L, ts(5)),  // clicked -> emits on the click, no horizon wait
        (101L, 2L, ts(5)))  // never clicked -> never emits
      cIn.addData(
        (200L, 1L, ts(10)),
        (201L, 1L, ts(12))) // second click must NOT re-emit purchase 100
      q.processAllAvailable()
      // eager: the match is already out BEFORE any watermark-advancing
      // sentinel rows arrive
      assert(spark.table("semij").as[Long].collect().toSeq == Seq(100L))
      pIn.addData((900L, 9L, ts(600)))
      cIn.addData((901L, 10L, ts(601)))
      q.processAllAvailable()
      // absence is silence: the unmatched purchase still never emitted
      assert(spark.table("semij").as[Long].collect().toSeq == Seq(100L))
    } finally q.stop()
  }

  test("chained window rollup stacks two stateful aggs and counts non-empty sub-windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.chainedWindowRollup(events, watermark = "0 seconds")
      .writeStream.format("memory").queryName("chained").outputMode("append").start()
    try {
      // hour 00: events in 15-min buckets 00:00 (x2), 00:15, 00:45 ->
      // n=4, n_subwindows=3 (bucket 00:30 empty)
      input.addData(
        (ts(1), "click", 1.0), (ts(5), "click", 2.0),
        (ts(20), "click", 3.0), (ts(50), "click", 4.0))
      q.processAllAvailable()
      // push the watermark past hour 00's end so BOTH stateful operators
      // evict: the inner one emits the closed 15-min partials, the outer
      // consumes them in the same batch and emits the closed hour
      input.addData((Timestamp.valueOf("2024-01-01 02:05:00"), "view", 0.5))
      q.processAllAvailable()
      val got = spark.table("chained")
        .select(date_format($"window_start", "HH:mm").as("h"),
          $"event_type", $"n", $"n_subwindows", $"sum_value")
        .as[(String, String, Long, Long, Double)].collect().toSet
      assert(got == Set(("00:00", "click", 4L, 3L, 10.0)), got)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    try {
      input.addData((1L, 2.0), (1L, 3.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 5.0))
      q.processAllAvailable()
      val rows = spark.table("totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 3L, 10.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("transformWithState (RocksDB) reproduces the mapGroupsWithState totals") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Double)]
    val q = EventStreams.runningUserTotalsTws(input.toDS())
      .writeStream.format("memory").queryName("totals_tws").outputMode("update").start()
    try {
      input.addData((1L, 2.0), (1L, 3.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 5.0))
      q.processAllAvailable()
      val rows = spark.table("totals_tws")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 3L, 10.0), (2L, 1L, 1.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("TTL timers evict idle keys, re-arm on activity, and state shrinks across restart") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val inDir = java.nio.file.Files.createTempDirectory("ttlin")
    val outDir = java.nio.file.Files.createTempDirectory("ttlout").toString + "/out"
    val ckDir = java.nio.file.Files.createTempDirectory("ttlck").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, value DOUBLE, ts TIMESTAMP")
    val base = 1700000000000L
    def t(s: Long) = new Timestamp(base + s * 1000)
    def write(name: String, rows: Seq[(Long, Double, Timestamp)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("ttlstage")
      rows.toDF("user_id", "value", "ts").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, inDir.resolve(name))
    }
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir.toString)
        .withWatermark("ts", "0 seconds")
        .as[(Long, Double, Timestamp)]
      EventStreams.userTotalsWithTtl(src, ttlMs = 10000L)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[EventStreams.UserActivity],
                       _: Long) => b.write.mode("append").parquet(outDir))
        .option("checkpointLocation", ckDir).outputMode("update").start()
    }
    try {
      // b1: u1,u2 idle from t0; u3 from t5 -> timers 10s,10s,15s
      write("b1.parquet", Seq((1L, 1.0, t(0)), (2L, 2.0, t(0)), (3L, 3.0, t(5))))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // b2 (same run dir, restarted query): u2 re-arms to 30s, u5 arrives;
      // wm -> 20s, so u1 (10s <= 20s) and u3 (15s) evict — u2 does NOT
      // (the re-arm in this same batch deleted its 10s timer first)
      write("b2.parquet", Seq((2L, 5.0, t(20)), (5L, 7.0, t(20))))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val mid = spark.read.parquet(outDir)
        .filter($"evicted").select($"user_id").as[Long].collect().toSet
      assert(mid == Set(1L, 3L), s"after restart+b2, evicted = $mid")
      // b3: u5 event at exactly 30s -> wm == u2's 30s timer: the boundary
      // is NON-STRICT (expiry <= watermark fires) — this tie pins the
      // semantics the st_ttl oracle replays
      write("b3.parquet", Seq((5L, 1.0, t(30))))
      val q3 = start()
      try {
        q3.processAllAvailable()
        val ev = spark.read.parquet(outDir)
          .filter($"evicted").select($"user_id").as[Long].collect().toSet
        assert(ev == Set(1L, 2L, 3L), s"tie at wm==expiry must fire: $ev")
        // eviction record carries the key's FINAL totals (2 events, 7.0)
        val u2row = spark.read.parquet(outDir)
          .filter($"evicted" && $"user_id" === 2L)
          .as[EventStreams.UserActivity].collect().toSeq
        assert(u2row == Seq(EventStreams.UserActivity(2L, 2L, 7.0, true)), u2row)
        // state SHRANK to the one live key (u5) — the TTL's whole point
        val stateRows = q3.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(stateRows == 1L, s"state rows after evictions: $stateRows")
      } finally q3.stop()
      // no duplicate evictions across the two restarts
      val evAll = spark.read.parquet(outDir).filter($"evicted")
        .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
      assert(evAll.values.forall(_ == 1L), s"duplicate eviction records: $evAll")
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("file-source stream over the events parquet matches batch results") {
    // a real file stream source (not MemoryStream): the sf0.001 events
    // parquet read as a one-batch stream, through the same windowedCounts
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    val toTs = (df: org.apache.spark.sql.DataFrame) => Tables.normalizeTs(df)
    // FileStreamSource requires a directory — stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = toTs(spark.readStream.schema(schema).parquet(dir.toString))
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("file_win").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_win").count()
      val batch = EventStreams.windowedCounts(
        Tables.t(spark, "/root/testdata/sf0.001", "events")).count()
      assert(streamed == batch && streamed > 0)
    } finally q.stop()
  }

  test("StreamGate append emissions equal the batch twin cut at the watermark horizon") {
    // The inventory's st_windowed_counts path: run the real streaming
    // engine (file source -> watermark -> window agg -> parquet sink,
    // AvailableNow) and check the emitted set equals the BATCH windowed
    // counts restricted to windows closed by the final watermark
    // (window end <= max event time). StreamGate itself asserts
    // StreamingQueryProgress recorded processed rows.
    val d = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$d/events.parquet").schema
    val streamed = graft.streaming.StreamGate.runAppendToParquet(
        spark, s"$d/events.parquet", schema,
        df => EventStreams.windowedCounts(Tables.normalizeTs(df),
          watermark = "0 seconds"),
        "spec_win")
      .select($"window_start", $"event_type", $"n", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val events = Tables.t(spark, d, "events")
    val mx = events.agg(max($"ts")).as[Timestamp].head()
    val batch = EventStreams.windowedCounts(events)
      .filter($"window_start" + expr("INTERVAL 1 HOUR") <= lit(mx))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("parquet sink + checkpoint: restart resumes exactly-once (no duplicate output)") {
    // end-to-end readStream -> transform -> writeStream with a durable
    // checkpoint: stop the query, add more input, restart with the SAME
    // checkpoint dir — the committed first batch must not be re-emitted
    val inDir = java.nio.file.Files.createTempDirectory("ckin")
    val outDir = java.nio.file.Files.createTempDirectory("ckout").toString + "/out"
    val ckDir = java.nio.file.Files.createTempDirectory("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v DOUBLE")
    def write(name: String, rows: Seq[(Long, Double)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("stage")
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, inDir.resolve(name))
    }
    def start() = spark.readStream.schema(schema).parquet(inDir.toString)
      .withColumn("doubled", $"v" * 2)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()
    write("b1.parquet", Seq((1L, 1.0), (2L, 2.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    write("b2.parquet", Seq((3L, 3.0)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(outDir).select($"id", $"doubled")
      .as[(Long, Double)].collect().toSet
    // exactly one output row per input row across the restart
    assert(out == Set((1L, 2.0), (2L, 4.0), (3L, 6.0)))
  }

  test("streaming dedup keeps first occurrence, bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val q = EventStreams.streamingDedup(docs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData((ts(1), "alpha"), (ts(2), "beta"), (ts(3), "alpha"))
      q.processAllAvailable()
      input.addData((ts(4), "beta"), (ts(5), "gamma"))
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .select(date_format($"ts", "mm").as("m"), $"text")
        .as[(String, String)].collect().toSet
      // duplicates at 03 and 04 dropped; first occurrences survive
      assert(got == Set(("01", "alpha"), ("02", "beta"), ("05", "gamma")))
    } finally q.stop()
  }

  test("batch and streaming sessionization agree") {
    val batch = Seq((ts(1), 1L), (ts(3), 1L), (ts(20), 1L))
      .toDF("ts", "user_id")
    val sessions = EventStreams.sessionCounts(batch, gap = "5 minutes")
    assert(sessions.count() == 2)
  }

  test("upsert merge is batching-independent: n batches == one batch == batch argmax") {
    // the st_upsert merge fn: latest (ts, event_id) wins per user
    def merge(existing: org.apache.spark.sql.DataFrame,
              batch: org.apache.spark.sql.DataFrame) =
      existing.union(batch)
        .groupBy("user_id")
        .agg(max(struct($"ts", $"event_id", $"value")).as("m"))
        .select($"user_id", $"m.ts".as("ts"), $"m.event_id".as("event_id"),
          $"m.value".as("value"))
    val rows = Seq(
      (1L, ts(1), 10L, 1.0), (1L, ts(5), 11L, 2.0), (1L, ts(3), 12L, 3.0),
      (2L, ts(2), 20L, 4.0), (2L, ts(2), 21L, 5.0)) // same ts: event_id breaks tie
    val all = rows.toDF("user_id", "ts", "event_id", "value")
    val empty = all.limit(0)
    // one batch vs three batches in a different order
    val oneShot = merge(empty, all)
    val batches = Seq(rows.take(2), rows.slice(2, 4), rows.drop(4))
    val threeShot = batches.foldLeft(empty) { (state, b) =>
      merge(state, b.toDF("user_id", "ts", "event_id", "value"))
    }
    val expect = Map(1L -> 11L, 2L -> 21L) // max ts, then max event_id
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
    assert(got(oneShot) == expect && got(threeShot) == expect,
      (got(oneShot), got(threeShot)))
  }

  test("stream-static enrichment keys the window on the dim attribute") {
    val events = Seq((ts(1), 1L), (ts(2), 2L), (ts(3), 1L))
      .toDF("ts", "user_id")
    val dim = Seq((1L, "AUTO"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val out = EventStreams.enrichedWindowedCounts(events, dim)
      .select($"segment", $"n").as[(String, Long)].collect().toMap
    assert(out == Map("AUTO" -> 2L, "BUILDING" -> 1L), out)
  }

  test("StreamGate records throughput metrics for every executed tag") {
    // the r9 streaming-metrics artifact (STREAM_METRICS_r<N>.jsonl) is only
    // as good as its capture path: after a gate execution the snapshot must
    // hold real engine numbers (batches, input rows, trigger time) for the
    // tag — a refactor that silently stops populating it would otherwise
    // surface only as an empty committed artifact next round
    SparkEntry.queries("st_sliding_counts")(spark, "/root/testdata/sf0.001").count()
    val m = graft.streaming.StreamGate.metricsSnapshot.get("st_slide")
      .getOrElse(fail("no metrics captured for tag st_slide"))
    assert(m.batches >= 1 && m.inputRows > 0 && m.triggerMs > 0, m)
    assert(m.rowsPerSec > 0.0, m)
    // latency percentiles: nearest-rank over per-batch trigger times, so
    // p50 <= p95 <= the summed total, and both are real batch durations
    assert(m.p50Ms > 0 && m.p50Ms <= m.p95Ms && m.p95Ms <= m.triggerMs, m)
  }
}
