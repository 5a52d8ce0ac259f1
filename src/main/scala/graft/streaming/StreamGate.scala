package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Bridge that puts Structured Streaming executions under the batch oracle
  * gate: read a bounded parquet table as a FILE STREAM, run a streaming
  * transform to completion with `Trigger.AvailableNow`, sink the output to
  * parquet, and hand the emitted rows back as a DataFrame.
  *
  * This is the production backfill shape — the same code path (source →
  * watermark → stateful operator → sink, checkpointed, exactly-once) that an
  * unbounded deployment runs, driven over a finite input. Because the input
  * is finite, what gets EMITTED in append mode is exactly the windows whose
  * end falls at or before the final watermark (max event time − delay);
  * windows still open at end-of-input remain in (discarded) state. The
  * DuckDB oracles replay that horizon cut with a `window_end <= max(ts)`
  * predicate, so the gate checks real streaming semantics, not a batch
  * re-derivation.
  */
object StreamGate {

  /** Per-run streaming throughput, captured from the engine's own
    * `StreamingQueryProgress` after every gate execution: micro-batch
    * count, total input rows, summed trigger-execution time, and derived
    * rows/sec. The correctness gate (13 st_* shapes) said nothing about
    * SPEED until round 9 — a streaming perf regression was invisible to
    * the committed artifacts; Bench now snapshots this map into
    * STREAM_METRICS_r<N>.json per round.
    */
  final case class StreamMetrics(tag: String, batches: Int, inputRows: Long,
                                 triggerMs: Long, rowsPerSec: Double,
                                 p50Ms: Long, p95Ms: Long)

  private val lastMetrics = TrieMap.empty[String, StreamMetrics]

  /** Latest metrics per gate tag (a re-run of the same tag overwrites, so
    * the snapshot reflects the most recent — for Bench, the timed-sfDir —
    * execution of each shape).
    */
  def metricsSnapshot: Map[String, StreamMetrics] = lastMetrics.toMap

  /** FileStreamSource lists a directory; the testdata tables are single
    * parquet FILES. Stage via symlink (fallback: copy) into a temp dir —
    * cached per source path, so the four st_* queries (and bench repeats)
    * share one staging instead of re-staging per query. Temp dirs are
    * JVM-exit-cleaned via [[graft.sources.TempDirs]].
    */
  private val staged = TrieMap.empty[String, String]

  private def stageDir(srcParquet: String): String =
    staged.getOrElseUpdate(srcParquet, {
      val dir = graft.sources.TempDirs.create("graft_stream_in")
      val target = dir.resolve(Paths.get(srcParquet).getFileName)
      try Files.createSymbolicLink(target, Paths.get(srcParquet))
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        Files.copy(Paths.get(srcParquet), target)
      }
      dir.toString
    })

  /** Run one streaming query to completion and read back the parquet sink.
    * The sink is read with the transform's OWN output schema: a query whose
    * windows are all still open at end-of-input legitimately emits zero
    * rows, and a schema-less read of the empty sink dir would throw
    * "unable to infer schema" instead of returning the empty result.
    */
  private def execute(spark: SparkSession, srcParquet: String,
                      schema: org.apache.spark.sql.types.StructType,
                      transform: DataFrame => DataFrame, tag: String,
                      sink: (DataFrame, String) => org.apache.spark.sql.streaming.DataStreamWriter[Row],
                      inDir: Option[String] = None,
                      readOptions: Map[String, String] = Map.empty)
      : DataFrame = {
    val in = inDir.getOrElse(stageDir(srcParquet))
    val out = graft.sources.TempDirs.create(s"graft_${tag}_out").toString
    val stream = spark.readStream.schema(schema).options(readOptions).parquet(in)
    val transformed = transform(stream)
    val dataDir = s"$out/data"
    Files.createDirectories(Paths.get(dataDir))
    // Stateful operators commit one state store (several for a
    // stream-stream join) per SHUFFLE PARTITION per batch; at the gate's
    // test-data scale 32 partitions are pure checkpoint overhead (a
    // stream-stream join measured 13s at 32 partitions vs 3s at 8). Size
    // state partitioning to the input for the query's duration — at
    // production scale this is the knob you'd set LARGE for the same
    // reason. Results are partition-count-independent.
    val partsKey = "spark.sql.shuffle.partitions"
    // The set/restore of a session-GLOBAL conf is serialized on this
    // object: two concurrent gate runs would otherwise save each other's
    // temporary "8" as prev and leave it permanent (and any batch query
    // planned inside the window would silently run at 8 partitions).
    // recentProgress is a RING buffer capped by this conf (default 100):
    // a run past 100 micro-batches would silently drop its oldest progress
    // events, and both the execution-proof require and the throughput
    // metrics below would undercount. 10000 is two orders past any gate
    // shape (AvailableNow over bounded testdata); a TRULY unbounded
    // deployment would accumulate via a StreamingQueryListener instead.
    val progKey = "spark.sql.streaming.numRecentProgressUpdates"
    StreamGate.synchronized {
      val prevParts = spark.conf.get(partsKey)
      val prevProg = spark.conf.get(progKey)
      spark.conf.set(partsKey, "8")
      spark.conf.set(progKey, "10000")
      try {
        val q = sink(transformed, dataDir)
          .option("checkpointLocation", s"$out/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val prog = q.recentProgress
        val inputRows = prog.map(_.numInputRows).sum
        // execution proof: zero processed rows is only legitimate when the
        // source itself is empty — don't conflate "engine didn't run" with
        // "input had no rows"
        require(inputRows > 0 ||
            spark.read.schema(schema).parquet(in).isEmpty,
          s"stream $tag reported no processed rows — not a streaming execution?")
        val durs = prog.map(p =>
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
        val trigMs = durs.sum
        // per-BATCH latency percentiles next to the aggregate throughput:
        // rows/sec alone hides a tail batch (one slow state-store commit
        // among many fast batches) — the pair is the streaming SLO a
        // deployment actually alarms on. Nearest-rank over the run's
        // micro-batches (bounded by the progress ring sized above).
        val sorted = durs.sorted
        def pct(q: Double): Long =
          if (sorted.isEmpty) 0L
          else sorted(math.min(sorted.length - 1,
            math.ceil(q * sorted.length).toInt - 1).max(0))
        lastMetrics.put(tag, StreamMetrics(tag, prog.length, inputRows, trigMs,
          if (trigMs > 0) inputRows * 1000.0 / trigMs else 0.0,
          pct(0.50), pct(0.95)))
      } finally {
        spark.conf.set(partsKey, prevParts)
        spark.conf.set(progKey, prevProg)
      }
    }
    spark.read.schema(transformed.schema).parquet(dataDir)
  }

  /** Run `transform` over a parquet file stream to completion and return
    * the append-mode emissions. Fails loudly if the streaming engine did
    * not actually process rows (execution proof for the correctness gate —
    * a batch shortcut could not produce `recentProgress`).
    */
  def runAppendToParquet(spark: SparkSession, srcParquet: String,
                         schema: org.apache.spark.sql.types.StructType,
                         transform: DataFrame => DataFrame,
                         tag: String): DataFrame =
    execute(spark, srcParquet, schema, transform, tag,
      (df, dataDir) => df.writeStream
        .format("parquet").option("path", dataDir).outputMode("append"))

  /** The update-mode twin for stateful operators the parquet sink can't
    * take directly (FileStreamSink is append-only): each micro-batch's
    * update-mode output is appended to the sink parquet via `foreachBatch` —
    * the standard production sink shape for update-mode pipelines
    * (transformWithState running totals, etc.). Still a real streaming
    * execution: same source, checkpoint, trigger, and progress proof.
    */
  def runUpdateToParquet(spark: SparkSession, srcParquet: String,
                         schema: org.apache.spark.sql.types.StructType,
                         transform: DataFrame => DataFrame,
                         tag: String): DataFrame =
    execute(spark, srcParquet, schema, transform, tag,
      (df, dataDir) => df.writeStream
        .foreachBatch((batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(dataDir))
        .outputMode("update"))

  /** The complete-mode third of the output-mode triad: every micro-batch
    * OVERWRITES the sink with the full recomputed result table (the
    * dashboard/materialized-view sink shape — unbounded aggregates with no
    * watermark). After the final batch the sink IS the whole-input
    * aggregate, which is exactly what the batch oracle states.
    */
  def runCompleteToParquet(spark: SparkSession, srcParquet: String,
                           schema: org.apache.spark.sql.types.StructType,
                           transform: DataFrame => DataFrame,
                           tag: String): DataFrame =
    execute(spark, srcParquet, schema, transform, tag,
      (df, dataDir) => df.writeStream
        .foreachBatch((batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(dataDir))
        .outputMode("complete"))

  private val stagedPhased = TrieMap.empty[String, (String, org.apache.spark.sql.types.StructType)]

  /** Phased-arrival gate: stage the table as one parquet file PER ARRIVAL
    * PHASE in forced order (strictly increasing mtimes + lexical names;
    * FileStreamSource lists by (mtime, path)), and run the stream with
    * `maxFilesPerTrigger = 1` so each file IS one micro-batch. This is the
    * only way to exhibit watermark LATE-DATA DROPS, which a single-batch
    * execution can never show — and it takes at least THREE phases, because
    * Spark runs two watermarks per batch: late-event FILTERING uses the
    * previous batch's watermark (so rows arriving in the same batch that
    * advances the watermark are never dropped by it), while state EVICTION
    * uses the current one. A straggler is therefore dropped only when it
    * arrives two-or-more batches after the data that closed its window.
    *
    * `assignPhase` gets the batch-read source frame and must return it with
    * one extra int column `__phase` in [0, nPhases) (dropped before
    * staging); putting the rule in a DataFrame transform keeps it
    * declarative — corpus-derived cutoffs come from a broadcast 1-row
    * aggregate, not a driver collect.
    */
  def runAppendPhased(spark: SparkSession, srcParquet: String,
                      assignPhase: DataFrame => DataFrame, nPhases: Int,
                      transform: DataFrame => DataFrame,
                      tag: String): DataFrame = {
    val (in, schema) = stagedPhased.getOrElseUpdate(s"$srcParquet#$tag", {
      val dir = Paths.get(graft.sources.TempDirs.create(s"graft_${tag}_in").toString)
      val assigned = assignPhase(spark.read.parquet(srcParquet))
      (0 until nPhases).foreach { i =>
        val tmp = graft.sources.TempDirs.create(s"graft_${tag}_stage")
        assigned.filter(org.apache.spark.sql.functions.col("__phase") === i)
          .drop("__phase").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part =
          try listing.filter(_.getFileName.toString.endsWith(".parquet"))
            .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
          finally listing.close()
        val target = dir.resolve(f"b$i%02d.parquet")
        Files.move(part, target)
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }
      (dir.toString, spark.read.parquet(dir.toString).schema)
    })
    execute(spark, srcParquet, schema, transform, tag,
      (df, dataDir) => df.writeStream
        .format("parquet").option("path", dataDir).outputMode("append"),
      inDir = Some(in), readOptions = Map("maxFilesPerTrigger" -> "1"))
  }

  /** Streaming UPSERT (merge) sink: each micro-batch is merged into the
    * keyed sink table via `merge(existing, batch)` — read-merge-overwrite,
    * the foreachBatch MERGE pattern every lakehouse streaming upsert uses
    * (`merge` must be idempotent-safe: its output replaces the table and
    * must have the same schema as `transform`'s output). The merged frame
    * is pinned with an eager localCheckpoint — which TRUNCATES lineage, so
    * even a task retry during the overwrite can never recompute from the
    * directory being rewritten (persist alone keeps lineage and would).
    */
  def runMergeToParquet(spark: SparkSession, srcParquet: String,
                        schema: org.apache.spark.sql.types.StructType,
                        transform: DataFrame => DataFrame,
                        merge: (DataFrame, DataFrame) => DataFrame,
                        tag: String): DataFrame =
    execute(spark, srcParquet, schema, transform, tag,
      (df, dataDir) => df.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val existing = batch.sparkSession.read.schema(batch.schema).parquet(dataDir)
          val merged = merge(existing, batch).localCheckpoint(true)
          try merged.write.mode("overwrite").parquet(dataDir)
          finally merged.unpersist()
        }
        .outputMode("update"))
}
