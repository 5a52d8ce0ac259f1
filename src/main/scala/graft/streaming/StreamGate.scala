package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Bridge that puts Structured Streaming executions under the batch oracle
  * gate: read a bounded parquet table as a FILE STREAM, run a streaming
  * transform to completion with `Trigger.AvailableNow`, sink the APPEND-mode
  * output to parquet, and hand the emitted rows back as a DataFrame.
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

  /** FileStreamSource lists a directory; the testdata tables are single
    * parquet FILES. Stage via symlink (fallback: copy) into a temp dir.
    */
  private def stageDir(srcParquet: String, tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_${tag}_in")
    val target = dir.resolve(Paths.get(srcParquet).getFileName)
    try Files.createSymbolicLink(target, Paths.get(srcParquet))
    catch { case _: UnsupportedOperationException | _: java.io.IOException =>
      Files.copy(Paths.get(srcParquet), target)
    }
    dir.toString
  }

  /** Run `transform` over a parquet file stream to completion and return
    * the append-mode emissions. Fails loudly if the streaming engine did
    * not actually process rows (execution proof for the correctness gate —
    * a batch shortcut could not produce `recentProgress`).
    */
  def runAppendToParquet(spark: SparkSession, srcParquet: String,
                         schema: StructType,
                         transform: DataFrame => DataFrame,
                         tag: String): DataFrame = {
    val in = stageDir(srcParquet, tag)
    val out = Files.createTempDirectory(s"graft_${tag}_out").toString
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = transform(stream).writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    require(inputRows > 0,
      s"stream $tag reported no processed rows — not a streaming execution?")
    spark.read.parquet(s"$out/data")
  }
}
