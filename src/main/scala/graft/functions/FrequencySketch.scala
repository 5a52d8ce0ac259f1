package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency (Count-Min) sketch — completing the mergeable-sketch
  * family: HLL for distinct counts (rel_hll_merge), KLL for quantiles
  * (rel_quantile_merge), CMS for per-key frequencies. The 100 TB shape is
  * identical: one bounded-size sketch per shard, shards rolled up by sketch
  * MERGE (cell-wise counter addition — exact, commutative, associative), any
  * key's frequency estimated from the merged sketch without re-touching raw
  * rows.
  *
  * Spark SHIPS the sketch (`org.apache.spark.util.sketch.CountMinSketch`,
  * also behind SQL's `count_min_sketch` aggregate) but exposes no MERGE
  * aggregate for rolling shard sketches up — cmsMergeAgg fills that slot,
  * the way hll_union_agg does for HLL. Estimates are deterministic given
  * (eps, confidence, seed) and the guarantee is one-sided: estimate >=
  * true count, and <= true + eps * totalCount with probability
  * `confidence` — the query band-checks exactly that.
  */
object FrequencySketch {

  val DefaultEps = 0.001
  val DefaultConfidence = 0.99
  val DefaultSeed = 42

  private def newSketch(): CountMinSketch =
    CountMinSketch.create(DefaultEps, DefaultConfidence, DefaultSeed)

  private implicit val cmsEnc: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]

  /** Build a sketch over a long key column (combiner-style partials). */
  val cmsAgg: Aggregator[Long, CountMinSketch, Array[Byte]] =
    new Aggregator[Long, CountMinSketch, Array[Byte]] {
      def zero: CountMinSketch = newSketch()
      def reduce(b: CountMinSketch, a: Long): CountMinSketch = { b.addLong(a); b }
      def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
        b1.mergeInPlace(b2)
      def finish(b: CountMinSketch): Array[Byte] = b.toByteArray
      def bufferEncoder: Encoder[CountMinSketch] = cmsEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Roll serialized shard sketches up into one (the hll_union_agg twin —
    * Spark has no built-in CMS merge aggregate).
    */
  val cmsMergeAgg: Aggregator[Array[Byte], CountMinSketch, Array[Byte]] =
    new Aggregator[Array[Byte], CountMinSketch, Array[Byte]] {
      def zero: CountMinSketch = newSketch()
      def reduce(b: CountMinSketch, a: Array[Byte]): CountMinSketch =
        b.mergeInPlace(CountMinSketch.readFrom(a))
      def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
        b1.mergeInPlace(b2)
      def finish(b: CountMinSketch): Array[Byte] = b.toByteArray
      def bufferEncoder: Encoder[CountMinSketch] = cmsEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  def cms_agg(c: Column): Column = udaf(cmsAgg, Encoders.scalaLong).apply(c)
  def cms_merge_agg(c: Column): Column = udaf(cmsMergeAgg, Encoders.BINARY).apply(c)

  /** Estimated frequency of `key` — scalar udf over the (one) merged-sketch
    * row, never on the raw-data hot path.
    */
  // null-safe: reference-typed udf params are NOT null-skipped by Spark,
  // so a NULL sketch (e.g. an unmatched left-join row) must map to NULL,
  // not an NPE that fails the query
  def cms_estimate(c: Column, key: Long): Column =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      Option(b).map(CountMinSketch.readFrom(_).estimateCount(key))).apply(c)

  def cms_total(c: Column): Column =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      Option(b).map(CountMinSketch.readFrom(_).totalCount())).apply(c)
}
