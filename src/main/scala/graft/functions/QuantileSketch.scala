package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.annotation.tailrec

/** Mergeable quantile sketch — the re-aggregation pattern for quantiles at
  * 100 TB, the way HLL sketches (rel_hll_merge) are for distinct counts:
  * build one bounded-size sketch per shard, roll shards up by sketch MERGE,
  * and estimate any quantile from the merged sketch — the raw rows are never
  * re-touched and every step is a combiner-style (partial) aggregation.
  *
  * The structure is a KLL/MRL-family compactor hierarchy: level i holds
  * items of weight 2^i; a full level is sorted and every other item is
  * promoted one level up (pairs collapse to one survivor at double weight,
  * so total weight == count is an exact invariant, checked by the spec). The
  * survivor parity alternates per level (deterministic, tracked in the
  * sketch), which bounds the signed rank drift each compaction contributes —
  * the classic deterministic variant of KLL's random coin. With k = 256 the
  * sketch is ~O(k log(n/k)) doubles regardless of n, and observed rank error
  * on 10^5-row inputs is well under 1%.
  *
  * Spark 4 ships approx_percentile (positional sketch) but exposes no
  * MERGEABLE quantile state the way hll_sketch_agg/hll_union_agg pair up —
  * sketchAgg/sketchMergeAgg fill exactly that slot, as typed Aggregators
  * (SURVEY §7.3's optional TypedImperativeAggregate; a typed Aggregator is
  * the public-API form and Catalyst still runs it with map-side partials).
  */
object QuantileSketch {

  val DefaultK = 256

  /** levels(i) holds unsorted items of weight 2^i; parity bit i is the next
    * compaction's survivor offset at level i. count is exact.
    */
  final case class Sketch(k: Int, count: Long, levels: Vector[Vector[Double]],
                          parity: Long) extends Serializable

  def empty(k: Int = DefaultK): Sketch = Sketch(k, 0L, Vector(Vector.empty), 0L)

  def add(s: Sketch, x: Double): Sketch =
    compact(s.copy(count = s.count + 1, levels = s.levels.updated(0, s.levels(0) :+ x)))

  def merge(a: Sketch, b: Sketch): Sketch = {
    require(a.k == b.k, s"cannot merge sketches with different k: ${a.k} vs ${b.k}")
    val n = math.max(a.levels.size, b.levels.size)
    val lv = Vector.tabulate(n) { i =>
      a.levels.applyOrElse(i, (_: Int) => Vector.empty[Double]) ++
        b.levels.applyOrElse(i, (_: Int) => Vector.empty[Double])
    }
    compact(Sketch(a.k, a.count + b.count, lv, a.parity ^ b.parity))
  }

  /** Promote every over-full level: sort, collapse each adjacent pair to the
    * parity-selected survivor at double weight (an odd leftover stays put,
    * preserving total weight exactly), flip the level's parity.
    */
  @tailrec private def compact(s: Sketch): Sketch = {
    val i = s.levels.indexWhere(_.size >= s.k)
    if (i < 0) s
    else {
      val sorted = s.levels(i).sorted
      val off = ((s.parity >> i) & 1L).toInt
      val kept = Vector.tabulate(sorted.size / 2)(j => sorted(2 * j + off))
      val leftover = if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
      val cleared = s.levels.updated(i, leftover)
      val lv =
        if (i + 1 < cleared.size) cleared.updated(i + 1, cleared(i + 1) ++ kept)
        else cleared :+ kept
      compact(s.copy(levels = lv, parity = s.parity ^ (1L << i)))
    }
  }

  /** Total weight carried by the sketch — an exact invariant equal to count
    * (pair-collapse preserves weight; the spec asserts it).
    */
  def totalWeight(s: Sketch): Long =
    s.levels.zipWithIndex.map { case (lv, i) => lv.size.toLong << i }.sum

  /** Estimate the q-quantile: walk the weighted items in value order until
    * the cumulative weight reaches ceil(q * count).
    */
  def quantile(s: Sketch, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    if (s.count == 0) return Double.NaN
    val sorted = (for { (lv, i) <- s.levels.zipWithIndex; x <- lv }
      yield (x, 1L << i)).sortBy(_._1)
    val target = math.max(1L, math.ceil(q * s.count).toLong)
    var acc = 0L
    sorted.find { case (_, w) => acc += w; acc >= target }
      .map(_._1).getOrElse(sorted.last._1)
  }

  private def ser(s: Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(s); oos.close()
    bos.toByteArray
  }

  private def deser(b: Array[Byte]): Sketch =
    new ObjectInputStream(new ByteArrayInputStream(b))
      .readObject().asInstanceOf[Sketch]

  private implicit val sketchEnc: Encoder[Sketch] = Encoders.kryo[Sketch]

  /** Build a sketch over a double column (combiner-style: map-side partial
    * sketches merged at the reducer). Emits the serialized sketch.
    */
  val sketchAgg: Aggregator[Double, Sketch, Array[Byte]] =
    new Aggregator[Double, Sketch, Array[Byte]] {
      def zero: Sketch = empty()
      def reduce(b: Sketch, a: Double): Sketch = add(b, a)
      def merge(b1: Sketch, b2: Sketch): Sketch = QuantileSketch.merge(b1, b2)
      def finish(b: Sketch): Array[Byte] = ser(b)
      def bufferEncoder: Encoder[Sketch] = sketchEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Roll serialized shard sketches up into one (the hll_union_agg twin). */
  val sketchMergeAgg: Aggregator[Array[Byte], Sketch, Array[Byte]] =
    new Aggregator[Array[Byte], Sketch, Array[Byte]] {
      def zero: Sketch = empty()
      def reduce(b: Sketch, a: Array[Byte]): Sketch = QuantileSketch.merge(b, deser(a))
      def merge(b1: Sketch, b2: Sketch): Sketch = QuantileSketch.merge(b1, b2)
      def finish(b: Sketch): Array[Byte] = ser(b)
      def bufferEncoder: Encoder[Sketch] = sketchEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Column forms. `sketch_quantile` is a scalar udf — it runs on the
    * post-rollup rows (one per group), never on the raw-data hot path.
    */
  def sketch_agg(c: Column): Column = udaf(sketchAgg, Encoders.scalaDouble).apply(c)
  def sketch_merge_agg(c: Column): Column =
    udaf(sketchMergeAgg, Encoders.BINARY).apply(c)
  def sketch_quantile(c: Column, q: Double): Column =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) => quantile(deser(b), q)).apply(c)
}
