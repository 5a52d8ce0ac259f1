package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
  * The hot path is MUTABLE: the Aggregator buffer is an Array-backed
  * [[SketchBuffer]] whose add is an array store + counter bump with in-place
  * sort-and-promote compaction every k rows (amortized O(log k) per row, zero
  * per-row allocation). The Aggregator API permits this — reduce/merge may
  * mutate and return the same buffer object; serialization happens only at
  * shuffle boundaries. The immutable [[Sketch]] view exists for the spec's
  * invariant checks, not for execution.
  *
  * The wire format (finish output) is an explicit versioned binary encoding —
  * version byte, k, count, parity, per-level lengths + doubles — so persisted
  * shard sketches (the 100 TB rollup story) stay readable across JVM/Scala
  * upgrades, unlike Java object serialization.
  *
  * Spark 4 ships approx_percentile (positional sketch) but exposes no
  * MERGEABLE quantile state the way hll_sketch_agg/hll_union_agg pair up —
  * sketchAgg/sketchMergeAgg fill exactly that slot, as typed Aggregators
  * (SURVEY §7.3's optional TypedImperativeAggregate; a typed Aggregator is
  * the public-API form and Catalyst still runs it with map-side partials).
  */
object QuantileSketch {

  val DefaultK = 256

  /** Mutable compactor stack. `items(i)(0 until sizes(i))` holds the unsorted
    * items of weight 2^i; parity bit i is the next compaction's survivor
    * offset at level i. count is exact. No-arg constructor + plain fields
    * keep it Kryo-friendly for the Aggregator buffer encoder.
    */
  final class SketchBuffer(val k: Int) extends Serializable {
    def this() = this(DefaultK)

    private[functions] var count: Long = 0L
    private[functions] var parity: Long = 0L
    private[functions] var numLevels: Int = 1
    private[functions] var items: Array[Array[Double]] = Array(new Array[Double](k))
    private[functions] var sizes: Array[Int] = new Array[Int](1)

    def totalCount: Long = count

    /** Append one item (weight 1) and compact if level 0 filled. */
    def add(x: Double): this.type = {
      if (sizes(0) >= items(0).length) growLevel(0, sizes(0) + 1)
      items(0)(sizes(0)) = x
      sizes(0) += 1
      count += 1
      if (sizes(0) >= k) compact()
      this
    }

    /** In-place merge: concatenate per-level item runs, xor parities, then
      * compact any level the concat pushed to >= k.
      */
    def merge(o: SketchBuffer): this.type = {
      require(k == o.k, s"cannot merge sketches with different k: $k vs ${o.k}")
      var i = 0
      while (i < o.numLevels) {
        if (o.sizes(i) > 0) {
          ensureLevel(i)
          growLevel(i, sizes(i) + o.sizes(i))
          System.arraycopy(o.items(i), 0, items(i), sizes(i), o.sizes(i))
          sizes(i) += o.sizes(i)
        }
        i += 1
      }
      count += o.count
      parity ^= o.parity
      compact()
      this
    }

    /** Deep copy (spec aid — lets associativity tests reuse inputs). */
    def copy(): SketchBuffer = {
      val c = new SketchBuffer(k)
      c.count = count; c.parity = parity; c.numLevels = numLevels
      c.items = items.take(numLevels).map(_.clone())
      c.sizes = sizes.clone()
      c
    }

    /** Promote every over-full level bottom-up: sort in place, collapse each
      * adjacent pair to the parity-selected survivor at double weight (an odd
      * leftover stays put, preserving total weight exactly), flip the level's
      * parity. Levels below i never refill during the sweep, so one upward
      * pass suffices.
      */
    private def compact(): Unit = {
      var i = 0
      while (i < numLevels) {
        if (sizes(i) >= k) {
          val sz = sizes(i)
          java.util.Arrays.sort(items(i), 0, sz)
          val off = ((parity >> i) & 1L).toInt
          val nKept = sz / 2
          ensureLevel(i + 1)
          growLevel(i + 1, sizes(i + 1) + nKept)
          val src = items(i)
          val dst = items(i + 1)
          var j = 0
          var d = sizes(i + 1)
          while (j < nKept) { dst(d) = src(2 * j + off); d += 1; j += 1 }
          sizes(i + 1) = d
          if (sz % 2 == 1) { src(0) = src(sz - 1); sizes(i) = 1 } else sizes(i) = 0
          parity ^= (1L << i)
        }
        i += 1
      }
    }

    private def ensureLevel(i: Int): Unit = {
      if (i >= numLevels) {
        if (i >= items.length) {
          val cap = math.max(items.length * 2, i + 1)
          items = java.util.Arrays.copyOf(items, cap)
          sizes = java.util.Arrays.copyOf(sizes, cap)
        }
        var j = numLevels
        while (j <= i) {
          if (items(j) == null) items(j) = new Array[Double](k)
          sizes(j) = 0
          j += 1
        }
        numLevels = i + 1
      }
    }

    private def growLevel(i: Int, need: Int): Unit =
      if (need > items(i).length)
        items(i) = java.util.Arrays.copyOf(items(i), math.max(need, items(i).length * 2))

    /** Immutable view for invariant checks (trims capacity, keeps order). */
    def toSketch: Sketch =
      Sketch(k, count,
        Vector.tabulate(numLevels)(i => items(i).take(sizes(i)).toVector), parity)
  }

  /** Immutable value view of a compactor stack — spec-facing only. */
  final case class Sketch(k: Int, count: Long, levels: Vector[Vector[Double]],
                          parity: Long) extends Serializable

  def newBuffer(k: Int = DefaultK): SketchBuffer = new SketchBuffer(k)

  /** Total weight carried by the sketch — an exact invariant equal to count
    * (pair-collapse preserves weight; the spec asserts it).
    */
  def totalWeight(b: SketchBuffer): Long = {
    var acc = 0L
    var i = 0
    while (i < b.numLevels) { acc += b.sizes(i).toLong << i; i += 1 }
    acc
  }

  def totalWeight(s: Sketch): Long =
    s.levels.zipWithIndex.map { case (lv, i) => lv.size.toLong << i }.sum

  /** Estimate the q-quantile: walk the weighted items in value order until
    * the cumulative weight reaches ceil(q * count).
    */
  def quantile(b: SketchBuffer, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    if (b.count == 0) return Double.NaN
    val pairs = for {
      i <- 0 until b.numLevels
      j <- 0 until b.sizes(i)
    } yield (b.items(i)(j), 1L << i)
    val sorted = pairs.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * b.count).toLong)
    var acc = 0L
    sorted.find { case (_, w) => acc += w; acc >= target }
      .map(_._1).getOrElse(sorted.last._1)
  }

  /** Versioned binary wire format: [version:1][k][count][parity][numLevels]
    * then per level [size][doubles...]. Deterministic and JVM-independent.
    */
  private[functions] val WireVersion: Byte = 1

  def ser(b: SketchBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(WireVersion)
    out.writeInt(b.k)
    out.writeLong(b.count)
    out.writeLong(b.parity)
    out.writeInt(b.numLevels)
    var i = 0
    while (i < b.numLevels) {
      out.writeInt(b.sizes(i))
      var j = 0
      while (j < b.sizes(i)) { out.writeDouble(b.items(i)(j)); j += 1 }
      i += 1
    }
    out.close()
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): SketchBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readByte()
    require(v == WireVersion, s"unknown sketch wire version $v")
    val b = new SketchBuffer(in.readInt())
    b.count = in.readLong()
    b.parity = in.readLong()
    val n = in.readInt()
    b.items = new Array[Array[Double]](n)
    b.sizes = new Array[Int](n)
    b.numLevels = n
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val lv = new Array[Double](math.max(sz, b.k))
      var j = 0
      while (j < sz) { lv(j) = in.readDouble(); j += 1 }
      b.items(i) = lv
      b.sizes(i) = sz
      i += 1
    }
    b
  }

  private implicit val bufEnc: Encoder[SketchBuffer] = Encoders.kryo[SketchBuffer]

  /** Build a sketch over a double column (combiner-style: map-side partial
    * sketches merged at the reducer). Emits the serialized sketch.
    */
  val sketchAgg: Aggregator[Double, SketchBuffer, Array[Byte]] =
    new Aggregator[Double, SketchBuffer, Array[Byte]] {
      def zero: SketchBuffer = newBuffer()
      def reduce(b: SketchBuffer, a: Double): SketchBuffer = b.add(a)
      def merge(b1: SketchBuffer, b2: SketchBuffer): SketchBuffer = b1.merge(b2)
      def finish(b: SketchBuffer): Array[Byte] = ser(b)
      def bufferEncoder: Encoder[SketchBuffer] = bufEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Roll serialized shard sketches up into one (the hll_union_agg twin). */
  val sketchMergeAgg: Aggregator[Array[Byte], SketchBuffer, Array[Byte]] =
    new Aggregator[Array[Byte], SketchBuffer, Array[Byte]] {
      def zero: SketchBuffer = newBuffer()
      def reduce(b: SketchBuffer, a: Array[Byte]): SketchBuffer = b.merge(deser(a))
      def merge(b1: SketchBuffer, b2: SketchBuffer): SketchBuffer = b1.merge(b2)
      def finish(b: SketchBuffer): Array[Byte] = ser(b)
      def bufferEncoder: Encoder[SketchBuffer] = bufEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Column forms. `sketch_quantile` is a scalar udf — it runs on the
    * post-rollup rows (one per group), never on the raw-data hot path.
    */
  def sketch_agg(c: Column): Column = udaf(sketchAgg, Encoders.scalaDouble).apply(c)
  def sketch_merge_agg(c: Column): Column =
    udaf(sketchMergeAgg, Encoders.BINARY).apply(c)
  def sketch_quantile(c: Column, q: Double): Column =
    // null-safe (reference-typed udf params are not null-skipped): a NULL
    // sketch row yields NULL, not an NPE
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      Option(b).map(bs => quantile(deser(bs), q))).apply(c)
}
