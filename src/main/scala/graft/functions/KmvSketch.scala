package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-value sketch — the theta-sketch core
  * (Bar-Yossef et al. 2002 "Counting distinct elements in a data stream";
  * Beyer et al. 2007 for the unbiased (k-1)·M/m_k estimator; the Apache
  * DataSketches theta family popularized the set-algebra form): keep the k
  * smallest DISTINCT values of a uniform hash over the elements; with m_k
  * the k-th smallest, n is estimated by (k-1)·M/m_k. Unlike HLL
  * (rel_hll_merge), a KMV/theta sketch supports INTERSECTION and
  * DIFFERENCE estimates directly — the retained values are a uniform
  * sample of the element space below a known threshold theta, so any set
  * expression over the retained sets scales by M/theta — which is exactly
  * what rel_hll_intersect's inclusion-exclusion cannot give for A\B.
  *
  * Mergeable: the union of two sketches' value sets re-capped to k is
  * precisely the sketch of the union — map-side combine works, so at
  * 100 TB the cost per group is one scan + one shuffle of one <= k-long
  * row, the same contract as the KLL/HLL/CMS aggregators in this package.
  *
  * Determinism: the buffer is a bounded sorted SET, so insertion and
  * merge order never change the result — any partitioning yields the
  * byte-identical sketch — and all downstream estimate math is exact
  * integer division. The hash is supplied by the CALLER as a column
  * expression (the affine-mod-prime hash both engines can state), which
  * is what makes the whole sketch replayable in ANSI SQL: the oracle
  * recomputes it with a window rank over the same hash.
  */
object KmvSketch {

  /** Default retention; at k = 64 the relative standard error of the
    * distinct estimate is ~1/sqrt(k-2) ≈ 13%.
    */
  val DefaultK = 64

  /** Bounded sorted set of the k smallest distinct hash values seen. */
  final class KmvBuffer(val k: Int) extends Serializable {
    def this() = this(DefaultK)
    val vals: scala.collection.mutable.TreeSet[Long] =
      scala.collection.mutable.TreeSet.empty[Long]
    def add(h: Long): this.type = {
      if (vals.size < k) vals += h
      else if (h < vals.last) {
        vals += h
        if (vals.size > k) vals -= vals.last
      }
      this
    }
    def merge(o: KmvBuffer): this.type = { o.vals.foreach(add); this }
  }

  private implicit val bufEnc: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]

  /** Sketch a hash column (map-side partial buffers, reducer merge).
    * Emits the ascending retained values; estimate math stays in SQL.
    */
  val kmvAgg: Aggregator[Long, KmvBuffer, Seq[Long]] =
    new Aggregator[Long, KmvBuffer, Seq[Long]] {
      def zero: KmvBuffer = new KmvBuffer(DefaultK)
      def reduce(b: KmvBuffer, a: Long): KmvBuffer = b.add(a)
      def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = a.merge(b)
      def finish(b: KmvBuffer): Seq[Long] = b.vals.toSeq
      def bufferEncoder: Encoder[KmvBuffer] = bufEnc
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Column form: ascending array of the k smallest distinct hashes. */
  def kmv_agg(c: Column): Column = udaf(kmvAgg, Encoders.scalaLong).apply(c)
}
