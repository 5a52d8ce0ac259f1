package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.immutable.TreeSet

/** Typed Aggregators — the UDAF role of the reference's user reduce functions
  * (SURVEY §2.3/§2.4). Unlike the whole-group `mapGroups` facade, these are
  * combiner-style (associative merge), so Catalyst runs them with partial
  * aggregation: the scalable form of the two shipped reduce functions.
  */
object Aggregators {

  /** Word count's reduce — "sum of int-parsed values"
    * (/root/reference/mapreduce_wc.py:6-11) — as an associative Aggregator.
    */
  val sumLong: Aggregator[Long, Long, Long] = new Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Inverted index's reduce — distinct doc set per word
    * (/root/reference/mapreduce_inverted.py:6-11) — as an Aggregator with a
    * sorted-set buffer (the reference's `list(set(...))` is unordered; we
    * sort for determinism, SURVEY §2.2).
    */
  val distinctSorted: Aggregator[String, TreeSet[String], Seq[String]] =
    new Aggregator[String, TreeSet[String], Seq[String]] {
      def zero: TreeSet[String] = TreeSet.empty[String]
      def reduce(b: TreeSet[String], a: String): TreeSet[String] = b + a
      def merge(b1: TreeSet[String], b2: TreeSet[String]): TreeSet[String] = b1 ++ b2
      def finish(b: TreeSet[String]): Seq[String] = b.toSeq
      def bufferEncoder: Encoder[TreeSet[String]] = Encoders.kryo[TreeSet[String]]
      def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }

  /** Scale-0 round-half-away-from-zero on the double's EXACT value — what
    * both Spark SQL round(x) (BigDecimal HALF_UP) and DuckDB round(x)
    * (std::round) compute. NOT floor(v + 0.5): IEEE addition can round
    * v + 0.5 UP across the boundary when v is just under a tie (the
    * classic 0.49999999999999994 bug); rint + explicit tie fix is exact.
    */
  private def roundHalfAwayFromZero(v: Double): Long = {
    val f = Math.floor(v)
    if (v - f == 0.5) (if (v >= 0) f + 1 else f).toLong else Math.rint(v).toLong
  }

  /** The d²/2-accumulator Gram pass (sim_gram_matrix's 100 TB physical
    * form): one flat Long array of upper-triangle cells per partition,
    * merged by element-wise addition — no per-product row ever exists, so
    * the whole second-moment matrix costs one corpus scan plus
    * O(partitions · d²) merge traffic. Each product is quantized with the
    * EXACT per-element chain the DuckDB oracle uses — k =
    * round(x·y·1e8) at scale 0, where Spark SQL's HALF_UP, DuckDB's
    * std::round, and [[roundHalfAwayFromZero]] all agree INCLUDING at
    * exact .5 ties (all three are round-half-away-from-zero on the
    * double's exact value at scale 0; the canonical-string BigDecimal
    * subtlety only matters at fractional scales). Cell (i, j), j >= i,
    * lives at index i·d − i(i−1)/2 + (j−i).
    */
  def gramUpper(dim: Int): Aggregator[Seq[Float], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Float], Array[Long], Seq[Long]] {
      def zero: Array[Long] = new Array[Long](dim * (dim + 1) / 2)
      def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
        require(v.length == dim, s"expected $dim-dim vector, got ${v.length}")
        val a = v.toArray
        var i = 0
        var idx = 0
        while (i < dim) {
          val xi = a(i).toDouble
          var j = i
          while (j < dim) {
            b(idx) += roundHalfAwayFromZero(xi * a(j).toDouble * 1e8)
            idx += 1
            j += 1
          }
          i += 1
        }
        b
      }
      def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
        var i = 0
        while (i < b1.length) { b1(i) += b2(i); i += 1 }
        b1
      }
      def finish(b: Array[Long]): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
