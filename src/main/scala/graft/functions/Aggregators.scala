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
}
