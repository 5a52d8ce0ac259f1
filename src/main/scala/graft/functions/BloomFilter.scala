package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Bloom filter over long keys — the explicit, engine-level form
  * of the runtime-filter join pruning Spark injects automatically (and which
  * PlanQualitySpec already asserts on executed plans): build a bounded
  * bit-set over the build side's join keys, broadcast it, and pre-filter the
  * probe side BEFORE its shuffle. At 100 TB this is the difference between
  * shuffling the full fact table and shuffling only the (tiny) fraction that
  * can possibly match — the bitset is O(bits) regardless of fact size, the
  * build is one map-side-combined aggregate, and the probe test is pure
  * per-row arithmetic with no join.
  *
  * Spark SHIPS `org.apache.spark.util.sketch.BloomFilter`, but its Murmur3
  * hashing is not replayable by the DuckDB oracle; this one hashes with the
  * [[TextFns.minhashA]]/B pairwise-independent affine family over p =
  * 2^31 - 1 — bit_i(key) = ((A_i * (key mod p) + B_i) mod p) mod m — which
  * both engines evaluate in exact signed-64 arithmetic (A_i, key mod p < p,
  * so the product stays under 2^62). Membership is therefore deterministic
  * and cross-engine verifiable bit for bit, false negatives are impossible
  * by construction, and the query that uses this carries its own
  * false-positive accounting against the exact join.
  *
  * Sizing: NumBits = 2^16 and NumHash = 7 target a ~1% FP rate near
  * n ≈ 6500 build keys (m/n ≈ 10, k = 7 ≈ m/n·ln2); at real scale m is
  * provisioned from the build-side distinct-count estimate the same way
  * (the bitset stays broadcast-sized: 2^16 bits = 8 KiB, 2^30 bits =
  * 128 MiB — still one broadcast).
  */
object BloomFns {

  val NumBits = 1 << 16
  val NumHash = 7
  private val Words = NumBits / 64

  /** Bit position of hash i for a pre-reduced h0 = key mod p. */
  private def bitPos(i: Int, h0: Long): Int =
    (java.lang.Math.floorMod(TextFns.minhashA(i) * h0 + TextFns.minhashB(i),
      TextFns.HashP) % NumBits).toInt

  private implicit val bufEnc: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  /** Build the bitset (map-side combine; merge is word-wise OR — exact,
    * commutative, associative, so shard filters roll up losslessly).
    */
  val bloomAgg: Aggregator[Long, Array[Long], Seq[Long]] =
    new Aggregator[Long, Array[Long], Seq[Long]] {
      def zero: Array[Long] = new Array[Long](Words)
      def reduce(b: Array[Long], k: Long): Array[Long] = {
        val h0 = java.lang.Math.floorMod(k, TextFns.HashP)
        var i = 0
        while (i < NumHash) {
          val p = bitPos(i, h0)
          b(p >>> 6) |= 1L << (p & 63)
          i += 1
        }
        b
      }
      def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
        var i = 0
        while (i < Words) { b1(i) |= b2(i); i += 1 }
        b1
      }
      def finish(b: Array[Long]): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[Array[Long]] = bufEnc
      def outputEncoder: Encoder[Seq[Long]] = org.apache.spark.sql.catalyst
        .encoders.ExpressionEncoder[Seq[Long]]()
    }

  def bloom_agg(c: Column): Column = udaf(bloomAgg, Encoders.scalaLong).apply(c)

  /** The bit-position expression for hash i in either engine's SQL dialect —
    * the single source both [[mightContainSql]] and the DuckDB oracle derive
    * from, so the two sides cannot drift (`spark = false` emits DuckDB's `%`
    * forms; operands are nonnegative in both engines, so `%` == pmod here).
    */
  def bitPosSql(i: Int, keyExpr: String, spark: Boolean): String =
    bitPosSqlM(i, keyExpr, NumBits, spark)

  /** [[bitPosSql]] at an explicit filter width — the sizing-sweep entry
    * point (dd_bloom_fpr_sweep measures the FP curve across widths; the
    * affine family is width-independent, only the final modulus changes).
    */
  def bitPosSqlM(i: Int, keyExpr: String, numBits: Int, spark: Boolean): String = {
    val p = TextFns.HashP
    if (spark)
      s"pmod(${TextFns.minhashA(i)}L * pmod($keyExpr, ${p}L) + ${TextFns.minhashB(i)}L, ${p}L) % $numBits"
    else
      s"((${TextFns.minhashA(i)} * ($keyExpr % $p) + ${TextFns.minhashB(i)}) % $p) % $numBits"
  }

  /** Spark SQL predicate testing all NumHash bits against an array<bigint>
    * bitset column — plain arithmetic + element_at, fully codegen'd, no UDF
    * on the probe hot path.
    */
  def mightContainSql(bitsCol: String, keyExpr: String): String =
    (0 until NumHash).map { i =>
      val pos = bitPosSql(i, keyExpr, spark = true)
      s"(element_at($bitsCol, CAST(($pos) DIV 64 AS INT) + 1) & shiftleft(1L, CAST(($pos) % 64 AS INT))) != 0"
    }.mkString("(", " AND ", ")")
}
