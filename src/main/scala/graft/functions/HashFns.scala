package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The repo's single deterministic-uniform hash for sampling and split
  * assignment: Knuth multiplicative hashing of an integer key into
  * [0, 2^32). The 31-bit mask keeps the product < 2^62 — exact in signed
  * 64 for ANY key (unmasked, keys past ~3.47e9 would wrap in Spark but
  * raise in ANSI engines, breaking cross-engine determinism); key
  * coherence is untouched since the mask is itself a pure key function.
  *
  * Every sampling/splitting query (rel_sample_hash, tx_split_assign,
  * tx_inspection_sample, dd_split_contamination) MUST use these two
  * definitions — the compositions between them (e.g. contamination of the
  * split's held-out slice) are only correct while the hash stays
  * bit-identical across all of them.
  */
object HashFns {

  /** u = ((key & 0x7fffffff) * 2654435761) mod 2^32, as a Column. */
  def knuthU(key: Column): Column =
    pmod(key.bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(4294967296L))

  /** The same expression as DuckDB SQL over `keyExpr`. */
  def knuthUSql(keyExpr: String): String =
    s"(($keyExpr & 2147483647) * 2654435761) % 4294967296"

  /** The [0, 2^32) cut point for a fraction, usable on both sides. */
  def cut(fraction: Double): Long = (fraction * 4294967296L).toLong
}
