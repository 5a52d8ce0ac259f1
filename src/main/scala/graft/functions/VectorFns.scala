package graft.functions

import graft.plans.VectorExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math over `array<float>` columns.
  *
  * The dot product is a native codegen'd Catalyst expression
  * ([[graft.plans.FloatDotProduct]]) — not a UDF and not an interpreted
  * higher-order function — so similarity scans stay inside whole-stage
  * codegen. All accumulation is in double.
  */
object VectorFns {
  def dot(a: Column, b: Column): Column = VectorExpressions.floatDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — fused single-pass codegen'd expression (dot and
    * both norms accumulate in one array traversal).
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.floatCosine(a, b)

  /** Deterministic pseudo-random hyperplanes for RHP-LSH: value for
    * (table, bit, dim d) is a splitmix-style integer mix scaled to [-1, 1),
    * so every session/executor derives identical planes from the parameters
    * alone (nothing to broadcast or persist).
    */
  def rhpPlanes(dim: Int, bitsPerTable: Int, tables: Int, firstTable: Int = 0): Seq[Seq[Float]] =
    for (t <- firstTable until firstTable + tables; b <- 0 until bitsPerTable) yield {
      (0 until dim).map { d =>
        val z = ((t * 1000003L + b * 7919L + d) * 0x9E3779B97F4A7C15L)
        val m = (z ^ (z >>> 31)) & ((1L << 53) - 1)
        (m.toDouble / (1L << 52) - 1.0).toFloat
      }
    }

  /** Multi-table RHP-LSH bucket keys (array<long>, element t = probe table
    * t's key) — codegen'd single-pass expression
    * ([[graft.plans.RhpTableKeys]]); see it for the scale rationale.
    */
  def rhpKeys(v: Column, dim: Int, bitsPerTable: Int, tables: Int, firstTable: Int = 0): Column =
    VectorExpressions.rhpTableKeys(v, rhpPlanes(dim, bitsPerTable, tables, firstTable), bitsPerTable)
}
