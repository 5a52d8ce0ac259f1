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
}
