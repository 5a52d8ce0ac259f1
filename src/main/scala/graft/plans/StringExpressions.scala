package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity over two string columns — the fuzzy-
  * match scorer Spark lacks natively (it ships only `levenshtein`). A
  * native Catalyst expression rather than a UDF so the blocked fuzzy-match
  * scan stays inside whole-stage codegen: `doGenCode` emits one static
  * call into [[graft.functions.JaroWinkler]] per row (the same shape as
  * Spark's own levenshtein -> UTF8String.levenshteinDistance). Semantics
  * and their empirical verification against the DuckDB oracle are
  * documented on the kernel object.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.JaroWinkler.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringExpressions {
  /** Expose as a Column for DataFrame use. */
  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinklerSim(bridge.expression(a), bridge.expression(b)))

  /** Register `jaro_winkler` for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    bridge.registerFunction(spark, "jaro_winkler",
      exprs => JaroWinklerSim(exprs(0), exprs(1)))
}
