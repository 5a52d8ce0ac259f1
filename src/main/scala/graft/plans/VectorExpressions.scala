package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns (embedding math hot
  * path). Native Catalyst expression rather than a UDF so whole-stage codegen
  * keeps the similarity-search scan pipelined. Returns double.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused single-pass cosine similarity over two `array<float>` columns:
  * accumulates dot product and both squared norms in one traversal (the
  * composed form float_dot(a,b)/(sqrt(float_dot(a,a))*sqrt(float_dot(b,b)))
  * walks the arrays three times). Accumulation order matches the composed
  * form, so values are bit-identical. Returns NaN for zero-norm inputs
  * (matches the composed form's 0/0).
  */
case class FloatCosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double x = (double) $a.getFloat(i);
         |  double y = (double) $b.getFloat(i);
         |  dot += x * y; na += x * x; nb += y * y;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Expose as a Column for DataFrame use. */
  def floatDot(a: Column, b: Column): Column =
    bridge.column(FloatDotProduct(bridge.expression(a), bridge.expression(b)))

  def floatCosine(a: Column, b: Column): Column =
    bridge.column(FloatCosineSimilarity(bridge.expression(a), bridge.expression(b)))

  /** Register `float_dot` / `float_cosine` for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    bridge.registerFunction(spark, "float_dot", exprs => FloatDotProduct(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "float_cosine", exprs => FloatCosineSimilarity(exprs(0), exprs(1)))
  }
}
