package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
      // ctx.freshName: nullSafeCodeGen only scopes the snippet in its own
      // block when the child is nullable — fixed local names would collide
      // when two instances land in one generated method (janino error ->
      // silent interpreted fallback)
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused single-pass cosine similarity over two `array<float>` columns:
  * accumulates dot product and both squared norms in one traversal (the
  * composed form float_dot(a,b)/(sqrt(float_dot(a,a))*sqrt(float_dot(b,b)))
  * walks the arrays three times). Accumulation order matches the composed
  * form, so values are bit-identical — including on ragged inputs, where
  * the dot runs over the common prefix but each norm runs over its FULL
  * array (exactly what the composed form computes; a min-length norm would
  * silently inflate the similarity of a truncated embedding). Returns NaN
  * for zero-norm inputs (matches the composed form's 0/0).
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
    while (i < a.numElements()) {
      val x = a.getFloat(i).toDouble; na += x * x; i += 1
    }
    var j = n
    while (j < b.numElements()) {
      val y = b.getFloat(j).toDouble; nb += y * y; j += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: see FloatDotProduct.doGenCode
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $x = (double) $a.getFloat($i); $na += $x * $x;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $y = (double) $b.getFloat($i); $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared euclidean distance between an `array<float>` vector
  * and an `array<double>` centroid — the k-means/IVF E-step kernel. Replaces
  * the interpreted `aggregate(zip_with(cast(v), c, (a,b) => (a-b)*(a-b)))`
  * form (higher-order functions are CodegenFallback: per-element closure
  * dispatch plus a materialized intermediate array per (vector, centroid)
  * pair on the corpus x k hot path). Arithmetic is BIT-IDENTICAL to that
  * form: same element order, per element (toDouble(a) - b) squared, summed
  * left to right in double; mismatched lengths or null elements yield NULL
  * exactly as zip_with's null padding propagated through the fold.
  */
case class FloatDoubleSqDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_sqdist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |double $s = 0.0;
         |boolean $bad = $a.numElements() != $b.numElements();
         |if (!$bad) {
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd multi-table random-hyperplane LSH keys over an `array<float>`
  * embedding: one pass computes, for each of the `planes.size / bitsPerTable`
  * probe tables, the long bucket key whose bit b is the sign of the dot
  * product with that table's b-th hyperplane. Returns `array<long>` (element
  * t = table t's key).
  *
  * This is the candidate-generation hot path for embedding near-dup and ANN
  * at scale: a single tight generated loop per row, instead of
  * tables x bits interpreted zip_with/aggregate lambdas. Hyperplanes ship as
  * a broadcast-side constant (`addReferenceObj`), so the generated class
  * stays small no matter how many tables are probed. Vectors shorter than a
  * plane hash their available prefix (no nulls, no silent bucket-0 collapse).
  *
  * Planes are `Seq[Seq[Float]]` (structural equality keeps Catalyst plan
  * canonicalization/dedup working — arrays compare by reference); the
  * runtime float[][] is derived lazily.
  */
case class RhpTableKeys(child: Expression, planes: Seq[Seq[Float]], bitsPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bitsPerTable >= 1 && bitsPerTable <= 63, "bitsPerTable must be in [1, 63]")
  require(planes.nonEmpty && planes.size % bitsPerTable == 0,
    "planes.size must be a positive multiple of bitsPerTable")

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_table_keys"

  @transient private lazy val planeArr: Array[Array[Float]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nTables = planeArr.length / bitsPerTable
    val out = new Array[Long](nTables)
    var pi = 0
    var t = 0
    while (t < nTables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val pl = planeArr(pi); pi += 1
        val n = math.min(pl.length, v.numElements())
        var acc = 0.0
        var i = 0
        while (i < n) { acc += pl(i).toDouble * v.getFloat(i).toDouble; i += 1 }
        if (acc >= 0.0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rhpPlanes", planeArr, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      // fresh locals: see FloatDotProduct.doGenCode
      val nT = ctx.freshName("nTables"); val keys = ctx.freshName("keys")
      val pi = ctx.freshName("pi"); val t = ctx.freshName("t")
      val key = ctx.freshName("key"); val b = ctx.freshName("b")
      val pl = ctx.freshName("pl"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |int $nT = $planesRef.length / $bitsPerTable;
         |long[] $keys = new long[$nT];
         |int $pi = 0;
         |for (int $t = 0; $t < $nT; $t++) {
         |  long $key = 0L;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    float[] $pl = $planesRef[$pi++];
         |    int $n = java.lang.Math.min($pl.length, $v.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $pl[$i] * (double) $v.getFloat($i);
         |    }
         |    if ($acc >= 0.0) $key |= (1L << $b);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd positional character polynomial mod 2^31-1 over a string —
  * Horner form of h = Σ charCode_k * 31^(L-k) mod p, bit-identical to the
  * SQL-replayable `sum(ascii(substr(s,k,1)) * 31^(L-k)) % p` the SimHash
  * oracle states (ascii() is the first UTF-16 unit for BMP text, which
  * charAt matches). A HOF formulation of the same math evaluates an
  * interpreted lambda per character — this expression keeps the shingle
  * hash inside whole-stage codegen (~17M characters per sf0.1 pass).
  */
case class PolyHash31(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash31"

  private val P = graft.functions.TextFns.HashP

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31L + s.charAt(i)) % P; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s"); val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + $s.charAt($i)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Expose as a Column for DataFrame use. */
  def floatDot(a: Column, b: Column): Column =
    bridge.column(FloatDotProduct(bridge.expression(a), bridge.expression(b)))

  def polyHash31(s: Column): Column =
    bridge.column(PolyHash31(bridge.expression(s)))

  def floatCosine(a: Column, b: Column): Column =
    bridge.column(FloatCosineSimilarity(bridge.expression(a), bridge.expression(b)))

  def floatSqDist(a: Column, b: Column): Column =
    bridge.column(FloatDoubleSqDist(bridge.expression(a), bridge.expression(b)))

  def rhpTableKeys(v: Column, planes: Seq[Seq[Float]], bitsPerTable: Int): Column =
    bridge.column(RhpTableKeys(bridge.expression(v), planes, bitsPerTable))

  /** Register `float_dot` / `float_cosine` for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    bridge.registerFunction(spark, "float_dot", exprs => FloatDotProduct(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "float_cosine", exprs => FloatCosineSimilarity(exprs(0), exprs(1)))
  }
}
