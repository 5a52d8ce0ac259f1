package graft

import graft.functions.Aggregators
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("sumLong Aggregator reproduces word count with partial aggregation") {
    val pairs = Seq(("cat", 1L), ("dog", 1L), ("cat", 1L)).toDS()
    val counts = pairs.groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.sumLong.toColumn.name("cnt"))
      .collect().toMap
    assert(counts == Map("cat" -> 2L, "dog" -> 1L))
  }

  test("distinctSorted Aggregator reproduces the inverted-index reduce") {
    val pairs = Seq(("cat", "d1"), ("cat", "d0"), ("cat", "d1"), ("dog", "d2")).toDS()
    val idx = pairs.groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.distinctSorted.toColumn.name("docs"))
      .collect().toMap
    assert(idx == Map("cat" -> Seq("d0", "d1"), "dog" -> Seq("d2")))
  }

  test("float_cosine fused expression equals the composed dot/norm form") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f))).toDF("a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
    val (fused, composed) = df.select(
      graft.plans.VectorExpressions.floatCosine(col("a"), col("b")),
      graft.functions.VectorFns.dot(col("a"), col("b")) /
        (sqrt(graft.functions.VectorFns.dot(col("a"), col("a"))) *
         sqrt(graft.functions.VectorFns.dot(col("b"), col("b")))))
      .as[(Double, Double)].head()
    assert(fused == composed) // identical accumulation order -> bit-equal
  }

  test("float_dot is SQL-registrable") {
    VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(got == 11.0)
    val cos = spark.sql(
      "SELECT float_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
  }
}
