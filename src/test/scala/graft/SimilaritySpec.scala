package graft

import graft.functions.VectorFns
import graft.operators.Similarity
import graft.plans.FloatDotProduct
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f), 0),
    (2L, Array(0f, 1f, 0f), 1),
    (3L, Array(0f, 0.9f, 0.2f), 1),
    (4L, Array(-1f, 0f, 0f), 2)
  ).toDF("vec_id", "embedding", "label")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  test("FloatDotProduct interpreted eval matches manual dot product") {
    val e = FloatDotProduct(
      Literal.create(Array(1f, 2f, 3f), ArrayType(FloatType)),
      Literal.create(Array(4f, 5f, 6f), ArrayType(FloatType)))
    assert(e.eval(InternalRow.empty) == (4.0 + 10.0 + 18.0))
  }

  test("float_dot column equals HOF zip_with dot product") {
    val df = vecs.select(
      VectorFns.dot(col("embedding"), col("embedding")).as("native"),
      aggregate(zip_with(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    df.as[(Double, Double)].collect().foreach { case (n, h) =>
      assert(math.abs(n - h) < 1e-9)
    }
  }

  test("brute-force top-k ranks the nearest neighbor first") {
    val top = Similarity.bruteForceTopK(vecs, queryId = 0L, k = 2)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 1L)       // 0.9,0.1 is closest to 1,0,0
    assert(top.head._2 > 0.99)
    assert(top.map(_._1).toSet == Set(1L, 2L) || top.map(_._1).contains(1L))
  }

  test("IVF top-k searches the query's nearest cluster") {
    val top = Similarity.ivfTopK(vecs, queryId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(top == Set(1L)) // cluster label 0 contains only vec 1 besides query
  }

  test("centroids are per-label means") {
    val c = Similarity.centroids(vecs).orderBy("label")
      .as[(Int, Seq[Double])].collect()
    assert(c.length == 3)
    val c0 = c.find(_._1 == 0).get._2
    assert(math.abs(c0.head - 0.95) < 1e-6)
  }

  test("IVF with nprobe=2 searches two clusters") {
    val top = Similarity.ivfTopK(vecs, queryId = 0L, k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(top.contains(1L) && top.size >= 2) // second probed cluster adds members
  }

  test("LSH top-k returns a subset of brute-force candidates, deterministically") {
    val a = Similarity.lshTopK(vecs, queryId = 0L, k = 5, nBits = 2)
      .as[(Long, Double)].collect().toSeq
    val b = Similarity.lshTopK(vecs, queryId = 0L, k = 5, nBits = 2)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)                                  // deterministic hyperplanes
    assert(!a.map(_._1).contains(0L))               // query excluded
  }

  test("operators tolerate empty inputs") {
    val empty = vecs.filter($"vec_id" < 0)
    assert(Similarity.bruteForceTopK(empty, 0L, 3).count() == 0)
    assert(graft.operators.Dedup.embeddingNearDupPairs(empty, 0.5).count() == 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.wordCount(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.minhashLshPairs(emptyDocs).count() == 0)
  }

  test("embedding near-dup finds parallel vectors") {
    val pairs = graft.operators.Dedup.embeddingNearDupPairs(vecs, minCos = 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }
}
