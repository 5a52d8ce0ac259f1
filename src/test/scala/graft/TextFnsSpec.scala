package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFnsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("shingles builds word n-grams and handles short docs") {
    val df = Seq(("a b c d", 0), ("a b", 1)).toDF("text", "id")
      .select(col("id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("id"), TextFns.shingles(col("toks"), 3).as("sh"))
    val got = df.as[(Int, Seq[String])].collect().toMap
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty) // shorter than n -> no shingles, no error
  }

  test("minhash coefficients are in-range and deterministic") {
    (0 until 128).foreach { i =>
      val a = TextFns.minhashA(i); val b = TextFns.minhashB(i)
      assert(a >= 1 && a < TextFns.HashP)
      assert(b >= 0 && b < TextFns.HashP)
      assert(a == TextFns.minhashA(i) && b == TextFns.minhashB(i))
    }
    assert((0 until 128).map(TextFns.minhashA).distinct.size == 128)
  }

  test("hamming distance counts differing bits") {
    val df = Seq((0L, -1L)).toDF("a", "b")
      .select(TextFns.hamming(col("a"), col("b")).as("h"))
    assert(df.as[Int].head() == 64)
  }
}
