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

  test("tokens has Python str.split() semantics on irregular whitespace") {
    // reference parity (mapreduce_wc.py uses str.split()): runs of any
    // whitespace split, leading/trailing whitespace and empty strings yield
    // no empty tokens. The DuckDB oracles interpolate
    // TextFns.tokensSqlDuckDB — the regexp split + empty filter with these
    // exact semantics — so parity holds on any corpus by construction.
    val df = Seq(
      (0, "a b c"),            // plain
      (1, "a  b\tc"),          // double space + tab
      (2, "  a b  "),          // leading/trailing
      (3, "a\nb\r\nc"),        // newlines
      (4, ""),                 // empty
      (5, "   ")               // whitespace only
    ).toDF("id", "text").select(col("id"), TextFns.tokens(col("text")).as("t"))
    val got = df.as[(Int, Seq[String])].collect().toMap
    assert(got(0) == Seq("a", "b", "c"))
    assert(got(1) == Seq("a", "b", "c"))
    assert(got(2) == Seq("a", "b"))
    assert(got(3) == Seq("a", "b", "c"))
    assert(got(4) == Seq.empty)
    assert(got(5) == Seq.empty)
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
