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

  test("JaroWinkler kernel matches the oracle engine's probed values") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // values probed from DuckDB jaro_winkler_similarity (the oracle
    // engine) — including the textbook classics, the integer-transposition
    // case ('abcdef'/'bcadef': float halving would give 0.916667), the
    // exact-0.7 boost boundary, and unboosted sub-0.7 prefixed pairs
    val probed = Seq(
      ("MARTHA", "MARHTA", 0.9611111111),
      ("DIXON", "DICKSONX", 0.8133333333),
      ("JELLYFISH", "SMELLYFISH", 0.8962962963),
      ("CRATE", "TRACE", 0.7333333333),
      ("small ring", "small rod", 0.8955555556),
      ("DwAyNE", "DuANE", 0.84),
      ("arnab", "aranb", 0.9466666667),
      ("abcdefgh", "abehcdfg", 0.8952380952),
      ("abcxx", "abcyyy", 0.79),
      ("abcdxxxxxx", "abcdyyyyyyzzzz", 0.5619047619),
      ("abc", "abzzzzzzzzzz", 0.6111111111))
    probed.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-9, s"jw($a, $b) = ${jw(a, b)}, want $want")
      assert(jw(a, b) == jw(b, a), "symmetry")
    }
    assert(jw("", "abc") == 0.0 && jw("a", "") == 0.0 && jw("abc", "abc") == 1.0)
    // the odd-transposition integer-halving probe
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444) < 1e-9)
  }
}
