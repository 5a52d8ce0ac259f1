package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Column-level text primitives: tokenization, shingling, MinHash, SimHash,
  * language-ID scoring, fingerprints.
  *
  * Everything here is built from codegen-friendly built-in expressions and
  * higher-order functions — no Scala UDFs — so Catalyst keeps pushdown,
  * pruning and (where supported) whole-stage codegen. The reference engine's
  * whitespace tokenizer is `str.split()` (/root/reference/mapreduce_wc.py:4);
  * [[tokens]] reproduces those semantics exactly, and the DuckDB oracles
  * interpolate the equivalent [[tokensSqlDuckDB]] expression.
  */
object TextFns {

  /** 2^31 - 1 (Mersenne prime) — modulus for MinHash / fingerprint math.
    * Products a*h stay < 2^62, so no 64-bit overflow even under ANSI mode.
    */
  val HashP = 2147483647L

  /** Whitespace tokenization with Python str.split() semantics over ASCII
    * whitespace (reference parity: mapreduce_wc.py:4): split on runs of
    * whitespace and drop empty tokens, so tabs/newlines/repeated/leading/
    * trailing whitespace tokenize identically to the reference. Every
    * DuckDB oracle uses the equivalent [[tokensSqlDuckDB]], so
    * engine/oracle parity holds by construction on ANY corpus — including
    * the empty string (both sides yield an empty list).
    *
    * Scope note: Java's and RE2's `\s` are the same ASCII set
    * `[ \t\n\x0B\f\r]`, so engine/oracle parity is unconditional, but
    * Python str.split() additionally splits on Unicode whitespace (NBSP,
    * NEL, ideographic space, ...). Reference parity is therefore exact for
    * ASCII-whitespace corpora; a corpus with Unicode whitespace would need
    * an explicit character class mirrored in [[tokensSqlDuckDB]].
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** DuckDB expression equivalent to [[tokens]]`(col)` — regexp split on
    * whitespace runs + empty-token filter. The single source of truth for
    * oracle-side tokenization: every token-based oracle interpolates this,
    * so the two tokenizers cannot drift apart query by query.
    */
  def tokensSqlDuckDB(textExpr: String): String =
    s"list_filter(regexp_split_to_array($textExpr, '\\s+'), tok -> length(tok) > 0)"

  /** Word n-gram shingles: ["a","b","c","d"] with n=3 -> ["a b c","b c d"].
    * Column-level convenience for small/typed use; hot paths should go
    * through the verified dedup operators (Dedup.ngramJaccardPairs /
    * minhashLshPairs / simhashPairs), whose shared `shingleHashRows`
    * pipeline (private[graft]) is fully codegen'd — higher-order functions
    * like this one evaluate interpreted.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Deterministic splitmix64 finalizer — generates the MinHash affine
    * coefficients (a_i, b_i) as plain Scala constants, so they fold into the
    * codegen'd aggregate as literals.
    */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash affine family h_i(x) = (a_i x + b_i) mod HashP: a in [1, p-1],
    * b in [0, p-1]. With x < p and a < p, a*x < 2^62 — no 64-bit overflow.
    */
  def minhashA(i: Int): Long = java.lang.Math.floorMod(splitmix64(2L * i), HashP - 1) + 1
  def minhashB(i: Int): Long = java.lang.Math.floorMod(splitmix64(2L * i + 1), HashP)

  /** LSH band keys: hash of each band's slice of the signature. Equal band
    * key => candidate pair. bands*rowsPerBand must equal the signature size.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Language marker words (tiny per-language stopword lists). On the
    * synthetic corpus every language shares one vocabulary, so predictions
    * are a deterministic function of the text rather than a real detector —
    * on a real corpus these would be per-language stopword sets. Keys sorted
    * so the arg-max tie-break order is stable.
    */
  val langMarkers: ListMap[String, Seq[String]] = ListMap(
    "de" -> Seq("join", "scan", "sort", "group"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "table", "row", "line"),
    "fr" -> Seq("query", "filter", "merge", "order"),
    "zh" -> Seq("hash", "key", "value", "part"))

  /** Count of tokens that appear in `markers`. */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*))).cast("bigint")

  /** Positional rolling fingerprint: sum over 1-based positions i of
    * (i*31 + 7) * (len(tok)*17 + ascii(tok)) mod p, mod p. Position
    * multiplies into the token term so permutations change the sum (an
    * additive-only form would be swap-invariant); the sum form keeps it
    * associative/order-independent to COMPUTE (any partitioning), and it is
    * exactly expressible in both Spark and ANSI SQL.
    *
    * BMP constraint: `ascii(tok)` is Spark's charAt(0) (a UTF-16 code
    * unit) but DuckDB's full codepoint — for a token starting with a
    * supplementary-plane char (emoji) the two diverge. Fine for the BMP
    * corpora this gates; a full-Unicode fingerprint would hash the token
    * bytes instead.
    */
  def fingerprint(toks: Column): Column =
    pmod(
      aggregate(
        transform(toks, (t, i) =>
          pmod(((i + lit(1)).cast("bigint") * lit(31L) + lit(7L)) *
            (length(t).cast("bigint") * lit(17L) + ascii(t).cast("bigint")),
            lit(HashP))),
        lit(0L),
        (acc, x) => acc + x),
      lit(HashP))
}
