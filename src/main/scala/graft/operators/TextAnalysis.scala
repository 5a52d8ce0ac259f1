package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-native text analysis over a (docId, text, ...) table.
  *
  * These are the benchmark/oracle forms of the reference's two jobs (word
  * count `mapreduce_wc.py`, inverted index `mapreduce_inverted.py`) plus the
  * LLM-pipeline text operators (token stats, language-ID, quality scoring,
  * fingerprinting, TF-IDF). Pure declarative plans: explode+groupBy shapes
  * get map-side partial aggregation from Catalyst; per-document stats are
  * single-pass, shuffle-free higher-order-function expressions.
  */
object TextAnalysis {

  private def toks(c: Column): Column = TextFns.tokens(c)

  /** (word, cnt) — the reference's word count. Scale: partial aggregation
    * makes the shuffle O(distinct words), not O(tokens).
    */
  def wordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(toks(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** (word, doc_list, n_docs) — the reference's inverted index, sorted doc
    * ids for deterministic output (the reference uses an unordered set,
    * SURVEY §2.2). doc_list is a comma-joined string so output hashing is
    * representation-stable. Scale: collect_set is bounded by docs-per-word;
    * for web-scale vocab a (word, doc) pair table (no collect) is the
    * preferred shape — both are exposed.
    */
  def invertedIndex(docs: DataFrame, docCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(docCol).cast("string").as("doc"), explode(toks(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(
        array_join(array_sort(collect_set(col("doc").cast("bigint"))), ",").as("doc_list"),
        count_distinct(col("doc")).as("n_docs"))

  /** Per-document token statistics. Shuffle-free (no explode): single-pass
    * array expressions per row.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = col("toks")
    docs.select(col("doc_id"), toks(col("text")).as("toks")).select(
      col("doc_id"),
      size(t).cast("bigint").as("n_tokens"),
      size(array_distinct(t)).cast("bigint").as("n_uniq"),
      aggregate(transform(t, x => length(x).cast("bigint")), lit(0L), (a, x) => a + x).as("n_chars_tok"))
  }

  /** Heuristic language-ID: marker-word vote per language, arg-max with a
    * fixed (alphabetical) tie-break. Deterministic function of the text.
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = col("toks")
    val scored = docs
      .select(col("doc_id"), col("lang"), toks(col("text")).as("toks"))
      .select(
        col("doc_id") +: col("lang").as("actual_lang") +:
          TextFns.langMarkers.toSeq.map { case (l, ms) => TextFns.markerScore(t, ms).as(s"s_$l") }: _*)
    // arg-max CASE chain in ListMap order: first language whose score is >=
    // all later ones wins — mirrored verbatim in the oracle SQL.
    val langs = TextFns.langMarkers.keys.toSeq
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) { case ((l, i), els) =>
      val ge = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(els)
    }
    scored.select(Seq(col("doc_id"), pred.as("pred_lang"), col("actual_lang")) ++
      langs.map(l => col(s"s_$l")): _*)
  }

  /** Quality scores: token/char counts, mean token length, stopword ratio,
    * non-alpha character count. Ratios rounded for representation-stable
    * comparison.
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("toks")
    val stop = Seq("the", "a", "of", "to", "and")
    docs.select(col("doc_id"), col("lang"), col("text"), toks(col("text")).as("toks")).select(
      col("doc_id"),
      col("lang"),
      size(t).cast("bigint").as("n_tokens"),
      length(col("text")).cast("bigint").as("n_chars"),
      round(length(col("text")).cast("double") / size(t), 4).as("mean_tok_len"),
      round(size(filter(t, x => x.isin(stop.map(s => s: Any): _*))).cast("double") / size(t), 4)
        .as("stopword_ratio"),
      regexp_count(col("text"), lit("[^a-z ]")).cast("bigint").as("n_nonalpha"))
  }

  /** BPE-style pre-tokenizer regex (GPT-2 pattern family, RE2-compatible
    * subset: contraction suffixes, space-prefixed letter runs / digit runs /
    * punctuation runs, whitespace runs). No lookahead, so the same pattern
    * runs in Spark (java.util.regex) and DuckDB (RE2) with identical
    * leftmost-first alternation.
    */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  /** Token-budget accounting: whitespace token count vs a BPE-ish
    * pre-tokenizer count per document. Shuffle-free single pass.
    */
  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks(col("text"))).cast("bigint").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("bigint").as("n_bpe_tokens"))

  /** Positional rolling-hash fingerprint per document. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.fingerprint(toks(col("text"))).as("fp"))

  /** TF-IDF per (doc, word): tf * ln(N / df). Two aggregations (term counts,
    * doc frequencies) + a broadcast-able join on word; N is a scalar cross
    * join. Scale: both groupBys shuffle on word — co-partitioned.
    */
  def tfidf(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val tf = pairs.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = pairs.groupBy("word").agg(count_distinct(col("doc_id")).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(df, "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4).as("tfidf"))
  }
}
