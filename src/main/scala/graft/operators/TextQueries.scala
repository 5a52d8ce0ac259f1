package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis inventory over the `documents` table: the reference's two
  * jobs (word count `mapreduce_wc.py:3-11`, inverted index
  * `mapreduce_inverted.py:3-11`) in their benchmarked DataFrame form, the
  * typed mapReduce facade, and the LLM-pipeline text operators (token stats,
  * language-ID, quality, fingerprint, TF-IDF).
  */
object TextQueries {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** DuckDB tokenizer matching TextFns.tokens (whitespace runs, empties
    * dropped) — interpolated into every token-based oracle below.
    */
  private val tk = TextFns.tokensSqlDuckDB("text")

  /** BM25-scored top-`n` documents for `terms` (k1=1.2, b=0.75, Robertson
    * idf with +1) — the one lexical-ranker definition shared by tx_bm25
    * and sim_rrf_fusion. See tx_bm25's comment for the scale shape.
    */
  private def bm25Top(s: SparkSession, d: String, terms: Seq[String], n: Int) = {
    val toks = T(s, d, "documents")
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val idf = log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(idf * norm), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(n)
  }

  /** DuckDB twin of [[bm25Top]] (un-limited): CTE chain ending in
    * `bm(doc_id, bm25)`; consumers append their own ORDER BY/LIMIT.
    */
  private val bm25SqlCtes: String =
    s"""toks AS (SELECT doc_id, unnest($tk) AS w FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs,
       |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
       |       WHERE w IN ('hash', 'join', 'scan') GROUP BY 1, 2),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
       |bm AS (SELECT tf.doc_id,
       |              round(sum(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
       |                        * (tf.tf * 2.2
       |                           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)))), 4)
       |                AS bm25
       |       FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN st
       |       GROUP BY 1)""".stripMargin

  /** Shared lang-ID scoring SQL (per-doc marker scores + the same arg-max
    * CASE chain as TextAnalysis.langId, in ListMap order) — the per-doc
    * gate (tx_langid) and the confusion matrix (tx_lang_confusion) both
    * wrap it, so the classifier is stated once.
    */
  private val langidSqlCore: String = {
    val markers = TextFns.langMarkers
    val langs = markers.keys.toSeq
    val scoreCols = langs.map { l =>
      val in = markers(l).map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_filter(t, x -> x IN ($in))) AS BIGINT) AS s_$l"
    }.mkString(",\n       ")
    val pred = langs.init.zipWithIndex.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
    s"""WITH tt AS (SELECT doc_id, lang AS actual_lang, $tk AS t FROM documents),
       |scored AS (
       |  SELECT doc_id, actual_lang,
       |       $scoreCols
       |  FROM tt)
       |SELECT doc_id, $pred AS pred_lang, actual_lang, ${langs.map(l => s"s_$l").mkString(", ")}
       |FROM scored""".stripMargin
  }

  /** Shared oracle for the word-count shape: used by both the DataFrame plan
    * and the typed facade (they must agree with each other AND the oracle).
    */
  private val wordCountSql =
    s"""WITH toks AS (SELECT unnest($tk) AS word FROM documents)
      |SELECT word, count(*) AS cnt FROM toks WHERE length(word) > 0
      |GROUP BY word ORDER BY word""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    QueryDef("tx_wordcount",
      (s, d) => TextAnalysis.wordCount(T(s, d, "documents")).orderBy("word"),
      Some(wordCountSql)),

    QueryDef("tx_inverted_index",
      (s, d) => TextAnalysis.invertedIndex(T(s, d, "documents")).orderBy("word"),
      Some(s"""WITH pairs AS (
             |  SELECT doc_id, unnest($tk) AS word FROM documents)
             |SELECT word,
             |       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_list,
             |       count(DISTINCT doc_id) AS n_docs
             |FROM pairs WHERE length(word) > 0
             |GROUP BY word ORDER BY word""".stripMargin)),

    // Typed facade (flatMap + groupByKey.mapGroups) — the reference's
    // arbitrary-UDF surface; must equal the declarative plan and the oracle.
    QueryDef("tx_mr_facade",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
          .select(col("doc_id").cast("string"), col("text")).as[(String, String)]
        MapReduce.wordCount(docs).toDF("word", "cnt").orderBy("word")
      },
      Some(wordCountSql)),

    QueryDef("tx_token_stats",
      (s, d) => TextAnalysis.tokenStats(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents)
             |SELECT doc_id,
             |       CAST(len(t) AS BIGINT) AS n_tokens,
             |       CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
             |       CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS BIGINT) AS n_chars_tok
             |FROM tt ORDER BY doc_id""".stripMargin)),

    // BPE-ish token budget: the regex is RE2-compatible (no lookahead), so
    // the oracle runs the IDENTICAL pattern; whitespace runs count as tokens
    // in both (the real GPT-2 pattern folds them into the following word via
    // lookahead — documented simplification).
    QueryDef("tx_bpe_count",
      (s, d) => TextAnalysis.bpeTokenCount(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"SELECT doc_id,\n       CAST(len($tk) AS BIGINT) AS n_ws_tokens," +
        """
             |       CAST(len(regexp_extract_all(text,
             |            '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+'))
             |            AS BIGINT) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("tx_langid",
      (s, d) => TextAnalysis.langId(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"$langidSqlCore ORDER BY doc_id")),

    // Language-ID evaluation: confusion matrix of predicted vs actual lang
    // — the quality report for the classifier above, one grouped count over
    // its (shared) scoring SQL.
    QueryDef("tx_lang_confusion",
      (s, d) => TextAnalysis.langId(T(s, d, "documents"))
        .groupBy("actual_lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("actual_lang", "pred_lang"),
      Some(s"""SELECT actual_lang, pred_lang, count(*) AS n
             |FROM ($langidSqlCore)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("tx_quality",
      (s, d) => TextAnalysis.quality(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH tt AS (SELECT doc_id, lang, text, $tk AS t FROM documents)
             |SELECT doc_id, lang,
             |       CAST(len(t) AS BIGINT) AS n_tokens,
             |       CAST(length(text) AS BIGINT) AS n_chars,
             |       round(CAST(length(text) AS DOUBLE) / len(t), 4) AS mean_tok_len,
             |       round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE) / len(t), 4) AS stopword_ratio,
             |       CAST(len(regexp_extract_all(text, '[^a-z ]')) AS BIGINT) AS n_nonalpha
             |FROM tt ORDER BY doc_id""".stripMargin)),

    // Quality FILTER rollup (the step after per-doc scoring): per-source
    // pass rates under a token-count + stopword-ratio gate — what a corpus
    // curator reads to decide which sources to keep, re-crawl, or drop.
    // One doc-keyed join of the scored frame back to its source attribute,
    // then an O(sources) aggregate. Thresholds (>= 40 tokens, >= 0.04
    // stopword ratio) sit at this corpus's quartiles so the gate actually
    // separates (pass rates land strictly between 0 and 1).
    QueryDef("tx_quality_filter",
      (s, d) => {
        val docs = T(s, d, "documents")
        val q = TextAnalysis.quality(docs).select("doc_id", "n_tokens", "stopword_ratio")
        docs.select(col("doc_id"), col("source"))
          .join(q, "doc_id")
          .withColumn("pass",
            (col("n_tokens") >= 40 && col("stopword_ratio") >= 0.04).cast("bigint"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pass")).cast("bigint").as("n_pass"),
            round(avg(col("pass")), 4).as("pass_rate"))
          .orderBy("source")
      },
      Some(s"""WITH tt AS (SELECT doc_id, source, $tk AS t FROM documents),
             |q AS (SELECT doc_id, source, len(t) AS n_tokens,
             |             round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE) / len(t), 4) AS r
             |      FROM tt)
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(CASE WHEN n_tokens >= 40 AND r >= 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             |       round(avg(CASE WHEN n_tokens >= 40 AND r >= 0.04 THEN 1.0 ELSE 0.0 END), 4) AS pass_rate
             |FROM q GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sequence packing (the batch-assembly step before LLM training):
    // documents stream into fixed token-budget packs — greedy contiguous
    // assignment via an exclusive running sum, pack = floor(cum/budget), so
    // a doc may straddle its boundary (streaming packing with overflow, the
    // shape a data loader actually uses). Packing runs WITHIN each source
    // shard (window partitioned by source) — the 100 TB form, where every
    // shard packs independently and pack ids are (shard, local id); a
    // single global ordering would serialize the corpus through one task.
    // All-integer math, so the oracle hash-matches by construction.
    QueryDef("tx_pack_sequences",
      (s, d) => {
        val budget = 256.0
        val toks = T(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(TextFns.tokens(col("text"))).cast("bigint").as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        toks
          .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("pack_id", floor(col("cum_before") / budget).cast("bigint"))
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("bigint").as("total_tokens"),
            round(sum(col("n_tokens")) / budget, 4).as("fill_rate"))
          .orderBy("source", "pack_id")
      },
      Some(s"""WITH tt AS (SELECT doc_id, source, CAST(len($tk) AS BIGINT) AS n_tokens
             |            FROM documents),
             |c AS (SELECT doc_id, source, n_tokens,
             |             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |               AS cum_before
             |      FROM tt)
             |SELECT source, CAST(floor(cum_before / 256.0) AS BIGINT) AS pack_id,
             |       count(*) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |       round(sum(n_tokens) / 256.0, 4) AS fill_rate
             |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("tx_fingerprint",
      (s, d) => TextAnalysis.fingerprint(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |pos AS (
             |  SELECT doc_id,
             |         unnest(t) AS w,
             |         unnest(generate_series(1, len(t))) AS i
             |  FROM tt),
             |f AS (SELECT doc_id,
             |             CAST(sum(((i * 31 + 7) * (length(w) * 17 + ascii(w))) % 2147483647) % 2147483647 AS BIGINT) AS fp
             |      FROM pos GROUP BY doc_id)
             |SELECT tt.doc_id, CAST(coalesce(f.fp, 0) AS BIGINT) AS fp
             |FROM tt LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin)),

    QueryDef("tx_tfidf",
      (s, d) => TextAnalysis.tfidf(T(s, d, "documents")).orderBy("doc_id", "word"),
      Some(s"""WITH pairs AS (
             |  SELECT doc_id, unnest($tk) AS word FROM documents),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM pairs WHERE length(word) > 0 GROUP BY 1, 2),
             |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM pairs WHERE length(word) > 0 GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT doc_id, word, tf, df,
             |       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
             |FROM tf JOIN df USING (word) CROSS JOIN n
             |ORDER BY doc_id, word""".stripMargin)),

    // Ordinal tokenization (posexplode): (doc, position, token) rows — the
    // layout sequence models train on, where position IS data (n-gram
    // windows, positional encodings, span labels). Pure per-row explode,
    // no shuffle; oracle via unnest WITH ORDINALITY semantics
    // (generate_series zip).
    QueryDef("tx_posexplode",
      (s, d) => T(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "token")))
        .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("pos"), col("token"))
        .orderBy("doc_id", "pos"),
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents WHERE doc_id < 50)
             |SELECT doc_id, CAST(unnest(generate_series(1, len(t))) AS BIGINT) AS pos,
             |       unnest(t) AS token
             |FROM tt ORDER BY doc_id, pos""".stripMargin)),

    // Keyword extraction: each document's top-3 terms by TF-IDF — the
    // summarization/tagging pipeline step, composed directly over the
    // gated tfidf table. Ranking uses the ROUNDED score both sides (that
    // is the oracled column), word tie-break; WindowGroupLimit prunes to 3
    // rows per doc map-side.
    QueryDef("tx_keywords",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
        TextAnalysis.tfidf(T(s, d, "documents"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("word"), col("tfidf"), col("rnk"))
          .orderBy("doc_id", "rnk")
      },
      Some(s"""WITH pairs AS (
             |  SELECT doc_id, unnest($tk) AS word FROM documents),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM pairs WHERE length(word) > 0 GROUP BY 1, 2),
             |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM pairs WHERE length(word) > 0 GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |sc AS (SELECT doc_id, word,
             |              round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
             |       FROM tf JOIN df USING (word) CROSS JOIN n),
             |r AS (SELECT doc_id, word, tfidf,
             |             CAST(row_number() OVER (PARTITION BY doc_id
             |                  ORDER BY tfidf DESC, word) AS INT) AS rnk
             |      FROM sc)
             |SELECT doc_id, word, tfidf, rnk FROM r WHERE rnk <= 3
             |ORDER BY doc_id, rnk""".stripMargin)),

    // Corpus bigram frequencies (top 50): adjacent-token pairs via
    // zip_with over two slices of the SAME materialized token array (the
    // tokenizer runs once per doc, not per element), explode + groupBy.
    // Deterministic top-k via (cnt DESC, bigram) total order.
    QueryDef("tx_bigram_freq",
      (s, d) => T(s, d, "documents")
        .select(TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(50),
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |pos AS (SELECT doc_id, unnest(t) AS w,
             |               unnest(generate_series(1, len(t))) AS i FROM tt),
             |bg AS (SELECT a.w || ' ' || b.w AS bigram
             |       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
             |SELECT bigram, count(*) AS cnt FROM bg
             |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin)),

    // Interpolated Kneser-Ney bigram table (Kneser & Ney 1995; the
    // smoothing every production n-gram LM ships): for the top bigrams,
    // the full count battery — c(ab), prefix total c(a·), distinct
    // continuations N1+(a·), and the KN CONTINUATION count N1+(·b)
    // (how many contexts b follows — the insight that makes "francisco"
    // unlikely outside "san") — plus the interpolated probability with
    // absolute discount D = 3/4, kept exact: with D a dyadic rational the
    // whole expression cross-multiplies to integers, one ppm division at
    // the end. p_kn = max(c_ab − D, 0)/c_a + D·N1a/c_a · cont_b/T.
    // All four count tables are vocab-/type-sized aggregates of the one
    // exploded bigram frame. The ppm expression is the FACTORED two-term
    // form — discount term (4·c_ab−3)·250000 div c_a plus backoff term
    // ((750000·cont_b) div T)·N1a div c_a — because the single-fraction
    // numerator 1e6·(4·c_ab·T + 3·N1a·cont_b) outgrows BIGINT once
    // c_ab·T passes ~2.3e12 (high-frequency bigrams hit that long before
    // planet-scale: Spark wraps silently where DuckDB raises, so the two
    // engines would diverge without an error). Factored, every
    // intermediate is ≤ max(1e6·c_ab, 7.5e5·cont_b, 7.5e5·N1a) — safe to
    // ~9e12 tokens per prefix and ~1.2e13 types. Cost: each floor
    // truncates ≤ 1 ppm (the output lattice's own resolution), applied
    // identically in both engines.
    QueryDef("tx_kneser_ney",
      (s, d) => {
        val bi = T(s, d, "documents")
          .select(TextFns.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        val ca = bi.groupBy("w1")
          .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1a"))
        val cont = bi.groupBy(col("w2"))
          .agg(count(lit(1)).as("cont_b"))
        val types = broadcast(bi.agg(count(lit(1)).as("tt")))
        bi.join(ca, "w1").join(cont, "w2").crossJoin(types)
          .select(col("w1"), col("w2"), col("c_ab"), col("c_a"),
            col("n1a"), col("cont_b"),
            expr("""(greatest(4 * c_ab - 3, 0) * 250000) div c_a
                    + (((750000 * cont_b) div tt) * n1a) div c_a""").as("p_kn_ppm"))
          .orderBy(col("c_ab").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some(s"""WITH tt0 AS (SELECT doc_id, $tk AS t FROM documents),
             |pos AS (SELECT doc_id, unnest(t) AS w,
             |               unnest(generate_series(1, len(t))) AS i FROM tt0),
             |bi AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c_ab
             |       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             |       GROUP BY 1, 2),
             |ca AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a,
             |              count(*) AS n1a FROM bi GROUP BY 1),
             |cont AS (SELECT w2, count(*) AS cont_b FROM bi GROUP BY 1),
             |ty AS (SELECT count(*) AS tt FROM bi)
             |SELECT w1, w2, c_ab, c_a, n1a, cont_b,
             |       (greatest(4 * c_ab - 3, 0) * 250000) // c_a
             |       + (((750000 * cont_b) // tt) * n1a) // c_a AS p_kn_ppm
             |FROM bi JOIN ca USING (w1) JOIN cont USING (w2) CROSS JOIN ty
             |ORDER BY c_ab DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Per-document cross-entropy / perplexity under the corpus's own bigram
    // model — the LM-flavored quality signal (template boilerplate scores
    // low, anomalous token sequences score high). p(w2|w1) = c(w1 w2)/c(w1·)
    // with counts from the full corpus, so every in-corpus bigram has mass
    // and no smoothing is needed. The two count tables are vocab-sized
    // (broadcast-joinable at any corpus scale); the doc-keyed aggregate is
    // the only O(corpus) shuffle. avg ordering differs across engines only
    // in the 1e-15 tail — round(3) clears it.
    QueryDef("tx_perplexity",
      (s, d) => {
        // spread: tokenize + interpreted zip_with bigram build otherwise
        // run in the single-partition scan stage (see Tables.spread)
        val bgd = graft.Tables.spread(T(s, d, "documents"))
          .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .withColumn("w1", substring_index(col("bigram"), " ", 1))
        val cb = bgd.groupBy("bigram").agg(count(lit(1)).as("cb"))
        val cw = bgd.groupBy("w1").agg(count(lit(1)).as("cw"))
        bgd.join(cb, "bigram").join(cw, "w1")
          .withColumn("lg", log2(col("cb") * lit(1.0) / col("cw")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(-avg(col("lg")), 3).as("xent"),
            round(pow(lit(2.0), -avg(col("lg"))), 3).as("ppl"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |pos AS (SELECT doc_id, unnest(t) AS w,
             |               unnest(generate_series(1, len(t))) AS i FROM tt),
             |bg AS (SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS bigram
             |       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
             |cb AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
             |cw AS (SELECT w1, count(*) AS cw FROM bg GROUP BY 1)
             |SELECT doc_id, count(*) AS n_bigrams,
             |       round(-avg(log2(cb * 1.0 / cw)), 3) AS xent,
             |       round(pow(2.0, -avg(log2(cb * 1.0 / cw))), 3) AS ppl
             |FROM bg JOIN cb USING (bigram) JOIN cw USING (w1)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every raw doc by
    // how much its hashed-unigram profile resembles a target domain (here
    // lang='en', the reference-corpus stand-in) — log w(doc) =
    // Σ_tokens [ln p̂_target(bucket) − ln p̂_raw(bucket)] with add-1
    // smoothing over B = 1024 polyHash31 buckets. Resampling then draws
    // docs ∝ w; this query ships the weight table that drives it.
    //
    // Determinism: the ONLY floats are the two ln's per bucket, and each
    // bucket's log-ratio is floor-quantized to integer millionths BEFORE
    // any per-doc summation — doc weights are exact BIGINT sums of 1024
    // fixed integers, immune to summation order. (A 1-ulp engine
    // difference in ln could only matter if a bucket's ratio landed
    // within ~1e-10 of a quantization edge — 1024 chances per corpus,
    // vanishing, and fixed per corpus rather than per run.)
    //
    // Shape at 100 TB: bucket counts are two B-row aggregates (map-side
    // combine, B = 1024), the log-ratio table broadcasts everywhere, and
    // the per-doc weight is one doc-keyed aggregate — the same
    // broadcast-scalars + explode+groupBy scaling as tx_tfidf.
    QueryDef("tx_dsir_weights",
      (s, d) => {
        val B = 1024
        val toks = T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(TextFns.tokens(col("text"))).as("w"))
          .select(col("doc_id"), col("lang"),
            pmod(graft.plans.VectorExpressions.polyHash31(col("w")),
              lit(B.toLong)).as("b"))
        val rawCnt = toks.groupBy("b").agg(count(lit(1)).as("cr"))
        val tgtCnt = toks.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("ct"))
        val totals = toks.agg(count(lit(1)).as("nr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"))
        val lr = rawCnt.join(tgtCnt, Seq("b"), "left")
          .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"), col("cr"))
          .crossJoin(broadcast(totals))
          .select(col("b"),
            floor(lit(1000000.0) *
              (log((col("ct") + 1L).cast("double") /
                   (col("nt") + lit(B.toLong)).cast("double")) -
               log((col("cr") + 1L).cast("double") /
                   (col("nr") + lit(B.toLong)).cast("double"))))
              .cast("long").as("lr_e6"))
        toks.join(broadcast(lr), "b")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("lr_e6")).as("logw_e6"))
          .orderBy("doc_id")
      },
      Some {
        val P = graft.functions.TextFns.HashP
        val pwList = graft.operators.Dedup.pow31.mkString("[", ", ", "]")
        s"""WITH tt AS (SELECT doc_id, lang, $tk AS t FROM documents),
           |tok AS (SELECT doc_id, lang, unnest(t) AS w,
           |               unnest(generate_series(1, len(t))) AS i FROM tt),
           |ch AS (SELECT doc_id, lang, i, w,
           |              unnest(generate_series(1, length(w))) AS k FROM tok),
           |hb AS (SELECT doc_id, lang, i,
           |         CAST(sum(CAST(ascii(substr(w, k, 1)) AS BIGINT) *
           |                  ($pwList)[length(w) - k + 1]) % $P AS BIGINT)
           |           % 1024 AS b
           |       FROM ch GROUP BY doc_id, lang, i, w),
           |cr AS (SELECT b, count(*) AS cr FROM hb GROUP BY 1),
           |ct AS (SELECT b, count(*) AS ct FROM hb WHERE lang = 'en' GROUP BY 1),
           |tot AS (SELECT count(*) AS nr,
           |               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
           |                    AS BIGINT) AS nt
           |        FROM hb),
           |lr AS (SELECT cr.b,
           |         CAST(floor(1000000.0 *
           |           (ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) /
           |               CAST(nt + 1024 AS DOUBLE)) -
           |            ln(CAST(cr.cr + 1 AS DOUBLE) /
           |               CAST(nr + 1024 AS DOUBLE)))) AS BIGINT) AS lr_e6
           |       FROM cr LEFT JOIN ct ON ct.b = cr.b CROSS JOIN tot)
           |SELECT doc_id, count(*) AS n_tokens,
           |       CAST(sum(lr_e6) AS BIGINT) AS logw_e6
           |FROM hb JOIN lr ON lr.b = hb.b
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Character n-gram profile per language — the TRAINING side of n-gram
    // language-ID (tx_langid applies such profiles): top character trigrams
    // per lang by frequency. Trigram explosion is per-row (sequence +
    // substr, no shuffle); the per-lang top-k is the WindowGroupLimit
    // row_number shape, so the shuffle after counting carries O(langs·k).
    QueryDef("tx_char_ngrams",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("cnt").desc, col("trigram"))
        // spread: the per-character trigram explode otherwise runs in the
        // single-partition scan stage (see Tables.spread)
        graft.Tables.spread(T(s, d, "documents"))
          .select(col("lang"), col("text"),
            // the length guard must yield an EMPTY array, not sequence(1,0):
            // Spark's sequence defaults to step -1 when end < start (so
            // sequence(1,0) = [1,0] — two spurious "trigrams" per short
            // doc), where DuckDB's generate_series(1,0) is already empty.
            // Explode the INDEX sequence and slice in a follow-up
            // projection: substr then runs codegen'd inside the same
            // WholeStageCodegen span, where the previous
            // transform(..., i -> substr(..)) evaluated an interpreted
            // lambda per character and allocated the whole per-doc
            // trigram array first (solo ~2.5s -> ~2.0s at sf0.1; the
            // remaining cost is the 10M-row (lang, trigram) hash agg)
            explode(expr("CASE WHEN length(text) >= 3 THEN " +
              "sequence(1, length(text) - 2) ELSE array() END")).as("i"))
          .select(col("lang"), expr("substr(text, i, 3)").as("trigram"))
          .groupBy("lang", "trigram").agg(count(lit(1)).as("cnt"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .orderBy("lang", "rnk")
      },
      Some("""WITH tg AS (SELECT lang,
             |                   unnest(list_transform(generate_series(1, greatest(length(text) - 2, 0)),
             |                          i -> substr(text, i, 3))) AS trigram
             |            FROM documents),
             |c AS (SELECT lang, trigram, count(*) AS cnt FROM tg GROUP BY 1, 2),
             |r AS (SELECT lang, trigram, cnt,
             |             CAST(row_number() OVER (PARTITION BY lang
             |                  ORDER BY cnt DESC, trigram) AS INT) AS rnk
             |      FROM c)
             |SELECT lang, trigram, cnt, rnk FROM r WHERE rnk <= 10
             |ORDER BY lang, rnk""".stripMargin)),

    // URL parsing battery (web-corpus curation: host-level dedup, path
    // bucketing, tracking-param extraction). The URL is constructed from
    // table columns, so the oracle re-derives every component from the same
    // parts — Spark's parse_url (java.net.URI semantics) is gated against
    // ground truth rather than a second URL parser's opinions.
    QueryDef("fn_url",
      (s, d) => {
        val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang"), lit("&n="), col("n_chars"))
        T(s, d, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            parse_url(col("url"), lit("PROTOCOL")).as("proto"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"),
            parse_url(col("url"), lit("QUERY"), lit("n")).cast("bigint").as("n_param"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |       'https' AS proto,
             |       source || '.example.com' AS host,
             |       '/docs/' || doc_id AS path,
             |       lang AS lang_param,
             |       n_chars AS n_param
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deterministic inspection sample: 2 docs per (source, length band)
    // stratum for human QA — the labeling-batch draw that must be
    // reproducible across reruns, so the draw is a row_number over the
    // Knuth doc_id hash (same device as tx_split_assign), never rand().
    // Per-stratum top-k is the map-side WindowGroupLimit shape.
    QueryDef("tx_inspection_sample",
      (s, d) => {
        val u = graft.functions.HashFns.knuthU(col("doc_id"))
        val band = when(col("n_chars") < 300, "short")
          .when(col("n_chars") < 600, "medium").otherwise("long")
        val w = Window.partitionBy("source", "band").orderBy(col("u"), col("doc_id"))
        T(s, d, "documents")
          .select(col("doc_id"), col("source"), band.as("band"), u.as("u"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("source"), col("band"), col("rn").cast("bigint").as("rn"),
            col("doc_id"))
          .orderBy("source", "band", "rn")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |         CASE WHEN n_chars < 300 THEN 'short'
             |              WHEN n_chars < 600 THEN 'medium' ELSE 'long' END AS band,
             |         ((doc_id & 2147483647) * 2654435761) % 4294967296 AS u
             |  FROM documents),
             |r AS (SELECT source, band, doc_id,
             |             CAST(row_number() OVER (PARTITION BY source, band
             |                                     ORDER BY u, doc_id) AS BIGINT) AS rn
             |      FROM t)
             |SELECT source, band, rn, doc_id FROM r WHERE rn <= 2
             |ORDER BY source, band, rn""".stripMargin)),

    // Conjunctive boolean retrieval — the query the reference's inverted
    // index exists to SERVE: docs containing ALL terms of {hash, join,
    // scan}, ranked by summed term frequency (ties by doc_id). The
    // distributed shape is one term-filtered explode + a doc-keyed
    // aggregate with HAVING — the posting-list intersection without ever
    // materializing posting lists.
    QueryDef("tx_boolean_retrieval",
      (s, d) => {
        val terms = Seq("hash", "join", "scan")
        T(s, d, "documents")
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
          .filter(col("w").isin(terms: _*))
          .groupBy("doc_id")
          .agg(count_distinct(col("w")).as("n_terms"), count(lit(1)).as("tf_sum"))
          .filter(col("n_terms") === terms.length)
          .select(col("doc_id"), col("tf_sum"))
          .orderBy(col("tf_sum").desc, col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($tk) AS w FROM documents),
             |hits AS (SELECT doc_id, count(DISTINCT w) AS n_terms, count(*) AS tf_sum
             |         FROM toks WHERE w IN ('hash', 'join', 'scan')
             |         GROUP BY 1)
             |SELECT doc_id, tf_sum FROM hits WHERE n_terms = 3
             |ORDER BY tf_sum DESC, doc_id""".stripMargin)),

    // Positional phrase search ("hash join" as an exact adjacent pair):
    // the positional-index retrieval op — posexplode keeps positions, the
    // phrase match is a doc-keyed self-join on position adjacency. Emits
    // (doc_id, n_occurrences); the window-lead formulation keeps the
    // whole pipeline codegen'd and single-shuffle.
    QueryDef("tx_phrase_search",
      (s, d) => {
        val byPos = Window.partitionBy("doc_id").orderBy("i")
        T(s, d, "documents")
          .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("i", "w")))
          .withColumn("w2", lead(col("w"), 1).over(byPos))
          .filter(col("w") === "hash" && col("w2") === "join")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |toks AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM tt),
             |big AS (SELECT doc_id, w, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
             |        FROM toks)
             |SELECT doc_id, count(*) AS n_occurrences
             |FROM big WHERE w = 'hash' AND w2 = 'join'
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // BM25 ranking for the same {hash, join, scan} query — the standard
    // lexical relevance scorer (k1=1.2, b=0.75, Robertson idf with +1 to
    // stay positive). Three tiny frames join into the term-filtered tf
    // table: doc lengths (doc-keyed), document frequencies (3 rows,
    // broadcast), corpus scalars (crossJoin broadcast) — so at scale the
    // only big operand is the tf explode, touched once. Every input to
    // the formula is an exact integer; the score rounds at 4 (ln parity
    // across engines per the fn_trig precedent). The scorer is factored
    // into bm25Top/bm25SqlCtes so sim_rrf_fusion below consumes the SAME
    // ranking definition on both engines — the formula is stated once.
    QueryDef("tx_bm25",
      (s, d) => bm25Top(s, d, Seq("hash", "join", "scan"), 20),
      Some(s"""WITH $bm25SqlCtes
             |SELECT doc_id, bm25 FROM bm
             |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),

    // Hybrid retrieval via reciprocal-rank fusion (Cormack/Clarke/Buettcher
    // 2009): fuse the BM25 lexical top-20 (the tx_bm25 ranking, via the
    // shared bm25Top) with the embedding-cosine top-20 for query vector 0
    // (the sim_topk_bruteforce chain) as sum over lists of 1/(60+rank) —
    // the standard RAG-serving combiner when lexical and dense retrieval
    // disagree. Scale shape: each branch is TakeOrderedAndProject top-k
    // (O(k) rows leave each ranker; the corpus is scanned once per branch),
    // the rank windows run over GlobalLimit-bounded 20-row frames (window
    // audit class 2), and the fusion is a 20x20 full-outer equi-join.
    // Determinism: ranks are integers with id tie-breaks stated on both
    // engines; contributions are floor(1e6/(60+rank)) — an exact integer
    // on both engines (no float-sum ordering can shift the fused score).
    // Absent-from-list is rank 0 (contributes nothing), shown explicitly
    // so the output row says WHICH ranker surfaced the doc.
    QueryDef("sim_rrf_fusion",
      (s, d) => {
        val lex = bm25Top(s, d, Seq("hash", "join", "scan"), 20)
          .withColumn("lex_rank",
            row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
              .cast("bigint"))
          .select(col("doc_id"), col("lex_rank"))
        val vec = Similarity.bruteForceTopK(T(s, d, "embeddings"), queryId = 0L, k = 20)
          .withColumn("vec_rank",
            row_number().over(Window.orderBy(col("cos_sim").desc, col("vec_id")))
              .cast("bigint"))
          .select(col("vec_id").as("doc_id"), col("vec_rank"))
        def contrib(rank: Column): Column =
          when(rank > 0, floor(lit(1000000.0) / (lit(60) + rank)).cast("bigint"))
            .otherwise(lit(0L))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
            coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
          .withColumn("rrf_micro", contrib(col("lex_rank")) + contrib(col("vec_rank")))
          .orderBy(col("rrf_micro").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH $bm25SqlCtes,
             |lt AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
             |lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
             |                       AS BIGINT) AS lex_rank FROM lt),
             |ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             |              unnest(generate_series(1, len(embedding))) AS i
             |       FROM embeddings),
             |nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM ex GROUP BY 1),
             |dots AS (SELECT b.vec_id, sum(a.x * b.x) AS dp
             |         FROM ex a JOIN ex b ON a.i = b.i
             |         WHERE a.vec_id = 0 AND b.vec_id <> 0
             |         GROUP BY 1),
             |vt AS (SELECT d.vec_id, round(dp / (nq.n * nv.n), 3) AS cos_sim
             |       FROM dots d
             |       JOIN nrm nq ON nq.vec_id = 0
             |       JOIN nrm nv ON nv.vec_id = d.vec_id
             |       ORDER BY cos_sim DESC, d.vec_id LIMIT 20),
             |vec AS (SELECT vec_id AS doc_id,
             |               CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id)
             |                    AS BIGINT) AS vec_rank FROM vt),
             |j AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             |             COALESCE(lex_rank, 0) AS lex_rank,
             |             COALESCE(vec_rank, 0) AS vec_rank
             |      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
             |SELECT doc_id, lex_rank, vec_rank,
             |       CAST(CASE WHEN lex_rank > 0
             |                 THEN floor(1000000.0 / (60 + lex_rank)) ELSE 0 END
             |          + CASE WHEN vec_rank > 0
             |                 THEN floor(1000000.0 / (60 + vec_rank)) ELSE 0 END
             |            AS BIGINT) AS rrf_micro
             |FROM j ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin)),

    // URL canonicalization — the web-corpus dedup KEY step (fn_url above is
    // the parse battery; this is the normalize-then-group workflow): the
    // same logical URL arrives uppercased, with a default port, tracking
    // params, a fragment, or a trailing slash, and must map to one
    // canonical string. Messiness is injected deterministically from
    // doc_id, canonicalization uses only generic string/array functions
    // (lower, parse_url, split, filter, array_sort), and the oracle states
    // the canonical VALUE closed-form from the source columns.
    QueryDef("fn_url_canonical",
      (s, d) => {
        val messy = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
          when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
          lit(".EXAMPLE.com:443/docs/"), col("doc_id"),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&lang="), col("lang"), lit("&b=2&a=1"),
          when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        val noFrag = regexp_replace(messy, "#.*$", "")
        val host = lower(parse_url(noFrag, lit("HOST")))
        val path = regexp_replace(parse_url(noFrag, lit("PATH")), "/$", "")
        val canonQ = concat_ws("&",
          array_sort(filter(split(parse_url(noFrag, lit("QUERY")), "&"),
            p => !p.startsWith("utm_"))))
        T(s, d, "documents")
          .select(col("doc_id"),
            concat(lit("https://"), host, path,
              when(length(canonQ) > 0, concat(lit("?"), canonQ)).otherwise(lit("")))
              .as("canonical_url"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |       'https://' || lower(source) || '.example.com/docs/' || doc_id ||
             |       '?a=1&b=2&lang=' || lang AS canonical_url
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Rule-based suffix stemming (normalization before counting/dedup):
    // one suffix stripped per token, longest-first, only on tokens long
    // enough to keep a 2+-char stem. Expressed as CASE + LIKE + substr —
    // identical literal semantics in both engines (regex alternation order
    // is engine-lore; CASE is not). Top-50 stems, deterministic tiebreak.
    QueryDef("tx_stem",
      (s, d) => {
        val stem = """CASE
          | WHEN length(w) > 4 AND w LIKE '%ing' THEN substr(w, 1, length(w) - 3)
          | WHEN length(w) > 4 AND w LIKE '%ed' THEN substr(w, 1, length(w) - 2)
          | WHEN length(w) > 4 AND w LIKE '%ly' THEN substr(w, 1, length(w) - 2)
          | WHEN length(w) > 4 AND w LIKE '%es' THEN substr(w, 1, length(w) - 2)
          | WHEN length(w) > 4 AND w LIKE '%s'  THEN substr(w, 1, length(w) - 1)
          | ELSE w END""".stripMargin
        T(s, d, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("w"))
          .select(expr(stem).as("stem"))
          .groupBy("stem").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("stem"))
          .limit(50)
      },
      Some(s"""WITH toks AS (SELECT unnest($tk) AS w FROM documents),
             |st AS (SELECT CASE
             |         WHEN length(w) > 4 AND w LIKE '%ing' THEN substr(w, 1, length(w) - 3)
             |         WHEN length(w) > 4 AND w LIKE '%ed' THEN substr(w, 1, length(w) - 2)
             |         WHEN length(w) > 4 AND w LIKE '%ly' THEN substr(w, 1, length(w) - 2)
             |         WHEN length(w) > 4 AND w LIKE '%es' THEN substr(w, 1, length(w) - 2)
             |         WHEN length(w) > 4 AND w LIKE '%s'  THEN substr(w, 1, length(w) - 1)
             |         ELSE w END AS stem
             |       FROM toks)
             |SELECT stem, count(*) AS cnt FROM st
             |GROUP BY stem ORDER BY cnt DESC, stem LIMIT 50""".stripMargin)),

    // Hapax legomena: words occurring exactly once, and their share of the
    // vocabulary — the OOV/tail-mass estimate that sizes tokenizer vocab
    // and smoothing. One aggregate over the word-count table.
    QueryDef("tx_hapax",
      (s, d) => TextAnalysis.wordCount(T(s, d, "documents"))
        .agg(count_if(col("cnt") === 1).as("n_hapax"),
          count(lit(1)).as("vocab"),
          round(count_if(col("cnt") === 1).cast("double") / count(lit(1)), 4)
            .as("hapax_share")),
      Some(s"""WITH toks AS (SELECT unnest($tk) AS word FROM documents),
             |wc AS (SELECT word, count(*) AS cnt FROM toks
             |       WHERE length(word) > 0 GROUP BY 1)
             |SELECT CAST(count_if(cnt = 1) AS BIGINT) AS n_hapax,
             |       count(*) AS vocab,
             |       round(CAST(count_if(cnt = 1) AS DOUBLE) / count(*), 4) AS hapax_share
             |FROM wc""".stripMargin)),

    // Type-token ratio (lexical diversity): distinct / total tokens per
    // document — the repetitiveness signal quality filters cut on (low TTR
    // = boilerplate/spam). Pure per-row array math, no shuffle at all.
    QueryDef("tx_ttr",
      (s, d) => {
        val t = TextFns.tokens(col("text"))
        T(s, d, "documents")
          .select(col("doc_id"),
            size(t).cast("bigint").as("n_tokens"),
            size(array_distinct(t)).cast("bigint").as("n_types"))
          .withColumn("ttr",
            round(col("n_types").cast("double") / col("n_tokens"), 4))
          .orderBy("doc_id")
      },
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents)
             |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             |       CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
             |       round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS ttr
             |FROM tt ORDER BY doc_id""".stripMargin)),

    // Vocabulary growth curve (Heaps' law — Zipf's companion): cumulative
    // distinct-word count as the corpus is consumed in doc_id order. A
    // cumulative DISTINCT is not windowable directly; the identity is:
    // each word counts once, at its FIRST document — so new-words-per-doc
    // is a min-aggregate per word, and the curve is its running sum. The
    // corpus-wide work is the word aggregate; the running-sum window runs
    // over the BOUNDED output spine (doc_id < 100 pushed BELOW the window
    // — a prefix filter on the window's own order key commutes with a
    // running sum), so no unpartitioned window ever sees a fact-sized
    // input.
    QueryDef("tx_vocab_growth",
      (s, d) => {
        val firstDoc = T(s, d, "documents")
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
          .groupBy("w").agg(min(col("doc_id")).as("first_doc"))
          .groupBy("first_doc").agg(count(lit(1)).as("new_words"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        T(s, d, "documents").select(col("doc_id"))
          .filter(col("doc_id") < 100)
          .join(firstDoc, col("doc_id") === col("first_doc"), "left")
          .select(col("doc_id"), coalesce(col("new_words"), lit(0L)).as("new_words"))
          .withColumn("vocab_size", sum(col("new_words")).over(w))
          .orderBy("doc_id")
      },
      Some(s"""WITH tt AS (SELECT doc_id, unnest($tk) AS w FROM documents),
             |fd AS (SELECT w, min(doc_id) AS first_doc FROM tt GROUP BY 1),
             |nw AS (SELECT first_doc, count(*) AS new_words FROM fd GROUP BY 1),
             |curve AS (SELECT d.doc_id,
             |                 CAST(coalesce(nw.new_words, 0) AS BIGINT) AS new_words,
             |                 CAST(sum(coalesce(nw.new_words, 0)) OVER (ORDER BY d.doc_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |                   AS vocab_size
             |          FROM documents d LEFT JOIN nw ON d.doc_id = nw.first_doc)
             |SELECT doc_id, new_words, vocab_size FROM curve
             |WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    // Per-doc n-gram NOVELTY — the doc-level curation signal (vocab_growth
    // above is the corpus-level curve): what fraction of a doc's distinct
    // 3-gram shingles first occur in THIS doc (global min-doc_id owner)?
    // Low novelty = boilerplate/near-dup candidate; the score feeds the
    // same keep/drop decisions as the dd_* pair queries but costs only
    // linear shuffles: explode → distinct, groupBy(shingle) min, a
    // co-partitioned join back (same shingle key — no extra exchange), and
    // a doc rollup. Spark groups hashed shingles, the oracle groups the
    // strings — the same ~1e-9-collision equivalence every dd_ pair oracle
    // rests on. novelty_bp is the exact-integer basis-point idiom.
    QueryDef("tx_ngram_novelty",
      (s, d) => {
        val sh = Dedup.shingleHashRows(T(s, d, "documents"), n = 3)
        val fd = sh.groupBy("hraw").agg(min(col("doc_id")).as("first_doc"))
        sh.join(fd, "hraw")
          .filter(col("doc_id") < 200)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            expr("(10000 * n_novel) div n_shingles").as("novelty_bp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |sh AS (SELECT DISTINCT doc_id,
             |              unnest(list_transform(generate_series(1, len(t) - 2),
             |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
             |       FROM tt),
             |fd AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
             |SELECT sh.doc_id, count(*) AS n_shingles,
             |       CAST(sum(CASE WHEN fd.first_doc = sh.doc_id THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_novel,
             |       (10000 * CAST(sum(CASE WHEN fd.first_doc = sh.doc_id THEN 1 ELSE 0 END)
             |            AS BIGINT)) // count(*) AS novelty_bp
             |FROM sh JOIN fd USING (s)
             |WHERE sh.doc_id < 200
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Zipf's-law fit: OLS slope of ln(freq) against ln(rank) over the top
    // 1000 words (a Zipfian corpus sits near slope -1). The global
    // row_number window runs over the VOCABULARY (Zipf ⇒ ≪ corpus — the
    // corpus-wide shuffle already happened in the word count), so the
    // single-partition window is bounded; ties rank deterministically via
    // (cnt DESC, word).
    QueryDef("tx_zipf",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("word"))
        TextAnalysis.wordCount(T(s, d, "documents"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 1000)
          .agg(count(lit(1)).as("n_words"),
            round(regr_slope(log(col("cnt")), log(col("rnk"))), 4).as("zipf_slope"),
            round(regr_r2(log(col("cnt")), log(col("rnk"))), 4).as("zipf_r2"))
      },
      Some(s"""WITH toks AS (SELECT unnest($tk) AS word FROM documents),
             |wc AS (SELECT word, count(*) AS cnt FROM toks
             |       WHERE length(word) > 0 GROUP BY 1),
             |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rnk
             |       FROM wc)
             |SELECT count(*) AS n_words,
             |       round(regr_slope(ln(cnt), ln(rnk)), 4) AS zipf_slope,
             |       round(regr_r2(ln(cnt), ln(rnk)), 4) AS zipf_r2
             |FROM rk WHERE rnk <= 1000""".stripMargin)),

    // Bigram language model head: each frequent word's most likely
    // successor with its conditional probability P(b|a) = c(a,b)/c(a) —
    // the next-token table a count-based LM serves. Unigram/bigram counts
    // are the usual explode aggregates; the per-word argmax is the
    // WindowGroupLimit row_number shape; probability is an exact integer
    // ratio rounded at 4.
    QueryDef("tx_nextword",
      (s, d) => {
        val toks = T(s, d, "documents")
          .select(TextFns.tokens(col("text")).as("toks"))
        val uni = toks.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
          .filter(col("cw") >= 50)
        val bi = toks.filter(size(col("toks")) >= 2)
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w"), b.as("nxt")))).as("bg"))
          .select(col("bg.w").as("w"), col("bg.nxt").as("nxt"))
          .groupBy("w", "nxt").agg(count(lit(1)).as("cab"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("w").orderBy(col("cab").desc, col("nxt"))
        bi.join(uni, "w")
          .withColumn("rn", row_number().over(win))
          .filter(col("rn") === 1)
          .select(col("w"), col("nxt"),
            round(col("cab").cast("double") / col("cw"), 4).as("p_next"))
          .orderBy("w")
      },
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |pos AS (SELECT doc_id, unnest(t) AS w,
             |               unnest(generate_series(1, len(t))) AS i FROM tt),
             |uni AS (SELECT w, count(*) AS cw FROM pos GROUP BY 1 HAVING count(*) >= 50),
             |bi AS (SELECT a.w AS w, b.w AS nxt, count(*) AS cab
             |       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             |       GROUP BY 1, 2),
             |r AS (SELECT bi.w, bi.nxt, bi.cab, uni.cw,
             |             row_number() OVER (PARTITION BY bi.w
             |                                ORDER BY bi.cab DESC, bi.nxt) AS rn
             |      FROM bi JOIN uni ON uni.w = bi.w)
             |SELECT w, nxt, round(CAST(cab AS DOUBLE) / cw, 4) AS p_next
             |FROM r WHERE rn = 1 ORDER BY w""".stripMargin)),

    // Collocation mining via pointwise mutual information: PMI(a,b) =
    // ln(P(a,b) / (P(a)P(b))) over adjacent-token pairs. Unigram and bigram
    // count tables are plain explode+groupBy aggregates; the two corpus
    // totals are scalar aggregates broadcast into the scoring join, and the
    // unigram table joins in twice (a- and b-side) — at 100 TB both are
    // fine: the word table is vocabulary-sized (Zipf ⇒ ≪ corpus), the
    // totals are single rows. The >= 20 support floor keeps PMI out of the
    // noisy low-count regime. The hash surface is the exact-integer PMI
    // ratio — numerator cnt·n_tok² and denominator n_big·ca·cb as BIGINTs
    // (the ts_cusum/rel_benford idiom): ln() is the one op where JVM Math
    // .log and DuckDB libm sit 1 ulp apart, and round(ln(...), 4) flips on
    // .00005 half-boundaries (the r6 red row). The ln-PMI double itself is
    // spec-checked under tolerance in TextAnalysisSpec. Bounds: num =
    // cnt·n_tok² needs cnt·n_tok² < 2^63 — true through sf1 (n_tok ≈ 2.7e6
    // ⇒ n_tok² ≈ 7e12, cnt ≪ 1e5); at corpus scales beyond that, divide
    // num/den first (one IEEE-exact division) and hash the quantized ratio.
    QueryDef("tx_pmi",
      (s, d) => {
        val toks = T(s, d, "documents")
          .select(TextFns.tokens(col("text")).as("toks"))
        val words = toks.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val pairs = toks.filter(size(col("toks")) >= 2)
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w_a"), b.as("w_b")))).as("bg"))
          .select(col("bg.w_a").as("w_a"), col("bg.w_b").as("w_b"))
          .groupBy("w_a", "w_b").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 20)
        val nTok = words.agg(sum(col("cw")).as("n_tok"))
        val nBig = toks.filter(size(col("toks")) >= 2)
          .agg(sum(size(col("toks")) - 1).as("n_big"))
        pairs
          .join(words.select(col("w").as("w_a"), col("cw").as("ca")), "w_a")
          .join(words.select(col("w").as("w_b"), col("cw").as("cb")), "w_b")
          .crossJoin(broadcast(nTok))
          .crossJoin(broadcast(nBig))
          .select(col("w_a"), col("w_b"), col("cnt"),
            (col("cnt") * col("n_tok") * col("n_tok")).as("pmi_num"),
            (col("n_big") * col("ca") * col("cb")).as("pmi_den"))
          .orderBy("w_a", "w_b")
      },
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |pos AS (SELECT doc_id, unnest(t) AS w,
             |               unnest(generate_series(1, len(t))) AS i FROM tt),
             |w AS (SELECT w, count(*) AS cw FROM pos GROUP BY 1),
             |bg AS (SELECT a.w AS w_a, b.w AS w_b, count(*) AS cnt
             |       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             |       GROUP BY 1, 2 HAVING count(*) >= 20),
             |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tok FROM w),
             |mb AS (SELECT CAST(sum(len(t) - 1) AS BIGINT) AS n_big
             |       FROM tt WHERE len(t) >= 2)
             |SELECT bg.w_a, bg.w_b, bg.cnt,
             |       bg.cnt * n_tok * n_tok AS pmi_num,
             |       n_big * wa.cw * wb.cw AS pmi_den
             |FROM bg
             |JOIN w wa ON wa.w = bg.w_a
             |JOIN w wb ON wb.w = bg.w_b, tot, mb
             |ORDER BY bg.w_a, bg.w_b""".stripMargin)),

    // End-to-end training-data curation pipeline in one declarative plan:
    // quality-score → filter (tokens >= 5, stopword ratio >= 5%) → exact
    // dedup among survivors (min doc_id per text) → corpus summary. At
    // scale this is one scan + one groupBy(text-hash) shuffle + a scalar
    // agg — each stage is a pipeline stage Catalyst fuses, nothing
    // materializes between them.
    QueryDef("tx_pipeline_e2e",
      (s, d) => {
        val docs = T(s, d, "documents")
        // quality columns computed inline on the scan (same formulas as
        // TextAnalysis.quality) — NOT via a join back to the quality()
        // output, which would shuffle the corpus on doc_id for columns the
        // scan can carry along. Single pass: scan → filter → groupBy(text).
        val stop = Seq("the", "a", "of", "to", "and")
        val kept = docs
          .select(col("doc_id"), col("text"), TextFns.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("text"),
            size(col("toks")).cast("bigint").as("n_tokens"),
            round(size(filter(col("toks"), x => x.isin(stop.map(s => s: Any): _*)))
              .cast("double") / size(col("toks")), 4).as("stopword_ratio"))
          .filter(col("n_tokens") >= 5 && col("stopword_ratio") >= 0.05)
        // One grouped pass yields every post-filter stat: per-text copy
        // counts roll up to quality_kept (sum), unique_kept (group count),
        // and token totals — the corpus is tokenized exactly once. Only
        // total_docs needs a second (count-only, column-less) scan.
        val grouped = kept.groupBy("text")
          .agg(count(lit(1)).as("copies"), max("n_tokens").as("n_tokens"))
        grouped.agg(
          sum("copies").as("quality_kept"),
          count(lit(1)).as("unique_kept"),
          sum("n_tokens").as("tokens_kept"),
          round(avg("n_tokens"), 4).as("avg_tokens"))
          .crossJoin(docs.agg(count(lit(1)).as("total_docs")))
          .select("total_docs", "quality_kept", "unique_kept", "tokens_kept", "avg_tokens")
      },
      Some(s"""WITH tt AS (SELECT doc_id, text, $tk AS t FROM documents),
             |q AS (SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
             |        round(CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE) / len(t), 4) AS sr
             |      FROM tt),
             |kept AS (SELECT * FROM q WHERE n_tokens >= 5 AND sr >= 0.05),
             |dedup AS (SELECT min(doc_id) AS doc_id, max(n_tokens) AS n_tokens FROM kept GROUP BY text)
             |SELECT (SELECT count(*) FROM documents) AS total_docs,
             |       (SELECT count(*) FROM kept) AS quality_kept,
             |       count(*) AS unique_kept,
             |       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
             |       round(avg(n_tokens), 4) AS avg_tokens
             |FROM dedup""".stripMargin)),

    // Data-mixture plan: given a uniform per-source token budget, the
    // sampling rate (downsample) or epoch count (upsample) each source
    // needs to hit its share — the planning step between corpus stats and
    // actual training-mix assembly (tx_split_assign then executes a rate
    // with the same hash device). Integer-exact: budget_share is an exact
    // integer division remainder-safe ceiling/floor pair; the rate is one
    // floor quantization.
    QueryDef("tx_mixture_plan",
      (s, d) => {
        val perSource = T(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(TextFns.tokens(col("text"))).cast("bigint")).as("tokens"))
        val budget = 1000000L
        perSource
          .withColumn("n_sources",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy()))
          .withColumn("budget_share", (lit(budget) / col("n_sources")).cast("bigint"))
          .select(col("source"), col("n_docs"), col("tokens"), col("budget_share"),
            (floor(col("budget_share") * lit(10000.0) / col("tokens")) / 10000)
              .as("sample_rate"),
            // epochs needed when upsampling: ceil(share / tokens), 1 when share <= tokens
            greatest(lit(1L),
              floor((col("budget_share") + col("tokens") - 1) / col("tokens"))
                .cast("bigint")).as("epochs"))
          .orderBy("source")
      },
      Some(s"""WITH ps AS (SELECT source, count(*) AS n_docs,
             |                   CAST(sum(len($tk)) AS BIGINT) AS tokens
             |            FROM documents GROUP BY 1),
             |w AS (SELECT *, count(*) OVER () AS n_sources FROM ps),
             |b AS (SELECT *, CAST(1000000 // n_sources AS BIGINT) AS budget_share FROM w)
             |SELECT source, n_docs, tokens, budget_share,
             |       floor(budget_share * 10000.0 / tokens) / 10000 AS sample_rate,
             |       greatest(1, CAST(floor((budget_share + tokens - 1) * 1.0 / tokens) AS BIGINT)) AS epochs
             |FROM b ORDER BY source""".stripMargin)),

    // Mixture-sample EXECUTION: apply per-source sampling rates with the
    // repo's mandated deterministic hash (HashFns.knuthU — reproducible
    // across runs, engines, and partitionings) and report realized vs
    // target mixture per source. The keep test is exact in signed 64
    // (u * 10000 < rate_bp * 2^32 — no float cut point), the per-source
    // rate is derived deterministically from the source name, and the
    // whole query is one scan + one keyed aggregate: the assembly step a
    // training-mix build runs after tx_mixture_plan chooses rates.
    QueryDef("tx_mixture_sample",
      (s, d) => {
        val u = graft.functions.HashFns.knuthU(col("doc_id"))
        T(s, d, "documents")
          .withColumn("rate_bp",
            (lit(1000) + lit(800) * (ascii(expr("right(source, 1)")) % 10))
              .cast("long"))
          .withColumn("keep", u * 10000 < col("rate_bp") * lit(4294967296L))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            max(col("rate_bp")).as("rate_bp"),
            sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_kept"))
          .withColumn("kept_bp", expr("(10000 * n_kept) div n_docs"))
          .select("source", "n_docs", "n_kept", "rate_bp", "kept_bp", "chars_kept")
          .orderBy("source")
      },
      Some(s"""WITH r AS (SELECT doc_id, source, n_chars,
             |                  ${graft.functions.HashFns.knuthUSql("doc_id")} AS u,
             |                  CAST(1000 + 800 * (ascii(right(source, 1)) % 10) AS BIGINT) AS rate_bp
             |           FROM documents)
             |SELECT source, count(*) AS n_docs,
             |       CAST(count(*) FILTER (WHERE u * 10000 < rate_bp * 4294967296) AS BIGINT) AS n_kept,
             |       max(rate_bp) AS rate_bp,
             |       (10000 * count(*) FILTER (WHERE u * 10000 < rate_bp * 4294967296)) // count(*) AS kept_bp,
             |       CAST(coalesce(sum(n_chars) FILTER (WHERE u * 10000 < rate_bp * 4294967296), 0) AS BIGINT) AS chars_kept
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic 90/5/5 train/val/test assignment by multiplicative hash
    // of doc_id (the dataset-split assembly step — reproducible across
    // runs, engines, and partitionings, unlike randomSplit). Same
    // Knuth-hash construction as rel_sample_hash (31-bit mask keeps the
    // product exact in signed 64); per-(source, split) doc and token
    // rollup is what the mixture report reads.
    QueryDef("tx_split_assign",
      (s, d) => {
        val u = graft.functions.HashFns.knuthU(col("doc_id"))
        def cut(f: Double) = lit(graft.functions.HashFns.cut(f))
        T(s, d, "documents")
          .select(col("source"),
            when(u < cut(0.90), "train").when(u < cut(0.95), "val")
              .otherwise("test").as("split"),
            size(TextFns.tokens(col("text"))).cast("bigint").as("n_tok"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
          .orderBy("source", "split")
      },
      Some(s"""WITH t AS (
             |  SELECT source,
             |         CASE WHEN ${graft.functions.HashFns.knuthUSql("doc_id")}
             |                   < ${graft.functions.HashFns.cut(0.90)} THEN 'train'
             |              WHEN ${graft.functions.HashFns.knuthUSql("doc_id")}
             |                   < ${graft.functions.HashFns.cut(0.95)} THEN 'val'
             |              ELSE 'test' END AS split,
             |         CAST(len($tk) AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT source, split, count(*) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS tokens
             |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Gopher-style repetition signals: char share of the most frequent word
    // bigram + char share of all repeated bigrams, per doc. The quality
    // filter dimension that token-level stats (tx_ttr, tx_quality) miss —
    // boilerplate and looping text. All-integer intermediates, one floor
    // quantization; top-bigram tie-break is (count DESC, w1, w2) both sides.
    QueryDef("tx_repetition",
      // spread: see Tables.spread (solo A/B 2.14->1.77s)
      (s, d) => TextAnalysis.repetition(graft.Tables.spread(T(s, d, "documents"))).orderBy("doc_id"),
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |toks AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM tt),
             |big AS (SELECT doc_id, w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2 FROM toks),
             |bc AS (SELECT doc_id, w1, w2, count(*) AS c,
             |              CAST(length(w1) + length(w2) AS BIGINT) AS bl
             |       FROM big WHERE w2 IS NOT NULL GROUP BY ALL),
             |tc AS (SELECT doc_id, CAST(sum(length(w)) AS BIGINT) AS tok_chars FROM toks GROUP BY doc_id),
             |top AS (SELECT doc_id, w1, w2, c, bl,
             |               row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, w1, w2) AS rn
             |        FROM bc),
             |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             |               CAST(coalesce(sum(CASE WHEN c > 1 THEN c * bl END), 0) AS BIGINT) AS dup_chars
             |        FROM bc GROUP BY doc_id)
             |SELECT a.doc_id, a.n_bigrams,
             |       t.w1 || ' ' || t.w2 AS top_bigram,
             |       CAST(t.c AS BIGINT) AS top_cnt,
             |       floor(t.c * t.bl * 10000.0 / tc.tok_chars) / 10000 AS top_share,
             |       floor(a.dup_chars * 10000.0 / tc.tok_chars) / 10000 AS dup_share
             |FROM agg a
             |JOIN top t ON t.doc_id = a.doc_id AND t.rn = 1
             |JOIN tc ON tc.doc_id = a.doc_id
             |ORDER BY a.doc_id""".stripMargin)),

    // Character-level Shannon entropy per doc — the gibberish / compression
    // detector quality filters pair with repetition stats (low entropy =
    // repeated chars/boilerplate, near-log2(alphabet) = random noise).
    // H = (ln n - Σ k·ln k / n) / ln 2 over exact integer char counts; the
    // engines sum the k·ln k terms in different orders (~1e-9 noise after
    // /n), so round(3) — the same precedent as fn_trig's ln-based log2.
    QueryDef("tx_char_entropy",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
        .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
        .groupBy("doc_id").agg(
          sum("k").as("n"),
          count(lit(1)).as("n_distinct"),
          sum(col("k") * log(col("k"))).as("s"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          round((log(col("n")) - col("s") / col("n")) / log(lit(2.0)), 3)
            .as("entropy_bits"))
        .orderBy("doc_id"),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
             |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY ALL),
             |agg AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
             |               count(*) AS n_distinct,
             |               sum(k * ln(k)) AS s
             |        FROM cnt GROUP BY doc_id)
             |SELECT doc_id, n, n_distinct,
             |       round((ln(n) - s / n) / ln(2.0), 3) AS entropy_bits
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // Overlapping token chunking (64-token windows, stride 48) — the
    // context-window assembly step of a training pipeline. Shuffle-free
    // per-row flatMap; the oracle replays the same slice arithmetic with
    // DuckDB list functions. Final chunk is the first reaching the doc end.
    QueryDef("tx_chunk",
      (s, d) => TextAnalysis.chunk(T(s, d, "documents"), size = 64, stride = 48)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH tt AS (SELECT doc_id, $tk AS t FROM documents),
             |n AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM tt WHERE len(t) > 0),
             |c AS (SELECT doc_id, t, n,
             |             unnest(generate_series(0, greatest(0, CAST(floor((n - 17) / 48.0) AS BIGINT)))) AS chunk_id
             |      FROM n),
             |sl AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |              t[chunk_id * 48 + 1 : least(chunk_id * 48 + 64, n)] AS ct
             |       FROM c)
             |SELECT doc_id, chunk_id,
             |       CAST(len(ct) AS BIGINT) AS n_tok,
             |       array_to_string(ct, ' ') AS chunk_text
             |FROM sl ORDER BY doc_id, chunk_id""".stripMargin))
  )
}
