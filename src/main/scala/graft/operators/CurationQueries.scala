package graft.operators

import graft.functions.TextFns
import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second curation/layout inventory page: web-corpus URL dedup, mixture
  * planning, PQ serving, audio pitch, layout compaction/partition planning,
  * HITS scoring, masking, and watermark sizing — the operational queries a
  * training-data pipeline runs AROUND the core dedup/similarity batteries
  * in [[PipelineQueries]]. Same QueryDef contract: Spark plan + DuckDB
  * oracle side by side, deterministic ORDER BY, exact-integer or
  * quantized-far-from-noise outputs.
  */
object CurationQueries {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val queries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // URL-keyed dedup — the FIRST dedup pass every web corpus runs (before
    // any content hashing): canonicalize the crawl URL (case, default
    // port, tracking params, param order, fragment, trailing slash) and
    // keep the best-covered fetch per canonical URL (longest text, min
    // doc_id on ties). Messiness is injected deterministically from
    // doc_id (same scheme as fn_url_canonical, but keyed on doc_id % 25
    // so canonical groups actually collide: ~5 docs per URL per source at
    // sf0.01); the oracle states the canonical value closed-form and
    // replays the keeper argmax. Scale shape: one string-normalize
    // projection + one groupBy(canonical) — linear, no joins.
    QueryDef("dd_url_dedup",
      (s, d) => {
        val messy = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
          when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
          lit(".EXAMPLE.com:443/docs/"), col("doc_id") % 25,
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&page="), col("doc_id") % 25, lit("&b=2&a=1"),
          when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        val noFrag = regexp_replace(messy, "#.*$", "")
        val host = lower(parse_url(noFrag, lit("HOST")))
        val path = regexp_replace(parse_url(noFrag, lit("PATH")), "/$", "")
        val canonQ = concat_ws("&",
          array_sort(filter(split(parse_url(noFrag, lit("QUERY")), "&"),
            p => !p.startsWith("utm_"))))
        T(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            concat(lit("https://"), host, path,
              when(length(canonQ) > 0, concat(lit("?"), canonQ)).otherwise(lit("")))
              .as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"),
            max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"),
              col("doc_id").as("kid"))).as("best"))
          .select(col("canonical_url"), col("n_docs"),
            col("best.kid").as("keeper_id"), col("best.n_chars").as("keeper_chars"))
          .orderBy("canonical_url")
      },
      Some("""WITH c AS (SELECT doc_id, n_chars,
             |  'https://' || lower(source) || '.example.com/docs/' || (doc_id % 25) ||
             |  '?a=1&b=2&page=' || (doc_id % 25) AS canonical_url
             |  FROM documents)
             |SELECT canonical_url, count(*) AS n_docs,
             |       (max({'c': n_chars, 'n': -doc_id, 'id': doc_id})).id AS keeper_id,
             |       (max({'c': n_chars, 'n': -doc_id, 'id': doc_id})).c AS keeper_chars
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // Temperature-scaled domain mixture — the data-recipe step that turns
    // per-domain token counts into sampling weights w_i ∝ n_i^α (α = 0.5
    // here: the standard up-weight-the-tail exponent between proportional
    // α=1 and uniform α=0). Determinism: n^0.5 is sqrt, the ONE
    // transcendental-free power — IEEE 754 requires sqrt correctly
    // rounded, so both engines produce the identical double from the same
    // integer, and one floor quantization to a BIGINT micro-weight makes
    // the shares exact integer arithmetic end to end (the ts_cusum /
    // rel_benford idiom; a general α would go through exp/ln and need a
    // tolerance gate instead). Two aggregates, O(domains) output.
    QueryDef("tx_domain_mixture",
      (s, d) => {
        val g = T(s, d, "documents")
          .select(col("source"), size(TextFns.tokens(col("text"))).cast("long").as("ntok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
          .withColumn("sqrt_weight_q",
            floor(sqrt(col("n_tokens").cast("double")) * lit(1e6)).cast("long"))
        val tot = broadcast(g.agg(sum(col("sqrt_weight_q")).as("tot")))
        g.crossJoin(tot)
          .select(col("source"), col("n_docs"), col("n_tokens"), col("sqrt_weight_q"),
            expr("(sqrt_weight_q * 10000) div tot").as("share_bp"))
          .orderBy("source")
      },
      Some(s"""WITH tt AS (SELECT source,
             |  CAST(len(${TextFns.tokensSqlDuckDB("text")}) AS BIGINT) AS ntok
             |  FROM documents),
             |g AS (SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
             |      FROM tt GROUP BY 1),
             |q AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
             |               AS sqrt_weight_q FROM g),
             |t AS (SELECT CAST(sum(sqrt_weight_q) AS BIGINT) AS tot FROM q)
             |SELECT source, n_docs, n_tokens, sqrt_weight_q,
             |       (sqrt_weight_q * 10000) // tot AS share_bp
             |FROM q, t ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // Autocorrelation pitch per audio clip (Multimodal.wavAutocorrPitch):
    // REAL WAV decode, then argmax_{lag∈[2,16]} Σ v[i]·v[i+lag] in pure
    // Long arithmetic — every product of 16-bit samples is exact, so the
    // winning lag hash-matches the DuckDB replay of the synth closed form
    // (v_i = (doc_id·131 + i·17) % 2001 − 1000). One partition-local
    // decode+score pass, one row per clip, no shuffle.
    QueryDef("mm_wav_pitch",
      (s, d) => Multimodal.wavAutocorrPitch(
          Multimodal.withSynthPayload(T(s, d, "documents").select("doc_id"),
            Multimodal.synthWav), minLag = 2, maxLag = 16)
        .select(col("doc_id"), col("n_samples").cast("bigint").as("n_samples"),
          col("r0"), col("best_lag").cast("bigint").as("best_lag"), col("best_r"))
        .orderBy("doc_id"),
      Some("""WITH s AS (SELECT doc_id, 64 + doc_id % 50 AS n FROM documents),
             |i AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM s),
             |v AS (SELECT doc_id, n, i,
             |             CAST((doc_id * 131 + i * 17) % 2001 - 1000 AS BIGINT) AS v
             |      FROM i),
             |r0 AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
             |              CAST(sum(v * v) AS BIGINT) AS r0
             |       FROM v GROUP BY 1),
             |l AS (SELECT doc_id, unnest(generate_series(2, 16)) AS lag FROM documents),
             |r AS (SELECT a.doc_id, l.lag, CAST(sum(a.v * b.v) AS BIGINT) AS r
             |      FROM l JOIN v a ON a.doc_id = l.doc_id
             |             JOIN v b ON b.doc_id = a.doc_id AND b.i = a.i + l.lag
             |      GROUP BY 1, 2),
             |best AS (SELECT doc_id,
             |           CAST((max({'r': r, 'nl': -lag, 'lag': lag})).lag AS BIGINT) AS best_lag,
             |           (max({'r': r, 'nl': -lag, 'lag': lag})).r AS best_r
             |         FROM r GROUP BY 1)
             |SELECT r0.doc_id, r0.n_samples, r0.r0, best.best_lag, best.best_r
             |FROM r0 JOIN best USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // PQ asymmetric-distance (ADC) top-k — how an IVFPQ index serves a
    // query: the query stays exact, the corpus is its per-subspace codes,
    // and the scan cost per (vector, subspace) is one integer lookup into
    // a broadcast (subspace × codebook) distance table (never the raw
    // vectors — at 100 TB the code table is dim/subDim bytes per vector
    // instead of 4·dim, which is the point of PQ). sim_pq_encode gates the
    // codebook/assignment mechanism; this gates the SERVING path. The
    // oracle replays the same quantized pipeline, so the approximation is
    // shared, not forgiven.
    QueryDef("sim_pq_adc",
      (s, d) => Similarity.pqAdcTopK(T(s, d, "embeddings"),
        queryId = 0L, k = 10, subDim = 16),
      Some("""WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
             |                   unnest(generate_series(1, len(embedding))) AS i
             |            FROM embeddings),
             |e2 AS (SELECT vec_id, label, x, i, CAST((i - 1) // 16 AS BIGINT) AS ss FROM ex),
             |cent AS (SELECT label AS c_label, ss, i, avg(x) AS cx FROM e2 GROUP BY 1, 2, 3),
             |dd AS (SELECT e2.vec_id, e2.ss, cent.c_label,
             |              sum((e2.x - cent.cx) * (e2.x - cent.cx)) AS d2
             |       FROM e2 JOIN cent ON e2.i = cent.i AND e2.ss = cent.ss
             |       GROUP BY 1, 2, 3),
             |codes AS (SELECT vec_id, ss, (min({'d2': d2, 'c': c_label})).c AS code
             |          FROM dd GROUP BY 1, 2),
             |dt AS (SELECT ss, c_label AS code, d2 AS dq FROM dd WHERE vec_id = 0)
             |SELECT codes.vec_id, round(sum(dt.dq), 3) AS adc_d2
             |FROM codes JOIN dt ON dt.ss = codes.ss AND dt.code = codes.code
             |WHERE codes.vec_id <> 0
             |GROUP BY 1 ORDER BY adc_d2, vec_id LIMIT 10""".stripMargin)),

    // ------------------------------------------------------------------
    // Small-file compaction plan — the table-maintenance OPTIMIZE step: a
    // file listing (simulated as l_orderkey div 250 row-groups) is walked
    // in key order and split at cumulative-row boundaries into target-
    // sized output bins (cum_prev div target = the standard sorted
    // bin-boundary plan; bins preserve key order so downstream range
    // pruning survives compaction). The cumulative window runs over FILE
    // METADATA — O(corpus / file size) rows, the same bounded-spine
    // argument as tx_zipf's vocabulary window; the plan itself never
    // touches data rows. Output: one row per planned output file.
    QueryDef("rel_compaction_plan",
      (s, d) => {
        val files = T(s, d, "lineitem")
          .groupBy(expr("l_orderkey div 250").as("file_id"))
          .agg(count(lit(1)).as("n_rows"))
        val w = Window.orderBy("file_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        files
          .withColumn("cum_prev", coalesce(sum(col("n_rows")).over(w), lit(0L)))
          .withColumn("bin", expr("cum_prev div 5000"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("total_rows"),
            min(col("file_id")).as("first_file"), max(col("file_id")).as("last_file"))
          .orderBy("bin")
      },
      Some("""WITH f AS (SELECT l_orderkey // 250 AS file_id, count(*) AS n_rows
             |           FROM lineitem GROUP BY 1),
             |c AS (SELECT file_id, n_rows,
             |             CAST(coalesce(sum(n_rows) OVER (ORDER BY file_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |               AS BIGINT) AS cum_prev
             |      FROM f)
             |SELECT cum_prev // 5000 AS bin, count(*) AS n_files,
             |       CAST(sum(n_rows) AS BIGINT) AS total_rows,
             |       min(file_id) AS first_file, max(file_id) AS last_file
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // Date-partition sizing advisor — the WRITE-side layout twin of
    // rel_compaction_plan (that one merges small files; this one splits
    // hot partitions): per ingest day, event volume, recommended file
    // split count at a 2000-rows/file target (exact ceiling division),
    // and the day's volume skew vs. the mean day in basis points. All
    // integer arithmetic over an O(days) aggregate.
    QueryDef("rel_partition_advisor",
      (s, d) => {
        val g = T(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"))
        val tot = broadcast(g.agg(sum(col("n_events")).as("tot"),
          count(lit(1)).as("n_days")))
        g.crossJoin(tot)
          .select(col("day"), col("n_events"),
            expr("(n_events + 1999) div 2000").as("n_splits"),
            expr("(n_events * 10000 * n_days) div tot").as("vs_mean_bp"))
          .orderBy("day")
      },
      Some("""WITH g AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |                  count(*) AS n_events
             |           FROM events GROUP BY 1),
             |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot, count(*) AS n_days FROM g)
             |SELECT day, n_events, (n_events + 1999) // 2000 AS n_splits,
             |       (n_events * 10000 * n_days) // tot AS vs_mean_bp
             |FROM g, t ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // HITS hubs & authorities over the near-dup graph oriented
    // later→earlier (src = the copying doc, dst = the copied original):
    // 5 un-normalized integer power-iteration rounds (see Graph.hits for
    // why integer + one terminal quantized division beats per-round L2
    // normalization under a hash gate), replayed by the oracle as an
    // unrolled MATERIALIZED CTE chain — the gr_kcore/gr_pagerank idiom.
    QueryDef("gr_hits",
      (s, d) => Graph.hits(
          Dedup.jaccardFromStats(PipelineQueries.pairStats(s, d), minJ = 0.8)
            .select(col("b_id").as("src"), col("a_id").as("dst")),
          iters = 5)
        .orderBy("id"),
      Some {
        val rounds = (1 to 5).map { r =>
          s"""a$r AS MATERIALIZED (SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS a
             |  FROM n LEFT JOIN (SELECT dst AS id, sum(h) AS v
             |                    FROM e JOIN h${r - 1} ON h${r - 1}.id = e.src
             |                    GROUP BY 1) s USING (id)),
             |h$r AS MATERIALIZED (SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS h
             |  FROM n LEFT JOIN (SELECT src AS id, sum(a) AS v
             |                    FROM e JOIN a$r ON a$r.id = e.dst
             |                    GROUP BY 1) s USING (id))""".stripMargin
        }.mkString(",\n")
        s"""WITH ${PipelineQueries.jaccardCtes},
           |prs AS (SELECT a_id, b_id FROM inter
           |        JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
           |        WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.8),
           |e AS MATERIALIZED (SELECT b_id AS src, a_id AS dst FROM prs),
           |n AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |h0 AS (SELECT id, CAST(1 AS BIGINT) AS h FROM n),
           |$rounds,
           |mx AS (SELECT max(h) AS mh, max(a) AS ma FROM h5 JOIN a5 USING (id))
           |SELECT h5.id, h5.h AS hub, a5.a AS auth,
           |       (h5.h * 10000) // greatest(mx.mh, 1) AS hub_bp,
           |       (a5.a * 10000) // greatest(mx.ma, 1) AS auth_bp
           |FROM h5 JOIN a5 USING (id), mx ORDER BY id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Data masking battery: Spark's codegen'd mask() in default and
    // custom-replacement forms over a mixed-case/digit surrogate built
    // from real columns — the PII-desensitization sibling of
    // tx_pii_redact (that one finds and strips structured PII; this one
    // shape-preserves everything for test-data generation). The oracle
    // replays mask() as ordered regexp_replace chains (custom form
    // replaces the OTHER class first so injected replacement chars are
    // never re-matched). ASCII corpus by construction (TextFns scope note).
    QueryDef("fn_mask",
      (s, d) => {
        val raw = concat(upper(substring(col("source"), 1, 3)), lit("-"),
          col("lang"), lit("-"), col("doc_id"), lit(":"),
          substring(col("text"), 1, 24))
        T(s, d, "documents")
          .select(col("doc_id"), raw.as("raw"), mask(raw).as("masked"),
            mask(raw, lit("#"), lit("."), lit("0"), lit("_")).as("masked_custom"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (SELECT doc_id,
             |  upper(substr(source, 1, 3)) || '-' || lang || '-' || doc_id || ':' ||
             |  substr(text, 1, 24) AS raw FROM documents)
             |SELECT doc_id, raw,
             |  regexp_replace(regexp_replace(regexp_replace(raw,
             |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
             |    '[^A-Za-z0-9]', '_', 'g'),
             |    '[A-Z]', '#', 'g'), '[a-z]', '.', 'g'), '[0-9]', '0', 'g') AS masked_custom
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Watermark-delay sizing: the out-of-orderness histogram every
    // streaming deployment measures BEFORE choosing withWatermark(δ) —
    // each event's lateness vs. the running max EVENT-time among events
    // that ARRIVED before it, bucketed to minutes; pick δ at the bucket
    // covering your completeness target. The source table is perfectly
    // ordered (it is a synthetic log), so arrival time is simulated as
    // ts + a deterministic 0–10-minute delivery jitter hashed from
    // event_id — the standard replay-harness move for sizing a watermark
    // before the real (disordered) feed exists. The window is partitioned
    // by the stream's key (user), never global; all arithmetic is exact
    // integer seconds. ts_interarrival profiles event-time gaps; this
    // profiles arrival-vs-event-time disorder — the axis watermarks
    // actually care about.
    QueryDef("ts_watermark_lateness",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("arr_s", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        T(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("ts_s"))
          .withColumn("arr_s", col("ts_s") + (col("event_id") * 7919) % 600)
          .withColumn("prev_max", max(col("ts_s")).over(w))
          .select(
            expr("greatest(coalesce(prev_max - ts_s, 0), 0) div 60").as("late_min"))
          .groupBy("late_min").agg(count(lit(1)).as("n_events"))
          .orderBy("late_min")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
             |           FROM events),
             |x AS (SELECT user_id, event_id, ts_s,
             |             ts_s + (event_id * 7919) % 600 AS arr_s FROM e),
             |p AS (SELECT ts_s,
             |             max(ts_s) OVER (PARTITION BY user_id ORDER BY arr_s, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
             |      FROM x)
             |SELECT greatest(coalesce(prev_max - ts_s, 0), 0) // 60 AS late_min,
             |       count(*) AS n_events
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
