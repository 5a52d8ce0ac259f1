package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator inventory (SURVEY §2.3): scans, projection,
  * filters/predicates, join strategies, aggregation, cube/rollup/grouping
  * sets, windows, sorts/top-k, set ops, string/math functions.
  *
  * Float determinism: money columns (2-decimal doubles) are summed as
  * decimal(18, s) — exact, order-independent — then cast back to double, so
  * Spark and DuckDB agree bit-for-bit regardless of partitioning (and the
  * result is stable on a 1000-executor cluster, not just local[4]).
  */
object RelationalQueries {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Exact order-independent sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact sum of extendedprice*(1-discount) (4-decimal products). */
  private def drevenue(price: Column, disc: Column): Column =
    sum(price.cast("decimal(18,2)") * (lit(1) - disc).cast("decimal(18,2)")).cast("double")

  val queries: Seq[QueryDef] = Seq(

    QueryDef("rel_filter_project",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_returnflag") === "R" && col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
          col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
             |       round(l_extendedprice * (1 - l_discount), 4) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_returnflag = 'R' AND l_quantity > 40
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // TPC-H Q1-shaped pricing summary: partial aggregation + tiny shuffle.
    QueryDef("rel_agg_q1",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          drevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          (floor(dsum(col("l_discount")) * lit(1000000.0) / count(lit(1))) / 1000000)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
             |       avg(l_quantity) AS avg_qty,
             |       floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             |             * 1000000.0 / count(*)) / 1000000 AS avg_disc,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("rel_agg_stats",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qty_disc"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       round(stddev_samp(l_quantity), 4) AS sd_qty,
             |       round(var_samp(l_quantity), 4) AS var_qty,
             |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             |       round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
             |       min(l_extendedprice) AS min_price,
             |       max(l_extendedprice) AS max_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("rel_agg_distinct",
      (s, d) => T(s, d, "lineitem").agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"),
        count_distinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"),
        count(lit(1)).as("n_rows")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |       count(DISTINCT l_suppkey) AS n_supps,
             |       count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
             |       count(*) AS n_rows
             |FROM lineitem""".stripMargin)),

    // The HLL sketch value differs from DuckDB's sketch, so the raw estimate
    // cannot hash-match an oracle; instead the query OUTPUTS the quality
    // gate: exact cardinalities plus booleans asserting the estimates land
    // within a 3-sigma band (default rsd 0.05 is a STANDARD DEVIATION, not
    // a bound — a 1-sigma band would legitimately fail ~1/3 of the time on
    // fresh data; 15% catches gross sketch regressions without phantom
    // failures). The oracle computes the exact counts and expects TRUE.
    QueryDef("rel_approx_distinct",
      (s, d) => {
        def ok(c: String) =
          abs(approx_count_distinct(col(c)) - count_distinct(col(c)))
            .leq(count_distinct(col(c)).cast("double") * 0.15)
        T(s, d, "lineitem").agg(
          count_distinct(col("l_partkey")).as("exact_parts"),
          count_distinct(col("l_orderkey")).as("exact_orders"),
          ok("l_partkey").as("parts_within_band"),
          ok("l_orderkey").as("orders_within_band"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
             |       count(DISTINCT l_orderkey) AS exact_orders,
             |       TRUE AS parts_within_band,
             |       TRUE AS orders_within_band
             |FROM lineitem""".stripMargin)),

    // Mergeable sketches — THE re-aggregation pattern at 100 TB: build one
    // HLL sketch per shard (nation), then roll shards up to region by
    // sketch UNION, never re-touching the raw rows. The estimate is gated
    // with the same 15% band-boolean trick as rel_approx_distinct (exact
    // counts come along for the oracle hash).
    QueryDef("rel_hll_merge",
      (s, d) => {
        val nation = T(s, d, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))
        val perNation = T(s, d, "customer")
          .groupBy("c_nationkey")
          .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
        val est = perNation
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_regionkey")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = T(s, d, "customer")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_regionkey")
          .agg(count_distinct(col("c_custkey")).as("exact_custs"))
        exact.join(est, Seq("n_regionkey"))
          .select(col("n_regionkey"), col("exact_custs"),
            (abs(col("est") - col("exact_custs")) <=
              col("exact_custs").cast("double") * 0.15).as("within_band"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, count(DISTINCT c_custkey) AS exact_custs,
             |       TRUE AS within_band
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // Corpus-overlap estimation by HLL inclusion-exclusion: |A∩B| ≈
    // est(A) + est(B) − est(A∪B), with the union estimated by sketch
    // UNION — the standard "how much do these two shards overlap" answer
    // at 100 TB (estimating the distinct overlap of two corpora without
    // ever joining them; the sketches are the only thing exchanged). Gated
    // with a 5%-or-10 absolute band against the exact INTERSECT count.
    QueryDef("rel_hll_intersect",
      (s, d) => {
        val li = T(s, d, "lineitem")
        def shard(flag: String, as: String) =
          li.filter(col("l_returnflag") === flag)
            .agg(hll_sketch_agg(col("l_suppkey")).as(as))
        val est = shard("R", "ska").crossJoin(shard("N", "skb"))
          .select((hll_sketch_estimate(col("ska"))
            + hll_sketch_estimate(col("skb"))
            - hll_sketch_estimate(hll_union(col("ska"), col("skb"))))
            .as("est_inter"))
        def keys(flag: String) =
          li.filter(col("l_returnflag") === flag).select("l_suppkey").distinct()
        val exact = keys("R").intersect(keys("N"))
          .agg(count(lit(1)).as("exact_inter"))
        exact.crossJoin(est)
          .select(col("exact_inter"),
            (abs(col("est_inter") - col("exact_inter")) <=
              greatest(col("exact_inter").cast("double") * 0.05, lit(10.0)))
              .as("within_band"))
      },
      Some("""SELECT (SELECT count(*) FROM
             |          (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
             |           INTERSECT
             |           SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'N')
             |       ) AS exact_inter,
             |       TRUE AS within_band""".stripMargin)),

    // Fixed-bound histogram: clamp-bucketed floor arithmetic (bounds are
    // constants, so the bucketing is a pure projection — no sampling pass)
    // with a dense per-bucket count. The all-shards-to-20-buckets shuffle
    // is O(buckets) after map-side partial aggregation.
    QueryDef("rel_histogram",
      (s, d) => T(s, d, "lineitem")
        .select(least(greatest(floor(col("l_extendedprice") / 5500.0), lit(0L)),
          lit(19L)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CAST(least(greatest(floor(l_extendedprice / 5500.0), 0), 19) AS BIGINT) AS bucket,
             |       count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Equi-DEPTH companion to rel_histogram's equi-width buckets: exact
    // deciles over a deterministic total order, per-bucket count + bounds.
    // SCALE FORM (no unpartitioned window): ntile over a global sort is
    // exactly reproducible as ntileFromRank(globalRowNumber, N) — a range
    // shuffle + per-partition local ranks + a broadcast scalar N — so the
    // benched plan never funnels the fact table through one sort task, and
    // the DuckDB ntile oracle still hash-matches row for row (the
    // distributed rank IS the global rank, not an approximation of it).
    QueryDef("rel_histogram_eqdepth",
      (s, d) => {
        val keys = Seq(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
        val ranked = DistributedRank.globalRowNumber(
          T(s, d, "lineitem")
            .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          keys, "rnk")
        val n = ranked.agg(count(lit(1)).as("n_rows"))
        ranked.crossJoin(broadcast(n))
          .select(col("l_extendedprice"),
            DistributedRank.ntileFromRank(col("rnk"), col("n_rows"), 10)
              .as("decile"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"),
            min(col("l_extendedprice")).as("lo"),
            max(col("l_extendedprice")).as("hi"))
          .orderBy("decile")
      },
      Some("""SELECT decile, count(*) AS n, min(l_extendedprice) AS lo,
             |       max(l_extendedprice) AS hi
             |FROM (SELECT l_extendedprice,
             |             CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
             |                  l_linenumber) AS BIGINT) AS decile
             |      FROM lineitem)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // approx_percentile (positional-error quantile sketch) banded against
    // the exact median: |approx - exact| must stay within 2% of exact.
    QueryDef("rel_approx_quantile",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          median(col("l_extendedprice")).as("exact_med"),
          // accuracy 1000, not 10000 (r12 adjudication of the r11 band
          // violation): the gate only asserts the estimate lands within 2%
          // of the exact median VALUE, and accuracy=1000 already bounds the
          // RANK error at 0.1% — 10000 bought a 10x tighter bound nobody
          // reads while its QuantileSummaries buffers carried ~a quarter of
          // the query (solo med 2.29s at 10000 vs 1.77s at 1000, same
          // machine back-to-back; the remainder is the exact median)
          (abs(approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
            - median(col("l_extendedprice")))
            <= median(col("l_extendedprice")) * 0.02).as("within_band"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, median(l_extendedprice) AS exact_med,
             |       TRUE AS within_band
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // MERGEABLE quantile sketches — the re-aggregation story for quantiles
    // at 100 TB, completing what rel_hll_merge does for distinct counts:
    // one bounded KLL-style sketch per shard (return flag), shards rolled up
    // by sketch MERGE (graft.functions.QuantileSketch — Spark has
    // approx_percentile but no mergeable quantile state pair), estimates
    // read off the merged sketch. Gated with a RANK band: each estimate
    // must land between the exact (q-2%) and (q+2%) percentiles — the
    // sketch's observed rank error is <1% (AggregatorsSpec), so the gate
    // has 2x headroom while still catching gross regressions. The exact
    // median comes along for the oracle hash.
    QueryDef("rel_quantile_merge",
      (s, d) => {
        import graft.functions.QuantileSketch.{sketch_agg, sketch_merge_agg, sketch_quantile}
        val li = T(s, d, "lineitem")
        val qs = Seq(25, 50, 75)
        val merged = li.groupBy("l_returnflag")
          .agg(sketch_agg(col("l_extendedprice")).as("sk"))
          .agg(sketch_merge_agg(col("sk")).as("sk"))
          .select(qs.map(q =>
            sketch_quantile(col("sk"), q / 100.0).as(s"est_p$q")): _*)
        // ONE percentile aggregate over an array of percentages: each scalar
        // `percentile(c, p)` call carries its own full value-count map
        // through partial-merge (7 separate maps of ~every distinct price
        // was 12s of the query's 15s at sf0.1); the array form shares one.
        val pcts = 0.5 +: qs.flatMap(q => Seq(q / 100.0 - 0.02, q / 100.0 + 0.02))
        val exact = li
          .agg(percentile(col("l_extendedprice"), array(pcts.map(lit): _*)).as("ps"))
          .select(col("ps")(0).as("exact_med") +:
            qs.zipWithIndex.flatMap { case (q, i) => Seq(
              col("ps")(2 * i + 1).as(s"lo_p$q"),
              col("ps")(2 * i + 2).as(s"hi_p$q")) }: _*)
        merged.crossJoin(exact)
          .select(col("exact_med") +: qs.map(q =>
            (col(s"est_p$q") >= col(s"lo_p$q") && col(s"est_p$q") <= col(s"hi_p$q"))
              .as(s"p${q}_within_band")): _*)
      },
      Some("""SELECT quantile_cont(l_extendedprice, 0.5) AS exact_med,
             |       TRUE AS p25_within_band, TRUE AS p50_within_band,
             |       TRUE AS p75_within_band
             |FROM lineitem""".stripMargin)),

    // Mergeable FREQUENCY sketches (Count-Min) — the third of the mergeable
    // sketch family (HLL: rel_hll_merge, KLL: rel_quantile_merge): one CMS
    // per shard (return flag) over the supplier key, shards rolled up by
    // cell-wise MERGE (graft.functions.FrequencySketch — Spark ships the
    // sketch but no merge aggregate), per-key frequencies estimated off the
    // merged sketch. Gated with the CMS one-sided guarantee: estimate >=
    // exact, and <= exact + ceil(eps * N); exact probe counts come along
    // for the oracle hash. Deterministic given (eps, confidence, seed).
    QueryDef("rel_cms_merge",
      (s, d) => {
        import graft.functions.FrequencySketch.{cms_agg, cms_estimate, cms_merge_agg, cms_total, DefaultEps}
        val li = T(s, d, "lineitem")
        val probes = Seq(1L, 2L, 3L)
        val merged = li.groupBy("l_returnflag")
          .agg(cms_agg(col("l_suppkey")).as("sk"))
          .agg(cms_merge_agg(col("sk")).as("sk"))
          .select(probes.map(k => cms_estimate(col("sk"), k).as(s"est_$k"))
            :+ cms_total(col("sk")).as("n"): _*)
        val exactCols = probes.map(k =>
          sum(when(col("l_suppkey") === k, 1L).otherwise(0L)).as(s"cnt_$k"))
        val exact = li.agg(exactCols.head, exactCols.tail: _*)
        merged.crossJoin(exact)
          .select(probes.map(k => col(s"cnt_$k")) ++ probes.map(k =>
            (col(s"est_$k") >= col(s"cnt_$k") &&
              col(s"est_$k") <= col(s"cnt_$k")
                + ceil(lit(DefaultEps) * col("n")).cast("bigint"))
              .as(s"k${k}_within_band")): _*)
      },
      Some("""SELECT CAST(sum(CASE WHEN l_suppkey = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_1,
             |       CAST(sum(CASE WHEN l_suppkey = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_2,
             |       CAST(sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_3,
             |       TRUE AS k1_within_band, TRUE AS k2_within_band,
             |       TRUE AS k3_within_band
             |FROM lineitem""".stripMargin)),

    // KMV/theta sketch SET ALGEBRA — the fourth mergeable sketch (HLL:
    // rel_hll_merge, KLL: rel_quantile_merge, CMS: rel_cms_merge): one
    // bounded k=64 sketch of the distinct-user hash per event type
    // (graft.functions.KmvSketch), then union / intersection / DIFFERENCE
    // estimates for every type pair read off the retained values below
    // theta = min of the two sketches' k-th minima — the estimate HLL
    // fundamentally cannot give for A\B (inclusion-exclusion subtracts
    // two large noisy numbers; theta algebra scales a direct sample
    // count). Unlike the banded sketch gates above, this one is
    // HASH-EXACT cross-engine: the sketch is a pure function of a
    // caller-stated affine-mod hash, so the oracle replays it with a
    // window rank and the estimates match bit-for-bit. Exact truths ride
    // along for calibration. Scale shape: one scan + one <= k-long row
    // per group through map-side combine; the pair algebra runs on a
    // 5-row frame (the type-pair nested loop is a broadcast of 5 rows —
    // a documented bounded anchor, not a data-sized cross).
    QueryDef("rel_kmv_setops",
      (s, d) => {
        import graft.functions.KmvSketch.{kmv_agg, DefaultK}
        val M = 1000000007L
        val ev = T(s, d, "events")
        val hs = ev.select(col("event_type").as("et"),
          expr(s"((user_id & 2147483647) * 2654435761 + 911) % $M").as("h"))
        val sk = hs.groupBy("et").agg(kmv_agg(col("h")).as("sk"))
        val du = ev.select(col("event_type").as("et"), col("user_id").as("u"))
          .distinct()
        val cnt = du.groupBy("et").agg(count(lit(1)).as("n"))
        val tr = du.select(col("et").as("eta"), col("u"))
          .join(du.select(col("et").as("etb"), col("u")), "u")
          .filter(col("eta") < col("etb"))
          .groupBy("eta", "etb").agg(count(lit(1)).as("true_inter"))
        val pairs = sk.select(col("et").as("eta"), col("sk").as("sa"))
          .join(sk.select(col("et").as("etb"), col("sk").as("sb")),
            col("eta") < col("etb"))
        val alg = pairs
          .withColumn("ta", expr(
            s"CASE WHEN size(sa) >= $DefaultK THEN element_at(sa, $DefaultK) ELSE $M END"))
          .withColumn("tb", expr(
            s"CASE WHEN size(sb) >= $DefaultK THEN element_at(sb, $DefaultK) ELSE $M END"))
          .withColumn("tc", least(col("ta"), col("tb")))
          .withColumn("rac", expr("filter(sa, v -> v < tc)"))
          .withColumn("rbc", expr("filter(sb, v -> v < tc)"))
          .withColumn("nin", expr(
            "CAST(size(filter(rac, v -> array_contains(rbc, v))) AS BIGINT)"))
          .select(col("eta"), col("etb"),
            expr(s"(CAST(size(filter(sa, v -> v < ta)) AS BIGINT) * $M) div ta")
              .as("est_a"),
            expr(s"(CAST(size(filter(sb, v -> v < tb)) AS BIGINT) * $M) div tb")
              .as("est_b"),
            expr(s"((CAST(size(rac) AS BIGINT) + CAST(size(rbc) AS BIGINT) - nin) * $M) div tc")
              .as("est_union"),
            expr(s"(nin * $M) div tc").as("est_inter"),
            expr(s"((CAST(size(rac) AS BIGINT) - nin) * $M) div tc")
              .as("est_diff"))
        alg
          .join(cnt.select(col("et").as("eta"), col("n").as("true_a")), "eta")
          .join(cnt.select(col("et").as("etb"), col("n").as("true_b")), "etb")
          .join(tr, Seq("eta", "etb"))
          .select(col("eta"), col("etb"), col("est_a"), col("est_b"),
            col("est_union"), col("est_inter"), col("est_diff"),
            col("true_a"), col("true_b"), col("true_inter"),
            (col("true_a") - col("true_inter")).as("true_diff"))
          .orderBy("eta", "etb")
      },
      Some("""WITH hs AS (SELECT DISTINCT event_type AS et,
             |              ((user_id & 2147483647) * 2654435761 + 911) % 1000000007 AS h
             |            FROM events),
             |rk AS (SELECT et, h, row_number() OVER (PARTITION BY et ORDER BY h) AS rn
             |       FROM hs),
             |sk AS (SELECT et, list(h ORDER BY h) AS s
             |       FROM rk WHERE rn <= 64 GROUP BY 1),
             |du AS (SELECT DISTINCT event_type AS et, user_id AS u FROM events),
             |cnt AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY 1),
             |tr AS (SELECT a.et AS eta, b.et AS etb,
             |              CAST(count(*) AS BIGINT) AS true_inter
             |       FROM du a JOIN du b ON b.u = a.u AND a.et < b.et GROUP BY 1, 2),
             |pr AS (SELECT a.et AS eta, a.s AS sa, b.et AS etb, b.s AS sb
             |       FROM sk a JOIN sk b ON a.et < b.et),
             |th AS (SELECT eta, etb, sa, sb,
             |         CASE WHEN len(sa) >= 64 THEN sa[64] ELSE 1000000007 END AS ta,
             |         CASE WHEN len(sb) >= 64 THEN sb[64] ELSE 1000000007 END AS tb
             |       FROM pr),
             |th2 AS (SELECT *, least(ta, tb) AS tc FROM th),
             |th3 AS (SELECT eta, etb, ta, tb, tc,
             |          list_filter(sa, v -> v < ta) AS raa,
             |          list_filter(sb, v -> v < tb) AS rbb,
             |          list_filter(sa, v -> v < tc) AS rac,
             |          list_filter(sb, v -> v < tc) AS rbc
             |        FROM th2),
             |th4 AS (SELECT eta, etb, ta, tb, tc, raa, rbb, rac, rbc,
             |          CAST(len(list_filter(rac, v -> list_contains(rbc, v)))
             |               AS BIGINT) AS nin
             |        FROM th3),
             |alg AS (SELECT eta, etb,
             |          (CAST(len(raa) AS BIGINT) * 1000000007) // ta AS est_a,
             |          (CAST(len(rbb) AS BIGINT) * 1000000007) // tb AS est_b,
             |          ((CAST(len(rac) AS BIGINT) + CAST(len(rbc) AS BIGINT) - nin)
             |           * 1000000007) // tc AS est_union,
             |          (nin * 1000000007) // tc AS est_inter,
             |          ((CAST(len(rac) AS BIGINT) - nin) * 1000000007) // tc AS est_diff
             |        FROM th4)
             |SELECT a.eta, a.etb, a.est_a, a.est_b, a.est_union, a.est_inter,
             |       a.est_diff, ca.n AS true_a, cb.n AS true_b, tr.true_inter,
             |       ca.n - tr.true_inter AS true_diff
             |FROM alg a JOIN cnt ca ON ca.et = a.eta
             |JOIN cnt cb ON cb.et = a.etb
             |JOIN tr ON tr.eta = a.eta AND tr.etb = a.etb
             |ORDER BY a.eta, a.etb""".stripMargin)),

    // Broadcast-hash join: dimension tables are tiny at every SF.
    QueryDef("rel_join_broadcast",
      (s, d) => T(s, d, "customer")
        .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
             |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Large-large equi-join -> sort-merge/shuffled-hash under AQE.
    QueryDef("rel_join_sortmerge",
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_items,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef("rel_join_semi",
      (s, d) => T(s, d, "orders")
        .join(T(s, d, "lineitem").filter(col("l_quantity") >= 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n_orders
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Anti-join with a filtered build side: customers with no high-value
    // order. (The unfiltered "no orders at all" form returns ZERO rows at
    // every test SF — a gate any bug that yields an empty frame would
    // pass — so the build side is restricted until the output
    // discriminates: ~200 of 1500 customers at sf0.01.)
    QueryDef("rel_join_anti",
      (s, d) => T(s, d, "customer")
        .join(T(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("rel_join_outer",
      (s, d) => T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // orderBy + limit compiles to TakeOrderedAndProject: per-partition top-k,
    // single driver merge — no full sort at scale.
    // Reproducible sampling — the training-data-pipeline form: a Knuth
    // multiplicative hash of the key decides membership, so the sample is
    // (a) deterministic across engines/runs/partitionings (unlike
    // df.sample's seed+partition-dependent Bernoulli), (b) key-coherent
    // (all lineitems of a sampled order travel together), and (c) a plain
    // pushdown-friendly filter — no shuffle, no RNG state. Stratified rates
    // per l_returnflag via per-stratum thresholds on the same hash.
    // u = ((key & (2^31-1)) * 2654435761) mod 2^32 is uniform-ish on
    // [0, 2^32). The 31-bit mask keeps the product < 2^62 — no signed-64
    // overflow for ANY orderkey (unmasked, keys past ~3.47e9 would wrap in
    // Spark but raise in ANSI engines, breaking cross-engine determinism);
    // key-coherence is untouched since the mask is itself a pure key
    // function.
    QueryDef("rel_sample_hash",
      (s, d) => {
        val u = graft.functions.HashFns.knuthU(col("l_orderkey"))
        def cut(f: Double) = lit(graft.functions.HashFns.cut(f))
        val strat = when(col("l_returnflag") === "R", cut(0.02))
          .when(col("l_returnflag") === "A", cut(0.05))
          .otherwise(cut(0.10))
        T(s, d, "lineitem")
          .filter(u < strat)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_sampled"),
            count_distinct(col("l_orderkey")).as("n_orders"),
            sum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      // cut points interpolated from HashFns.cut, never CAST(f * 2^32):
      // Scala's .toLong truncates while DuckDB's CAST rounds — at 0.02 the
      // two differ by 1 (85899345 vs ...346), a boundary-key divergence
      // waiting for a datum that hashes exactly onto it
      Some(s"""SELECT l_returnflag,
             |       count(*) AS n_sampled,
             |       count(DISTINCT l_orderkey) AS n_orders,
             |       sum(l_quantity) AS sum_qty
             |FROM lineitem
             |WHERE ${graft.functions.HashFns.knuthUSql("l_orderkey")} <
             |      CASE l_returnflag WHEN 'R' THEN ${graft.functions.HashFns.cut(0.02)}
             |                        WHEN 'A' THEN ${graft.functions.HashFns.cut(0.05)}
             |                        ELSE ${graft.functions.HashFns.cut(0.10)} END
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Approximate query processing: estimate a grouped total from the 5%
    // knuthU hash sample (scan prunes to the sample — the 100 TB read is
    // 1/20th of the table), scale by the exact integer 20, and report a
    // CLT 95% relative half-width next to the realized error. Sample
    // moments are exact integers (quantities are small ints in doubles;
    // every partial sum is < 2^53, so summation order can't move them),
    // and the CI arithmetic is the SAME IEEE expression tree in both
    // engines, so even the floating floor is deterministic. The realized
    // err_ppm <= rel_ci_ppm on every group at both SFs — the estimator's
    // own guarantee, visible in the output.
    QueryDef("rel_aqp_sum",
      (s, d) => {
        val u = graft.functions.HashFns.knuthU(col("l_orderkey"))
        val samp = T(s, d, "lineitem")
          .filter(u < lit(graft.functions.HashFns.cut(0.05)))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_s"),
            sum(col("l_quantity")).cast("bigint").as("sum_q"),
            sum(col("l_quantity") * col("l_quantity")).cast("bigint").as("sum_q2"))
        val truth = T(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(sum(col("l_quantity")).cast("bigint").as("true_total"))
        val sq = col("sum_q").cast("double")
        val sq2 = col("sum_q2").cast("double")
        val ns = col("n_s").cast("double")
        val mean = sq / ns
        val s2 = (sq2 - sq * sq / ns) / (ns - lit(1.0))
        samp.join(truth, "l_returnflag")
          .select(col("l_returnflag"),
            col("n_s").as("n_sampled"),
            (col("sum_q") * 20).as("est_total"),
            col("true_total"),
            floor(abs(col("sum_q") * 20 - col("true_total")).cast("double")
              * lit(1000000.0) / col("true_total")).cast("bigint").as("err_ppm"),
            floor(lit(1.96) * sqrt(s2 / ns) / mean * lit(1000000.0))
              .cast("bigint").as("rel_ci_ppm"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH s AS (SELECT l_returnflag, count(*) AS n_s,
             |                  CAST(sum(l_quantity) AS BIGINT) AS sum_q,
             |                  CAST(sum(l_quantity * l_quantity) AS BIGINT) AS sum_q2
             |           FROM lineitem
             |           WHERE ${graft.functions.HashFns.knuthUSql("l_orderkey")} <
             |                 ${graft.functions.HashFns.cut(0.05)}
             |           GROUP BY 1),
             |t AS (SELECT l_returnflag,
             |             CAST(sum(l_quantity) AS BIGINT) AS true_total
             |      FROM lineitem GROUP BY 1)
             |SELECT s.l_returnflag, CAST(n_s AS BIGINT) AS n_sampled,
             |       CAST(sum_q * 20 AS BIGINT) AS est_total, true_total,
             |       CAST(floor(CAST(abs(sum_q * 20 - true_total) AS DOUBLE)
             |            * 1000000.0 / true_total) AS BIGINT) AS err_ppm,
             |       CAST(floor(1.96 * sqrt(((CAST(sum_q2 AS DOUBLE)
             |              - CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE)
             |                / CAST(n_s AS DOUBLE))
             |              / (CAST(n_s AS DOUBLE) - 1.0))
             |            / CAST(n_s AS DOUBLE))
             |            / (CAST(sum_q AS DOUBLE) / CAST(n_s AS DOUBLE))
             |            * 1000000.0) AS BIGINT) AS rel_ci_ppm
             |FROM s JOIN t USING (l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    QueryDef("rel_topk",
      (s, d) => T(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    QueryDef("rel_setops",
      (s, d) => {
        val c = T(s, d, "customer"); val o = T(s, d, "orders")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
        val b = o.filter(col("o_totalprice") > 300000).select(col("o_custkey").as("custkey"))
        val u = c.filter(col("c_acctbal") < 500).select(col("c_custkey").as("custkey"))
        val x = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
        a.intersect(b).union(u).except(x).orderBy("custkey")
      },
      Some("""SELECT custkey FROM (
             |  SELECT custkey FROM (
             |    SELECT custkey FROM (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |                         INTERSECT
             |                         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000)
             |    UNION
             |    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 500)
             |  EXCEPT
             |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
             |ORDER BY custkey""".stripMargin)),

    QueryDef("rel_cube",
      (s, d) => T(s, d, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(asc_nulls_first("lang"), asc_nulls_first("source")),
      Some("""SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY CUBE (lang, source)
             |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin)),

    QueryDef("rel_rollup",
      (s, d) => T(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("bigint"))
        .rollup(col("yr"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(asc_nulls_first("yr"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY ROLLUP (yr, o_orderpriority)
             |ORDER BY yr NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    QueryDef("rel_grouping_sets",
      (s, d) => {
        T(s, d, "lineitem").createOrReplaceTempView("gs_lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
                |FROM gs_lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef("rel_case_predicates",
      (s, d) => T(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM") &&
          col("o_orderdate").between("1996-01-01", "1999-12-31") &&
          col("o_orderstatus").like("%O%") && col("o_custkey").isNotNull)
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 300000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket"),
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
             |            WHEN o_totalprice < 300000 THEN 'mid'
             |            ELSE 'high' END AS bucket,
             |       count(*) AS n,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
             |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
             |  AND o_orderstatus LIKE '%O%' AND o_custkey IS NOT NULL
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    QueryDef("rel_join_part",
      (s, d) => T(s, d, "lineitem")
        .join(broadcast(T(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"),
          (floor(dsum(col("p_retailprice")) * lit(10000.0) / count(lit(1))) / 10000)
            .as("avg_retail"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty,
             |       floor(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             |             * 10000.0 / count(*)) / 10000 AS avg_retail
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Relative-position window battery: percent_rank and cume_dist — the
    // normalized complements of win_rank's ordinal functions. Both are
    // RATIOS of the same integers on both engines ((rank-1)/(n-1), n_le/n),
    // so the doubles are identical before the defensive round(6). Thinned
    // to every-100th customer to keep the artifact small; the window itself
    // runs over the full partition either way.
    QueryDef("win_cume",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        T(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .filter(col("c_custkey") % 100 === 0)
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""SELECT * FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |         round(percent_rank() OVER w, 6) AS pct_rank,
             |         round(cume_dist() OVER w, 6) AS cume
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
             |WHERE c_custkey % 100 = 0
             |ORDER BY c_mktsegment, c_custkey""".stripMargin)),

    QueryDef("win_rank",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        T(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .filter(col("rn") <= 10)
          .orderBy("c_mktsegment", "rn")
      },
      Some("""SELECT * FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |         CAST(row_number() OVER w AS INT) AS rn,
             |         CAST(rank() OVER w AS INT) AS rnk,
             |         CAST(dense_rank() OVER w AS INT) AS drnk,
             |         CAST(ntile(4) OVER w AS INT) AS quartile
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
             |WHERE rn <= 10 ORDER BY c_mktsegment, rn""".stripMargin)),

    // Per-group top-k with ONLY row_number + filter: unlike win_rank (whose
    // ntile needs the whole partition), this shape triggers Catalyst's
    // InferWindowGroupLimit — a partial WindowGroupLimit prunes each map
    // partition to k rows per group BEFORE the shuffle, so shuffle volume is
    // O(groups·k) instead of O(rows). PlanQualitySpec asserts the pushdown.
    QueryDef("win_group_topk",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT * FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         CAST(row_number() OVER (PARTITION BY o_custkey
             |              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef("fn_string",
      (s, d) => T(s, d, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 10, 9).as("id_digits"),
          concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
          regexp_replace(col("c_name"), "[0-9]+", "N").as("name_norm"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          length(col("c_name")).cast("bigint").as("name_len"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |       upper(c_name) AS uname,
             |       substring(c_name, 10, 9) AS id_digits,
             |       c_mktsegment || '/' || c_name AS seg_name,
             |       regexp_replace(c_name, '[0-9]+', 'N', 'g') AS name_norm,
             |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
             |       CAST(length(c_name) AS BIGINT) AS name_len,
             |       trim('  x  ') AS trimmed
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    QueryDef("fn_math",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_dev"),
          ceil(col("l_extendedprice") / 1000).cast("bigint").as("price_k_ceil"),
          floor(col("l_extendedprice") / 1000).cast("bigint").as("price_k_floor"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          (col("l_quantity").cast("bigint") % 7).as("qty_mod7"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |       abs(l_quantity - 25) AS abs_dev,
             |       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
             |       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
             |       round(sqrt(l_quantity), 6) AS sqrt_qty,
             |       round(ln(l_extendedprice), 6) AS ln_price,
             |       pow(l_quantity, 2) AS qty_sq,
             |       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
             |       greatest(l_discount, l_tax) AS max_rate
             |FROM lineitem WHERE l_orderkey < 500
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Exact interpolated median/quantiles (Spark percentile == DuckDB
    // quantile_cont, both linear interpolation).
    // Exact linear-interpolated percentiles via sort + row_number instead of
    // the built-in `percentile` aggregate: that one is a
    // TypedImperativeAggregate (interpreted ObjectHashAggregate, per-value
    // OpenHashMap inserts + serialized partial maps — ~10s at sf0.1 on the
    // bench), while this formulation is one codegen'd shuffle-sort per
    // (group, column) partition plus a cheap weighted sum, with no
    // driver-side map merge. Honest scale bound: sort parallelism equals
    // #groups x #columns (6 here), each group sorted by one task — right
    // when groups are numerous or moderate-sized; for FEW huge groups at
    // extreme scale use approx_percentile or a pre-aggregated
    // (value, count) weighted percentile instead. This query's point is
    // exactness parity with quantile_cont:
    // value(p) = v[lo]*(1-frac) + v[lo+1]*frac at pos = p*(n-1), NULLs
    // excluded (the isNotNull filter below — percentile and quantile_cont
    // both ignore NULLs).
    // median()/mode() aggregates — both engines native. mode(l_linenumber)
    // is deterministic on this data: linenumber counts decrease strictly
    // from 1 (TPC-H-ish 1..7 per-order lines), so the max is unique.
    QueryDef("rel_median_mode",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          median(col("l_quantity")).as("med_qty"),
          median(col("l_extendedprice")).as("med_price"),
          mode(col("l_linenumber")).as("mode_line"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       median(l_quantity) AS med_qty,
             |       median(l_extendedprice) AS med_price,
             |       mode(l_linenumber) AS mode_line
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("rel_percentiles",
      (s, d) => {
        // Unpivot the measured columns so ONE window pass ranks both.
        val unpiv = T(s, d, "lineitem")
          .select(col("l_returnflag"), explode(array(
            struct(lit("q").as("c"), col("l_quantity").as("v")),
            struct(lit("p").as("c"), col("l_extendedprice").as("v")))).as("cv"))
          .select(col("l_returnflag"), col("cv.c").as("c"), col("cv.v").as("v"))
          .filter(col("v").isNotNull)
        val byV = Window.partitionBy("l_returnflag", "c").orderBy("v")
        // group sizes via a tiny broadcast join rather than a second
        // (unordered, whole-partition-buffering) window pass
        val sizes = unpiv.groupBy("l_returnflag", "c").agg(count(lit(1)).as("n"))
        val ranked = unpiv.select(col("l_returnflag"), col("c"), col("v"),
          (row_number().over(byV) - 1).cast("double").as("rn"))
          .join(broadcast(sizes), Seq("l_returnflag", "c"))
        // Weight of each row toward percentile p of column cn: nonzero only
        // at ranks floor(pos) and floor(pos)+1.
        def pct(cn: String, p: Double): Column = {
          val pos = lit(p) * (col("n") - 1).cast("double")
          val lo = floor(pos)
          val frac = pos - lo
          val w = when(col("rn") === lo, lit(1.0) - frac)
            .when(col("rn") === lo + 1, frac)
            .otherwise(lit(0.0))
          sum(when(col("c") === cn, col("v") * w).otherwise(lit(0.0)))
        }
        ranked.groupBy("l_returnflag")
          .agg(
            round(pct("q", 0.5), 4).as("median_qty"),
            round(pct("p", 0.9), 4).as("p90_price"),
            round(pct("p", 0.99), 4).as("p99_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
             |       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
