package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second batch of relational inventory: multiset set-ops, pivot, multi-way
  * joins, value window functions, string/bitwise/conditional batteries,
  * deterministic listagg.
  */
object RelationalQueries2 {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val queries: Seq[QueryDef] = Seq(

    // Multiset semantics: UNION ALL / INTERSECT ALL / EXCEPT ALL.
    QueryDef("rel_setops_all",
      (s, d) => {
        val li = T(s, d, "lineitem")
        val a = li.filter(col("l_returnflag") === "R").select(col("l_orderkey").as("k"))
        val b = li.filter(col("l_linestatus") === "F").select(col("l_orderkey").as("k"))
        val c = li.filter(col("l_quantity") > 48).select(col("l_orderkey").as("k"))
        a.unionAll(c).exceptAll(b).intersectAll(a)
          .groupBy("k").agg(count(lit(1)).as("multiplicity"))
          .orderBy("k")
      },
      Some("""WITH a AS (SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'),
             |b AS (SELECT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F'),
             |c AS (SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 48),
             |m AS (SELECT k FROM (SELECT k FROM (SELECT k FROM a UNION ALL SELECT k FROM c)
             |                     EXCEPT ALL SELECT k FROM b)
             |      INTERSECT ALL SELECT k FROM a)
             |SELECT k, count(*) AS multiplicity FROM m GROUP BY k ORDER BY k""".stripMargin)),

    // Unpivot (melt): wide per-part measure columns back to long
    // (measure, value) rows — pivot's inverse, a pure per-row explode
    // (no shuffle). Oracle via DuckDB UNPIVOT.
    QueryDef("rel_unpivot",
      (s, d) => T(s, d, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").cast("double").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "measure", "val")
        .orderBy("p_partkey", "measure"),
      Some("""SELECT p_partkey, measure, val FROM (
             |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
             |         CAST(p_retailprice AS DOUBLE) AS retailprice
             |  FROM part WHERE p_partkey <= 200)
             |UNPIVOT (val FOR measure IN (size, retailprice))
             |ORDER BY p_partkey, measure""".stripMargin)),

    // Edit-distance string matching (fuzzy-dedup building block): pairs of
    // distinct nation names within levenshtein <= 1 (the synthetic names cluster at distance 1-2, so the threshold selects 133 of 300 pairs) — both engines ship
    // the same DP distance.
    QueryDef("fn_levenshtein",
      (s, d) => {
        val a = T(s, d, "nation").select(col("n_name").as("a"))
        val b = T(s, d, "nation").select(col("n_name").as("b"))
        a.crossJoin(b).filter(col("a") < col("b"))
          .select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("dist"))
          .filter(col("dist") <= 1)
          .orderBy("a", "b")
      },
      Some("""SELECT a.n_name AS a, b.n_name AS b,
             |       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
             |FROM nation a JOIN nation b ON a.n_name < b.n_name
             |WHERE levenshtein(a.n_name, b.n_name) <= 1
             |ORDER BY a, b""".stripMargin)),

    // Jaro-Winkler fuzzy matching — the prefix-weighted scorer Spark lacks
    // natively, shipped as a CODEGEN'D Catalyst expression
    // (plans.JaroWinklerSim -> one static kernel call per row inside
    // whole-stage codegen; semantics empirically pinned to the oracle
    // engine's jaro_winkler_similarity, see functions.JaroWinkler). Same
    // blocked-pair discipline as dd_fuzzy_blocked: equi-join on the
    // first-token block, score only within blocks — no nested loop.
    QueryDef("fn_jaro_winkler",
      (s, d) => {
        val n = T(s, d, "part").select(col("p_name").as("name")).distinct()
          .withColumn("blk", split(col("name"), " ").getItem(0))
        val jw = graft.plans.StringExpressions.jaroWinkler(col("a"), col("b"))
        n.select(col("name").as("a"), col("blk"))
          .join(n.select(col("name").as("b"), col("blk")), "blk")
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"), round(jw, 4).as("jw"))
          .filter(col("jw") >= 0.85)
          .orderBy("a", "b")
      },
      Some("""WITH n AS (SELECT DISTINCT p_name AS name FROM part),
             |b AS (SELECT name, split_part(name, ' ', 1) AS blk FROM n)
             |SELECT a.name AS a, b.name AS b,
             |       round(jaro_winkler_similarity(a.name, b.name), 4) AS jw
             |FROM b a JOIN b b ON a.blk = b.blk AND a.name < b.name
             |WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.85
             |ORDER BY a, b""".stripMargin)),

    // Pivot: per-day event counts by type as columns; oracle via FILTER aggs.
    QueryDef("rel_pivot",
      (s, d) => T(s, d, "events")
        .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day"),
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |       count(*) FILTER (WHERE event_type = 'click') AS click,
             |       count(*) FILTER (WHERE event_type = 'view') AS view,
             |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
             |       count(*) FILTER (WHERE event_type = 'error') AS error
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // TPC-H Q3 shape (top unshipped orders): two co-shuffled fact joins, a
    // dim filter on each side, revenue aggregate, top-10 by revenue — the
    // canonical "rank the join" OLAP query. TakeOrderedAndProject caps the
    // final sort at k rows per partition.
    QueryDef("rel_join_q3",
      (s, d) => T(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < "1996-06-01")
        .join(T(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > "1996-06-01")
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             |       o_orderpriority,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |                CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1996-06-01'
             |  AND l_shipdate > TIMESTAMP '1996-06-01'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5-shaped 5-way join: dims broadcast, fact tables co-shuffled.
    QueryDef("rel_join_q5",
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(T(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
        .groupBy("r_name", "n_name")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // TPC-H Q10 shape (returned items): revenue lost to returns per
    // customer, top 20. Aggregate-THEN-join: lineitem⋈orders groups down to
    // O(customers) rows before the dimension joins, so the big fact join
    // never carries customer attributes; nation broadcasts. TakeOrdered
    // caps the driver at 20 rows.
    QueryDef("rel_join_q10",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
        .groupBy("o_custkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("revenue"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, n_name, c_acctbal,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |                CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY c_custkey, c_name, n_name, c_acctbal
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q14 shape (promo revenue share by ship month): fact⋈dim join
    // with a conditional aggregate on the dim attribute. part is a real
    // (non-broadcast-hinted) join — at 100 TB part shuffles alongside
    // lineitem on partkey; AQE may still broadcast it at small SF. The
    // share ratio of two exact decimal sums is quantized once with floor.
    QueryDef("rel_join_q14",
      (s, d) => {
        val rev = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)")
        T(s, d, "lineitem")
          .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,2)")))
              .cast("double").as("promo_rev"),
            sum(rev).cast("double").as("total_rev"))
          .select(col("ship_month"), col("promo_rev"), col("total_rev"),
            (floor(col("promo_rev") * lit(1000000.0) / col("total_rev")) / 10000).as("promo_pct"))
          .orderBy("ship_month")
      },
      Some("""WITH m AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             |         CAST(sum(CASE WHEN p_type = 'PROMO'
             |                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
             |                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
             |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1)
             |SELECT ship_month, promo_rev, total_rev,
             |       floor(promo_rev * 1000000.0 / total_rev) / 10000 AS promo_pct
             |FROM m ORDER BY ship_month""".stripMargin)),

    // TPC-H Q18 shape (large orders): HAVING on a fact aggregate, then the
    // survivors drive the dimension joins. The filtered aggregate is tiny
    // (~1% of orders at any SF) so it is broadcast INTO orders — the join
    // order a 100 TB plan wants, never materializing per-order sums wider
    // than the survivors.
    QueryDef("rel_join_q18",
      (s, d) => {
        val big = T(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
          .filter(col("sum_qty") > 250)
        T(s, d, "orders")
          .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |  FROM lineitem GROUP BY 1 HAVING sum_qty > 250)
             |SELECT c_custkey, c_name, o_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             |       o_totalprice, sum_qty
             |FROM orders JOIN big ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // ntile bucketing: account-balance quartiles within each market segment
    // + per-bucket stats — the windowed analogue of the equi-depth
    // histogram (rel_histogram_eqdepth) when buckets must respect a group
    // key. One (segment)-keyed window then an O(segments*4) aggregate;
    // deterministic bucket assignment via the (acctbal, custkey) total
    // order inside the window.
    QueryDef("win_ntile",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
        T(s, d, "customer")
          .select(col("c_mktsegment"), col("c_acctbal"),
            ntile(4).over(w).cast("bigint").as("quartile"))
          .groupBy("c_mktsegment", "quartile")
          .agg(count(lit(1)).as("n"),
            min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
          .orderBy("c_mktsegment", "quartile")
      },
      Some("""SELECT c_mktsegment, quartile, count(*) AS n,
             |       min(c_acctbal) AS lo, max(c_acctbal) AS hi
             |FROM (SELECT c_mktsegment, c_acctbal,
             |             CAST(ntile(4) OVER (PARTITION BY c_mktsegment
             |                                 ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
             |      FROM customer)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("win_value_fns",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            first_value(col("c_custkey")).over(wf).as("richest"),
            last_value(col("c_custkey")).over(wf).as("poorest"),
            nth_value(col("c_custkey"), 2).over(wf).as("second"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
             |       first_value(c_custkey) OVER wf AS richest,
             |       last_value(c_custkey) OVER wf AS poorest,
             |       nth_value(c_custkey, 2) OVER wf AS second,
             |       round(percent_rank() OVER w, 6) AS pct_rank,
             |       round(cume_dist() OVER w, 6) AS cume
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
             |       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY c_custkey""".stripMargin)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): nulls match
    // nulls — derived nullable keys (nationkey 3 nulled on BOTH sides) make
    // the semantic difference observable: nation-3 customers pair with the
    // nulled nation row, which a plain equi-join would drop.
    QueryDef("rel_join_nullsafe",
      (s, d) => {
        val c = T(s, d, "customer")
          .select(nullif(col("c_nationkey"), lit(3)).as("nk"), col("c_custkey"))
        val n = T(s, d, "nation")
          .select(nullif(col("n_nationkey"), lit(3)).as("nk2"), col("n_name"))
        c.join(broadcast(n), col("nk") <=> col("nk2"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_customers
             |FROM (SELECT nullif(c_nationkey, 3) AS nk, c_custkey FROM customer) c
             |JOIN (SELECT nullif(n_nationkey, 3) AS nk2, n_name FROM nation) n
             |  ON c.nk IS NOT DISTINCT FROM n.nk2
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    QueryDef("fn_string2",
      (s, d) => T(s, d, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          instr(col("p_name"), " ").cast("bigint").as("space_pos"),
          translate(col("p_type"), "AEIOU", "aeiou").as("type_tr"),
          expr("left(p_name, 3)").as("name_l3"),
          expr("right(p_name, 3)").as("name_r3"),
          reverse(col("p_brand")).as("brand_rev"),
          repeat(lit("ab"), 3).as("rep"),
          split(col("p_name"), " ").getItem(0).as("first_word"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             |       CAST(strpos(p_name, ' ') AS BIGINT) AS space_pos,
             |       translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
             |       left(p_name, 3) AS name_l3,
             |       right(p_name, 3) AS name_r3,
             |       reverse(p_brand) AS brand_rev,
             |       repeat('ab', 3) AS rep,
             |       string_split(p_name, ' ')[1] AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Regex function family: anchored extract, global replace (Spark's
    // default; DuckDB needs the 'g' flag), boolean rlike, and match count.
    QueryDef("fn_regexp",
      (s, d) => T(s, d, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          col("p_name").rlike("r.ng").as("has_ring"),
          expr("regexp_count(p_name, '[aeiou]')").cast("bigint").as("vowels"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             |       regexp_matches(p_name, 'r.ng') AS has_ring,
             |       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS vowels,
             |       regexp_extract(p_type, '^(\w+)', 1) AS type_head
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef("fn_bitwise",
      (s, d) => T(s, d, "events")
        .filter(col("event_id") < 1000)
        .select(col("event_id"),
          col("event_id").bitwiseAND(lit(255L)).as("low_byte"),
          col("event_id").bitwiseOR(lit(16L)).as("with_bit4"),
          col("event_id").bitwiseXOR(col("user_id")).as("xored"),
          shiftleft(col("event_id"), 2).as("shl2"),
          shiftright(col("event_id"), 3).as("shr3"),
          bit_count(col("event_id")).cast("bigint").as("popcount"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |       event_id & 255 AS low_byte,
             |       event_id | 16 AS with_bit4,
             |       xor(event_id, user_id) AS xored,
             |       event_id << 2 AS shl2,
             |       event_id >> 3 AS shr3,
             |       CAST(bit_count(event_id) AS BIGINT) AS popcount
             |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin)),

    // Network-address family — the web-crawl curation staple (per-host
    // rate caps, private-range drops, /24 dedup keys) expressed as pure
    // integer arithmetic: IPv4s planted deterministically from event_id
    // (first octet cycles a private/public mix so every classifier branch
    // is exercised), then aton (split + positional weights), ntoa
    // (shift + mask reassembly), RFC-1918 classification, /24 subnet key,
    // and the aton∘ntoa round trip asserted per row. All codegen'd
    // expressions, no UDF, no shuffle — a narrow map at any scale.
    QueryDef("fn_ip",
      (s, d) => {
        val e = T(s, d, "events").filter(col("event_id") < 2000)
        val o1 = expr("CASE WHEN event_id % 4 = 0 THEN 10 " +
          "WHEN event_id % 4 = 1 THEN 172 " +
          "WHEN event_id % 4 = 2 THEN 192 ELSE 203 END").cast("long")
        val o2 = (col("event_id") % 256).cast("long")
        val o3 = ((col("event_id") * 7) % 256).cast("long")
        val o4 = ((col("event_id") * 13) % 256).cast("long")
        val base = e.select(col("event_id"),
          concat_ws(".", o1, o2, o3, o4).as("ip"),
          (o1 * 16777216L + o2 * 65536L + o3 * 256L + o4).as("u32"))
        val oct = (i: Int) =>
          element_at(split(col("ip"), "\\."), i).cast("long")
        val parsed = oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4)
        val b1 = shiftright(col("u32"), 24)
        val b2 = shiftright(col("u32"), 16).bitwiseAND(lit(255L))
        base.select(col("event_id"), col("ip"), col("u32"),
          (parsed === col("u32")).as("roundtrip_ok"),
          (b1 === 10 || (b1 === 172 && b2 >= 16 && b2 <= 31) ||
            (b1 === 192 && b2 === 168)).as("is_private"),
          shiftright(col("u32"), 8).as("subnet24"),
          col("u32").bitwiseAND(lit(255L)).as("host_in_24"),
          concat_ws(".", b1, b2,
            shiftright(col("u32"), 8).bitwiseAND(lit(255L)),
            col("u32").bitwiseAND(lit(255L))).as("ntoa"))
          .orderBy("event_id")
      },
      Some("""WITH base AS (
             |  SELECT event_id,
             |         o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
             |         o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS u32
             |  FROM (SELECT event_id,
             |          CAST(CASE WHEN event_id % 4 = 0 THEN 10
             |               WHEN event_id % 4 = 1 THEN 172
             |               WHEN event_id % 4 = 2 THEN 192 ELSE 203 END AS BIGINT) AS o1,
             |          event_id % 256 AS o2,
             |          (event_id * 7) % 256 AS o3,
             |          (event_id * 13) % 256 AS o4
             |        FROM events WHERE event_id < 2000) q)
             |SELECT event_id, ip, u32,
             |       CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 +
             |       CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 +
             |       CAST(string_split(ip, '.')[3] AS BIGINT) * 256 +
             |       CAST(string_split(ip, '.')[4] AS BIGINT) = u32 AS roundtrip_ok,
             |       (u32 >> 24) = 10
             |         OR ((u32 >> 24) = 172 AND (u32 >> 16) & 255 BETWEEN 16 AND 31)
             |         OR ((u32 >> 24) = 192 AND (u32 >> 16) & 255 = 168)
             |         AS is_private,
             |       u32 >> 8 AS subnet24,
             |       u32 & 255 AS host_in_24,
             |       (u32 >> 24) || '.' || ((u32 >> 16) & 255) || '.' ||
             |       ((u32 >> 8) & 255) || '.' || (u32 & 255) AS ntoa
             |FROM base ORDER BY event_id""".stripMargin)),

    QueryDef("fn_conditional",
      (s, d) => T(s, d, "customer")
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
          when(col("c_acctbal") > 5000, lit("high")).otherwise(lit("low")).as("tier"),
          least(col("c_acctbal"), lit(1000.0)).as("capped"),
          greatest(col("c_acctbal"), lit(0.0)).as("floored"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |       nullif(c_mktsegment, 'BUILDING') AS seg_nb,
             |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
             |       CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier,
             |       least(c_acctbal, 1000.0) AS capped,
             |       greatest(c_acctbal, 0.0) AS floored
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Salted join: result must equal the plain equi-join (oracle is the
    // unsalted SQL) — demonstrates the hot-key mitigation preserves
    // semantics. Salt derives deterministically from l_linenumber.
    QueryDef("rel_join_salted",
      (s, d) => Skew.saltedJoin(
          T(s, d, "lineitem"),
          T(s, d, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
          "l_orderkey", col("l_linenumber"), salts = 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Correlated + scalar subqueries in SQL text: Catalyst rewrites EXISTS
    // to a left-semi join and the scalar subquery to a broadcast-able
    // single-row aggregate — the optimizer surface, not just the parser.
    // Identical SQL runs on both engines.
    QueryDef("rel_subqueries",
      (s, d) => {
        Seq("orders", "customer").foreach(t =>
          graft.Tables.t(s, d, t).createOrReplaceTempView(s"sq_$t"))
        s.sql("""SELECT c_custkey, c_acctbal
                |FROM sq_customer
                |WHERE EXISTS (SELECT 1 FROM sq_orders
                |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
                |  AND c_acctbal > (SELECT avg(c_acctbal) FROM sq_customer)
                |  AND c_custkey NOT IN (SELECT o_custkey FROM sq_orders
                |                        WHERE o_orderpriority = '1-URGENT'
                |                          AND o_totalprice > 400000)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
             |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_orderpriority = '1-URGENT'
             |                          AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // Hash-function surface: md5 / sha2-256 hex digests agree across
    // engines (both lowercase hex); xxhash64 is Spark-specific and is
    // exercised throughout the dedup pipelines instead.
    QueryDef("fn_hash",
      (s, d) => T(s, d, "part")
        .select(col("p_partkey"),
          md5(col("p_name").cast("binary")).as("name_md5"),
          sha2(col("p_name").cast("binary"), 256).as("name_sha256"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       md5(p_name) AS name_md5,
             |       sha256(p_name) AS name_sha256
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Pure SQL-text surface (spark.sql over registered views) — the same
    // declarative plan Catalyst sees from the DataFrame API.
    QueryDef("rel_sql_text",
      (s, d) => {
        Seq("orders", "customer").foreach(t =>
          graft.Tables.t(s, d, t).createOrReplaceTempView(s"sql_$t"))
        s.sql("""SELECT c_mktsegment,
                |       count(*) AS n_orders,
                |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM sql_orders JOIN sql_customer ON o_custkey = c_custkey
                |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment,
             |       count(*) AS n_orders,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // FILTER-clause aggregates: per-group conditional aggregation without
    // CASE-wrapping every argument; one scan, one shuffle, N conditions.
    QueryDef("rel_agg_filter",
      (s, d) => {
        graft.Tables.t(s, d, "lineitem").createOrReplaceTempView("af_lineitem")
        s.sql("""SELECT l_returnflag,
                |       count(*) AS n_all,
                |       count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
                |       count(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
                |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                |            FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_price
                |FROM af_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |       count(*) AS n_all,
             |       count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
             |       count(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
             |            FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Correlated LATERAL subquery in the FROM clause (per-customer top
    // order) — Catalyst decorrelates it into a join + per-key aggregate,
    // so "loop-shaped" SQL still executes as one shuffled plan, not N
    // subqueries. Same SQL text runs on both engines.
    QueryDef("rel_lateral",
      (s, d) => {
        Seq("orders", "customer").foreach(t =>
          graft.Tables.t(s, d, t).createOrReplaceTempView(s"lat_$t"))
        s.sql("""SELECT c_custkey, o.top_price, o.top_order
                |FROM lat_customer,
                |LATERAL (SELECT o_totalprice AS top_price, o_orderkey AS top_order
                |         FROM lat_orders WHERE o_custkey = c_custkey
                |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
                |WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, o.top_price, o.top_order
             |FROM customer,
             |LATERAL (SELECT o_totalprice AS top_price, o_orderkey AS top_order
             |         FROM orders WHERE o_custkey = c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
             |WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin)),

    // Deterministic listagg: sorted collect_list joined to one string.
    QueryDef("rel_listagg",
      (s, d) => T(s, d, "nation")
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name"),
      Some("""SELECT r_name,
             |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |       count(*) AS n
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Dynamic partition pruning: the fact side is the DATE-PARTITIONED
    // events layout (graft.sources.PartitionedView — one directory per
    // date, the canonical 100 TB fact layout); the dim side is a date
    // dimension filtered on a non-partition attribute (Mondays). The
    // filter's surviving dates are only known at RUNTIME, so Catalyst
    // injects a dynamicpruning# subquery into the fact scan's
    // PartitionFilters (reusing the dim's broadcast) and the scan never
    // opens ~6/7 of the partitions. PlanQualitySpec asserts the
    // dynamicpruning filter is present in the executed plan.
    QueryDef("rel_dpp",
      (s, d) => {
        val base = graft.sources.PartitionedView.eventsByDate(s, d)
        val fact = s.read.parquet(s"$base/events_by_date")
        val mondays = s.read.parquet(s"$base/date_dim").filter(col("dow") === 1)
        fact.join(mondays, Seq("d"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events
             |WHERE isodow(CAST(ts AS DATE)) = 1
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Join over PRE-BUCKETED storage (graft.sources.BucketedView): both
    // sides were hashed into the same bucket count on their join key at
    // write time, so the sort-merge join plans with NO Exchange on either
    // side (asserted in PlanQualitySpec) — the fact-to-fact join layout
    // you land once at ingest instead of re-shuffling 100 TB per run. The
    // merge hint keeps the demo honest at test scale, where tiny orders
    // would otherwise broadcast.
    QueryDef("rel_join_bucketed",
      (s, d) => {
        val (orders, li) = graft.sources.BucketedView.tables(s, d)
        li.hint("merge").join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)")
              * (lit(1) - col("l_discount")).cast("decimal(18,2)"))
              .cast("double").as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bivariate statistics battery: correlation, covariance (pop/samp), the
    // OLS regression family, and population skewness/kurtosis. All are
    // single-pass partial+final aggregates (map-side moment accumulation —
    // the 100 TB shape; no second pass over the data). Spark's skewness /
    // kurtosis are POPULATION moments while DuckDB's are sample-corrected,
    // so the oracle derives the population forms from raw power sums.
    // Rounding: ratio-valued stats (corr, r2, slope, skew, kurt) are O(1)
    // and rounded at 6; covariances/intercept carry the price magnitude
    // (~1e4..1e6) and are rounded at 3, far above double noise.
    QueryDef("rel_agg_corr",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 3).as("covp_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 3).as("covs_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 3).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          round(skewness(col("l_quantity")), 6).as("skew_q"),
          round(kurtosis(col("l_quantity")), 6).as("kurt_q"))
        .orderBy("l_returnflag"),
      Some("""WITH p AS (SELECT l_returnflag,
             |                  count(*) AS n,
             |                  corr(l_quantity, l_extendedprice) AS c,
             |                  covar_pop(l_quantity, l_extendedprice) AS cp,
             |                  covar_samp(l_quantity, l_extendedprice) AS cs,
             |                  regr_slope(l_extendedprice, l_quantity) AS sl,
             |                  regr_intercept(l_extendedprice, l_quantity) AS ic,
             |                  regr_r2(l_extendedprice, l_quantity) AS r2,
             |                  avg(l_quantity) AS m1,
             |                  avg(l_quantity * l_quantity) AS p2,
             |                  avg(l_quantity * l_quantity * l_quantity) AS p3,
             |                  avg(l_quantity * l_quantity * l_quantity * l_quantity) AS p4
             |           FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |       round(c, 6) AS corr_qp,
             |       round(cp, 3) AS covp_qp,
             |       round(cs, 3) AS covs_qp,
             |       round(sl, 6) AS slope,
             |       round(ic, 3) AS intercept,
             |       round(r2, 6) AS r2,
             |       round((p3 - 3 * m1 * p2 + 2 * m1 * m1 * m1)
             |             / pow(p2 - m1 * m1, 1.5), 6) AS skew_q,
             |       round((p4 - 4 * m1 * p3 + 6 * m1 * m1 * p2 - 3 * m1 * m1 * m1 * m1)
             |             / pow(p2 - m1 * m1, 2) - 3, 6) AS kurt_q
             |FROM p ORDER BY l_returnflag""".stripMargin)),

    // 2-D skyline (Pareto front): parts not dominated on (maximize
    // retailprice, minimize size). The classic O(n²) dominance anti-join
    // collapses to ONE running-min pass when sorted by the first objective:
    // a point is on the front iff its size beats the minimum of everything
    // with better-or-equal price — O(n log n) total, the multi-objective
    // data-selection shape (quality vs cost curves). Runs the two-pass
    // distributed form (r8 graduation): range-partition by price,
    // per-partition local running min, broadcast prefix minima of prior
    // partitions (DistributedRank.globalRunningMin) — the only
    // unpartitioned window left is over the numPartitions-sized minima
    // spine, never the part table.
    QueryDef("rel_skyline",
      (s, d) => {
        DistributedRank.globalRunningMin(
          T(s, d, "part")
            .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
          Seq(col("p_retailprice").desc, col("p_partkey")),
          col("p_size"), "min_prev")
          .filter(col("min_prev").isNull || col("p_size") < col("min_prev"))
          .select("p_partkey", "p_retailprice", "p_size")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_retailprice, p_size FROM (
             |  SELECT p_partkey, p_retailprice, p_size,
             |         min(p_size) OVER (ORDER BY p_retailprice DESC, p_partkey
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |           AS min_prev
             |  FROM part)
             |WHERE min_prev IS NULL OR p_size < min_prev
             |ORDER BY p_partkey""".stripMargin)),

    // Median absolute deviation (robust spread — outliers move stddev but
    // not MAD): two exact median passes, each in the rel_percentiles
    // rank-weight sort-window form rather than the built-in median()
    // aggregate (a TypedImperativeAggregate — interpreted
    // ObjectHashAggregate vs codegen'd window+sum; measured 3.5s -> 2.9s
    // solo at sf0.1). The deviation window keys on the SAME partitioning
    // as the first, so per consumer the plan is one shuffle + in-partition
    // sorts. The interpolated midpoint v[lo]*(1-f) + v[lo+1]*f equals the
    // builtin's (a+b)/2 bit for bit at f=0.5 (halving is exact; IEEE
    // rounding commutes with it). Scale bound as rel_percentiles: sort
    // parallelism = #groups — right for grouped medians;
    // approx_percentile for few-huge-group corpora.
    QueryDef("rel_mad",
      (s, d) => {
        val pos = lit(0.5) * (col("n") - 1).cast("double")
        val lo = floor(pos)
        val frac = pos - lo
        def medAgg(v: Column): Column = sum(
          when(col("rn") === lo, v * (lit(1.0) - frac))
            .when(col("rn") === lo + 1, v * frac)
            .otherwise(lit(0.0)))
        val base = T(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice").as("v"))
        val sizes = base.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        val byV = Window.partitionBy("l_returnflag").orderBy("v")
        // NOT materialized: `ranked` feeds both the median aggregate and
        // the deviation pass and is recomputed for each (no common-subplan
        // reuse across these shapes), but an eager checkpoint measured
        // SLOWER than the recompute here (3.0s vs 2.9s) — the scan+shuffle
        // is cheaper than writing 600k ranked rows out and back
        val ranked = base
          .select(col("l_returnflag"), col("v"),
            (row_number().over(byV) - 1).cast("double").as("rn"))
          .join(broadcast(sizes), "l_returnflag")
        val med = ranked.groupBy("l_returnflag").agg(medAgg(col("v")).as("med"))
        val byDev = Window.partitionBy("l_returnflag").orderBy("dev")
        ranked.join(broadcast(med), "l_returnflag")
          .select(col("l_returnflag"), col("n"), col("med"),
            abs(col("v") - col("med")).as("dev"))
          .withColumn("rn", (row_number().over(byDev) - 1).cast("double"))
          .groupBy("l_returnflag")
          .agg(round(first(col("med")), 4).as("med"),
            round(medAgg(col("dev")), 4).as("mad"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (SELECT l_returnflag, median(l_extendedprice) AS med
             |           FROM lineitem GROUP BY 1)
             |SELECT l.l_returnflag, round(any_value(m.med), 4) AS med,
             |       round(median(abs(l.l_extendedprice - m.med)), 4) AS mad,
             |       count(*) AS n
             |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Benford first-digit profile of order totals — the classic
    // fabricated-data / anomaly screen. The leading digit comes from the
    // integer's decimal string (exact; float log10 sits a ulp from
    // integral exactly at the power-of-ten boundaries).
    QueryDef("rel_benford",
      (s, d) => T(s, d, "orders")
        // explicit floor: Spark's double->bigint cast truncates while
        // DuckDB's ROUNDS — floor() states the same integer in both
        .select(substring(floor(col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
          .as("first_digit"))
        .groupBy("first_digit")
        .agg(count(lit(1)).as("n"))
        .orderBy("first_digit"),
      Some("""SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
             |         AS first_digit,
             |       count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gini coefficient per group — the inequality readout for value
    // distributions (revenue concentration, token-frequency skew). Uses
    // the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over an ascending
    // in-group rank; ranking windows are PARTITIONED by the group, so no
    // global sort appears at any scale. round(6) sits far above the 1e-14
    // relative summation noise.
    QueryDef("rel_gini",
      (s, d) => {
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        T(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("i", row_number().over(w))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(lit(2.0) * sum(col("i") * col("l_extendedprice"))
              / (count(lit(1)) * sum(col("l_extendedprice")))
              - (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
          .orderBy("l_returnflag")
      },
      Some("""WITH r AS (SELECT l_returnflag, l_extendedprice,
             |                  row_number() OVER (PARTITION BY l_returnflag
             |                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS i
             |           FROM lineitem)
             |SELECT l_returnflag, count(*) AS n,
             |       round(2.0 * sum(i * l_extendedprice)
             |             / (count(*) * sum(l_extendedprice))
             |             - (count(*) + 1.0) / count(*), 6) AS gini
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ratio-to-report: each group's share of the total — a window over an
    // AGGREGATED result (the aggregate output is groups-sized, so the
    // unpartitioned share window is a trivial frame however large the
    // input). Exact decimal revenue; share rounded at 6.
    QueryDef("rel_share_of_total",
      (s, d) => {
        val wAll = Window.partitionBy()
        T(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
          .select(col("l_returnflag"), col("revenue"),
            round(col("revenue") / sum(col("revenue")).over(wAll), 6).as("share"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (SELECT l_returnflag,
             |                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |                    AS revenue
             |           FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, revenue,
             |       round(revenue / sum(revenue) OVER (), 6) AS share
             |FROM g ORDER BY l_returnflag""".stripMargin)),

    // Trigonometric / transcendental battery (geo math, positional
    // encodings): both engines call libm; round(6) clears the 1-ulp gap.
    QueryDef("fn_trig",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
          round(sin(col("l_quantity")), 6).as("sin_q"),
          round(cos(col("l_quantity")), 6).as("cos_q"),
          round(atan2(col("l_quantity"), col("l_discount") + 0.01), 6).as("atan2_qd"),
          round(degrees(col("l_discount")), 6).as("deg_d"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(expr("log(2.0, l_quantity)"), 6).as("log2_q"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |       round(sin(l_quantity), 6) AS sin_q,
             |       round(cos(l_quantity), 6) AS cos_q,
             |       round(atan2(l_quantity, l_discount + 0.01), 6) AS atan2_qd,
             |       round(degrees(l_discount), 6) AS deg_d,
             |       round(exp(l_discount), 6) AS exp_d,
             |       round(ln(l_quantity) / ln(2.0), 6) AS log2_q
             |FROM lineitem WHERE l_orderkey < 300
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // printf-style formatting + padding + repetition + character mapping —
    // key construction and report formatting.
    QueryDef("fn_format",
      (s, d) => T(s, d, "nation")
        .select(col("n_nationkey"),
          format_string("key-%05d", col("n_nationkey")).as("padded_key"),
          lpad(col("n_name"), 12, ".").as("lpadded"),
          rpad(col("n_name"), 12, "_").as("rpadded"),
          expr("repeat('ab', 3)").as("repeated"),
          translate(col("n_name"), "aeiou", "AEIOU").as("vowels_up"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
             |       printf('key-%05d', n_nationkey) AS padded_key,
             |       lpad(n_name, 12, '.') AS lpadded,
             |       rpad(n_name, 12, '_') AS rpadded,
             |       repeat('ab', 3) AS repeated,
             |       translate(n_name, 'aeiou', 'AEIOU') AS vowels_up
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // Generated date-dimension build (the calendar spine every warehouse
    // lands once and joins everywhere): one sequence() generator row
    // exploded into a day-per-row dim with derived attributes, bounds
    // taken from the fact table itself. No input rows besides the bounds
    // aggregate — the generator IS the source.
    QueryDef("rel_date_spine",
      (s, d) => T(s, d, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("dmin"),
          max(to_date(col("o_orderdate"))).as("dmax"))
        .select(explode(sequence(col("dmin"), col("dmax"))).as("d"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          year(col("d")).cast("bigint").as("yr"),
          quarter(col("d")).cast("bigint").as("qtr"),
          month(col("d")).cast("bigint").as("mo"),
          dayofweek(col("d")).cast("bigint").as("dow"),
          (dayofweek(col("d")).isin(1, 7)).cast("bigint").as("is_weekend"))
        .orderBy("d"),
      Some("""WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS dmin,
             |                  max(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
             |sp AS (SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS d FROM b)
             |SELECT strftime(d, '%Y-%m-%d') AS d,
             |       CAST(year(d) AS BIGINT) AS yr,
             |       CAST(quarter(d) AS BIGINT) AS qtr,
             |       CAST(month(d) AS BIGINT) AS mo,
             |       CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
             |       CAST(CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
             |FROM sp ORDER BY d""".stripMargin)),

    // CSV ingest with malformed-record handling: serialize order columns to
    // CSV text, corrupt a deterministic 2% (key % 50 = 0 gets a non-numeric
    // price), parse back with from_csv in PERMISSIVE mode — the bad field
    // comes back NULL instead of failing the job, the production contract
    // for dirty feeds. The double→text→double round-trip is exact, so the
    // parsed-price sum is decimal-gateable; the oracle knows the corrupt
    // set closed-form.
    QueryDef("fn_csv",
      (s, d) => {
        val line = when(col("o_orderkey") % 50 === 0,
            concat_ws(",", col("o_orderkey"), lit("notanumber"), col("o_orderstatus")))
          .otherwise(
            concat_ws(",", col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
        T(s, d, "orders")
          .select(col("o_orderkey"),
            from_csv(line,
              org.apache.spark.sql.types.StructType.fromDDL(
                "k BIGINT, price DOUBLE, status STRING"),
              Map("mode" -> "PERMISSIVE")).as("p"))
          .select(col("p.status").as("o_orderstatus"),
            col("p.price").isNull.cast("bigint").as("bad"),
            col("p.price"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("bad")).as("n_malformed"),
            sum(col("price").cast("decimal(18,2)")).cast("double").as("sum_price_parsed"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_rows,
             |       CAST(sum(CASE WHEN o_orderkey % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
             |       CAST(sum(CASE WHEN o_orderkey % 50 <> 0
             |                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price_parsed
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // XML ingest: from_xml over closed-form records with both an ATTRIBUTE
    // (the `_`-prefixed field convention) and nested elements — the legacy-
    // feed twin of fn_csv/fn_variant. Values replayed from source columns.
    QueryDef("fn_xml",
      (s, d) => {
        val xml = concat(lit("<r id=\""), col("o_orderkey"),
          lit("\"><s>"), col("o_orderstatus"),
          lit("</s><c><k>"), col("o_custkey"), lit("</k></c></r>"))
        T(s, d, "orders")
          .filter(col("o_orderkey") < 5000)
          .select(col("o_orderkey"),
            from_xml(xml, org.apache.spark.sql.types.StructType.fromDDL(
              "_id BIGINT, s STRING, c STRUCT<k: BIGINT>")).as("p"))
          .select(col("o_orderkey"), col("p._id").as("id_attr"),
            col("p.s").as("status"), col("p.c.k").as("custkey"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderkey AS id_attr, o_orderstatus AS status,
             |       o_custkey AS custkey
             |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin)),

    // Binary/text encodings: base64 + hex + a decode round-trip proved in
    // the result itself (storage keys, content addressing, wire formats).
    QueryDef("fn_encode",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          base64(substring(col("text"), 1, 24).cast("binary")).as("b64"),
          hex(col("doc_id")).as("id_hex"),
          (decode(unbase64(base64(substring(col("text"), 1, 24).cast("binary"))), "UTF-8")
            === substring(col("text"), 1, 24)).as("roundtrip"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       base64(encode(substr(text, 1, 24))) AS b64,
             |       to_hex(doc_id) AS id_hex,
             |       decode(from_base64(base64(encode(substr(text, 1, 24)))))
             |         = substr(text, 1, 24) AS roundtrip
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // CDC upsert (MERGE shape without a table format): a change set
    // full-outer-joined onto the base on the key, every column resolved as
    // coalesce(update, base) — inserts, updates, and untouched rows in one
    // declarative pass. At scale both sides shuffle once on the key (or
    // zero times if the base is bucketed on it, per rel_join_bucketed);
    // the change set is simulated deterministically from orders.
    // Incremental aggregate maintenance: a "materialized" base aggregate
    // (days before the cutoff) merged with a delta aggregate (days after)
    // must equal the full recompute — WHICH IS THE ORACLE. The merge is a
    // full-outer join on the group key with coalesced partial sums/counts;
    // this works because sum/count are commutative monoids, the property
    // that lets a 100 TB pipeline maintain daily rollups by merging each
    // new partition's partial aggregate instead of rescanning history.
    QueryDef("rel_incr_agg",
      (s, d) => {
        val ev = T(s, d, "events")
        val cut = lit("2024-01-20").cast("date")
        def agg(df: DataFrame, nc: String, sc: String) =
          df.groupBy("event_type")
            .agg(count(lit(1)).as(nc), sum(col("value")).as(sc))
        val base = agg(ev.filter(to_date(col("ts")) < cut), "n0", "s0")
        val delta = agg(ev.filter(to_date(col("ts")) >= cut), "n1", "s1")
        base.join(delta, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n"),
            round(coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0)), 2)
              .as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("rel_upsert",
      (s, d) => {
        val base = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        // change set: every 7th order re-priced + closed, plus one insert
        // reprice in DECIMAL: double*1.1 rounds ties differently per engine
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("u_key"), lit("X").as("u_status"),
            round(col("o_totalprice").cast("decimal(18,2)")
              * lit(1.1).cast("decimal(2,1)"), 2).cast("double").as("u_price"))
          .unionAll(s.range(1).select(lit(900000001L).as("u_key"),
            lit("X").as("u_status"), lit(42.0).as("u_price")))
        base.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
          .select(coalesce(col("o_orderkey"), col("u_key")).as("o_orderkey"),
            coalesce(col("u_status"), col("o_orderstatus")).as("status"),
            coalesce(col("u_price"), col("o_totalprice")).as("price"),
            col("u_key").isNotNull.as("changed"))
          .orderBy("o_orderkey")
      },
      Some("""WITH u AS (SELECT o_orderkey AS u_key, 'X' AS u_status,
             |                  CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
             |                             * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS u_price
             |           FROM orders WHERE o_orderkey % 7 = 0
             |           UNION ALL SELECT 900000001, 'X', 42.0)
             |SELECT coalesce(o_orderkey, u_key) AS o_orderkey,
             |       coalesce(u_status, o_orderstatus) AS status,
             |       coalesce(u_price, o_totalprice) AS price,
             |       u_key IS NOT NULL AS changed
             |FROM orders FULL OUTER JOIN u ON o_orderkey = u_key
             |ORDER BY o_orderkey""".stripMargin)),

    // Aggregate functions as WINDOW aggregates over a whole-partition
    // frame: each row carries its group's exact median and mean — the
    // "compare me to my cohort" projection without a join in the user's
    // query (the engine's whole-partition frame IS the relational
    // group-join, which is how the oracle states it).
    QueryDef("win_median",
      (s, d) => {
        val wf = Window.partitionBy("c_mktsegment")
        T(s, d, "customer")
          .filter(col("c_custkey") < 500)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            round(median(col("c_acctbal")).over(wf), 4).as("seg_median"),
            (floor(sum(col("c_acctbal").cast("decimal(18,2)")).over(wf).cast("double")
              * lit(10000.0) / count(lit(1)).over(wf)) / 10000).as("seg_avg"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, g.seg_median, g.seg_avg
             |FROM customer c
             |JOIN (SELECT c_mktsegment,
             |             round(median(c_acctbal), 4) AS seg_median,
             |             floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |                   * 10000.0 / count(*)) / 10000 AS seg_avg
             |      FROM customer WHERE c_custkey < 500 GROUP BY 1) g
             |  ON c.c_mktsegment = g.c_mktsegment
             |WHERE c.c_custkey < 500
             |ORDER BY c.c_custkey""".stripMargin)),

    // Error-safe expression surface: try_divide / try_cast / try_element_at
    // return NULL where the strict forms throw (or where ANSI off yields
    // engine-lore) — the dirty-data posture a 100 TB ingest runs with. The
    // oracle states each fallback explicitly (CASE / TRY_CAST / OOB index).
    QueryDef("fn_try",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          round(expr("try_divide(n_chars, doc_id % 5)"), 4).as("chars_per"),
          expr("try_cast(lang AS INT)").as("lang_int"),
          expr("try_element_at(split(text, ' '), 1000)").as("tok1000"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       round(CASE WHEN doc_id % 5 = 0 THEN NULL
             |                  ELSE n_chars / (doc_id % 5) END, 4) AS chars_per,
             |       TRY_CAST(lang AS INT) AS lang_int,
             |       string_split(text, ' ')[1000] AS tok1000
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // grouping()/grouping_id() disambiguate "aggregated away" from "the
    // value was NULL" in cube output — without them rollup rows are
    // unreadable on nullable dimensions. Bit conventions agree across
    // engines (tested: grand total = 3 for two dims in both).
    QueryDef("rel_grouping_id",
      (s, d) => T(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("bigint").as("g_flag"),
          grouping(col("l_linestatus")).cast("bigint").as("g_status"),
          grouping_id().as("gid"),
          sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             |       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |       sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Deterministic per-group uniform sample via hash-priority bottom-k:
    // rank rows by md5 of their unique key and keep the k smallest per
    // group — a reproducible distributed reservoir (same sample on every
    // run/engine, no RNG state). The row_number-only shape map-side prunes
    // via WindowGroupLimit, so the shuffle carries O(groups·k) rows: this
    // is how you sample 100 TB without a global sort or driver RNG.
    QueryDef("rel_sample_bottomk",
      (s, d) => {
        val prio = md5(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")))
        val w = Window.partitionBy("l_returnflag").orderBy(prio, col("l_orderkey"))
        T(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("l_returnflag", "rn")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, rn FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber,
             |         CAST(row_number() OVER (PARTITION BY l_returnflag
             |           ORDER BY md5(l_orderkey || '-' || l_linenumber), l_orderkey) AS INT) AS rn
             |  FROM lineitem)
             |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin)),

    // Argmax/argmin as single-pass aggregates: max over a (measure, key)
    // struct compares lexicographically, so the carried key IS the argmax
    // (ties resolved by the key itself — deterministic). No window, no
    // second scan; partial+final like any other aggregate.
    QueryDef("rel_agg_maxby",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          max(struct(col("l_extendedprice").as("p"), col("l_orderkey").as("k")))
            .getField("k").as("top_order"),
          min(struct(col("l_extendedprice").as("p"), col("l_orderkey").as("k")))
            .getField("k").as("bottom_order"),
          max(col("l_extendedprice")).as("max_price"),
          min(col("l_extendedprice")).as("min_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       (max({'p': l_extendedprice, 'k': l_orderkey})).k AS top_order,
             |       (min({'p': l_extendedprice, 'k': l_orderkey})).k AS bottom_order,
             |       max(l_extendedprice) AS max_price,
             |       min(l_extendedprice) AS min_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The third equi-join strategy: shuffled-hash (build a hash map per
    // partition instead of sorting both sides — wins when one side is much
    // smaller per partition but too big to broadcast). PlanQualitySpec
    // asserts ShuffledHashJoin is actually chosen.
    QueryDef("rel_join_shufflehash",
      (s, d) => T(s, d, "lineitem")
        .hint("shuffle_hash")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Theta (non-equi) join against a tiny banding dimension: BETWEEN-style
    // range predicates broadcast the dim and evaluate as a nested-loop over
    // 3 rows per record — the price-band / bucketing-dim shape. (For
    // range joins against LARGE interval sets, IntervalJoin's bucketed
    // equi-join is the scale path; this is the broadcast-dim form.)
    QueryDef("rel_join_theta",
      (s, d) => {
        import s.implicits._
        val bands = Seq(("low", 0.0, 935.0), ("mid", 935.0, 965.0),
          ("high", 965.0, 1e9)).toDF("band", "lo", "hi")
        T(s, d, "part")
          .join(broadcast(bands),
            col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_parts"),
            (floor(sum(col("p_retailprice").cast("decimal(18,2)")).cast("double")
              * lit(100.0) / count(lit(1))) / 100).as("avg_price"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS n_parts,
             |       floor(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             |             * 100.0 / count(*)) / 100 AS avg_price
             |FROM part
             |JOIN (VALUES ('low', 0.0, 935.0), ('mid', 935.0, 965.0),
             |             ('high', 965.0, 1e9)) b(band, lo, hi)
             |  ON p_retailprice >= lo AND p_retailprice < hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Predicate aggregates: bool_and / bool_or / count_if — data-quality
    // assertions as single-pass grouped aggregation (all-rows-valid,
    // any-row-flagged, violation counts).
    QueryDef("rel_agg_bool",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(bool_and(col("l_quantity") < 51).as("all_qty_ok"),
          bool_or(col("l_discount") > 0.09).as("any_deep_disc"),
          count_if(col("l_tax") > 0.04).as("n_high_tax"),
          count_if(col("l_discount") === 0).as("n_no_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       bool_and(l_quantity < 51) AS all_qty_ok,
             |       bool_or(l_discount > 0.09) AS any_deep_disc,
             |       CAST(count_if(l_tax > 0.04) AS BIGINT) AS n_high_tax,
             |       CAST(count_if(l_discount = 0) AS BIGINT) AS n_no_disc,
             |       count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Windowed DISTINCT count — Spark's window aggregates reject DISTINCT,
    // so the idiomatic form is size(collect_set() OVER w) on a whole-
    // partition frame. The oracle states the same thing relationally (a
    // per-group distinct count joined back), which is exactly what the
    // whole-partition frame computes.
    QueryDef("win_distinct",
      (s, d) => {
        val wf = Window.partitionBy("l_orderkey")
        T(s, d, "lineitem")
          .filter(col("l_orderkey") < 2000)
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            size(collect_set(col("l_suppkey")).over(wf)).cast("bigint").as("n_supp"),
            size(collect_set(col("l_partkey")).over(wf)).cast("bigint").as("n_part"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
             |       g.n_supp, g.n_part
             |FROM lineitem l
             |JOIN (SELECT l_orderkey,
             |             count(DISTINCT l_suppkey) AS n_supp,
             |             count(DISTINCT l_partkey) AS n_part
             |      FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1) g
             |  ON l.l_orderkey = g.l_orderkey
             |WHERE l.l_orderkey < 2000
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    // Referential-integrity audit: orphan-foreign-key counts for every
    // fact→dim edge of the schema in one result — the data-quality gate a
    // warehouse runs after every load. Each edge is a left-anti join
    // (dims broadcast when small); counts are exact. On this synthetic
    // schema events.user_id ⊂ customer keys and lineitem ⊂ orders, so a
    // healthy load reports zeros — the query's value is that a bad load
    // CAN'T report zeros.
    QueryDef("rel_ri_audit",
      (s, d) => {
        def orphans(edge: String, fact: DataFrame, fk: String,
                    dim: DataFrame, pk: String) =
          fact.select(col(fk).as("k"))
            .join(dim.select(col(pk).as("k")), Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(edge).as("edge"), col("n_orphans"))
        orphans("events.user_id->customer", T(s, d, "events"), "user_id",
            T(s, d, "customer"), "c_custkey")
          .unionAll(orphans("lineitem.l_orderkey->orders", T(s, d, "lineitem"),
            "l_orderkey", T(s, d, "orders"), "o_orderkey"))
          .unionAll(orphans("orders.o_custkey->customer", T(s, d, "orders"),
            "o_custkey", T(s, d, "customer"), "c_custkey"))
          .unionAll(orphans("supplier.s_nationkey->nation", T(s, d, "supplier"),
            "s_nationkey", T(s, d, "nation"), "n_nationkey"))
          .orderBy("edge")
      },
      Some("""SELECT 'events.user_id->customer' AS edge,
             |       (SELECT count(*) FROM events e WHERE NOT EXISTS
             |        (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS n_orphans
             |UNION ALL
             |SELECT 'lineitem.l_orderkey->orders',
             |       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             |UNION ALL
             |SELECT 'orders.o_custkey->customer',
             |       (SELECT count(*) FROM orders o WHERE NOT EXISTS
             |        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             |UNION ALL
             |SELECT 'supplier.s_nationkey->nation',
             |       (SELECT count(*) FROM supplier s WHERE NOT EXISTS
             |        (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
             |ORDER BY edge""".stripMargin)),

    // Data profiling (the SUMMARIZE shape): one row per column with row
    // count, null count, exact distinct count, and min/max — the first
    // query anyone runs against an unfamiliar 100 TB table. ONE scan
    // computes every column's statistics (no per-column rescans;
    // PlanQualitySpec asserts the single FileScan); stack() unpivots the
    // wide row. The exact multi-distinct does cost Catalyst's Expand (one
    // duplicated row stream per distinct column) — at 100 TB swap
    // count_distinct for approx_count_distinct and the Expand disappears,
    // same single-scan shape. Numeric extremes are rounded before the
    // string cast so both engines print identically.
    QueryDef("rel_profile",
      (s, d) => {
        def prof(c: String, minMax: Column => Column = identity) = Seq(
          sum(col(c).isNull.cast("long")).as(s"${c}_nulls"),
          count_distinct(col(c)).as(s"${c}_nd"),
          minMax(min(col(c))).cast("string").as(s"${c}_min"),
          minMax(max(col(c))).cast("string").as(s"${c}_max"))
        val cols = Seq("event_id", "user_id", "event_type").flatMap(prof(_)) ++
          prof("value", round(_, 2))
        T(s, d, "events")
          .agg(count(lit(1)).as("n_rows"), cols: _*)
          .selectExpr("n_rows",
            """stack(4,
              |'event_id', event_id_nulls, event_id_nd, event_id_min, event_id_max,
              |'event_type', event_type_nulls, event_type_nd, event_type_min, event_type_max,
              |'user_id', user_id_nulls, user_id_nd, user_id_min, user_id_max,
              |'value', value_nulls, value_nd, value_min, value_max
              |) AS (col_name, n_nulls, n_distinct, min_val, max_val)""".stripMargin)
          .orderBy("col_name")
      },
      Some("""WITH a AS (SELECT count(*) AS n_rows,
             |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS id_nulls,
             |  count(DISTINCT event_id) AS id_nd,
             |  CAST(min(event_id) AS VARCHAR) AS id_min, CAST(max(event_id) AS VARCHAR) AS id_max,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS et_nulls,
             |  count(DISTINCT event_type) AS et_nd,
             |  CAST(min(event_type) AS VARCHAR) AS et_min, CAST(max(event_type) AS VARCHAR) AS et_max,
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u_nulls,
             |  count(DISTINCT user_id) AS u_nd,
             |  CAST(min(user_id) AS VARCHAR) AS u_min, CAST(max(user_id) AS VARCHAR) AS u_max,
             |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nulls,
             |  count(DISTINCT value) AS v_nd,
             |  CAST(round(min(value), 2) AS VARCHAR) AS v_min,
             |  CAST(round(max(value), 2) AS VARCHAR) AS v_max
             |  FROM events)
             |SELECT n_rows, 'event_id' AS col_name, id_nulls AS n_nulls, id_nd AS n_distinct,
             |       id_min AS min_val, id_max AS max_val FROM a
             |UNION ALL
             |SELECT n_rows, 'event_type', et_nulls, et_nd, et_min, et_max FROM a
             |UNION ALL
             |SELECT n_rows, 'user_id', u_nulls, u_nd, u_min, u_max FROM a
             |UNION ALL
             |SELECT n_rows, 'value', v_nulls, v_nd, v_min, v_max FROM a
             |ORDER BY col_name""".stripMargin)),

    // EXACT distinct counting that rolls up: count(DISTINCT) re-shuffles raw
    // keys at every regrouping, and HLL (rel_hll_merge) is approximate —
    // bitmap aggregation is the exact MERGEABLE middle. Keys land in
    // fixed-width bucket bitmaps (bitmap_bucket_number / bitmap_bit_position),
    // partial aggregates OR bit-vectors instead of holding key sets, and the
    // per-(group, bucket) bitmap is a pre-aggregate any coarser rollup can
    // re-OR without touching raw data — the datamart shape for exact
    // distincts over 100 TB. Oracle: plain count(DISTINCT).
    QueryDef("rel_bitmap_distinct",
      (s, d) => T(s, d, "lineitem")
        .groupBy(col("l_returnflag"), expr("bitmap_bucket_number(l_suppkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_suppkey))").as("bm"))
        .groupBy("l_returnflag")
        .agg(sum(expr("bitmap_count(bm)")).cast("bigint").as("n_supp"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
