package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third batch of relational inventory: the remaining distinct TPC-H
  * planner shapes expressible on this star schema (the tables carry no
  * `partsupp`, `l_commitdate`/`l_receiptdate`, or phone column, so Q13/
  * Q17/Q19/Q7 keep their canonical structure and Q21/Q22 swap the missing
  * column for an equivalent predicate on what exists), plus the
  * first/second/last window-value battery.
  *
  * Reference anchor: the reference engine exposes arbitrary map/reduce
  * over tabular rows (/root/reference/mapreduce.py); these queries pin the
  * declarative join/agg surface a user would otherwise hand-write there.
  */
object RelationalQueries3 {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private def rev = col("l_extendedprice").cast("decimal(18,2)") *
    (lit(1) - col("l_discount")).cast("decimal(18,2)")

  val queries: Seq[QueryDef] = Seq(

    // TPC-H Q13 shape (customer order-count distribution): LEFT join with a
    // predicate ON THE JOIN'S RIGHT SIDE (not a post-filter — customers
    // whose every order is urgent must still appear with count 0), then a
    // second aggregation over the first's result. The double agg is cheap:
    // pass one shuffles on custkey, pass two on the tiny count domain.
    QueryDef("rel_join_q13",
      (s, d) => {
        val co = T(s, d, "customer")
          .join(T(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
            col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        co.groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
             |            FROM customer LEFT JOIN orders
             |              ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
             |            GROUP BY 1)
             |SELECT c_count, count(*) AS custdist
             |FROM co GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q17 shape (small-quantity revenue): per-part correlated average
    // decorrelated the way Catalyst (and every 100 TB plan) wants it — the
    // brand's partkeys semi-filter lineitem FIRST (broadcast semi join), so
    // the per-part avg aggregates ~1/25th of the fact table; the threshold
    // join is then agg-to-fact on the same l_partkey shuffle key. The avg
    // is exact (integer-valued quantities sum exactly in double), so the
    // `<` comparison is engine-independent.
    QueryDef("rel_join_q17",
      (s, d) => {
        val bparts = T(s, d, "part")
          .filter(col("p_brand") === "Brand#3").select("p_partkey")
        val li = T(s, d, "lineitem")
          .join(broadcast(bparts), col("l_partkey") === col("p_partkey"), "left_semi")
        val thr = li.groupBy("l_partkey")
          .agg((avg("l_quantity") * 0.2).as("qty_thr"))
        li.join(thr, "l_partkey")
          .filter(col("l_quantity") < col("qty_thr"))
          .agg(
            (floor(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              * lit(10000.0) / lit(7.0)) / 10000).as("avg_yearly"),
            count(lit(1)).as("n_lines"))
      },
      Some("""WITH li AS (SELECT * FROM lineitem
             |            WHERE l_partkey IN (SELECT p_partkey FROM part
             |                                WHERE p_brand = 'Brand#3')),
             |thr AS (SELECT l_partkey, avg(l_quantity) * 0.2 AS qty_thr
             |        FROM li GROUP BY 1)
             |SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |             * 10000.0 / 7.0) / 10000 AS avg_yearly,
             |       count(*) AS n_lines
             |FROM li JOIN thr USING (l_partkey)
             |WHERE l_quantity < qty_thr""".stripMargin)),

    // TPC-H Q19 shape (disjunctive predicate join): OR-of-ANDs mixing both
    // sides' columns — the classic test of partial predicate pushdown.
    // Catalyst's PushExtraPredicateThroughJoin derives the part-only
    // disjunction (brand+size) and pushes it into the part scan, so at
    // 100 TB the dimension read shrinks to the three brands before the
    // join; the mixed residual stays above.
    QueryDef("rel_join_q19",
      (s, d) => {
        val c1 = col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
        val c2 = col("p_brand") === "Brand#2" &&
          col("p_size").between(10, 30) && col("l_quantity").between(10, 20)
        val c3 = col("p_brand") === "Brand#3" &&
          col("p_size").between(20, 50) && col("l_quantity").between(20, 30)
        T(s, d, "lineitem")
          .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .filter(c1 || c2 || c3)
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |                CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |       count(*) AS n_lines
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q7 shape (bi-nation shipping volume by year): the nation pair
    // filter is applied to the DIMENSIONS before they touch the fact —
    // supplier and customer each shrink to two nations' rows (broadcast
    // nation, then the reduced dims join the fact), so at 100 TB the fact
    // join carries ~2/25ths of supplier/customer instead of filtering
    // after a full 4-way join. The cross-pair residual runs post-join.
    QueryDef("rel_join_q7",
      (s, d) => {
        val nats = Seq("NATION_1", "NATION_2")
        val supp = T(s, d, "supplier")
          .join(broadcast(T(s, d, "nation").filter(col("n_name").isin(nats: _*))
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = T(s, d, "customer")
          .join(broadcast(T(s, d, "nation").filter(col("n_name").isin(nats: _*))
            .select(col("n_nationkey"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "cust_nation")
        T(s, d, "lineitem")
          .join(T(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("bigint").as("l_year"))
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       year(l_shipdate) AS l_year,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |                CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |       count(*) AS n_lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON n1.n_nationkey = s_nationkey
             |JOIN nation n2 ON n2.n_nationkey = c_nationkey
             |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
             |  AND n2.n_name IN ('NATION_1', 'NATION_2')
             |  AND n1.n_name <> n2.n_name
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS + NOT
    // EXISTS correlated on the SAME fact table — a semi join then an anti
    // join, all keyed on l_orderkey so the three passes share one shuffle
    // key (co-partitioned at scale). The schema has no commit/receipt
    // dates, so "late" is shipped >365 days after the order date.
    QueryDef("rel_join_q21",
      (s, d) => {
        val late = T(s, d, "lineitem")
          .join(T(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate").cast("date") >
            date_add(col("o_orderdate").cast("date"), 365))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val allLines = T(s, d, "lineitem")
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val lateOther = late.select(col("ok").as("ok3"), col("sk").as("sk3"))
        late
          .join(allLines, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
          .join(lateOther, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
          .join(broadcast(T(s, d, "supplier").select("s_suppkey", "s_name")),
            col("sk") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""WITH late AS (SELECT l_orderkey AS ok, l_suppkey AS sk
             |              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |              WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 365)
             |SELECT s_name, count(*) AS numwait
             |FROM late l1 JOIN supplier ON s_suppkey = l1.sk
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
             |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin)),

    // TPC-H Q22 shape (dormant rich customers): scalar aggregate threshold
    // (broadcast as a 1-row cross join) + anti join against recent orders,
    // rolled up by nation. The above-average test multiplies through by the
    // count (`bal * n > sum`) so both engines compare EXACT decimals — no
    // float-average boundary risk (the parity trap rel_* averages hit).
    QueryDef("rel_join_q22",
      (s, d) => {
        val cust = T(s, d, "customer")
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("bal_sum"),
            count(lit(1)).as("bal_n"))
        val recent = T(s, d, "orders")
          .filter(col("o_orderdate") >= "2000-01-01").select("o_custkey")
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal").cast("decimal(18,2)") * col("bal_n") > col("bal_sum"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
          .orderBy("n_name")
      },
      Some("""WITH thr AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
             |                    count(*) AS bal_n
             |             FROM customer WHERE c_acctbal > 0)
             |SELECT n_name, count(*) AS numcust,
             |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             |FROM customer CROSS JOIN thr
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Weighted sampling without replacement, exactly and reproducibly:
    // each row gets `w` integer tickets, its priority is the MIN Knuth
    // hash over them, and the per-group k smallest priorities win.
    // P(priority < t) = 1 − (1−t)^w — the min-of-w-uniforms is
    // Efraimidis–Spirakis' u^(1/w) key in distribution, but stays in
    // EXACT integer space (float pow near a rank boundary would not be
    // engine-stable). The LLM-mixture use: sample documents proportional
    // to quality weight, identically on every engine/run/partitioning.
    // Scale: ticket fan-out is O(Σw) — fine for small integer weights;
    // for large/real weights the log-space E-S key replaces the explode
    // (same plan shape, one pow per row, rank-boundary care needed).
    QueryDef("rel_sample_weighted",
      (s, d) => {
        val rk = (col("l_orderkey") * 10 + col("l_linenumber")).as("rk")
        // (rk, w) is the sampling unit: the synthetic lineitem repeats
        // (orderkey, linenumber) pairs, so same-rk rows share tickets and
        // can tie on priority — w in the ORDER makes the rank total over
        // the group keys (real pipelines key rows uniquely and skip this).
        val w = Window
          .partitionBy("l_returnflag").orderBy(col("priority"), col("rk"), col("w"))
        T(s, d, "lineitem")
          .select(col("l_returnflag"), rk, col("l_quantity").cast("int").as("w"))
          .select(col("l_returnflag"), col("rk"), col("w"),
            explode(sequence(lit(1), col("w"))).as("j"))
          .select(col("l_returnflag"), col("rk"), col("w"),
            graft.functions.HashFns.knuthU(col("rk") * 64 + col("j")).as("t"))
          .groupBy("l_returnflag", "rk", "w").agg(min(col("t")).as("priority"))
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .filter(col("rn") <= 5)
          .select(col("l_returnflag"), col("rn"), col("rk"), col("w"), col("priority"))
          .orderBy("l_returnflag", "rn")
      },
      Some(s"""WITH t AS (SELECT l_returnflag, l_orderkey * 10 + l_linenumber AS rk,
             |                  CAST(l_quantity AS INT) AS w,
             |                  unnest(generate_series(1, CAST(l_quantity AS INT))) AS j
             |           FROM lineitem),
             |pr AS (SELECT l_returnflag, rk, w,
             |              min(${graft.functions.HashFns.knuthUSql("rk * 64 + j")}) AS priority
             |       FROM t GROUP BY 1, 2, 3),
             |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
             |                ORDER BY priority, rk, w) AS rn FROM pr)
             |SELECT l_returnflag, rn, rk, w, priority FROM r WHERE rn <= 5
             |ORDER BY l_returnflag, rn""".stripMargin)),

    // TPC-H Q2 shape (min-cost supplier): the correlated "= (SELECT min …)"
    // aggregate-equality select — every supplier achieving the per-part
    // minimum survives (ties included). No partsupp table here, so the
    // metric is min sale price per (part, supplier) from lineitem; min is a
    // SELECTION (exact double), so the equality is engine-independent.
    // Decorrelated the way the 100 TB plan wants: the size-25 partkeys
    // semi-filter lineitem FIRST, the per-part minimum aggregates the
    // already-tiny (part, supplier) frame, and dims broadcast.
    QueryDef("rel_join_q2",
      (s, d) => {
        val p25 = T(s, d, "part").filter(col("p_size") === 25)
          .select("p_partkey", "p_name")
        val ps = T(s, d, "lineitem")
          .join(broadcast(p25.select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(col("l_extendedprice")).as("m"))
        val pm = ps.groupBy(col("l_partkey").as("pk"))
          .agg(min(col("m")).as("pm"))
        ps.join(pm, col("l_partkey") === col("pk") && col("m") === col("pm"))
          .join(broadcast(p25), col("l_partkey") === col("p_partkey"))
          .join(broadcast(T(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
            col("m").as("min_price"))
          .orderBy("p_partkey", "s_suppkey")
      },
      Some("""WITH p25 AS (SELECT p_partkey, p_name FROM part WHERE p_size = 25),
             |ps AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS m
             |       FROM lineitem
             |       WHERE l_partkey IN (SELECT p_partkey FROM p25)
             |       GROUP BY 1, 2)
             |SELECT p_partkey, p_name, s_suppkey, s_name, m AS min_price
             |FROM ps
             |JOIN p25 ON p_partkey = l_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |WHERE m = (SELECT min(m) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey)
             |ORDER BY p_partkey, s_suppkey""".stripMargin)),

    // Cumulative gains / lift table: customers ranked by account balance
    // (the "model score" stand-in), conversion = ordered since 2000-01-01;
    // per decile the cumulative conversion rate over the baseline rate,
    // quantized once from exact integer products (cum_conv·tn / cum_n·tc).
    // The decile comes from DistributedRank.globalRowNumber + ntileFromRank
    // (r8 graduation) — ntile's spec is a pure function of global rank and
    // total count, so the score table is range-partitioned and ranked
    // distributed; no customer-sized single-task window remains.
    QueryDef("win_lift",
      (s, d) => {
        val conv = T(s, d, "orders")
          .filter(col("o_orderdate") >= "2000-01-01")
          .select("o_custkey").distinct()
        val scored = T(s, d, "customer")
          .join(conv, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_acctbal"),
            when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("converted"))
        val nTot = broadcast(scored.agg(count(lit(1)).as("n_total")))
        val dec = DistributedRank.globalRowNumber(scored,
            Seq(col("c_acctbal").desc, col("c_custkey")), "rk")
          .crossJoin(nTot)
          .withColumn("decile",
            DistributedRank.ntileFromRank(col("rk"), col("n_total"), 10)
              .cast("bigint"))
          .drop("rk", "n_total")
        val byDec = dec.groupBy("decile")
          .agg(count(lit(1)).as("n"), sum("converted").as("n_conv"))
        val tot = byDec.agg(sum("n").as("tn"), sum("n_conv").as("tc"))
        val wc = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byDec.crossJoin(broadcast(tot))
          .select(col("decile"), col("n"), col("n_conv"),
            sum(col("n")).over(wc).as("cum_n"),
            sum(col("n_conv")).over(wc).as("cum_conv"),
            col("tn"), col("tc"))
          .select(col("decile"), col("n"), col("n_conv"), col("cum_n"), col("cum_conv"),
            (floor(col("cum_conv") * col("tn") * lit(1000000.0)
              / (col("cum_n") * col("tc"))) / 10000).as("cum_lift_pct"))
          .orderBy("decile")
      },
      Some("""WITH conv AS (SELECT DISTINCT o_custkey FROM orders
             |              WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
             |scored AS (SELECT c_custkey, c_acctbal,
             |                  CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END AS converted
             |           FROM customer LEFT JOIN conv ON c_custkey = o_custkey),
             |dec AS (SELECT *, ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
             |        FROM scored),
             |byd AS (SELECT decile, count(*) AS n, CAST(sum(converted) AS BIGINT) AS n_conv
             |        FROM dec GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_conv) AS BIGINT) AS tc
             |        FROM byd),
             |cum AS (SELECT decile, n, n_conv,
             |               CAST(sum(n) OVER w AS BIGINT) AS cum_n,
             |               CAST(sum(n_conv) OVER w AS BIGINT) AS cum_conv
             |        FROM byd
             |        WINDOW w AS (ORDER BY decile
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT decile, n, n_conv, cum_n, cum_conv,
             |       floor(cum_conv * tn * 1000000.0 / (cum_n * tc)) / 10000 AS cum_lift_pct
             |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin)),

    // first/second/last window-value battery: per-segment podium row via
    // an UNBOUNDED-both-ways frame (nth_value needs the full frame — the
    // default frame stops at CURRENT ROW and would return NULL for rows
    // before the nth). One window shuffle; rn=1 filter keeps a row per
    // segment. Ties broken by (acctbal DESC, custkey) total order.
    QueryDef("win_nth",
      (s, d) => {
        val ord = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wf = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, d, "customer")
          .select(col("c_mktsegment"),
            row_number().over(ord).as("rn"),
            first(col("c_name")).over(wf).as("top_name"),
            nth_value(col("c_name"), 2).over(wf).as("second_name"),
            last(col("c_name")).over(wf).as("bottom_name"),
            first(col("c_acctbal")).over(wf).as("top_bal"),
            last(col("c_acctbal")).over(wf).as("bottom_bal"))
          .filter(col("rn") === 1).drop("rn")
          .orderBy("c_mktsegment")
      },
      Some("""WITH w AS (SELECT c_mktsegment,
             |       row_number() OVER ord AS rn,
             |       first_value(c_name) OVER wf AS top_name,
             |       nth_value(c_name, 2) OVER wf AS second_name,
             |       last_value(c_name) OVER wf AS bottom_name,
             |       first_value(c_acctbal) OVER wf AS top_bal,
             |       last_value(c_acctbal) OVER wf AS bottom_bal
             |FROM customer
             |WINDOW ord AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
             |       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |SELECT c_mktsegment, top_name, second_name, bottom_name, top_bal, bottom_bal
             |FROM w WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin))
  )
}
