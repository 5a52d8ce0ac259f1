package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational batch: the remaining TPC-H planner shapes (Q4, Q6, Q8,
  * Q9, Q11, Q12, Q15, Q16, Q20) restated on this star schema. The synthetic
  * tables carry no `partsupp`, ship-mode, or commit/receipt dates, so the
  * queries keep each benchmark's PLAN shape (the thing that matters at
  * 100 TB — which side broadcasts, where the correlated aggregate
  * decorrelates to, what pushes into the scan) while substituting
  * equivalent predicates on the columns that exist. Every float output is
  * an exact decimal sum cast once, per the repo determinism contract.
  *
  * Reference anchor: the reference engine only offers arbitrary map/reduce
  * over rows (/root/reference/mapreduce.py:16-35); this is the declarative
  * surface a user would otherwise hand-roll there.
  */
object RelationalQueries4 {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private def rev = col("l_extendedprice").cast("decimal(18,2)") *
    (lit(1) - col("l_discount")).cast("decimal(18,2)")

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"

  /** Order-independent per-returnflag checksum of lineitem's business
    * columns (see rel_table_checksum). Exposed so the spec can pin
    * partition-independence by feeding a repartitioned input.
    */
  def lineitemChecksum(lineitem: DataFrame): DataFrame = {
    val M = 2147483647L
    def step(h: Column, term: Column): Column = pmod(h * 31 + term, lit(M))
    val rowh = Seq(
      pmod(col("l_orderkey"), lit(M)),
      col("l_linenumber").cast("long"),
      pmod(round(col("l_extendedprice") * 100).cast("long"), lit(M)),
      col("l_quantity").cast("long"),
      ascii(col("l_returnflag")).cast("long"),
      round(col("l_discount") * 100).cast("long"))
      .reduceLeft(step)
    lineitem
      .select(col("l_returnflag"), rowh.as("h"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
      .orderBy("l_returnflag")
  }

  val queries: Seq[QueryDef] = Seq(

    // TPC-H Q4 shape (order priority checking): EXISTS correlated on the
    // fact — a left-semi join whose condition mixes both sides' columns
    // (l_shipdate vs o_orderdate+30), so it cannot collapse to a plain
    // equi-semi + pushed filter; the quarter filter DOES push into the
    // orders scan, shrinking the semi join's build side first. At 100 TB
    // both sides shuffle on orderkey once; nothing re-reads the fact.
    QueryDef("rel_join_q4",
      (s, d) => {
        val ords = T(s, d, "orders")
          .filter(col("o_orderdate") >= "1996-07-01" &&
            col("o_orderdate") < "1996-10-01")
        ords
          .join(T(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate").cast("date") >
                date_add(col("o_orderdate").cast("date"), 30),
            "left_semi")
          .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
             |  AND o_orderdate < TIMESTAMP '1996-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND CAST(l_shipdate AS DATE) >
             |                    CAST(o_orderdate AS DATE) + 30)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q6 shape (forecast revenue change): the no-join scan-aggregate —
    // every predicate is a scan-pushable range, so the 100 TB plan is a
    // parquet scan with all three PushedFilters, row-group pruning on the
    // shipdate min/max stats, and a two-column ReadSchema feeding a partial
    // agg (PlanQualitySpec asserts the pushdown). The discount band compares
    // integer CENTS — a double literal band (0.05..0.07) would hinge on
    // representation, cents are engine-exact.
    QueryDef("rel_scan_q6",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1998-01-01" && col("l_quantity") < 24)
        .filter(round(col("l_discount") * 100).cast("int").between(5, 7))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |       count(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_quantity < 24
             |  AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7""".stripMargin)),

    // TPC-H Q8 shape (national market share): conditional-sum-over-sum on a
    // multi-dim join. Dimension filters apply BEFORE the fact join: the
    // PROMO partkeys semi-filter lineitem (broadcast), the EUROPE customer
    // set semi-filters orders' custkeys, and supplier+nation broadcast to
    // tag each line with its supp nation. Share = floor-quantized once from
    // two exact decimal sums — no per-year float accumulation.
    QueryDef("rel_join_q8",
      (s, d) => {
        val eurKeys = T(s, d, "nation")
          .join(broadcast(T(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        val cust = T(s, d, "customer")
          .join(broadcast(eurKeys), col("c_nationkey") === col("n_nationkey"),
            "left_semi")
          .select("c_custkey")
        val supp = T(s, d, "supplier")
          .join(broadcast(T(s, d, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation")
        T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part").filter(col("p_type") === "PROMO")
            .select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .join(T(s, d, "orders")
            .filter(col("o_orderdate") >= "1996-01-01" &&
              col("o_orderdate") < "1998-01-01")
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_7", rev).otherwise(lit(0)))
              .cast("double").as("nation_vol"),
            sum(rev).cast("double").as("total_vol"),
            count(lit(1)).as("n_lines"))
          .select(col("o_year"), col("nation_vol"), col("total_vol"), col("n_lines"),
            (floor(col("nation_vol") * lit(1000000.0) / col("total_vol")) / 10000)
              .as("mkt_share_pct"))
          .orderBy("o_year")
      },
      Some(s"""WITH f AS (
             |  SELECT year(o_orderdate) AS o_year,
             |         n2.n_name AS supp_nation,
             |         $revSql AS vol
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n1.n_regionkey
             |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
             |  WHERE r_name = 'EUROPE'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1998-01-01'
             |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO'))
             |SELECT o_year,
             |       CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol ELSE 0 END)
             |            AS DOUBLE) AS nation_vol,
             |       CAST(sum(vol) AS DOUBLE) AS total_vol,
             |       count(*) AS n_lines,
             |       floor(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol ELSE 0 END)
             |                  AS DOUBLE) * 1000000.0 /
             |             CAST(sum(vol) AS DOUBLE)) / 10000 AS mkt_share_pct
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q9 shape (product type profit): profit per (supplier nation,
    // order year) over a name-pattern part filter. No partsupp here, so
    // cost = retailprice x quantity — same arithmetic shape (fact measure
    // minus a dimension-priced quantity), all in exact decimals. The LIKE
    // filter prunes part to ~1/8 before broadcasting; supplier+nation
    // broadcast; the only big shuffle is fact-orders on orderkey.
    QueryDef("rel_join_q9",
      (s, d) => {
        val redParts = T(s, d, "part").filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice")
        val supp = T(s, d, "supplier")
          .join(broadcast(T(s, d, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "nation")
        T(s, d, "lineitem")
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
          .join(T(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(
            sum(rev - col("p_retailprice").cast("decimal(18,2)") *
              col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_profit"),
            count(lit(1)).as("n_lines"))
          .orderBy("nation", "o_year")
      },
      Some(s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
             |       CAST(sum($revSql -
             |                CAST(p_retailprice AS DECIMAL(18,2)) *
             |                CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit,
             |       count(*) AS n_lines
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON n_nationkey = s_nationkey
             |WHERE p_name LIKE '%red%'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // TPC-H Q11 shape (important stock): per-key value vs a FRACTION of the
    // grand total — the scalar-subquery-in-HAVING plan. The total is a
    // second aggregate over the per-part frame (tiny), broadcast as a 1-row
    // cross join. The canonical fixed fraction (0.0001/SF) empties out on
    // uniform synthetic volume as SF grows, so the fraction here is 1/n —
    // parts whose value exceeds the MEAN — which stays ~half the domain at
    // every scale; the test multiplies through to exact decimals
    // (value x n > total) so no engine divides. Supplier nation filter
    // semi-joins the fact FIRST — at 100 TB the per-part agg sees 1/25th.
    QueryDef("rel_join_q11",
      (s, d) => {
        val nsupp = T(s, d, "supplier")
          .join(broadcast(T(s, d, "nation").filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select("s_suppkey")
        val vals = T(s, d, "lineitem")
          .join(broadcast(nsupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy("l_partkey")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(18,2)")).cast("decimal(20,4)").as("pval"))
        val tot = vals.agg(sum(col("pval")).cast("decimal(28,4)").as("total_value"),
          count(lit(1)).as("n_parts"))
        vals.crossJoin(broadcast(tot))
          .filter(col("pval") * col("n_parts").cast("decimal(10,0)") > col("total_value"))
          .select(col("l_partkey"), col("pval").cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("l_partkey"))
      },
      Some("""WITH vals AS (
             |  SELECT l_partkey,
             |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |                  CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(20,4)) AS pval
             |  FROM lineitem
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier JOIN nation
             |                      ON n_nationkey = s_nationkey
             |                      WHERE n_name = 'NATION_3')
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(pval) AS DECIMAL(28,4)) AS total_value,
             |               count(*) AS n_parts FROM vals)
             |SELECT l_partkey, CAST(pval AS DOUBLE) AS part_value
             |FROM vals CROSS JOIN tot
             |WHERE pval * CAST(n_parts AS DECIMAL(10,0)) > total_value
             |ORDER BY part_value DESC, l_partkey""".stripMargin)),

    // TPC-H Q12 shape (shipping priority classes): fact-orders join with a
    // both-sides date predicate, then two conditional counts per class. No
    // ship-mode column, so l_linestatus is the class axis and "late" is
    // shipped >60 days after ordering. The shipdate year-range pushes into
    // the fact scan; the mixed-side lateness predicate runs post-join.
    QueryDef("rel_join_q12",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
        .join(T(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate").cast("date") >
          date_add(col("o_orderdate").cast("date"), 60))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q15 shape (top supplier): aggregate-equality against the MAX of
    // the same aggregate frame — the revenue "view" computes once, its max
    // broadcasts as one row, and every supplier tied at the max survives.
    // Revenue stays DECIMAL through the equality (sum order can't perturb
    // exact decimals), cast to double only on output.
    QueryDef("rel_join_q15",
      (s, d) => {
        val srev = T(s, d, "lineitem")
          .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
          .groupBy("l_suppkey").agg(sum(rev).as("total_rev"))
        val mx = srev.agg(max(col("total_rev")).as("max_rev"))
        srev.join(broadcast(mx), col("total_rev") === col("max_rev"))
          .join(broadcast(T(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH srev AS (
             |  SELECT l_suppkey, sum($revSql) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
             |FROM srev JOIN supplier ON s_suppkey = l_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM srev)
             |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q16 shape (supplier diversity per part class): COUNT DISTINCT
    // over a dimension rollup with a NOT-IN supplier exclusion (anti join
    // against the sub-zero-balance list — the schema's stand-in for the
    // complaints predicate). The (partkey, suppkey) pairs come from the
    // fact; part and the exclusion list both broadcast, so the only
    // shuffle is the distinct-agg on the class keys.
    QueryDef("rel_join_q16",
      (s, d) => {
        val badSupp = T(s, d, "supplier").filter(col("s_acctbal") < 0)
          .select("s_suppkey")
        val pf = T(s, d, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_size").isin(1, 10, 20, 30, 40, 50))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        T(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
          .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |       count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#5'
             |  AND p_size IN (1, 10, 20, 30, 40, 50)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q20 shape (part promotion candidates): nested IN subqueries —
    // suppliers who are the TOP shipper (by summed quantity, ties kept) of
    // some red part, restricted to a region. A fixed share-of-part
    // threshold (the availqty>half analogue) empties out as SF grows —
    // uniform synthetic volume concentrates every share toward the mean —
    // so the dominance predicate is the scale-stable aggregate-equality
    // (sp_qty = per-part max, BIGINT-exact). The red partkeys semi-filter
    // the fact first; both rollups reuse the same l_partkey shuffle key.
    QueryDef("rel_join_q20",
      (s, d) => {
        val redKeys = T(s, d, "part").filter(col("p_name").like("red%"))
          .select("p_partkey")
        val li = T(s, d, "lineitem")
          .join(broadcast(redKeys), col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("bigint").as("qty"))
        val byPartSupp = li.groupBy("l_partkey", "l_suppkey")
          .agg(sum("qty").as("sp_qty"))
        val byPart = byPartSupp.groupBy(col("l_partkey").as("pk"))
          .agg(max("sp_qty").as("max_qty"))
        val dominant = byPartSupp
          .join(byPart, col("l_partkey") === col("pk") && col("sp_qty") === col("max_qty"))
          .select("l_suppkey").distinct()
        val eurKeys = T(s, d, "nation")
          .join(broadcast(T(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        T(s, d, "supplier")
          .join(broadcast(eurKeys), col("s_nationkey") === col("n_nationkey"),
            "left_semi")
          .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
             |  FROM lineitem
             |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')),
             |sp AS (SELECT l_partkey, l_suppkey, sum(qty) AS sp_qty FROM li GROUP BY 1, 2),
             |p AS (SELECT l_partkey, max(sp_qty) AS max_qty FROM sp GROUP BY 1),
             |dom AS (SELECT DISTINCT l_suppkey FROM sp JOIN p USING (l_partkey)
             |        WHERE sp_qty = max_qty)
             |SELECT s_suppkey, s_name
             |FROM supplier
             |WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
             |  AND s_nationkey IN (SELECT n_nationkey FROM nation
             |                      JOIN region ON r_regionkey = n_regionkey
             |                      WHERE r_name = 'EUROPE')
             |ORDER BY s_suppkey""".stripMargin)),

    // Z-order layout audit: the write-side clustering lever for
    // two-dimensional min/max file skipping at 100 TB. Interleaving 8 bits
    // of (customer bucket, order-day decade) and chunking the sort order
    // into fixed-size "files" bounds BOTH dimensions per chunk, where a
    // linear (single-key) sort bounds only its own key — the per-chunk
    // extent sums below quantify the difference, i.e. how much a
    // min/max-pruned scan could skip under a predicate on either dim. The
    // chunk ("file") assignment is floor(global_rank / 64) — computed via
    // DistributedRank.globalRowNumber (range shuffle + local ranks), the
    // SAME shape a production repartitionByRange(zval) +
    // sortWithinPartitions write uses, so the benched audit carries no
    // unpartitioned fact-sized window while still matching the oracle's
    // global row_number exactly.
    QueryDef("rel_zorder",
      (s, d) => {
        // y clamped on BOTH ends: a pre-epoch order date would otherwise go
        // negative and its two's-complement low bits would silently corrupt
        // the interleave (test data date ranges have drifted across rounds)
        val base = T(s, d, "orders").select(
          col("o_orderkey"),
          (col("o_custkey") % 256).cast("int").as("x"),
          greatest(lit(0), least(lit(255),
            floor(datediff(col("o_orderdate").cast("date"),
              lit("1995-01-01").cast("date")) / 10))).cast("int").as("y"))
        val zExpr = (0 until 8).map(i =>
          s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
            s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})").mkString(" + ")
        val withZ = base.withColumn("zval", expr(zExpr))
        def extents(df: DataFrame, ord: Seq[Column], layout: String) = {
          DistributedRank.globalRowNumber(df, ord, "rn")
            .withColumn("chunk", floor((col("rn") - 1) / 64))
            .groupBy("chunk")
            .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
            .agg(count(lit(1)).as("n_chunks"),
              sum("xr").cast("bigint").as("sum_x_range"),
              sum("yr").cast("bigint").as("sum_y_range"))
            .select(lit(layout).as("layout"), col("n_chunks"),
              col("sum_x_range"), col("sum_y_range"))
        }
        extents(withZ, Seq(col("x"), col("o_orderkey")), "linear")
          .unionAll(extents(withZ, Seq(col("zval"), col("o_orderkey")), "zorder"))
          .orderBy("layout")
      },
      Some {
        val zSql = (0 until 8).map(i =>
          s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ")
        s"""WITH base AS (
           |  SELECT o_orderkey,
           |         CAST(o_custkey % 256 AS INT) AS x,
           |         CAST(greatest(0, least(255, floor((CAST(o_orderdate AS DATE)
           |                                - DATE '1995-01-01') / 10))) AS INT) AS y
           |  FROM orders),
           |z AS (SELECT *, $zSql AS zval FROM base),
           |lin AS (SELECT x, y,
           |          CAST(floor((row_number() OVER (ORDER BY x, o_orderkey) - 1) / 64) AS BIGINT) AS chunk
           |        FROM z),
           |zo AS (SELECT x, y,
           |          CAST(floor((row_number() OVER (ORDER BY zval, o_orderkey) - 1) / 64) AS BIGINT) AS chunk
           |       FROM z),
           |linc AS (SELECT chunk, max(x) - min(x) AS xr, max(y) - min(y) AS yr
           |         FROM lin GROUP BY chunk),
           |zoc AS (SELECT chunk, max(x) - min(x) AS xr, max(y) - min(y) AS yr
           |        FROM zo GROUP BY chunk)
           |SELECT 'linear' AS layout, count(*) AS n_chunks,
           |       CAST(sum(xr) AS BIGINT) AS sum_x_range,
           |       CAST(sum(yr) AS BIGINT) AS sum_y_range FROM linc
           |UNION ALL
           |SELECT 'zorder' AS layout, count(*) AS n_chunks,
           |       CAST(sum(xr) AS BIGINT) AS sum_x_range,
           |       CAST(sum(yr) AS BIGINT) AS sum_y_range FROM zoc
           |ORDER BY layout""".stripMargin
      }),

    // Cross-engine table checksum — the migration-validation primitive: an
    // ORDER-INDEPENDENT fingerprint of a table's content that two engines
    // can compute independently and compare, without sorting, collecting,
    // or moving the data (the check a user runs after porting a 100 TB
    // table from the reference engine to this library). Per row, a
    // polynomial hash folds the business columns in fixed order with every
    // step reduced mod 2^31-1 (terms < 2^31, products < 2^36 — exact in
    // signed 64 on any engine, wrap-free under ANSI); per group, SUM
    // commutes so the checksum is partition- and order-independent, and
    // Spark computes it as a map-side partial sum with one tiny shuffle.
    // Money/rate columns enter as exact cents/percent integers
    // (round(x*100)), never as raw doubles.
    QueryDef("rel_table_checksum",
      (s, d) => lineitemChecksum(T(s, d, "lineitem")),
      Some {
        val terms = Seq(
          "(l_orderkey % 2147483647)",
          "CAST(l_linenumber AS BIGINT)",
          "(CAST(round(l_extendedprice * 100) AS BIGINT) % 2147483647)",
          "CAST(l_quantity AS BIGINT)",
          "CAST(ascii(l_returnflag) AS BIGINT)",
          "CAST(round(l_discount * 100) AS BIGINT)")
        val rowh = terms.reduceLeft((h, t) => s"(($h * 31 + $t) % 2147483647)")
        s"""SELECT l_returnflag, count(*) AS n_rows,
           |       CAST(sum($rowh) AS BIGINT) AS checksum
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Exact join-cardinality + skew estimator — the pre-flight a planner
    // (or an engineer sizing a 100 TB join) runs BEFORE the join: per-key
    // counts on both sides are map-side partial aggregates over tiny
    // distinct-key outputs, their key-joined product-sum is the exact join
    // cardinality, and the max per-key contribution is the salting
    // decision input (skew_bp = that key's share in basis points, exact
    // integer division). The full events⋈orders count is also emitted so
    // the oracle pins est == actual — at scale you would run ONLY the
    // estimate (cost O(distinct keys), not O(join output)).
    QueryDef("rel_join_size_est",
      (s, d) => {
        val ec = T(s, d, "events")
          .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("ce"))
        val oc = T(s, d, "orders")
          .groupBy(col("o_custkey").as("k2")).agg(count(lit(1)).as("co"))
        val j = ec.join(oc, col("k") === col("k2"))
          .select(col("k"), (col("ce") * col("co")).as("contrib"))
        // top key folds into the SAME aggregate (no second pass over the
        // profiles, and an empty key intersection still yields the one
        // summary row on both engines). Tie-break min-k via the single
        // scalar ordering contrib*2^32 - k, computed in 128-bit-exact
        // arithmetic on BOTH engines (DECIMAL(38,0) here, HUGEINT in the
        // oracle): in signed 64 the product wraps silently once contrib
        // >= 2^31 — Spark would pick a wrong top_key exactly when skew is
        // extreme, while DuckDB raises. The widened ordering never
        // overflows for any representable contrib (< 2^63 * 2^32 < 10^38).
        val agg = j.agg(
          sum("contrib").cast("long").as("est_rows"),
          count(lit(1)).as("n_keys_both"),
          max("contrib").cast("long").as("max_key_contrib"),
          max_by(col("k"),
            col("contrib").cast("decimal(38,0)") * lit(4294967296L) - col("k"))
            .as("top_key"))
        val act = T(s, d, "events")
          .join(T(s, d, "orders"), col("user_id") === col("o_custkey"))
          .agg(count(lit(1)).as("actual_rows"))
        agg.crossJoin(act)
          .select(col("est_rows"), col("n_keys_both"), col("max_key_contrib"),
            col("top_key"), col("actual_rows"),
            expr("(10000 * max_key_contrib) div est_rows").as("skew_bp"))
      },
      Some("""WITH ec AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
             |oc AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
             |j AS (SELECT ec.k, ec.c * oc.c AS contrib FROM ec JOIN oc USING (k)),
             |agg AS (SELECT CAST(sum(contrib) AS BIGINT) AS est_rows,
             |               count(*) AS n_keys_both,
             |               CAST(max(contrib) AS BIGINT) AS max_key_contrib,
             |               arg_max(k, contrib::HUGEINT * 4294967296 - k) AS top_key
             |        FROM j),
             |act AS (SELECT count(*) AS actual_rows
             |        FROM events e JOIN orders o ON e.user_id = o.o_custkey)
             |SELECT est_rows, n_keys_both, max_key_contrib, top_key, actual_rows,
             |       (10000 * max_key_contrib) // est_rows AS skew_bp
             |FROM agg CROSS JOIN act""".stripMargin))
  )
}
