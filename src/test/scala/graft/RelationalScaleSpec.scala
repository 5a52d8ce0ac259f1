package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** sf1-class scale smoke for the RELATIONAL core — the join/agg twin of
  * ScaleSmokeSpec's dedup/similarity check: TPC-H-shaped tables are
  * synthesized at bench scale (sf0.1-sized) and at 10× that (sf1-sized:
  * 12M lineitem / 1.5M orders), the flagship planner shapes run on both,
  * and growth must stay ~linear. What this catches that the sf0.1 bench
  * cannot: a join whose build side silently stops broadcasting, a
  * partial aggregation that degrades to full shuffle, a skew blow-up —
  * all look fine at ~1M rows and reveal themselves as super-linear
  * growth at 6M.
  *
  * Tables are generated HERE (never written to the read-only
  * /root/testdata), fully distributed (spark.range + hash-derived
  * columns, no driver loops), schema- and value-domain-compatible with
  * the driver tables (mktsegments include BUILDING, dates span
  * 1995-1999, p_name carries color words) so the inventory queries run
  * unmodified and return rows.
  */
class RelationalScaleSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  /** Generate one TPC-H-shaped warehouse at `k`× the sf0.1 cardinalities
    * into `dir`. All pseudo-randomness is hash(id, salt) — deterministic,
    * distributed, and the lineitem ship dates re-derive their order's
    * date from the shared hash so the o/l date correlation is realistic.
    */
  private def gen(dir: String, k: Int): Unit = {
    val nOrders = 150000L * k
    val nCust = 15000L * k
    val nSupp = 1000L * k
    val nPart = 20000L * k
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    w(spark.range(5).selectExpr("CAST(id AS INT) AS r_regionkey",
      "concat('region_', id) AS r_name"), "region")
    w(spark.range(25).selectExpr("CAST(id AS INT) AS n_nationkey",
      "concat('nation_', id) AS n_name",
      "CAST(pmod(id, 5) AS INT) AS n_regionkey"), "nation")
    w(spark.range(nCust).selectExpr(
      "id AS c_custkey", "concat('Customer#', id) AS c_name",
      "CAST(pmod(hash(id, 3), 25) AS INT) AS c_nationkey",
      "CAST(pmod(hash(id, 5), 1099999) / 100.0 - 999.99 AS DOUBLE) AS c_acctbal",
      "element_at(array('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'), " +
        "CAST(pmod(hash(id, 7), 5) AS INT) + 1) AS c_mktsegment"), "customer")
    w(spark.range(nSupp).selectExpr(
      "id AS s_suppkey", "concat('Supplier#', id) AS s_name",
      "CAST(pmod(hash(id, 3), 25) AS INT) AS s_nationkey",
      "CAST(pmod(hash(id, 5), 1099999) / 100.0 - 999.99 AS DOUBLE) AS s_acctbal"),
      "supplier")
    w(spark.range(nPart).selectExpr(
      "id AS p_partkey",
      "concat(element_at(array('red','green','blue','ivory','plum','navy','khaki'), " +
        "CAST(pmod(hash(id, 11), 7) AS INT) + 1), ' polished part ', id) AS p_name",
      "concat('Brand#', pmod(hash(id, 13), 5) + 1, pmod(hash(id, 17), 5) + 1) AS p_brand",
      "concat('STANDARD ', element_at(array('TIN','NICKEL','BRASS','STEEL','COPPER'), " +
        "CAST(pmod(hash(id, 19), 5) AS INT) + 1)) AS p_type",
      "CAST(pmod(hash(id, 23), 50) + 1 AS INT) AS p_size",
      "CAST(900 + pmod(hash(id, 29), 120000) / 100.0 AS DOUBLE) AS p_retailprice"),
      "part")
    w(spark.range(nOrders).selectExpr(
      "id AS o_orderkey",
      s"CAST(pmod(hash(id, 31), $nCust) AS BIGINT) AS o_custkey",
      "element_at(array('O','F','P'), CAST(pmod(hash(id, 37), 3) AS INT) + 1) AS o_orderstatus",
      "CAST(1000 + pmod(hash(id, 41), 40000000) / 100.0 AS DOUBLE) AS o_totalprice",
      "to_timestamp(date_add(DATE '1995-01-01', CAST(pmod(hash(id, 43), 1400) AS INT))) " +
        "AS o_orderdate",
      "element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), " +
        "CAST(pmod(hash(id, 47), 5) AS INT) + 1) AS o_orderpriority"), "orders")
    w(spark.range(nOrders * 8).selectExpr(
      "id div 8 AS l_orderkey",
      s"CAST(pmod(hash(id, 53), $nPart) AS BIGINT) AS l_partkey",
      s"CAST(pmod(hash(id, 59), $nSupp) AS BIGINT) AS l_suppkey",
      "CAST(pmod(id, 8) + 1 AS INT) AS l_linenumber",
      "CAST(pmod(hash(id, 61), 50) + 1 AS DOUBLE) AS l_quantity",
      "CAST(900 + pmod(hash(id, 67), 9000000) / 100.0 AS DOUBLE) AS l_extendedprice",
      "CAST(pmod(hash(id, 71), 11) / 100.0 AS DOUBLE) AS l_discount",
      "CAST(pmod(hash(id, 73), 9) / 100.0 AS DOUBLE) AS l_tax",
      "element_at(array('A','N','R'), CAST(pmod(hash(id, 79), 3) AS INT) + 1) AS l_returnflag",
      "element_at(array('O','F'), CAST(pmod(hash(id, 83), 2) AS INT) + 1) AS l_linestatus",
      "to_timestamp(date_add(DATE '1995-01-01', " +
        "CAST(pmod(hash(id div 8, 43), 1400) + 1 + pmod(hash(id, 89), 120) AS INT))) " +
        "AS l_shipdate"), "lineitem")
  }

  private def timeIt(name: String, dir: String): (Double, Long) = {
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    (secs, df.count())
  }

  test("relational core growth is ~linear from sf0.1-size to sf1-size", Slow) {
    val queries = Seq("rel_agg_q1", "rel_join_q3", "rel_join_q5",
      "rel_join_q18", "rel_topk")
    // codegen/JIT warmup on the real small fixture, off the clock
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    val base = java.nio.file.Files.createTempDirectory("relscale_1x").toString
    val big = java.nio.file.Files.createTempDirectory("relscale_10x").toString
    try {
      gen(base, 1)
      gen(big, 10)
      queries.foreach { q =>
        val (t1, r1) = timeIt(q, base)
        val (t10, r10) = timeIt(q, big)
        val growth = t10 / t1
        info(f"$q%-14s 1x=$t1%6.2fs rows=$r1%8d  10x=$t10%7.2fs rows=$r10%9d  growth=$growth%5.1fx")
        assert(r1 > 0, s"$q returned no rows at 1x — generator/value-domain drift")
        assert(r10 > 0, s"$q returned no rows at 10x")
        assert(growth < 25.0,
          s"$q grew ${growth}x for 10x data — super-linear (broadcast lost, " +
            "partial agg degraded, or skew): investigate the 10x plan")
      }
    } finally Seq(base, big).foreach { d =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
