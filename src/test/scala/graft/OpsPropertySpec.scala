package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the round-8 serving/spectral operators against
  * independent in-Scala references (the BpePropertySpec pattern — the
  * DuckDB oracles for these queries are builder-generated unrolled CTEs,
  * so an independent reference guards against shared blind spots):
  *  - Similarity.mmrRerank == a plain-Scala greedy MMR on identically
  *    quantized integer scores, across lambda settings and random vector
  *    sets (lambda=10 must equal pure top-k relevance order);
  *  - the power-iteration query == a dense in-Scala matrix iteration on
  *    the SAME integer Gram.
  */
class OpsPropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  /** Spark's round(col) semantics on doubles: BigDecimal.valueOf (i.e.
    * the canonical decimal string, not the exact binary expansion), then
    * HALF_UP — matching this exactly is the point of the reference.
    */
  private def roundE6(x: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(x * 1e6))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Left-fold dot product — the same association Spark's
    * aggregate(zip_with(...)) evaluates.
    */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def cosE6(a: Array[Double], b: Array[Double]): Long =
    roundE6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  private def refMmr(vecs: Seq[(Long, Array[Float])], queryId: Long,
                     pool: Int, k: Int, lam: Int): Seq[(Int, Long, Long)] = {
    val d = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val qe = d(queryId)
    val rel = d.keys.filter(_ != queryId).map(id => id -> cosE6(d(id), qe)).toMap
    val cand = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(pool).map(_._1)
    val sim = (for (a <- cand; b <- cand if a != b)
      yield (a, b) -> cosE6(d(a), d(b))).toMap
    var selected = Vector.empty[(Int, Long, Long)]
    for (r <- 1 to k) {
      val chosen = selected.map(_._2).toSet
      val scored = cand.filterNot(chosen).map { c =>
        val maxSim =
          if (chosen.isEmpty) 0L
          else chosen.map(sel => sim((c, sel))).max
        c -> (lam.toLong * rel(c) - (10L - lam) * maxSim)
      }
      val (id, sc) = scored.minBy { case (c, s) => (-s, c) }
      selected :+= ((r, id, sc))
    }
    selected
  }

  private def randomVecs(seed: Int, n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextFloat() * 2f - 1f)))
  }

  test("mmrRerank equals the in-Scala greedy reference across lambdas") {
    for (seed <- Seq(11, 12, 13); lam <- Seq(0, 3, 7, 10)) {
      val vecs = randomVecs(seed, n = 25, dim = 6)
      val df = vecs.toDF("vec_id", "embedding")
      val got = Similarity.mmrRerank(df, queryId = 0L, pool = 10, k = 4,
          lambdaTenths = lam)
        .select("round", "vec_id", "score10_e6")
        .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
      val want = refMmr(vecs, queryId = 0L, pool = 10, k = 4, lam = lam)
      assert(got == want, s"seed=$seed lambda=$lam\n got=$got\nwant=$want")
    }
  }

  test("mmrRerank at lambda=10 is pure relevance top-k") {
    val vecs = randomVecs(21, n = 30, dim = 5)
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df, queryId = 0L, pool = 12, k = 5,
        lambdaTenths = 10)
      .select("vec_id").as[Long].collect().toSeq
    val d = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val topk = d.keys.filter(_ != 0L)
      .map(id => id -> cosE6(d(id), d(0L))).toSeq
      .sortBy { case (id, r) => (-r, id) }.take(5).map(_._1)
    assert(got == topk)
  }

  /** In-Scala greedy farthest-point reference for kCenterCoreset: same e6
    * quantization (dist = 1e6 − cos·1e6, Spark round semantics), same
    * (mind, −id) tie-break to the smaller vec_id.
    */
  private def refKCenter(vecs: Seq[(Long, Array[Float])], k: Int,
                         seedId: Long): Seq[(Int, Long, Long)] = {
    val d = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def dist(a: Long, b: Long): Long = 1000000L - cosE6(d(a), d(b))
    var mind = d.keys.filter(_ != seedId).map(id => id -> dist(id, seedId)).toMap
    var out = Vector((1, seedId, 0L))
    for (r <- 2 to k) {
      val (pid, radius) = mind.maxBy { case (id, m) => (m, -id) }
      out :+= ((r, pid, radius))
      mind = (mind - pid).map { case (id, m) => id -> math.min(m, dist(id, pid)) }
    }
    out
  }

  test("kCenterCoreset equals the in-Scala greedy farthest-point reference") {
    for (seed <- Seq(31, 32, 33)) {
      val vecs = randomVecs(seed, n = 25, dim = 6)
      val df = vecs.toDF("vec_id", "embedding")
      val got = Similarity.kCenterCoreset(df, k = 6, seedId = 0L)
        .select("round", "vec_id", "radius_e6")
        .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
      val want = refKCenter(vecs, k = 6, seedId = 0L)
      assert(got == want, s"seed=$seed\n got=$got\nwant=$want")
      // the k-center objective is monotone: each added center can only
      // shrink (never grow) the farthest remaining distance
      val radii = got.drop(1).map(_._3)
      assert(radii == radii.sortBy(-_), s"coverage radius not non-increasing: $radii")
    }
  }

  test("power-iteration query equals a dense in-Scala iteration on the same integer Gram") {
    val dim = 64
    val gRows = Similarity
      .gramUpperFrame(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), dim)
      .as[(Long, Long, Long)].collect()
    val m = Array.ofDim[Double](dim, dim)
    gRows.foreach { case (i, j, g) =>
      m(i.toInt)(j.toInt) = g.toDouble
      m(j.toInt)(i.toInt) = g.toDouble
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to 10) {
      val u = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val mx = u.map(math.abs).max
      v = u.map(_ / mx)
    }
    val got = SparkEntry.queries("sim_power_iteration")(spark, "/root/testdata/sf0.001")
      .as[(Long, Double)].collect().toMap
    (0 until dim).foreach { j =>
      assert(math.abs(got(j.toLong) - v(j)) < 1e-5, s"j=$j ${got(j.toLong)} vs ${v(j)}")
    }
  }

  test("snapshot diff classifications replay the mutation hash exactly") {
    // independent in-Scala reference: read the same sf0.01 customer rows
    // (sf0.001's ~150 keys draw zero h%97 removals — a data property, not
    // an operator one), apply the documented hash mutation, and classify —
    // the registered QueryDef's per-segment rollup must match
    // class-for-class
    val rows = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .selectExpr("CAST(c_custkey AS BIGINT) AS k", "c_mktsegment AS seg",
        "c_acctbal AS bal")
      .as[(Long, String, Double)].collect()
    def h(k: Long): Long = java.lang.Math.floorMod(
      (k & 2147483647L) * 2654435761L + 777L, 1000000007L)
    val want = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    rows.foreach { case (k, seg, _) =>
      val cls =
        if (h(k) % 97 == 0) "removed"
        else if (h(k) % 13 == 3) "changed"
        else "same"
      want((seg, cls)) += 1
      if (h(k) % 101 == 5) want((seg, "added")) += 1
    }
    assert(want.values.sum > rows.length, "mutation produced no added rows")
    assert(want.exists(_._1._2 == "removed"), "mutation produced no removals")
    assert(want.exists(_._1._2 == "changed"), "mutation produced no changes")
    val got = SparkEntry.queries("rel_snapshot_diff")(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long, Long, Long)].collect()
    got.foreach { case (seg, add, rem, chg, same) =>
      assert(add == want((seg, "added")), s"$seg added")
      assert(rem == want((seg, "removed")), s"$seg removed")
      assert(chg == want((seg, "changed")), s"$seg changed")
      assert(same == want((seg, "same")), s"$seg same")
    }
  }

  test("hampel flags replay an independent rolling median/MAD reference") {
    // in-Scala reference on the real sf0.001 events: per type, sort by
    // (ts, event_id), window +-3 clipped at edges, median and MAD on the
    // doubled-cents lattice, flag iff 20000*dev > 44478*mad4 — the
    // registered QueryDef must flag exactly the same event ids
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .selectExpr("event_id", "event_type", "CAST(ts AS STRING) AS tss",
        "CAST(round(value * 100) AS BIGINT) * 2 AS x2")
      .as[(Long, String, String, Long)].collect()
    def med(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val want = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val ord = rows.sortBy(r => (r._3, r._1))
      ord.indices.flatMap { i =>
        val win = ord.slice(math.max(0, i - 3), math.min(ord.length, i + 4))
          .map(_._4)
        val m2 = med(win)
        val mad4 = med(win.map(x => 2 * math.abs(x - m2)))
        val dev2 = math.abs(ord(i)._4 - m2)
        if (20000L * dev2 > 44478L * mad4) Some(ord(i)._1) else None
      }
    }.toSet
    val got = SparkEntry.queries("ts_hampel")(spark, "/root/testdata/sf0.001")
      .select("event_id").as[Long].collect().toSet
    assert(got == want,
      s"flag sets differ: extra=${got -- want} missing=${want -- got}")
    assert(want.nonEmpty, "reference flagged nothing — degenerate input")
  }

  test("AQP estimate lands inside its own CLT half-width on every group") {
    // the estimator's visible guarantee (documented in the QueryDef):
    // realized error <= the reported 95% relative half-width, per group
    val rows = SparkEntry.queries("rel_aqp_sum")(spark, "/root/testdata/sf0.01")
      .select("l_returnflag", "err_ppm", "rel_ci_ppm")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.size == 3, rows)
    rows.foreach { case (g, err, ci) =>
      assert(err <= ci, s"group $g: realized error $err ppm > CI $ci ppm")
      assert(ci < 100000L, s"group $g: CI $ci ppm implausibly wide for a 5% sample")
    }
  }
}
