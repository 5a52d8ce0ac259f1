package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-6 pipeline operators against independent
  * in-Scala references: decontamination (hashed-shingle join == string-set
  * intersection), triangle counting (self-join == brute-force enumeration),
  * and EWMA (the closed-form window identity == the textbook recursive
  * definition).
  */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  // --- decontaminate -------------------------------------------------------

  /** Random corpora over a tiny vocabulary so shingle collisions are COMMON
    * (the interesting regime for an overlap detector).
    */
  private def corpusGen(nDocs: Int): Gen[List[(Long, String)]] =
    Gen.listOfN(nDocs,
      Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def sampleCorpus(seed: Long, nDocs: Int = 14): List[(Long, String)] =
    corpusGen(nDocs).apply(Gen.Parameters.default, rng.Seed(seed)).get

  private def shingleSet(text: String, n: Int): Set[String] =
    text.split("\\s+").filter(_.nonEmpty).sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSet

  test("decontaminate == in-Scala shingle-set intersection on random corpora") {
    for (seed <- 1L to 8L; n <- Seq(3, 5)) {
      val corpus = sampleCorpus(seed)
      val isTest: Long => Boolean = _ % 3 == 0
      val expected = (for {
        (trainId, trainText) <- corpus if !isTest(trainId)
        trainSh = shingleSet(trainText, n)
        hits = corpus.collect {
          case (testId, testText) if isTest(testId) =>
            (testId, (trainSh & shingleSet(testText, n)).size)
        }.filter(_._2 > 0)
        if hits.nonEmpty
      } yield trainId -> ((hits.size.toLong, hits.map(_._2.toLong).sum))).toMap
      val got = Dedup.decontaminate(corpus.toDF("doc_id", "text"),
          isTest = col("doc_id") % 3 === 0, n = n)
        .as[(Long, Long, Long)].collect()
        .map { case (id, nt, ns) => id -> ((nt, ns)) }.toMap
      assert(got == expected, s"seed=$seed n=$n")
    }
  }

  // --- triangleStats -------------------------------------------------------

  private def graphGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)

  test("triangleStats == brute-force enumeration on random graphs") {
    for (seed <- 1L to 8L) {
      val edges = graphGen.apply(Gen.Parameters.default, rng.Seed(seed)).get
      val es = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expTri = (for {
        x <- nodes; y <- nodes if y > x && es((x, y))
        z <- nodes if z > y && es((y, z)) && es((x, z))
      } yield 1).size.toLong
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.size.toLong)
      val expWedges = deg.map(d => d * (d - 1) / 2).sum
      val (tri, wed, cc) = Graph.triangleStats(edges.toDF("a_id", "b_id"))
        .as[(Long, Long, Double)].head()
      assert(tri == expTri && wed == expWedges, s"seed=$seed got=($tri,$wed) exp=($expTri,$expWedges)")
      val expCc = if (expWedges == 0) 0.0 else 3.0 * expTri / expWedges
      assert(math.abs(cc - BigDecimal(expCc).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"seed=$seed")
    }
  }

  test("closenessStats == Floyd-Warshall on random graphs") {
    for (seed <- 21L to 28L) {
      val edges = graphGen.apply(Gen.Parameters.default, rng.Seed(seed)).get
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val idx = nodes.zipWithIndex.toMap
      val n = nodes.size
      val INF = Int.MaxValue / 4
      val d = Array.fill(n, n)(INF)
      nodes.indices.foreach(i => d(i)(i) = 0)
      edges.foreach { case (a, b) => d(idx(a))(idx(b)) = 1; d(idx(b))(idx(a)) = 1 }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
      val expected = nodes.zipWithIndex.map { case (id, i) =>
        // graphGen graphs are tiny: every finite distance is << the 10-hop
        // cap, so Floyd-Warshall reachability == the bounded-hop result
        val ds = nodes.indices.filter(j => j != i && d(i)(j) < INF).map(j => d(i)(j).toLong)
        (id, ds.size.toLong, ds.sum,
          math.floor(10000.0 * ds.size / ds.sum).toLong)
      }.filter(_._2 > 0)
      val got = Graph.closenessStats(edges.toDF("a_id", "b_id"))
        .orderBy("id").as[(Long, Long, Long, Long)].collect().toList
      assert(got == expected, s"seed=$seed got=$got exp=$expected")
    }
  }

  test("commonNeighbors == brute-force wedge endpoints on random graphs") {
    for (seed <- 11L to 18L) {
      val edges = graphGen.apply(Gen.Parameters.default, rng.Seed(seed)).get
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val es = edges.toSet
      val nodes = adj.keys.toSeq.sorted
      val expected = (for {
        a <- nodes; b <- nodes if b > a && !es((a, b))
        common = (adj(a) & adj(b)).size if common > 0
      } yield {
        val union = (adj(a) | adj(b)).size
        (a, b, common.toLong, math.floor(common * 10000.0 / union) / 10000)
      }).toList
      val got = Graph.commonNeighbors(edges.toDF("a_id", "b_id"))
        .as[(Long, Long, Long, Double)].collect().toList
      assert(got == expected, s"seed=$seed got=$got exp=$expected")
    }
  }

  test("kCore == brute-force fixed-round peel on random graphs") {
    for (seed <- 21L to 28L; k <- Seq(2, 3)) {
      val edges = graphGen.apply(Gen.Parameters.default, rng.Seed(seed)).get
      var es = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
      for (_ <- 1 to 10) {
        val deg = es.groupBy(_._1).map { case (n, l) => n -> l.size }
        es = es.filter { case (a, b) => deg(a) >= k && deg.getOrElse(b, 0) >= k }
      }
      val expected = es.groupBy(_._1).map { case (n, l) => n -> l.size.toLong }
      val got = Graph.kCore(edges.toDF("a_id", "b_id"), k = k, rounds = 10)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed=$seed k=$k got=$got exp=$expected")
    }
  }

  test("labelPropagation == brute-force synchronous rounds on random graphs") {
    for (seed <- 31L to 38L) {
      val edges = graphGen.apply(Gen.Parameters.default, rng.Seed(seed)).get
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
      var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to 5) {
        lbl = adj.map { case (n, nbs) =>
          val counts = nbs.map(lbl).groupBy(identity).map { case (l, o) => l -> o.size }
          n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      val got = Graph.labelPropagation(edges.toDF("a_id", "b_id"), rounds = 5)
        .as[(Long, Long)].collect().toMap
      assert(got == lbl, s"seed=$seed got=$got exp=$lbl")
    }
  }

  // --- chunk / repetition --------------------------------------------------

  private def docGen(nDocs: Int): Gen[List[(Long, String)]] =
    Gen.listOfN(nDocs, Gen.choose(1, 200).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dddd")).map(_.mkString(" "))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("chunk: slices reconstruct the token stream exactly on random docs") {
    for (seed <- 1L to 4L; (size, stride) <- Seq((64, 48), (16, 16), (10, 3))) {
      val docs = docGen(8).apply(Gen.Parameters.default, rng.Seed(seed)).get
      val chunks = operators.TextAnalysis.chunk(docs.toDF("doc_id", "text"), size, stride)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val got = chunks(id)
        // chunk c is exactly tokens [c*stride, c*stride+size)
        got.foreach { case (_, c, n, ct) =>
          val exp = toks.slice((c * stride).toInt, (c * stride).toInt + size)
          assert(ct.split(" ").toSeq == exp && n == exp.length, s"doc $id chunk $c")
        }
        // the last chunk reaches the end; no chunk starts at/after the end
        assert(got.last._2 * stride + got.last._3 == toks.length, s"doc $id tail")
        assert(got.forall(_._2 * stride < toks.length), s"doc $id overhang")
        // consecutive chunks leave no gap (stride <= size by require)
        assert(got.map(_._2).toSeq == (0L until got.length.toLong).toSeq, s"doc $id ids")
      }
    }
  }

  test("repetition == brute-force bigram accounting on random docs") {
    for (seed <- 5L to 8L) {
      val docs = docGen(8).apply(Gen.Parameters.default, rng.Seed(seed)).get
      val got = operators.TextAnalysis.repetition(docs.toDF("doc_id", "text"))
        .as[(Long, Long, String, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.length >= 2) {
          val bigrams = toks.sliding(2).map(p => (p(0), p(1))).toSeq
          val counts = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
          val top = counts.toSeq.minBy { case ((w1, w2), c) => (-c, w1, w2) }
          val tokChars = toks.map(_.length).sum.toLong
          val topChars = top._2 * (top._1._1.length + top._1._2.length)
          val dupChars = counts.collect { case ((w1, w2), c) if c > 1 =>
            c * (w1.length + w2.length) }.sum
          val (_, nBig, topBig, topCnt, topShare, dupShare) = got(id)
          assert(nBig == bigrams.length.toLong, s"doc $id n_bigrams")
          assert(topBig == s"${top._1._1} ${top._1._2}" && topCnt == top._2, s"doc $id top")
          assert(topShare == math.floor(topChars * 10000.0 / tokChars) / 10000, s"doc $id ts")
          assert(dupShare == math.floor(dupChars * 10000.0 / tokChars) / 10000, s"doc $id ds")
        } else assert(!got.contains(id), s"doc $id should have no bigrams")
      }
    }
  }

  // --- EWMA ----------------------------------------------------------------

  test("window closed form equals the recursive adjust-normalized EWMA") {
    // recursive adjust=true EWMA with alpha=1/2: num_k = x_k + (1-a)*num_{k-1},
    // den_k = 1 + (1-a)*den_{k-1}, ewma_k = num_k/den_k — must match the
    // 2^i-weighted cumulative-ratio identity the ts_ewma query computes.
    val xs = Seq(4.0, 9.0, 1.0, 16.0, 2.0, 7.5, 3.25)
    var (num, den) = (0.0, 0.0)
    val expected = xs.map { x =>
      num = x + 0.5 * num; den = 1.0 + 0.5 * den
      num / den
    }
    val n = xs.length
    val got = xs.indices.map { k =>
      val w = (0 to k).map(i => math.pow(2.0, (i + 1 - n).toDouble))
      (0 to k).map(i => xs(i) * w(i)).sum / w.sum
    }
    expected.zip(got).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-12, s"$e vs $g")
    }
  }

  // --- rel_join_size_est top-key ordering ---------------------------------

  test("DECIMAL(38,0) top-key ordering is exact at contrib >= 2^31 (no wrap)") {
    // rel_join_size_est orders max_by on contrib * 2^32 - k. In signed-64
    // arithmetic the product wraps silently once contrib >= 2^31 — exactly
    // the extreme-skew regime the estimator exists for — so the query
    // widens to DECIMAL(38,0) (RelationalQueries4.scala). This pins the
    // widened expression against a BigInt reference on ScalaCheck-generated
    // profiles that STRADDLE the wrap boundary, ties included.
    val contribGen = Gen.oneOf(
      Gen.choose(1L, (1L << 31) - 1),              // below the wrap
      Gen.choose(1L << 31, 1L << 40),              // wrapping regime
      Gen.const((1L << 31)))                       // exactly at it (+tie fodder)
    val rowsGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, (1L << 31) - 1), contribGen))
    for (seed <- 1L to 10L) {
      val rows0 = rowsGen.apply(Gen.Parameters.default, rng.Seed(seed)).get
      // force at least one >= 2^31 contrib and a deliberate contrib tie
      val rows = ((5L, 1L << 31) :: (3L, 1L << 31) :: rows0)
        .groupBy(_._1).map(_._2.head).toList // unique keys, as in the query
      val expected = rows.maxBy { case (k, c) =>
        BigInt(c) * BigInt(4294967296L) - BigInt(k) }._1
      val got = rows.toDF("k", "contrib")
        .agg(max_by(col("k"),
          col("contrib").cast("decimal(38,0)") * lit(4294967296L) - col("k"))
          .as("top_key"))
        .head().getLong(0)
      assert(got == expected, s"seed=$seed rows=$rows")
      // and the regression this guards: the narrow signed-64 ordering picks
      // a DIFFERENT (wrapped) winner on at least the all-large profiles
      val wrapped = rows.maxBy { case (k, c) => c * 4294967296L - k }._1
      if (wrapped != expected)
        info(s"seed=$seed: signed-64 ordering would have picked $wrapped over $expected")
    }
  }

  // --- association rules / seasonal decomposition (round-9) ---------------

  test("rel_assoc_rules == in-Scala basket enumeration on the gate corpus") {
    val d = "/root/testdata/sf0.001"
    val bt = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"),
        col("event_type"))
      .as[(Long, String, String)].collect()
      .map { case (u, day, t) => ((u, day), t) }.distinct
    val byBasket = bt.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nB = byBasket.size
    val itemCount = bt.groupBy(_._2).map { case (t, v) => t -> v.length }
    val pairCount = byBasket.values.toSeq.flatMap { s =>
      val l = s.toList.sorted
      for { i <- l.indices; j <- (i + 1) until l.size } yield (l(i), l(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val got = SparkEntry.queries("rel_assoc_rules")(spark, d).collect()
    assert(got.length == pairCount.size && got.nonEmpty, got.length)
    got.foreach { r =>
      val (a, b, nab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b, r)
      assert(nab == pairCount((a, b)), s"($a,$b)")
      assert(math.abs(r.getDouble(3) - nab.toDouble / nB) < 1e-4, s"support $r")
      assert(math.abs(r.getDouble(4) - nab.toDouble / itemCount(a)) < 1e-4, r)
      assert(math.abs(r.getDouble(5) - nab.toDouble / itemCount(b)) < 1e-4, r)
      assert(math.abs(r.getDouble(6) -
        nab.toDouble * nB / (itemCount(a).toDouble * itemCount(b))) < 1e-4, r)
    }
  }

  /** Shared daily (type, date-string, count) series off the gate corpus. */
  private def dailySeries(d: String): Map[String, Seq[Long]] =
    graft.Tables.t(spark, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d0"))
      .agg(count(lit(1)).as("x"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (t, rows) => t -> rows.sortBy(_._2).map(_._3).toSeq }

  test("ts_holt == in-Scala sequential fold on the gate corpus") {
    // The reference that exposed DuckDB 1.0's list_reduce mis-fold (the
    // oracle is a recursive CTE for that reason): a strict sequential
    // left fold in plain Scala doubles, operand order matching the query.
    val d = "/root/testdata/sf0.001"
    val expected = dailySeries(d).map { case (t, xs) =>
      var l = xs.head.toDouble; var b = 0.0
      xs.tail.foreach { xi =>
        val x = xi.toDouble
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l2 - l) + 0.5 * b
        l = l2
      }
      t -> (xs.length.toLong, l, b)
    }
    val got = SparkEntry.queries("ts_holt")(spark, d).collect()
    assert(got.length == expected.size && got.nonEmpty, got.length)
    got.foreach { r =>
      val (n, l, b) = expected(r.getString(0))
      assert(r.getLong(1) == n, r)
      assert(math.abs(r.getDouble(2) - l) < 1e-4, s"level $r vs $l")
      assert(math.abs(r.getDouble(3) - b) < 1e-4, s"trend $r vs $b")
      assert(math.abs(r.getDouble(4) - (l + b)) < 1e-4, s"forecast $r")
    }
  }

  test("ts_theil_sen and ts_mk_trend == in-Scala pair enumeration on the gate corpus") {
    val d = "/root/testdata/sf0.001"
    // dates are consecutive per type on this corpus is NOT assumed: recompute
    // with real date gaps
    val daily = graft.Tables.t(spark, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d0"))
      .agg(count(lit(1)).as("x"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (t, rows) => t -> rows.sortBy(_._2) }
    val ref = daily.map { case (t, rows) =>
      val pts = rows.map { case (_, ds, x) =>
        (java.time.LocalDate.parse(ds).toEpochDay, x) }
      val pairs = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(i), pts(j))
      val slopes = pairs.map { case ((da, xa), (db, xb)) =>
        (xb - xa) * 1.0 / (db - da) }.sorted
      val mkS = pairs.map { case ((_, xa), (_, xb)) => java.lang.Long.signum(xb - xa).toLong }.sum
      t -> (pairs.length.toLong, slopes((pairs.length + 1) / 2 - 1), mkS)
    }
    val ts = SparkEntry.queries("ts_theil_sen")(spark, d).collect()
    assert(ts.length == ref.size && ts.nonEmpty)
    ts.foreach { r =>
      val (np, med, _) = ref(r.getString(0))
      assert(r.getLong(1) == np, r)
      assert(math.abs(r.getDouble(2) - med) < 1e-6, s"median $r vs $med")
    }
    val mk = SparkEntry.queries("ts_mk_trend")(spark, d).collect()
    mk.foreach { r =>
      val (np, _, s) = ref(r.getString(0))
      assert(r.getLong(1) == np && r.getLong(2) == s, r)
      assert(r.getLong(3) == math.floor(s * 10000.0 / np).toLong, r)
    }
  }

  test("ts_decompose == in-Scala centered-sum detrending on the gate corpus") {
    val d = "/root/testdata/sf0.001"
    val daily = graft.Tables.t(spark, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("d0"))
      .agg(count(lit(1)).as("x"))
      .as[(String, String, Long)].collect()
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val xs = sorted.map(_._3)
      for (i <- 3 until sorted.length - 3) yield {
        val trend7 = (i - 3 to i + 3).map(xs).sum
        // Spark dayofweek: Sunday=1..Saturday=7; LocalDate ISO: Monday=1..Sunday=7
        val dow = java.time.LocalDate.parse(sorted(i)._2).getDayOfWeek.getValue % 7 + 1
        (t, dow.toLong, 7 * xs(i) - trend7)
      }
    }.groupBy(r => (r._1, r._2))
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._3).sum) }
    val got = SparkEntry.queries("ts_decompose")(spark, d).collect()
    assert(got.length == expected.size && got.nonEmpty, got.length)
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (nDays, sumD) = expected(k)
      assert(r.getLong(2) == nDays && r.getLong(3) == sumD, s"$k")
      assert(math.abs(r.getDouble(4) - sumD.toDouble / (7 * nDays)) < 1e-3, s"$k")
    }
  }
}
