package graft

import graft.operators.PrivacyQueries
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("piiRedact counts and strips exactly the planted identifiers") {
    // doc 0: %3==0 no primary email, %5==0 alt email, %4==0 ip, even phone.
    // doc 1: primary email only (%4==1 kills the ip, odd kills the phone).
    // doc 2: primary email, ip, phone.
    val docs = Seq((0L, "alpha beta"), (1L, "gamma"), (2L, "delta"))
      .toDF("doc_id", "text")
    val got = PrivacyQueries.piiRedact(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((0L, 1L, 1L, 1L), (1L, 1L, 0L, 0L), (2L, 1L, 1L, 1L)), got)
    // doc 0 deltas: "admin0@corp.example.org"(23)->"[EMAIL]"(7) = 16,
    // "10.0.0.1"(8)->"[IP]"(4) = 4, "555-0100"(8)->"[PHONE]"(7) = 1.
    assert(got(0)._5 == 21L, got)
  }

  test("piiRedact attributes an overlapping span to exactly one type") {
    // a@10.1.2.3.com is BOTH a syntactic email and contains an IPv4. The
    // email pass runs (and counts) first, so the span is email-attributed;
    // counting every type on the raw text would also tally the IP and the
    // counts would stop reconciling with n_chars_removed.
    // doc_id 1: %3!=0 plants user1@mail.example.com; %4==1 plants no ip;
    // odd plants no phone.
    val docs = Seq((1L, "x a@10.1.2.3.com y")).toDF("doc_id", "text")
    val got = PrivacyQueries.piiRedact(docs)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 2L, 0L, 0L,
      ("a@10.1.2.3.com".length - 7) + ("user1@mail.example.com".length - 7))),
      got)
  }

  test("kAnonymity flags every group smaller than k with its row count") {
    val rows = Seq(
      // AUTOMOBILE nation 1 band 0: 5 rows (safe at k=5)
      ("AUTOMOBILE", 1, 100.0), ("AUTOMOBILE", 1, 200.0), ("AUTOMOBILE", 1, 300.0),
      ("AUTOMOBILE", 1, 400.0), ("AUTOMOBILE", 1, 500.0),
      // AUTOMOBILE nation 2 band 0: 2 rows (at risk)
      ("AUTOMOBILE", 2, 100.0), ("AUTOMOBILE", 2, 110.0),
      // BUILDING nation 1 band 1: 1 row (at risk)
      ("BUILDING", 1, 2100.0))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
    val got = PrivacyQueries.kAnonymity(rows, k = 5)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("AUTOMOBILE", 2L, 2L, 1L, 2L),
      ("BUILDING", 1L, 1L, 1L, 1L)))
  }

  test("lDiversity: a large group with one sensitive value is still flagged") {
    val rows = Seq(
      // AUTOMOBILE nation 1: 5 rows but only ONE balance band — the case
      // k-anonymity passes (size 5 >= k) and l-diversity must flag
      ("AUTOMOBILE", 1, 100.0), ("AUTOMOBILE", 1, 200.0), ("AUTOMOBILE", 1, 300.0),
      ("AUTOMOBILE", 1, 400.0), ("AUTOMOBILE", 1, 500.0),
      // AUTOMOBILE nation 2: 3 rows across 3 bands (diverse, safe at l=3)
      ("AUTOMOBILE", 2, 100.0), ("AUTOMOBILE", 2, 2100.0), ("AUTOMOBILE", 2, 4100.0),
      // BUILDING nation 1: 2 bands (below l=3)
      ("BUILDING", 1, 100.0), ("BUILDING", 1, 2100.0))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
    val got = PrivacyQueries.lDiversity(rows, l = 3)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("AUTOMOBILE", 2L, 1L, 1L, 5L), // min diversity 1, 5 rows at risk
      ("BUILDING", 1L, 2L, 1L, 2L)), got)
  }

  test("tCloseness: a skewed group scores the hand-computed EMD, a matching one 0") {
    // Global: band0 = 3, band1 = 3, N = 6, m = 2, Q = (1/2, 1/2).
    // AUTOMOBILE/1 (all band0, P = (1,0)): cum diffs on the integer
    // lattice are 2*6-3*2 = 6 then 0, so EMD = 6/(2*6*(2-1)) = 0.5 →
    // 5000 bp. AUTOMOBILE/2 mirrors it on band1. BUILDING/1 matches the
    // global distribution exactly → 0 bp.
    val rows = Seq(
      ("AUTOMOBILE", 1, 100.0), ("AUTOMOBILE", 1, 200.0),
      ("AUTOMOBILE", 2, 2100.0), ("AUTOMOBILE", 2, 2200.0),
      ("BUILDING", 1, 300.0), ("BUILDING", 1, 2300.0))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
    val got = PrivacyQueries.tCloseness(rows, tBp = 2000)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("AUTOMOBILE", 2L, 5000L, 2L, 4L),
      ("BUILDING", 1L, 0L, 0L, 0L)), got)
  }

  test("tCloseness: a single global band reports 0 bp, not a zero division") {
    val rows = Seq(("AUTOMOBILE", 1, 100.0), ("AUTOMOBILE", 2, 200.0))
      .toDF("c_mktsegment", "c_nationkey", "c_acctbal")
    val got = PrivacyQueries.tCloseness(rows, tBp = 2000)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("AUTOMOBILE", 2L, 0L, 0L, 0L)), got)
  }

  test("z-order chunking bounds both dimensions tighter than a linear sort") {
    // Chunking the x-sorted order leaves each chunk's y extent near full
    // range, while interleaved-bit order bounds both dimensions — the
    // audit's sum_y_range must drop under zorder while sum_x_range stays
    // the same order of magnitude. Runs the registered QueryDef on sf0.001.
    val rows = SparkEntry.queries("rel_zorder")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (_, _, linY) = rows("linear")
    val (_, _, zoY) = rows("zorder")
    assert(zoY < linY, s"zorder sum_y_range $zoY not tighter than linear $linY")
  }

  test("geometric-mechanism ladder masses equal the exact α=1/2 CDF") {
    import org.apache.spark.sql.functions.col
    // evaluate the inverse-CDF ladder on EVERY u in [0, 3·2^20): the width
    // of each z's preimage IS its probability mass on the exact lattice —
    // P(0)=1/3, P(±k)=(1/3)·2^-|k|, tails collapsed into ±8
    val mass = spark.range(PrivacyQueries.GeoT)
      .select(PrivacyQueries.geoNoise(col("id")).as("z"))
      .groupBy("z").count()
      .as[(Long, Long)].collect().toMap
    val third = PrivacyQueries.GeoT / 3 // 2^20
    assert(mass(0L) == third, mass)
    (1 to 7).foreach { k =>
      assert(mass(k.toLong) == third >> k, s"z=$k: ${mass.get(k.toLong)}")
      assert(mass(-k.toLong) == third >> k, s"z=-$k: ${mass.get(-k.toLong)}")
    }
    // collapsed tails carry the full remaining per-side mass:
    // Σ_{k≥8} (1/3)·2^-k = (1/3)·2^-7 = third>>7 = 8192 exactly
    assert(mass(8L) == third >> 7, mass.get(8L))
    assert(mass(-8L) == third >> 7, mass.get(-8L))
    assert(mass.values.sum == PrivacyQueries.GeoT, mass)
    assert(mass.keySet == (-8L to 8L).toSet, mass.keySet)
  }

  test("dpGeometricRelease shifts each group count by its ladder draw, clamped at zero") {
    import org.apache.spark.sql.functions.col
    // replay the hash + ladder in plain Scala for a handful of keys and
    // check the released counts; keys chosen so at least one draw is
    // negative enough to clamp a count-1 group to zero
    def draw(nk: Long): Long = {
      val u = java.lang.Math.floorMod(
        (nk & 2147483647L) * 2654435761L + 98765L, 1000000007L) % PrivacyQueries.GeoT
      PrivacyQueries.geoLadder.find { case (thr, _) => u < thr }
        .map(_._2.toLong).getOrElse(8L)
    }
    val keys = (0L to 40L)
    assert(keys.exists(draw(_) <= -1L), "test keys never draw negative noise")
    assert(keys.exists(draw(_) >= 1L), "test keys never draw positive noise")
    // one row per key => every true count is 1
    val customer = keys.map(k => (k, "seg", 0.0))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = PrivacyQueries.dpGeometricRelease(customer)
      .as[(Long, Long)].collect().toMap
    keys.foreach { k =>
      assert(got(k) == math.max(1L + draw(k), 0L), s"key $k draw ${draw(k)}")
    }
    assert(keys.exists(k => got(k) == 0L), "clamp never exercised")
  }

  test("dpUserLevelRelease: a 1000-row user moves the release by at most C before noise") {
    // background: 30 users with 1..3 orders each, priorities spread over
    // two groups; then ONE whale user (custkey 999) with 1000 orders, all
    // in priority "1-URGENT". User-level sensitivity demands that adding
    // the whale moves the BOUNDED count vector by <= C in L1 — the whole
    // point contribution bounding buys that row-level DP can't.
    val c = 5
    def mkOrders(rows: Seq[(Long, Long, String)]) =
      rows.toDF("o_custkey", "o_orderkey", "o_orderpriority")
    var oid = 0L
    val background = (1L to 30L).flatMap { cust =>
      (0L until (cust % 3 + 1)).map { _ =>
        oid += 1
        (cust, oid, if (cust % 2 == 0) "1-URGENT" else "2-HIGH")
      }
    }
    val whale = (1L to 1000L).map(i => (999L, 100000L + i, "1-URGENT"))
    val without = PrivacyQueries.dpUserLevelRelease(mkOrders(background), c)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val withWhale = PrivacyQueries.dpUserLevelRelease(
        mkOrders(background ++ whale), c)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // raw counts move by the whale's full 1000 rows...
    assert(withWhale("1-URGENT")._2 - without("1-URGENT")._2 == 1000L)
    // ...but the bounded counts move by exactly min(1000, C) = C in total
    val l1 = (without.keySet ++ withWhale.keySet).toSeq.map { k =>
      math.abs(withWhale.get(k).map(_._3).getOrElse(0L) -
        without.get(k).map(_._3).getOrElse(0L))
    }.sum
    assert(l1 == c.toLong, s"bounded-count L1 moved by $l1, expected $c")
    // background users (all under the cap) are untouched by bounding
    assert(without.values.forall(r => r._2 == r._3),
      "no background user exceeds the cap, so bounded == raw without whale")
    // and the released value is the bounded count plus its ladder draw
    def draw(k: Long): Long = {
      val u = java.lang.Math.floorMod(
        (k & 2147483647L) * 2654435761L + 31337L, 1000000007L) % PrivacyQueries.GeoT
      PrivacyQueries.geoLadder.find { case (thr, _) => u < thr }
        .map(_._2.toLong).getOrElse(8L)
    }
    withWhale.foreach { case (p, r) =>
      assert(r._4 == math.max(r._3 + draw(p.take(1).toLong), 0L), p)
    }
  }

  test("randomized response debiases to the exact integer estimator") {
    import org.apache.spark.sql.functions.col
    // 200 rows, one segment, truth = negative balance on every 5th key;
    // replay the two hash-coin bits in Scala and check the reported count
    // and the ppm estimator EXACTLY — then sanity-check the debiasing is
    // in range of the true 20% rate (the coin noise at n=200 stays well
    // inside ±250000 ppm for this fixed hash draw)
    def coin(k: Long): Long = java.lang.Math.floorMod(
      (k & 2147483647L) * 2654435761L + 424243L, 1000000007L) % 4L
    val rows = (1L to 200L).map(k => (k, "SEG", if (k % 5 == 0) -10.0 else 10.0))
    val customer = rows.toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val reported = rows.map { case (k, _, bal) =>
      val truth = if (bal < 0) 1L else 0L
      coin(k) match {
        case 0L | 1L => truth
        case 2L      => 1L
        case _       => 0L
      }
    }.sum
    val got = PrivacyQueries.rrEstimate(customer)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val est = (2L * reported * 1000000L) / 200L - 500000L
    assert(got == Seq(("SEG", 200L, reported, est, 200000L)), got)
    assert(math.abs(est - 200000L) < 250000L,
      s"debiased estimate $est implausibly far from the 200000 ppm truth")
  }

  test("exponential-mechanism median: the quantized race replays exactly") {
    import org.apache.spark.sql.functions.col
    // One segment, 6 rows at known $100 bands {1, 1, 2, 2, 3, 90}: replay
    // the full race in Scala — utility lattice d(r) = |2·lt + eq − n| over
    // the fixed grid, per-candidate geometric noise z = trailing zeros of
    // the (segment, band) hash, released = argmin(d − z, d, band) — and
    // require the operator's row to match field for field. Also pins the
    // race's mass function: the exact median (d = 0) leads by
    // construction unless an opponent out-draws it by its full utility
    // deficit, each deficit step halving that chance (ε = 2·ln 2 ideal,
    // ≤ 4·ln 2 after floor quantization).
    val rows = Seq(150.0, 160.0, 250.0, 260.0, 350.0, 9050.0).map(("SEG", _))
    val customer = rows.toDF("c_mktsegment", "c_acctbal")
    val bands = rows.map { case (_, b) => math.floor(b / 100).toLong }
    val n = bands.size.toLong
    val grid = (PrivacyQueries.MedBandLo to PrivacyQueries.MedBandHi).map { r =>
      val lt = bands.count(_ < r).toLong
      val eq = bands.count(_ == r).toLong
      val d = math.abs(2 * lt + eq - n)
      val h1 = java.lang.Math.floorMod(
        ('S'.toLong & 2147483647L) * 2654435761L + (r + 11L) * 97781L + 131071L,
        1000000007L) + 1L
      val z = java.lang.Long.numberOfTrailingZeros(h1).toLong
      (r, lt + eq, d, z)
    }
    // d = 0 exactly at band 2 (lt = 2, eq = 2, n = 6 → |2·2+2−6| = 0):
    // the exact median starts the race at key = −z ≤ 0
    assert(grid.find(_._1 == 2L).get._3 == 0L)
    // the bit identity the engines use — bit_count((h & −h) − 1) — IS the
    // trailing-zero count, for every candidate on the grid
    grid.foreach { case (r, _, _, z) =>
      val h1 = java.lang.Math.floorMod(
        ('S'.toLong & 2147483647L) * 2654435761L + (r + 11L) * 97781L + 131071L,
        1000000007L) + 1L
      assert(java.lang.Long.bitCount((h1 & -h1) - 1) == z, s"band=$r") }
    val (relBand, _, relD, relZ) =
      grid.minBy { case (r, _, d, z) => (d - z, d, r) }
    // the winner's key is minimal across the whole lattice
    assert(grid.forall { case (r, _, d, z) =>
      (relD - relZ) < (d - z) || ((relD - relZ) == (d - z) && relD <= d) },
      "released candidate does not minimize the race key")
    val trueMed = grid.find { case (_, c, _, _) => 2 * c >= n }.get._1
    val got = PrivacyQueries.dpExponentialMedian(customer)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("SEG", n, trueMed, relBand, relD, relZ)), got)
  }

  test("dpTopK: one-shot race replays exactly and a dominant count always wins") {
    // Brands with hand-picked counts. The race key is n + z with z the
    // trailing-zero geometric of the per-brand hash — replay it in Scala
    // and require the released ranking to match field for field. z is the
    // trailing-zero count of h1 <= 2^30, so z <= 30: any count lead > 30
    // is noise-proof — brand 1's 100-count lead must put it at rank 1
    // regardless of every draw.
    val counts = Map(1L -> 200L, 2L -> 100L, 3L -> 97L, 4L -> 96L,
      5L -> 95L, 6L -> 94L, 7L -> 50L)
    val part = counts.toSeq.flatMap { case (b, n) =>
      (1L to n).map(i => (b * 1000 + i, s"Brand#$b"))
    }.toDF("p_partkey", "p_brand")
    def race(b: Long): (Long, Long) = {
      val h1 = java.lang.Math.floorMod(
        (b & 2147483647L) * 2654435761L + 777L, 1000000007L) + 1L
      val z = java.lang.Long.numberOfTrailingZeros(h1).toLong
      (counts(b) + z, z)
    }
    def drawU(b: Long): Long = {
      val u = java.lang.Math.floorMod(
        (b & 2147483647L) * 2654435761L + 12345L, 1000000007L) % PrivacyQueries.GeoT
      PrivacyQueries.geoLadder.find { case (thr, _) => u < thr }
        .map(_._2.toLong).getOrElse(8L)
    }
    val expected = counts.keys.toSeq
      .map(b => (b, race(b)._1, race(b)._2))
      .sortBy { case (b, key, _) => (-key, -counts(b), s"Brand#$b") }
      .take(5).zipWithIndex
      .map { case ((b, _, z), i) =>
        (i + 1L, s"Brand#$b", counts(b), z,
          math.max(counts(b) + drawU(b), 0L)) }
    val got = PrivacyQueries.dpTopK(part, k = 5)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == expected, got)
    assert(got.head._2 == "Brand#1",
      "a count lead exceeding the max noise (30 bits) must win rank 1")
  }

  test("dpExponentialQuantiles: per-quantile races replay exactly; q=50 scales the median race") {
    val rows = Seq(150.0, 160.0, 250.0, 260.0, 350.0, 9050.0).map(("SEG", _))
    val customer = rows.toDF("c_mktsegment", "c_acctbal")
    val bandsData = rows.map { case (_, b) => math.floor(b / 100).toLong }
    val n = bandsData.size.toLong
    val qs = Seq(25L, 50L, 75L)
    def raceRow(r: Long, q: Long): (Long, Long) = {
      val lt = bandsData.count(_ < r).toLong
      val eq = bandsData.count(_ == r).toLong
      val d = math.abs(100L * (2 * lt + eq) - 2 * q * n)
      val h1 = java.lang.Math.floorMod(
        ('S'.toLong & 2147483647L) * 2654435761L + (r + 11L) * 97781L
          + q * 50021L + 131071L, 1000000007L) + 1L
      (d, java.lang.Long.numberOfTrailingZeros(h1).toLong)
    }
    val expected = qs.map { q =>
      val grid = (PrivacyQueries.MedBandLo to PrivacyQueries.MedBandHi)
        .map { r => val (d, z) = raceRow(r, q); (r, d, z) }
      val (relBand, relD, relZ) =
        grid.minBy { case (r, d, z) => (d - 200L * z, d, r) }
      val trueBand = grid.map(_._1).find { r =>
        100L * bandsData.count(_ <= r) >= q * n }.get
      ("SEG", q, n, trueBand, relBand, relD, relZ)
    }
    val got = PrivacyQueries.dpExponentialQuantiles(customer)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, got)
    // the q=50 utility lattice is exactly 100x the median's d at every band
    (PrivacyQueries.MedBandLo to PrivacyQueries.MedBandHi).foreach { r =>
      val lt = bandsData.count(_ < r).toLong
      val eq = bandsData.count(_ == r).toLong
      val dMed = math.abs(2 * lt + eq - n)
      assert(raceRow(r, 50L)._1 == 100L * dMed, s"band=$r")
    }
  }

  test("dpVocabRelease: one doc moves the release by at most c coordinates") {
    // noise is a pure function of the bigram STRING, so the A-vs-B released
    // vectors differ exactly by the whale's bounded count contribution —
    // the sensitivity statement, observable end-to-end
    def release(docs: Seq[(Long, String)]) =
      PrivacyQueries.dpVocabRelease(
          docs.toDF("doc_id", "text"), c = 3, gamma = 1)
        .as[(String, Long)].collect().toMap
    val base = (1L to 6L).map(i => (i, "a b c d e f"))
    val relA = release(base)
    // whale doc: 20 distinct bigrams, cap must cut its contribution to 3
    val whale = (100L, (0 to 20).map(j => s"z$j").mkString(" "))
    val relB = release(base :+ whale)
    val keys = relA.keySet ++ relB.keySet
    val changed = keys.filter(k => relA.get(k) != relB.get(k))
    assert(changed.size <= 3, s"more than c coordinates moved: $changed")
    // every moved coordinate moved by exactly the whale's single count
    changed.foreach { k =>
      val da = relA.getOrElse(k, 0L)
      assert(math.abs(relB.getOrElse(k, 0L) - da) <= 1 || da == 0L,
        s"$k: ${relA.get(k)} -> ${relB.get(k)}")
    }
  }

  test("dpVocabRelease: counts below gamma - 8 can never be released") {
    // the tail-collapsed ladder caps noise at +8, so a bounded count of 2
    // against gamma = 12 has EXACTLY zero release probability
    val docs = Seq((1L, "p q r"), (2L, "p q s")).toDF("doc_id", "text")
    val rel = PrivacyQueries.dpVocabRelease(docs, c = 5, gamma = 12)
      .as[(String, Long)].collect()
    assert(rel.isEmpty, rel.toSeq)
  }
}
