package graft

import graft.functions.Aggregators
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("sumLong Aggregator reproduces word count with partial aggregation") {
    val pairs = Seq(("cat", 1L), ("dog", 1L), ("cat", 1L)).toDS()
    val counts = pairs.groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.sumLong.toColumn.name("cnt"))
      .collect().toMap
    assert(counts == Map("cat" -> 2L, "dog" -> 1L))
  }

  test("distinctSorted Aggregator reproduces the inverted-index reduce") {
    val pairs = Seq(("cat", "d1"), ("cat", "d0"), ("cat", "d1"), ("dog", "d2")).toDS()
    val idx = pairs.groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.distinctSorted.toColumn.name("docs"))
      .collect().toMap
    assert(idx == Map("cat" -> Seq("d0", "d1"), "dog" -> Seq("d2")))
  }

  test("quantile sketch: weight invariant, accuracy, and merge associativity") {
    import graft.functions.QuantileSketch.{newBuffer, quantile, totalWeight}
    // deterministic pseudo-random stream (no test flakiness)
    def stream(seed: Long, n: Int): Seq[Double] = {
      var x = seed
      (0 until n).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
      }
    }
    def build(xs: Seq[Double]) = { val b = newBuffer(); xs.foreach(b.add); b }
    val data = stream(42L, 100000)
    val sk = build(data)
    assert(sk.totalCount == data.size)
    assert(totalWeight(sk) == data.size)           // pair-collapse preserves weight
    assert(totalWeight(sk.toSketch) == data.size)  // immutable view agrees
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val est = quantile(sk, q)
      // rank error: position of the estimate in the exact order must be
      // within 1% of the requested rank
      val rank = sorted.count(_ <= est).toDouble / data.size
      assert(math.abs(rank - q) <= 0.01, s"q=$q est=$est rank=$rank")
    }

    // merge associativity: shard three ways, merge in both association
    // orders — counts/weights must agree EXACTLY, estimates within band
    val Seq(a, b, c) = Seq(1L, 2L, 3L).map(s => build(stream(s, 30000)))
    val m1 = a.copy().merge(b.copy()).merge(c.copy())
    val m2 = a.copy().merge(b.copy().merge(c.copy()))
    assert(m1.totalCount == m2.totalCount && m1.totalCount == 90000L)
    assert(totalWeight(m1) == totalWeight(m2))
    val all = (stream(1L, 30000) ++ stream(2L, 30000) ++ stream(3L, 30000)).sorted
    for (m <- Seq(m1, m2); q <- Seq(0.1, 0.5, 0.9)) {
      val rank = all.count(_ <= quantile(m, q)).toDouble / all.size
      assert(math.abs(rank - q) <= 0.01, s"merged q=$q rank=$rank")
    }

    // wire format round-trip: versioned binary encoding is lossless
    import graft.functions.QuantileSketch.{deser, ser}
    val rt = deser(ser(m1))
    assert(rt.totalCount == m1.totalCount && totalWeight(rt) == totalWeight(m1))
    for (q <- Seq(0.1, 0.5, 0.9)) assert(quantile(rt, q) == quantile(m1, q))
  }

  test("sketch aggregators: per-shard sketches roll up through Spark aggregation") {
    import graft.functions.QuantileSketch._
    val df = (1 to 20000).map(i => (i % 7, i.toDouble)).toDF("shard", "x")
    val perShard = df.groupBy("shard").agg(sketch_agg(col("x")).as("sk"))
    val est = perShard.agg(sketch_merge_agg(col("sk")).as("sk"))
      .select(sketch_quantile(col("sk"), 0.5).as("med"))
      .as[Double].head()
    assert(math.abs(est - 10000.0) <= 200.0, s"merged median estimate $est")
  }

  test("count-min sketch: shard sketches merge exactly, estimate is bounded") {
    import graft.functions.FrequencySketch._
    // 20000 keys, k = i % 100 -> every key value appears exactly 200 times
    val df = (1 to 20000).map(i => (i % 7, (i % 100).toLong)).toDF("shard", "k")
    val (est, n) = df.groupBy("shard").agg(cms_agg(col("k")).as("sk"))
      .agg(cms_merge_agg(col("sk")).as("sk"))
      .select(cms_estimate(col("sk"), 5L).as("e"), cms_total(col("sk")).as("n"))
      .as[(Long, Long)].head()
    assert(n == 20000L) // merge preserves total count exactly
    // one-sided CMS guarantee: never under, over by at most ceil(eps * N)
    assert(est >= 200L && est <= 200L + math.ceil(DefaultEps * n).toLong,
      s"estimate $est outside band")
  }

  test("kmv sketch: order/partition independence, merge-is-union, estimate error") {
    import graft.functions.KmvSketch
    val M = 1000000007L
    def h(x: Long): Long = ((x & 2147483647L) * 2654435761L + 911L) % M
    val n = 2000
    val hashes = (0L until n.toLong).map(h)
    // order independence: ascending vs descending vs shuffled feeds give
    // the byte-identical retained set
    def feed(xs: Seq[Long]) =
      xs.foldLeft(new KmvSketch.KmvBuffer())(_ add _).vals.toSeq
    val asc = feed(hashes.sorted)
    assert(feed(hashes.sorted.reverse) == asc)
    assert(feed(new scala.util.Random(5).shuffle(hashes)) == asc)
    assert(asc == hashes.sorted.take(KmvSketch.DefaultK), "not the k smallest")
    // merge(A, B) equals the sketch of A union B
    val (la, lb) = hashes.splitAt(700)
    val merged = feed(la).foldLeft(
      lb.foldLeft(new KmvSketch.KmvBuffer())(_ add _))(_ add _).vals.toSeq
    assert(merged == asc)
    // estimate error: (k-1) * M / m_k within 4 relative standard errors
    // (rse ~ 1/sqrt(k-2) ~ 13% at k=64) of the true distinct count
    val est = (KmvSketch.DefaultK - 1).toLong * M / asc.last
    assert(math.abs(est.toDouble - n) / n < 0.52, s"est=$est n=$n")
    // partition independence through Spark's partial aggregation
    val df = hashes.toDF("h")
    def viaSpark(parts: Int) =
      df.repartition(parts).agg(KmvSketch.kmv_agg(col("h")).as("s"))
        .collect()(0).getSeq[Long](0)
    assert(viaSpark(1) == asc && viaSpark(7) == asc)
  }

  test("float_cosine fused expression equals the composed dot/norm form") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f))).toDF("a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
    val (fused, composed) = df.select(
      graft.plans.VectorExpressions.floatCosine(col("a"), col("b")),
      graft.functions.VectorFns.dot(col("a"), col("b")) /
        (sqrt(graft.functions.VectorFns.dot(col("a"), col("a"))) *
         sqrt(graft.functions.VectorFns.dot(col("b"), col("b")))))
      .as[(Double, Double)].head()
    assert(fused == composed) // identical accumulation order -> bit-equal
  }

  test("float_dot is SQL-registrable") {
    VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(got == 11.0)
    val cos = spark.sql(
      "SELECT float_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
  }
}
