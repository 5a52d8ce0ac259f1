package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Tag for the long-running scale checks (a few minutes on local[4]). */
object Slow extends Tag("graft.Slow")

/** 10x-bench-scale smoke for the dedup/similarity families — the cheapest
  * way to catch quadratic creep that the sf0.1 bench cannot see: a bucketed
  * LSH that silently degenerates to all-pairs looks fine at 5k docs and
  * only reveals itself as ~100x (vs ~10x) growth at 10x the corpus.
  *
  * Corpora are generated HERE (never written to the read-only
  * /root/testdata): per-doc seeded Zipf-ish token streams, so the base
  * corpus is a strict prefix of the 10x corpus (same distribution, no
  * regeneration drift), with a planted near-dup twin every 100 docs —
  * near-dup structure stays LINEAR in corpus size, as a real crawl's does.
  * Growth is asserted per query at < 30x for 10x data: linear shapes land
  * near 10x (minus amortized fixed overhead), quadratic ones near 100x.
  */
class ScaleSmokeSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private val BaseDocs = 5000  // = sf0.1 documents rows (the bench scale)
  private val BaseVecs = 2000  // = sf0.1 embeddings rows
  private val Factor = 10

  private def tokensFor(seed: Int): Seq[String] = {
    val rng = new scala.util.Random(1000 + seed)
    val n = 30 + rng.nextInt(40)
    // rank = V * u^3 skews mass to low ranks (Zipf-ish head) so shingle
    // sharing between unrelated docs is realistic-sparse, not uniform-rare
    Seq.fill(n)("w" + (4000 * math.pow(rng.nextDouble(), 3.0)).toInt)
  }

  private def corpus(nDocs: Int): DataFrame = {
    import spark.implicits._
    (0 until nDocs).map { i =>
      val text =
        if (i % 100 == 1) (tokensFor(i - 1).dropRight(1) :+ "tweaked").mkString(" ")
        else tokensFor(i).mkString(" ")
      (i.toLong, text, "en", "synth", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def vectors(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val rng = new scala.util.Random(7000 + i)
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2f - 1f), i % 16)
    }.toDF("vec_id", "embedding", "label")
  }

  private def stage(nDocs: Int, nVecs: Int): String = {
    // JVM-exit-cleaned (TempDirs), same rationale as GraphStreamScaleSpec:
    // the 10x corpora must not accumulate under /tmp across runs
    val dir = graft.sources.TempDirs.create(s"scale_$nDocs").toString
    corpus(nDocs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vectors(nVecs).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** min-of-2 timing: a growth RATIO is hypersensitive to one GC pause or
    * suite-neighbor contention landing in a single measurement (observed:
    * the same 10x dd_embedding_lsh run measuring 44s solo and 89s
    * mid-suite — the plan was identical). The min of two runs estimates
    * the contention-free cost, which is the quantity the quadratic-creep
    * assertion is actually about.
    */
  private def best2(once: () => (Double, Long)): (Double, Long) = {
    val a = once()
    val b = once()
    (math.min(a._1, b._1), b._2)
  }

  private def time(name: String, dir: String): (Double, Long) =
    best2(() => {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    })

  /** Operator-level twin of the query test below for the two TEXT-dedup
    * pair pipelines — the highest-volume operators of the north-star
    * mandate, and (through r8) the one family without a committed growth
    * band. Times `Dedup.minhashLshPairs` (band → bucket → capped pair
    * expansion → verify) and `Dedup.simhashPairsVerified` (16-bit
    * multi-probe chunk candidates → hamming+Jaccard verify) DIRECTLY —
    * not through the query layer, whose family caches would hide the
    * pipeline cost behind a one-time warm. Sub-quadratic bound: linear
    * shapes land near 10x, a candidate stage degenerating to all-pairs
    * lands near 100x.
    */
  test("text-dedup pair pipelines (minhash bands, simhash chunks) grow ~linearly", Slow) {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("minhashLshPairs/op", d => Dedup.minhashLshPairs(d)),
      ("simhashPairsVerified/op", d => Dedup.simhashPairsVerified(d)),
      // the r9 incremental admission probe: same banding, but the pair
      // space is batch x landed-bucket — must stay linear like the full
      // pair pass (a probe degenerating to corpus re-pairing would land
      // near 100x here)
      ("incrementalMinhashProbe/op",
        d => Dedup.incrementalMinhashProbe(d, isNew = col("doc_id") % 10 === 0,
          minJ = 0.5)),
      // r13: the ExactSubstr run merge over LSH candidates — span joins +
      // the diagonal island window must track the candidate volume, not
      // the pair-square (planted twins share ≥29-token prefixes, so rows
      // stay > 0 at the 20-token threshold)
      ("substringRuns/op", d => Dedup.substringRuns(d,
        Dedup.minhashLshPairs(d).select("a_id", "b_id"))),
      // r14: the onion block-frequency pass — one groupBy on the block
      // hash + one join-back, so it must track corpus tokens; a frequency
      // join degenerating to string keys or losing map-side combine shows
      // up here as super-linear growth
      ("onionReport/op", d => Dedup.onionReport(d)))
    // JIT/codegen warmup on the real small fixture, off the clock
    val warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ops.foreach { case (_, op) => op(warm).count() }
    val base = stage(BaseDocs, 0)
    val big = stage(BaseDocs * Factor, 0)
    ops.foreach { case (name, op) =>
      def once(dir: String): (Double, Long) = {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val t0 = System.nanoTime()
        val rows = op(docs).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (t1, r1) = best2(() => once(base))
      val (t10, r10) = best2(() => once(big))
      val growth = t10 / t1
      info(f"$name%-24s base=$t1%6.2fs rows=$r1%6d  10x=$t10%7.2fs rows=$r10%7d  growth=$growth%5.1fx")
      assert(r1 > 0, s"$name degenerate at base scale (planted twins not found)")
      assert(r10 > 0, s"$name degenerate at 10x scale")
      assert(growth < 30.0,
        s"$name grew ${growth}x for ${Factor}x docs — candidate stage " +
          "degenerating toward all-pairs (band/bucket/chunk blocking lost)")
    }
  }

  /** Per-query growth ceilings tighter than the generic 30x wall, pinned
    * after a fix so the regression cannot creep back unnoticed (the r12
    * gr_kcore treatment): dd_embedding_lsh read 12.0x in r12 (stats-width
    * key cost growing ~log n, PLUS the verify join broadcast-pinned on the
    * faster-growing candidate side); the r13 fixed-pool keys + unhinted
    * verify joins measure 3.7-5.8x, so 8x holds the line with margin.
    */
  // dd_embedding_lsh: quiet solo runs read 6.0-7.9x; under full-suite
  // concurrency the same code read 9.6x (r14 — wall-clock growth ratios
  // absorb co-running suites, the closenessApprox lesson), so an 8.0 cap
  // flakes on load. 10.5 still fails the broadcast-hint bug this cap was
  // cut against (measured 12.0x in r13) while clearing suite noise.
  private val GrowthCap = Map("dd_embedding_lsh" -> 10.5)

  test("dedup/similarity growth is ~linear from bench scale to 10x", Slow) {
    val queries = Seq("dd_minhash_lsh", "dd_cc_dedup", "sim_batch_topk",
      "dd_embedding_lsh")
    // JIT/codegen warmup on the real small fixture, off the clock
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    val base = stage(BaseDocs, BaseVecs)
    val big = stage(BaseDocs * Factor, BaseVecs * Factor)
    queries.foreach { q =>
      val (t1, r1) = time(q, base)
      val (t10, r10) = time(q, big)
      val growth = t10 / t1
      info(f"$q%-18s base=$t1%6.2fs rows=$r1%6d  10x=$t10%7.2fs rows=$r10%7d  growth=$growth%5.1fx")
      assert(r1 > 0, s"$q degenerate at base scale")
      assert(r10 > 0, s"$q degenerate at 10x scale")
      val cap = GrowthCap.getOrElse(q, 30.0)
      assert(growth < cap,
        s"$q grew ${growth}x for ${Factor}x data vs its ${cap}x ceiling — " +
          s"quadratic creep (linear lands near ${Factor}x)")
    }
  }
}
