package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  // 20 base docs with disjoint vocabularies + 2 planted near-dup pairs + 1
  // exact dup (near-dups share all but one/one-extra token with their base)
  private def corpus = {
    val base = (0 until 20).map { i =>
      val toks = (0 until 30).map(j => s"w${i}_$j")
      (i.toLong, toks.mkString(" "))
    }
    val nd1 = (100L, base(3)._2.replace("w3_29", "zzz"))  // near-dup of doc 3
    val nd2 = (101L, base(7)._2 + " extra")               // near-dup of doc 7
    val exact = (102L, base(5)._2)                        // exact dup of doc 5
    (base ++ Seq(nd1, nd2, exact)).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val stats = Dedup.exactStats(corpus).as[(Long, Long, Long)].head()
    assert(stats == ((23L, 22L, 1L)))
    val kept = Dedup.exactDedup(corpus).as[(Long, Long)].collect().toMap
    assert(kept(5L) == 2L) // doc 5 kept as representative of the exact pair
    assert(!kept.contains(102L))
  }

  test("decontaminate flags exactly the train docs sharing an n-gram with the test split") {
    // test split = docs 3 and 5 (bases of planted dups); their dups live in
    // the "train" side and share long runs; disjoint vocabularies keep every
    // other train doc clean.
    val hits = Dedup.decontaminate(corpus,
        isTest = col("doc_id").isin(3L, 5L), n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(hits.map(_._1).toSeq == Seq(100L, 102L), hits.toSeq)
    // exact dup shares every one of its 23 8-gram shingles with doc 5
    val exactHit = hits.find(_._1 == 102L).get
    assert(exactHit._2 == 1L && exactHit._3 == 23L, exactHit)
  }

  test("exact ngram jaccard finds exactly the planted near-dups (J>=0.8)") {
    val pairs = Dedup.ngramJaccardPairs(corpus, minJ = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 100L), (7L, 101L), (5L, 102L)))
  }

  test("minhash estimator calibration: exact copies match on all 128 components, disjoint docs on almost none") {
    // identical texts hash to identical signatures — matches MUST be 128
    // and est_bp exactly 10000 (any miss = a broken hash family, the
    // failure mode dd_minhash_est_quality exists to flag); two
    // disjoint-vocabulary docs collide per component with prob
    // ~1/|union| (~1/56 here), so matches stays near 0 — far below the
    // perfect-match bound and below any J >= 0.8 signature.
    val pairs = Seq((5L, 102L, 1.0), (0L, 1L, 0.0))
      .toDF("a_id", "b_id", "jaccard")
    val got = Dedup.minhashEstQuality(corpus, pairs)
      .orderBy("a_id")
      .select("a_id", "b_id", "matches", "est_bp", "abs_err_bp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val exactPair = got.find(_._1 == 5L).get
    assert(exactPair == ((5L, 102L, 128L, 10000L, 0L)), exactPair)
    val disjoint = got.find(_._1 == 0L).get
    assert(disjoint._3 < 20L && disjoint._4 < 1600L,
      s"disjoint docs estimated far too similar: $disjoint")
  }

  test("containment: finds the short-doc-inside-long-doc pair Jaccard misses") {
    // doc 200 = first 12 tokens of doc 2, verbatim: every shingle of 200 is
    // in 2, so containment = 1.0, while Jaccard ~ 10/28 is far below 0.8.
    val sub = (200L, (0 until 12).map(j => s"w2_$j").mkString(" "))
    val docs = corpus.union(Seq(sub).toDF("doc_id", "text"))
    val cont = Dedup.containmentPairs(docs, minC = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(cont.contains((2L, 200L)))
    val jac = Dedup.ngramJaccardPairs(docs, minJ = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!jac.contains((2L, 200L)))
  }

  test("containment >= jaccard on every shared pair (set inequality)") {
    val j = Dedup.ngramJaccardPairs(corpus, minJ = 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard")).as[(Long, Long, Double)]
      .collect().map { case (a, b, v) => (a, b) -> v }.toMap
    val c = Dedup.containmentPairs(corpus, minC = 0.5)
      .select(col("a_id"), col("b_id"), col("containment")).as[(Long, Long, Double)]
      .collect().map { case (a, b, v) => (a, b) -> v }.toMap
    // |A∩B|/min >= |A∩B|/union, so every Jaccard pair appears with >= score
    assert(j.keySet.subsetOf(c.keySet))
    j.foreach { case (k, jv) => assert(c(k) >= jv - 1e-9, s"$k: ${c(k)} < $jv") }
  }

  test("materialize strategies (persist/checkpoint) give identical results") {
    val expected = Dedup.ngramJaccardPairs(corpus, minJ = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    try {
      spark.conf.set("spark.graft.materialize", "persist")
      assert(Dedup.ngramJaccardPairs(corpus, minJ = 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet == expected)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("ckpt").toString)
      spark.conf.set("spark.graft.materialize", "checkpoint")
      assert(Dedup.ngramJaccardPairs(corpus, minJ = 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet == expected)
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("minhash LSH recovers the same pairs as exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(corpus, minJ = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(corpus, minJ = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash pairs recover the planted near-dups") {
    val sh = Dedup.simhashPairs(corpus, maxHam = 10, minJ = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(sh.contains((5L, 102L))) // exact dup: hamming 0
    assert(sh.subsetOf(Set((3L, 100L), (7L, 101L), (5L, 102L))))
  }

  test("over-full LSH buckets chain min + neighbors instead of being dropped") {
    // 12 exact copies with maxBucket=5: every band bucket holds all 12,
    // exceeding the cap -> chained pairs must still link every copy to the
    // keeper (min chain) plus its sorted-id neighbors (second route, so one
    // failed verification can't orphan a member)
    val copies = (0 until 12).map(i => (i.toLong, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(copies, minJ = 0.9, maxBucket = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val minChain = (1 until 12).map(i => (0L, i.toLong)).toSet
    val adjChain = (1 until 11).map(i => (i.toLong, i + 1L)).toSet
    assert(pairs == minChain ++ adjChain)
    // the dedup guarantee: every non-keeper is some pair's b_id
    assert((1 until 12).forall(i => pairs.exists(_._2 == i.toLong)))
  }

  test("embedding LSH near-dup: recall 1 over noisy planted near-dups") {
    // Non-colinear near-dups (the probabilistic regime, unlike the scaled
    // copies in the dd_embedding_lsh oracle query): 50 random unit vectors +
    // a perturbed copy of each at cosine ~0.97. LSH candidates + exact
    // verification must reproduce the brute-force pair set exactly.
    val rnd = new scala.util.Random(7)
    val dim = 16
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 50).map(i => (i.toLong, unit()))
    val planted = base.map { case (i, v) =>
      val u = unit()
      (i + 1000L, v.zip(u).map { case (x, w) => x + 0.15f * w })
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val exact = Dedup.embeddingNearDupPairs(df, minCos = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingLshPairs(df, minCos = 0.9, dim = dim,
      bitsPerTable = 8, tables = 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus should contain planted near-dup pairs")
    assert(lsh == exact,
      s"LSH pair set != exact pair set (missing=${exact -- lsh}, extra=${lsh -- exact})")
  }

  test("substringRuns merges consecutive shared spans into maximal token runs") {
    // Planted shared passages with all-distinct filler tokens so no span
    // matches by accident: docs 1 and 2 share a 30-token passage p AND a
    // separate 22-token passage q (two diagonals → two maximal runs);
    // docs 1 and 3 share only a 10-token prefix run — under the 20-token
    // threshold, so the (1,3) pair must be filtered out entirely.
    def w(pfx: String, n: Int) = (1 to n).map(pfx + _)
    val p = w("p", 30); val q = w("q", 22)
    val d1 = (w("a", 10) ++ p ++ w("x", 10) ++ q ++ w("y", 10)).mkString(" ")
    val d2 = (w("b", 5) ++ p ++ w("z", 5) ++ q ++ w("u", 5)).mkString(" ")
    val d3 = (w("a", 10) ++ w("c", 40)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val got = Dedup.substringRuns(docs, pairs, spanW = 4, minRunTokens = 20)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // p contributes 27 span matches on one diagonal (run of 27+3 = 30
    // tokens), q contributes 19 on another (19+3 = 22): 46 matched spans,
    // 2 maximal runs, longest 30
    assert(got == Seq((1L, 2L, 46L, 2L, 30L)), got)
    // and at a 10-token threshold the (1,3) prefix run surfaces as 7+3
    val loose = Dedup.substringRuns(docs, pairs, spanW = 4, minRunTokens = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(loose == Seq((1L, 2L, 46L, 2L, 30L), (1L, 3L, 7L, 1L, 10L)), loose)
  }

  test("substringApply cuts overlapping runs once and keeps the canonical copy") {
    // Same planted-passage layout as the run-report test, plus doc 4
    // pairing with BOTH 1 and 2 on the same passage p — so doc 4's
    // p-positions are covered by TWO qualifying runs (pairs (1,4) and
    // (2,4)) and must be cut exactly ONCE; docs 1 (min id of every pair it
    // appears in) keeps everything, doc 2 loses p and q to canonical doc
    // 1, and the under-threshold (1,3) prefix run must cut nothing.
    def w(pfx: String, n: Int) = (1 to n).map(pfx + _)
    val p = w("p", 30); val q = w("q", 22)
    val d1 = (w("a", 10) ++ p ++ w("x", 10) ++ q ++ w("y", 10)).mkString(" ")
    val d2 = (w("b", 5) ++ p ++ w("z", 5) ++ q ++ w("u", 5)).mkString(" ")
    val d3 = (w("a", 10) ++ w("c", 40)).mkString(" ")
    val d4 = (w("e", 7) ++ p ++ w("f", 7)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L))
      .toDF("a_id", "b_id")
    val got = Dedup.substringApply(docs, pairs, spanW = 4, minRunTokens = 20)
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: canonical side of every run — untouched (82 tokens)
    // doc 2: loses p (30) + q (22) of its 67 tokens → 15 kept, fillers only
    // doc 3: prefix run under threshold → untouched
    // doc 4: loses p ONCE (covered by two pairs' runs) → 14 kept
    val keptByDoc = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(keptByDoc == Map(1L -> (82L, 82L), 2L -> (67L, 15L),
      3L -> (50L, 50L), 4L -> (44L, 14L)), got)
    assert(got.find(_._1 == 2L).get._4 ==
      (w("b", 5) ++ w("z", 5) ++ w("u", 5)).mkString(" "))
    assert(got.find(_._1 == 4L).get._4 ==
      (w("e", 7) ++ w("f", 7)).mkString(" "))
    assert(got.find(_._1 == 1L).get._4 == d1)
  }

  test("simhash pigeonhole: every pair at hamming <= 7 is found (recall bound)") {
    // Ground truth from the exposed simhash table: all-pairs hamming,
    // locally. With minJ = 0 the pair query's only filters are the chunk
    // collision and the hamming threshold, so at maxHam = 7 (the 8x8-bit
    // pigeonhole bound) its output must EQUAL the <=7-hamming pair set.
    val sims = Dedup.simhash64(corpus).as[(Long, Long)].collect()
    val expected = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (a, b)).toSet
    val found = Dedup.simhashPairs(corpus, maxHam = 7, minJ = 0.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty) // exact dup (5, 102) at hamming 0 at minimum
    assert(found == expected)
  }

  test("simhash scale config (16-bit chunks + multi-probe) equals 8x8 at the shared bound") {
    // Both configs guarantee recall 1 at hamming <= 7 (8 chunks exact; 4
    // chunks with 1-bit probes => 2c-1 = 7), and the verification filter
    // caps at maxHam, so their VERIFIED outputs are the same deterministic
    // set — the scale config trades 17x probe rows for ~30x fewer random
    // chunk collisions (see simhashPairs scaladoc).
    val small = Dedup.simhashPairs(corpus, maxHam = 7, minJ = 0.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val scale = Dedup.simhashPairs(corpus, maxHam = 7, minJ = 0.0,
        chunkBits = 16, multiProbe = true)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(small.nonEmpty)
    assert(scale == small,
      s"configs disagree (missing=${small -- scale}, extra=${scale -- small})")
  }

  test("simhash scale config generates no more candidates than 8x8") {
    // The cost side of the config dial: with maxHam = 63 the hamming filter
    // is a no-op, so the verified output enumerates every distinct
    // chunk-collision pair — the candidate volume each config pays to
    // verify. The 16-bit+multiProbe config exists to cut random collisions
    // (~n^2/964 vs ~n^2/32 expected); assert it never costs MORE than the
    // 8x8 default on this corpus (both counts are hash-deterministic).
    def candidates(chunkBits: Int, multiProbe: Boolean) =
      Dedup.simhashPairs(corpus, maxHam = 63, minJ = 0.0,
        chunkBits = chunkBits, multiProbe = multiProbe).count()
    val c8 = candidates(8, multiProbe = false)
    val c16mp = candidates(16, multiProbe = true)
    assert(c8 > 0)
    assert(c16mp <= c8, s"scale config generated MORE candidates: $c16mp > $c8")
  }

  test("cross-engine simhash pairs equal the all-pairs hamming ball (oracle premise)") {
    // dd_simhash_pairs' DuckDB oracle is candidate-free: it relies on the
    // 16-bit+multiProbe pigeonhole bound making the verified output EQUAL
    // the <=7-hamming pair set over the cross-engine simhash values. Assert
    // that premise in-engine so the oracle can never silently narrow.
    val sims = Dedup.simhashCrossEngine(corpus)
      .select("doc_id", "sim").as[(Long, Long)].collect()
    val expected = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
    val found = Dedup.simhashPairsCrossEngine(corpus, maxHam = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    assert(found == expected,
      s"pair set != hamming ball (missing=${expected -- found}, extra=${found -- expected})")
  }

  test("connected components: throws instead of returning non-converged labels") {
    // chain of diameter 9 cannot converge in 3 one-hop iterations — the
    // operator must fail loudly, never silently return split components
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connected components: transitive chains collapse to one keeper") {
    // a~b, b~c (a !~ c) plus a separate pair: components {1,2,3} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // long chain converges too (diameter > 1 iteration's reach)
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val cl = Dedup.connectedComponents(chain).as[(Long, Long)].collect().toMap
    assert(cl.values.toSet == Set(1L) && cl.size == 10)
    // empty pair set -> empty labels, no loop blowup
    assert(Dedup.connectedComponents(pairs.filter($"a_id" < 0)).count() == 0)
  }

  test("incrementalDedup flags exactly the batch docs whose text is landed") {
    val corpus = Seq((1L, "w1", "the cat sat"), (2L, "w1", "dogs bark loud"))
      .toDF("doc_id", "source", "text")
    val incoming = Seq(
      (10L, "w1", "the cat sat"),    // dup of corpus doc 1
      (11L, "w1", "fresh new text"), // new
      (12L, "w2", "dogs bark loud")) // dup of corpus doc 2
      .toDF("doc_id", "source", "text")
    val got = Dedup.incrementalDedup(incoming, corpus)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("w1", 2L, 1L, 1L), ("w2", 1L, 1L, 0L)), got)
  }

  test("incrementalMinhashProbe: batch probes landed buckets, landed never re-paired") {
    // "new" = the planted dups (ids >= 100); their bases are landed. Every
    // planted pair must be recovered as (new, landed); landed-landed and
    // new-new pairs must NOT appear (the probe only joins batch -> landed).
    val got = Dedup.incrementalMinhashProbe(corpus, isNew = col("doc_id") >= 100L,
        minJ = 0.5)
      .select("new_id", "landed_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 3L), (101L, 7L), (102L, 5L)), got)
    // flipping the flag finds nothing: the bases are not near-dups of each
    // other, so a batch of only-bases probing the dup-side corpus still
    // finds the same pairs mirrored
    val flipped = Dedup.incrementalMinhashProbe(corpus, isNew = col("doc_id") < 100L,
        minJ = 0.5)
      .select("new_id", "landed_id").as[(Long, Long)].collect().toSet
    assert(flipped == Set((3L, 100L), (7L, 101L), (5L, 102L)), flipped)
  }

  test("fuzzyBlockedPairs: exact within blocks, documented misses across them") {
    val names = Seq("grafting", "graftings", "crafting", "kraftwerk", "graft")
      .toDF("name")
    val got = Dedup.fuzzyBlockedPairs(names, prefixLen = 2, lenBand = 8, maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    // same block (pfx "gr", len 8-9 -> band 1): grafting~graftings dist 1
    assert(got == Set(("grafting", "graftings", 1)), got)
    // crafting (pfx "cr") is dist 1 from grafting but BLOCKED OUT by the
    // prefix bucket; graft (len 5 -> band 0) by the length band — the
    // deterministic recall loss the scaladoc documents
    val exact = names.as("x").crossJoin(names.as("y"))
      .filter($"x.name" < $"y.name")
      .filter(levenshtein($"x.name", $"y.name") <= 2).count()
    assert(exact > got.size, "blocking should be a strict candidate subset here")
  }

  test("dedup is idempotent: no pairs among deduplicated docs") {
    val deduped = corpus.join(
      Dedup.ngramJaccardPairs(corpus, minJ = 0.5).select($"b_id".as("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(Dedup.ngramJaccardPairs(deduped, minJ = 0.5).count() == 0)
  }

  test("semDedup drops higher-id near-identical vectors within a cluster only") {
    // cluster 0 holds an exact dup (10 of 0) and a perturbed near-dup
    // (1 of 0, cos ~0.999); clusters 1 and 2 are singletons — min-id
    // keeper retains exactly one vector of the similarity group.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0.95f, 0.05f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 1),
      (3L, Array(0f, 0f, 1f), 2),
      (10L, Array(1f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val rep = Dedup.semDedup(vecs, minCos = 0.9)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rep == Seq((0, 3L, 2L, 1L), (1, 1L, 0L, 1L), (2, 1L, 0L, 1L)), rep)
  }

  test("cdcChunkStats: identical docs duplicate every chunk; bytes reconcile") {
    // Two byte-identical docs: content-defined boundaries land at the
    // same offsets, so EVERY chunk has exactly 2 copies — dup_bytes must
    // equal one full copy's length and distinct = chunks/2. The third doc
    // is shorter than the window: exactly one whole-doc chunk.
    val text = (0 until 40).map(j => s"tok$j word$j").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, "tiny"))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunkStats(docs)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (nChunks, nDistinct, nDupGroups, dupBytes, avgX100) = got
    assert(nChunks >= 3, got)
    assert((nChunks - 1) % 2 == 0, got) // pair chunks + the 'tiny' chunk
    assert(nDistinct == (nChunks - 1) / 2 + 1, got)
    assert(nDupGroups == (nChunks - 1) / 2, got)
    assert(dupBytes == text.length, got)
    // mean chunk length x100 over exact integers
    assert(avgX100 == 100L * (2 * text.length + 4) / nChunks, got)
  }

  test("cdcChunkStats: a shared passage between different docs is found") {
    // Distinct docs sharing a long interior passage: CDC boundaries
    // re-align inside the shared span, so at least one duplicated chunk
    // must appear even though neither whole doc nor any fixed split
    // matches. The passage must be long enough to contain >= 2 interior
    // boundaries (expected every 64 chars) — 600 chars gives ~9.
    val shared = (0 until 60).map(j => s"common$j").mkString(" ")
    val docs = Seq(
      (1L, "prefix one two three " + shared + " suffix alpha"),
      (2L, "totally different head " + shared + " other tail"))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunkStats(docs)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._3 >= 1, s"no duplicate chunk group found: $got")
    assert(got._4 > 0, s"no duplicate bytes: $got")
  }

  test("winnowing: no-miss guarantee, density bound, and short-doc boundary") {
    // Paper guarantees (Schleimer et al. 2003 §3-4) at (n=3, w=4):
    //  - any shared token run of length >= w + n - 1 = 6 yields a COMMON
    //    fingerprint in both docs (locality/no-miss)
    //  - per full window at least one selection is made, and a selection
    //    is reused across consecutive windows, so 1 <= n_fp <= n_grams
    //  - a doc with n_grams < w selects exactly its global minimum (1 fp)
    val run = "alpha beta gamma delta epsilon zeta" // 6 shared tokens
    val docs = Seq(
      (1L, "one two three four five " + run + " six seven eight nine"),
      (2L, "red blue green yellow " + run + " purple orange pink"),
      (3L, "tiny little doc here"), // 4 tokens -> 2 grams < w
      (4L, "unrelated words entirely distinct from everything else written"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, n = 3, w = 4)
    val byDoc = fp.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    // no-miss: docs 1 and 2 share at least one fingerprint HASH
    val h1 = fp.filter(col("doc_id") === 1L).select("h").as[Long].collect().toSet
    val h2 = fp.filter(col("doc_id") === 2L).select("h").as[Long].collect().toSet
    assert((h1 & h2).nonEmpty, "shared 6-token run produced no common fingerprint")
    // doc 4 shares nothing with doc 1 or 2 (disjoint vocabulary)
    val h4 = fp.filter(col("doc_id") === 4L).select("h").as[Long].collect().toSet
    assert((h4 & (h1 ++ h2)).isEmpty, "disjoint doc shares a fingerprint")
    // short-doc boundary: 2 grams < w=4 -> exactly one (global-min) selection
    assert(byDoc(3L) == 1L, s"short doc selected ${byDoc(3L)} fingerprints")
    // density: every doc selects at least 1 and at most n_grams fingerprints
    val stats = Dedup.winnowStatsFromFp(fp)
      .as[(Long, Long, Long, Long)].collect()
    stats.foreach { case (id, ng, nfp, bp) =>
      assert(nfp >= 1L && nfp <= ng, s"doc $id: n_fp=$nfp out of [1, $ng]")
      assert(bp == 10000L * nfp / ng, s"doc $id density")
    }
    // rightmost tie-break: a constant-token doc hashes every gram equally,
    // so each window's min is its RIGHTMOST position; consecutive windows
    // then select consecutive positions — n_fp = number of full windows
    // (the paper's worst case: density 1 per window, still bounded)
    val const = Seq((9L, Seq.fill(8)("same").mkString(" "))).toDF("doc_id", "text")
    val cfp = Dedup.winnowFingerprints(const, n = 3, w = 4)
      .select("p").as[Long].collect().sorted
    // 6 grams, full windows at i = 1..3 select positions 4, 5, 6
    assert(cfp.toSeq == Seq(4L, 5L, 6L), cfp.toSeq)
  }

  test("entity resolution: ground-truth recall 1, threshold semantics, transitive clusters") {
    // Miniature part registry covering the decision tiers:
    //  pk 0, 6, 12: planted variants (pk % 3 == 0) -> must match base
    //  pk 1 vs 2: same name+type, same size -> jw = 1.0, +22+8 -> match
    //  pk 3 vs 4: same name+type, size off by 5 -> 22-6 = 16 -> NO match
    //  pk 7 vs 8: different second word, same size -> jw < 0.94 -> NO match
    val part = Seq(
      (0L, "small ring", "ECONOMY", "Brand#1", 10L),
      (6L, "small ring", "STANDARD", "Brand#1", 20L),
      (12L, "blue bolt", "ECONOMY", "Brand#2", 30L),
      (1L, "red widget", "ECONOMY", "Brand#3", 7L),
      (2L, "red widget", "ECONOMY", "Brand#3", 7L),
      (3L, "hot gear", "ECONOMY", "Brand#4", 1L),
      (4L, "hot gear", "ECONOMY", "Brand#4", 6L),
      (7L, "red gadget", "ECONOMY", "Brand#5", 9L),
      (8L, "red gizmo", "ECONOMY", "Brand#5", 9L))
      .toDF("p_partkey", "p_name", "p_type", "p_brand", "p_size")
    val pairs = Dedup.erMatchedPairs(part)
      .as[(Long, Long, Double, Long)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // recall: every planted variant (pk + offset) matches its base
    Seq(0L, 6L, 12L).foreach { pk =>
      assert(pairSet.contains((pk, pk + Dedup.ErOffset)),
        s"variant of $pk missed: $pairSet")
    }
    // identical records match; incompatible size or weak name do not
    assert(pairSet.contains((1L, 2L)), pairSet)
    assert(!pairSet.contains((3L, 4L)), "size-incompatible pair matched")
    assert(!pairSet.contains((7L, 8L)), "weak-name pair matched")
    // every match carries a score >= 25 by construction
    assert(pairs.forall(_._4 >= 25L), pairs.toSeq)
    // clusters: variant + base collapse to one entity keyed by min rec_id
    val clusters = Dedup.erClustersFromPairs(Dedup.erMatchedPairs(part))
      .as[(Long, Long, Long)].collect().toSeq
    assert(clusters.contains((0L, 2L, 1L)), clusters)   // base 0 + its variant
    assert(clusters.contains((1L, 2L, 0L)), clusters)   // 1 ~ 2, no variants
    // transitivity: chain a ~ b ~ c via off-by-one sizes becomes ONE entity
    val chain = Seq(
      (20L, "lace crown", "ECONOMY", "Brand#9", 10L),
      (22L, "lace crown", "ECONOMY", "Brand#9", 11L),
      (23L, "lace crown", "ECONOMY", "Brand#9", 12L))
      .toDF("p_partkey", "p_name", "p_type", "p_brand", "p_size")
    val chained = Dedup.erClustersFromPairs(Dedup.erMatchedPairs(chain))
      .as[(Long, Long, Long)].collect().toSeq
    // 20~22 and 22~23 match (off-by-one), 20~23 does not (off-by-two) —
    // but CC must still produce the single entity {20, 22, 23}
    assert(chained == Seq((20L, 3L, 0L)), chained)
  }

  test("onionReport counts cross-doc blocks only and applies the drop rule") {
    // blockW=2: A and B share block "a b" (each 1/2 duplicated -> both
    // dropped at 50%); C's single block is unique; D repeats "q q" WITHIN
    // itself only (ndocs=1 -> not duplicate, the distinct-doc rule); E is
    // shorter than a block and must not count as a doc at all
    val docs = Seq(
      (1L, "a b c d", "s0"), (2L, "a b x y", "s0"), (3L, "z z z", "s0"),
      (4L, "q q q q", "s0"), (5L, "s", "s0"),
      (6L, "u v w t", "s1")).toDF("doc_id", "text", "source")
    val got = Dedup.onionReport(docs, blockW = 2, dropBp = 5000)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s0", 4L, 7L, 2L, 2L, 5000L),
      ("s1", 1L, 2L, 0L, 0L, 0L)), got)
  }

  test("winnowPairsFromFp scores planted near-dups and skips unrelated docs") {
    val fp = Dedup.winnowFingerprints(corpus)
    val pairs = Dedup.winnowPairsFromFp(fp, minJ = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // the exact dup and both planted near-dups must pair with their base
    assert(pairs.contains((5L, 102L)), s"exact dup missed: $pairs")
    assert(pairs.contains((3L, 100L)), s"near-dup 1 missed: $pairs")
    assert(pairs.contains((7L, 101L)), s"near-dup 2 missed: $pairs")
    // disjoint-vocabulary base docs never pair with each other
    assert(!pairs.exists { case (a, b) => a < 20L && b < 20L },
      s"unrelated base docs paired: $pairs")
  }
}
