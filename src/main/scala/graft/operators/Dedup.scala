package graft.operators

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over a (doc_id, text) corpus and an
  * (vec_id, embedding) table: exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB): the LSH paths (MinHash bands, SimHash chunks)
  * shuffle O(bands x docs) rows and compare only within buckets, avoiding the
  * O(n^2) pair space; candidate generation uses groupBy+pair-expansion inside
  * buckets rather than a self-join, so there is exactly one shuffle to form
  * buckets. Oversized buckets (degenerate keys) are capped. The exact
  * pairwise forms exist as correctness oracles and for small inputs.
  */
object Dedup {

  /** Exact-duplicate summary: total docs, distinct texts, redundant docs.
    * (Exact dedup itself = dropDuplicates("text") / min(doc_id) per text.)
    */
  def exactStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("total_docs"),
      count_distinct(col("text")).as("distinct_texts"),
      (count(lit(1)) - count_distinct(col("text"))).as("redundant_docs"))

  /** Exact dedup: keep the lowest doc_id per identical text. Aggregation
    * form (one shuffle on a text hash would be the 100 TB shape; here the
    * text itself is the key).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy("text").agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Distinct word-n-gram shingle sets per doc: (doc_id, shingles).
    * Tokenization is materialized in its own projection so the shingle
    * lambda's repeated element_at references hit a cheap attribute, not a
    * re-evaluated split() (Catalyst's CollapseProject would otherwise be free
    * to inline it into every lambda position).
    */
  private def shingleSets(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_sort(array_distinct(TextFns.shingles(col("toks"), n))).as("sh"))

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= minJ). Pair
    * generation via shingle equi-join (only docs sharing a shingle are ever
    * compared), intersection counted from the join — never materializes the
    * full n^2 space, but still O(sum of per-shingle doc-count^2): the
    * correctness baseline; MinHash below is the scale path.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJ: Double = 0.8): DataFrame = {
    val sh = shingleSets(docs, n)
    val ex = sh.select(col("doc_id"), col("sh"), explode(col("sh")).as("s"))
    val a = ex.select(col("doc_id").as("a_id"), col("s"), size(col("sh")).as("na"))
    val b = ex.select(col("doc_id").as("b_id"), col("s"), size(col("sh")).as("nb"))
    a.join(b, Seq("s"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  /** MinHash + LSH candidate pairs, verified by exact Jaccard on the shingle
    * sets. With k=128, 32 bands x 4 rows, P(candidate | J=0.8) ~ 1 - (1 -
    * 0.8^4)^32 ~= 1.0, so verified output equals the exact >=minJ pair set.
    * One shuffle to form (band, key) buckets, pairs expanded within buckets,
    * then a join back to shingle sets for verification (candidates only).
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 128, bands: Int = 32,
                      minJ: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    val sh = shingleSets(docs, n)
    // Signature via explode + k codegen'd MIN aggregates (map-side partial
    // min => the shuffle carries one k-wide row per doc) — the scalable shape
    // vs. a per-row interpreted lambda over k x |shingles|.
    val hrows = sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(TextFns.HashP)).as("h"))
    val minCols = (0 until k).map(i =>
      min(pmod(lit(TextFns.minhashA(i)) * col("h") + lit(TextFns.minhashB(i)), lit(TextFns.HashP)))
        .as(s"m$i"))
    val sig = hrows
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
      .withColumn("bandkeys", TextFns.lshBandKeys(col("sig"), bands, rows))
    val buckets = sig
      .select(col("doc_id"), posexplode(col("bandkeys")).as(Seq("band", "key")))
      .groupBy("band", "key")
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val cand = buckets
      .select(explode(pairUp(col("ids"))).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .distinct()
    val withSets = cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
    withSets
      .select(col("a_id"), col("b_id"),
        round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  /** All (a < b) pairs from a sorted id array, as structs. */
  private def pairUp(ids: org.apache.spark.sql.Column) =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids) - i - 1),
        y => struct(x.as("a"), y.as("b")))))

  /** SimHash near-dup pairs: 64-bit simhash, candidates via the 4x16-bit
    * chunk pigeonhole (guarantees recall for hamming <= 3... per chunk
    * equality at least one for hamming <= 3), verified by hamming <= maxHam
    * AND exact Jaccard >= minJ (so the verified output is hash-independent).
    */
  def simhashPairs(docs: DataFrame, n: Int = 3, maxHam: Int = 3, minJ: Double = 0.8,
                   maxBucket: Int = 1000): DataFrame = {
    val sh = shingleSets(docs, n)
    // SimHash via explode + 64 codegen'd SUM aggregates (bit-majority vote),
    // partial aggregation map-side — same scalable shape as MinHash above.
    val trows = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitCols = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"b$j"))
    val counted = trows.groupBy("doc_id").agg(count(lit(1)).as("n"), bitCols: _*)
    val simCol = (0 until 64)
      .map(j => when(col(s"b$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val hashed = counted.select(col("doc_id"), simCol.as("sim"))
    val chunks = hashed.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("ck"))
    val buckets = chunks
      .groupBy(col("ck.chunk"), col("ck.key"))
      .agg(array_sort(collect_set(struct(col("doc_id"), col("sim")))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val cand = buckets
      .select(explode(pairUpStruct(col("members"))).as("p"))
      .select(col("p.a.doc_id").as("a_id"), col("p.b.doc_id").as("b_id"),
        TextFns.hamming(col("p.a.sim"), col("p.b.sim")).as("ham"))
      .filter(col("ham") <= maxHam)
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  private def pairUpStruct(ms: org.apache.spark.sql.Column) =
    flatten(transform(ms, (x, i) =>
      transform(slice(ms, i + lit(2), size(ms) - i - 1),
        y => struct(x.as("a"), y.as("b")))))

  /** Embedding-cosine near-duplicate pairs (a < b, cosine >= minCos).
    * Brute-force pair comparison with the codegen'd dot product; at 100 TB
    * the same verification runs after LSH bucketing (Similarity.lshBuckets)
    * instead of the full cross join.
    */
  def embeddingNearDupPairs(embs: DataFrame, minCos: Double): DataFrame = {
    val withNorm = embs.select(col("vec_id"), col("embedding"),
      VectorFns.norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("b_id"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorFns.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 3).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
