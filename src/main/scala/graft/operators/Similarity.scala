package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Scale design (100 TB): the query side is always tiny — broadcast it; the
  * corpus side is scanned once with the codegen'd dot product and reduced via
  * top-k (`TakeOrderedAndProject`, partial per-partition top-k then a single
  * driver merge — no full sort, no shuffle of the corpus). The IVF variant
  * prunes the scan to the nearest coarse cluster(s); cluster assignment comes
  * from the `label` column (a pre-trained coarse quantizer stand-in);
  * centroids are a tiny aggregate that is broadcast back.
  */
object Similarity {

  /** Exact brute-force cosine top-k against a single query vector (row
    * `queryId` of the same table). One corpus scan + TakeOrderedAndProject.
    */
  def bruteForceTopK(embs: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-cluster mean centroids from the coarse-quantizer `label` column:
    * (label, centroid array<double>). posexplode + two-level aggregate keeps
    * the shuffle O(clusters x dim).
    */
  def centroids(embs: DataFrame): DataFrame =
    embs
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(avg(col("x")).as("cx"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("cx")))), s => s.getField("cx"))
        .as("centroid"))

  /** IVF-style top-k: route the query to its `nprobe` nearest centroids by
    * cosine, then exact-search only those clusters. The probed partitions are
    * the only data scanned — the 100 TB path when clusters are storage-
    * partitioned by label.
    */
  def ivfTopK(embs: DataFrame, queryId: Long, k: Int, nprobe: Int = 1): DataFrame = {
    val cents = centroids(embs)
    val q = embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    // double-precision dot of query (float) against centroid (double)
    val qdot = aggregate(
      zip_with(col("q_emb").cast("array<double>"), col("centroid"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val qn = sqrt(aggregate(transform(col("q_emb").cast("array<double>"), a => a * a), lit(0.0), (acc, x) => acc + x))
    val cn = sqrt(aggregate(transform(col("centroid"), a => a * a), lit(0.0), (acc, x) => acc + x))
    val best = cents.crossJoin(broadcast(q))
      .select(col("label"), (qdot / (qn * cn)).as("c_sim"))
      .orderBy(col("c_sim").desc, col("label"))
      .limit(nprobe)
      .select(col("label"))
    embs
      .join(broadcast(best), "label")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(embs.filter(col("vec_id") === queryId)
        .select(col("embedding").as("q_emb"))))
      .select(col("vec_id"), col("label").cast("bigint").as("label"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN search via random-hyperplane LSH: restrict the exact scan to the
    * query's bucket (one probe table). Recall < 1 by construction — the
    * scale path that trades recall for scanning |corpus| / 2^nBits.
    */
  def lshTopK(embs: DataFrame, queryId: Long, k: Int, nBits: Int = 4): DataFrame = {
    val bucketed = rhpBucket(embs, nBits, table = 0)
    val qb = bucketed.filter(col("vec_id") === queryId)
      .select(col("bucket"), col("embedding").as("q_emb"))
    bucketed
      .join(broadcast(qb), "bucket")
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Random-hyperplane LSH bucket key (sign bits of dot products with
    * deterministic pseudo-random hyperplanes) — the candidate-generation
    * stage for embedding near-dup at scale. nBits sign bits -> one bigint
    * bucket id per probe table.
    */
  def rhpBucket(embs: DataFrame, nBits: Int, table: Int): DataFrame = {
    val dim = 64
    val planes: Seq[Seq[Double]] = (0 until nBits).map { b =>
      (0 until dim).map { d =>
        // deterministic pseudo-random in [-1, 1): splitmix-style integer mix
        val z = ((table * 1000003L + b * 7919L + d) * 0x9E3779B97F4A7C15L)
        val m = (z ^ (z >>> 31)) & ((1L << 53) - 1)
        m.toDouble / (1L << 52) - 1.0
      }
    }
    val bucket = (0 until nBits).map { b =>
      val d = aggregate(
        zip_with(col("embedding").cast("array<double>"),
          array(planes(b).map(lit): _*), (x, p) => x * p),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    embs.withColumn("bucket", bucket)
  }
}
