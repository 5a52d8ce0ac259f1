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

  /** Batched top-k: score a whole batch of query vectors in ONE corpus
    * scan — the realistic serving/eval workload (single-query top-k wastes
    * a full scan per query). Queries broadcast; each corpus row scores
    * against every query via the fused codegen cosine; the per-query top-k
    * is a row_number-only window filter, so Catalyst's WindowGroupLimit
    * prunes each map partition to k rows per query BEFORE the shuffle —
    * shuffle volume O(queries·k), independent of corpus size (asserted in
    * PlanQualitySpec). Ties at the rounded score break on vec_id, keeping
    * results deterministic for the oracle.
    */
  def batchTopK(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val ids = queryIds.map(l => l: Any)
    val qs = broadcast(embs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    embs.filter(!col("vec_id").isin(ids: _*))
      .crossJoin(qs)
      .select(col("q_id"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

  /** kNN label vote — the classifier eval built on [[batchTopK]]: each
    * query's k nearest neighbors (exact cosine) vote with their `label`;
    * the majority label (ties broken toward the smaller label — stated
    * identically in the oracle's window) is the prediction, reported next
    * to the query's own label. Scale shape: the O(|queries|·k) neighbor
    * frame broadcasts into ONE streamed pass over the corpus for the label
    * join; the vote aggregate and window are |queries|·|labels|-sized.
    */
  def knnLabelVote(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val ids = queryIds.map(l => l: Any)
    val nn = batchTopK(embs, queryIds, k)
    val votes = broadcast(nn.select("q_id", "vec_id"))
      .join(embs.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(broadcast(embs.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("q_id"), col("label").as("true_label"))), "q_id")
      .select(col("q_id"), col("true_label").cast("bigint").as("true_label"),
        col("label").cast("bigint").as("pred_label"), col("votes"))
      .orderBy("q_id")
  }

  /** Hard-negative mining for contrastive training (the DPR/Contriever
    * recipe): for each query vector, the top-k most-similar corpus vectors
    * with a DIFFERENT label — the maximally-confusable out-of-class
    * examples a contrastive batch wants. Same one-scan broadcast-query
    * shape as [[batchTopK]] with the label-mismatch predicate evaluated
    * before the cosine (cheap int compare gates the fused dot product);
    * WindowGroupLimit keeps the shuffle O(queries·k).
    */
  def hardNegatives(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val ids = queryIds.map(l => l: Any)
    val qs = broadcast(embs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    embs.filter(!col("vec_id").isin(ids: _*))
      .crossJoin(qs)
      .filter(col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"),
        col("label").cast("bigint").as("neg_label"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

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
  def ivfTopK(embs: DataFrame, queryId: Long, k: Int, nprobe: Int = 1): DataFrame =
    ivfSearch(embs, embs, queryId, k, nprobe)

  /** [[ivfTopK]] generalized over the SEARCHED corpus: `corpus` may be a
    * different physical layout of the same vectors — in particular a
    * label-partitioned parquet landing ([[graft.sources.IvfView]]), where
    * the broadcast probe-cluster join prunes whole partition DIRECTORIES
    * at runtime (dynamic partition pruning): the scan never opens the
    * unprobed clusters, which is what makes IVF sub-linear at 100 TB.
    */
  def ivfSearch(corpus: DataFrame, embs: DataFrame, queryId: Long, k: Int,
                nprobe: Int = 1): DataFrame = {
    val cents = centroids(embs)
    val q = broadcast(embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb")))
    // double-precision dot of query (float) against centroid (double)
    val qdot = aggregate(
      zip_with(col("q_emb").cast("array<double>"), col("centroid"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val qn = sqrt(aggregate(transform(col("q_emb").cast("array<double>"), a => a * a), lit(0.0), (acc, x) => acc + x))
    val cn = sqrt(aggregate(transform(col("centroid"), a => a * a), lit(0.0), (acc, x) => acc + x))
    val best = cents.crossJoin(q)
      .select(col("label"), (qdot / (qn * cn)).as("c_sim"))
      .orderBy(col("c_sim").desc, col("label"))
      .limit(nprobe)
      .select(col("label"))
    corpus
      .join(broadcast(best), "label")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .select(col("vec_id"), col("label").cast("bigint").as("label"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN search via multi-table random-hyperplane LSH: scan only the union
    * of the query's buckets across `tables` probe tables. Recall < 1 by
    * construction (quality gate: SimilaritySpec measures recall@k against
    * [[bruteForceTopK]]) — the scale path that trades recall for scanning
    * roughly `tables / 2^nBits` of the corpus. Keys come from the codegen'd
    * [[graft.plans.RhpTableKeys]] single-pass expression.
    */
  def lshTopK(embs: DataFrame, queryId: Long, k: Int, nBits: Int = 4,
              tables: Int = 8, dim: Int = 64): DataFrame = {
    val keyed = embs.select(col("vec_id"), col("embedding"),
      posexplode(VectorFns.rhpKeys(col("embedding"), dim, nBits, tables))
        .as(Seq("tbl", "key")))
    val qk = keyed.filter(col("vec_id") === queryId)
      .select(col("tbl"), col("key"), col("embedding").as("q_emb"))
    keyed
      .join(broadcast(qk), Seq("tbl", "key"))
      .filter(col("vec_id") =!= queryId)
      // a vector matching the query in several tables appears once per table
      .dropDuplicates("vec_id")
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Cosine range search: every (query, corpus) pair at or above `minSim` —
    * the radius-query twin of [[batchTopK]] (dedup thresholding, recall
    * evaluation, near-duplicate retrieval all want "everything within a
    * radius", not a fixed k). Same scale shape: queries broadcast, ONE
    * corpus scan with the fused codegen cosine, and because the predicate is
    * a plain filter the output shuffle is only the qualifying pairs — no
    * window, no sort until the final (small) result ordering.
    */
  def rangeSearch(embs: DataFrame, queryIds: Seq[Long], minSim: Double): DataFrame = {
    val ids = queryIds.map(l => l: Any)
    val qs = broadcast(embs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    embs.filter(!col("vec_id").isin(ids: _*))
      .crossJoin(qs)
      .select(col("q_id"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
      .orderBy("q_id", "vec_id")
  }

  /** K-means ASSIGNMENT step (the E-step of distributed k-means, and the
    * IVF index-build assignment): each vector goes to its nearest centroid
    * by squared euclidean distance; returns per-cluster sizes and inertia
    * (within-cluster sum of squares). Centroids are a tiny broadcast frame;
    * the corpus is scanned once; argmin is a (dist², label) struct-min —
    * an ordinary partial+final aggregate, no window. Iterating this with
    * [[centroids]] on the assignment IS Lloyd's algorithm at scale.
    */
  def kmeansAssign(embs: DataFrame, cents: DataFrame): DataFrame =
    assignVectors(embs, cents)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_assigned"), round(sum(col("d2")), 3).as("inertia"))

  /** Per-vector nearest-centroid rows (vec_id, cluster, d2) — the E-step
    * detail [[kmeansAssign]] rolls up and [[kmeansUpdate]] regroups on.
    */
  def assignVectors(embs: DataFrame, cents: DataFrame): DataFrame = {
    // Codegen'd E-step kernel (guide §4): the previous
    // aggregate(zip_with(...)) form is CodegenFallback — an interpreted
    // per-element closure plus a materialized intermediate array for every
    // (vector, centroid) pair on the corpus × k hot path. FloatDoubleSqDist
    // is bit-identical (same element order, same (a−b)² left-to-right
    // double fold — see its scaladoc).
    val dist2 = graft.plans.VectorExpressions.floatSqDist(
      col("embedding"), col("centroid"))
    embs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents.select(col("label").as("c_label"), col("centroid"))))
      .select(col("vec_id"), col("c_label"), dist2.as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("best.c_label").as("cluster"), col("best.d2").as("d2"))
  }

  /** K-means UPDATE step (the M-step): recompute each cluster's centroid as
    * the mean of its assigned vectors, reporting cluster size, the new
    * centroid's norm, and its drift from the seed centroid. Assignment +
    * component-mean are both plain partial+final aggregates keyed on
    * (cluster, component) — E then M is two shuffles per Lloyd iteration
    * regardless of corpus size, and the per-cluster output is O(k·dim).
    */
  def kmeansUpdate(embs: DataFrame, cents: DataFrame): DataFrame = {
    val assign = assignVectors(embs, cents).select("vec_id", "cluster")
    val sizes = assign.groupBy("cluster").agg(count(lit(1)).as("n_assigned"))
    val comp = embs
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .join(assign, "vec_id")
      .groupBy("cluster", "i")
      .agg(avg(col("x")).as("ux"))
    val old = cents.select(col("label").as("cluster"),
      posexplode(col("centroid")).as(Seq("i", "cx")))
    comp.join(old, Seq("cluster", "i"))
      .groupBy("cluster")
      .agg(round(sqrt(sum(col("ux") * col("ux"))), 3).as("norm"),
        round(sqrt(sum((col("ux") - col("cx")) * (col("ux") - col("cx")))), 3).as("drift"))
      .join(sizes, "cluster")
      .select(col("cluster"), col("n_assigned"), col("norm"), col("drift"))
  }

  /** Embedding-norm health report per label: min/mean/max L2 norm and the
    * count of near-zero vectors — the first sanity gate on an embedding
    * table (norm collapse, dead encoder outputs, un-normalized mixtures
    * all show up here before any similarity search is trustworthy).
    * Per-row norm is a sequential-order array fold (deterministic); the
    * per-label stats round at 3 over selections and one mean.
    */
  def normStats(embs: DataFrame, nearZero: Double = 1e-3): DataFrame = {
    val norm = sqrt(aggregate(col("embedding").cast("array<double>"),
      lit(0.0), (acc, x) => acc + x * x))
    embs.select(col("label"), norm.as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(min(col("nrm")), 3).as("min_norm"),
        round(avg(col("nrm")), 3).as("mean_norm"),
        round(max(col("nrm")), 3).as("max_norm"),
        count_if(col("nrm") < nearZero).as("n_near_zero"))
      .orderBy("label")
  }

  /** Product-quantization encode: split each vector into dim/subDim
    * contiguous subspaces, quantize each subvector to its nearest
    * label-seeded sub-codebook entry (the PQ compression step of a
    * disk-resident ANN index — the vector-quantization companion to SQ8's
    * scalar path in [[quantizeSq8]]). Emits the per-(subspace, code)
    * population and sum of squared quantization error — the codebook-health
    * report (dead codes, unbalanced cells, distortion per subspace).
    *
    * Scale shape: component rows fan out only against the BROADCAST
    * sub-codebook (k·dim rows), then two keyed aggregates — the same
    * two-shuffle E-step shape as [[kmeansAssign]], O(vectors·dim·k)
    * compute with nothing resident but the codebook. Argmin tie-break is
    * the (d2, label) struct order on both engines.
    */
  def pqEncode(embs: DataFrame, subDim: Int = 16): DataFrame = {
    require(subDim > 0, "subDim must be positive")
    val ex = embs.select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"),
        (col("i") / subDim).cast("bigint").as("ss"), col("i"), col("x"))
    val cents = ex.groupBy(col("label").as("c_label"), col("ss"), col("i"))
      .agg(avg(col("x")).as("cx"))
    val d2 = ex.join(broadcast(cents), Seq("ss", "i"))
      .groupBy(col("vec_id"), col("ss"), col("c_label"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
    d2.groupBy("vec_id", "ss")
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("ss"),
        col("best.c_label").as("code"), col("best.d2").as("err"))
      .groupBy("ss", "code")
      .agg(count(lit(1)).as("n_vecs"), round(sum(col("err")), 3).as("sse"))
      .orderBy("ss", "code")
  }

  /** Per-vector PQ code assignment — the storage half of [[pqEncode]]
    * (which rolls the same assignment up to codebook occupancy/SSE):
    * (vec_id, ss, code) with one row per subspace. Same two-shuffle E-step
    * shape; the label-seeded sub-codebooks are tiny and broadcast.
    */
  def pqCodes(embs: DataFrame, subDim: Int = 16): DataFrame = {
    require(subDim > 0, "subDim must be positive")
    val ex = embs.select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"),
        (col("i") / subDim).cast("bigint").as("ss"), col("i"), col("x"))
    val cents = ex.groupBy(col("label").as("c_label"), col("ss"), col("i"))
      .agg(avg(col("x")).as("cx"))
    ex.join(broadcast(cents), Seq("ss", "i"))
      .groupBy(col("vec_id"), col("ss"), col("c_label"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
      .groupBy("vec_id", "ss")
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("ss"), col("best.c_label").as("code"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes — how an IVFPQ index
    * actually serves queries: the query stays EXACT while the corpus is
    * represented by its per-subspace codes, so per query the scan touches
    * only a (subspaces × codebook) distance table plus one integer code
    * lookup per (vector, subspace) — never the raw corpus vectors.
    *
    * Plan shape: the distance table dt(ss, code) = Σ_i∈ss (q_i − c_i)² is
    * a codebook-sized aggregate joined against the query's exploded
    * components — O(k·dim) rows, broadcast; the corpus-side cost is one
    * equi-join of the code table with dt and a groupBy(vec_id), both keyed
    * without touching the embedding column. At 100 TB the code table is
    * ~dim/subDim bytes per vector instead of 4·dim — the whole point of PQ.
    * Approximation quality is the (documented) PQ tradeoff; the oracle
    * replays the SAME quantized pipeline, so the gate is exact.
    */
  def pqAdcTopK(embs: DataFrame, queryId: Long, k: Int, subDim: Int = 16): DataFrame = {
    val ex = embs.select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"),
        (col("i") / subDim).cast("bigint").as("ss"), col("i"), col("x"))
    val cents = ex.groupBy(col("label").as("c_label"), col("ss"), col("i"))
      .agg(avg(col("x")).as("cx"))
    val dt = ex.filter(col("vec_id") === queryId)
      .join(broadcast(cents), Seq("ss", "i"))
      .groupBy(col("ss"), col("c_label").as("code"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("dq"))
    pqCodes(embs, subDim)
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(dt), Seq("ss", "code"))
      .groupBy("vec_id")
      .agg(round(sum(col("dq")), 3).as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(k)
  }

  /** IVF+PQ serving path — the full production ANN read, composed from
    * the two halves this inventory gates separately ([[ivfSearch]]'s
    * coarse probe + partition pruning, [[pqAdcTopK]]'s asymmetric-distance
    * scoring): route the query to its `nprobe` nearest coarse cells,
    * prune the label-partitioned layout to those directories (the
    * broadcast probe join → dynamic partition pruning, as
    * sim_ivf_partitioned proves at the metric level), then rank the
    * surviving candidates by PQ asymmetric distance — candidate vectors
    * are ENCODED (global sub-codebooks, trained offline in production)
    * and scored through a broadcast (subspace × codebook) distance
    * table.
    *
    * The 100 TB cost model this composes: scan ~nprobe/cells of the
    * corpus (IVF), at ~dim/subDim bytes per scanned vector (PQ codes,
    * never raw floats at scoring time), query-side work O(dim × codebook)
    * — the memory/IO budget every production vector store (FAISS-style
    * IVFPQ) runs on. Returns (vec_id, label, adc_d2) ascending.
    */
  def ivfPqSearch(corpus: DataFrame, embs: DataFrame, queryId: Long, k: Int,
                  nprobe: Int = 2, subDim: Int = 16): DataFrame = {
    // coarse probe: identical device to ivfSearch (nprobe nearest
    // centroids by cosine, ties on label)
    val cents = centroids(embs)
    val q = broadcast(embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb")))
    val qdot = aggregate(
      zip_with(col("q_emb").cast("array<double>"), col("centroid"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val qn = sqrt(aggregate(transform(col("q_emb").cast("array<double>"), a => a * a),
      lit(0.0), (acc, x) => acc + x))
    val cn = sqrt(aggregate(transform(col("centroid"), a => a * a),
      lit(0.0), (acc, x) => acc + x))
    val best = cents.crossJoin(q)
      .select(col("label"), (qdot / (qn * cn)).as("c_sim"))
      .orderBy(col("c_sim").desc, col("label"))
      .limit(nprobe)
      .select(col("label"))
    // GLOBAL sub-codebooks + the query's ADC distance table (codebook
    // training is corpus-wide and offline; only the PROBE is per-query)
    val ex = embs.select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"),
        (col("i") / subDim).cast("bigint").as("ss"), col("i"), col("x"))
    val subCents = ex.groupBy(col("label").as("c_label"), col("ss"), col("i"))
      .agg(avg(col("x")).as("cx"))
    val dt = ex.filter(col("vec_id") === queryId)
      .join(broadcast(subCents), Seq("ss", "i"))
      .groupBy(col("ss"), col("c_label").as("code"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("dq"))
    // candidates: ONLY the probed partitions of the layout are opened;
    // encode them against the global codebooks and score via dt
    val cand = corpus.join(broadcast(best), "label")
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"),
        (col("i") / subDim).cast("bigint").as("ss"), col("i"), col("x"))
    cand.join(broadcast(subCents), Seq("ss", "i"))
      .groupBy(col("vec_id"), col("label"), col("ss"), col("c_label"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
      .groupBy("vec_id", "label", "ss")
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("label"), col("ss"), col("best.c_label").as("code"))
      .join(broadcast(dt), Seq("ss", "code"))
      .groupBy("vec_id", "label")
      .agg(round(sum(col("dq")), 3).as("adc_d2"))
      .select(col("vec_id"), col("label").cast("bigint").as("label"), col("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(k)
  }

  /** Single-table RHP bucket key (compat/spec surface over
    * [[VectorFns.rhpKeys]]): sign bits of dot products with deterministic
    * pseudo-random hyperplanes. Vectors of any dimension hash (planes are
    * sized by `dim`; shorter vectors hash their prefix).
    */
  def rhpBucket(embs: DataFrame, nBits: Int, table: Int, dim: Int = 64): DataFrame =
    embs.withColumn("bucket",
      element_at(VectorFns.rhpKeys(col("embedding"), dim, nBits, tables = 1, firstTable = table), 1))

  /** Maximum-inner-product top-k (MIPS): rank by RAW dot product, not
    * cosine — the retrieval objective when magnitudes carry signal
    * (popularity-weighted item embeddings, un-normalized two-tower
    * outputs). Same scale shape as [[bruteForceTopK]]: broadcast query,
    * one corpus scan with the codegen dot, TakeOrderedAndProject.
    *
    * Scale note: MIPS is NOT a metric (no triangle inequality), so the
    * LSH/IVF pruning used for cosine does not transfer directly; the
    * standard reduction augments each corpus vector with
    * sqrt(M² − ‖x‖²) (M = max norm) making inner-product order equal
    * cosine order in d+1 dims — after which [[lshTopK]]/[[ivfTopK]] apply
    * unchanged. That augmentation is one extra projected column at scan
    * time; the brute ranking here is the oracle anchor for it.
    */
  def mipsTopK(embs: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFns.dot(col("embedding"), col("q_emb")), 3).as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)
  }

  /** Batched IVF top-k: route EVERY query to its `nprobe` nearest
    * centroids, then score each query only against its probed clusters —
    * the serving/eval workload shape ([[batchTopK]]'s one-scan economics
    * applied to the routed search). The probe table is O(queries·nprobe)
    * and broadcasts INTO the corpus scan, so each corpus row joins only
    * the queries that probed its cluster; per-query top-k is the same
    * map-side WindowGroupLimit prune as [[batchTopK]].
    */
  def ivfBatchTopK(embs: DataFrame, queryIds: Seq[Long], k: Int,
                   nprobe: Int = 1): DataFrame = {
    val ids = queryIds.map(l => l: Any)
    val cents = centroids(embs)
    val qs = broadcast(embs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val qdot = aggregate(
      zip_with(col("q_emb").cast("array<double>"), col("centroid"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val qn = sqrt(aggregate(transform(col("q_emb").cast("array<double>"), a => a * a),
      lit(0.0), (acc, x) => acc + x))
    val cn = sqrt(aggregate(transform(col("centroid"), a => a * a),
      lit(0.0), (acc, x) => acc + x))
    val wRoute = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("c_sim").desc, col("label"))
    val probes = cents.crossJoin(qs)
      .select(col("q_id"), col("label"), (qdot / (qn * cn)).as("c_sim"))
      .withColumn("rn", row_number().over(wRoute))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("label"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    embs.filter(!col("vec_id").isin(ids: _*))
      .join(broadcast(probes), "label")
      .join(qs, "q_id")
      .select(col("q_id"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

  /** MMR (maximal marginal relevance) diversity re-ranking: from the
    * top-`pool` candidates by cosine relevance to `queryId`'s vector,
    * greedily select `k` results maximizing
    * lambda·rel − (1−lambda)·max-sim-to-already-selected, with lambda
    * given in exact tenths (lambdaTenths/10) so every score is a BIGINT:
    * score10_e6 = lambdaTenths·rel_e6 − (10−lambdaTenths)·maxsim_e6.
    * Returns (round, vec_id, score10_e6), round = selection order.
    *
    * Scale shape: the ONLY corpus-sized pass is candidate selection
    * (orderBy.limit = distributed top-k); the pairwise sim table and every
    * greedy round run on <= pool-row frames, each round's winner a 1-row
    * aggregate broadcast back (the k-means-centroid loop pattern — no
    * driver collect).
    *
    * Latency note: greedy MMR is inherently k SEQUENTIAL rounds = k Spark
    * job launches, so at interactive scale the job-launch overhead — not
    * data volume — dominates wall time (every round frame is pool-sized).
    * For latency-critical serving, run the greedy loop on the pool
    * locally after the distributed top-k; the distributed form here is
    * the batch/offline shape.
    */
  def mmrRerank(embs: DataFrame, queryId: Long, pool: Int, k: Int,
                lambdaTenths: Int): DataFrame = {
    require(lambdaTenths >= 0 && lambdaTenths <= 10, s"bad lambda $lambdaTenths")
    import org.apache.spark.sql.Column
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def cosE6(a: Column, b: Column): Column =
      round(ddot(a, b) / (sqrt(ddot(a, a)) * sqrt(ddot(b, b))) * lit(1e6))
        .cast("long")
    val e = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = broadcast(e.filter(col("vec_id") === queryId).select(col("e").as("qe")))
    val rel = e.filter(col("vec_id") =!= queryId).crossJoin(q)
      .select(col("vec_id"), col("e"), cosE6(col("e"), col("qe")).as("rel_e6"))
    // materialize the candidates WITH their vectors: the pairwise-sim
    // build and every greedy round then run off the pool-sized checkpoint
    // — deriving the pair sides from the lazy top-k instead would
    // re-execute the corpus relevance scan once per side
    val candV = Dedup.materialize(
      rel.orderBy(col("rel_e6").desc, col("vec_id")).limit(pool))
    val candM = candV.select("vec_id", "rel_e6")
    val ca = candV.select(col("vec_id").as("a_id"), col("e").as("ea"))
    val cb = candV.select(col("vec_id").as("b_id"), col("e").as("eb"))
    val pairsM = Dedup.materialize(
      ca.join(cb, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          cosE6(col("ea"), col("eb")).as("sim_e6")))
    val lam = lambdaTenths.toLong
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val scored =
        if (selected == null)
          candM.select(col("vec_id"), (lit(lam) * col("rel_e6")).as("score10_e6"))
        else {
          val selIds = broadcast(selected.select(col("vec_id").as("sid")))
          val ms = pairsM.join(selIds, col("b_id") === col("sid"))
            .groupBy("a_id").agg(max(col("sim_e6")).as("maxsim"))
          candM.join(selIds, col("vec_id") === col("sid"), "left_anti")
            .join(ms.select(col("a_id").as("vec_id"), col("maxsim")),
              Seq("vec_id"), "left")
            .select(col("vec_id"),
              (lit(lam) * col("rel_e6") -
                lit(10L - lam) * coalesce(col("maxsim"), lit(0L))).as("score10_e6"))
        }
      val win = scored
        .agg(min(struct((-col("score10_e6")).as("ns"),
          col("vec_id").as("v"))).as("b"))
        .select(lit(r).as("round"), col("b.v").as("vec_id"),
          (-col("b.ns")).as("score10_e6"))
        // a pool smaller than k exhausts before the last round — the
        // aggregate then yields one all-null row; drop it so the result
        // simply ends early (the BPE merge-table convention) instead of
        // emitting null-id rounds
        .filter(col("vec_id").isNotNull)
      val next = Dedup.materialize(
        if (selected == null) win else selected.unionAll(win))
      if (selected != null) Dedup.release(selected)
      selected = next
    }
    selected
  }

  /** Greedy k-center coreset (farthest-point sampling) — the diversity
    * selection primitive behind coreset construction, k-means++-style
    * seeding, and embedding-space data pruning: starting from `seedId`,
    * each round adds the point FARTHEST (max cosine distance, 1e6 − cos·1e6
    * integer units) from everything selected so far, and reports that
    * distance — the coverage radius, the k-center objective value, which
    * is what a data-pruning run reads to decide when additional selections
    * stop buying diversity.
    *
    * Scale shape: the classic running-min formulation — ONE corpus-resident
    * (vec_id, vector, min-dist) frame, and each round joins it against the
    * single broadcast 1-row new center (never against the whole selected
    * set), so k rounds cost k narrow corpus passes with O(1) broadcast
    * each, no pairwise table, no driver collect. Latency at interactive
    * scale is the k job launches, not data volume (the mmrRerank note).
    * Determinism: distances are e6-quantized integers; argmax ties break
    * to the smaller vec_id via the (mind, −id) struct max.
    */
  def kCenterCoreset(embs: DataFrame, k: Int, seedId: Long = 0L): DataFrame = {
    require(k >= 2, s"bad k $k")
    import org.apache.spark.sql.Column
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def distE6(a: Column, b: Column): Column =
      lit(1000000L) - round(ddot(a, b) / (sqrt(ddot(a, a)) * sqrt(ddot(b, b)))
        * lit(1e6)).cast("long")
    val e = Dedup.materialize(
      embs.select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
    val seed = broadcast(e.filter(col("vec_id") === seedId)
      .select(col("e").as("ce")))
    var state = Dedup.materialize(
      e.filter(col("vec_id") =!= seedId).crossJoin(seed)
        .select(col("vec_id"), col("e"), distE6(col("e"), col("ce")).as("mind_e6")))
    var out = Dedup.materialize(
      e.filter(col("vec_id") === seedId)
        .select(lit(1).as("round"), col("vec_id"), lit(0L).as("radius_e6")))
    for (r <- 2 to k) {
      val pick = state
        .agg(max(struct(col("mind_e6").as("m"), (-col("vec_id")).as("n"))).as("b"))
        .select((-col("b.n")).as("pid"), col("b.m").as("radius_e6"))
      val pickV = broadcast(pick.join(e, col("pid") === col("vec_id"))
        .select(col("pid"), col("radius_e6"), col("e").as("ce")))
      // out rows must outlive this round's state release — materialize the
      // union before the old frames go away
      val nextOut = Dedup.materialize(out.unionAll(
        pickV.select(lit(r).as("round"), col("pid").as("vec_id"),
          col("radius_e6"))))
      Dedup.release(out); out = nextOut
      val nextState = Dedup.materialize(
        state.crossJoin(broadcast(pickV.select(col("pid"), col("ce"))))
          .filter(col("vec_id") =!= col("pid"))
          .select(col("vec_id"), col("e"),
            least(col("mind_e6"), distE6(col("e"), col("ce"))).as("mind_e6")))
      Dedup.release(state); state = nextState
    }
    Dedup.release(state); Dedup.release(e)
    out
  }

  /** Upper-triangle Gram matrix of the embedding column as (i, j, g_e8)
    * rows, i <= j, via the single-pass d²/2 mutable-buffer accumulator
    * ([[graft.functions.Aggregators.gramUpper]] — each product quantized
    * to an e8 BIGINT before the EXACT integer sum, so the matrix is
    * bit-identical across engines and across partition orders). The one
    * corpus scan every downstream spectral consumer shares: sim_gram_matrix
    * reports it, sim_power_iteration iterates on it.
    */
  def gramUpperFrame(embs: DataFrame, dim: Int = 64): DataFrame = {
    import embs.sparkSession.implicits._
    val g = embs
      .agg(udaf(graft.functions.Aggregators.gramUpper(dim),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
        .apply(col("embedding")).as("g"))
    val idxMap = (0 until dim).flatMap(i => (i until dim).map(j =>
        (i.toLong * dim - i.toLong * (i - 1) / 2 + (j - i), i.toLong, j.toLong)))
      .toDF("idx", "i", "j")
    g.select(posexplode(col("g")).as(Seq("idx", "g_e8")))
      .select(col("idx").cast("long").as("idx"), col("g_e8"))
      .join(broadcast(idxMap), "idx")
      .select(col("i"), col("j"), col("g_e8"))
  }

  /** Cluster-blocked kNN-graph construction: every vector's top-k cosine
    * neighbors WITHIN its coarse cluster, as directed (a_id, b_id) adjacency
    * rows — the neighborhood structure graph-based curation builds once and
    * reuses (mutual-kNN dedup clusters, diversity sampling, label
    * propagation over embeddings).
    *
    * Scale posture: the global all-pairs square is never formed. Vectors are
    * assigned to their nearest label-mean centroid (the IVF coarse
    * quantizer, a broadcast-sized frame), and the pair square is built
    * per-cluster via a shuffle on the cluster key — Σ n_c² work instead of
    * n², the standard blocked-kNN regime (each block's square fits one
    * executor when the quantizer is sized so n_c ~ n/C with C ~ sqrt(n)).
    * The per-a_id top-k is a row_number-only window, so WindowGroupLimit
    * prunes each partition to k rows per vector before the final shuffle.
    * Recall vs the exact global kNN graph is the IVF recall at nprobe=1;
    * raising it is a candidate-union (probe 2 cells), not a new operator.
    */
  def knnGraph(embs: DataFrame, k: Int): DataFrame = {
    // Norms projected ONCE per vector before the per-cluster pair square,
    // so the Σ n_c² join runs the dot-only kernel: round(dot/(na·nb), 3)
    // is bit-identical to the fused cosine (same element order, same
    // sqrt-then-multiply) at a third of the per-pair flops — the norm
    // column rides the existing shuffle (8 bytes next to a 256-byte
    // vector).
    val assigned = assignVectors(embs, centroids(embs))
      .join(embs.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("cluster"), col("vec_id"), col("embedding"),
        sqrt(VectorFns.dot(col("embedding"), col("embedding"))).as("nrm"))
    val left = assigned
      .select(col("cluster"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val right = assigned
      .select(col("cluster").as("b_cluster"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("cos_sim").desc, col("b_id"))
    left.join(right,
        col("cluster") === col("b_cluster") && col("a_id") =!= col("b_id"))
      .select(col("cluster"), col("a_id"), col("b_id"),
        round(VectorFns.dot(col("a_emb"), col("b_emb"))
          / (col("a_nrm") * col("b_nrm")), 3).as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), col("cluster"), col("cos_sim"), col("rn"))
  }

  /** 1-bit (sign) binary quantization of the embedding column: bit j of the
    * 64-bit signature is set iff component j >= 0 — 64x compression of a
    * 64-dim float vector into one BIGINT. The memory tier of a two-stage
    * serving stack: hamming distance on signatures approximates angle
    * (each sign bit is an axis-aligned random-hyperplane bit), and only
    * the few hamming survivors ever re-read the full float vector.
    */
  def bqSignatures(embs: DataFrame, dim: Int = 64): DataFrame = {
    // get() (not getItem) so vectors shorter than `dim` pack 0 bits past
    // their length instead of an ANSI out-of-bounds error
    val sig = (0 until dim)
      .map(j => when(get(col("embedding"), lit(j)) >= 0f, lit(1L << j))
        .otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    embs.select(col("vec_id"), sig.as("sig"))
  }

  /** Two-stage binary-quantized top-k: stage 1 scans ONLY the 8-byte
    * signatures (hamming = codegen'd bit_count(xor), ties broken on
    * vec_id) and keeps `cand` candidates per query via a row_number-only
    * window (WindowGroupLimit prunes map-side, shuffle O(queries*cand));
    * stage 2 re-reads full vectors for just those candidates and reranks
    * by exact cosine. At 100 TB the signature table is the only full scan
    * — 1/64th the bytes of the float corpus — and the float fetch is a
    * cand-bounded semi-join against the (bucketed) vector store.
    */
  def bqRerank(embs: DataFrame, queryIds: Seq[Long], cand: Int, k: Int): DataFrame = {
    val ids = queryIds.map(l => l: Any)
    val sigs = bqSignatures(embs)
    val qsig = broadcast(sigs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig")))
    val wH = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("ham"), col("vec_id"))
    val cands = sigs.filter(!col("vec_id").isin(ids: _*))
      .crossJoin(qsig)
      .select(col("q_id"), col("vec_id"),
        graft.functions.TextFns.hamming(col("sig"), col("q_sig"))
          .cast("int").as("ham"))
      .withColumn("hrn", row_number().over(wH))
      .filter(col("hrn") <= cand)
    val qemb = broadcast(embs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val wC = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    cands.join(embs.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(qemb, Seq("q_id"))
      .select(col("q_id"), col("vec_id"), col("ham"),
        round(VectorFns.cosine(col("embedding"), col("q_emb")), 3).as("cos_sim"))
      .withColumn("rn", row_number().over(wC).cast("int"))
      .filter(col("rn") <= k)
  }

  /** Mutual-kNN edge list from [[knnGraph]]: undirected (a_id < b_id) pairs
    * where EACH endpoint ranks the other inside its top-k — the
    * high-precision edge set near-dup clustering feeds to connected
    * components (one-sided kNN edges attach hubs to everything; mutuality
    * is the classical pruning). Self-join of the adjacency on the swapped
    * key pair; both sides are the same O(n·k) frame, so the join is
    * k-bounded, never quadratic.
    */
  def knnMutualEdges(embs: DataFrame, k: Int): DataFrame = {
    val g = knnGraph(embs, k)
    val fwd = g.filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("cos_sim"))
    val bwd = g.filter(col("a_id") > col("b_id"))
      .select(col("b_id").as("a_id"), col("a_id").as("b_id"))
    fwd.join(bwd, Seq("a_id", "b_id"), "left_semi")
      .orderBy("a_id", "b_id")
  }
}
