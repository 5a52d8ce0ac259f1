package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the physical-plan properties the 100 TB design depends on — if a
  * refactor breaks pushdown, broadcast choice, top-k, or partial
  * aggregation, these fail even though results stay correct.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("top-k compiles to TakeOrderedAndProject (no full sort)") {
    assert(plan("rel_topk").contains("TakeOrderedAndProject"))
  }

  test("dimension joins are broadcast-hash") {
    assert(plan("rel_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("rel_join_q5").contains("BroadcastHashJoin"))
  }

  test("filters and projection push into the parquet scan") {
    val p = plan("rel_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,40.0)"))
    assert(p.contains("ReadSchema:") && !p.contains("l_comment"))
  }

  test("attribution runs on ONE user-keyed window shuffle (no self-join)") {
    // The conditional-frame formulation must not degrade into a
    // conversions×events join: exactly one hashpartitioning exchange (the
    // user_id window), zero join nodes.
    val p = plan("ts_attribution")
    assert(p.split("hashpartitioning").length == 2, p)
    assert(!p.contains("Join"), p)
  }

  test("Q19's disjunctive predicate splits and pushes into BOTH scans") {
    // OR-of-ANDs mixing both sides: Catalyst must derive each side's
    // projected disjunction and push it to the parquet reader — the brand/
    // size OR lands in the part scan, the quantity OR in the lineitem scan,
    // and only the mixed residual stays in the join condition. At 100 TB
    // this is the difference between scanning 3 brands and scanning all 25.
    val p = plan("rel_join_q19")
    assert(p.contains("EqualTo(p_brand,Brand#1)") && p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)"))
  }

  test("aggregations run partial (map-side) before the shuffle") {
    assert(plan("rel_agg_q1").contains("partial_"))
    assert(plan("tx_wordcount").contains("partial_count"))
  }

  test("per-group top-k prunes map-side via partial WindowGroupLimit") {
    val p = plan("win_group_topk")
    // Partial mode runs before the shuffle (map-side k-per-group prune),
    // Final after — shuffle volume is O(groups·k), not O(rows).
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial") && p.contains("Final"), p)
  }

  test("batched similarity top-k prunes map-side per query") {
    val p = plan("sim_batch_topk")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("float_cosine"), p)
  }

  test("native asof join propagates partitioning: downstream key-agg adds no exchange") {
    import org.apache.spark.sql.functions.{col, count, lit}
    import graft.operators.AsofJoin
    val ev = Tables.t(spark, sf, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    val p = AsofJoin.asofNative(l, r, "user_id", "c_user_id", "ts", "cts")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    // AsofJoinExec.outputPartitioning = left child's hash(user_id), so the
    // groupBy reuses it: exactly the join's two exchanges, none for the agg
    assert(p.linesIterator.count(_.contains("Exchange")) == 2, p)
  }

  test("left-side filters push through the native asof join into the scan") {
    import org.apache.spark.sql.functions.col
    import graft.operators.AsofJoin
    val ev = Tables.t(spark, sf, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    val p = AsofJoin.asofNative(l, r, "user_id", "c_user_id", "ts", "cts")
      .filter(col("event_id") < 100) // above the custom node
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // PushFilterThroughAsofJoin moved it below; FileSourceStrategy then
    // carried it into the parquet scan
    assert(p.contains("LessThan(event_id,100)"), p)
  }

  test("minhash signature is a codegen partial_min battery, not ObjectHashAggregate") {
    // The full query materializes this stage eagerly (localCheckpoint), so
    // assert the aggregate shape on the signature pipeline itself: 128 min
    // aggregates must stay in codegen HashAggregate with map-side partials —
    // mixing in a collect-based agg would silently demote the whole corpus
    // aggregation to interpreted ObjectHashAggregate.
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val hrows = graft.operators.Dedup.shingleHashRows(Tables.t(spark, sf, "documents"), 3)
      .select(col("doc_id"), pmod(col("hraw"), lit(TextFns.HashP)).as("h"))
    val minCols = (0 until 128).map(i =>
      min(pmod(lit(TextFns.minhashA(i)) * col("h") + lit(TextFns.minhashB(i)), lit(TextFns.HashP)))
        .as(s"m$i"))
    val p = hrows.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("partial_min"))
    assert(!p.contains("ObjectHashAggregate"))
  }

  test("similarity scan uses the native cosine expression, broadcast query") {
    val p = plan("sim_topk_bruteforce")
    assert(p.contains("float_cosine"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("embedding LSH keys compute in ONE rhp_table_keys pass, cosine short-circuits after id test") {
    // the key stage is materialized (localCheckpoint) inside the full query,
    // so assert the expression on the key pipeline itself (as the minhash
    // battery test does): ONE projection evaluates all 8 probe tables
    import org.apache.spark.sql.functions.col
    val keyed = Tables.t(spark, sf, "embeddings")
      .select(graft.functions.VectorFns.rhpKeys(col("embedding"), 64, 16, 8).as("keys"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(keyed.contains("rhp_table_keys"))
    // verification joins are UNHINTED equi-joins (r13: the candidate side
    // grows faster than the corpus — pinning it as broadcast build was the
    // 12x smoke-growth signature; AQE picks the build side at runtime).
    // The contract here is "equi-join, never a nested-loop/cartesian
    // verify": either join strategy is fine, a BNLJ is not.
    val lshPlan = plan("dd_embedding_lsh")
    assert(lshPlan.contains("Join") &&
      !lshPlan.contains("BroadcastNestedLoopJoin") &&
      !lshPlan.contains("CartesianProduct"), lshPlan.take(400))
    val pc = plan("dd_embedding_cosine")
    // cheap id-order conjunct must run before the fused cosine in the BNLJ
    // condition — Catalyst's own pushdown puts the cosine first, doubling
    // its evaluations
    val cond = pc.linesIterator.find(_.contains("Join condition")).getOrElse("")
    // r14 optimization: the per-pair kernel is now the dot-only
    // float_dot/(na*nb) form over per-side precomputed norms (bit-identical
    // to the fused cosine; a third of the per-pair flops) — the pinned
    // contract is unchanged: the cheap id-order conjunct runs BEFORE it
    assert(cond.indexOf("a_id") >= 0 && cond.indexOf("float_dot") > cond.indexOf("a_id"), cond)
  }

  test("exact percentiles avoid the interpreted ObjectHashAggregate path") {
    val p = plan("rel_percentiles")
    assert(!p.contains("ObjectHashAggregate"), "percentile fell back to interpreted aggregation")
    assert(p.contains("Window") && p.contains("partial_sum"))
  }

  test("date-partitioned join scan is pruned dynamically (DPP)") {
    // rel_dpp joins the date-partitioned events layout against a filtered
    // date dim: the surviving dates are runtime values, so the fact scan
    // must carry a dynamicpruning# subquery in its PartitionFilters —
    // without it, a 100 TB date-partitioned fact table would be scanned in
    // full for a one-weekday query.
    val p = plan("rel_dpp")
    assert(p.contains("dynamicpruning"), p)
  }

  test("DPP skips ~6/7 of the fact partitions (metric level)") {
    // The plan-string check above proves the dynamicpruning filter is
    // PLANNED; this proves it FIRED: after execution, the fact scan's
    // driver metrics must show partitions-read ~= the Monday fraction of
    // the date-partitioned layout, not the full partition count.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val df = SparkEntry.queries("rel_dpp")(spark, sf)
    df.collect()
    // the DPP'd scan is the one carrying static-vs-dynamic file metrics
    val scan = scans(df.queryExecution.executedPlan)
      .find(_.metrics.contains("staticFilesNum"))
      .getOrElse(fail("no scan with dynamic-pruning metrics in the executed plan"))
    val totalDates = spark.read
      .parquet(s"${graft.sources.PartitionedView.eventsByDate(spark, sf)}/date_dim")
      .count()
    val readParts = scan.metrics("numPartitions").value
    assert(readParts >= 1, "scan read no partitions")
    assert(readParts * 4 <= totalDates,
      s"DPP did not prune: read $readParts of $totalDates date partitions")
    assert(scan.metrics("numFiles").value < scan.metrics("staticFilesNum").value,
      "dynamic file count not below the static (pre-pruning) count")
  }

  test("IVF over the partitioned layout reads ~1/k of the cluster directories") {
    // The vector twin of the DPP test: the routed probe join against the
    // label-partitioned embeddings landing must prune unprobed cluster
    // directories at runtime — nprobe=1 of k labels read, not the corpus.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val df = SparkEntry.queries("sim_ivf_partitioned")(spark, sf)
    df.collect()
    val scan = scans(df.queryExecution.executedPlan)
      .find(_.metrics.contains("staticFilesNum"))
      .getOrElse(fail("no scan with dynamic-pruning metrics in the executed plan"))
    val totalLabels = graft.Tables.t(spark, sf, "embeddings")
      .select("label").distinct().count()
    val readParts = scan.metrics("numPartitions").value
    assert(readParts >= 1, "scan read no partitions")
    assert(readParts * 2 <= totalLabels,
      s"probe did not prune: read $readParts of $totalLabels cluster partitions")
  }

  test("IVF+PQ serving read prunes to the nprobe probed cluster directories") {
    // the composed serving path must keep sim_ivf_partitioned's pruning:
    // nprobe=2 of the k label directories opened — if composition with the
    // PQ scoring joins ever defeats DPP, the scan count regresses to k and
    // this catches it
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val df = SparkEntry.queries("sim_ivfpq_search")(spark, sf)
    df.collect()
    val scan = scans(df.queryExecution.executedPlan)
      .find(_.metrics.contains("staticFilesNum"))
      .getOrElse(fail("no scan with dynamic-pruning metrics in the executed plan"))
    val totalLabels = graft.Tables.t(spark, sf, "embeddings")
      .select("label").distinct().count()
    val readParts = scan.metrics("numPartitions").value
    assert(readParts >= 1, "scan read no partitions")
    assert(readParts * 2 <= totalLabels,
      s"probe did not prune: read $readParts of $totalLabels cluster partitions")
  }

  test("runtime row-level Bloom filter injects on a selective shuffle join") {
    // The row-level sibling of DPP: when a shuffle join's build side is
    // selective, Catalyst plants a bloom_filter_agg on it and a
    // might_contain pre-filter on the probe side's scan leg — at 100 TB
    // this drops most probe rows BEFORE the shuffle. Thresholds are tuned
    // for test-scale data (the optimization is size-gated in production).
    import org.apache.spark.sql.functions._
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val supp = Tables.t(spark, sf, "supplier").filter(col("s_acctbal") > 9000)
      val j = li.join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg"), "no bloom filter creation side:\n" + p)
      assert(p.contains("might_contain"), "no probe-side might_contain filter:\n" + p)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces over-partitioned shuffles at runtime") {
    // 64 shuffle partitions for a 5-group aggregate at sf0.001 is the
    // misconfigured-cluster shape; AQE must fold the near-empty partitions
    // into a few (AQEShuffleRead "coalesced") instead of running 64 tasks.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val df = Tables.t(spark, sf, "lineitem")
        .groupBy("l_returnflag").count()
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"), p)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("AQE splits a skewed join partition at runtime") {
    // 99% of rows share one join key; with test-scale thresholds AQE must
    // mark the sort-merge join skew=true and split the hot partition,
    // instead of one straggler task processing 99% of the data — the
    // AUTOMATIC sibling of the manual salting in rel_join_salted.
    import org.apache.spark.sql.functions._
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // repartition(8) gives the skewed shuffle several MAP tasks: AQE
      // splits a hot reduce partition along mapper output blocks, so a
      // single-mapper shuffle (one small parquet file) is categorically
      // unsplittable — the subtle precondition this test documents.
      val skewed = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
        .repartition(8)
        .select(when(col("l_orderkey") % 100 < 99, 0L)
          .otherwise(col("l_orderkey")).as("k"), col("l_quantity"))
      val dim = spark.range(0, 8000).select(col("id").as("k"),
        (col("id") % 7).as("grp"))
      val j = skewed.join(dim, "k").groupBy("grp").agg(sum("l_quantity"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("snapshot prunes per-user map-side (WindowGroupLimit)") {
    val p = plan("ts_snapshot")
    // the rn=1 window shape must trigger the group-limit prune: one row per
    // user survives the map side, so the shuffle is O(users) not O(events).
    // (The cutoff filter itself cannot reach THIS testdata's parquet reader
    // because events.ts is derived from the nanos-as-long conversion in
    // Tables.t; on a production TIMESTAMP column it pushes like
    // rel_filter_project's.)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("funnel stage refinements broadcast the per-user frontier") {
    // each stage's per-user min-ts frontier is tiny relative to the event
    // scan — it must join in as the broadcast side, never shuffling events
    assert(plan("ts_funnel").contains("BroadcastHashJoin"), plan("ts_funnel"))
  }

  test("shuffle_hash hint yields a ShuffledHashJoin, theta join broadcasts the band dim") {
    assert(plan("rel_join_shufflehash").contains("ShuffledHashJoin"),
      plan("rel_join_shufflehash"))
    assert(plan("rel_join_theta").contains("BroadcastNestedLoopJoin"),
      plan("rel_join_theta"))
  }

  test("bucketed join plans with no exchange on either side") {
    // Both inputs were bucketed on their join key at write time
    // (graft.sources.BucketedView) — the sort-merge join must read the
    // bucketed scans directly. The only allowed Exchange is the one AFTER
    // the join, feeding the small groupBy; the join's own children must
    // contain none. Localize the check to the SMJ subtree.
    val p = SparkEntry.queries("rel_join_bucketed")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("Bucketed: true"), p)
    // No exchange may partition on either JOIN key — the bucketed layout
    // already satisfies the join's distribution. (The post-join groupBy's
    // o_orderpriority exchange is expected and allowed.)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
  }

  test("bucket pruning: an equality point query reads 1 of 8 buckets") {
    // The bucketed sibling of DPP: an equality predicate on the bucket
    // column hashes to ONE bucket, so the scan opens 1/8 of the files —
    // the point-lookup I/O lever the bucketed landing buys beyond the
    // exchange-free join.
    // autoBucketedScan drops the bucketed read when no operator needs the
    // distribution — pin it on so the filter's bucket pruning applies (a
    // production point-lookup job sets the same knob).
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val (_, lineitem) = graft.sources.BucketedView.tables(spark, sf)
      val df = lineitem.filter(org.apache.spark.sql.functions.col("l_orderkey") === 42L)
      val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"), scan)
    } finally spark.conf.set(key, prev)
  }

  test("bitmap distinct aggregates partial bitmaps, never raw key sets") {
    val p = plan("rel_bitmap_distinct")
    // map-side partial bitmap_construct_agg before the (group, bucket)
    // shuffle — the mergeability that makes the rollup exact at any scale
    assert(p.contains("partial_bitmap_construct_agg"), p)
    assert(!p.contains("distinct"), p) // no expand/distinct fallback
  }

  test("decontamination joins shingles hash-to-hash, no nested-loop") {
    val p = plan("dd_decontaminate")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("blocked fuzzy match equi-joins on the block key, no nested-loop") {
    // the scale twin of the fn_levenshtein all-pairs anchor: the pair space
    // must come from an EQUI-join on (prefix, length-band) — a nested loop
    // here would mean the blocking silently degenerated to all-pairs
    val p = plan("dd_fuzzy_blocked")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("incremental aggregate merge keeps both partials map-side") {
    val p = plan("rel_incr_agg")
    assert(p.contains("partial_count") && p.contains("partial_sum"), p)
  }

  test("profiling reads the table once (single scan under the multi-distinct Expand)") {
    val p = plan("rel_profile")
    // one FileScan (details list one Location per scan node), partial
    // aggregation before the exchange; the Expand row-multiplication per
    // distinct column is expected and documented on the query
    assert(p.linesIterator.count(_.trim.startsWith("Location:")) == 1, p)
    assert(p.contains("Expand") && p.contains("partial_"), p)
  }

  test("q18 broadcasts the filtered aggregate into orders; q10 caps with TakeOrdered") {
    val q18 = plan("rel_join_q18")
    // the HAVING-filtered per-order sums build a broadcast side — orders is
    // never shuffled against the full fact aggregate
    assert(q18.contains("BroadcastHashJoin"), q18)
    assert(plan("rel_join_q10").contains("TakeOrderedAndProject"))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB lever beyond DPP: a selective filter on the dim side of a
    // SHUFFLE join injects a bloom-filter semi-filter into the fact scan,
    // dropping non-joining rows before the exchange. Local thresholds are
    // sized for 10 GB+ scans, so the test pins them down to demonstrate the
    // injection; a cluster config leaves them at defaults.
    import org.apache.spark.sql.functions.{col, sum}
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Tables.t(spark, sf, "lineitem")
        .join(Tables.t(spark, sf, "part").filter(col("p_size") < 3),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_size").agg(sum("l_quantity"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), plan)
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("whole-stage codegen is active in hot paths") {
    // AQE assigns codegen ids only once stages execute — run, then inspect
    // the final adaptive plan ("*(n)" marks codegen'd spans).
    Seq("rel_agg_q1", "dd_ngram_jaccard").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("*("), q)
    }
  }

  test("PII redaction is a shuffle-free codegen'd map over the scan") {
    // The governance pass must stay embarrassingly parallel at 100 TB:
    // scan → project(regexp) → sort for the oracle's ORDER BY. The only
    // exchange allowed is the final ORDER BY's range repartition; nothing
    // may shuffle before the redaction itself.
    val p = plan("tx_pii_redact")
    // formatted explain prints each node twice (tree + detail section);
    // count the "(n) Exchange" detail headers = physical node count
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    // r14 optimization: one ROUND-ROBIN spread of the (single-row-group,
    // single-partition) landing is allowed BEFORE the redaction so the
    // chained regex passes use the whole session instead of one core
    // (Tables.spread — a no-op at warehouse scale where the scan already
    // splits); still nothing may HASH-shuffle before the redaction, and
    // the only other exchange is the output sort.
    assert(exchanges <= 2, s"expected at most spread + output-sort exchanges:\n$p")
    val hashBeforeSort = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning"))
    assert(hashBeforeSort.isEmpty, "redaction must not hash-shuffle")
    assert(!p.contains("HashAggregate"), "redaction must not aggregate")
  }

  test("k-anonymity audit aggregates partial on the QI tuple before its shuffle") {
    val p = plan("rel_kanonymity")
    assert(p.contains("partial_count"), p)
  }

  test("no unpartitioned window runs over a raw fact-sized input (scale graduation)") {
    // r7 asserted this for the three then-graduated queries; r8 extends it
    // to the ENTIRE inventory via PlanAudit.windowIssues — every
    // unpartitioned window must sit over a Limit, a scalar aggregate, or a
    // documented bounded spine (allowlist in PlanAudit), never a raw scan
    // or vocabulary-sized aggregate. KNOWN LIMIT of the static sweep:
    // queries that eagerly Dedup.materialize (family caches, iterative
    // loops) hand back plans whose checkpointed subtrees appear as opaque
    // LogicalRDDs — windows UPSTREAM of a materialize point are invisible
    // here and are covered instead by each operator's own construction
    // (orderBy.limit candidate picks, d x d loop frames) and specs.
    // Skipped outright: streaming/KV queries (execute real engines on
    // construction; PlanAudit's runMain gate covers them) and the three
    // loop-built spectral/MMR queries whose RETURNED frame is entirely
    // post-checkpoint — compiling them here would run the full pipeline
    // for a vacuous pass.
    val skip = SparkEntry.allQueries.map(_.name).filter(n =>
      n.startsWith("st_") || n == "tx_kv_shuffle" ||
        Set("sim_power_iteration", "sim_pca_residual", "sim_mmr_rerank")(n))
    for (q <- SparkEntry.allQueries.map(_.name) if !skip.contains(q)) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val issues = PlanAudit.windowIssues(q, lp)
      assert(issues.isEmpty, s"$q: ${issues.mkString("; ")}")
    }
    // tx_vocab_growth's bounded spine: the doc_id < 100 prefix filter must
    // sit BELOW the running-sum window, pushed into the parquet scan.
    assert(plan("tx_vocab_growth").contains("LessThan(doc_id,100)"))
    // the two DistributedRank plans carry the range shuffle that replaces
    // the single-task global sort
    assert(plan("rel_histogram_eqdepth").contains("rangepartitioning"))
  }

  test("PQ-ADC serving broadcasts the distance table, never the code table") {
    // the corpus-side code table must stream through a BroadcastHashJoin
    // whose build side is the (subspace x codebook) distance table — if
    // the join ever flips (or degrades to SMJ), serving cost becomes
    // corpus-shuffle-bound and the whole PQ design point is lost
    val p = plan("sim_pq_adc")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sharded top-k prunes per shard map-side (WindowGroupLimit)") {
    // the candidate generation must prune to 50 rows per shard BEFORE any
    // exchange — the O(shards*m) shuffle is the operator's entire point
    val p = plan("tx_sharded_topk")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("IVM delta terms stay keyed equi-joins (no plan degeneration)") {
    // the five aggregate RESULTS (one row each) legitimately combine via
    // broadcast nested-loop cross joins — the scalar-combiner pattern; the
    // guard is on the DATA joins: every orders⋈lineitem term must be an
    // equi-join, so no Join node in the LOGICAL plan may lack a condition
    // while having a multi-row child aggregate below it unconsumed.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = SparkEntry.queries("rel_ivm_join")(spark, sf)
      .queryExecution.optimizedPlan
    lp.collect { case j: Join if j.condition.isEmpty => j }.foreach { j =>
      // condition-free joins allowed ONLY when both inputs are already
      // single-row aggregates (global agg = grouping-free Aggregate)
      Seq(j.left, j.right).foreach { side =>
        val ok = side.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }.isDefined
        assert(ok, s"cross join over a non-scalar side:\n$j")
      }
    }
    assert(!plan("rel_ivm_join").contains("CartesianProduct"))
  }

  test("effective-diameter cumulative join is a bounded broadcast, not Cartesian") {
    // the non-equi (b.d <= a.d) self-join over the O(maxHops)-row hop
    // histogram must plan as a BroadcastNestedLoop over the explicit
    // broadcast hint — a two-sided CartesianProduct here would become a
    // shuffle-everything at a wider histogram
    val p = plan("gr_effective_diameter_approx")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("skip-gram extraction joins walks on the walk id, aggregates partial") {
    // the +/-2-window pair fan-out must ride the wid equi-join (constant
    // 9x4 per-walk) with the step-window as a post-join filter — never a
    // cartesian over positions — and the pair count must combine map-side
    val p = plan("gr_walk_skipgrams")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("weighted pagerank rounds stay keyed equi-joins over the edge table") {
    // every data join in the 10-round recurrence must key on the node id
    // (the co-partitioned loop contract); the only condition-free joins
    // allowed are the broadcast scalar n / wdeg-total frames — so no
    // CartesianProduct anywhere, and the per-round contribution sum must
    // combine map-side
    val p = plan("gr_pagerank_weighted")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = SparkEntry.queries("gr_pagerank_weighted")(spark, sf)
      .queryExecution.optimizedPlan
    lp.collect { case j: Join if j.condition.isEmpty => j }.foreach { j =>
      val ok = Seq(j.left, j.right).exists(_.collectFirst {
        case a: Aggregate if a.groupingExpressions.isEmpty => a
      }.isDefined)
      assert(ok, s"condition-free join over two non-scalar sides:\n$j")
    }
  }

  test("negative-sampling table is one aggregate plus a broadcast scalar") {
    // the ppm normalizer must ride a broadcast of the 1-row weight-sum
    // aggregate over the O(nodes) frame — a shuffle here would mean the
    // whole table moved for a scalar
    val p = plan("gr_walk_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("SGNS negative draw is an equi-join on the quantized slot table") {
    // the word2vec unigram-table trick's whole point: the per-draw lookup
    // must be a hash equi-join on slot (fixed-size broadcast build), never
    // a range/theta join against the cumulative frame, and the cumulative
    // itself must come from the DistributedRank prefix-sum spine (no
    // unpartitioned window over the node vocabulary — PlanAudit checks
    // that structurally)
    val p = plan("gr_sgns_batch")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("zone-map audit and compaction plan aggregate at file granularity") {
    // both planners must reduce to file-granularity rows before any window
    // or second aggregate — partial aggregation present, and no window
    // over the raw fact input
    for (q <- Seq("rel_zonemap_audit", "rel_compaction_plan")) {
      val p = plan(q)
      assert(p.contains("HashAggregate"), s"$q:\n$p")
    }
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = SparkEntry.queries("rel_compaction_plan")(spark, sf)
      .queryExecution.optimizedPlan
    lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"compaction window must run over the file listing, not raw rows:\n$w")
    }
  }

  test("RA and Louvain stay equi-joined; only scalar frames ride condition-free joins") {
    // the wedge self-join (RA) and degree joins (Louvain) must key on node
    // ids — no CartesianProduct; Louvain's one condition-free join must
    // carry the 1-row m aggregate (the broadcast-scalar convention)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    for (q <- Seq("gr_resource_alloc", "gr_louvain_move", "gr_node2vec_walks")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      lp.collect { case j: Join if j.condition.isEmpty => j }.foreach { j =>
        val ok = Seq(j.left, j.right).exists(_.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }.isDefined)
        assert(ok, s"$q: condition-free join over two non-scalar sides:\n$j")
      }
    }
  }

  test("DP release is one group aggregate; the noise adds no join or shuffle") {
    // the ladder is pure projection over the O(groups) aggregate — any
    // join in this plan means the mechanism grew a data dependency
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val p = plan("rel_dp_release")
    assert(p.contains("HashAggregate"), p)
    val lp = SparkEntry.queries("rel_dp_release")(spark, sf)
      .queryExecution.optimizedPlan
    assert(lp.collect { case j: Join => j }.isEmpty,
      s"noise projection acquired a join:\n$lp")
  }
}
