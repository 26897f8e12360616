package graft

/** Suite-wide plan-shape regression gate: no registered query may plan
  * a CartesianProduct, and BroadcastNestedLoopJoin may appear ONLY in
  * the whitelisted queries where it is the benign scalar-broadcast
  * shape (a crossJoin against a broadcast 1-row aggregate — corpus
  * stats, thresholds, trained centroids — which BNLJ executes as a
  * map-only pass; Spark plans any non-equi "join" with a literal
  * 1-row side this way). A new query that accidentally introduces
  * either operator fails here and forces a conscious decision.
  * Plans are BUILT, not executed, so the gate is cheap. */
class PlanShapeSpec extends SparkSpec {

  // every entry is a crossJoin(broadcast(<1-row stats>)) pattern —
  // audited in PLANS.md; q_join_theta is the complement-count rewrite
  // (two tallies + broadcast), q_setop_union's BNLJ is its LIMIT-less
  // facade arm's scalar guard
  private val scalarBroadcastBnlj = Set(
    "q_ann_bruteforce", "q_ann_ivf", "q_ann_ivf_sq8", "q_ann_ivfpq",
    "q_ann_pq",
    "q_ann_radius", "q_bm25_topk", "q_cluster_kmeans", "q_corpus_clean",
    "q_decontaminate_semantic",
    "q_dedup_embedding", "q_dedup_incremental", "q_dedup_minhash",
    "q_dedup_semantic", "q_dedup_simhash", "q_dsir_select", "q_fn_vector",
    "q_gapfill", "q_gapfill_agg", "q_join_theta", "q_mix_proportions",
    "q_mix_temperature",
    "q_ppl_buckets", "q_ppl_buckets_kll", "q_setop_union", "q_text_lm",
    "q_ts_promql",
    // q_ann_hnsw: S shard-blob rows crossJoin broadcast(bounded probes)
    // — the deliberate per-segment fan-out; q_ts_transforms: the dense
    // bucket-spine crossJoin broadcast(series), same shape as
    // q_ts_promql's fill stage; q_gapfill_select: the same
    // spine × broadcast(distinct series) grid (bounded: buckets and
    // series are both tiny relative to the fact rows passing through)
    "q_ann_hnsw", "q_ts_transforms", "q_gapfill_select",
    // q_ann_l2 / q_ann_dot: the q_ann_hnsw shape for the non-cosine
    // metrics — bounded probes (< 5 rows) crossJoin the corpus for the
    // exact-oracle side, plus the HNSW shard fan-out
    "q_ann_l2", "q_ann_dot",
    // q_ann_lsh (r15): the same bounded-probes (5 rows) × corpus
    // crossJoin for the exact-top-5 oracle side — it was always in
    // the query, but the r14 eager localCheckpoint hid the subtree
    // from the built plan; r15 removed that checkpoint (measured
    // 1.155 → 0.740 s, ReuseExchange shares the window exchange), so
    // the benign shape is now visible here
    "q_ann_lsh",
    // TPC-H members whose partsupp prelude (and Q11's HAVING-vs-total)
    // carry the `(SELECT count(*) FROM supplier)` 1-row scalar
    // broadcast — the canonical benign BNLJ shape
    "q_tpch_02", "q_tpch_09", "q_tpch_11", "q_tpch_18", "q_tpch_22",
    // global (no GROUP BY) mixed exprMinMax: the sibling-sum row is a
    // 1-row broadcast joined onto the tie-row spine (grouped variants
    // join on keys; only the global shape has no key to hash on)
    "q_agg_exprminmax_neartie")

  test("no cartesian products; BNLJ only in scalar-broadcast whitelist") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val p = f(spark, dir).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (p.contains("BroadcastNestedLoopJoin") &&
          !scalarBroadcastBnlj(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("multi-predicate theta form plans ONE scan with N filtered aggregates") {
    // the rewriteThetaSetOps output must stay a single pass over the
    // source — N FILTER'd raw-sketch aggregates in one Aggregate, set
    // ops applied to the blobs above it; a second leaf would mean the
    // rewrite degenerated into per-filter scans
    import spark.implicits._
    Seq((1, 10.0, "A"), (2, 5.0, "B")).toDF("k", "v", "s")
      .createOrReplaceTempView("theta_shape_t")
    val df = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT DISTINCT_COUNT_THETA_SKETCH(k, ''," +
        " 'v > 1', 's = ''A''', 'SET_INTERSECT($1,$2)') AS n" +
        " FROM theta_shape_t")
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, leaves.mkString("; "))
    // $1 = {1,2} (v>1), $2 = {1} (s='A') → intersect {1}
    assert(df.collect().head.getLong(0) == 1L)
  }
}
