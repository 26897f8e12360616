package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QH._

/** Scaling-headroom probe: replicate sf0.1 10x (~6M lineitem rows) into
  * /tmp and compare wall times of representative plans against sf0.1.
  * Near-linear growth (10x data → ~10x single-thread work on fixed
  * cores) is the evidence that the plan shapes survive scale-up; any
  * super-linear operator indicates a pair blow-up or spill problem.
  * Run: sbt 'Test/runMain graft.ScaleProbe'
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = "/root/testdata/sf0.1"
    // SPARK_GRAFT_PROBE_FACTOR=100 builds a ~60M-row lineitem replica
    // (several GB) for the 100x headroom experiment
    val factor = sys.env.getOrElse("SPARK_GRAFT_PROBE_FACTOR", "10").toInt
    val out = s"/tmp/graft_sf${factor / 10}"
    // reuse an existing replica (SPARK_GRAFT_PROBE_REUSE=1) and/or probe
    // a subset (SPARK_GRAFT_PROBE_ONLY=q_a,q_b) for fast iteration
    val reuse = sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1") &&
      new java.io.File(s"$out/lineitem.parquet").exists()
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])

    // replicate with key offsets so join cardinalities scale honestly
    def replicate(table: String, keyCols: Map[String, Long]): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val reps = spark.range(factor).select($"id".as("__rep"))
      val rep = df.crossJoin(reps)
      val shifted = keyCols.foldLeft(rep) { case (d, (c, base)) =>
        d.withColumn(c, col(c) + col("__rep") * base)
      }.drop("__rep")
      shifted.write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    if (!reuse) {
    replicate("lineitem", Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
      "l_suppkey" -> 100000L))
    replicate("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
    replicate("customer", Map("c_custkey" -> 1000000L))
    replicate("supplier", Map("s_suppkey" -> 100000L))
    // part replicates with the SAME offset lineitem.l_partkey uses, so
    // part joins scale replica-to-replica; its STRING columns repeat
    // unchanged — the value dictionary stays fixed-size as the corpus
    // grows, which is exactly the FST-index cost model the regexp
    // probes measure
    replicate("part", Map("p_partkey" -> 1000000L))
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
    // embeddings: replicate with id offsets and a tiny deterministic
    // perturbation of the first coordinate — replicas are DISTINCT
    // vectors but near-duplicates of their original (cosine ≈ 1), the
    // adversarial load for semantic dedup / ANN probes (an exact copy
    // would be degenerate; an independent vector would dodge the
    // near-dup pair growth the operators must absorb)
    locally {
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      val reps = spark.range(factor).select($"id".as("__rep"))
      df.crossJoin(reps)
        .withColumn("vec_id", col("vec_id") + col("__rep") * 1000000L)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + col("__rep").cast("float") * lit(0.001f))
              .otherwise(x)))
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    // documents: replicate with id offsets and a per-replica suffix
    // token — every original doc gains 9 NEAR-duplicates (one token
    // differs), the adversarial load for near-dup candidate generation
    locally {
      val df = spark.read.parquet(s"$src/documents.parquet")
      val reps = spark.range(factor).select($"id".as("__rep"))
      df.crossJoin(reps)
        .withColumn("doc_id", col("doc_id") + col("__rep") * 1000000L)
        .withColumn("text", concat(col("text"), lit(" rep"), col("__rep")))
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    // events: replicate 10x with user/event id offsets through the
    // nanos-safe reader — MORE users with the same per-user event count,
    // the honest scaling model for funnel/upsert/sessionize plans
    locally {
      val ev = Tables(spark, src).events
      val reps = spark.range(factor).select($"id".as("__rep"))
      ev.crossJoin(reps)
        .withColumn("user_id", col("user_id") + col("__rep") * 1000000L)
        .withColumn("event_id", col("event_id") + col("__rep") * 100000000L)
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    } // !reuse
    // round-7 replica upgrade: part used to be copied unreplicated —
    // refresh just it when reusing an older replica
    if (reuse && spark.read.parquet(s"$out/part.parquet").count() ==
        spark.read.parquet(s"$src/part.parquet").count())
      replicate("part", Map("p_partkey" -> 1000000L))

    val probes = Seq("q1_pricing_summary", "q_join_inner", "q_join_left",
      "q_upsert_latest", "q_win_rank", "q_agg_distinct", "q_sort_topk",
      "q_join_asof", "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
      "q_text_stats",
      // round-2 operators
      "q_join_band", "q_funnel_matchstep", "q_agg_hll_remerge",
      "q_dedup_jaccard_exact", "q_gapfill_agg",
      // SQL-callable aggregates + CLP + one-pass corpus clean
      "q_funnel_agg_sql", "q_funnel_setcount", "q_fn_clp", "q_corpus_clean",
      // clustering / curation round-2 additions
      "q_dedup_components", "q_dedup_semantic", "q_mix_proportions",
      "q_pack_sequences", "q_dedup_incremental", "q_ann_pq", "q_ann_ivfpq",
      "q_dedup_lines", "q_sample_domain_cap",
      // round-3: df-capped unigram LM broadcast + M3QL front-end
      "q_text_lm", "q_ts_promql", "q_dedup_substring",
      // round-3: distributed k-means / DSIR / BPE / quality gates /
      // roaring re-merge
      "q_cluster_kmeans", "q_dsir_select", "q_tokenize_bpe",
      "q_agg_bitmap_remerge", "q_gopher_rules", "q_ppl_buckets",
      // round-3: BM25 (stats scan + map-only scoring; with the
      // ingest-time IndexCache, q_ann_* ratios measure warm-index
      // search — the reference's serving cost model)
      "q_bm25_topk", "q_classifier_train",
      // round-3: TTL dedup, FFD packing, spatial join, chunking, diff
      "q_dedup_ttl", "q_pack_ffd", "q_join_spatial", "q_chunk_overlap",
      "q_snapshot_diff", "q_join_radius", "q_cohort_retention",
      "q_ppl_buckets_kll", "q_dedup_url", "q_mix_temperature",
      "q_decontaminate_semantic", "q_dedup_containment",
      // round-4: HNSW (warm ingest-time graph → fan-out beam search),
      // wire-format digest re-merges, logical tables, TS transforms
      "q_ann_hnsw", "q_agg_tdigest_remerge", "q_agg_qdigest_remerge",
      "q_agg_ull_remerge", "q_logical_table", "q_ts_transforms",
      "q_upsert_metadata_ttl", "q_ann_sql_predicate", "q_tpch_01",
      "q_tpch_09", "q_tpch_20",
      // round-5: the heavy TPC-H members (14% of bench wall) at 100x
      "q_tpch_05", "q_tpch_07", "q_tpch_08",
      // round-5 additions
      "q_ann_radius_sql_predicate", "q_rollup_tdigest",
      "q_filter_json_shred", "q_text_match_fuzzy",
      "q_rls_filter", "q_openstruct_split", "q_filter_json_sql",
      "q_filter_tsindex",
      // round-6: index-served TEXT_MATCH (token postings + IN-list
      // pushdown) vs the scan it replaces; non-cosine ANN; set-sketch
      // rollups; quantized IVF
      "q_text_match_indexed", "q_text_match",
      "q_ann_l2", "q_ann_dot", "q_ann_ivf_sq8", "q_rollup_theta",
      "q_dedup_embedding",
      // round-7: dictionary-served regexp/LIKE vs the per-row regex
      // scan they replace
      "q_filter_regex", "q_filter_regex_indexed", "q_filter_like_indexed",
      // round-7: H3-analog cell-range serving vs the haversine scan
      "q_geo_radius_indexed", "q_geo_polygon_indexed",
      // round-7: L2 radius search through HNSW / IVF_FLAT readers
      "q_ann_radius_l2", "q_ann_radius_l2_ivf",
      // round-7: optimizer-rewritten time predicate (raw-range pushdown)
      // and footer-statistics metadata aggregation (no data I/O)
      "q_filter_timepred", "q_agg_metadata",
      // round-8: raw-selection gapfill (window over carriers∪markers —
      // the series universe must stay distributed) and the ULL remerge
      // exact-arm straggler flagged by the round-7 verdict
      "q_gapfill_select")
      .filter(q => only.isEmpty || only(q))
    def time(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm
    probes.foreach(time(src, _))
    println(f"${"query"}%-22s ${"sf0.1"}%8s ${s"${factor}x"}%9s ${"ratio"}%6s")
    probes.foreach { q =>
      val small = Seq(time(src, q), time(src, q)).min
      val big = Seq(time(out, q), time(out, q)).min
      println(f"$q%-22s $small%8.2f $big%9.2f ${big / small}%6.1f")
    }
    spark.stop()
  }
}
