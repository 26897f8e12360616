package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-15 optimization A/B probe (guide §1: measure first, and
  * interleave variants in ONE JVM so the box's periodic external load
  * hits both sides). Each variant prints a result checksum so a
  * rewrite that drifts is caught immediately.
  *
  * Usage: runMain graft.tools.R15Ab [section]
  */
object R15Ab {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val section = if (args.nonEmpty) args(0) else "all"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    // interleaved timing: variants run round-robin so a load spike
    // lands on all of them; min per variant sheds the spike
    def ab(reps: Int)(variants: (String, () => String)*): Unit = {
      variants.foreach { case (_, f) => f() } // warm
      val best = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(Double.MaxValue)
      val outs = scala.collection.mutable.Map[String, String]()
      (1 to reps).foreach { _ =>
        variants.foreach { case (n, f) =>
          val t0 = System.nanoTime()
          outs(n) = f()
          best(n) = math.min(best(n), (System.nanoTime() - t0) / 1e9)
        }
      }
      variants.foreach { case (n, _) =>
        println(f"[ab] $n%-40s ${best(n)}%8.3f s   ${outs(n)}")
      }
    }

    if (section == "all" || section == "ann") {
      // q_ann_lsh property-check: eager localCheckpoint of exactTop vs
      // plain reuse-exchange sharing
      def lshQuery(checkpoint: Boolean): DataFrame = {
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val lsh = Similarity.lshTopK(probes, t.embeddings, "vec_id",
          "vec_id", "embedding", k = 5, bits = 16, bands = 8)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val top = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", graft.queries.QH.r4(
            graft.plans.VectorExpressions.cosineSimilarity(
              col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
        val exactTop = if (checkpoint) top.localCheckpoint(true) else top
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(lsh, exactTop("probe_id") === lsh("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 3).as("recall_ok"))
          .orderBy(col("probe_id"))
      }
      ab(4)(
        "ann_lsh/checkpointed" -> (() => lshQuery(true).collect()
          .mkString("|").hashCode.toString),
        "ann_lsh/reuse-exchange" -> (() => lshQuery(false).collect()
          .mkString("|").hashCode.toString))
    }

    if (section == "all" || section == "cc") {
      // components() driver path: eager localCheckpoint of the edge
      // set before the size-gate collect vs collecting directly
      import graft.operators.Dedup
      import graft.functions.TextFunctions
      import org.apache.spark.sql.types.StringType
      def pairsDf: DataFrame = {
        val salted = t.documents.select(col("doc_id"),
          array_join(transform(
            TextFunctions.tokens(lower(col("text"))),
            tok => concat(tok, lit("_"),
              expr("doc_id div 25").cast(StringType))), " ").as("text"))
        Dedup.tokenJaccardExact(salted, "doc_id", "text", threshold = 0.6)
      }
      def canonOf(pairs: DataFrame) = pairs.select(
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("src"),
        greatest(col("id_a").cast("long"), col("id_b").cast("long"))
          .as("dst")).distinct()
      ab(3)(
        "components/eager-ckpt+collect" -> (() => {
          val c = canonOf(pairsDf).localCheckpoint()
          c.limit(1 << 20).collect().length.toString
        }),
        "components/direct-collect" -> (() => {
          canonOf(pairsDf).limit(1 << 20).collect().length.toString
        }))
    }

    if (section == "sub") {
      // substringDedup prefix: tokenize+window-hash+first-occurrence
      // aggregate, with and without the scan-parallelism guard on the
      // tokenize (the checkpoint inherits the scan's partitioning)
      import graft.functions.TextFunctions
      val k = 8
      def prefix(guard: Boolean): String = {
        val d0 = if (guard)
          graft.operators.Parallelism.ensure(t.documents, "doc_id")
        else t.documents
        val toks = d0.select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("__toks")).localCheckpoint()
        val winHash = toks.select(col("doc_id"),
            posexplode(col("__toks")).as(Seq("__pos", "__tok")),
            size(col("__toks")).as("__n"),
            unhex(md5(array_join(
              slice(col("__toks"), col("__pos") + 1, lit(k)), " ")))
              .as("__wh"))
          .filter(col("__pos") + k <= col("__n"))
          .select(col("doc_id"), col("__pos"), col("__wh"))
        val dup = winHash.groupBy(col("__wh"))
          .agg(collect_list(struct(col("doc_id"), col("__pos")))
            .as("__occ"))
          .filter(size(col("__occ")) > 1)
        dup.agg(count(lit(1))).collect()(0).toString
      }
      ab(4)(
        "substr-prefix/no-guard" -> (() => prefix(false)),
        "substr-prefix/guarded" -> (() => prefix(true)))
    }

    if (section == "emm") {
      // exprMinMax: current facade emission vs hand-built chained
      // per-measure MIN (hash-aggregatable; level k+1 runs on level
      // k's tie survivors only). Grouped single-call and global mixed
      // shapes, matching q_agg_exprminmax / q_agg_exprminmax_neartie.
      graft.sql.QueryFacade.init(spark, dir)
      def facadeGrouped(): String = graft.sql.QueryFacade.sql(spark,
        """SET explicitLimit = true;
           SELECT l_returnflag, count(*), exprmin(l_orderkey, l_extendedprice)
           FROM lineitem GROUP BY l_returnflag""")
        .collect().sortBy(_.toString).mkString("|").hashCode.toString
      def chainGrouped(): String = spark.sql(
        """SELECT t.l_returnflag, m.__n, t.l_orderkey
           FROM lineitem t JOIN (
             SELECT l_returnflag AS __k, count(*) AS __n,
                    MIN(l_extendedprice) AS __v
             FROM lineitem GROUP BY l_returnflag) m
           ON t.l_returnflag <=> m.__k AND t.l_extendedprice <=> m.__v""")
        .collect().sortBy(_.toString).mkString("|").hashCode.toString
      def facadeNeartie(): String = graft.sql.QueryFacade.sql(spark,
        """SET explicitLimit = true;
           SELECT sum(l_quantity) AS sum_qty,
             exprmin(l_orderkey, l_quantity, l_extendedprice),
             exprmin(l_partkey, l_extendedprice)
           FROM lineitem""")
        .collect().sortBy(_.toString).mkString("|").hashCode.toString
      def chainNeartie(): String = spark.sql(
        """WITH m0a AS (SELECT MIN(l_quantity) AS v FROM lineitem),
          f0 AS (SELECT l_orderkey, l_extendedprice FROM lineitem, m0a
                 WHERE l_quantity <=> m0a.v),
          m0b AS (SELECT MIN(l_extendedprice) AS v FROM f0),
          p0 AS (SELECT l_orderkey FROM f0, m0b
                 WHERE l_extendedprice <=> m0b.v),
          m1 AS (SELECT MIN(l_extendedprice) AS v FROM lineitem),
          p1 AS (SELECT l_partkey FROM lineitem, m1
                 WHERE l_extendedprice <=> m1.v),
          b AS (SELECT sum(l_quantity) AS s FROM lineitem)
          SELECT b.s, p0.l_orderkey, p1.l_partkey FROM b, p0, p1""")
        .collect().sortBy(_.toString).mkString("|").hashCode.toString
      ab(4)(
        "emm-grouped/facade-rank" -> (() => facadeGrouped()),
        "emm-grouped/chained-min" -> (() => chainGrouped()),
        "emm-neartie/facade-rank" -> (() => facadeNeartie()),
        "emm-neartie/chained-min" -> (() => chainNeartie()))
    }

    if (section == "dig") {
      // sketch-build aggregates over the 1-task scan: as-is vs
      // narrow-projected repartition (ReuseExchange shares the shuffle
      // between the direct and remerge branches)
      def tdQuery(guard: Boolean): String = {
        val base0 = t.lineitem.select(col("l_returnflag"),
          col("l_linestatus"), col("l_quantity"), col("l_orderkey"))
        val base = if (guard)
          graft.operators.Parallelism.ensure(base0, "l_orderkey")
        else base0
        val direct = base.groupBy(col("l_returnflag"))
          .agg(graft.plans.TDigestSketch
              .percentileTDigest(col("l_quantity"), 50.0).as("est_direct"),
            graft.queries.QH.r4(expr("percentile(l_quantity, 0.5)"))
              .as("exact_p50"))
        val merged = base
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.TDigestSketch.tdigestState(col("l_quantity"))
            .as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.TDigestSketch
            .tdigestMergePercentile(col("blob"), 50.0).as("est_merged"))
        direct.join(merged, "l_returnflag")
          .select(col("l_returnflag"), col("exact_p50"),
            (abs(col("est_direct") - col("exact_p50")) <= 2.0)
              .as("direct_ok"),
            (abs(col("est_merged") - col("exact_p50")) <= 2.0)
              .as("merged_ok"))
          .orderBy(col("l_returnflag"))
          .collect().mkString("|")
      }
      ab(4)(
        "tdigest/as-is" -> (() => tdQuery(false)),
        "tdigest/guarded" -> (() => tdQuery(true)))
    }

    if (section == "scan") {
      // single-row-group scan parallelism: raw 1-task scan+agg vs
      // hash-repartition then parallel agg (Tables guard candidate)
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      def q1(df: DataFrame): String = {
        import graft.queries.QH.dsum
        df.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sq"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sd"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
          .collect().mkString("|").hashCode.toString
      }
      def filt(df: DataFrame): String =
        df.filter(col("l_quantity") > 49)
          .agg(count(lit(1))).collect()(0).toString
      ab(4)(
        "scan/q1-raw-1task" -> (() => q1(raw)),
        "scan/q1-repart32" -> (() =>
          q1(raw.repartition(32, col("l_orderkey")))),
        "scan/filter-raw" -> (() => filt(raw)),
        "scan/filter-repart32" -> (() =>
          filt(raw.repartition(32, col("l_orderkey")))))
    }

    if (section == "plan") {
      // planning-vs-execution split for a sample of queries: wall of
      // (a) DataFrame construction (analysis + any build-time jobs),
      // (b) physical planning (executedPlan forced), (c) execution
      val qmap = graft.SparkEntry.queries
      val sample = args.drop(1).headOption
        .map(_.split(",").toSeq)
        .getOrElse(Seq("q_tpch_01", "q_join_inner", "q_agg_distinct",
          "q_win_rank", "q_text_langid", "q_geo_h3", "q_ts_range",
          "q_filter_in", "q_sort_topk", "q_dedup_minhash"))
      sample.foreach { name =>
        qmap.get(name).foreach { fn =>
          fn(spark, dir).collect() // warm
          var (tb, tp, te) = (0.0, 0.0, 0.0)
          (1 to 3).foreach { _ =>
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan
            val t2 = System.nanoTime()
            df.collect()
            val t3 = System.nanoTime()
            tb = math.max(tb, 0) + (t1 - t0) / 1e9
            tp += (t2 - t1) / 1e9
            te += (t3 - t2) / 1e9
          }
          println(f"[plan] $name%-24s build=${tb / 3}%6.3f " +
            f"plan=${tp / 3}%6.3f exec=${te / 3}%6.3f s (avg of 3)")
        }
      }
    }

    spark.stop()
  }
}
