package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions
import QH._

/** Aggregation surface — reference inventory at apache/pinot
  * `pinot-segment-spi/.../AggregationFunctionType.java:52-242` (basic,
  * distinct, order-dependent, stats, boolean, collection, histogram,
  * percentiles, grouping sets). Every query here is a single
  * groupBy/agg — partial (map-side) aggregation + final merge is native
  * Catalyst, so the shuffle carries only group keys + partial states.
  */
object AggQueries {

  val all: Seq[GQuery] = Seq(

    // TPC-H Q1 style pricing summary — the flagship slice (SURVEY §7.2).
    GQuery("q1_pricing_summary",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
            count(lit(1)).as("n"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // Whole-table aggregation, no group-by (SSE AggregationOperator.java:46).
    GQuery("q_agg_nogroup",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.agg(
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          (max(col("l_quantity")) - min(col("l_quantity"))).as("minmaxrange"),
          count(col("l_orderkey")).as("n_nonnull"))
      },
      Some("""SELECT COUNT(*) AS n, MIN(l_quantity) AS min_qty,
        MAX(l_quantity) AS max_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price,
        MAX(l_quantity) - MIN(l_quantity) AS minmaxrange,
        COUNT(l_orderkey) AS n_nonnull
        FROM lineitem""")),

    // Metadata-only aggregation (NonScanBasedAggregationOperator.java /
    // FastFilteredCountOperator.java): unfiltered COUNT/MIN/MAX answer
    // from the parquet FOOTER statistics table — used_metadata asserts
    // the executed plan reads NO data file, so a silent fall-through to
    // the scan fails the gate. The layout derives a nullable column so
    // COUNT(col) exercises the null-count bookkeeping; the oracle
    // recomputes everything from the raw rows.
    GQuery("q_agg_metadata",
      (s, dir) => {
        val fact = graft.operators.IndexCache.getOrBuild(
          ("q_agg_metadata", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_footer_layout").toString
          Tables(s, dir).events
            .select(col("event_type"), col("user_id"), col("value"))
            .withColumn("val_n",
              when(col("value") < 0.1, lit(null)).otherwise(col("value")))
            .repartition(4)
            .write.mode("overwrite").parquet(s"$tmp/t")
          val df = s.read.parquet(s"$tmp/t")
          graft.sources.FooterStats.register(s, df)
          df
        }
        val q = fact.agg(
          count(lit(1)).as("n_rows"),
          count(col("val_n")).as("n_vals"),
          min(col("user_id")).as("min_uid"),
          max(col("user_id")).as("max_uid"),
          min(col("event_type")).as("min_et"),
          max(col("event_type")).as("max_et"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
        // gate on the FINAL plan shape: CollapseProject folds the added
        // literal column INTO the Aggregate, so a pre-withColumn check
        // could pass while the real plan still scanned (caught by the
        // 100× probe — 13.5× where metadata serving is ~flat)
        val usedMetadata = !q.withColumn("used_metadata", lit(true))
          .queryExecution.executedPlan.toString.contains("FileScan")
        q.withColumn("used_metadata", lit(usedMetadata))
      },
      Some("""SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN value < 0.1 THEN NULL ELSE value END) AS n_vals,
        MIN(user_id) AS min_uid, MAX(user_id) AS max_uid,
        MIN(event_type) AS min_et, MAX(event_type) AS max_et,
        MIN(value) AS min_v, MAX(value) AS max_v,
        TRUE AS used_metadata
        FROM events""")),

    // FILTER clause per aggregation (FilteredAggregationOperator.java).
    GQuery("q_agg_filtered",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
            dsum(when(col("o_totalprice") > 100000.0, col("o_totalprice"))).as("big_sum"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) FILTER (WHERE o_totalprice > 100000.0) AS DOUBLE) AS big_sum
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // HAVING (reference HavingFilterHandler.java).
    GQuery("q_agg_having",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .filter(col("n") >= 5)
          .orderBy(col("l_partkey"))
      },
      Some("""SELECT l_partkey, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 5
        ORDER BY l_partkey""")),

    // DISTINCTCOUNT / DISTINCTSUM / DISTINCTAVG (AggregationFunctionType.java:77-87).
    GQuery("q_agg_distinct",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("dc_part"),
            countDistinct(col("l_quantity")).as("dc_qty"),
            sum_distinct(dec(col("l_quantity"))).cast(DoubleType).as("dsum_qty"),
            (sum_distinct(dec(col("l_quantity"))).cast(DoubleType) /
              countDistinct(col("l_quantity"))).as("davg_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS dc_part,
        COUNT(DISTINCT l_quantity) AS dc_qty,
        CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS dsum_qty,
        CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
          / COUNT(DISTINCT l_quantity) AS davg_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // SELECT DISTINCT (DistinctOperator.java:39).
    GQuery("q_distinct_select",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.select(col("o_orderstatus"), col("o_orderpriority")).distinct()
          .orderBy(col("o_orderstatus"), col("o_orderpriority"))
      },
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus, o_orderpriority""")),

    // MODE with deterministic smallest-value tie-break
    // (ModeAggregationFunction; ties made deterministic per SURVEY §2.4).
    GQuery("q_agg_mode",
      (s, dir) => {
        val t = Tables(s, dir)
        val c = t.lineitem.groupBy(col("l_returnflag"), col("l_linenumber"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc, col("l_linenumber").asc)
        c.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_linenumber").as("mode_val"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH c AS (SELECT l_returnflag, l_linenumber, COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2),
        r AS (SELECT l_returnflag, l_linenumber,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_linenumber ASC) AS rn
          FROM c)
        SELECT l_returnflag, l_linenumber AS mode_val FROM r WHERE rn = 1
        ORDER BY l_returnflag""")),

    // EXPRMIN/EXPRMAX == argmin/argmax (AggregationFunctionType.java:173-182)
    // and FIRSTWITHTIME/LASTWITHTIME (:68-71) — deterministic via window
    // with (ts, event_id) tie-break.
    GQuery("q_agg_argmax",
      (s, dir) => {
        val t = Tables(s, dir)
        // native max_by/min_by with a struct ordering key: ONE partial
        // aggregation, no window sort (EXPRMIN/EXPRMAX & FIRST/LASTWITHTIME)
        val ord = struct(col("ts"), col("event_id"))
        t.events
          .groupBy(col("user_id"))
          .agg(
            max_by(col("value"), ord).as("last_value"),
            max_by(col("event_type"), ord).as("last_type"),
            min_by(col("value"), ord).as("first_value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH r AS (SELECT user_id, value, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_last,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn_first
          FROM events)
        SELECT user_id,
          MAX(CASE WHEN rn_last = 1 THEN value END) AS last_value,
          MAX(CASE WHEN rn_last = 1 THEN event_type END) AS last_type,
          MAX(CASE WHEN rn_first = 1 THEN value END) AS first_value
        FROM r GROUP BY user_id ORDER BY user_id""")),

    // EXPRMIN/EXPRMAX tie-ROW semantics through the facade rewrite
    // (ExprMinMaxAggregationFunction + ParentAggregationResultRewriter):
    // every extreme row returns, sibling aggregates repeat on each.
    // Scale: the RANK()=1 windows plan with a PARTIAL WindowGroupLimit
    // below the exchange (InferWindowGroupLimit), so only per-partition
    // rank-1 candidates shuffle — measured faster than a
    // min(struct)+join two-scan rewrite at 100× (ExprMinMaxScaleProbe).
    GQuery("q_agg_exprminmax",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT l_returnflag, count(*), exprmin(l_orderkey, l_extendedprice)
             FROM lineitem GROUP BY l_returnflag""")
          .withColumnRenamed("count(*)", "n")
          .withColumnRenamed("exprmin(l_orderkey,l_extendedprice)", "argmin_okey")
      },
      Some("""WITH r AS (SELECT l_returnflag, l_orderkey,
          RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk
          FROM lineitem),
        b AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1)
        SELECT r.l_returnflag, b.n, r.l_orderkey AS argmin_okey
        FROM r JOIN b USING (l_returnflag) WHERE rk = 1""")),

    // Global (no GROUP BY) exprMax: the unpartitioned RANK()=1 window
    // looks like a single-partition sort but is NOT — Catalyst's
    // InferWindowGroupLimit inserts a partial per-partition group
    // limit, so only each partition's rank-1 candidates reach the
    // final window (verified in the executed plan + 100× probe).
    GQuery("q_agg_exprminmax_global",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT exprmax(o_orderkey, o_totalprice) FROM orders""")
          .withColumnRenamed("exprmax(o_orderkey,o_totalprice)", "argmax_okey")
      },
      Some("""SELECT o_orderkey AS argmax_okey FROM orders
        WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders)""")),

    // Query-BLOCK anchoring (round 11): exprmin inside a sub-select
    // keeps tie-row semantics — the reference's
    // ParentAggregationResultRewriter fires per query block, so
    // `SELECT .. FROM (SELECT exprmin(..) ..)` must return every tied
    // row, not the single-row min_by fallback. The facade recurses
    // into parenthesized blocks (innermost first) instead of bailing
    // on a second SELECT.
    GQuery("q_agg_exprminmax_subq",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT l_returnflag, argmin_okey FROM (
               SELECT l_returnflag,
                 exprmin(l_orderkey, l_extendedprice) AS argmin_okey
               FROM lineitem GROUP BY l_returnflag)
             WHERE l_returnflag <> 'X'
             ORDER BY l_returnflag, argmin_okey""")
      },
      Some("""SELECT l_returnflag, argmin_okey FROM (
          SELECT l_returnflag, l_orderkey AS argmin_okey,
            RANK() OVER (PARTITION BY l_returnflag
              ORDER BY l_extendedprice) AS rk
          FROM lineitem) t
        WHERE rk = 1 AND l_returnflag <> 'X'
        ORDER BY l_returnflag, argmin_okey""")),

    // Near-tie mixed shape (round 12): the block ROW_NUMBER orders
    // RANK()=1 survivors by doc order alone on the argument that
    // they're tied on the WHOLE measure list — this query pins the
    // measure-list completeness against a live oracle: the leading
    // measure (l_quantity) ties on ~1150 rows at sf0.01 and only the
    // trailing measure (l_extendedprice) breaks the tie, so any
    // loosening of the rank ordering multiplies the block and changes
    // values. Mixed with a sibling sum and a second single-measure
    // parent to keep the ParentAggregationResultRewriter path live.
    GQuery("q_agg_exprminmax_neartie",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT sum(l_quantity) AS sum_qty,
               exprmin(l_orderkey, l_quantity, l_extendedprice),
               exprmin(l_partkey, l_extendedprice)
             FROM lineitem""")
          .withColumnRenamed(
            "exprmin(l_orderkey,l_quantity,l_extendedprice)", "argmin_pair")
          .withColumnRenamed("exprmin(l_partkey,l_extendedprice)",
            "argmin_price")
      },
      Some("""SELECT (SELECT sum(l_quantity) FROM lineitem) AS sum_qty,
          (SELECT l_orderkey FROM lineitem
             ORDER BY l_quantity, l_extendedprice LIMIT 1) AS argmin_pair,
          (SELECT l_partkey FROM lineitem
             ORDER BY l_extendedprice LIMIT 1) AS argmin_price""")),

    // Multi-predicate theta form (round 11): N FILTER'd raw sketches
    // composed by the blob set-op scalars in ONE scan — the
    // reference's DISTINCT_COUNT_THETA_SKETCH(expr, params, 'f1', …,
    // 'SET_…(\$i,…)') post-aggregation surface. Distinct custkeys stay
    // under the 16384 nominal entries at sf0.01, so the sketch is in
    // exact mode and the DuckDB set-algebra oracle matches exactly.
    GQuery("q_agg_theta_setexpr",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT DISTINCT_COUNT_THETA_SKETCH(o_custkey, '',
               'o_totalprice > 100000',
               'o_orderpriority = ''1-URGENT''',
               'o_orderstatus = ''F''',
               'SET_UNION($3,SET_DIFF(SET_INTERSECT($1,$2),$3))') AS n
             FROM orders""")
      },
      Some("""SELECT count(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          UNION
          (SELECT o_custkey FROM orders WHERE o_totalprice > 100000
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        )""")),

    // Variance/stddev/covariance/correlation (:146-155). Rounded: exact
    // cross-engine float noise is ~1e-12 relative, far from round(4) edges.
    GQuery("q_agg_stats",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.groupBy(col("p_brand"))
          .agg(
            r4(var_pop(col("p_size"))).as("var_pop_size"),
            r4(var_samp(col("p_size"))).as("var_samp_size"),
            r4(stddev_pop(col("p_size"))).as("stddev_pop_size"),
            r4(stddev_samp(col("p_size"))).as("stddev_samp_size"),
            r4(covar_pop(col("p_size"), col("p_retailprice"))).as("covar_pop_sp"),
            r4(covar_samp(col("p_size"), col("p_retailprice"))).as("covar_samp_sp"),
            r4(corr(col("p_size"), col("p_retailprice"))).as("corr_sp"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand,
        ROUND(var_pop(p_size), 4) AS var_pop_size,
        ROUND(var_samp(p_size), 4) AS var_samp_size,
        ROUND(stddev_pop(p_size), 4) AS stddev_pop_size,
        ROUND(stddev_samp(p_size), 4) AS stddev_samp_size,
        ROUND(covar_pop(p_size, p_retailprice), 4) AS covar_pop_sp,
        ROUND(covar_samp(p_size, p_retailprice), 4) AS covar_samp_sp,
        ROUND(corr(p_size, p_retailprice), 4) AS corr_sp
        FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // SKEWNESS / KURTOSIS (:152-153). Spark's and DuckDB's builtins use
    // different estimators (population vs bias-corrected sample), so the
    // oracle-checked form computes population moments from integer power
    // sums — exact in double for int inputs, identical formula text in
    // both engines. Spark's builtins are asserted separately (rows-only).
    GQuery("q_agg_skew_kurt",
      (s, dir) => {
        val t = Tables(s, dir)
        val x = col("p_size").cast(DoubleType)
        t.part
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).cast(DoubleType).as("n"),
            sum(x).as("s1"), sum(x * x).as("s2"),
            sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
          .select(col("p_brand"),
            r6((col("s3") / col("n")
              - lit(3.0) * (col("s1") / col("n")) * (col("s2") / col("n"))
              + lit(2.0) * pow(col("s1") / col("n"), 3.0))
              / pow(col("s2") / col("n") - pow(col("s1") / col("n"), 2.0), 1.5))
              .as("skew_pop"),
            r6((col("s4") / col("n")
              - lit(4.0) * (col("s1") / col("n")) * (col("s3") / col("n"))
              + lit(6.0) * pow(col("s1") / col("n"), 2.0) * (col("s2") / col("n"))
              - lit(3.0) * pow(col("s1") / col("n"), 4.0))
              / pow(col("s2") / col("n") - pow(col("s1") / col("n"), 2.0), 2.0)
              - lit(3.0)).as("kurt_excess"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH s AS (SELECT p_brand,
          CAST(COUNT(*) AS DOUBLE) AS n,
          SUM(CAST(p_size AS DOUBLE)) AS s1,
          SUM(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)) AS s2,
          SUM(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)) AS s3,
          SUM(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)) AS s4
          FROM part GROUP BY p_brand)
        SELECT p_brand,
          ROUND((s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * POW(s1 / n, 3.0))
            / POW(s2 / n - POW(s1 / n, 2.0), 1.5), 6) AS skew_pop,
          ROUND((s4 / n - 4.0 * (s1 / n) * (s3 / n)
            + 6.0 * POW(s1 / n, 2.0) * (s2 / n) - 3.0 * POW(s1 / n, 4.0))
            / POW(s2 / n - POW(s1 / n, 2.0), 2.0) - 3.0, 6) AS kurt_excess
        FROM s ORDER BY p_brand""")),

    // BOOLAND / BOOLOR (:168-169).
    GQuery("q_agg_bool",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.groupBy(col("c_mktsegment"))
          .agg(
            bool_and(col("c_acctbal") > 0.0).as("all_pos"),
            bool_or(col("c_acctbal") > 9000.0).as("any_rich"),
            count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
        bool_and(c_acctbal > 0.0) AS all_pos,
        bool_or(c_acctbal > 9000.0) AS any_rich,
        COUNT(*) AS n
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ARRAYAGG / LISTAGG (:141-190) — sorted for determinism. The array
    // result is JSON-serialized: the driver's checker can't hash
    // array-typed cells (pandas ndarray), and Spark to_json / DuckDB
    // to_json agree byte-for-byte on string lists.
    GQuery("q_agg_collect",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.groupBy(col("n_regionkey"))
          .agg(
            to_json(sort_array(collect_list(col("n_name")))).as("names_json"),
            array_join(sort_array(collect_list(col("n_name"))), ",").as("names_csv"),
            count(lit(1)).as("n"))
          .orderBy(col("n_regionkey"))
      },
      Some("""SELECT n_regionkey,
        CAST(to_json(list_sort(list(n_name))) AS VARCHAR) AS names_json,
        string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
        COUNT(*) AS n
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // HISTOGRAM (:141-190) via explicit bucket arithmetic (identical in
    // both engines, unlike width_bucket which DuckDB lacks).
    GQuery("q_agg_histogram",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .withColumn("bucket", floor(col("l_quantity") / 5.0).cast(IntegerType))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT CAST(FLOOR(l_quantity / 5.0) AS INT) AS bucket, COUNT(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // HISTOGRAM aggregation function proper, both reference modes
    // (HistogramAggregationFunction.java:40-42): equal-width
    // histogram(col, 1, 51, 10) and explicit edges
    // histogram(col, ARRAY[1,5,10,30,51]); last bin closed. Counts
    // arrays serialized to csv for the driver's hash compare. One scan,
    // all bins are parallel partial-aggregated sum(when) counters.
    GQuery("q_agg_histogram_fn",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.functions.PinotFunctions.registerAll(s)
        t.lineitem.groupBy(col("l_returnflag")).agg(
          array_join(transform(expr("histogram(l_quantity, 1, 51, 10)"),
            _.cast(StringType)), ",").as("hist_eq_csv"),
          array_join(transform(
            expr("histogram(l_quantity, array(1, 5, 10, 30, 51))"),
            _.cast(StringType)), ",").as("hist_edges_csv"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH eq AS (
          SELECT l_returnflag, b.i,
            count(*) FILTER (WHERE l_quantity >= 1 + 5 * b.i
              AND (l_quantity < 1 + 5 * (b.i + 1)
                   OR (b.i = 9 AND l_quantity <= 51))) AS n
          FROM lineitem CROSS JOIN (SELECT unnest(range(0, 10)) AS i) b
          GROUP BY 1, 2),
        ed AS (
          SELECT l_returnflag, b.i,
            count(*) FILTER (WHERE l_quantity >= b.lo
              AND (l_quantity < b.hi OR (b.i = 3 AND l_quantity <= b.hi)))
              AS n
          FROM lineitem CROSS JOIN (
            SELECT * FROM (VALUES (0, 1, 5), (1, 5, 10), (2, 10, 30),
              (3, 30, 51)) AS t(i, lo, hi)) b
          GROUP BY 1, 2),
        eqc AS (SELECT l_returnflag,
            string_agg(CAST(n AS VARCHAR), ',' ORDER BY i) AS hist_eq_csv
          FROM eq GROUP BY 1),
        edc AS (SELECT l_returnflag,
            string_agg(CAST(n AS VARCHAR), ',' ORDER BY i) AS hist_edges_csv
          FROM ed GROUP BY 1)
        SELECT eqc.l_returnflag, hist_eq_csv, hist_edges_csv
        FROM eqc JOIN edc USING (l_returnflag) ORDER BY 1""")),

    // Exact percentiles (PERCENTILE, :122-139) — interpolated, matches
    // DuckDB quantile_cont.
    GQuery("q_agg_percentile",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.groupBy(col("l_returnflag"))
          .agg(
            r4(expr("percentile(l_quantity, 0.25)")).as("p25"),
            r4(expr("percentile(l_quantity, 0.5)")).as("p50"),
            r4(expr("percentile(l_quantity, 0.9)")).as("p90"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // SUMPRECISION (:72) — exact decimal output.
    GQuery("q_agg_sumprecision",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.groupBy(col("o_orderstatus"))
          .agg(sum(dec(col("o_totalprice"))).cast(DoubleType).as("sum_precise"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_precise
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // GROUPING SETS + ROLLUP + CUBE (AggregateNode.java:36-42,
    // RepeatOperator.java:53).
    GQuery("q_agg_groupingsets",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    GQuery("q_agg_rollup",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    GQuery("q_agg_cube",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // Sketch aggregates (HLL distinct count, approx percentile,
    // :88-139): approximate by design, so the oracle is a PROPERTY
    // check — the exact values (computable in both engines) plus
    // booleans asserting each estimate is within its published error
    // bound (HLL rsd 5% → 10% gate; KMV 1.04/√1024 ≈ 3% → 10% gate;
    // approx percentile accuracy 1000 → ±2 on a 1-50 domain). A
    // drifting sketch flips a boolean and the driver's hash catches it.
    GQuery("q_agg_approx",
      (s, dir) => {
        val t = Tables(s, dir)
        // countDistinct must NOT share an agg with the sketch aggregates:
        // Spark's distinct rewrite re-keys the partial stage by
        // (l_returnflag, l_partkey), so every sketch buffer (percentile
        // heap, HLL, KMV) would be built per PARTKEY and merged ~20k
        // times (measured 12.5s vs 0.5s apart at sf0.1). Two scans +
        // a 3-row broadcast join is the scale-safe shape.
        val base = t.lineitem
          .select(col("l_returnflag"), col("l_partkey"), col("l_quantity"))
        val exact = base.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
        exact.join(base.groupBy(col("l_returnflag"))
          .agg(
            r4(expr("percentile(l_quantity, 0.5)")).as("exact_p50"),
            approx_count_distinct(col("l_partkey")).as("adc"),
            percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("ap50"),
            graft.plans.KmvSketch.distinctCountKmv(col("l_partkey")).as("kmv")),
          Seq("l_returnflag"))
          .select(col("l_returnflag"),
            col("exact_distinct"), col("exact_p50"),
            (abs(col("adc") - col("exact_distinct")) <=
              col("exact_distinct") * 0.1).as("adc_ok"),
            (abs(col("ap50") - col("exact_p50")) <= 2.0).as("ap50_ok"),
            (abs(col("kmv") - col("exact_distinct")) <=
              col("exact_distinct") * 0.1).as("kmv_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_distinct,
        ROUND(quantile_cont(l_quantity, 0.5), 4) AS exact_p50,
        TRUE AS adc_ok, TRUE AS ap50_ok, TRUE AS kmv_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // MV aggregate long tail (DISTINCTSUMMV/DISTINCTAVGMV/PERCENTILEMV/
    // SUMARRAYLONG/DISTINCTCOUNTBITMAPMV): fixed-width numeric arrays
    // derived from document token lengths, mirrored element-for-element
    // in DuckDB via unnest/list arithmetic.
    GQuery("q_agg_mv2",
      (s, dir) => {
        val t = Tables(s, dir)
        val toks = TextFunctions.tokens(col("text"))
        val arr = transform(sequence(lit(0), lit(4)),
          i => coalesce(length(get(toks, i)), lit(0)))
        t.documents
          .select((col("doc_id") % 10).as("g"), arr.as("a"))
          .groupBy(col("g"))
          .agg(
            r4(expr("percentilemv(a, 50)")).as("p50_mv"),
            expr("distinctsummv(a)").as("dsum_mv"),
            r4(expr("distinctavgmv(a)")).as("davg_mv"),
            expr("distinctcountbitmapmv(a)").as("dcb_mv"),
            array_join(expr("sumarraylong(a)"), ",").as("sumarr_csv"))
          .orderBy(col("g"))
      },
      Some("""WITH d AS (SELECT doc_id % 10 AS g,
          list_transform(range(1, 6), i -> CASE
            WHEN len(list_filter(string_split(text, ' '), x -> len(x) > 0)) >= i
            THEN len(list_filter(string_split(text, ' '), x -> len(x) > 0)[i])
            ELSE 0 END) AS a
          FROM documents),
        ex AS (SELECT g, unnest(a) AS v FROM d)
        SELECT d2.g,
          ROUND(quantile_cont(ex.v, 0.5), 4) AS p50_mv,
          CAST(SUM(DISTINCT ex.v) AS DOUBLE) AS dsum_mv,
          ROUND(SUM(DISTINCT ex.v) * 1.0 / COUNT(DISTINCT ex.v), 4) AS davg_mv,
          CAST(COUNT(DISTINCT ex.v) AS INT) AS dcb_mv,
          (SELECT CAST(SUM(a[1]) AS BIGINT) || ',' || CAST(SUM(a[2]) AS BIGINT)
            || ',' || CAST(SUM(a[3]) AS BIGINT) || ',' || CAST(SUM(a[4]) AS BIGINT)
            || ',' || CAST(SUM(a[5]) AS BIGINT)
           FROM d WHERE d.g = d2.g) AS sumarr_csv
        FROM (SELECT DISTINCT g FROM d) d2 JOIN ex ON ex.g = d2.g
        GROUP BY d2.g ORDER BY d2.g""")),

    // Theta-family sketch SET ALGEBRA (reference
    // DistinctCountThetaSketchAggregationFunction setOperation params):
    // two KMV sketch blobs built over overlapping partkey ranges, then
    // |A∪B| / |A∩B| estimated FROM THE BLOBS ALONE (KmvSetOps) — the
    // oracle computes the exact set sizes and the query asserts the
    // estimates land within theta-sketch error bounds (k=1024 →
    // rse ≈ 3%; gated at 10% of the union).
    GQuery("q_agg_theta_setops",
      (s, dir) => {
        val t = Tables(s, dir)
        // tiny driver-side action: two ≤8 KiB sketch blobs (the blobs
        // ARE the point — set algebra without the raw data)
        val blobs = t.lineitem
          .select(col("l_partkey"),
            (col("l_partkey") <= 1200).as("in_a"),
            (col("l_partkey") >= 800).as("in_b"))
          .agg(
            graft.plans.KmvSketch.kmvState(when(col("in_a"), col("l_partkey")))
              .as("blob_a"),
            graft.plans.KmvSketch.kmvState(when(col("in_b"), col("l_partkey")))
              .as("blob_b"))
          .head()
        val (estU, estI, _) = graft.plans.KmvSetOps.estimate(
          blobs.getAs[Array[Byte]]("blob_a"),
          blobs.getAs[Array[Byte]]("blob_b"), k = 1024)
        t.lineitem.agg(
            countDistinct(when(col("l_partkey") <= 1200 ||
              col("l_partkey") >= 800, col("l_partkey"))).as("ex_union"),
            countDistinct(when(col("l_partkey") <= 1200 &&
              col("l_partkey") >= 800, col("l_partkey"))).as("ex_inter"))
          .select(col("ex_union"), col("ex_inter"),
            (abs(lit(estU) - col("ex_union")) <= col("ex_union") * 0.1)
              .as("union_ok"),
            (abs(lit(estI) - col("ex_inter")) <= col("ex_union") * 0.1)
              .as("inter_ok"))
      },
      Some("""SELECT
        COUNT(DISTINCT CASE WHEN l_partkey <= 1200 OR l_partkey >= 800
          THEN l_partkey END) AS ex_union,
        COUNT(DISTINCT CASE WHEN l_partkey <= 1200 AND l_partkey >= 800
          THEN l_partkey END) AS ex_inter,
        TRUE AS union_ok, TRUE AS inter_ok
        FROM lineitem""")),

    // Mergeable KLL quantile blobs (PERCENTILERAWKLL →
    // KLLMERGEPERCENTILE): per-(flag,status) sketch blobs re-merged to
    // per-flag must estimate the median within the sketch's rank-error
    // bound of the exact percentile, as must the direct single-pass
    // sketch. KLL merge is bound-preserving but not bit-associative, so
    // (unlike HLL) the gate is the error bound, not equality.
    GQuery("q_agg_kll_remerge",
      (s, dir) => {
        val t = Tables(s, dir)
        val direct = t.lineitem.groupBy(col("l_returnflag"))
          .agg(graft.plans.KllSketch.percentileKll(col("l_quantity"), 50.0)
              .as("est_direct"),
            r4(expr("percentile(l_quantity, 0.5)")).as("exact_p50"))
        val merged = t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.KllSketch.kllState(col("l_quantity")).as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.KllSketch.kllMergePercentile(col("blob"), 50.0)
            .as("est_merged"))
        direct.join(merged, "l_returnflag")
          .select(col("l_returnflag"), col("exact_p50"),
            (abs(col("est_direct") - col("exact_p50")) <= 2.0).as("direct_ok"),
            (abs(col("est_merged") - col("exact_p50")) <= 2.0).as("merged_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.5), 4) AS exact_p50,
        TRUE AS direct_ok, TRUE AS merged_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Mergeable t-digest blobs in the reference WIRE FORMAT
    // (PERCENTILERAWTDIGEST → TDIGESTMERGEPERCENTILE,
    // PercentileTDigestAggregationFunction.java + TDigestUtils.java
    // MergingDigest layout, byte-exactness unit-gated in
    // DigestWireFormatSpec): per-(flag,status) digests re-merged to
    // per-flag must land within the digest's rank-error envelope of
    // the exact median, as must the direct single-pass digest. Like
    // KLL, the merge is bound-preserving but not bit-associative, so
    // the gate is the error bound, not equality.
    GQuery("q_agg_tdigest_remerge",
      (s, dir) => {
        val t = Tables(s, dir)
        val direct = t.lineitem.groupBy(col("l_returnflag"))
          .agg(graft.plans.TDigestSketch
              .percentileTDigest(col("l_quantity"), 50.0).as("est_direct"),
            r4(expr("percentile(l_quantity, 0.5)")).as("exact_p50"))
        val merged = t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.TDigestSketch.tdigestState(col("l_quantity"))
            .as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.TDigestSketch
            .tdigestMergePercentile(col("blob"), 50.0).as("est_merged"))
        direct.join(merged, "l_returnflag")
          .select(col("l_returnflag"), col("exact_p50"),
            (abs(col("est_direct") - col("exact_p50")) <= 2.0).as("direct_ok"),
            (abs(col("est_merged") - col("exact_p50")) <= 2.0).as("merged_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.5), 4) AS exact_p50,
        TRUE AS direct_ok, TRUE AS merged_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Mergeable q-digest blobs in the reference WIRE FORMAT
    // (PERCENTILERAWEST → QDIGESTMERGEPERCENTILE,
    // PercentileEstAggregationFunction.java + QuantileDigest.java
    // trie layout, byte-exactness unit-gated in DigestWireFormatSpec).
    // The q-digest answer is a range UPPER bound with one-sided rank
    // error <= maxError (0.05), so the gate is rank-based: the
    // estimate's exact rank must sit in [p, p + maxError + slack].
    GQuery("q_agg_qdigest_remerge",
      (s, dir) => {
        val t = Tables(s, dir)
        val est = t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.QDigestSketch.qdigestState(col("l_partkey"))
            .as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.QDigestSketch
            .qdigestMergePercentile(col("blob"), 50.0).as("est_merged"))
        val ranks = t.lineitem.join(est, "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg((sum(when(col("l_partkey") <= col("est_merged"), 1)
            .otherwise(0)) / count(lit(1))).as("rank"),
            count(lit(1)).as("n"))
        ranks.select(col("l_returnflag"), col("n"),
            (col("rank") >= 0.5 && col("rank") <= 0.5 + 0.05 + 0.02)
              .as("rank_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n, TRUE AS rank_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Mergeable UltraLogLog blobs in the reference WIRE FORMAT
    // (DISTINCTCOUNT(RAW)ULL, DistinctCountULLAggregationFunction.java:
    // hash4j register layout framed [p][2^p registers], wyhash-final-4
    // value hashing — both byte-exactness-gated in
    // UltraLogLogWireSpec). Register merge is a position-wise OR, so
    // the re-merged estimate must be BIT-IDENTICAL to the direct
    // single-pass sketch, and the ML estimate must sit within the
    // p=12 accuracy envelope of the exact distinct count.
    GQuery("q_agg_ull_remerge",
      (s, dir) => {
        val t = Tables(s, dir)
        // r14 perf: the ULL sketch and the exact countDistinct are
        // SEPARATE aggregates joined on the group key. Mixing them in
        // one agg made Spark's distinct-rewrite group by
        // (l_returnflag, l_partkey) first, building a 4 KB ULL buffer
        // per DISTINCT KEY (60k sketches, 60k serialize+merge) instead
        // of one per group — measured 2.56 s → 0.50 s for identical
        // results (guide §2.3: aggregate before you shuffle; the
        // split shuffles 6 sketches instead of 60k).
        val direct = t.lineitem.groupBy(col("l_returnflag"))
          .agg(graft.plans.UltraLogLogSketch
            .distinctCountUll(col("l_partkey")).as("est_direct"))
          .join(t.lineitem.groupBy(col("l_returnflag"))
            .agg(countDistinct(col("l_partkey")).as("exact_n")),
            "l_returnflag")
        val merged = t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.UltraLogLogSketch.ullState(col("l_partkey"))
            .as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.UltraLogLogSketch.distinctCountUll(col("blob"))
            .as("est_merged"))
        direct.join(merged, "l_returnflag")
          .select(col("l_returnflag"), col("exact_n"),
            (col("est_merged") === col("est_direct")).as("bitwise_ok"),
            (abs(col("est_direct") - col("exact_n")) <=
              greatest(col("exact_n") * 0.05, lit(10.0))).as("est_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_n,
        TRUE AS bitwise_ok, TRUE AS est_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Mergeable HLL blobs (DISTINCTCOUNTRAWHLL → HLLMERGECOUNT,
    // DistinctCountRawHLLAggregationFunction.java): per-(flag,status)
    // sketch blobs re-merged to per-flag MUST give the bit-identical
    // estimate as a direct per-flag sketch (register max-merge is
    // associative) — the property that makes sketch-bearing rollup
    // tables answer distinct counts. The BENCHED query is sketch-only
    // (every arm flat at scale — round-2 probe showed the former exact
    // countDistinct arm dominating 14× at 10×); the estimate is gated
    // against Spark's independent HLL++ (cross-estimator agreement,
    // both rse ≈ 1.6% at these precisions). The exact-error property
    // of the estimator itself is unit-gated in ClearspringHllSpec and
    // the DuckDB oracle still carries the exact distinct count.
    GQuery("q_agg_hll_remerge",
      (s, dir) => {
        val t = Tables(s, dir)
        val direct = t.lineitem.groupBy(col("l_returnflag"))
          .agg(graft.plans.HllSketch.distinctCountHll(col("l_partkey"))
              .as("est_direct"),
            approx_count_distinct(col("l_partkey"), 0.016).as("est_hllpp"))
        val merged = t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.HllSketch.hllState(col("l_partkey")).as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.HllSketch.hllMergeCount(col("blob")).as("est_merged"))
        direct.join(merged, "l_returnflag")
          .select(col("l_returnflag"),
            (col("est_direct") === col("est_merged")).as("remerge_exact"),
            (abs(col("est_direct") - col("est_hllpp")) <=
              col("est_hllpp") * 0.1).as("hll_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        TRUE AS remerge_exact,
        (COUNT(DISTINCT l_partkey) >= 0) AS hll_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // RoaringBitmap distinct blobs (DISTINCTCOUNTBITMAP,
    // DistinctCountBitmapAggregationFunction.java:74-140): per-(flag,
    // status) serialized bitmaps re-aggregated per flag via the
    // reference's BYTES or-merge path must equal the direct bitmap
    // count — and for in-range LONG keys Long.hashCode(v) == v, so the
    // bitmap count IS the exact distinct count the oracle computes.
    // Blobs are the plain RoaringBitmap serialization the reference
    // ships between servers (wire-compat gated in IdSetWireSpec).
    GQuery("q_agg_bitmap_remerge",
      (s, dir) => {
        val t = Tables(s, dir)
        val direct = t.lineitem.groupBy(col("l_returnflag"))
          .agg(graft.plans.IdSetSketch.distinctCountBitmap(col("l_partkey"))
            .as("n_direct"))
        val merged = t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.plans.IdSetSketch.bitmapState(col("l_partkey"))
            .as("blob"))
          .groupBy(col("l_returnflag"))
          .agg(graft.plans.IdSetSketch.distinctCountBitmap(col("blob"))
            .as("n_merged"))
        direct.join(merged, "l_returnflag")
          .select(col("l_returnflag"), col("n_direct"),
            (col("n_direct") === col("n_merged")).as("remerge_exact"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_partkey) AS INT) AS n_direct,
        TRUE AS remerge_exact
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Integer-sum TUPLE sketch family (reference
    // DISTINCTCOUNTTUPLESKETCH / SUMVALUESINTEGERSUMTUPLESKETCH /
    // AVGVALUEINTEGERSUMTUPLESKETCH, IntegerTupleSketchAggregation
    // Function.java): per event_type, sketch keyed on user_id carrying
    // floor(value) as the summed integer. k=16384 ≫ distinct users, so
    // every estimate is EXACT and the DuckDB oracle can compute the
    // same values directly; the remerge leg re-aggregates stored blobs
    // (the rollup-table path) and must agree bit-for-bit.
    GQuery("q_agg_tuple_sketch",
      (s, dir) => {
        val t = Tables(s, dir)
        val vi = floor(col("value")).cast("long")
        val ev = t.events.select(col("event_type"), col("user_id"),
          vi.as("vi"), dayofmonth(col("ts")).as("sub"))
        val direct = ev.groupBy(col("event_type")).agg(
          graft.plans.TupleSketch.distinctCountTuple(col("user_id"), col("vi"))
            .as("distinct_users"),
          graft.plans.TupleSketch.sumValuesTuple(col("user_id"), col("vi"))
            .as("sum_values"),
          graft.plans.TupleSketch.avgValueTuple(col("user_id"), col("vi"))
            .as("avg_per_user"))
        val merged = ev.groupBy(col("event_type"), col("sub"))
          .agg(graft.plans.TupleSketch.tupleState(col("user_id"), col("vi"))
            .as("blob"))
          .groupBy(col("event_type"))
          .agg(graft.plans.TupleSketch.mergeSum(col("blob")).as("sum_merged"))
        direct.join(merged, "event_type")
          .select(col("event_type"), col("distinct_users"), col("sum_values"),
            col("avg_per_user"),
            (col("sum_values") === col("sum_merged")).as("remerge_exact"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
        COUNT(DISTINCT user_id) AS distinct_users,
        CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_values,
        CAST(FLOOR(SUM(CAST(FLOOR(value) AS BIGINT)) * 1.0
             / COUNT(DISTINCT user_id) + 0.5) AS BIGINT) AS avg_per_user,
        TRUE AS remerge_exact
        FROM events GROUP BY 1 ORDER BY 1""")),

    // FOURTHMOMENT + SUM0 (reference PinotFourthMoment, Calcite $SUM0):
    // 4th central moment from raw-power averages; rounded coarsely so
    // cross-engine double noise cannot flip the value. SUM0's empty→0
    // contract is exercised by an impossible FILTER clause.
    GQuery("q_agg_fourthmoment",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.functions.PinotFunctions.registerAll(s)
        t.lineitem.groupBy(col("l_returnflag")).agg(
          round(expr("fourthmoment(l_quantity)") / 1e5, 2).as("m4_e5"),
          expr("sum0(CASE WHEN l_quantity > 1e9 THEN l_quantity END)")
            .as("sum0_empty"),
          QH.dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        ROUND((AVG(POW(l_quantity,4)) - 4*AVG(l_quantity)*AVG(POW(l_quantity,3))
          + 6*POW(AVG(l_quantity),2)*AVG(POW(l_quantity,2))
          - 3*POW(AVG(l_quantity),4)) / 1e5, 2) AS m4_e5,
        0.0 AS sum0_empty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY 1 ORDER BY 1"""))
  )
}
