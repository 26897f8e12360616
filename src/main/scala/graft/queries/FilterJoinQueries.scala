package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.{AsOfJoin, BandJoin, SpatialJoin}
import QH._

/** Filter/predicate surface (reference `Predicate.java:29-41`: EQ, NOT_EQ,
  * IN, NOT_IN, RANGE, REGEXP_LIKE, TEXT_MATCH, JSON_MATCH, IS_NULL, …) and
  * the MSE join surface (`HashJoinOperator.java:47`,
  * `NonEquiJoinOperator.java:35`, `AsofJoinOperator.java:37`,
  * `LookupJoinOperator.java:56`).
  *
  * Scale notes: dimension joins are explicitly `broadcast()` (Pinot's
  * lookup join — replicated dim table); fact-fact equi-joins shuffle on
  * the join key only; the one theta join aggregates to a scalar so the
  * BNLJ never materializes its output.
  */
object FilterJoinQueries {

  val all: Seq[GQuery] = Seq(

    // AND/OR/NOT + IN + RANGE + BETWEEN predicates, pushed to the scan.
    GQuery("q_filter_basic",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter((col("l_returnflag") =!= "A" || col("l_linestatus") === "F")
            && col("l_quantity").between(5.0, 45.0)
            && col("l_linenumber").isin(1, 2, 3, 4)
            && !(col("l_discount") > 0.09))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price"))
      },
      Some("""SELECT COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS price
        FROM lineitem
        WHERE (l_returnflag <> 'A' OR l_linestatus = 'F')
          AND l_quantity BETWEEN 5.0 AND 45.0
          AND l_linenumber IN (1, 2, 3, 4)
          AND NOT (l_discount > 0.09)""")),

    // REGEXP_LIKE predicate (Predicate.java REGEXP_LIKE).
    GQuery("q_filter_regex",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.filter(col("p_type").rlike("^[A-Z]+ BRUSHED"))
          .select(col("p_partkey"), col("p_type"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_type FROM part
        WHERE regexp_matches(p_type, '^[A-Z]+ BRUSHED')
        ORDER BY p_partkey""")),

    // REGEXP_LIKE served from the value-dictionary INDEX — the FST
    // index analog (FstIndexType.java;
    // FSTBasedRegexpPredicateEvaluatorFactory.java:52-59 materializes
    // matching dictionary ids). The regex is evaluated once per
    // DISTINCT value over the written dictionary and the predicate
    // rewrites to an exact `p_type IN (...)` that pushes into the
    // parquet scan — used_index reads PushedFilters off the executed
    // plan, so a silent fall-through to the per-row regex scan fails
    // the gate. Oracle mirrors the plain regex semantics.
    GQuery("q_filter_regex_indexed",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.sql.QueryFacade.init(s, dir)
        graft.sources.RegexpIndex.register("part", t.part, "p_type")
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT p_partkey, p_type FROM part
             WHERE REGEXP_LIKE(p_type, '^(STAND|ECON)') AND p_size > 10
             ORDER BY p_partkey""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") &&
              (l.contains("In(p_type") || l.contains("EqualTo(p_type")))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""SELECT p_partkey, p_type, TRUE AS used_index FROM part
        WHERE regexp_matches(p_type, '^(STAND|ECON)') AND p_size > 10
        ORDER BY p_partkey""")),

    // LIKE / NOT LIKE through the same dictionary
    // (RegexpPatternConverterUtils.likeToRegexpLike routes LIKE into
    // the FST path): the infix LIKE — which parquet cannot serve from
    // stats — becomes an exact IN-list, and the NOT LIKE wraps its
    // leaf's IN-list in NOT (NULL semantics preserved: IN is NULL for
    // NULL input exactly as LIKE is).
    GQuery("q_filter_like_indexed",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.sql.QueryFacade.init(s, dir)
        graft.sources.RegexpIndex.register("part", t.part, "p_name")
        graft.sources.RegexpIndex.register("part", t.part, "p_brand")
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT p_partkey, p_name, p_brand FROM part
             WHERE p_name LIKE '%widget%' AND p_brand NOT LIKE 'Brand#1%'
             ORDER BY p_partkey""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") &&
              (l.contains("In(p_name") || l.contains("EqualTo(p_name")))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""SELECT p_partkey, p_name, p_brand, TRUE AS used_index
        FROM part
        WHERE p_name LIKE '%widget%' AND p_brand NOT LIKE 'Brand#1%'
        ORDER BY p_partkey""")),

    // TEXT_MATCH approximation: LIKE / contains scan
    // (TextMatchFilterOperator.java:38 — we map Lucene matches to
    // substring/regex scans per SURVEY §2.2).
    GQuery("q_filter_text",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .filter(col("text").contains("query") && col("text").like("%filter%"))
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_chars FROM documents
        WHERE text LIKE '%query%' AND text LIKE '%filter%'
        ORDER BY doc_id""")),

    // IS_NULL / IS_NOT_NULL (on a computed nullable: absent JSON key).
    GQuery("q_filter_null",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events.agg(
          count(when(get_json_object(col("props"), "$.missing").isNull, 1)).as("n_null"),
          count(when(get_json_object(col("props"), "$.k").isNotNull, 1)).as("n_k"))
      },
      Some("""SELECT
        COUNT(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NULL) AS n_null,
        COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL) AS n_k
        FROM events""")),

    // Expression filter (ExpressionFilterOperator.java) — predicate on a
    // computed expression.
    GQuery("q_filter_expr",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_extendedprice") * (lit(1.0) - col("l_discount")) > 50000.0)
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM lineitem
        WHERE l_extendedprice * (1.0 - l_discount) > 50000.0""")),

    // JSON_MATCH (JsonMatchFilterOperator.java:37): predicate on a JSON
    // column + group-by on an extracted key.
    GQuery("q_filter_json",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
          .filter(col("k") >= 50)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        GROUP BY event_type ORDER BY event_type""")),

    // JSON_MATCH as a SQL predicate through the facade (FilterKind
    // .JSON_MATCH; JsonMatchFilterOperator.java:37): the predicate
    // string compiles to a boolean expression via the facade rewrite.
    // Same oracle as the functional form.
    GQuery("q_filter_json_sql",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT event_type, COUNT(*) AS n,
               MAX(CAST(get_json_object(props, '$.k') AS INT)) AS max_k
             FROM events
             WHERE JSON_MATCH(props, '"$.k" >= 50')
             GROUP BY event_type ORDER BY event_type""")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        GROUP BY event_type ORDER BY event_type""")),

    // TIMESTAMP index (TimestampIndexUtils.java + RequestUtils.java:
    // 703-711): dateTrunc('day', ts) over a table with a configured DAY
    // granularity is overridden to the ingest-materialized $ts$DAY
    // column, so the predicate pushes into the scan. used_index is read
    // off the executed plan. EXACT oracle: DuckDB date_trunc.
    GQuery("q_filter_tsindex",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val indexed = graft.operators.IndexCache.getOrBuild(
          ("q_filter_tsindex", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_tsindex").toString
          graft.sources.TimestampIndex(
            Tables(s, dir).events.select(col("event_type"), col("ts")),
            "ts", Seq("DAY"))
            .write.mode("overwrite").parquet(s"$tmp/t")
          s.read.parquet(s"$tmp/t")
        }
        indexed.createOrReplaceTempView("events_tsindexed")
        graft.sources.TimestampIndex.registerTable(
          "events_tsindexed", "ts", Seq("DAY"))
        // 2024-01-02T00:00:00Z in epoch millis
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT event_type, count(*) AS n FROM events_tsindexed
             WHERE datetrunc('day', ts) = 1704153600000
             GROUP BY event_type ORDER BY event_type""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("ts$DAY"))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""SELECT event_type, COUNT(*) AS n, TRUE AS used_index
        FROM events
        WHERE date_trunc('day', ts) = TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY event_type ORDER BY event_type""")),

    // Time-predicate OPTIMIZER rewrite (TimePredicateFilterOptimizer
    // .java): dateTrunc-vs-literal comparisons invert to ranges on the
    // RAW time column — no index config required, unlike
    // q_filter_tsindex. Over a plain unindexed layout the rewritten
    // range pushes into the parquet scan; used_rewrite asserts BOTH
    // that no optimized Filter still evaluates DateTruncEpoch per row
    // AND that the raw ts range landed in PushedFilters.
    GQuery("q_filter_timepred",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val plain = graft.operators.IndexCache.getOrBuild(
          ("q_filter_timepred", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_timepred_plain").toString
          Tables(s, dir).events
            .select(col("event_type"), col("ts"), col("value"))
            .write.mode("overwrite").parquet(s"$tmp/t")
          s.read.parquet(s"$tmp/t")
        }
        plain.createOrReplaceTempView("events_timepred")
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT event_type, datetrunc('day', ts) AS day_ms,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sv
             FROM events_timepred
             WHERE datetrunc('day', ts) >= 1704153600000
               AND datetrunc('day', ts) < 1704326400000
             GROUP BY event_type, day_ms
             ORDER BY event_type, day_ms""")
        val truncInFilter = q.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
        }.exists(_.condition.exists(
          _.isInstanceOf[graft.plans.DateTruncEpoch]))
        val pushed = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l => l.contains("PushedFilters") &&
            l.matches(""".*\(ts[,)].*"""))
        q.withColumn("used_rewrite", lit(!truncInFilter && pushed))
      },
      Some("""SELECT event_type,
          (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sv,
          TRUE AS used_rewrite
        FROM events
        WHERE (epoch_ms(ts) // 86400000) * 86400000 >= 1704153600000
          AND (epoch_ms(ts) // 86400000) * 86400000 < 1704326400000
        GROUP BY event_type, day_ms
        ORDER BY event_type, day_ms""")),

    // JSON_MATCH over a SHREDDED ingest layout (the json-index analog:
    // JsonMatchFilterOperator.java:37 resolves the predicate from an
    // ingest-time flattened-path index instead of parsing documents).
    // Here ingest materializes $.k as a typed column; jsonMatch targets
    // it, so the predicate pushes into the parquet scan. used_shred is
    // read off the executed plan (PushedFilters on props__k) — a silent
    // fall-through to string parsing fails the gate. Same oracle as the
    // string-parse form.
    GQuery("q_filter_json_shred",
      (s, dir) => {
        val t = Tables(s, dir)
        // the shredded layout is an INGEST-TIME artifact (json index
        // build) — memoized per source dir; the query measures the
        // pruned-scan path, not the shred
        val shredded = graft.operators.IndexCache.getOrBuild(
          ("q_filter_json_shred", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_json_shred").toString
          graft.sources.JsonShred.ingestShredded(
            s, t.events.select(col("event_type"), col("props")),
            s"$tmp/events_shred", "props",
            Seq("$.k" -> IntegerType))
        }
        val filtered = shredded.filter(
          graft.sources.JsonShred.jsonMatch(shredded, "props", "\"$.k\" >= 50"))
        val usedShred = filtered.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("props__k"))
        filtered
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("props__k")).as("max_k"))
          .withColumn("used_shred", lit(usedShred))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        TRUE AS used_shred
        FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        GROUP BY event_type ORDER BY event_type""")),

    // MAP-column per-key index analog (MapKeyIndexReader.java,
    // ImmutableMapDataSource.java): dense map keys shredded to typed
    // top-level columns at ingest (MapShred — the JsonShred pattern),
    // so `mapValue(attrs,'k')` predicates push into the parquet scan;
    // the facade rewrites registered calls to the shredded columns in
    // BOTH predicate and projection positions. used_shred proves the
    // per-key comparison reached PushedFilters.
    GQuery("q_filter_map",
      (s, dir) => {
        val t = Tables(s, dir)
        val shredded = graft.operators.IndexCache.getOrBuild(
          ("q_filter_map", dir)) {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_map_shred").toString
          val withMap = t.events.select(col("event_id"),
            col("event_type"),
            map(lit("k"),
              get_json_object(col("props"), "$.k").cast("double"),
              lit("score"), col("value")).as("attrs"))
          graft.sources.MapShred.ingestShredded(s, withMap,
            s"$tmp/events_map", "attrs", Seq("k", "score"))
        }
        shredded.createOrReplaceTempView("events_map_t")
        graft.sources.MapShred.registerTable("events_map_t", "attrs",
          Seq("k", "score"))
        graft.sql.QueryFacade.init(s, dir)
        // (Pinot's ROUND(x, n) is round-to-nearest-MULTIPLE, so the
        // decimal-places rounding for oracle determinism happens on
        // the returned frame, not in the facade SQL)
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT event_type, count(*) AS n,
               max(mapValue(attrs, 'score')) AS max_score
             FROM events_map_t
             WHERE mapValue(attrs, 'k') >= 50
               AND mapValue(attrs, 'score') > 100
             GROUP BY event_type ORDER BY event_type""")
        val usedShred = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("attrs__k"))
        q.withColumn("max_score", round(col("max_score"), 4))
          .withColumn("used_shred", lit(usedShred))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        ROUND(MAX(value), 4) AS max_score, TRUE AS used_shred
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
          AND value > 100
        GROUP BY event_type ORDER BY event_type""")),

    // Inner equi-join chain with broadcast dims → group-by
    // (HashJoinOperator.java:47 + LookupJoinOperator.java:56).
    GQuery("q_join_inner",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // LEFT join keeping customers with zero orders.
    GQuery("q_join_left",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE), 0.0) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // FULL OUTER join of two aggregates (BaseJoinOperator.java FULL).
    GQuery("q_join_full",
      (s, dir) => {
        val t = Tables(s, dir)
        val cust = t.customer.filter(col("c_acctbal") > 5000.0)
          .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
        val supp = t.supplier.filter(col("s_acctbal") > 2000.0)
          .groupBy(col("s_nationkey").as("nk2")).agg(count(lit(1)).as("n_supp"))
        cust.join(supp, col("nk") === col("nk2"), "full")
          .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
            col("n_cust"), col("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH cust AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
          FROM customer WHERE c_acctbal > 5000.0 GROUP BY 1),
        supp AS (SELECT s_nationkey AS nk2, COUNT(*) AS n_supp
          FROM supplier WHERE s_acctbal > 2000.0 GROUP BY 1)
        SELECT COALESCE(nk, nk2) AS nationkey, n_cust, n_supp
        FROM cust FULL OUTER JOIN supp ON nk = nk2
        ORDER BY nationkey""")),

    // LEFT SEMI (EXISTS) — dynamic-broadcast semi-join analog
    // (PinotJoinToDynamicBroadcastRule.java).
    GQuery("q_join_semi",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.orders.filter(col("o_totalprice") > 200000.0)
        t.customer.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
        ORDER BY c_custkey""")),

    // LEFT ANTI (NOT EXISTS).
    GQuery("q_join_anti",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // Non-equi (theta) join (NonEquiJoinOperator.java:35). The naive
    // shape (crossJoin + <>) is nested-loop in the reference too, but
    // its pair count grows quadratically with scale — the 100-TB-safe
    // plan for a `<>` AGGREGATE is complement counting: |S|·|C| minus
    // the equi-join pair count, from per-key tallies (two tiny
    // aggregations + one broadcast join, no cross product ever). The
    // general banded non-equi JOIN (rows, not counts) is q_join_band.
    GQuery("q_join_theta",
      (s, dir) => {
        val t = Tables(s, dir)
        val sByK = t.supplier.groupBy(col("s_nationkey").as("k"))
          .agg(count(lit(1)).as("ns"))
        val cByK = t.customer.groupBy(col("c_nationkey").as("k"))
          .agg(count(lit(1)).as("nc"))
        val equal = sByK.join(broadcast(cByK), "k")
          .agg(coalesce(sum(col("ns") * col("nc")), lit(0L)).as("n_eq"))
        val totals = t.supplier.agg(count(lit(1)).as("n_s"))
          .crossJoin(t.customer.agg(count(lit(1)).as("n_c")))
        totals.crossJoin(equal)
          .select((col("n_s") * col("n_c") - col("n_eq")).as("n_pairs"))
      },
      Some("""SELECT COUNT(*) AS n_pairs FROM supplier, customer
        WHERE s_nationkey <> c_nationkey""")),

    // Banded range (interval) join — the scalable non-equi JOIN that
    // produces rows: |c_acctbal - s_acctbal| <= 1.0 via bucket banding
    // (operators/BandJoin.scala): candidates come from same/adjacent
    // buckets (3 equi-probes), never a cross product.
    GQuery("q_join_band",
      (s, dir) => {
        val t = Tables(s, dir)
        BandJoin.absDiffJoin(
            t.customer.select(col("c_custkey"), col("c_acctbal")),
            t.supplier.select(col("s_suppkey"), col("s_acctbal")),
            col("c_acctbal"), col("s_acctbal"), width = 1.0)
          .agg(count(lit(1)).as("n_pairs"),
            dsum(abs(col("c_acctbal") - col("s_acctbal"))).as("sum_absdiff"))
      },
      Some("""SELECT COUNT(*) AS n_pairs,
        CAST(SUM(CAST(abs(c_acctbal - s_acctbal) AS DECIMAL(20,4))) AS DOUBLE)
          AS sum_absdiff
        FROM customer, supplier WHERE abs(c_acctbal - s_acctbal) <= 1.0""")),

    // Lookup join (LOOKUP transform, TransformFunctionType.java:178):
    // fact → replicated dim chain via broadcast.
    GQuery("q_join_lookup",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("volume"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS volume
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ASOF join (AsofJoinOperator.java:37): for each click, the most
    // recent strictly-earlier purchase by the same user. Right side is
    // pre-deduped on (user_id, ts) so ties are impossible (reference ties
    // are nondeterministic, AsofJoinOperator.java:82).
    GQuery("q_join_asof",
      (s, dir) => {
        val t = Tables(s, dir)
        val clicks = t.events.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts"))
        val purchases = t.events.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        AsOfJoin.asofJoin(clicks, purchases,
            partitionKeys = Seq("user_id"),
            leftOrder = "ts", rightOrder = "ts",
            direction = "backward", allowExact = false,
            joinType = "left", rightPrefix = "p_")
          .select(col("user_id"), col("event_id"),
            col("p_purchase_id"), col("p_ts"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH clicks AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT c.user_id AS user_id, c.event_id AS event_id,
          p.purchase_id AS p_purchase_id, p.ts AS p_ts
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts > p.ts
        ORDER BY user_id, event_id""")),

    // Grid-bucketed spatial join (operators/SpatialJoin): points hash
    // to one grid cell each, regions explode over their bbox cover,
    // equi-join on the cell replaces the cross product, exact bbox
    // predicate filters. Oracle: DuckDB computes the same join as a
    // direct range join (regions × points is tiny at oracle scale).
    GQuery("q_join_spatial",
      (s, dir) => {
        val t = Tables(s, dir)
        val points = t.events.filter(col("event_id") <= 4000)
          .withColumn("px", (col("event_id") * 7919 % 10000) / 100.0)
          .withColumn("py", (col("event_id") * 104729 % 10000) / 100.0)
          .select(col("event_id"), col("px"), col("py"))
        val boxes = t.nation
          .withColumn("xmin", (col("n_nationkey") * 7 % 80).cast("double"))
          .withColumn("ymin", (col("n_nationkey") * 13 % 80).cast("double"))
          .withColumn("xmax", col("xmin") + 5 + col("n_nationkey") % 10)
          .withColumn("ymax", col("ymin") + 4 + col("n_nationkey") % 7)
          .select(col("n_nationkey"), col("xmin"), col("ymin"),
            col("xmax"), col("ymax"))
        SpatialJoin.pointInBox(points, "px", "py",
            boxes, "xmin", "ymin", "xmax", "ymax", cellSize = 10.0)
          .groupBy(col("n_nationkey"))
          .agg(count(lit(1)).as("n_points"),
            sum(col("event_id")).cast("long").as("id_sum"))
          .orderBy(col("n_nationkey"))
      },
      Some("""WITH pts AS (SELECT event_id,
            (event_id * 7919 % 10000) / 100.0 AS px,
            (event_id * 104729 % 10000) / 100.0 AS py
          FROM events WHERE event_id <= 4000),
        boxes AS (SELECT n_nationkey,
            CAST(n_nationkey * 7 % 80 AS DOUBLE) AS xmin,
            CAST(n_nationkey * 13 % 80 AS DOUBLE) AS ymin,
            CAST(n_nationkey * 7 % 80 AS DOUBLE) + 5 + n_nationkey % 10 AS xmax,
            CAST(n_nationkey * 13 % 80 AS DOUBLE) + 4 + n_nationkey % 7 AS ymax
          FROM nation)
        SELECT b.n_nationkey, COUNT(*) AS n_points,
               CAST(SUM(p.event_id) AS BIGINT) AS id_sum
        FROM boxes b JOIN pts p
          ON p.px >= b.xmin AND p.px < b.xmax
         AND p.py >= b.ymin AND p.py < b.ymax
        GROUP BY b.n_nationkey ORDER BY b.n_nationkey""")),

    // Radius join (SpatialJoin.pointsWithinRadius): grid cells of size
    // = radius, left explodes the fixed 9-cell neighborhood, equi-join
    // on the cell, exact squared-distance filter. Oracle: DuckDB
    // brute-forces the same pair set.
    GQuery("q_join_radius",
      (s, dir) => {
        val t = Tables(s, dir)
        val pts = t.events.filter(col("event_id") <= 1500)
          .withColumn("px", (col("event_id") * 7919 % 10000) / 100.0)
          .withColumn("py", (col("event_id") * 104729 % 10000) / 100.0)
        val l = pts.select(col("event_id").as("lid"),
          col("px").as("lx"), col("py").as("ly"))
        val r = pts.select(col("event_id").as("rid"),
          col("px").as("rx"), col("py").as("ry"))
        SpatialJoin.pointsWithinRadius(l, "lx", "ly", r, "rx", "ry",
            radius = 1.5)
          .filter(col("lid") < col("rid"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("lid")).cast("long").as("l_sum"),
            sum(col("rid")).cast("long").as("r_sum"))
      },
      Some("""WITH pts AS (SELECT event_id,
            (event_id * 7919 % 10000) / 100.0 AS px,
            (event_id * 104729 % 10000) / 100.0 AS py
          FROM events WHERE event_id <= 1500)
        SELECT COUNT(*) AS n_pairs,
               CAST(SUM(l.event_id) AS BIGINT) AS l_sum,
               CAST(SUM(r.event_id) AS BIGINT) AS r_sum
        FROM pts l JOIN pts r ON l.event_id < r.event_id
         AND (l.px - r.px) * (l.px - r.px)
           + (l.py - r.py) * (l.py - r.py) <= 2.25""")),

    // Cohort retention (the OLAP workload the reference's user-facing
    // analytics serve): cohort = first active week per user, retention
    // = distinct users active at each week offset. Pure composition of
    // native ops — two shuffles (distinct user-week, cohort join).
    GQuery("q_cohort_retention",
      (s, dir) => {
        val t = Tables(s, dir)
        val uw = t.events.select(col("user_id"),
          date_trunc("week", col("ts")).cast(DateType).as("wk")).distinct()
        val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
        uw.join(cohort, "user_id")
          .withColumn("week_offset",
            (datediff(col("wk"), col("cw")) / 7).cast("int"))
          .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
        SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
               CAST((uw.wk - c.cw) // 7 AS INT) AS week_offset,
               COUNT(DISTINCT uw.user_id) AS n_users
        FROM uw JOIN c ON uw.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
