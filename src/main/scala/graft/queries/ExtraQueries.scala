package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Sessionize, TimeSeries}
import graft.schema.PinotSchema
import QH._

/** Coverage for UNNEST (multi-array zip + null-padding), Pinot DEFAULT
  * null-handling mode, and the time-series range-query planner. */
object ExtraQueries {

  val all: Seq[GQuery] = Seq(

    // UNNEST with multi-array zip + null-pad semantics
    // (UnnestOperator.java:37-41) — arrays_zip + explode matches the
    // reference's null-padding; DuckDB's multi-unnest zips identically.
    GQuery("q_unnest",
      (s, dir) => {
        val t = Tables(s, dir)
        val toks = TextFunctions.tokens(col("text"))
        t.documents.filter(col("doc_id") <= 50)
          .select(col("doc_id"),
            slice(toks, 1, 3).as("a3"),
            slice(array_sort(array_distinct(toks)), 1, 5).as("b5"))
          .select(col("doc_id"), explode(arrays_zip(col("a3"), col("b5"))).as("z"))
          .select(col("doc_id"), col("z.a3").as("t1"), col("z.b5").as("t2"))
          .orderBy(col("doc_id"), col("t1").asc_nulls_first, col("t2").asc_nulls_first)
      },
      Some("""WITH base AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> len(x) > 0)[1:3] AS a3,
          list_sort(list_distinct(list_filter(string_split(text, ' '),
            x -> len(x) > 0)))[1:5] AS b5
          FROM documents WHERE doc_id <= 50)
        SELECT doc_id, unnest(a3) AS t1, unnest(b5) AS t2 FROM base
        ORDER BY doc_id, t1 ASC NULLS FIRST, t2 ASC NULLS FIRST""")),

    // Pinot DEFAULT null-handling mode (FieldSpec.java:80 — dimension
    // INT nulls become Integer.MIN_VALUE; QueryContext.java:500-505):
    // nulls from a missing JSON key are substituted before aggregation.
    GQuery("q_null_default_mode",
      (s, dir) => {
        val t = Tables(s, dir)
        val schema = PinotSchema.Schema("events_derived", Seq(
          PinotSchema.Field("k_missing", IntegerType, PinotSchema.Dimension),
          PinotSchema.Field("value", DoubleType, PinotSchema.Metric)))
        val derived = t.events.select(
          col("event_type"),
          get_json_object(col("props"), "$.missing").cast(IntegerType).as("k_missing"),
          when(col("value") > 100.0, col("value")).as("value"))
        schema.withDefaultNulls(derived)
          .groupBy(col("event_type"))
          .agg(min(col("k_missing")).as("min_k"),
            count(when(col("value") === 0.0, 1)).as("n_defaulted"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
        MIN(COALESCE(CAST(json_extract_string(props, '$.missing') AS INT),
          -2147483648)) AS min_k,
        COUNT(*) FILTER (WHERE COALESCE(
          CASE WHEN value > 100.0 THEN value END, 0.0) = 0.0) AS n_defaulted
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // CTE + correlated EXISTS + scalar subquery + IN subquery (MSE
    // WithStatements / FromExpressions / subquery decorrelation — SURVEY
    // §4.1; all stock Catalyst RewriteSubquery/decorrelation).
    GQuery("q_subquery_cte",
      (s, dir) => {
        Tables(s, dir).registerAll()
        s.sql("""
          WITH big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders
            WHERE o_totalprice > 150000.0)
          SELECT c_custkey, c_mktsegment,
            (SELECT COUNT(*) FROM big_orders b
              WHERE b.o_custkey = c.c_custkey) AS n_big
          FROM customer c
          WHERE c.c_nationkey IN (
              SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
            AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey)
          ORDER BY c_custkey""")
      },
      Some("""WITH big_orders AS (
          SELECT o_custkey, o_totalprice FROM orders
          WHERE o_totalprice > 150000.0)
        SELECT c_custkey, c_mktsegment,
          (SELECT COUNT(*) FROM big_orders b
            WHERE b.o_custkey = c.c_custkey) AS n_big
        FROM customer c
        WHERE c.c_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
          AND EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")),

    // RIGHT OUTER join (BaseJoinOperator.java RIGHT).
    GQuery("q_join_right",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.filter(col("o_totalprice") > 250000.0)
          .join(t.customer, col("o_custkey") === col("c_custkey"), "right")
          .groupBy(col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_big_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(o_orderkey) AS n_big_orders,
        COUNT(*) AS n_rows
        FROM (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
        RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Inverse + hyperbolic trig (:242-254 asin/acos/sinh/cosh/tanh/cot).
    GQuery("q_fn_trig2",
      (s, dir) => {
        val t = Tables(s, dir)
        val x = col("n_nationkey") / 25.0
        t.nation.select(col("n_nationkey"),
            r6(asin(x)).as("asin_x"),
            r6(acos(x)).as("acos_x"),
            r6(sinh(x)).as("sinh_x"),
            r6(cosh(x)).as("cosh_x"),
            r6(tanh(x)).as("tanh_x"),
            r6(lit(1.0) / tan(x + 0.1)).as("cot_x"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey,
        ROUND(ASIN(n_nationkey / 25.0), 6) AS asin_x,
        ROUND(ACOS(n_nationkey / 25.0), 6) AS acos_x,
        ROUND((EXP(n_nationkey / 25.0) - EXP(-(n_nationkey / 25.0))) / 2, 6) AS sinh_x,
        ROUND((EXP(n_nationkey / 25.0) + EXP(-(n_nationkey / 25.0))) / 2, 6) AS cosh_x,
        ROUND((EXP(2 * (n_nationkey / 25.0)) - 1) / (EXP(2 * (n_nationkey / 25.0)) + 1), 6) AS tanh_x,
        ROUND(1.0 / TAN(n_nationkey / 25.0 + 0.1), 6) AS cot_x
        FROM nation ORDER BY n_nationkey""")),

    // TEXT_MATCH predicate through the Lucene-subset compiler
    // (TextMatchFilterOperator.java:38): term AND phrase OR prefix,
    // under Lucene's CLASSIC-PARSER clause model — `query AND "the
    // stream" OR filter*` is one flat BooleanQuery where AND promotes
    // both its neighbors to MUST and `filter*` stays an optional
    // SHOULD (score-only once a MUST exists), so the filter is
    // query AND stream. The default analyzer stops English words
    // (TextIndexUtils.getAnalyzer), so the phrase's leading "the"
    // drops — the oracle mirrors both.
    GQuery("q_text_match",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .filter(graft.functions.TextMatch.textMatch(col("text"),
            "query AND \"the stream\" OR filter*"))
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id FROM documents
        WHERE list_contains(regexp_split_to_array(lower(text), '\W+'), 'query')
          AND list_contains(regexp_split_to_array(lower(text), '\W+'), 'stream')
        ORDER BY doc_id""")),

    // TEXT_MATCH served from the token-posting INDEX layout
    // (TextMatchFilterOperator.java:38 + the Lucene text index dir —
    // index-first candidates, forward-index re-check). The index is an
    // INGEST artifact (IndexCache-memoized, like q_filter_json_shred's
    // shred); the query measures the index-served path: term + prefix
    // leaves resolve on the dictionary, the phrase by POSITIONAL
    // adjacency, the AND takes the min-df bound, and the candidate ids
    // become a literal IN-list that prunes the parquet scan. used_index
    // is read off the executed plan (PushedFilters In(doc_id,...)) — a
    // silent fall-through to the scan fails the gate. Oracle mirrors
    // the exact scan semantics.
    GQuery("q_text_match_indexed",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.sql.QueryFacade.init(s, dir)
        graft.sources.TextIndex.register("documents",
          t.documents, "doc_id", "text")
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT doc_id FROM documents
             WHERE TEXT_MATCH(text, 'query AND "column key" AND filter*')
             ORDER BY doc_id""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("In(doc_id"))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""SELECT doc_id, TRUE AS used_index FROM documents
        WHERE list_contains(regexp_split_to_array(lower(text), '\W+'), 'query')
          AND regexp_matches(lower(text),
            '(^|[^a-z0-9_])column[^a-z0-9_]+key([^a-z0-9_]|$)')
          AND regexp_matches(lower(text), '(^|[^a-zA-Z0-9_])filter')
        ORDER BY doc_id""")),

    // MULTI-COLUMN text index (MultiColumnLuceneTextIndexCreator.java:
    // one Lucene index holds every configured column as its own field;
    // readers address fields by column name). Graft: ONE artifact +
    // ONE build for (text, source); the query serves BOTH predicates
    // from per-column views of the shared posting table — the plan
    // gate proves the doc_id IN-list pruned the scan.
    GQuery("q_text_match_multicol",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.sql.QueryFacade.init(s, dir)
        graft.sources.TextIndex.registerMulti("documents",
          t.documents, "doc_id", Seq("text", "source"))
        val q = graft.sql.QueryFacade.sql(s,
          """SET explicitLimit = true;
             SELECT doc_id FROM documents
             WHERE TEXT_MATCH(text, 'query AND "column key"')
               AND TEXT_MATCH(source, 'src7 src9 src11')
             ORDER BY doc_id""")
        val usedIndex = q.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("In(doc_id"))
        q.withColumn("used_index", lit(usedIndex))
      },
      Some("""SELECT doc_id, TRUE AS used_index FROM documents
        WHERE list_contains(regexp_split_to_array(lower(text), '\W+'), 'query')
          AND regexp_matches(lower(text),
            '(^|[^a-z0-9_])column[^a-z0-9_]+key([^a-z0-9_]|$)')
          AND (list_contains(regexp_split_to_array(lower(source), '\W+'), 'src7')
            OR list_contains(regexp_split_to_array(lower(source), '\W+'), 'src9')
            OR list_contains(regexp_split_to_array(lower(source), '\W+'), 'src11'))
        ORDER BY doc_id""")),

    // TEXT_MATCH long tail (lucene/): `term~N` fuzzy (FuzzyQuery,
    // Levenshtein ≤ N on any token), `"a b"~N` phrase proximity
    // (ordered, ≤ N intervening tokens), grouping PARENS, a wildcard
    // INSIDE a phrase (`"scan quer*"` — adjacent tokens, second
    // matched by prefix pattern: MultiPhrase/prefix-phrase), and a
    // `?` single-char wildcard term. The oracle mirrors fuzzy with
    // DuckDB's levenshtein over the token list and the wildcard
    // shapes with anchored regexes — independent formulations of the
    // same semantics.
    GQuery("q_text_match_fuzzy",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .filter(graft.functions.TextMatch.textMatch(col("text"),
            "(qery~1 OR \"stream processing\"~2) AND (\"scan quer*\" OR wind?w)"))
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id FROM documents
        WHERE (len(list_filter(regexp_split_to_array(lower(text), '\W+'),
                t -> levenshtein(t, 'qery') <= 1)) > 0
           OR regexp_matches(lower(text),
                '(^|[^a-z0-9_])stream([^a-z0-9_]+[a-z0-9_]+){0,2}[^a-z0-9_]+processing($|[^a-z0-9_])'))
          AND (regexp_matches(lower(text),
                '(^|[^a-z0-9_])scan[^a-z0-9_]+quer[a-z0-9_]*([^a-z0-9_]|$)')
           OR len(list_filter(regexp_split_to_array(lower(text), '\W+'),
                t -> regexp_matches(t, '^wind.w$'))) > 0)
        ORDER BY doc_id""")),

    // DATETIMECONVERT (TransformFunctionType dateTimeConvert): epoch-ms
    // input → 15-minute bucket → minutes-since-epoch output.
    GQuery("q_fn_dtconvert",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.filter(col("o_orderkey") <= 500)
          .select(col("o_orderkey"),
            graft.functions.DateTimeConvert.dateTimeConvert(
              unix_millis(col("o_orderdate").cast(TimestampType)),
              "1:MILLISECONDS:EPOCH", "1:MINUTES:EPOCH", "15:MINUTES").as("m15"),
            graft.functions.DateTimeConvert.dateTimeConvert(
              unix_millis(col("o_orderdate").cast(TimestampType)),
              "1:MILLISECONDS:EPOCH",
              "1:MILLISECONDS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH:00",
              "1:HOURS").as("hour_str"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
        (epoch_ms(o_orderdate) // 900000) * 900000 // 60000 AS m15,
        strftime(make_timestamp((epoch_ms(o_orderdate) // 3600000) * 3600000 * 1000),
          '%Y-%m-%d %H:00') AS hour_str
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // DATETIMECONVERTWINDOWHOP (TransformFunctionType.java:125,
    // BaseDateTimeWindowHopTransformer.hopWindows): the ARRAY of
    // hopping-window starts covering each event — 15-min granularity
    // within a 1-hour window ⇒ exactly 4 starts, floor-aligned,
    // stepping back by the granularity. Array serialized to a joined
    // string for the driver's checker; compiled to a native `sequence`
    // + `transform`, no explode.
    GQuery("q_fn_dtconvert_hop",
      (s, dir) => {
        val t = Tables(s, dir)
        val ms = unix_millis(col("ts").cast(TimestampType))
        t.events.filter(col("event_id") <= 2000)
          .select(col("event_id"),
            array_join(graft.functions.DateTimeConvert
              .dateTimeConvertWindowHop(ms, "1:MILLISECONDS:EPOCH",
                "1:MINUTES:EPOCH", "15:MINUTES", "1:HOURS")
              .cast(ArrayType(StringType)), ",").as("hops"),
            size(graft.functions.DateTimeConvert
              .dateTimeConvertWindowHop(ms, "1:MILLISECONDS:EPOCH",
                "1:MILLISECONDS:EPOCH", "30:MINUTES", "2:HOURS"))
              .as("n_hops_2h"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id,
          (epoch_ms(ts) // 900000) * 900000 AS b
          FROM events WHERE event_id <= 2000)
        SELECT event_id,
          (b // 60000)::VARCHAR || ',' || ((b - 900000) // 60000)::VARCHAR
            || ',' || ((b - 1800000) // 60000)::VARCHAR || ','
            || ((b - 2700000) // 60000)::VARCHAR AS hops,
          4 AS n_hops_2h
        FROM e ORDER BY event_id""")),

    // TIMESERIESBUCKET (TimeSeriesBucketTransformFunction.java:45-76):
    // the time-series engine's bucket index over 1-hour buckets starting
    // at firstBucketValue=1719800000s with a 60s offset — with
    // everything in MILLISECONDS, ((v + off − (first − size) − 1) /
    // size) truncated toward zero. Oracle mirrors the exact-multiple
    // truncation arithmetic.
    GQuery("q_fn_ts_bucket",
      (s, dir) => {
        val t = Tables(s, dir)
        val ms = unix_millis(col("ts").cast(TimestampType))
        t.events.filter(col("event_id") <= 2000)
          .select(col("event_id"),
            graft.functions.DateTimeConvert.timeSeriesBucket(
              ms, "MILLISECONDS", 1719800000L, 3600L, 60L).as("bucket_idx"))
          .orderBy(col("event_id"))
      },
      Some("""WITH n AS (SELECT event_id,
          epoch_ms(ts) + 60000 - (1719800000::BIGINT - 3600) * 1000 - 1
            AS num
          FROM events WHERE event_id <= 2000)
        SELECT event_id,
          ((num - (num % 3600000)) // 3600000)::INT AS bucket_idx
        FROM n ORDER BY event_id""")),

    // Scalar long-tail families (functions/ScalarTail.scala —
    // scalar/DateTimeFunctions, StringFunctions, ArithmeticFunctions,
    // UrlFunctions): epoch buckets, ISO dow/doy/week, calendar add,
    // left/right substr, strcmp, sigmoid, prefixes, URL cut/extract —
    // all exercised through the registered SQL names (selectExpr), the
    // same resolution path a Pinot-flavored query takes.
    GQuery("q_fn_scalar_tail",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events.filter(col("event_id") <= 2000)
          .withColumn("ms", unix_millis(col("ts").cast(TimestampType)))
          .withColumn("url",
            concat(lit("https://www.shop"),
              (col("event_id") % 10).cast(StringType),
              lit(".com/p/"), col("event_type"), lit("?u="),
              col("user_id").cast(StringType), lit("&x=1")))
          .selectExpr(
            "event_id",
            "toEpochDays(ms) AS epoch_day",
            "toEpochHoursBucket(ms, 6) AS hour6_bucket",
            "fromEpochDays(toEpochDays(ms)) AS day_floor_ms",
            "dow(ms) AS iso_dow",
            "doy(ms) AS day_of_year",
            "week(ms) AS week_no",
            "dateAddEpoch('MONTH', 1, ms) AS plus_month_ms",
            "dateDiffEpoch('DAY', 0, ms) AS days_since_epoch",
            "leftSubStr(event_type, 3) AS et3",
            "rightSubStr(event_type, 2) AS et_r2",
            "strcmp(event_type, 'click') AS cmp_click",
            "round(sigmoid(value), 4) AS sig_v",
            "arrayToString(prefixes(leftSubStr(event_type, 2)), ',') AS prefs",
            "cutQueryString(url) AS url_nq",
            "urlFirstSignificantSubdomain(url) AS url_sig",
            "arrayToString(extractURLParameterNames(url), ',') AS url_params")
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
          epoch_ms(ts) // 86400000 AS epoch_day,
          (epoch_ms(ts) // 3600000) // 6 AS hour6_bucket,
          (epoch_ms(ts) // 86400000) * 86400000 AS day_floor_ms,
          isodow(ts) AS iso_dow,
          dayofyear(ts) AS day_of_year,
          weekofyear(ts) AS week_no,
          epoch_ms(ts + INTERVAL 1 MONTH) AS plus_month_ms,
          epoch_ms(ts) // 86400000 AS days_since_epoch,
          substr(event_type, 1, 3) AS et3,
          right(event_type, 2) AS et_r2,
          CASE WHEN event_type < 'click' THEN -1
               WHEN event_type > 'click' THEN 1 ELSE 0 END AS cmp_click,
          ROUND(1.0 / (1.0 + exp(-value)), 4) AS sig_v,
          substr(event_type, 1, 1) || ',' || substr(event_type, 1, 2)
            AS prefs,
          'https://www.shop' || (event_id % 10) || '.com/p/' || event_type
            AS url_nq,
          'shop' || (event_id % 10) AS url_sig,
          'u,x' AS url_params
        FROM events WHERE event_id <= 2000 ORDER BY event_id""")),

    // LIKE / ILIKE / NOT LIKE / escape (Predicate.java RANGE/REGEXP
    // family; LexicalStructure suite analog).
    GQuery("q_fn_like",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.filter(col("p_partkey") <= 300)
          .select(col("p_partkey"),
            col("p_name").like("%al%").as("has_al"),
            col("p_name").ilike("%AL%").as("has_al_ci"),
            (!col("p_type").like("STANDARD%")).as("not_standard"),
            col("p_brand").like("Brand#_1").as("brand_x1"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        p_name LIKE '%al%' AS has_al,
        p_name ILIKE '%AL%' AS has_al_ci,
        p_type NOT LIKE 'STANDARD%' AS not_standard,
        p_brand LIKE 'Brand#_1' AS brand_x1
        FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""")),

    // SELECT DISTINCT + ORDER BY + LIMIT (DistinctOperator with a
    // bounded result — DistinctCombineOperator early-terminate path).
    GQuery("q_distinct_topk",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.select(col("l_partkey")).distinct()
          .orderBy(col("l_partkey").desc).limit(20)
      },
      Some("""SELECT DISTINCT l_partkey FROM lineitem
        ORDER BY l_partkey DESC LIMIT 20""")),

    // ORDER BY over a nullable computed key with explicit null ordering.
    GQuery("q_orderby_nulls",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events.filter(col("event_id") <= 200)
          .select(col("event_id"),
            when(col("value") > 150.0, col("value")).as("v_or_null"))
          .orderBy(col("v_or_null").desc_nulls_last, col("event_id").asc)
          .limit(50)
      },
      Some("""SELECT event_id,
        CASE WHEN value > 150.0 THEN value END AS v_or_null
        FROM events WHERE event_id <= 200
        ORDER BY v_or_null DESC NULLS LAST, event_id ASC LIMIT 50""")),

    // Gap-based sessionization (Sessionize.assignSessions): 30-minute
    // inactivity gap; session ids are per-user ordinals.
    GQuery("q_sessionize",
      (s, dir) => {
        val t = Tables(s, dir)
        Sessionize.assignSessions(t.events, "user_id", "ts", "event_id",
            gapMs = 30 * 60 * 1000L)
          .groupBy(col("user_id"))
          .agg(max(col("session_id")).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH o AS (SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
            THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions,
          COUNT(*) AS n_events
        FROM o GROUP BY user_id ORDER BY user_id""")),

    // Post-aggregation expressions + HAVING on them
    // (PostAggregationHandler.java, HavingFilterHandler.java): arithmetic
    // over aggregate results computed broker-side in the reference.
    GQuery("q_post_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_extendedprice")).as("rev"),
            dsum(col("l_quantity")).as("qty"),
            count(lit(1)).as("n"))
          .withColumn("rev_per_item", col("rev") / col("n"))
          .withColumn("price_per_unit", col("rev") / col("qty"))
          .filter(col("rev_per_item") > 30000.0)
          .select(col("l_returnflag"), col("l_linestatus"),
            col("rev_per_item"), col("price_per_unit"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""WITH a AS (SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS rev,
          CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty,
          COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, l_linestatus,
          rev / n AS rev_per_item, rev / qty AS price_per_unit
        FROM a WHERE rev / n > 30000.0
        ORDER BY l_returnflag, l_linestatus""")),

    // MV aggregates over a real array column (COUNTMV/MINMV/MAXMV,
    // AggregationFunctionType.java:205-240): exact picks only — no
    // float arithmetic — so values hash-match bitwise.
    GQuery("q_agg_mv",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings.groupBy(col("label"))
          .agg(
            sum(size(col("embedding"))).as("countmv"),
            min(array_min(col("embedding"))).as("minmv"),
            max(array_max(col("embedding"))).as("maxmv"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("label"))
      },
      Some("""SELECT label,
        CAST(SUM(len(embedding)) AS BIGINT) AS countmv,
        MIN(list_aggregate(embedding, 'min')) AS minmv,
        MAX(list_aggregate(embedding, 'max')) AS maxmv,
        COUNT(*) AS n_rows
        FROM embeddings GROUP BY label ORDER BY label""")),

    // GROUP BY on a multi-value column (reference
    // DictionaryBasedGroupKeyGenerator MV path: each row contributes
    // one group key PER ELEMENT) — Spark expresses the same semantic
    // as explode + groupBy. Top-20 with count+key tie-break so the
    // limit is deterministic cross-engine.
    GQuery("q_agg_mv_groupby",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .select(explode(TextFunctions.tokens(lower(col("text"))))
            .as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok").asc)
          .limit(20)
      },
      Some("""SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
            x -> len(x) > 0)) AS tok FROM documents)
        GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""")),

    // Type casting / coercion matrix (TypeCasting.json / TypeCoercion
    // .json suite analog).
    GQuery("q_typecast",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.filter(col("c_custkey") <= 100)
          .select(
            col("c_custkey"),
            col("c_custkey").cast(IntegerType).as("l2i"),
            col("c_custkey").cast(DoubleType).as("l2d"),
            col("c_custkey").cast(StringType).as("l2s"),
            col("c_acctbal").cast(StringType).as("d2s"),
            concat(col("c_custkey").cast(StringType), lit("#")).as("concat_ls"),
            (col("c_custkey") + col("c_nationkey")).as("l_plus_i"),
            (col("c_acctbal") > col("c_nationkey")).as("d_gt_i"),
            lit("41").cast(IntegerType).as("s2i"),
            lit("3.5").cast(DoubleType).as("s2d"),
            lit(1).cast(BooleanType).as("i2b"),
            lit(true).cast(IntegerType).as("b2i"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        CAST(c_custkey AS INT) AS l2i,
        CAST(c_custkey AS DOUBLE) AS l2d,
        CAST(c_custkey AS VARCHAR) AS l2s,
        CAST(c_acctbal AS VARCHAR) AS d2s,
        CAST(c_custkey AS VARCHAR) || '#' AS concat_ls,
        c_custkey + c_nationkey AS l_plus_i,
        c_acctbal > c_nationkey AS d_gt_i,
        CAST('41' AS INT) AS s2i,
        CAST('3.5' AS DOUBLE) AS s2d,
        CAST(1 AS BOOLEAN) AS i2b,
        CAST(true AS INT) AS b2i
        FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""")),

    // Boolean logic incl. IS TRUE family over nullable booleans
    // (BooleanLogic.json / NullHandling.json suite analog — three-valued
    // logic is SQL-compliant in both engines).
    GQuery("q_bool_logic",
      (s, dir) => {
        val t = Tables(s, dir)
        val b1 = col("value") > 100.0
        val b2 = get_json_object(col("props"), "$.missing").isNotNull &&
          lit(true) // stays false
        val bn = when(col("value") > 150.0, col("value") > 100.0) // nullable bool
        t.events.agg(
          count(when(b1 && !b2, 1)).as("n_and"),
          count(when(b1 || b2, 1)).as("n_or"),
          count(when(expr("(value > 150.0) IS NOT TRUE"), 1)).as("n_not_true"),
          count(when(bn.isNull, 1)).as("n_null_bool"),
          count(when(expr("CASE WHEN value > 150.0 THEN value > 100.0 END IS TRUE"), 1))
            .as("n_is_true"))
      },
      Some("""SELECT
        COUNT(*) FILTER (WHERE value > 100.0
          AND NOT (json_extract_string(props, '$.missing') IS NOT NULL AND true)) AS n_and,
        COUNT(*) FILTER (WHERE value > 100.0
          OR (json_extract_string(props, '$.missing') IS NOT NULL AND true)) AS n_or,
        COUNT(*) FILTER (WHERE (value > 150.0) IS NOT TRUE) AS n_not_true,
        COUNT(*) FILTER (WHERE (CASE WHEN value > 150.0 THEN value > 100.0 END) IS NULL)
          AS n_null_bool,
        COUNT(*) FILTER (WHERE (CASE WHEN value > 150.0 THEN value > 100.0 END) IS TRUE)
          AS n_is_true
        FROM events""")),

    // Composite integration query (reference cluster-IT style): joins
    // over the full star schema + CTE + window share-of-total + HAVING.
    GQuery("q_composite",
      (s, dir) => {
        val t = Tables(s, dir)
        val rev = t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("yr"))
        rev
          .withColumn("yr_total", sum(dec(col("revenue"))).over(w).cast(DoubleType))
          .withColumn("share", r6(col("revenue") / col("yr_total")))
          .filter(col("revenue") > 1000000.0)
          .select(col("n_name"), col("yr"), col("revenue"), col("share"))
          .orderBy(col("yr"), col("n_name"))
      },
      Some("""WITH rev AS (SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4)))
            AS DOUBLE) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        shared AS (SELECT n_name, yr, revenue,
          CAST(SUM(CAST(revenue AS DECIMAL(20,4))) OVER (PARTITION BY yr)
            AS DOUBLE) AS yr_total
          FROM rev)
        SELECT n_name, yr, revenue, ROUND(revenue / yr_total, 6) AS share
        FROM shared WHERE revenue > 1000000.0
        ORDER BY yr, n_name""")),

    // SUMMV/AVGMV with exact decimal arithmetic over array elements.
    GQuery("q_agg_summv",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings.groupBy(col("label"))
          .agg(
            sum(aggregate(col("embedding"), lit(BigDecimal(0)).cast(DecimalType(28, 10)),
              (acc, x) => (acc + x.cast(DecimalType(28, 10))).cast(DecimalType(28, 10))))
              .cast(DoubleType).as("summv0"),
            sum(size(col("embedding"))).as("n_elems"))
          .withColumn("summv", r6(col("summv0")))
          .withColumn("avgmv", r6(col("summv0") / col("n_elems")))
          .drop("summv0")
          .orderBy(col("label"))
      },
      Some("""SELECT label,
        ROUND(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE), 6) AS summv,
        CAST(COUNT(v) AS BIGINT) AS n_elems,
        ROUND(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(v), 6) AS avgmv
        FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
        GROUP BY label ORDER BY label""")),

    // Windowed percentile (aggregate function over a ROWS frame).
    GQuery("q_win_percentile",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Long.MinValue, 0)
        t.events.filter(col("event_id") <= 1000)
          .withColumn("run_median", r4(expr("percentile(value, 0.5)").over(w)))
          .select(col("user_id"), col("event_id"), col("run_median"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        ROUND(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
          ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_median
        FROM events WHERE event_id <= 1000
        ORDER BY user_id, event_id""")),

    // LISTAGG over DISTINCT values (sorted for determinism).
    GQuery("q_agg_listagg_distinct",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events.groupBy(col("user_id"))
          .agg(array_join(array_sort(collect_set(col("event_type"))), "|")
            .as("types_csv"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS types_csv
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // DISTINCTCOUNTMV: distinct elements across all arrays per group.
    GQuery("q_agg_distinctmv",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings.groupBy(col("label"))
          .agg(size(array_distinct(flatten(collect_list(col("embedding")))))
            .as("dcmv"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, CAST(COUNT(DISTINCT v) AS INT) AS dcmv
        FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
        GROUP BY label ORDER BY label""")),

    // LAG/LEAD/LAST_VALUE with IGNORE NULLS over a sparse column.
    GQuery("q_win_ignore_nulls",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val running = w.rowsBetween(Long.MinValue, 0)
        t.events.filter(col("event_id") <= 2000)
          .withColumn("sparse", when(col("value") > 150.0, col("value")))
          .withColumn("last_seen", last(col("sparse"), ignoreNulls = true).over(running))
          .withColumn("prev_seen", lag(col("sparse"), 1, null, ignoreNulls = true).over(w))
          .select(col("user_id"), col("event_id"), col("last_seen"), col("prev_seen"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        last_value(CASE WHEN value > 150.0 THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen,
        lag(CASE WHEN value > 150.0 THEN value END, 1 IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_seen
        FROM events WHERE event_id <= 2000
        ORDER BY user_id, event_id""")),

    // Hopping/sliding window (dateTimeConvertWindowHop): 2-hour windows
    // hopping hourly — each event lands in two windows.
    GQuery("q_ts_hopping",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("w_start"), col("event_type"), col("n"))
          .orderBy(col("w_start"), col("event_type"))
      },
      Some("""SELECT w_start, event_type, COUNT(*) AS n
        FROM (SELECT event_type,
          unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
            AS w_start
          FROM events)
        GROUP BY w_start, event_type ORDER BY w_start, event_type""")),

    // Null-safe equality join (is_not_distinct_from,
    // TransformFunctionType :69-95): NULL keys match each other.
    GQuery("q_join_nullsafe",
      (s, dir) => {
        val t = Tables(s, dir)
        val users = t.events.select(col("user_id")).distinct()
          .withColumn("k", when(col("user_id") < 3, lit(null).cast(LongType))
            .otherwise(col("user_id")))
        val a = users.select(col("user_id").as("ua"), col("k").as("ka"))
        val b = users.select(col("user_id").as("ub"), col("k").as("kb"))
        a.join(b, col("ka") <=> col("kb"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id,
          CASE WHEN user_id < 3 THEN NULL ELSE user_id END AS k FROM events)
        SELECT COUNT(*) AS n_pairs FROM u a JOIN u b
        ON a.k IS NOT DISTINCT FROM b.k""")),

    // Time-series range query (RangeTimeSeriesRequest: start/end/step)
    // via the TimeSeries planner — 2-hour buckets, per event_type tag.
    GQuery("q_ts_range",
      (s, dir) => {
        val t = Tables(s, dir)
        val start = 1704067200L // 2024-01-01T00:00:00Z
        TimeSeries.rangeQuery(
            t.events.withColumn("value", dec(col("value"))),
            TimeSeries.RangeRequest("ts", "value", TimeSeries.SumSeries,
              Seq("event_type"), start, start + 4 * 86400, 7200))
          .withColumn("value", r4(col("value").cast(DoubleType)))
          .orderBy(col("bucket"), col("event_type"))
      },
      Some("""SELECT make_timestamp((epoch_us(ts) // 7200000000) * 7200000000) AS bucket,
        event_type,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 4) AS value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts < TIMESTAMP '2024-01-05 00:00:00'
        GROUP BY 1, 2 ORDER BY bucket, event_type""")),

    // Time-series STRING front-end (M3QL pipeline language —
    // M3TimeSeriesPlanner.planQuery, RangeTimeSeriesRequest): parse
    // `fetch{...} | sum{tags} | transformNull{0}` and plan it; dense
    // bucket spine with zero fill, verified against a DuckDB spine.
    GQuery("q_ts_promql",
      (s, dir) => {
        val t = Tables(s, dir)
        val start = 1704067200L // 2024-01-01T00:00:00Z
        graft.operators.TimeSeriesQL.query(
            _ => t.events.withColumn("value", dec(col("value"))),
            """fetch{table="events", ts_column="ts", value="value"}
               | sum{event_type} | transformNull{0}""",
            start, start + 2 * 86400, 7200)
          .withColumn("value", r4(col("value")))
          .orderBy(col("bucket_seconds"), col("event_type"))
      },
      Some("""WITH spine AS (SELECT UNNEST(range(0, 25)) AS i),
        types AS (SELECT DISTINCT event_type FROM events
          WHERE epoch_us(ts) >= 1704067200000000
            AND epoch_us(ts) <= 1704240000000000),
        agg AS (SELECT CAST((epoch_us(ts) - 1704067200000000) // 7200000000 AS BIGINT) AS i,
            event_type, SUM(CAST(value AS DECIMAL(20,4))) AS v
          FROM events
          WHERE epoch_us(ts) >= 1704067200000000
            AND epoch_us(ts) <= 1704240000000000
          GROUP BY 1, 2)
        SELECT (1704067200 + spine.i * 7200) AS bucket_seconds,
          types.event_type AS event_type,
          ROUND(CAST(COALESCE(agg.v, 0) AS DOUBLE), 4) AS value
        FROM spine CROSS JOIN types
        LEFT JOIN agg ON agg.i = spine.i AND agg.event_type = types.event_type
        ORDER BY bucket_seconds, types.event_type""")),

    // The reference's VECTOR_SIMILARITY SQL predicate
    // (VectorSimilarityPredicate.java / VectorSimilarityFilterOperator
    // .java: "vectorSimilarity(col, q, 10) must return at most 10
    // docs", cosine): the facade rewrites the WHERE predicate to a
    // ranked subquery. EXACT oracle: DuckDB computes the same cosine
    // top-10 id set.
    GQuery("q_ann_sql_predicate",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("ARRAY[", ", ", "]")
        graft.sql.QueryFacade.sql(s,
          s"""SET explicitLimit = true;
              SELECT vec_id FROM embeddings
              WHERE VECTOR_SIMILARITY(embedding, $vec, 10)
              ORDER BY vec_id""")
      },
      Some {
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("[", ", ", "]")
        s"""WITH r AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
            list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]),
              CAST($vec AS DOUBLE[])), t -> t[1] * t[2]))
            / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
              x -> x * x))) DESC, vec_id ASC) AS rn
          FROM embeddings)
          SELECT vec_id FROM r WHERE rn <= 10 ORDER BY vec_id"""
      }),

    // The reference's VECTOR_SIMILARITY_RADIUS SQL predicate
    // (VectorSimilarityRadiusPredicate.java / VectorRadiusFilterOperator
    // .java:239-241: keep docs with distance <= threshold): the facade
    // rewrites the predicate in place to a cosine-distance filter, so
    // sibling conjuncts compose. EXACT oracle: DuckDB applies the same
    // distance threshold with full cosine arithmetic.
    GQuery("q_ann_radius_sql_predicate",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("ARRAY[", ", ", "]")
        graft.sql.QueryFacade.sql(s,
          s"""SET explicitLimit = true;
              SELECT vec_id FROM embeddings
              WHERE VECTOR_SIMILARITY_RADIUS(embedding, $vec, 0.8)
                AND vec_id <> 0
              ORDER BY vec_id""")
      },
      Some {
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("[", ", ", "]")
        s"""SELECT vec_id FROM embeddings
          WHERE (1 - list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]),
              CAST($vec AS DOUBLE[])), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
              x -> x * x)))
             * sqrt(list_sum(list_transform(CAST($vec AS DOUBLE[]),
              x -> x * x))))) <= 0.8
            AND vec_id <> 0
          ORDER BY vec_id"""
      }),

    // L2 (EUCLIDEAN) radius, INDEX-SERVED through HNSW: the threshold
    // is an L2 DISTANCE (the metric the column's index declares —
    // VectorIndexConfig.vectorDistanceFunction), served by the graph
    // radius reader on negated-distance scores with the exhaustion
    // contract (any early-terminated shard → exact-scan fallback,
    // which would flip mode_ok and fail the gate). Registered under a
    // dedicated view so the EUCLIDEAN registration never leaks into
    // the cosine-threshold queries. EXACT oracle: DuckDB applies the
    // same distance threshold (1.23 sits ≥2e-3 from every corpus
    // distance at the verify SF — far beyond float32/float64 noise).
    GQuery("q_ann_radius_l2",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val t = Tables(s, dir)
        t.embeddings.createOrReplaceTempView("embeddings_l2")
        graft.sql.QueryFacade.VectorIndexes.register(
          "embeddings_l2", t.embeddings, "vec_id", "embedding",
          distanceFunction = "EUCLIDEAN")
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("ARRAY[", ", ", "]")
        val q = graft.sql.QueryFacade.sql(s,
          s"""SET explicitLimit = true;
              SELECT vec_id FROM embeddings_l2
              WHERE VECTOR_SIMILARITY_RADIUS(embedding, $vec, 1.23)
              ORDER BY vec_id""")
        val mode = graft.sql.QueryFacade.VectorIndexes
          .lastMode("embeddings_l2", "embedding").getOrElse("")
        q.withColumn("mode_ok", lit(mode == "ANN_THRESHOLD_SCAN"))
      },
      Some {
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("[", ", ", "]")
        s"""SELECT vec_id, TRUE AS mode_ok FROM embeddings
          WHERE list_distance(CAST(embedding AS DOUBLE[]),
            CAST($vec AS DOUBLE[])) <= 1.23
          ORDER BY vec_id"""
      }),

    // Same predicate through IVF_FLAT: triangle-inequality cell
    // pruning (dist(probe, centroid) − coveringRadius > r ⟹ skip
    // cell) makes the search COMPLETE — no exhaustion signal, the
    // exact in-radius set by construction (IvfIndex.searchRadiusL2).
    GQuery("q_ann_radius_l2_ivf",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        val t = Tables(s, dir)
        t.embeddings.createOrReplaceTempView("embeddings_l2ivf")
        graft.sql.QueryFacade.VectorIndexes.register(
          "embeddings_l2ivf", t.embeddings, "vec_id", "embedding",
          distanceFunction = "EUCLIDEAN", vectorIndexType = "IVF_FLAT")
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("ARRAY[", ", ", "]")
        val q = graft.sql.QueryFacade.sql(s,
          s"""SET explicitLimit = true;
              SELECT vec_id FROM embeddings_l2ivf
              WHERE VECTOR_SIMILARITY_RADIUS(embedding, $vec, 1.23)
              ORDER BY vec_id""")
        val mode = graft.sql.QueryFacade.VectorIndexes
          .lastMode("embeddings_l2ivf", "embedding").getOrElse("")
        q.withColumn("mode_ok", lit(mode == "ANN_THRESHOLD_SCAN"))
      },
      Some {
        val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("[", ", ", "]")
        s"""SELECT vec_id, TRUE AS mode_ok FROM embeddings
          WHERE list_distance(CAST(embedding AS DOUBLE[]),
            CAST($vec AS DOUBLE[])) <= 1.23
          ORDER BY vec_id"""
      }),

    // M3QL transform stages beyond plain agg+fill (the plugin's
    // series-function surface): increase{} (delta vs previous bucket,
    // null first bucket) piped into topk{3} (keep the 3 series with
    // the largest range-total, ties by tag asc). EXACT oracle: DuckDB
    // replays the dense spine, LAG delta, and the ranked keep set.
    GQuery("q_ts_transforms",
      (s, dir) => {
        val t = Tables(s, dir)
        val start = 1704067200L // 2024-01-01T00:00:00Z
        graft.operators.TimeSeriesQL.query(
            _ => t.events.withColumn("value", dec(col("value"))),
            """fetch{table="events", ts_column="ts", value="value"}
               | sum{event_type} | transformNull{0} | increase{} | topk{3}""",
            start, start + 2 * 86400, 7200)
          .withColumn("value", r4(col("value")))
          .orderBy(col("bucket_seconds"), col("event_type"))
      },
      Some("""WITH spine AS (SELECT UNNEST(range(0, 25)) AS i),
        types AS (SELECT DISTINCT event_type FROM events
          WHERE epoch_us(ts) >= 1704067200000000
            AND epoch_us(ts) <= 1704240000000000),
        agg AS (SELECT CAST((epoch_us(ts) - 1704067200000000) // 7200000000 AS BIGINT) AS i,
            event_type, SUM(CAST(value AS DECIMAL(20,4))) AS v
          FROM events
          WHERE epoch_us(ts) >= 1704067200000000
            AND epoch_us(ts) <= 1704240000000000
          GROUP BY 1, 2),
        dense AS (SELECT spine.i AS i, types.event_type AS event_type,
            CAST(COALESCE(agg.v, 0) AS DOUBLE) AS v
          FROM spine CROSS JOIN types
          LEFT JOIN agg ON agg.i = spine.i AND agg.event_type = types.event_type),
        inc AS (SELECT i, event_type,
            v - LAG(v) OVER (PARTITION BY event_type ORDER BY i) AS v
          FROM dense),
        tot AS (SELECT event_type, SUM(v) AS total FROM inc GROUP BY 1),
        keep AS (SELECT event_type FROM tot
          ORDER BY total DESC, event_type ASC LIMIT 3)
        SELECT (1704067200 + i * 7200) AS bucket_seconds, inc.event_type,
          ROUND(v, 4) AS value
        FROM inc JOIN keep USING (event_type)
        ORDER BY bucket_seconds, event_type""")),

    // SQL-name funnel aggregate (graft.plans.FunnelWindowAgg): the
    // reference's FUNNELMAXSTEP(ts, windowSize, numSteps, steps...)
    // call shape (FunnelBaseAggregationFunction.java:33-77), verified
    // against the greedy step-chain oracle over ALL users (untagged
    // users score 0).
    GQuery("q_funnel_agg_sql",
      (s, dir) => {
        Tables(s, dir).registerAll()
        s.sql("""SELECT user_id,
            funnelmaxstep(unix_millis(CAST(ts AS TIMESTAMP)), 172800000, 3,
              event_type = 'signup', event_type = 'click',
              event_type = 'purchase') AS max_step
          FROM events GROUP BY user_id ORDER BY user_id""")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type
          FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
        u AS (SELECT DISTINCT user_id FROM events),
        a AS (SELECT user_id, ts AS ts1 FROM ev WHERE event_type = 'signup'),
        s2 AS (SELECT a.user_id, a.ts1, MIN(e.ts) AS ts2 FROM a JOIN ev e
          ON e.user_id = a.user_id AND e.event_type = 'click'
          AND e.ts >= a.ts1 AND e.ts < a.ts1 + 172800000 GROUP BY 1, 2),
        s3 AS (SELECT s2.user_id, s2.ts1, s2.ts2, MIN(e.ts) AS ts3
          FROM s2 JOIN ev e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
          AND e.ts >= s2.ts2 AND e.ts < s2.ts1 + 172800000 GROUP BY 1, 2, 3)
        SELECT u.user_id,
          CASE WHEN u.user_id IN (SELECT user_id FROM s3) THEN 3
               WHEN u.user_id IN (SELECT user_id FROM s2) THEN 2
               WHEN u.user_id IN (SELECT user_id FROM a) THEN 1
               ELSE 0 END AS max_step
        FROM u ORDER BY user_id""")),

    // FUNNELCOUNT set-intersection semantics (funnel/
    // FunnelCountAggregationFunction.java + SetMergeStrategy.java:30-44):
    // step k = distinct correlation ids present in ALL of steps 1..k,
    // no time ordering — exactly mirrorable with INTERSECT.
    GQuery("q_funnel_setcount",
      (s, dir) => {
        Tables(s, dir).registerAll()
        s.sql("""SELECT pos AS step_idx, n AS n_entities
          FROM (SELECT funnelcount(user_id, 3,
              event_type = 'signup', event_type = 'click',
              event_type = 'purchase') AS fc FROM events)
          LATERAL VIEW posexplode(fc) t AS pos, n
          ORDER BY step_idx""")
      },
      Some("""WITH s1 AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'signup'),
          s2 AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'click'),
          s3 AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'),
          i2 AS (SELECT user_id FROM s1 INTERSECT SELECT user_id FROM s2),
          i3 AS (SELECT user_id FROM i2 INTERSECT SELECT user_id FROM s3)
        SELECT 0 AS step_idx, (SELECT COUNT(*) FROM s1) AS n_entities
        UNION ALL SELECT 1, (SELECT COUNT(*) FROM i2)
        UNION ALL SELECT 2, (SELECT COUNT(*) FROM i3)
        ORDER BY step_idx""")),

    // TIMESERIESAGGREGATE (TimeSeriesAggregationFunction.java:235):
    // 24 hourly buckets over day 1, bucket index mirroring the
    // reference's ((t + offset) - referencePoint - 1) / divisor in raw
    // millis. Strictly-after-midnight filter keeps the index
    // arithmetic in non-negative territory where trunc == floor, so
    // the DuckDB // (floor) mirror is exact.
    GQuery("q_ts_sql_agg",
      (s, dir) => {
        Tables(s, dir).registerAll()
        s.sql("""WITH src AS (SELECT value,
              unix_millis(CAST(ts AS TIMESTAMP)) AS t FROM events
            WHERE unix_millis(CAST(ts AS TIMESTAMP)) > 1704067200000
              AND unix_millis(CAST(ts AS TIMESTAMP)) <= 1704153600000),
          agg AS (SELECT
              timeseriesaggregate('m3ql', 'COUNT', value, t, 'MILLISECONDS',
                0, 1704070800, 3600, 24, '') AS cnt,
              timeseriesaggregate('m3ql', 'SUM', value, t, 'MILLISECONDS',
                0, 1704070800, 3600, 24, '') AS sums
            FROM src)
          SELECT pos AS bucket_idx, CAST(c AS BIGINT) AS n_events,
            ROUND(sums[pos], 4) AS sum_v
          FROM agg LATERAL VIEW posexplode(cnt) t AS pos, c
          ORDER BY bucket_idx""")
      },
      Some("""WITH e AS (SELECT epoch_ms(ts) AS t, value FROM events
            WHERE epoch_ms(ts) > 1704067200000
              AND epoch_ms(ts) <= 1704153600000),
          b AS (SELECT CAST((t - 1704067200000 - 1) // 3600000 AS INTEGER)
              AS bucket_idx, value FROM e),
          g AS (SELECT bucket_idx, COUNT(*) AS n_events,
              ROUND(SUM(value), 4) AS sum_v
            FROM b GROUP BY bucket_idx),
          spine AS (SELECT unnest(range(0, 24)) AS bucket_idx)
        SELECT CAST(spine.bucket_idx AS INTEGER) AS bucket_idx,
          COALESCE(g.n_events, 0) AS n_events,
          COALESCE(g.sum_v, 0.0) AS sum_v
        FROM spine LEFT JOIN g ON g.bucket_idx = spine.bucket_idx
        ORDER BY bucket_idx""")),

    // Incremental MV maintenance (reference MaterializedViewTask,
    // MaterializedViewTaskExecutor.java:96): the MV is built one time
    // window at a time (MaterializedView.compute per day — the same
    // aggregation APPEND/OVERWRITE write per partition), and the union
    // of the window partitions must answer the rollup query with
    // exactly the totals of a direct aggregation over the same range —
    // the invariant windowed maintenance preserves. n_windows proves
    // the result really is assembled from 3 per-day partitions.
    GQuery("q_mv_task",
      (s, dir) => {
        val t = Tables(s, dir)
        val day = 86400L * 1000L
        val w0 = 1704067200000L // 2024-01-01T00:00:00Z
        val d = graft.sources.MaterializedView.ViewDef("ts", day,
          Seq("event_type"),
          Seq(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sv")))
        val mv = (0 until 3)
          .map(i => graft.sources.MaterializedView.compute(t.events, d, w0 + i * day))
          .reduce(_ unionAll _)
        mv.groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n_events"),
            r4(sum(col("sv")).cast(DoubleType)).as("sum_v"),
            countDistinct(col("window_start_ms")).as("n_windows"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 4) AS sum_v,
        COUNT(DISTINCT date_trunc('day', ts)) AS n_windows
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts < TIMESTAMP '2024-01-04 00:00:00'
        GROUP BY 1 ORDER BY 1""")),

    // Percentile-from-rollup (the star-tree agg-pair contract,
    // StarTreeUtils.java:55-178: any agg whose intermediate merges —
    // which includes the wire-format t-digest): a PERCENTILETDIGEST
    // query over the fact table is answered from a rollup table's
    // stored td blobs via TDigestMergeAgg. used_rollup is read off the
    // optimized plan (the td_ column only exists in the rollup scan),
    // so a silent fall-through to the fact scan fails the gate.
    GQuery("q_rollup_tdigest",
      (s, dir) => {
        val t = Tables(s, dir)
        // the rollup is an INGEST-TIME artifact (star-tree build), so
        // it is memoized per source dir like the ANN indexes — the
        // query pays lookup + merge, not the build
        val (fact, spec) = graft.operators.IndexCache.getOrBuild(
          ("q_rollup_tdigest", dir)) {
          // DURABLE star-tree analog: fact projection + rollup persist
          // under the lineitem table's index store keyed by its file
          // fingerprint — a fresh process LOADS both (loadRollup, no
          // aggregation job) instead of rebuilding per JVM.
          val src = t.lineitem
            .select(col("l_returnflag"), col("l_linestatus"),
              col("l_quantity"))
          val located = graft.sources.IndexStore.getOrBuild(src,
            "rollup", "q_rollup_tdigest", Seq("v1", "td")) { d =>
            src.write.mode("overwrite").parquet(s"$d/fact")
            val f0 = s.read.parquet(s"$d/fact")
            graft.plans.RollupRewrite.buildRollup(s, f0,
              graft.plans.RollupRewrite.pathOf(f0).get,
              dims = Seq("l_returnflag", "l_linestatus"),
              measures = Seq("l_quantity"),
              outPath = s"$d/rollup",
              tdigestMeasures = Seq("l_quantity"))
            ()
          }
          val base = located match {
            case Some(l) => l.dir
            case None =>
              val tmp = java.nio.file.Files
                .createTempDirectory("graft_rollup_q").toString
              src.write.mode("overwrite").parquet(s"$tmp/fact")
              val f0 = s.read.parquet(s"$tmp/fact")
              graft.plans.RollupRewrite.buildRollup(s, f0,
                graft.plans.RollupRewrite.pathOf(f0).get,
                dims = Seq("l_returnflag", "l_linestatus"),
                measures = Seq("l_quantity"),
                outPath = s"$tmp/rollup",
                tdigestMeasures = Seq("l_quantity"))
              tmp
          }
          val f = s.read.parquet(s"$base/fact")
          val sp = graft.plans.RollupRewrite.loadRollup(s,
            graft.plans.RollupRewrite.pathOf(f).get, s"$base/rollup",
            dims = Seq("l_returnflag", "l_linestatus"),
            measures = Seq("l_quantity"),
            tdigestMeasures = Seq("l_quantity"))
          (f, sp)
        }
        graft.plans.RollupRewrite.register(s, spec)
        val est = fact.groupBy(col("l_returnflag"))
          .agg(graft.plans.TDigestSketch
            .percentileTDigest(col("l_quantity"), 50.0).as("est"))
        val usedRollup = est.queryExecution.optimizedPlan.toString
          .contains("td_l_quantity")
        val exact = fact.groupBy(col("l_returnflag"))
          .agg(r4(expr("percentile(l_quantity, 0.5)")).as("exact_p50"))
        est.join(exact, "l_returnflag")
          .select(col("l_returnflag"), col("exact_p50"),
            (abs(col("est") - col("exact_p50")) <= 2.0).as("est_ok"),
            lit(usedRollup).as("used_rollup"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.5), 4) AS exact_p50,
        TRUE AS est_ok, TRUE AS used_rollup
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Set-sketch-from-rollup — completes the star-tree agg-pair
    // contract (StarTreeUtils.java:55-178 accepts ANY mergeable
    // intermediate) for the theta/tuple/CPC family: DISTINCTCOUNT
    // THETA/CPC and SUMVALUESINTEGERSUMTUPLESKETCH queries over the
    // fact table are answered from a rollup's stored blobs via the
    // union-merge aggregates. theta/tuple are EXACT below nominal
    // entries (l_suppkey cardinality ≪ 16384); CPC is probabilistic,
    // gated by a 5% tolerance boolean. used_rollup is read off the
    // optimized plan (the theta_ column only exists in the rollup).
    GQuery("q_rollup_theta",
      (s, dir) => {
        val t = Tables(s, dir)
        val (fact, spec) = graft.operators.IndexCache.getOrBuild(
          ("q_rollup_theta", dir)) {
          val src = t.lineitem
            .select(col("l_returnflag"), col("l_linestatus"),
              col("l_suppkey"), col("l_linenumber"))
          def buildInto(d: String): Unit = {
            src.write.mode("overwrite").parquet(s"$d/fact")
            val f0 = s.read.parquet(s"$d/fact")
            graft.plans.RollupRewrite.buildRollup(s, f0,
              graft.plans.RollupRewrite.pathOf(f0).get,
              dims = Seq("l_returnflag", "l_linestatus"),
              measures = Seq("l_linenumber"),
              outPath = s"$d/rollup",
              thetaMeasures = Seq("l_suppkey"),
              cpcMeasures = Seq("l_suppkey"),
              tupleMeasures = Seq(("l_suppkey", "l_linenumber")))
            ()
          }
          val base = graft.sources.IndexStore.getOrBuild(src,
            "rollup", "q_rollup_theta", Seq("v1", "theta"))(buildInto)
            .map(_.dir).getOrElse {
              val tmp = java.nio.file.Files
                .createTempDirectory("graft_rollup_th").toString
              buildInto(tmp); tmp
            }
          val f = s.read.parquet(s"$base/fact")
          val sp = graft.plans.RollupRewrite.loadRollup(s,
            graft.plans.RollupRewrite.pathOf(f).get, s"$base/rollup",
            dims = Seq("l_returnflag", "l_linestatus"),
            measures = Seq("l_linenumber"),
            thetaMeasures = Seq("l_suppkey"),
            cpcMeasures = Seq("l_suppkey"),
            tupleMeasures = Seq(("l_suppkey", "l_linenumber")))
          (f, sp)
        }
        graft.plans.RollupRewrite.register(s, spec)
        val est = fact.groupBy(col("l_returnflag"))
          .agg(graft.plans.ThetaSketchDs
              .distinctCountTheta(col("l_suppkey")).as("theta_distinct"),
            graft.plans.ThetaSketchDs
              .distinctCountCpc(col("l_suppkey")).as("cpc_est"),
            graft.plans.TupleSketch.sumValuesTuple(
              col("l_suppkey"), col("l_linenumber")).as("tuple_sum"))
        val plan = est.queryExecution.optimizedPlan.toString
        val usedRollup = plan.contains("theta_l_suppkey") &&
          plan.contains("cpc_l_suppkey") &&
          plan.contains("tuple_l_suppkey_l_linenumber")
        val exact = fact.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_suppkey")).as("__nd"))
        est.join(exact, "l_returnflag")
          .select(col("l_returnflag"), col("theta_distinct"),
            (abs(col("cpc_est") - col("__nd")) <=
              col("__nd") * 0.05).as("cpc_ok"),
            col("tuple_sum"),
            lit(usedRollup).as("used_rollup"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS theta_distinct,
        TRUE AS cpc_ok,
        CAST(SUM(l_linenumber) AS BIGINT) AS tuple_sum,
        TRUE AS used_rollup
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Row-level security option rewrite (RlsFiltersRewriter.java /
    // RlsUtils.buildRlsFilterKey): a rlsFilters-<table> SET option is
    // injected as a filtered-subquery substitution, composing with the
    // query's own WHERE. EXACT oracle: DuckDB with the predicate ANDed
    // by hand.
    GQuery("q_rls_filter",
      (s, dir) => {
        graft.sql.QueryFacade.init(s, dir)
        graft.sql.QueryFacade.sql(s,
          """SET rlsFilters-customer = 'c_custkey % 2 = 0';
             SET explicitLimit = true;
             SELECT c_nationkey AS nk, count(*) AS n FROM customer
             WHERE c_acctbal > 0 GROUP BY c_nationkey ORDER BY nk""")
      },
      Some("""SELECT c_nationkey AS nk, COUNT(*) AS n FROM customer
        WHERE c_custkey % 2 = 0 AND c_acctbal > 0
        GROUP BY 1 ORDER BY 1""")),

    // OPEN_STRUCT split (OpenStructColumnSplitter.java classify +
    // OpenStructNaming): a struct column with mixed-fill keys splits
    // into dense typed columns (fill >= 0.5) and one sparse JSON
    // column. dense_cols pins the classification; the agg reads the
    // materialized columns. EXACT oracle: DuckDB replays the same key
    // construction and fill arithmetic.
    GQuery("q_openstruct_split",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.documents.select(col("doc_id"),
          struct(
            length(col("text")).as("k"),
            when(col("doc_id") % 4 < 3, lit("tagged")).as("tag"),
            when(col("doc_id") % 10 === 0,
              concat(lit("r"), col("doc_id"))).as("rare")).as("attrs"))
        val out = graft.schema.OpenStruct.split(base, "attrs")
        val denseCols = out.columns.filter(_.contains("$")).sorted.mkString(",")
        out.groupBy(coalesce(col("`attrs$tag`"), lit("none")).as("tag"))
          .agg(count(lit(1)).as("n"),
            sum(col("`attrs$k`")).as("sum_k"),
            count(col("`attrs$__sparse__`")).as("n_sparse"))
          .withColumn("dense_cols", lit(denseCols))
          .orderBy(col("tag"))
      },
      Some("""SELECT COALESCE(CASE WHEN doc_id % 4 < 3 THEN 'tagged' END,
          'none') AS tag,
        COUNT(*) AS n,
        CAST(SUM(length(text)) AS BIGINT) AS sum_k,
        COUNT(CASE WHEN doc_id % 10 = 0 THEN 1 END) AS n_sparse,
        'attrs$__sparse__,attrs$k,attrs$tag' AS dense_cols
        FROM documents GROUP BY 1 ORDER BY 1"""))
  )
}
