package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators._
import QH._

/** Training-data pipeline operators (north star: dedup, similarity
  * search, text analysis, multimodal plumbing) plus the reference's
  * upsert/dedup-table, gapfill, funnel, and hybrid time-boundary
  * semantics, each expressed as a query with a DuckDB oracle where
  * SQL-expressible.
  */
object PipelineQueries {

  val all: Seq[GQuery] = Seq(

    // ——— Dedup family ———

    // Exact dedup: hash-groupBy on content (Dedup.exact).
    GQuery("q_dedup_exact",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.exact(t.documents, "doc_id", "text")
          .orderBy(col("content_hash"))
      },
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        COUNT(*) AS n_dups
        FROM documents GROUP BY 1 ORDER BY content_hash""")),

    // N-gram (token) Jaccard near-dup with inverted-index candidate
    // generation under a df-cap (Dedup.tokenJaccard). The df-cap is part
    // of the operator's definition and mirrored in the oracle.
    GQuery("q_dedup_jaccard",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.tokenJaccard(t.documents, "doc_id", "text",
            threshold = 0.5, dfCap = 60)
          .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (
          SELECT doc_id AS id, list_sort(list_distinct(
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0))) AS t
          FROM documents),
        inv AS (SELECT id, unnest(t) AS tok FROM toks),
        rare AS (SELECT tok FROM inv GROUP BY tok HAVING COUNT(*) <= 60),
        cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
          FROM inv a JOIN rare USING (tok) JOIN inv b USING (tok)
          WHERE a.id < b.id),
        scored AS (SELECT ia, ib,
          len(list_intersect(ta.t, tb.t)) * 1.0 /
            (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) AS j
          FROM cand JOIN toks ta ON ta.id = ia JOIN toks tb ON tb.id = ib)
        SELECT ia AS id_a, ib AS id_b, ROUND(j, 4) AS jaccard
        FROM scored WHERE j >= 0.5 ORDER BY id_a, id_b""")),

    // EXACT threshold-Jaccard via positional prefix filtering
    // (Dedup.tokenJaccardExact) — complete result set, verified against
    // a brute-force all-pairs oracle.
    GQuery("q_dedup_jaccard_exact",
      (s, dir) => {
        val t = Tables(s, dir)
        // deterministic 300-doc slice: this synthetic corpus is densely
        // similar (millions of TRUE pairs at sf0.1 — output-bound, not
        // algorithm-bound), so the exact-completeness demonstration is
        // scoped; the scalable relaxations are q_dedup_jaccard/minhash
        Dedup.tokenJaccardExact(t.documents.filter(col("doc_id") < 300),
            "doc_id", "text", threshold = 0.6)
          .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (
          SELECT doc_id AS id, list_sort(list_distinct(
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0))) AS t
          FROM documents WHERE doc_id < 300),
        scored AS (SELECT a.id AS ia, b.id AS ib,
          len(list_intersect(a.t, b.t)) * 1.0 /
            (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) AS j
          FROM toks a JOIN toks b ON a.id < b.id)
        SELECT ia AS id_a, ib AS id_b, ROUND(j, 4) AS jaccard
        FROM scored WHERE j >= 0.6 ORDER BY id_a, id_b""")),

    // MinHash + LSH near-dup (Dedup.minhashLsh) — hash-defined, not
    // SQL-expressible in DuckDB → rows-only check.
    GQuery("q_dedup_minhash",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.minhashLsh(t.documents, "doc_id", "text",
            threshold = 0.0, numHashes = 32, bands = 8, shingleSize = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      None),

    // Embedding-cosine near-dup pairs (LSH candidates + exact cosine
    // verification) — hash-defined candidates → rows-only check.
    GQuery("q_dedup_embedding",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.embeddingNearDups(t.embeddings, "vec_id", "embedding",
            threshold = 0.3)
          .orderBy(col("id_a"), col("id_b"))
      },
      None),

    // SimHash near-dup pairs (Dedup.simhashPairs) — rows-only check.
    GQuery("q_dedup_simhash",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.simhashPairs(t.documents, "doc_id", "text", maxDist = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      None),

    // Full corpus-cleaning pipeline (quality gate → exact dedup →
    // MinHash near-dup removal) — per-stage survivor counts. Contains
    // the hash-defined LSH stage → rows-only check.
    GQuery("q_corpus_clean",
      (s, dir) => {
        val t = Tables(s, dir)
        CorpusPipeline.stats(t.documents, "doc_id", "text",
            CorpusPipeline.Config(minTokens = 5, minQuality = 0.3,
              nearDupThreshold = 0.7))
          .orderBy(col("stage"))
      },
      None),

    // ——— Similarity search ———

    // Brute-force cosine top-k vs probe vec_id=0 (Similarity), exact.
    // Ranked by ROUND(sim,4) with id tie-break in both engines so
    // cross-engine float noise cannot flip the ordering.
    GQuery("q_ann_bruteforce",
      (s, dir) => {
        val t = Tables(s, dir)
        val probe = t.embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe_vec"))
        t.embeddings.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(col("vec_id"),
            r4(graft.functions.VectorFunctions.cosineSimilarity(
              col("embedding"), col("probe_vec"))).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p
          FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
          ROUND(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p),
              t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
             * sqrt(list_sum(list_transform(p, x -> x * x)))), 4) AS sim
        FROM embeddings, probe WHERE vec_id <> 0
        ORDER BY sim DESC, vec_id ASC LIMIT 10""")),

    // VECTOR_SIMILARITY_RADIUS predicate (VectorRadiusFilterOperator):
    // all corpus rows within a cosine-similarity radius of the probe.
    GQuery("q_ann_radius",
      (s, dir) => {
        val t = Tables(s, dir)
        val probe = t.embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe_vec"))
        t.embeddings.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("embedding").cast("array<double>"), col("probe_vec").cast("array<double>"))))
          .filter(col("sim") >= 0.2)
          .select(col("vec_id"), col("sim"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p
          FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
          ROUND(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p),
              t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
             * sqrt(list_sum(list_transform(p, x -> x * x)))), 4) AS sim
        FROM embeddings, probe
        WHERE vec_id <> 0 AND ROUND(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), p),
              t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
             * sqrt(list_sum(list_transform(p, x -> x * x)))), 4) >= 0.2
        ORDER BY vec_id""")),

    // LSH-bucketed ANN (Similarity.lshTopK) — approximate → rows-only.
    GQuery("q_ann_lsh",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        Similarity.lshTopK(probes, t.embeddings, "vec_id", "vec_id",
            "embedding", k = 5, bits = 16, bands = 8)
          .select(col("probe_id"), col("neighbor_id"), col("rank"))
          .orderBy(col("probe_id"), col("rank"))
      },
      None),

    // ——— Text analysis ———

    // Token counts, punctuation/stopword ratios, fingerprint.
    GQuery("q_text_stats",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents.filter(col("doc_id") <= 300)
          .select(
            col("doc_id"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"),
            TextFunctions.regexTokenCount(col("text")).as("n_retokens"),
            r4(TextFunctions.punctRatio(col("text"))).as("punct_ratio"),
            r4(TextFunctions.stopwordRatio(col("text"))).as("stop_ratio"),
            TextFunctions.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_retokens,
        ROUND(CASE WHEN len(text) = 0 THEN 0.0 ELSE
          len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0 / len(text) END, 4)
          AS punct_ratio,
        ROUND(CASE WHEN len(list_filter(string_split(text, ' '), x -> len(x) > 0)) = 0 THEN 0.0
          ELSE len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['the','a','and','of','to','in','is','on','for','with'], x)))
            * 1.0 / len(list_filter(string_split(text, ' '), x -> len(x) > 0)) END, 4)
          AS stop_ratio,
        md5(array_to_string(list_sort(list_distinct(
          list_filter(string_split(lower(text), ' '), x -> len(x) > 0))), ' ')) AS fp
        FROM documents WHERE doc_id <= 300 ORDER BY doc_id""")),

    // Language ID heuristic — mirrored CASE logic in the oracle.
    GQuery("q_text_langid",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id,
          len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['the','a','and','of','to','in','is','on','for','with'], x))) AS en,
          len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], x))) AS de,
          len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['le','la','les','et','est','un','une','des','pour','dans'], x))) AS fr
          FROM documents)
        SELECT doc_id,
          CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
            WHEN de >= fr AND de > 0 THEN 'de'
            WHEN fr > 0 THEN 'fr' ELSE 'unknown' END AS lang_pred
        FROM h ORDER BY doc_id""")),

    // Binary/multimodal plumbing: opaque bytes + typed metadata
    // (north-star multimodal columns; decode stays a stub, the
    // Spark-side schema/partition plumbing is real — see
    // graft.operators.Multimodal).
    GQuery("q_multimodal_bytes",
      (s, dir) => {
        val t = Tables(s, dir)
        Multimodal.withBinary(t.documents, "text")
          .select(col("doc_id"),
            octet_length(col("content")).as("n_bytes"),
            md5(col("content")).as("content_md5"),
            col("meta.kind").as("kind"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n_bytes,
        md5(text) AS content_md5,
        'text' AS kind
        FROM documents ORDER BY doc_id""")),

    // ——— Upsert / dedup-table / hybrid semantics (§2.9) ———

    // FULL upsert view: latest row per user_id (Upsert.latestByKey).
    GQuery("q_upsert_latest",
      (s, dir) => {
        val t = Tables(s, dir)
        Upsert.latestByKey(t.events, Seq("user_id"), "ts", Seq("event_id"))
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH r AS (SELECT user_id, event_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_id, event_type, value FROM r WHERE rn = 1
        ORDER BY user_id""")),

    // PARTIAL upsert with per-column mergers (Upsert.partialUpsert:
    // INCREMENT=sum, OVERWRITE=latest, MAX, UNION).
    GQuery("q_upsert_partial",
      (s, dir) => {
        val t = Tables(s, dir)
        Upsert.partialUpsert(t.events, Seq("user_id"), "event_id",
            Seq(Upsert.Increment("value"), Upsert.Overwrite("event_type"),
              Upsert.MaxOf("ts"), Upsert.UnionOf("props")))
          .select(col("user_id"),
            dec(col("value")).cast(DoubleType).as("value_sum"),
            col("event_type").as("last_type"),
            col("ts").as("max_ts"),
            // joined string: array cells crash the driver's checker
            array_join(col("props"), "|").as("props_csv"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS value_sum,
        arg_max(event_type, event_id) AS last_type,
        MAX(ts) AS max_ts,
        array_to_string(list_sort(list_distinct(list(props))), '|') AS props_csv
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Dedup table: FIRST row per key wins (Upsert.firstByKey — reference
    // dedup drops all later PK duplicates).
    GQuery("q_dedup_table",
      (s, dir) => {
        val t = Tables(s, dir)
        Upsert.firstByKey(t.events, Seq("user_id"), "ts", Seq("event_id"))
          .select(col("user_id"), col("event_id"), col("event_type"))
          .orderBy(col("user_id"))
      },
      Some("""WITH r AS (SELECT user_id, event_id, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
          FROM events)
        SELECT user_id, event_id, event_type FROM r WHERE rn = 1
        ORDER BY user_id""")),

    // Hybrid offline/realtime time-boundary view (TimeBoundaryManager).
    GQuery("q_hybrid_boundary",
      (s, dir) => {
        val t = Tables(s, dir)
        val boundary = lit("2024-01-03 00:00:00").cast(TimestampType)
        Upsert.hybridView(
            t.events.withColumn("src", lit("offline")),
            t.events.withColumn("src", lit("realtime")),
            "ts", boundary)
          .groupBy(col("src"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("src"), col("event_type"))
      },
      Some("""SELECT src, event_type, COUNT(*) AS n FROM (
          SELECT 'offline' AS src, event_type FROM events
            WHERE ts <= TIMESTAMP '2024-01-03 00:00:00'
          UNION ALL
          SELECT 'realtime' AS src, event_type FROM events
            WHERE ts > TIMESTAMP '2024-01-03 00:00:00')
        GROUP BY src, event_type ORDER BY src, event_type""")),

    // ——— Gapfill (GapfillProcessor.java:48) ———

    GQuery("q_gapfill",
      (s, dir) => {
        val t = Tables(s, dir)
        val agg = t.events
          .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        Gapfill.gapfill(s, agg, "bucket", Seq("event_type"), "1 hour",
            Seq(Gapfill.FillDefault("n", lit(0L)),
              Gapfill.FillPrevious("v")))
          .select(col("bucket"), col("event_type"), col("n"),
            coalesce(col("v"), lit(0.0)).as("v_filled"))
          .orderBy(col("bucket"), col("event_type"))
      },
      Some("""WITH agg AS (
          SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n,
            CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds),
        grid AS (SELECT bucket, event_type FROM spine
          CROSS JOIN (SELECT DISTINCT event_type FROM agg)),
        joined AS (SELECT g.bucket, g.event_type, COALESCE(a.n, 0) AS n, a.v
          FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket AND g.event_type = a.event_type)
        SELECT bucket, event_type, n,
          COALESCE(last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v_filled
        FROM joined ORDER BY bucket, event_type""")),

    // ——— Funnel (AggregationFunctionType.java:193-202) ———

    GQuery("q_funnel_maxstep",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.maxStep(t.events, "user_id", "ts", "event_id",
            Seq(col("event_type") === "signup",
              col("event_type") === "click",
              col("event_type") === "purchase"))
          .select(col("user_id"), col("max_step"))
          .orderBy(col("user_id"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events
          WHERE event_type IN ('signup', 'click', 'purchase')),
        t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
          JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
        t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
          JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1)
        SELECT u.user_id,
          CASE WHEN ts3 IS NOT NULL THEN 3 WHEN ts2 IS NOT NULL THEN 2
            WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END AS max_step
        FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
          LEFT JOIN t3 USING (user_id)
        ORDER BY user_id""")),

    GQuery("q_funnel_complete",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.completeCount(t.events, "user_id", "ts", "event_id",
          Seq(col("event_type") === "signup",
            col("event_type") === "click",
            col("event_type") === "purchase"))
      },
      Some("""WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
          JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
        t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
          JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1)
        SELECT COUNT(*) AS n_complete FROM t3""")),

    // Misra–Gries heavy hitters. With k=8 > 5 distinct event types the
    // sketch never evicts, so counts are EXACT and a full DuckDB oracle
    // applies (the general approximate case is bound-tested in
    // CustomExprSpec). Map serialized "item:count,…" sorted by item —
    // the driver's checker can't hash map/array cells.
    GQuery("q_frequent_items",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events.groupBy(col("user_id"))
          .agg(graft.plans.FrequentItems.frequentItems(col("event_type"), 8)
            .as("top_types"))
          .select(col("user_id"),
            array_join(transform(array_sort(map_entries(col("top_types"))),
              e => concat(e.getField("key"), lit(":"),
                e.getField("value").cast(StringType))), ",").as("top_types_csv"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT user_id,
          string_agg(event_type || ':' || n, ',' ORDER BY event_type)
            AS top_types_csv
        FROM c GROUP BY user_id ORDER BY user_id""")),

    GQuery("q_funnel_count",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.funnelCount(t.events, "user_id", "ts", "event_id",
            Seq(col("event_type") === "signup",
              col("event_type") === "click",
              col("event_type") === "purchase"))
          .orderBy(col("step"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events
          WHERE event_type IN ('signup', 'click', 'purchase')),
        t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
          JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
        t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
          JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1),
        ms AS (SELECT u.user_id,
          CASE WHEN ts3 IS NOT NULL THEN 3 WHEN ts2 IS NOT NULL THEN 2
            WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END AS max_step
          FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
            LEFT JOIN t3 USING (user_id))
        SELECT s.step, COUNT(*) AS n_entities
        FROM (SELECT unnest([1, 2, 3]) AS step) s
        JOIN ms ON ms.max_step >= s.step
        GROUP BY s.step ORDER BY s.step"""))
  )
}
