package graft.queries

import org.apache.spark.sql.Column
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

    // Dedup observability report: exact-duplicate cluster-size
    // histogram + the keep-LONGEST-per-cluster selection rule real
    // pipelines use (longest text, ties to smallest id) — verified via
    // the kept-id sum per cluster size. All exact cross-engine.
    GQuery("q_dedup_report",
      (s, dir) => {
        val t = Tables(s, dir)
        val h = t.documents.select(col("doc_id"),
          md5(col("text")).as("h"), length(col("text")).as("l"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("l").desc, col("doc_id"))
        val marked = h.withColumn("__rn", row_number().over(w))
        val clusters = marked.groupBy(col("h")).agg(
          count(lit(1)).as("sz"),
          sum(when(col("__rn") === 1, col("doc_id"))).as("kept"))
        clusters.groupBy(col("sz").as("cluster_size")).agg(
            count(lit(1)).as("n_clusters"),
            (count(lit(1)) * col("sz").cast("long")).as("n_docs"),
            sum(col("kept")).cast("long").as("kept_id_sum"))
          .select(col("cluster_size").cast("long"), col("n_clusters"),
            col("n_docs"), col("kept_id_sum"))
          .orderBy(col("cluster_size"))
      },
      Some("""WITH h AS (SELECT doc_id, md5(text) AS h, len(text) AS l
          FROM documents),
        m AS (SELECT doc_id, h,
            row_number() OVER (PARTITION BY h ORDER BY l DESC, doc_id)
              AS rn FROM h),
        c AS (SELECT h, COUNT(*) AS sz,
            SUM(CASE WHEN rn = 1 THEN doc_id END) AS kept
          FROM m GROUP BY h)
        SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
               CAST(COUNT(*) * sz AS BIGINT) AS n_docs,
               CAST(SUM(kept) AS BIGINT) AS kept_id_sum
        FROM c GROUP BY sz ORDER BY cluster_size""")),

    // DIRECTED containment (Dedup.tokenContainment — Broder's
    // c(A,B)=|A∩B|/|A|, the quote/subset detector symmetric Jaccard
    // misses): corpus = documents plus 12-token snippets of every 5th
    // doc; each snippet must surface as contained in its source with
    // c=1. EXACT oracle: DuckDB replicates the snippet derivation, the
    // df-capped candidate generation, and every containment value.
    GQuery("q_dedup_containment",
      (s, dir) => {
        val t = Tables(s, dir)
        val snippets = t.documents.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            array_join(slice(TextFunctions.tokens(lower(col("text"))),
              1, 12), " ").as("text"))
        val corpus = t.documents.select(col("doc_id"), col("text"))
          .unionByName(snippets)
        Dedup.tokenContainment(corpus, "doc_id", "text",
            threshold = 0.8, dfCap = 60)
          .select(col("contained_id"), col("container_id"),
            r4(col("containment")).as("containment"))
          .orderBy(col("contained_id"), col("container_id"))
      },
      Some("""WITH corpus AS (
          SELECT doc_id AS id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000,
            array_to_string(list_filter(string_split(lower(text), ' '),
              x -> len(x) > 0)[1:12], ' ')
          FROM documents WHERE doc_id % 5 = 0),
        toks AS (SELECT id, list_sort(list_distinct(
            list_filter(string_split(lower(text), ' '),
              x -> len(x) > 0))) AS t
          FROM corpus),
        inv AS (SELECT id, unnest(t) AS tok FROM toks),
        rare AS (SELECT tok FROM inv GROUP BY tok HAVING COUNT(*) <= 60),
        cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
          FROM inv a JOIN rare USING (tok) JOIN inv b USING (tok)
          WHERE a.id <> b.id),
        scored AS (SELECT ia, ib,
            len(list_intersect(ta.t, tb.t)) * 1.0 / len(ta.t) AS c
          FROM cand JOIN toks ta ON ta.id = ia JOIN toks tb ON tb.id = ib)
        SELECT ia AS contained_id, ib AS container_id,
               ROUND(c, 4) AS containment
        FROM scored WHERE c >= 0.8
        ORDER BY contained_id, container_id""")),

    // EXACT threshold-Jaccard via positional prefix filtering
    // (Dedup.tokenJaccardExact) — complete result set over the FULL
    // corpus, verified against a brute-force all-pairs oracle. The raw
    // synthetic corpus is pathologically dense (~24% of ALL pairs are
    // >= 0.6-similar → output quadratic in corpus size), so the input
    // is a derived SPARSER corpus: tokens salted with the doc's block
    // id (doc_id div 50). Within-block Jaccard is unchanged, cross-
    // block similarity drops to 0 — true pairs become linear in corpus
    // size and the prefix filter's df-ordered pruning actually prunes
    // (cross-block candidates share no tokens). 500 docs at sf0.01,
    // 5000 at bench sf0.1.
    GQuery("q_dedup_jaccard_exact",
      (s, dir) => {
        val t = Tables(s, dir)
        val salted = t.documents.select(col("doc_id"),
          array_join(transform(
            TextFunctions.tokens(lower(col("text"))),
            tok => concat(tok, lit("_"),
              expr("doc_id div 50").cast(StringType))), " ").as("text"))
        Dedup.tokenJaccardExact(salted, "doc_id", "text", threshold = 0.6)
          .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (
          SELECT doc_id AS id, list_sort(list_distinct(list_transform(
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0),
            x -> x || '_' || CAST(doc_id // 50 AS VARCHAR)))) AS t
          FROM documents),
        scored AS (SELECT a.id AS ia, b.id AS ib,
          len(list_intersect(a.t, b.t)) * 1.0 /
            (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) AS j
          FROM toks a JOIN toks b ON a.id < b.id)
        SELECT ia AS id_a, ib AS id_b, ROUND(j, 4) AS jaccard
        FROM scored WHERE j >= 0.6 ORDER BY id_a, id_b""")),

    // Duplicate CLUSTERS: connected components over the exact-Jaccard
    // pair graph (Dedup.components — iterative min-label propagation
    // with pointer jumping). The salted corpus (same derivation as
    // q_dedup_jaccard_exact, block = doc_id div 25) yields ~20 disjoint
    // components, so the transitive closure is non-trivial. The oracle
    // computes the same closure via a recursive CTE: comp(x) = min id
    // reachable from x. is_keep marks the per-cluster representative —
    // the row a keep-one-per-cluster dedup retains.
    GQuery("q_dedup_components",
      (s, dir) => {
        val t = Tables(s, dir)
        val salted = t.documents.select(col("doc_id"),
          array_join(transform(
            TextFunctions.tokens(lower(col("text"))),
            tok => concat(tok, lit("_"),
              expr("doc_id div 25").cast(StringType))), " ").as("text"))
        val pairs = Dedup.tokenJaccardExact(salted, "doc_id", "text",
          threshold = 0.6)
        Dedup.components(pairs)
          .select(col("id"), col("comp"),
            (col("id") === col("comp")).as("is_keep"))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE toks AS (
          SELECT doc_id AS id, list_sort(list_distinct(list_transform(
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0),
            x -> x || '_' || CAST(doc_id // 25 AS VARCHAR)))) AS t
          FROM documents),
        pairs AS (SELECT a.id AS ia, b.id AS ib
          FROM toks a JOIN toks b ON a.id < b.id
          WHERE len(list_intersect(a.t, b.t)) * 1.0 /
            (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.6),
        edges AS (SELECT ia AS a, ib AS b FROM pairs
                  UNION SELECT ib, ia FROM pairs),
        reach(id, r) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id)
        SELECT id, MIN(r) AS comp, id = MIN(r) AS is_keep
        FROM reach GROUP BY id ORDER BY id""")),

    // MinHash + LSH near-dup (Dedup.minhashLsh) — hash-defined, so the
    // oracle is a PROPERTY check. DuckDB computes the exact 3-shingle
    // Jaccard pairs >= 0.9 on a fixed slice (doc_id < 200) by brute
    // force; the query proves (a) that exact count cross-engine,
    // (b) 100% recall of those high-sim pairs by the LSH output
    // (P[miss | j=0.9] ≈ 2e-4 per pair, deterministic under fixed
    // xxhash64 seeds), and (c) zero gross false positives
    // (est >= 0.5 but exact < 0.2) over the FULL corpus.
    GQuery("q_dedup_minhash",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = Dedup.minhashLsh(t.documents, "doc_id", "text",
          threshold = 0.5, numHashes = 32, bands = 8, shingleSize = 3)
        // shingle-hash sets via the one-shuffle posexplode+lead shape
        // (Dedup.shingleHashSets): longs intersect ~4x cheaper than
        // strings, and a 64-bit collision altering a count (p ~ 1e-10)
        // would be caught by the deterministic oracle compare
        val shSlice = Dedup
          .shingleHashSets(t.documents.filter(col("doc_id") < PropSlice),
            "doc_id", "text", 3)
          .withColumnRenamed("doc_id", "id")
          .filter(size(col("sh")) > 0)
        // r14 perf: sh arrays are SORTED distinct hashes
        // (Dedup.shingleHashSets) — intersection via the codegen'd
        // merge loop; |a ∪ b| = |a| + |b| − |a ∩ b|. Same values.
        def jac(a: Column, b: Column): Column = {
          val inter = graft.plans.SetExpressions
            .sortedIntersectCount(a, b).cast("double")
          inter / (size(a).cast("double") + size(b).cast("double") - inter)
        }
        val exactHigh = shSlice.as("a").crossJoin(shSlice.as("b"))
          .filter(col("a.id") < col("b.id"))
          .filter(jac(col("a.sh"), col("b.sh")) >= 0.9)
          .select(col("a.id").as("ea"), col("b.id").as("eb"))
          .localCheckpoint(true) // reused by n_high_exact and n_high_found
        // ONE pass over the (large) LSH pair stream: the recall, FP, and
        // has-pairs verdicts are annotations broadcast-joined onto the
        // pairs, folded by a single aggregate — the pipeline executes
        // once instead of once per consumer. FP check scoped to the
        // fixed slice (shingle arrays only exist for slice docs here).
        val annotated = pairs
          .join(broadcast(exactHigh.select(col("ea").as("id_a"),
            col("eb").as("id_b"), lit(1).as("is_high"))),
            Seq("id_a", "id_b"), "left")
          .join(broadcast(shSlice.select(col("id").as("id_a"),
            col("sh").as("sh_a"))), Seq("id_a"), "left")
          .join(broadcast(shSlice.select(col("id").as("id_b"),
            col("sh").as("sh_b"))), Seq("id_b"), "left")
        val stats = annotated.agg(
          (count(lit(1)) >= 1).as("has_pairs"),
          coalesce(sum(col("is_high")), lit(0L)).as("n_high_found"),
          count(when(col("sh_a").isNotNull && col("sh_b").isNotNull &&
            jac(col("sh_a"), col("sh_b")) < 0.2, 1)).as("n_gross_fp"))
        val nHighExact = exactHigh.agg(count(lit(1)).as("n_high_exact"))
        nHighExact.crossJoin(stats)
      },
      Some(s"""WITH toks AS (SELECT doc_id AS id,
          list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
          FROM documents WHERE doc_id < ${PropSlice}),
        sh AS (SELECT id, list_distinct(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks WHERE len(t) >= 3),
        high AS (SELECT COUNT(*) AS n FROM sh a JOIN sh b ON a.id < b.id
          WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            len(list_distinct(list_concat(a.s, b.s))) >= 0.9)
        SELECT n AS n_high_exact, n AS n_high_found,
          CAST(0 AS BIGINT) AS n_gross_fp, TRUE AS has_pairs FROM high""")),

    // Incremental near-dup (Dedup.minhashLshAgainst): the "daily crawl"
    // shape — docs with doc_id % 10 == 0 are the increment, the rest is
    // the pre-indexed corpus (signatures only). Same property-oracle
    // discipline as q_dedup_minhash, on cross-split pairs: DuckDB
    // brute-forces the exact 3-shingle Jaccard >= 0.9 increment×corpus
    // pairs on the doc_id < 200 slice; the query proves that count
    // cross-engine, full recall of them, and zero gross FPs.
    GQuery("q_dedup_incremental",
      (s, dir) => {
        val t = Tables(s, dir)
        val newDocs = t.documents.filter(col("doc_id") % 10 === 0)
        val corpus = t.documents.filter(col("doc_id") % 10 =!= 0)
        val corpusSigs = Dedup.minhashSignatures(corpus, "doc_id", "text",
          32, 3)
        val pairs = Dedup.minhashLshAgainst(newDocs, "doc_id", "text",
          corpusSigs, threshold = 0.5, numHashes = 32, bands = 8,
          shingleSize = 3)
        val shSlice = Dedup
          .shingleHashSets(t.documents.filter(col("doc_id") < PropSlice),
            "doc_id", "text", 3)
          .withColumnRenamed("doc_id", "id")
          .filter(size(col("sh")) > 0)
        // r14 perf: sh arrays are SORTED distinct hashes
        // (Dedup.shingleHashSets) — intersection via the codegen'd
        // merge loop; |a ∪ b| = |a| + |b| − |a ∩ b|. Same values.
        def jac(a: Column, b: Column): Column = {
          val inter = graft.plans.SetExpressions
            .sortedIntersectCount(a, b).cast("double")
          inter / (size(a).cast("double") + size(b).cast("double") - inter)
        }
        val exactHigh = shSlice.as("a").crossJoin(shSlice.as("b"))
          .filter(col("a.id") % 10 === 0 && col("b.id") % 10 =!= 0)
          .filter(jac(col("a.sh"), col("b.sh")) >= 0.9)
          .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
          .localCheckpoint(true)
        val annotated = pairs
          .join(broadcast(exactHigh.select(col("new_id"), col("corpus_id"),
            lit(1).as("is_high"))), Seq("new_id", "corpus_id"), "left")
          .join(broadcast(shSlice.select(col("id").as("new_id"),
            col("sh").as("sh_a"))), Seq("new_id"), "left")
          .join(broadcast(shSlice.select(col("id").as("corpus_id"),
            col("sh").as("sh_b"))), Seq("corpus_id"), "left")
        val stats = annotated.agg(
          (count(lit(1)) >= 1).as("has_pairs"),
          coalesce(sum(col("is_high")), lit(0L)).as("n_high_found"),
          count(when(col("sh_a").isNotNull && col("sh_b").isNotNull &&
            jac(col("sh_a"), col("sh_b")) < 0.2, 1)).as("n_gross_fp"))
        val nHighExact = exactHigh.agg(count(lit(1)).as("n_high_exact"))
        nHighExact.crossJoin(stats)
      },
      Some(s"""WITH toks AS (SELECT doc_id AS id,
          list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
          FROM documents WHERE doc_id < ${PropSlice}),
        sh AS (SELECT id, list_distinct(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks WHERE len(t) >= 3),
        high AS (SELECT COUNT(*) AS n FROM sh a JOIN sh b
          ON a.id % 10 = 0 AND b.id % 10 <> 0
          WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            len(list_distinct(list_concat(a.s, b.s))) >= 0.9)
        SELECT n AS n_high_exact, n AS n_high_found,
          CAST(0 AS BIGINT) AS n_gross_fp, TRUE AS has_pairs FROM high""")),

    // Embedding-cosine near-dup pairs (LSH candidates + exact cosine
    // verification) — hash-defined candidates, PROPERTY oracle: DuckDB
    // brute-forces the exact cosine >= 0.3 pair count on a fixed slice
    // (vec_id < 200, cross-checking the cosine arithmetic engine-to-
    // engine); the query asserts an LSH recall floor on that slice and
    // that pairs exist. Precision is exact by construction (the
    // operator verifies candidates with true cosine).
    GQuery("q_dedup_embedding",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = Dedup.embeddingNearDups(t.embeddings, "vec_id",
          "embedding", threshold = 0.3)
        val slice = t.embeddings.filter(col("vec_id") < PropSlice)
          .select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("v"))
        val exact = slice.as("a").crossJoin(slice.as("b"))
          .filter(col("a.id") < col("b.id"))
          .filter(r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("a.v"), col("b.v"))) >= 0.3)
        val nExact = exact.agg(count(lit(1)).as("n_exact_slice"))
        // single pass over the LSH pair stream for both verdicts
        val pairStats = pairs.agg(
          count(when(col("id_a") < PropSlice && col("id_b") < PropSlice, 1)).as("__nf"),
          (count(lit(1)) >= 1).as("has_pairs"))
        nExact.crossJoin(pairStats)
          .select(col("n_exact_slice"),
            (col("__nf") >= col("n_exact_slice") * 0.25).as("recall_floor_ok"),
            col("has_pairs"))
      },
      Some(s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id < ${PropSlice}),
        p AS (SELECT COUNT(*) AS n FROM e a JOIN e b ON a.id < b.id
          WHERE ROUND(list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
             * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) >= 0.3)
        SELECT n AS n_exact_slice, TRUE AS recall_floor_ok, TRUE AS has_pairs
        FROM p""")),

    // SemDeDup semantic dedup (Dedup.semanticPairs): k-means cells via
    // the IVF quantizer, exact cosine only within cells. Precision is
    // 1.0 by construction (pairs carry exact cosine, asserted via
    // min_cos_ok); recall loses only cell-straddling pairs, floored
    // against the DuckDB brute-force count on the vec_id < 200 slice.
    // n_total is an exact cross-engine count proving conservation of
    // the keepRepresentatives partition (kept + dropped = total).
    GQuery("q_dedup_semantic",
      (s, dir) => {
        val t = Tables(s, dir)
        // one pair stream feeds both the stats aggregate and the
        // keep-set (a second semanticDedup call would rebuild the IVF
        // quantizer and re-run the cell self-join)
        // k is AUTO-sized from the corpus (pairs-per-cell bounded —
        // the SemDeDup scale contract): 8 cells at the test SFs,
        // hundreds at 100× so the cell self-join stays linear
        val pairs = Dedup.semanticPairs(t.embeddings, "vec_id",
          "embedding", threshold = 0.3).localCheckpoint()
        val kept = Dedup.keepRepresentatives(t.embeddings, "vec_id", pairs)
        val slice = t.embeddings.filter(col("vec_id") < PropSlice)
          .select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("v"))
        val exact = slice.as("a").crossJoin(slice.as("b"))
          .filter(col("a.id") < col("b.id"))
          .filter(r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("a.v"), col("b.v"))) >= 0.3)
        val nExact = exact.agg(count(lit(1)).as("n_exact_slice"))
        val pairStats = pairs.agg(
          count(when(col("id_a") < PropSlice && col("id_b") < PropSlice, 1)).as("__nf"),
          (min(col("cosine")) >= 0.3).as("min_cos_ok"))
        val totals = t.embeddings.agg(count(lit(1)).as("n_total"))
          .crossJoin(kept.agg(count(lit(1)).as("__nk")))
        nExact.crossJoin(pairStats).crossJoin(totals)
          .select(col("n_exact_slice"),
            (col("__nf") >= col("n_exact_slice") * 0.25).as("recall_floor_ok"),
            col("min_cos_ok"), col("n_total"),
            (col("__nk") <= col("n_total")).as("kept_bounded"))
      },
      Some(s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id < ${PropSlice}),
        p AS (SELECT COUNT(*) AS n FROM e a JOIN e b ON a.id < b.id
          WHERE ROUND(list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
             * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) >= 0.3),
        tot AS (SELECT COUNT(*) AS n_total FROM embeddings)
        SELECT p.n AS n_exact_slice, TRUE AS recall_floor_ok,
          TRUE AS min_cos_ok, tot.n_total, TRUE AS kept_bounded
        FROM p, tot""")),

    // SimHash near-dup pairs (Dedup.simhashPairs) — PROPERTY oracle:
    // pigeonhole banding claims COMPLETENESS (any pair within Hamming
    // maxDist must agree on >= 1 of maxDist+1 bands), so the query
    // brute-forces Hamming <= 3 over the fingerprints of a fixed slice
    // and asserts the banded join found every such pair (n_missed = 0,
    // a mathematical identity — any nonzero value is a banding bug).
    GQuery("q_dedup_simhash",
      (s, dir) => {
        val t = Tables(s, dir)
        // r14 perf: materialize the fingerprints ONCE — the banded
        // pair join and the brute-force slice check each re-ran the
        // full simhash aggregation (explode + 16 lane sums over the
        // corpus) through lazy lineage
        val fp = Dedup.simhash(t.documents, "doc_id", "text")
          .localCheckpoint()
        val pairs = Dedup.fingerprintPairs(fp, "id", "simhash", maxDist = 3)
        val fps = fp.filter(col("id") < 400)
        val brute = fps.as("a").crossJoin(fps.as("b"))
          .filter(col("a.id") < col("b.id"))
          .filter(Dedup.hamming(col("a.simhash"), col("b.simhash")) <= 3)
          .agg(count(lit(1)).as("__n_brute"))
        // ONE pass over the banded-pair stream for both verdicts (the
        // pipeline would otherwise execute once per consumer)
        val pairStats = pairs.agg(
          count(when(col("id_a") < 400 && col("id_b") < 400, 1))
            .as("__n_banded"),
          (count(lit(1)) >= 1).as("has_pairs"))
        val nDocs = t.documents.agg(count(lit(1)).as("n_docs"))
        brute.crossJoin(pairStats).crossJoin(nDocs)
          .select((col("__n_brute") - col("__n_banded")).as("n_missed_slice"),
            col("has_pairs"), col("n_docs"))
      },
      Some("""SELECT CAST(0 AS BIGINT) AS n_missed_slice, TRUE AS has_pairs,
        (SELECT COUNT(*) FROM documents) AS n_docs""")),

    // Full corpus-cleaning pipeline (quality gate → exact dedup →
    // MinHash near-dup removal) — stage counts with the LSH stage
    // pinned: input / gate / exact-dedup counts are EXACTLY mirrored in
    // DuckDB (tokenCount, qualityScore, langId re-derived in SQL); the
    // hash-defined near-dup stage is bounded (0 < survivors <= exact
    // survivors) and emitted as a 0/1 verdict row.
    GQuery("q_corpus_clean",
      (s, dir) => {
        val t = Tables(s, dir)
        val cfg = CorpusPipeline.Config(minTokens = 5, minQuality = 0.3,
          nearDupThreshold = 0.7)
        val docs = t.documents
        val text = col("text")
        // r14 perf: one-pass gate — token array bound once per row
        // (identical predicate; the agg below evaluated the composed
        // form's ~8 tokenizations twice per row via the distinct
        // rewrite: measured 1.75 s of aggTime at sf0.1)
        val gateCond = TextFunctions.gatePass(text, cfg.minTokens,
          cfg.maxTokens, cfg.minQuality, cfg.languages)
        val cleaned = CorpusPipeline.clean(docs, "doc_id", "text", cfg)
        // Stages 1-3 in ONE scan: the gate evaluates once per row (a
        // materialized projection — the distinct rewrite would
        // otherwise re-evaluate it per aggregate) and the distinct
        // count runs over md5(text) — the SAME content key the
        // pipeline's exact-dedup stage groups by, so the count is
        // definitionally identical and the distinct shuffle carries
        // 16-byte keys, never documents.
        val stages = graft.operators.Parallelism.ensure(docs, "doc_id")
          .select(gateCond.as("__g"), md5(text).as("__h"))
          .agg(
            count(lit(1)).as("__n_in"),
            count(when(col("__g"), 1)).as("__n_gate"),
            countDistinct(when(col("__g"), col("__h"))).as("__n_exact"))
        val rows = stages
          .crossJoin(cleaned.agg(count(lit(1)).as("__nc")))
          .select(explode(array(
            struct(lit("1_input").as("stage"), col("__n_in").as("n_docs")),
            struct(lit("2_quality_lang_gate").as("stage"),
              col("__n_gate").as("n_docs")),
            struct(lit("3_exact_dedup").as("stage"),
              col("__n_exact").as("n_docs")),
            struct(lit("4_neardup_bounded").as("stage"),
              when(col("__nc") >= 1 && col("__nc") <= col("__n_exact"), 1L)
                .otherwise(0L).as("n_docs")))).as("r"))
          .select(col("r.stage"), col("r.n_docs"))
        rows.orderBy(col("stage"))
      },
      Some("""WITH q AS (SELECT text,
          len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tok,
          len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['the','a','and','of','to','in','is','on','for','with'], x))) AS en,
          len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], x))) AS de,
          len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['le','la','les','et','est','un','une','des','pour','dans'], x))) AS fr,
          CASE WHEN len(text) = 0 THEN 0.0 ELSE
            len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0 / len(text) END AS punct
          FROM documents),
        g AS (SELECT text FROM q
          WHERE n_tok BETWEEN 5 AND 100000
          AND ((CASE WHEN n_tok > 0
                 AND len(regexp_replace(text, '\s', '', 'g')) * 1.0 / n_tok >= 3
                 AND len(regexp_replace(text, '\s', '', 'g')) * 1.0 / n_tok <= 10
                 THEN 1.0 ELSE 0.0 END
              + CASE WHEN n_tok > 0 AND en * 1.0 / n_tok > 0.01
                 THEN 1.0 ELSE 0.0 END
              + CASE WHEN punct < 0.2 THEN 1.0 ELSE 0.0 END) / 3.0) >= 0.3
          AND (CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
               WHEN de >= fr AND de > 0 THEN 'de'
               WHEN fr > 0 THEN 'fr' ELSE 'unknown' END) = 'en')
        SELECT '1_input' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
        UNION ALL SELECT '2_quality_lang_gate', (SELECT COUNT(*) FROM g)
        UNION ALL SELECT '3_exact_dedup', (SELECT COUNT(DISTINCT text) FROM g)
        UNION ALL SELECT '4_neardup_bounded', 1
        ORDER BY stage""")),

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

    // LSH-bucketed ANN (Similarity.lshTopK) — PROPERTY oracle: DuckDB
    // brute-forces the exact cosine top-5 per probe (cross-checking the
    // ranking arithmetic); the query emits that exact top-5 id set and
    // a recall verdict (LSH top-5 recovers >= 3 of the exact 5,
    // deterministic under fixed hyperplane hashes).
    GQuery("q_ann_lsh",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val lsh = Similarity.lshTopK(probes, t.embeddings, "vec_id", "vec_id",
          "embedding", k = 5, bits = 16, bands = 8)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job — tops and hits share the
          // window exchange via ReuseExchange (the crossJoin+cosine work
          // below it runs once; only the tiny post-group-limit tail is
          // duplicated)
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
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid,
          ROUND(list_sum(list_transform(list_zip(cv, pv), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(cv, x -> x * x)))
             * sqrt(list_sum(list_transform(pv, x -> x * x)))), 4) AS sim
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // IVF over a SCALAR-QUANTIZED store (VectorQuantizerType SQ8,
    // ScalarQuantizer.java: per-dimension trained linear codes in
    // [0, 255], the index 4x smaller than float32) — searches score
    // the on-the-fly reconstruction, error <= half a step per dim.
    // Same property-oracle shape as q_ann_ivf, recall >= 3 of 5.
    GQuery("q_ann_ivf_sq8",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val model = IvfIndex.build(t.embeddings, "vec_id", "embedding",
          k = 16, iterations = 2, quantizerBits = 8)
        val ivf = IvfIndex.search(model, probes, "vec_id", "embedding",
          k = 5, nprobe = 4)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job (see q_ann_lsh note)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(ivf, exactTop("probe_id") === ivf("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 3).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid,
          ROUND(list_sum(list_transform(list_zip(cv, pv), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(cv, x -> x * x)))
             * sqrt(list_sum(list_transform(pv, x -> x * x)))), 4) AS sim
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // IVF (inverted-file) ANN — the second scale path (IvfIndex): a
    // deterministic k-means coarse quantizer, probe the 4 nearest of 16
    // cells, exact cosine re-rank. Same PROPERTY oracle shape as
    // q_ann_lsh: DuckDB brute-forces the exact top-5 ids per probe; the
    // query emits that exact set plus an IVF recall verdict (>= 3 of 5,
    // deterministic under the fixed centroid init).
    GQuery("q_ann_ivf",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val model = IvfIndex.build(t.embeddings, "vec_id", "embedding",
          k = 16, iterations = 2)
        val ivf = IvfIndex.search(model, probes, "vec_id", "embedding",
          k = 5, nprobe = 4)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job — tops and hits share the
          // window exchange via ReuseExchange (the crossJoin+cosine work
          // below it runs once; only the tiny post-group-limit tail is
          // duplicated)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(ivf, exactTop("probe_id") === ivf("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 3).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid,
          ROUND(list_sum(list_transform(list_zip(cv, pv), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(cv, x -> x * x)))
             * sqrt(list_sum(list_transform(pv, x -> x * x)))), 4) AS sim
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // HNSW graph ANN (HnswIndex) — the reference's per-segment
    // Lucene-HNSW profile (HnswVectorIndexCreator.java) re-expressed
    // as per-shard executor-built graphs + fan-out beam search + one
    // top-k merge window. Same PROPERTY oracle shape as q_ann_ivf:
    // DuckDB brute-forces the exact cosine top-5 ids per probe; the
    // query emits that exact set plus an HNSW recall verdict (>= 4 of
    // 5 at ef=64 — graph ANN recalls are the strongest of the family;
    // deterministic under hash-derived node levels + sorted-id
    // insertion).
    GQuery("q_ann_hnsw",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
          m = 16, efConstruction = 100, nShards = 8)
        val hnsw = HnswIndex.search(model, probes, "vec_id", "embedding",
          k = 5, ef = 64)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job — tops and hits share the
          // window exchange via ReuseExchange (the crossJoin+cosine work
          // below it runs once; only the tiny post-group-limit tail is
          // duplicated)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(hnsw, exactTop("probe_id") === hnsw("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 4).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid,
          ROUND(list_sum(list_transform(list_zip(cv, pv), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(cv, x -> x * x)))
             * sqrt(list_sum(list_transform(pv, x -> x * x)))), 4) AS sim
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // EUCLIDEAN (L2) vector search — VectorIndexConfig.java:216 declares
    // COSINE/INNER_PRODUCT/EUCLIDEAN/DOT_PRODUCT/L2; over unnormalized
    // vectors L2 produces a DIFFERENT top-k than cosine (magnitude
    // matters), so "dot = cosine on normalized" cannot express it.
    // DuckDB brute-forces the exact L2 top-5 per probe (list_distance);
    // the query reproduces that exact set and shows the EUCLIDEAN HNSW
    // graph (negated-squared-L2 beam scores) recalls >= 4 of 5.
    GQuery("q_ann_l2",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
          m = 16, efConstruction = 100, nShards = 8,
          metric = graft.operators.VectorDistance.Euclidean)
        val hnsw = HnswIndex.search(model, probes, "vec_id", "embedding",
          k = 5, ef = 64)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("dist").asc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("dist", r4(graft.plans.VectorExpressions
            .l2Distance(col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job (see q_ann_lsh note)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(hnsw, exactTop("probe_id") === hnsw("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 4).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid, ROUND(list_distance(cv, pv), 4) AS dist
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dist ASC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // DOT_PRODUCT / INNER_PRODUCT vector search (magnitude-sensitive —
    // a long vector can out-score a better-aligned short one, so the
    // top-k differs from cosine). Exact dot top-5 per probe from DuckDB
    // (list_inner_product); INNER_PRODUCT HNSW (raw-dot beam) recall
    // >= 4 of 5.
    GQuery("q_ann_dot",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
          m = 16, efConstruction = 100, nShards = 8,
          metric = graft.operators.VectorDistance.DotProduct)
        val hnsw = HnswIndex.search(model, probes, "vec_id", "embedding",
          k = 5, ef = 64)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("dot").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("dot", r4(graft.plans.VectorExpressions
            .innerProduct(col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job (see q_ann_lsh note)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(hnsw, exactTop("probe_id") === hnsw("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 4).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid, ROUND(list_inner_product(cv, pv), 4) AS dot
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dot DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // PQ (product-quantization) ANN with ADC shortlist + exact re-rank
    // (PqIndex) — same property-oracle shape as q_ann_ivf: DuckDB
    // brute-forces the exact cosine top-5 per probe; the query must
    // reproduce that exact set as a cross-checked CSV and show the
    // two-stage PQ pipeline recovers >= 3 of 5 (codebooks are lossy,
    // 4-bit codes; the re-rank is exact cosine so precision of the
    // returned order is exact within the shortlist).
    GQuery("q_ann_pq",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val model = PqIndex.build(t.embeddings, "vec_id", "embedding",
          m = 8, k = 16)
        val pq = PqIndex.searchRerank(model, t.embeddings, "vec_id",
          "embedding", probes, "vec_id", topK = 5, rerankFactor = 8)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job (see q_ann_lsh note)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(pq, exactTop("probe_id") === pq("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 3).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid,
          ROUND(list_sum(list_transform(list_zip(cv, pv), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(cv, x -> x * x)))
             * sqrt(list_sum(list_transform(pv, x -> x * x)))), 4) AS sim
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

    // IVF-PQ composed two-level ANN (PqIndex.searchIvfPq): coarse cells
    // restrict the ADC lookup pass to nprobe/k of the code table, exact
    // re-rank on the shortlist. Same property-oracle shape as
    // q_ann_pq/q_ann_ivf: exact top-5 CSV cross-checked, recall >= 3/5.
    GQuery("q_ann_ivfpq",
      (s, dir) => {
        val t = Tables(s, dir)
        // cosine targets want cosine-aligned cells: L2-normalize before
        // indexing (the standard "normalize then L2-IVF" recipe — cosine
        // results are invariant, cell boundaries stop cutting across
        // directionally-close but magnitude-far vectors)
        val embN = t.embeddings.select(col("vec_id"),
          graft.plans.VectorExpressions.normalize(col("embedding"))
            .as("embedding"))
        val probes = embN.filter(col("vec_id") < 5)
        val ivf = IvfIndex.build(embN, "vec_id", "embedding", k = 16)
        val pq = PqIndex.build(embN, "vec_id", "embedding",
          m = 8, k = 16)
        // synthetic embeddings are near-isotropic (top-5 cosine ~0.3 —
        // no cluster structure for the coarse quantizer to exploit), so
        // the probe budget is generous: nprobe 12/16 cells, 16x
        // shortlist. Real embedding corpora cluster, which is the only
        // regime where IVF pruning wins anything.
        val res = PqIndex.searchIvfPq(ivf, pq, embN, "vec_id",
          "embedding", probes, "vec_id", topK = 5, nprobe = 12,
          rerankFactor = 16)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val exactTop = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", r4(graft.plans.VectorExpressions.cosineSimilarity(
            col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
          // r15: no eager materialization job (see q_ann_lsh note)
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(res, exactTop("probe_id") === res("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 3).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
        s AS (SELECT probe_id, cid,
          ROUND(list_sum(list_transform(list_zip(cv, pv), t -> t[1] * t[2]))
            / (sqrt(list_sum(list_transform(cv, x -> x * x)))
             * sqrt(list_sum(list_transform(pv, x -> x * x)))), 4) AS sim
          FROM p, c WHERE cid <> probe_id),
        r AS (SELECT probe_id, cid,
          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cid ASC) AS rn
          FROM s)
        SELECT probe_id,
          array_to_string(list_sort(list(cid)), ',') AS exact_top5_csv,
          TRUE AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY probe_id ORDER BY probe_id""")),

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
        graft.operators.Parallelism.ensure(t.documents, "doc_id")
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

    // Deterministic train/val/test split (Curation.assignSplit):
    // md5-bucket assignment reproducible from the id alone in any
    // engine — rows never migrate when the corpus grows.
    GQuery("q_split_assign",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.assignSplit(t.documents, "doc_id", 980, 10)
          .groupBy(col("split")).agg(count(lit(1)).as("n"))
          .orderBy(col("split"))
      },
      Some("""WITH b AS (SELECT
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000 AS bk
          FROM documents)
        SELECT CASE WHEN bk < 980 THEN 'train'
                    WHEN bk < 990 THEN 'val'
                    ELSE 'test' END AS split, COUNT(*) AS n
        FROM b GROUP BY 1 ORDER BY split""")),

    // Hashed-feature linear quality classifier inference
    // (Curation.classifierScore — fastText-style average-pooled
    // bag-of-words with feature hashing, the scoring stage of
    // DCLM/FineWeb-edu curation). Deterministic pseudo-weights derive
    // from the feature index in BOTH engines, so the oracle reproduces
    // the exact scores; at production scale the weights literal is a
    // trained model vector shipped with the plan.
    GQuery("q_quality_classifier",
      (s, dir) => {
        val t = Tables(s, dir)
        val dim = 1024
        // a TRUE literal array: the transform(sequence(...)) expression
        // form re-materialized all 1024 elements for EVERY element_at
        // inside the scoring aggregate (same per-element re-inlining
        // pitfall as repetitionRatio's index-lambda note) — 89 s at
        // sf0.1; as a literal the lookup is O(1) and the query is
        // sub-second
        val weights = typedLit(Array.tabulate(dim)(i =>
          ((i.toLong * 2654435761L) % 2001L - 1000L) / 1000.0))
        graft.operators.Parallelism.ensure(t.documents, "doc_id")
          .select(col("doc_id"),
            r6(Curation.classifierScore(col("text"), weights, dim, -0.1))
              .as("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT [((i * 2654435761) % 2001 - 1000) / 1000.0
            FOR i IN range(0, 1024)] AS wv),
        t AS (SELECT doc_id,
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
          FROM documents)
        SELECT doc_id,
          ROUND(1.0 / (1.0 + exp(-((CASE WHEN len(tk) = 0 THEN 0.0
            ELSE list_sum([wv[CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)
                              % 1024 + 1] FOR x IN tk]) / len(tk) END)
            - 0.1))), 6) AS quality
        FROM t CROSS JOIN w ORDER BY doc_id""")),

    // Training-mixture rebalance (Curation.mixToProportions): downsample
    // so language proportions hit 50/20/20/10 en/de/fr/zh with maximal
    // retention (binding stratum kept whole), es dropped (no weight).
    // Sampling is the deterministic md5 bucket, so the oracle reproduces
    // the EXACT kept set — rates derive from counts in double arithmetic
    // identical in both engines. Output: per-language kept counts.
    GQuery("q_mix_proportions",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.mixToProportions(t.documents, "doc_id", "lang",
            Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1))
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("lang"))
      },
      Some("""WITH w(lang, w) AS (VALUES
            ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.2 AS DOUBLE)),
            ('fr', CAST(0.2 AS DOUBLE)), ('zh', CAST(0.1 AS DOUBLE))),
        c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
        t AS (SELECT MIN(c.c / w.w) AS t FROM c JOIN w USING (lang)),
        r AS (SELECT lang, LEAST(CAST(1.0 AS DOUBLE), w.w * t.t / c.c) AS rate
          FROM c JOIN w USING (lang), t),
        kept AS (SELECT d.lang FROM documents d JOIN r USING (lang)
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) < rate * 4294967296.0)
        SELECT lang, COUNT(*) AS n_kept FROM kept
        GROUP BY 1 ORDER BY lang""")),

    // SEMANTIC decontamination (Curation.semanticContaminated):
    // max cosine of every training embedding against the broadcast
    // eval set. EXACT oracle: DuckDB recomputes every max similarity
    // (list_cosine_similarity over double-cast lists, round 6).
    GQuery("q_decontaminate_semantic",
      (s, dir) => {
        val t = Tables(s, dir)
        val eval = t.embeddings.filter(col("vec_id") < 40)
        val train = t.embeddings.filter(col("vec_id") >= 40)
        Curation.semanticContaminated(train, eval, "vec_id", "embedding",
            threshold = 0.9)
          .orderBy(col("id"))
      },
      Some("""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS ev
          FROM embeddings WHERE vec_id < 40),
        t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv
          FROM embeddings WHERE vec_id >= 40),
        m AS (SELECT t.vec_id AS id,
            round(max(list_cosine_similarity(t.tv, e.ev)), 6) AS max_sim
          FROM t, e GROUP BY 1)
        SELECT id, max_sim, max_sim >= 0.9 AS contaminated
        FROM m ORDER BY id""")),

    // Temperature mixing (Curation.mixByTemperature, the multilingual
    // alpha-sampling rule): keep rate (n_min/n_s)^(1-alpha) per
    // stratum, derived fully in-plan from the stratum counts. EXACT
    // oracle: DuckDB recomputes the rates and the md5-bucket draw.
    GQuery("q_mix_temperature",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.mixByTemperature(t.documents, "doc_id", "lang",
            alpha = 0.5)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
        mn AS (SELECT MIN(c) AS mn FROM c),
        r AS (SELECT lang, pow(mn.mn * 1.0 / c.c, 0.5) AS rate
          FROM c, mn),
        kept AS (SELECT d.lang FROM documents d JOIN r USING (lang)
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) < rate * 4294967296.0)
        SELECT lang, COUNT(*) AS n_kept FROM kept
        GROUP BY 1 ORDER BY lang""")),

    // LINE-level boilerplate dedup (Dedup.lineDedup, the C4/RefinedWeb
    // cleaning step): lines appearing in >= 3 distinct docs corpus-wide
    // are removed from every doc. The synthetic corpus has no newlines,
    // so "lines" are fixed 8-word chunks — the chunking is part of the
    // query and mirrored exactly in the oracle. Output hashes the
    // cleaned text so the driver compares scalars.
    GQuery("q_dedup_lines",
      (s, dir) => {
        val t = Tables(s, dir)
        // r14 perf: bind the split array once per row — the bare
        // expression form re-evaluated split() for EVERY chunk element
        // inside the transform lambda (~26 splits/doc; Catalyst trees
        // have no sharing)
        val chunks = TextFunctions.bound(split(col("text"), " ")) { w =>
          val nChunks = ceil(size(w) / lit(8.0)).cast("int")
          transform(sequence(lit(0), nChunks - 1),
            i => concat_ws(" ", slice(w, i * 8 + 1, lit(8))))
        }
        val lines = graft.operators.Parallelism.ensure(t.documents, "doc_id")
          .select(col("doc_id"), posexplode(chunks))
          .toDF("doc_id", "line_no", "line")
        Dedup.lineDedup(lines, "doc_id", "line_no", "line", minDocFreq = 3)
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            md5(col("text_clean")).as("clean_hash"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        lines AS (
          SELECT doc_id, gs - 1 AS line_no,
            array_to_string(w[((gs-1)*8+1):(gs*8)], ' ') AS line
          FROM words,
            UNNEST(generate_series(1, CAST(ceil(len(w)/8.0) AS BIGINT))) AS t(gs)),
        freq AS (
          SELECT md5(trim(lower(line))) AS lh, COUNT(DISTINCT doc_id) AS df
          FROM lines GROUP BY 1),
        flagged AS (
          SELECT l.doc_id, l.line_no, l.line, (f.df >= 3) AS boiler
          FROM lines l JOIN freq f ON md5(trim(lower(l.line))) = f.lh)
        SELECT doc_id,
          COUNT(*) AS n_lines,
          COUNT(CASE WHEN NOT boiler THEN 1 END) AS n_kept,
          md5(coalesce(string_agg(CASE WHEN NOT boiler THEN line END,
            ' ' ORDER BY line_no), '')) AS clean_hash
        FROM flagged GROUP BY doc_id ORDER BY doc_id""")),

    // Per-domain quota cap (Curation.domainCap): keep the 10 smallest-
    // hash docs per source — the Common-Crawl "max N pages per host"
    // rule as a stable uniform sample. The salted two-level top-k is
    // exact, so the single-window oracle reproduces the kept set.
    GQuery("q_sample_domain_cap",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.domainCap(t.documents, "doc_id", "source", cap = 10)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source FROM (
          SELECT doc_id, source, row_number() OVER (
            PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents) t
        WHERE rn <= 10 ORDER BY doc_id""")),

    // Sequence packing (Curation.packSequences): concat-and-chunk
    // layout, 16 shards, 512-token budget. Exact cross-engine check:
    // the layout is pure hash-order + integer cumsum, so DuckDB
    // reproduces every (shard, seq_id, offset) bit-for-bit.
    GQuery("q_pack_sequences",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.packSequences(t.documents, "doc_id",
            TextFunctions.tokenCount(col("text")), budget = 512, shards = 16)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
            CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 16 AS INT) AS shard,
            md5('pack:' || CAST(doc_id AS VARCHAR)) AS ord,
            len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS nt
          FROM documents),
        c AS (SELECT doc_id, shard,
            COALESCE(SUM(nt) OVER (PARTITION BY shard ORDER BY ord, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
          FROM d)
        SELECT doc_id, shard, CAST(st // 512 AS BIGINT) AS seq_id,
          CAST(st % 512 AS BIGINT) AS offset
        FROM c ORDER BY doc_id""")),

    // Benchmark decontamination (Curation.contaminated): training docs
    // sharing >= 2 word-3-grams with the "eval set" (doc_id % 97 == 0
    // here). The operator joins on 64-bit shingle hashes; the oracle
    // recomputes the overlap on the string shingles — identical counts
    // unless a cross-set xxhash64 collision (p ~ 1e-10) perturbs one.
    GQuery("q_decontaminate",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.documents.filter(col("doc_id") % 97 === 0)
        val tr = t.documents.filter(col("doc_id") % 97 =!= 0)
        Curation.contaminated(tr, "doc_id", "text", ev, "text",
            shingleSize = 3, minHits = 2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
          FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
            range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks WHERE len(t) >= 3),
        ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
        SELECT tr.doc_id, COUNT(*) AS n_shared_shingles
        FROM tr JOIN ev USING (g)
        GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY doc_id""")),

    // Unigram-LM quality score + repetition ratio (Curation): the
    // perplexity-proxy filter pass — LM trained on the corpus itself
    // (token relative frequencies), scored per doc; repetition ratio
    // flags degenerate looping text. Both exactly mirrored in SQL.
    GQuery("q_text_lm",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.unigramScore(t.documents, "doc_id", "text")
          .join(t.documents.select(col("doc_id"),
            r4(Curation.repetitionRatio(col("text"))).as("rep_ratio")),
            "doc_id")
          .select(col("doc_id"), col("n_tokens"),
            r4(col("avg_neg_logp")).as("avg_neg_logp"), col("rep_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            unnest(list_filter(string_split(lower(text), ' '),
              x -> len(x) > 0)) AS tok
          FROM documents),
        freq AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
        tot AS (SELECT SUM(tf) AS total FROM freq),
        lm AS (SELECT doc_id, COUNT(*) AS n_tokens,
            ROUND(AVG(-ln(tf * 1.0 / total)), 4) AS avg_neg_logp
          FROM toks JOIN freq USING (tok) CROSS JOIN tot GROUP BY doc_id),
        rep AS (SELECT doc_id,
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
          FROM documents),
        rr AS (SELECT doc_id, CASE WHEN len(t) < 2 THEN 0.0 ELSE
            ROUND(1.0 - len(list_distinct(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i+1]))) * 1.0 / (len(t) - 1), 4) END
            AS rep_ratio
          FROM rep)
        SELECT doc_id, n_tokens, avg_neg_logp, rep_ratio
        FROM lm JOIN rr USING (doc_id) ORDER BY doc_id""")),

    // PII scrubbing (TextFunctions.redactPii/piiCounts) — the curation
    // pass a training pipeline runs before near-dup: PII spans are
    // synthesized deterministically per doc so both engines redact the
    // same text (the raw corpus is synthetic and PII-free).
    GQuery("q_text_redact",
      (s, dir) => {
        val t = Tables(s, dir)
        val pii = concat(substring(col("text"), 1, 20),
          lit(" mail u"), col("doc_id"), lit("@ex.com or 10.0.0."),
          col("doc_id") % 200, lit(" ssn 123-45-6789 tel 555-123-4567"))
        t.documents
          .select(col("doc_id"), TextFunctions.redactPii(pii).as("clean"))
          .withColumn("n_redacted",
            regexp_count(col("clean"),
              lit("\\[(EMAIL|PHONE|IP|SSN)\\]")).cast(LongType))
          .orderBy(col("doc_id"))
      },
      Some("""WITH pii AS (SELECT doc_id,
            substr(text, 1, 20) || ' mail u' || CAST(doc_id AS VARCHAR)
              || '@ex.com or 10.0.0.' || CAST(doc_id % 200 AS VARCHAR)
              || ' ssn 123-45-6789 tel 555-123-4567' AS t
          FROM documents),
        red AS (SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
              '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              '\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b', '[IP]', 'g'),
              '\+?[0-9][0-9()\-. ]{7,}[0-9]', '[PHONE]', 'g') AS clean
          FROM pii)
        SELECT doc_id, clean,
          len(regexp_extract_all(clean, '\[(EMAIL|PHONE|IP|SSN)\]')) AS n_redacted
        FROM red ORDER BY doc_id""")),

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

    // Exact duplicated-substring removal (Lee et al. 2022 ExactSubstr,
    // the 50-token-granularity dedup the big open corpora run; k=8
    // here so the fixture corpus has plenty of duplicated spans).
    // Every k-token window occurring at >1 (doc, pos) loses all but
    // its globally-first occurrence, token-wise; the full DuckDB
    // oracle recomputes the identical relational pipeline.
    GQuery("q_dedup_substring",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.substringDedup(t.documents, "doc_id", "text", 8)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
          FROM documents),
        pos AS (
          SELECT doc_id, tk, UNNEST(range(1, len(tk) + 1)) AS p FROM toks),
        wins AS (
          SELECT doc_id, p, md5(array_to_string(tk[p:p+7], ' ')) AS wh
          FROM pos WHERE p + 7 <= len(tk)),
        ranked AS (
          SELECT doc_id, p,
                 ROW_NUMBER() OVER (PARTITION BY wh ORDER BY doc_id, p) AS rk,
                 COUNT(*) OVER (PARTITION BY wh) AS cnt
          FROM wins),
        removed AS (
          SELECT DISTINCT doc_id, UNNEST(range(p, p + 8)) AS p
          FROM ranked WHERE cnt > 1 AND rk > 1),
        tok_rows AS (SELECT doc_id, p, tk[p] AS t FROM pos),
        kept AS (
          SELECT tr.doc_id, tr.p, tr.t, r.p IS NOT NULL AS rm
          FROM tok_rows tr LEFT JOIN removed r
            ON tr.doc_id = r.doc_id AND tr.p = r.p)
        SELECT doc_id,
          COUNT(*) AS n_tokens,
          COUNT(CASE WHEN rm THEN 1 END) AS n_removed,
          COALESCE(string_agg(CASE WHEN NOT rm THEN t END, ' ' ORDER BY p), '')
            AS text_clean
        FROM kept GROUP BY doc_id ORDER BY doc_id""")),

    // REAL image decode end-to-end (graft.operators.MediaCodec):
    // manufacture a deterministic solid-color BMP per document
    // (channels derived from doc_id), decode it through the JDK's
    // actual javax.imageio raster path inside the mapPartitions batch
    // transform, and emit pixel statistics. The oracle recomputes the
    // channel math directly — if the decoder were fake, width/height/
    // means would not reproduce.
    GQuery("q_multimodal_decode",
      (s, dir) => {
        val t = Tables(s, dir)
        import s.implicits._
        val withImg = t.documents.filter(col("doc_id") <= 100)
          .select(col("doc_id").cast(LongType)).as[Long]
          .mapPartitions { ids =>
            ids.map { id =>
              (id, Multimodal.decodeFeatures(MediaCodec.solidBmp(
                8, 6, (id % 256).toInt, (id * 7 % 256).toInt,
                (id * 13 % 256).toInt)))
            }
          }
          .toDF("doc_id", "f")
        withImg.select(col("doc_id"),
            col("f")(0).cast(IntegerType).as("tag"),
            col("f")(1).cast(IntegerType).as("width"),
            col("f")(2).cast(IntegerType).as("height"),
            col("f")(3).cast(IntegerType).as("mean_r"),
            col("f")(4).cast(IntegerType).as("mean_g"),
            col("f")(5).cast(IntegerType).as("mean_b"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 1 AS tag, 8 AS width, 6 AS height,
        CAST(doc_id % 256 AS INT) AS mean_r,
        CAST(doc_id * 7 % 256 AS INT) AS mean_g,
        CAST(doc_id * 13 % 256 AS INT) AS mean_b
        FROM documents WHERE doc_id <= 100 ORDER BY doc_id""")),

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

    // FULL upsert with metadata TTL (UpsertConfig.metadataTTL,
    // BasePartitionUpsertMetadataManager.isOutOfMetadataTTL): under
    // comparison-ordered replay the observable rule is the
    // per-version gap test — a record is served iff it has no newer
    // version or its successor is more than TTL away (the key's
    // metadata had already expired, the reference's documented
    // duplicate-row hazard). EXACT oracle: DuckDB replays the same
    // LEAD gap rule (12h TTL over the events span).
    GQuery("q_upsert_metadata_ttl",
      (s, dir) => {
        val t = Tables(s, dir)
        val cmp = unix_millis(col("ts").cast(TimestampType)).cast(DoubleType)
        Upsert.latestByKeyMetadataTtl(t.events, Seq("user_id"), cmp,
            ttl = 43200000.0, tieCols = Seq("event_id"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_served"),
            max(col("event_id")).as("max_event"),
            min(unix_millis(col("ts").cast(TimestampType))).as("t_min"))
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, epoch_ms(ts) AS t,
          LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_ms(ts), event_id) - epoch_ms(ts) AS gap
        FROM events),
        served AS (SELECT user_id, event_id, t FROM g
          WHERE gap IS NULL OR gap > 43200000)
        SELECT user_id, COUNT(*) AS n_served, MAX(event_id) AS max_event,
          MIN(t) AS t_min
        FROM served GROUP BY 1 ORDER BY 1""")),

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

    // Dedup table with metadata TTL (Upsert.dedupTtl — reference
    // DedupConfig.metadataTTL watermark expiry, reduced to the per-key
    // greedy gap rule under time-ordered replay). EXACT oracle: DuckDB
    // replays the same greedy selection with a recursive CTE (each
    // step joins the next record more than TTL after the last kept),
    // aggregated per key.
    GQuery("q_dedup_ttl",
      (s, dir) => {
        val t = Tables(s, dir)
        val ms = unix_millis(col("ts").cast(TimestampType))
        val kept = Upsert.dedupTtl(t.events, Seq("user_id"), ms,
          ttlMillis = 43200000L, tieCols = Seq("event_id"))
        kept.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_kept"),
            min(unix_millis(col("ts").cast(TimestampType))).as("t_first"),
            max(unix_millis(col("ts").cast(TimestampType))).as("t_last"))
          .orderBy(col("user_id"))
      },
      Some("""WITH RECURSIVE base AS (
          SELECT user_id AS k, epoch_ms(ts) AS t, event_id,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS rn
          FROM events),
        keep AS (
          SELECT k, t, rn FROM base WHERE rn = 1
          UNION ALL
          SELECT b.k, b.t, b.rn FROM keep kp JOIN base b
            ON b.k = kp.k AND b.rn = (
              SELECT min(b2.rn) FROM base b2
              WHERE b2.k = kp.k AND b2.t - kp.t > 43200000))
        SELECT k AS user_id, count(*) AS n_kept,
               min(t) AS t_first, max(t) AS t_last
        FROM keep GROUP BY k ORDER BY user_id""")),

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

    // Logical table spanning N physical tables (LogicalTableConfig /
    // PhysicalTableConfig + TimeBoundaryConfig "min" strategy): two
    // OFFLINE members with different ingestion horizons + one
    // REALTIME member; the boundary is the minimum over offline
    // members of (max(time) − 1 day) — the latest instant EVERY
    // offline member has fully ingested — so the overlap region is
    // answered exactly once. EXACT oracle: DuckDB composes the same
    // members and boundary formula.
    GQuery("q_logical_table",
      (s, dir) => {
        val t = Tables(s, dir)
        val cfg = graft.schema.LogicalTable.Config("orders_logical",
          Seq(
            graft.schema.LogicalTable.Physical("orders_even_OFFLINE",
              t.orders, "OFFLINE", Some(col("o_orderkey") % 2 === 0)),
            graft.schema.LogicalTable.Physical("orders_odd_OFFLINE",
              t.orders, "OFFLINE", Some(col("o_orderkey") % 2 === 1 &&
                col("o_orderdate") <=
                  lit("1997-12-31 00:00:00").cast(TimestampType))),
            graft.schema.LogicalTable.Physical("orders_tail_REALTIME",
              t.orders, "REALTIME", Some(col("o_orderdate") >=
                lit("1995-01-01 00:00:00").cast(TimestampType)))),
          "o_orderdate", "1 day", "min")
        graft.schema.LogicalTable.view(cfg)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("price_sum"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH off_even AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
        off_odd AS (SELECT * FROM orders WHERE o_orderkey % 2 = 1
          AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'),
        rt AS (SELECT * FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'),
        b AS (SELECT LEAST((SELECT MAX(o_orderdate) FROM off_even),
          (SELECT MAX(o_orderdate) FROM off_odd)) - INTERVAL 1 DAY AS x),
        v AS (
          SELECT o_orderstatus, o_totalprice FROM off_even
            WHERE o_orderdate <= (SELECT x FROM b)
          UNION ALL
          SELECT o_orderstatus, o_totalprice FROM off_odd
            WHERE o_orderdate <= (SELECT x FROM b)
          UNION ALL
          SELECT o_orderstatus, o_totalprice FROM rt
            WHERE o_orderdate > (SELECT x FROM b))
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS price_sum
        FROM v GROUP BY 1 ORDER BY 1""")),

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

    // Gapfill post-fill aggregation (BaseGapfillProcessor.java /
    // GapfillUtils.java:40): daily average of the gap-filled hourly
    // series — missing hours contribute their previous-filled value
    // instead of shrinking the average's denominator.
    GQuery("q_gapfill_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        val agg = t.events
          .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
          .agg(dsum(col("value")).as("v"))
        Gapfill.gapfillAggregate(s, agg, "bucket", Seq("event_type"), "1 hour",
            Seq(Gapfill.FillPrevious("v")),
            date_trunc("day", col("bucket")), "day",
            Seq(count(col("v")).as("n_hours"),
              // exact decimal sum over FILLED buckets (avg = sum/n_hours;
              // emitting the sum keeps the check exact — a rounded avg of
              // /24 rationals lands on .xxxx5 halfway cases that round
              // differently across engines)
              dsum(col("v")).as("sum_v")))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH agg AS (
          SELECT date_trunc('hour', ts) AS bucket, event_type,
            CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds),
        grid AS (SELECT bucket, event_type FROM spine
          CROSS JOIN (SELECT DISTINCT event_type FROM agg)),
        joined AS (SELECT g.bucket, g.event_type, a.v
          FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket AND g.event_type = a.event_type),
        filled AS (SELECT bucket, event_type,
          last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
          FROM joined)
        SELECT date_trunc('day', bucket) AS day, event_type,
          COUNT(v) AS n_hours,
          CAST(SUM(CAST(v AS DECIMAL(20,4))) AS DOUBLE) AS sum_v
        FROM filled GROUP BY 1, 2 ORDER BY day, event_type""")),

    // RAW-SELECTION gapfill (GapfillProcessor.java:173-238 — the
    // SELECT-shape GapFill(...) table function): every bucket keeps its
    // raw rows at ORIGINAL multiplicity and gains one synthesized row
    // per missing TIMESERIESON series; FILL_PREVIOUS carries the
    // series' latest raw value, tiebroken by the unique event_id the
    // way the processor keeps the last merged row. Oracle reconstructs
    // the same contract with an anti-join + correlated latest-row pick.
    GQuery("q_gapfill_select",
      (s, dir) => {
        val t = Tables(s, dir)
        val start = 1704153600000L // 2024-01-02T00:00:00Z
        val end = start + 8 * 900000L
        val ms = unix_millis(col("ts").cast(TimestampType))
        val raw = t.events.select(
          ((ms / 900000L).cast(LongType) * 900000L).as("bucket"),
          col("event_type"), round(col("value"), 4).as("v"),
          col("event_id"))
        Gapfill.gapfillSelect(raw, "bucket", Seq("event_type"),
            start, end, 900000L,
            Seq(Gapfill.FillPrevious("v")), orderCol = Some("event_id"))
          .orderBy(col("bucket"), col("event_type"), col("v"))
      },
      Some("""WITH raw AS (
          SELECT (epoch_ms(ts) // 900000) * 900000 AS bucket, event_type,
            round(value, 4) AS v, event_id
          FROM events
          WHERE (epoch_ms(ts) // 900000) * 900000 < 1704160800000),
        series AS (SELECT DISTINCT event_type FROM raw),
        grid AS (SELECT r.range AS bucket, s.event_type
          FROM range(1704153600000, 1704160800000, 900000) r
          CROSS JOIN series s),
        missing AS (
          SELECT g.bucket, g.event_type FROM grid g
          ANTI JOIN (SELECT DISTINCT bucket, event_type FROM raw
                     WHERE bucket >= 1704153600000) r
            USING (bucket, event_type)),
        filled AS (
          SELECT m.bucket, m.event_type,
            COALESCE((SELECT r.v FROM raw r
              WHERE r.event_type = m.event_type AND r.bucket < m.bucket
              ORDER BY r.bucket DESC, r.event_id DESC LIMIT 1), 0.0) AS v
          FROM missing m)
        SELECT bucket, event_type, v FROM filled
        UNION ALL
        SELECT bucket, event_type, v FROM raw WHERE bucket >= 1704153600000
        ORDER BY bucket, event_type, v""")),

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

    // FUNNELMATCHSTEP (windowed, 2-day window): per user, max step
    // reached inside any step-1-anchored window + the 0/1 step array.
    GQuery("q_funnel_matchstep",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.matchStep(t.events, "user_id",
            unix_millis(col("ts").cast(TimestampType)),
            Seq(col("event_type") === "signup",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            windowMillis = 172800000L)
          .select(col("user_id"), col("max_step"),
            array_join(col("match_steps"), ",").as("match_csv"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type
          FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
        u AS (SELECT DISTINCT user_id FROM ev),
        a AS (SELECT user_id, ts AS ts1 FROM ev WHERE event_type = 'signup'),
        s2 AS (SELECT a.user_id, a.ts1, MIN(e.ts) AS ts2 FROM a JOIN ev e
          ON e.user_id = a.user_id AND e.event_type = 'click'
          AND e.ts >= a.ts1 AND e.ts < a.ts1 + 172800000 GROUP BY 1, 2),
        s3 AS (SELECT s2.user_id, s2.ts1, s2.ts2, MIN(e.ts) AS ts3
          FROM s2 JOIN ev e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
          AND e.ts >= s2.ts2 AND e.ts < s2.ts1 + 172800000 GROUP BY 1, 2, 3),
        ms AS (SELECT u.user_id,
          CASE WHEN u.user_id IN (SELECT user_id FROM s3) THEN 3
               WHEN u.user_id IN (SELECT user_id FROM s2) THEN 2
               WHEN u.user_id IN (SELECT user_id FROM a) THEN 1
               ELSE 0 END AS max_step FROM u)
        SELECT user_id, max_step,
          CASE max_step WHEN 3 THEN '1,1,1' WHEN 2 THEN '1,1,0'
            WHEN 1 THEN '1,0,0' ELSE '0,0,0' END AS match_csv
        FROM ms ORDER BY user_id""")),

    // FUNNELMATCHSTEP with STRICT_INCREASE (FunnelModes): only strictly
    // increasing timestamps advance — the oracle's greedy join chain
    // uses strict inequalities (ts > previous match) instead of >=.
    GQuery("q_funnel_matchstep_strict",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.matchStep(t.events, "user_id",
            unix_millis(col("ts").cast(TimestampType)),
            Seq(col("event_type") === "signup",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            windowMillis = 172800000L,
            modes = Funnel.Modes(strictIncrease = true))
          .select(col("user_id"), col("max_step"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type
          FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
        u AS (SELECT DISTINCT user_id FROM ev),
        a AS (SELECT user_id, ts AS ts1 FROM ev WHERE event_type = 'signup'),
        s2 AS (SELECT a.user_id, a.ts1, MIN(e.ts) AS ts2 FROM a JOIN ev e
          ON e.user_id = a.user_id AND e.event_type = 'click'
          AND e.ts > a.ts1 AND e.ts < a.ts1 + 172800000 GROUP BY 1, 2),
        s3 AS (SELECT s2.user_id, s2.ts1, s2.ts2, MIN(e.ts) AS ts3
          FROM s2 JOIN ev e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
          AND e.ts > s2.ts2 AND e.ts < s2.ts1 + 172800000 GROUP BY 1, 2, 3),
        ms AS (SELECT u.user_id,
          CASE WHEN u.user_id IN (SELECT user_id FROM s3) THEN 3
               WHEN u.user_id IN (SELECT user_id FROM s2) THEN 2
               WHEN u.user_id IN (SELECT user_id FROM a) THEN 1
               ELSE 0 END AS max_step FROM u)
        SELECT user_id, max_step FROM ms ORDER BY user_id""")),

    // FUNNELSTEPDURATIONSTATS (windowed): duration stats between
    // consecutive steps over each user's first completing window.
    GQuery("q_funnel_duration",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.stepDurationStats(t.events, "user_id",
            unix_millis(col("ts").cast(TimestampType)),
            Seq(col("event_type") === "signup",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            windowMillis = 172800000L)
          .orderBy(col("transition"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type
          FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
        a AS (SELECT user_id, ts AS ts1 FROM ev WHERE event_type = 'signup'),
        s2 AS (SELECT a.user_id, a.ts1, MIN(e.ts) AS ts2 FROM a JOIN ev e
          ON e.user_id = a.user_id AND e.event_type = 'click'
          AND e.ts >= a.ts1 AND e.ts < a.ts1 + 172800000 GROUP BY 1, 2),
        s3 AS (SELECT s2.user_id, s2.ts1, s2.ts2, MIN(e.ts) AS ts3
          FROM s2 JOIN ev e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
          AND e.ts >= s2.ts2 AND e.ts < s2.ts1 + 172800000 GROUP BY 1, 2, 3),
        f AS (SELECT user_id, ts1, ts2, ts3,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts1) AS rn FROM s3),
        d AS (SELECT ts2 - ts1 AS d1, ts3 - ts2 AS d2 FROM f WHERE rn = 1)
        SELECT 1 AS transition, COUNT(*) AS n_complete,
          ROUND(AVG(d1), 4) AS avg_ms, MIN(d1) AS min_ms, MAX(d1) AS max_ms,
          ROUND(quantile_cont(d1, 0.5), 4) AS med_ms FROM d
        UNION ALL SELECT 2, COUNT(*), ROUND(AVG(d2), 4), MIN(d2), MAX(d2),
          ROUND(quantile_cont(d2, 0.5), 4) FROM d
        ORDER BY transition""")),

    // FUNNELEVENTSFUNCTIONEVAL (windowed): for each user completing the
    // funnel, the extra-field values (event_id) of the matched per-step
    // events from the first completing window — the reference surfaces
    // exactly these flattened extra fields for downstream function eval.
    GQuery("q_funnel_events",
      (s, dir) => {
        val t = Tables(s, dir)
        Funnel.eventsFunctionEval(t.events, "user_id",
            unix_millis(col("ts").cast(TimestampType)),
            Seq(col("event_type") === "signup",
              col("event_type") === "click",
              col("event_type") === "purchase"),
            windowMillis = 172800000L,
            extra = col("event_id"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type,
            event_id
          FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
        a AS (SELECT user_id, ts AS ts1, event_id AS id1 FROM ev
          WHERE event_type = 'signup'),
        s2 AS (SELECT a.user_id, a.ts1, a.id1, MIN(e.ts) AS ts2,
            arg_min(e.event_id, e.ts) AS id2
          FROM a JOIN ev e ON e.user_id = a.user_id
            AND e.event_type = 'click'
            AND e.ts >= a.ts1 AND e.ts < a.ts1 + 172800000 GROUP BY 1, 2, 3),
        s3 AS (SELECT s2.user_id, s2.ts1, s2.id1, s2.id2,
            arg_min(e.event_id, e.ts) AS id3
          FROM s2 JOIN ev e ON e.user_id = s2.user_id
            AND e.event_type = 'purchase'
            AND e.ts >= s2.ts2 AND e.ts < s2.ts1 + 172800000
          GROUP BY 1, 2, 3, 4),
        f AS (SELECT user_id, id1, id2, id3,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts1) AS rn
          FROM s3)
        SELECT user_id, id1::VARCHAR || ',' || id2::VARCHAR || ','
            || id3::VARCHAR AS matched_csv
        FROM f WHERE rn = 1 ORDER BY user_id""")),

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
        GROUP BY s.step ORDER BY s.step""")),

    // ——— Round-3 additions: corpus-scale clustering / selection ———

    // Fully distributed Lloyd's k-means (Clustering.kmeans): per
    // iteration ONE pass reduces to a k×dim moment matrix — no vector
    // ever reaches the driver (the scale path complementing IVF's
    // bounded-sample trainer). CROSS-ENGINE: seeds are deterministic
    // (k smallest ids), so DuckDB independently recomputes the first
    // TWO Lloyd iterations — assignment under the seeds, per-cell
    // means, and both SSEs — from the raw parquet; the engine's
    // moment-derived SSEs must match the oracle's direct sums to 4 dp.
    // sse_monotone_ok additionally asserts Lloyd's convergence
    // guarantee across ALL iterations.
    GQuery("q_cluster_kmeans",
      (s, dir) => {
        val t = Tables(s, dir)
        val m = Clustering.kmeans(t.embeddings, "vec_id", "embedding",
          k = 8, iterations = 3)
        val monotone = m.sseByIteration.sliding(2)
          .forall(p => p.last <= p.head + 1e-6)
        m.assignments.agg(count(lit(1)).as("n_total"))
          .select(col("n_total"),
            r4(lit(m.sseByIteration.head)).as("sse_first"),
            r4(lit(m.sseByIteration(1))).as("sse_second"),
            lit(monotone).as("sse_monotone_ok"))
      },
      Some("""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        seeds AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS c
          FROM (SELECT * FROM e ORDER BY id LIMIT 8)),
        d1 AS (SELECT e.id, e.v, s.cell,
            list_sum(list_transform(list_zip(e.v, s.c),
              t -> (t[1] - t[2]) * (t[1] - t[2]))) AS d2
          FROM e CROSS JOIN seeds s),
        m1 AS (SELECT id, MIN(d2) AS dmin FROM d1 GROUP BY 1),
        a1 AS (SELECT d1.id, ANY_VALUE(d1.v) AS v, MIN(d1.cell) AS cell
          FROM d1 JOIN m1 ON d1.id = m1.id AND d1.d2 = m1.dmin GROUP BY d1.id),
        cm AS (SELECT cell, i, AVG(v[i]) AS m
          FROM a1, (SELECT unnest(range(1, 65)) AS i) ii GROUP BY 1, 2),
        c1 AS (SELECT cell, list(m ORDER BY i) AS c FROM cm GROUP BY 1),
        d2p AS (SELECT e.id,
            MIN(list_sum(list_transform(list_zip(e.v, c1.c),
              t -> (t[1] - t[2]) * (t[1] - t[2])))) AS dmin
          FROM e CROSS JOIN c1 GROUP BY e.id)
        SELECT (SELECT COUNT(*) FROM e) AS n_total,
          (SELECT ROUND(SUM(dmin), 4) FROM m1) AS sse_first,
          (SELECT ROUND(SUM(dmin), 4) FROM d2p) AS sse_second,
          TRUE AS sse_monotone_ok""")),

    // DSIR data selection (Xie et al. 2023): hashed uni+bigram features
    // (dim-bounded by construction — the broadcast CANNOT grow with the
    // corpus, unlike a vocabulary table), Laplace-smoothed
    // target-vs-raw bucket log-ratios, per-doc importance weights, and
    // Gumbel-top-k sampling ∝ exp(log_w). Everything is the
    // engine-portable md5 hash, so the oracle recomputes the ENTIRE
    // pipeline — features, distributions, weights, noise, selection —
    // and must reproduce the exact 100-row draw. Target distribution:
    // English docs; raw: the whole corpus.
    GQuery("q_dsir_select",
      (s, dir) => {
        val t = Tables(s, dir)
        val dim = 2048
        // target = English docs, a flagged subset of raw → the fused
        // single-feature-pass form (r14 perf: ratios + weights off ONE
        // explode instead of re-tokenizing the corpus per pass)
        val w = Curation.dsirWeightsFlagged(t.documents, "doc_id",
          col("lang") === "en", "text", dim)
        Curation.dsirResample(w, "doc_id", n = 100)
          .select(col("doc_id"), col("n_feats"), col("log_w"),
            col("gumbel_key"))
          .orderBy(col("gumbel_key").desc, col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, lang,
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
          FROM documents),
        f AS (SELECT doc_id, lang,
            tk || [tk[i] || ' ' || tk[i + 1] FOR i IN range(1, len(tk))] AS feats
          FROM tk),
        ex AS (SELECT doc_id, lang,
            CAST(('0x' || substr(md5(ft), 1, 8)) AS BIGINT) % 2048 AS bucket
          FROM (SELECT doc_id, lang, unnest(feats) AS ft FROM f)),
        ct AS (SELECT bucket, COUNT(*) AS c FROM ex WHERE lang = 'en'
          GROUP BY 1),
        cr AS (SELECT bucket, COUNT(*) AS c FROM ex GROUP BY 1),
        nt AS (SELECT COUNT(*) AS n FROM ex WHERE lang = 'en'),
        nr AS (SELECT COUNT(*) AS n FROM ex),
        ratio AS (SELECT b.bucket,
            ROUND(ln((COALESCE(ct.c, 0) + 1) * 1.0 / (nt.n + 2048))
                - ln((COALESCE(cr.c, 0) + 1) * 1.0 / (nr.n + 2048)), 6) AS lr
          FROM (SELECT unnest(range(0, 2048)) AS bucket) b
          LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket), nt, nr),
        w AS (SELECT e.doc_id, COUNT(*) AS n_feats,
            ROUND(SUM(r.lr), 4) AS log_w
          FROM ex e JOIN ratio r USING (bucket) GROUP BY 1)
        SELECT doc_id, n_feats, log_w,
          ROUND(log_w - ln(-ln(
            (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) + 0.5) / 4294967296.0)), 6) AS gumbel_key
        FROM w
        ORDER BY gumbel_key DESC, doc_id LIMIT 100""")),

    // Gopher rule-based quality gate (Rae et al. 2021 app. A,
    // Curation.gopherFlags): per-rule pass counts and the kept-doc
    // count, every rule a map-only Catalyst expression. EXACT oracle:
    // all five rules are integer/single-division arithmetic DuckDB
    // reproduces bit-for-bit.
    GQuery("q_gopher_rules",
      (s, dir) => {
        val t = Tables(s, dir)
        def cnt(c: Column) = sum(c.cast("long"))
        graft.operators.Parallelism.ensure(t.documents, "doc_id")
          .select(Curation.gopherFlags(col("text"), minWords = 10).as("g"))
          .agg(count(lit(1)).as("n_docs"),
            cnt(col("g.word_count_ok")).as("n_word_count_ok"),
            cnt(col("g.mean_word_len_ok")).as("n_mean_word_len_ok"),
            cnt(col("g.alpha_frac_ok")).as("n_alpha_frac_ok"),
            cnt(col("g.stopwords_ok")).as("n_stopwords_ok"),
            cnt(col("g.symbol_ratio_ok")).as("n_symbol_ratio_ok"),
            cnt(col("g.keep")).as("n_keep"))
      },
      Some("""WITH t AS (SELECT doc_id,
            list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
          FROM documents),
        f AS (SELECT doc_id, len(tk) AS n,
            CASE WHEN len(tk) > 0 THEN
              list_sum(list_transform(tk, x -> len(x))) * 1.0 / len(tk)
              ELSE 0.0 END AS mean_len,
            CASE WHEN len(tk) > 0 THEN
              len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))
                * 1.0 / len(tk) ELSE 0.0 END AS alpha_frac,
            len(list_filter(['the','be','to','of','and','that','have','with'],
              s -> list_contains(tk, s))) AS n_stop,
            CASE WHEN len(tk) > 0 THEN
              len(list_filter(tk, x -> contains(x, '#') OR contains(x, '...')))
                * 1.0 / len(tk) ELSE 0.0 END AS sym
          FROM t),
        r AS (SELECT doc_id,
            n BETWEEN 10 AND 100000 AS wc,
            mean_len BETWEEN 3.0 AND 10.0 AS ml,
            alpha_frac >= 0.8 AS af, n_stop >= 2 AS sw, sym < 0.1 AS sr
          FROM f)
        SELECT COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN wc THEN 1 ELSE 0 END) AS BIGINT) AS n_word_count_ok,
          CAST(SUM(CASE WHEN ml THEN 1 ELSE 0 END) AS BIGINT) AS n_mean_word_len_ok,
          CAST(SUM(CASE WHEN af THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_frac_ok,
          CAST(SUM(CASE WHEN sw THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords_ok,
          CAST(SUM(CASE WHEN sr THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol_ratio_ok,
          CAST(SUM(CASE WHEN wc AND ml AND af AND sw AND sr THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keep
        FROM r""")),

    // CCNet-style perplexity bucketing: score every doc with the
    // corpus unigram LM (Curation.unigramScore), split into
    // head/middle/tail terciles by score, report per-bucket counts and
    // mean scores. ntile is a deterministic global ranking (rounded
    // score + doc_id tie-break) that DuckDB reproduces exactly; at
    // corpus scale the tercile THRESHOLDS would come from a quantile
    // sketch and the bucket assignment stays map-only — the global
    // sort here is the exactness path, not the scale path.
    GQuery("q_ppl_buckets",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(r6(col("avg_neg_logp")), col("doc_id"))
        Curation.unigramScore(t.documents, "doc_id", "text")
          .withColumn("bucket", ntile(3).over(w))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            r4(avg(col("avg_neg_logp"))).as("mean_nlp"))
          .orderBy(col("bucket"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            unnest(list_filter(string_split(lower(text), ' '),
              x -> len(x) > 0)) AS tok
          FROM documents),
        freq AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n FROM toks),
        sc AS (SELECT t.doc_id, AVG(-ln(f.tf * 1.0 / tot.n)) AS s
          FROM toks t JOIN freq f USING (tok), tot GROUP BY 1),
        b AS (SELECT doc_id, s,
            NTILE(3) OVER (ORDER BY ROUND(s, 6), doc_id) AS bucket
          FROM sc)
        SELECT bucket, COUNT(*) AS n, ROUND(AVG(s), 4) AS mean_nlp
        FROM b GROUP BY 1 ORDER BY bucket""")),

    // Image near-dup dedup over REAL decoded pixels: 200 synthetic BMP
    // fixtures (40 random 16x16 patterns x 5 uniform brightness
    // shifts), perceptual dHash per image (javax.imageio decode +
    // 9x8 bilinear downscale), pigeonhole-banded hamming self-join.
    // dHash is exactly invariant under the un-clipped brightness shift,
    // so the pair set is CLOSED-FORM: all 40*C(5,2)=400 within-pattern
    // pairs at distance 0, and no cross-pattern pair survives dist<=3.
    GQuery("q_image_neardup",
      (s, dir) => {
        import s.implicits._
        val imgs = (0 until 200).map { i =>
          (i.toLong, Multimodal.patternBmp(i / 5, (i % 5) * 8))
        }.toDF("img_id", "content")
        val hashes = Multimodal.imageDHash(imgs, "img_id")
        val pairs = Dedup.fingerprintPairs(hashes, "id", "dhash",
          maxDist = 3)
        pairs.agg(
          count(lit(1)).cast("long").as("n_pairs"),
          count(when(col("dist") === 0, 1)).cast("long").as("n_zero"),
          coalesce(bool_and(floor(col("id_a") / 5) ===
            floor(col("id_b") / 5)), lit(false)).as("same_pattern_ok"))
      },
      Some("""SELECT CAST(400 AS BIGINT) AS n_pairs,
          CAST(400 AS BIGINT) AS n_zero, TRUE AS same_pattern_ok""")),

    // Audio near-dup dedup over REAL WAV decode: 40 random PCM
    // waveforms x 5 integer gains; the energy-difference fingerprint
    // is exactly gain-invariant, so all 400 within-waveform pairs (and
    // only those) match at distance 0 — same closed-form oracle shape
    // as q_image_neardup.
    GQuery("q_audio_neardup",
      (s, dir) => {
        import s.implicits._
        val wavs = (0 until 200).map { i =>
          (i.toLong, Multimodal.patternWav(i / 5, (i % 5) + 1))
        }.toDF("wav_id", "content")
        val fps = Multimodal.audioFingerprints(wavs, "wav_id")
        val pairs = Dedup.fingerprintPairs(fps, "id", "afp", maxDist = 3)
        pairs.agg(
          count(lit(1)).cast("long").as("n_pairs"),
          count(when(col("dist") === 0, 1)).cast("long").as("n_zero"),
          coalesce(bool_and(floor(col("id_a") / 5) ===
            floor(col("id_b") / 5)), lit(false)).as("same_wave_ok"))
      },
      Some("""SELECT CAST(400 AS BIGINT) AS n_pairs,
          CAST(400 AS BIGINT) AS n_zero, TRUE AS same_wave_ok""")),

    // Video near-dup: 30 base frame sequences (8 real BMP frames each)
    // x 5 uniform brightness variants in a length-prefixed frame
    // container (codec stand-in, documented); per-frame dHash + bit-
    // majority temporal fold. Frame-wise invariance makes the pair set
    // closed-form: 30*C(5,2)=300 pairs, all distance 0.
    GQuery("q_video_neardup",
      (s, dir) => {
        import s.implicits._
        val vids = (0 until 150).map { i =>
          val base = i / 5; val bright = (i % 5) * 8
          val frames = (0 until 8).map(f =>
            Multimodal.patternBmp(base * 31 + f, bright))
          (i.toLong, Multimodal.packFrames(frames))
        }.toDF("vid_id", "content")
        val fps = Multimodal.videoFingerprints(vids, "vid_id")
        val pairs = Dedup.fingerprintPairs(fps, "id", "vfp", maxDist = 3)
        pairs.agg(
          count(lit(1)).cast("long").as("n_pairs"),
          count(when(col("dist") === 0, 1)).cast("long").as("n_zero"),
          coalesce(bool_and(floor(col("id_a") / 5) ===
            floor(col("id_b") / 5)), lit(false)).as("same_video_ok"))
      },
      Some("""SELECT CAST(300 AS BIGINT) AS n_pairs,
          CAST(300 AS BIGINT) AS n_zero, TRUE AS same_video_ok""")),

    // Canonical URL normalization (Curation.canonicalUrl — the first
    // dedup key of web-corpus pipelines). Synthetic URLs exercise
    // every rule (case, www, default vs explicit ports, trailing
    // slash, tracking params, param order, fragments); DuckDB
    // replicates the full regexp pipeline and every canonical string
    // must match exactly.
    GQuery("q_dedup_url",
      (s, dir) => {
        val t = Tables(s, dir)
        val id = col("doc_id")
        val url = concat(
          when(id % 2 === 0, "HTTPS").otherwise("http"), lit("://"),
          when(id % 3 === 0, "WWW.").otherwise(lit("")),
          lit("Site"), (id % 5).cast("string"), lit(".com"),
          when(id % 2 === 0, ":443")
            .when(id % 4 === 1, ":8080").otherwise(":80"),
          lit("/Path/"), (id % 7).cast("string"),
          when(id % 2 === 0, "/").otherwise(lit("")),
          lit("?utm_source=x&b="), (id % 3).cast("string"), lit("&a=1"),
          when(id % 5 === 0, "#frag").otherwise(lit("")))
        t.documents.filter(id < 120)
          .select(id, Curation.canonicalUrl(url).as("canon"))
          .orderBy(id)
      },
      Some("""WITH u AS (SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
          (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
          'Site' || CAST(doc_id % 5 AS VARCHAR) || '.com' ||
          (CASE WHEN doc_id % 2 = 0 THEN ':443'
                WHEN doc_id % 4 = 1 THEN ':8080' ELSE ':80' END) ||
          '/Path/' || CAST(doc_id % 7 AS VARCHAR) ||
          (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
          '?utm_source=x&b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1' ||
          (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
          FROM documents WHERE doc_id < 120),
        c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        c2 AS (SELECT doc_id,
            lower(regexp_extract(nofrag, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
            regexp_replace(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS rest
          FROM c1),
        c3 AS (SELECT doc_id, scheme,
            regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
            regexp_replace(rest, '^[^/?]*', '') AS pathq
          FROM c2),
        c4 AS (SELECT doc_id, scheme, pathq,
            regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
              '^www\.', '') AS hostnowww,
            regexp_extract(hostport, ':([0-9]+)$', 1) AS port
          FROM c3),
        c5 AS (SELECT doc_id, scheme, hostnowww,
            CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                 OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END AS keepport,
            CASE WHEN regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                   '/+$', '') = '' THEN '/'
                 ELSE regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                   '/+$', '') END AS pathnorm,
            array_to_string(list_sort(list_filter(
              string_split(regexp_extract(pathq, '\?(.*)$', 1), '&'),
              p -> p <> '' AND NOT regexp_matches(p,
                '^(utm_[^=]*|gclid|fbclid)='))), '&') AS qnorm
          FROM c4)
        SELECT doc_id, scheme || '://' || hostnowww || keepport || pathnorm ||
          (CASE WHEN qnorm = '' THEN '' ELSE '?' || qnorm END) AS canon
        FROM c5 ORDER BY doc_id""")),

    // The SCALE PATH for perplexity bucketing: thresholds from a KLL
    // quantile sketch (one aggregate, mergeable state) instead of
    // q_ppl_buckets' global ntile sort — assignment becomes a map-only
    // comparison against two broadcast thresholds, nothing ever
    // single-partitions. Verdicts: exact total, 3 buckets, balance
    // within KLL rank-error tolerance, bucket means monotone.
    GQuery("q_ppl_buckets_kll",
      (s, dir) => {
        val t = Tables(s, dir)
        val scored = Curation.unigramScore(t.documents, "doc_id", "text")
        val th = scored.agg(
          graft.plans.KllSketch.percentileKll(col("avg_neg_logp"),
            100.0 / 3).as("t1"),
          graft.plans.KllSketch.percentileKll(col("avg_neg_logp"),
            200.0 / 3).as("t2"))
        val stats = scored.crossJoin(broadcast(th))
          .withColumn("bucket",
            when(col("avg_neg_logp") <= col("t1"), 1)
              .when(col("avg_neg_logp") <= col("t2"), 2).otherwise(3))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("bn"), avg(col("avg_neg_logp")).as("bm"))
        stats.agg(
          sum(col("bn")).cast("long").as("n_total"),
          (count(lit(1)) === 3).as("three_buckets"),
          ((max(col("bn")) - min(col("bn"))).cast("double") <=
            sum(col("bn")) * 0.1).as("balance_ok"),
          (max(when(col("bucket") === 1, col("bm"))) <=
            max(when(col("bucket") === 2, col("bm"))) &&
            max(when(col("bucket") === 2, col("bm"))) <=
              max(when(col("bucket") === 3, col("bm")))).as("monotone_ok"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
          TRUE AS three_buckets, TRUE AS balance_ok, TRUE AS monotone_ok
        FROM documents""")),

    // REAL byte-pair-encoding tokenization (Bpe): merges learned from
    // the corpus-wide top-2^14 word-frequency table (bounded collect at
    // any corpus size), applied as a map-only scalar expression. The
    // oracle checks the exact cross-engine word/char totals; the
    // BPE-specific claims are per-doc invariants aggregated to
    // verdicts — every doc's token concatenation reproduces its
    // squeezed text (losslessness), token counts lie in
    // [words, non-space chars], and the learned merges strictly
    // compress the corpus.
    GQuery("q_tokenize_bpe",
      (s, dir) => {
        val t = Tables(s, dir)
        val merges = graft.functions.Bpe.train(t.documents, "text",
          numMerges = 120)
        val toks = graft.functions.Bpe.encode(col("text"), merges)
        val squeezed = regexp_replace(lower(col("text")), "\\s+", "")
        // r14 perf: the encode expression (120-merge fold per doc) was
        // referenced twice (size + concat_ws) and Catalyst re-evaluates
        // per reference — bind it once per row
        graft.operators.Parallelism.ensure(t.documents, "doc_id").select(
            TextFunctions.bound(toks) { tk =>
              struct(size(tk).as("n"),
                (concat_ws("", tk) === squeezed).as("ok"))
            }.as("__b"),
            size(TextFunctions.tokens(col("text"))).as("n_words"),
            length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
          .select(col("__b.n").as("n_bpe"), col("n_words"), col("n_chars"),
            col("__b.ok").as("lossless"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).cast("long").as("total_words"),
            sum(col("n_chars")).cast("long").as("total_chars"),
            bool_and(col("lossless")).as("lossless_ok"),
            bool_and(col("n_bpe").between(col("n_words"), col("n_chars")))
              .as("bounds_ok"),
            (sum(col("n_bpe")) < sum(col("n_chars"))).as("compresses_ok"))
      },
      Some("""SELECT COUNT(*) AS n_docs,
          CAST(SUM(len(list_filter(string_split(text, ' '),
            x -> len(x) > 0))) AS BIGINT) AS total_words,
          CAST(SUM(len(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT)
            AS total_chars,
          TRUE AS lossless_ok, TRUE AS bounds_ok, TRUE AS compresses_ok
        FROM documents""")),

    // BM25 ranked retrieval (operators/Bm25): corpus stats (N, avgdl,
    // per-term df) in ONE map-side-combined scan, scoring as a pure
    // projection against the broadcast stats row, only the final top-k
    // window shuffles. EXACT oracle: DuckDB recomputes the identical
    // Robertson BM25 (k1=1.2, b=0.75) and must reproduce every score
    // (round 4) and rank.
    GQuery("q_bm25_topk",
      (s, dir) => {
        val t = Tables(s, dir)
        Bm25.topK(t.documents, "doc_id", "text",
            Seq("hash_join" -> Seq("hash", "join"),
              "window_agg" -> Seq("window", "agg")), k = 10)
          .orderBy(col("query_id"), col("doc_id"))
      },
      Some("""WITH d2 AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '),
                   x -> len(x) > 0) AS toks
          FROM documents),
        d3 AS (SELECT doc_id, toks,
                 CAST(len(toks) AS DOUBLE) AS dl FROM d2),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
                CAST(sum(CASE WHEN list_contains(toks, 'hash') THEN 1 ELSE 0 END) AS DOUBLE) AS df_hash,
                CAST(sum(CASE WHEN list_contains(toks, 'join') THEN 1 ELSE 0 END) AS DOUBLE) AS df_join,
                CAST(sum(CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END) AS DOUBLE) AS df_window,
                CAST(sum(CASE WHEN list_contains(toks, 'agg') THEN 1 ELSE 0 END) AS DOUBLE) AS df_agg
              FROM d3),
        scored AS (
          SELECT 'hash_join' AS query_id, doc_id, round(
              ln((n_docs - df_hash + 0.5) / (df_hash + 0.5) + 1.0)
                * tf_hash * 2.2 / (tf_hash + 1.2 * (0.25 + 0.75 * dl / avgdl))
            + ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
                * tf_join * 2.2 / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl)),
            4) AS score
          FROM (SELECT doc_id, dl,
                  CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf_hash,
                  CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf_join
                FROM d3), s
          UNION ALL
          SELECT 'window_agg', doc_id, round(
              ln((n_docs - df_window + 0.5) / (df_window + 0.5) + 1.0)
                * tf_window * 2.2 / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl))
            + ln((n_docs - df_agg + 0.5) / (df_agg + 0.5) + 1.0)
                * tf_agg * 2.2 / (tf_agg + 1.2 * (0.25 + 0.75 * dl / avgdl)),
            4) AS score
          FROM (SELECT doc_id, dl,
                  CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf_window,
                  CAST(len(list_filter(toks, x -> x = 'agg')) AS DOUBLE) AS tf_agg
                FROM d3), s),
        ranked AS (
          SELECT query_id, doc_id, score,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS rank
          FROM scored WHERE score > 0)
        SELECT query_id, doc_id, score, rank FROM ranked
        WHERE rank <= 10 ORDER BY query_id, doc_id""")),

    // Overlapping token-window chunking (Curation.chunkOverlap — RAG /
    // long-doc layout). EXACT oracle: DuckDB re-derives every chunk
    // (same tokenization, same slicing) and the md5 of each chunk's
    // text must match.
    GQuery("q_chunk_overlap",
      (s, dir) => {
        val t = Tables(s, dir)
        Curation.chunkOverlap(t.documents, "doc_id", "text",
            chunkTokens = 32, stride = 16)
          .select(col("doc_id"), col("chunk_idx"),
            md5(col("chunk_text")).as("chunk_md5"), col("n_chunk_tokens"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH d AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
          FROM documents),
        e AS (SELECT doc_id, toks,
            unnest(range(0, len(toks), 16)) AS start
          FROM d WHERE len(toks) > 0)
        SELECT doc_id, CAST(start // 16 AS INT) AS chunk_idx,
          md5(array_to_string(toks[start + 1 : start + 32], ' ')) AS chunk_md5,
          CAST(LEAST(32, len(toks) - start) AS INT) AS n_chunk_tokens
        FROM e ORDER BY doc_id, chunk_idx""")),

    // Snapshot diff (Curation.snapshotDiff): added/removed/changed/
    // unchanged between two corpus versions via a full-outer hash join
    // on content digests. The two versions are deterministic slices of
    // documents, so DuckDB derives every status arithmetically.
    GQuery("q_snapshot_diff",
      (s, dir) => {
        val t = Tables(s, dir)
        val old = t.documents.filter(col("doc_id") % 10 =!= 3)
        val neu = t.documents.filter(col("doc_id") % 10 =!= 7)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        Curation.snapshotDiff(old, neu, "doc_id", "text")
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("id")).cast("long").as("id_sum"))
          .orderBy(col("status"))
      },
      Some("""SELECT status, COUNT(*) AS n,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM (SELECT doc_id,
            CASE WHEN doc_id % 10 = 3 THEN 'added'
                 WHEN doc_id % 10 = 7 THEN 'removed'
                 WHEN doc_id % 7 = 0 THEN 'changed'
                 ELSE 'unchanged' END AS status
          FROM documents)
        GROUP BY status ORDER BY status""")),

    // First-fit-decreasing bin packing (Curation.packBinsFfd — the
    // no-split sequence-packing layout). Per-shard doc counts and token
    // sums are EXACT cross-engine (md5 shard + token gate mirrored in
    // SQL); the packing itself is checked through its invariants: no
    // bin over capacity, at most one bin per shard ending <= half-full
    // (the first-fit property that implies bins <= 2*tokens/cap + 1),
    // and bin count >= the ceil(tokens/cap) lower bound.
    GQuery("q_pack_ffd",
      (s, dir) => {
        val t = Tables(s, dir)
        val cap = 128
        val packed = Curation.packBinsFfd(t.documents, "doc_id",
          TextFunctions.tokenCount(col("text")), capacity = cap, shards = 8)
        packed.groupBy(col("shard"), col("bin"))
          .agg(sum(col("n_tokens")).as("load"), count(lit(1)).as("n"))
          .groupBy(col("shard")).agg(
            sum(col("n")).cast("long").as("n_docs"),
            sum(col("load")).cast("long").as("tok_sum"),
            bool_and(col("load") <= cap).as("cap_ok"),
            (count(when(col("load") <= cap / 2, 1)) <= 1).as("halffull_ok"),
            (count(lit(1)) >= ceil(sum(col("load")) / lit(cap.toDouble)))
              .as("lower_ok"))
          .orderBy(col("shard"))
      },
      Some("""WITH d AS (SELECT doc_id,
            len(list_filter(string_split(text, ' '),
              x -> len(x) > 0)) AS nt,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS shard
          FROM documents)
        SELECT CAST(shard AS INT) AS shard, COUNT(*) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS tok_sum,
               TRUE AS cap_ok, TRUE AS halffull_ok, TRUE AS lower_ok
        FROM d WHERE nt <= 128 AND nt > 0
        GROUP BY shard ORDER BY shard""")),

    // Distributed classifier TRAINING (Curation.trainLogReg): 3 full-
    // batch GD steps, each one aggregate pass; the oracle UNROLLS the
    // same three steps in SQL (w=0 start, lr=1), so the learned weights
    // and final train logloss must agree to 4 decimals cross-engine —
    // an exact end-to-end check that distributed training reproduces
    // the sequential math.
    GQuery("q_classifier_train",
      (s, dir) => {
        val t = Tables(s, dir)
        val x1 = col("n_chars").cast("double") / 100.0
        val x2 = TextFunctions.tokenCount(col("text")).cast("double") / 10.0
        val y = (col("lang") === "en").cast("double")
        val (w, b) = Curation.trainLogReg(t.documents, Seq(x1, x2), y,
          steps = 3, lr = 1.0)
        val margin = x1 * w.head + x2 * w(1) + b
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        t.documents.agg(
          round(lit(w.head), 4).as("w_chars"),
          round(lit(w(1)), 4).as("w_tokens"),
          round(lit(b), 4).as("bias"),
          r4(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
            .as("train_logloss"))
      },
      Some("""WITH f AS (SELECT CAST(n_chars AS DOUBLE)/100.0 AS x1,
          CAST(len(list_filter(string_split(text, ' '),
            t -> len(t) > 0)) AS DOUBLE)/10.0 AS x2,
          CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM documents),
        g1 AS (SELECT avg((y - 0.5) * x1) AS d1,
                      avg((y - 0.5) * x2) AS d2,
                      avg(y - 0.5) AS db FROM f),
        s1 AS (SELECT d1 AS w1, d2 AS w2, db AS b FROM g1),
        g2 AS (SELECT avg((y - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))) * x1) AS d1,
                      avg((y - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))) * x2) AS d2,
                      avg(y - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))) AS db
               FROM f, s1),
        s2 AS (SELECT w1 + d1 AS w1, w2 + d2 AS w2, b + db AS b
               FROM s1, g2),
        g3 AS (SELECT avg((y - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))) * x1) AS d1,
                      avg((y - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))) * x2) AS d2,
                      avg(y - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))) AS db
               FROM f, s2),
        s3 AS (SELECT w1 + d1 AS w1, w2 + d2 AS w2, b + db AS b
               FROM s2, g3)
        SELECT round(w1, 4) AS w_chars, round(w2, 4) AS w_tokens,
               round(b, 4) AS bias,
               round(avg(-(y * ln(1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b))))
                 + (1.0 - y) * ln(1.0 - 1.0/(1.0 + exp(-(w1*x1 + w2*x2 + b)))))), 4)
                 AS train_logloss
        FROM f, s3 GROUP BY w1, w2, b"""))
  )
}
