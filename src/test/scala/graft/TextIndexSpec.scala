package graft

import org.apache.spark.sql.functions._

import graft.functions.TextMatch
import graft.sources.TextIndex

/** Token-posting text index: candidate sets are supersets (index-first
  * + re-verify never changes results), the facade rewrite serves a
  * registered TEXT_MATCH with an id IN-list pushdown, and unindexable
  * or unbounded shapes keep the exact scan. */
class TextIndexSpec extends SparkSpec {

  private lazy val t = Tables(spark, sf)
  private lazy val model = TextIndex.build(t.documents, "doc_id", "text")

  private def scanIds(q: String): Set[Long] =
    t.documents.filter(TextMatch.textMatch(col("text"), q))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def cands(q: String): Option[(Set[Long], Boolean, Long)] =
    TextMatch.candidateIds(q, model.dict, model.postings)
      .map { case (df, exact, bound) =>
        (df.collect().map(_.getLong(0)).toSet, exact, bound)
      }

  private def candIds(q: String): Option[Set[Long]] = cands(q).map(_._1)

  test("candidates are supersets of scan matches for every leaf shape") {
    val queries = Seq(
      "query",                                   // term
      "filter*",                                 // prefix
      "wind?w",                                  // wildcard
      "qery~1",                                  // fuzzy
      "\"the stream\"",                          // phrase
      "\"stream processing\"~2",                 // proximity
      "query AND \"the stream\" OR filter*",     // boolean mix
      "(query OR stream) AND scan")              // grouping
    queries.foreach { q =>
      val scan = scanIds(q)
      val cand = candIds(q)
      assert(cand.isDefined, s"'$q' should be indexable")
      assert(scan.subsetOf(cand.get),
        s"'$q': scan matches missing from candidates: ${scan -- cand.get}")
    }
  }

  test("pure term/boolean candidates are EXACT (no re-verify needed)") {
    Seq("query", "query AND stream", "query OR stream", "filter*",
      "wind?w", "qery~1").foreach { q =>
      val (ids, exact, bound) = cands(q).get
      assert(ids == scanIds(q), s"'$q'")
      assert(exact, s"'$q' should report an exact candidate set")
      assert(bound >= ids.size,
        s"'$q': df bound $bound below actual ${ids.size}")
    }
    // phrase/proximity shapes stay marked approximate (re-verified)
    Seq("\"data stream\"", "\"stream processing\"~2").foreach { q =>
      assert(!cands(q).get._2, s"'$q' must not claim exactness")
    }
    // a stop-edged phrase analyzes to its single surviving token
    // (the reference's default analyzer drops "the") — candidates are
    // the TERM's postings and exact
    val (theStream, exactTS, _) = cands("\"the stream\"").get
    assert(exactTS && theStream == scanIds("stream"))
  }

  test("positional phrase candidates are tight (adjacency, not co-occurrence)") {
    val q = "\"big data stream\""
    val scan = scanIds(q)
    val (ids, _, _) = cands(q).get
    assert(scan.subsetOf(ids), s"missing: ${scan -- ids}")
    // co-occurrence of these three COMMON tokens would admit most of
    // the corpus; the positional chain must stay close to the true set
    val cooccur = candIds("big AND data AND stream").get
    assert(ids.size < cooccur.size / 10,
      s"positional ${ids.size} vs co-occurrence ${cooccur.size}")
    assert(ids.size <= scan.size * 2 + 8,
      s"positional candidates ${ids.size} too loose vs ${scan.size} matches")
  }

  test("unindexable shapes report None (scan is the plan)") {
    // a phrase with no word characters analyzes to NOTHING — Lucene's
    // MatchNoDocsQuery: an EXACT empty candidate set (and the scan
    // path answers false per row, same contract)
    assert(candIds("\"...\"").exists(_.isEmpty))
    assert(scanIds("\"...\"").isEmpty)
    // an OR with a match-none branch stays bounded by the other side
    assert(candIds("query OR \"...\"") == candIds("query"))
    // but an AND drops the unindexable conjunct and stays bounded
    val and = candIds("query AND \"...\"")
    assert(and.isDefined && scanIds("query AND \"...\"").subsetOf(and.get))
    // a leaf matching too much of the dictionary refuses to enumerate
    assert(TextMatch.candidateIds("*", model.dict, model.postings,
      maxTokensPerLeaf = 4).isEmpty)
    // an all-MUST_NOT query is Lucene's pure-negative BooleanQuery:
    // matches NOTHING — exact empty candidates, empty scan
    assert(candIds("NOT stream").exists(_.isEmpty))
    assert(scanIds("NOT stream").isEmpty)
    // an AND with a MUST_NOT arm drops the complement conjunct from
    // the candidate plan and stays a superset
    val notAnd = candIds("query AND NOT stream")
    assert(notAnd.isDefined &&
      scanIds("query AND NOT stream").subsetOf(notAnd.get))
  }

  test("facade serves a registered TEXT_MATCH index-first, same answers") {
    graft.sql.QueryFacade.init(spark, sf)
    TextIndex.register("documents", t.documents, "doc_id", "text")
    try {
      val q = "query AND \"the stream\" OR filter*"
      val served = graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; SELECT doc_id FROM documents " +
          s"WHERE TEXT_MATCH(text, '$q') ORDER BY doc_id")
      // the id IN-list reached the parquet scan (row-group pruning)
      assert(served.queryExecution.executedPlan.toString
        .linesIterator.exists(l =>
          l.contains("PushedFilters") && l.contains("In(doc_id")),
        "candidate IN-list did not push into the scan")
      assert(served.collect().map(_.getLong(0)).toSeq ==
        scanIds(q).toSeq.sorted)
      // a no-hit query serves an empty result, still index-first
      val none = graft.sql.QueryFacade.sql(spark,
        "SET explicitLimit = true; SELECT doc_id FROM documents " +
          "WHERE TEXT_MATCH(text, 'zzzqqqxyzzy')")
      assert(none.collect().isEmpty)
      // an UNREGISTERED column keeps the exact scan path
      val stmt = graft.sql.QueryFacade.rewriteTextMatchIndexed(spark,
        "SELECT doc_id FROM documents WHERE text_match(title, 'query')")
      assert(stmt.contains("text_match(title"))
      // a join against an UNRESOLVABLE relation keeps the scan path: a
      // same-named column on an unknown table must never be served by
      // this table's index
      val joined = graft.sql.QueryFacade.rewriteTextMatchIndexed(spark,
        "SELECT d.doc_id FROM other o JOIN documents d ON o.id = d.doc_id " +
          "WHERE text_match(text, 'query')")
      assert(joined.contains("text_match(text"),
        s"unknown-relation join must not be index-served: $joined")
    } finally TextIndex.clear()
  }

  test("prewarm compiles the serving shapes without changing answers") {
    graft.sql.QueryFacade.init(spark, sf)
    TextIndex.register("documents", t.documents, "doc_id", "text")
    try {
      // bring-up warmer runs its throwaway passes silently …
      TextIndex.prewarm("documents", "text", t.documents)
      // … and an unregistered column is a no-op, never an error
      TextIndex.prewarm("documents", "nope", t.documents)
      val q = "query AND \"the stream\""
      val served = graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; SELECT doc_id FROM documents " +
          s"WHERE TEXT_MATCH(text, '$q') ORDER BY doc_id")
      assert(served.queryExecution.executedPlan.toString
        .linesIterator.exists(l =>
          l.contains("PushedFilters") && l.contains("In(doc_id")),
        "index serving must survive prewarm")
      assert(served.collect().map(_.getLong(0)).toSeq ==
        scanIds(q).toSeq.sorted)
    } finally TextIndex.clear()
  }

  test("multi-source statements serve the index when ownership is provable") {
    graft.sql.QueryFacade.init(spark, sf)
    TextIndex.register("documents", t.documents, "doc_id", "text")
    try {
      // QUALIFIED column in a join: alias resolves to the indexed
      // table; the emitted id filter must carry the SAME qualifier
      val qualified = graft.sql.QueryFacade.rewriteTextMatchIndexed(spark,
        "SELECT d.doc_id FROM nation n JOIN documents d " +
          "ON n.n_nationkey = CAST(d.doc_id % 25 AS INT) " +
          "WHERE text_match(d.text, 'query')")
      assert(qualified.contains("d.doc_id IN ("),
        s"qualified join reference should be index-served: $qualified")
      // and the served statement returns the scan's answers
      val df = graft.sql.QueryFacade.sql(spark,
        "SET explicitLimit = true; " +
          "SELECT d.doc_id FROM nation n JOIN documents d " +
          "ON n.n_nationkey = CAST(d.doc_id % 25 AS INT) " +
          "WHERE text_match(d.text, 'query') ORDER BY d.doc_id")
      val expect = t.documents
        .filter(TextMatch.textMatch(col("text"), "query"))
        .join(t.nation,
          t.nation("n_nationkey") === (col("doc_id") % 25).cast("int"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(df.collect().map(_.getLong(0)).toSeq == expect)
      // UNQUALIFIED column, but schema-unique across referenced
      // tables: nation has no `text`, so ownership is provable; the
      // id filter is emitted with the owner's qualifier
      val unq = graft.sql.QueryFacade.rewriteTextMatchIndexed(spark,
        "SELECT d.doc_id FROM nation n JOIN documents d " +
          "ON n.n_nationkey = CAST(d.doc_id % 25 AS INT) " +
          "WHERE text_match(text, 'query')")
      assert(unq.contains(".doc_id IN ("),
        s"schema-unique unqualified column should be served: $unq")
      // AMBIGUOUS: both sides carry a `text` column — fall back
      t.documents.limit(5).createOrReplaceTempView("docs2")
      val amb = graft.sql.QueryFacade.rewriteTextMatchIndexed(spark,
        "SELECT d.doc_id FROM docs2 o JOIN documents d " +
          "ON o.doc_id = d.doc_id WHERE text_match(text, 'query')")
      assert(amb.contains("text_match(text"),
        s"ambiguous column must not be index-served: $amb")
    } finally TextIndex.clear()
  }

  test("multi-column index: one build serves every configured column") {
    graft.sql.QueryFacade.init(spark, sf)
    graft.operators.IndexCache.clear()
    val b0 = graft.sources.IndexStore.builds.get()
    val l0 = graft.sources.IndexStore.loads.get()
    TextIndex.registerMulti("documents", t.documents, "doc_id",
      Seq("text", "source"))
    // exactly ONE store event for two columns — a fresh run builds the
    // shared artifact, a re-run (artifact durable on disk) loads it
    assert((graft.sources.IndexStore.builds.get() - b0) +
      (graft.sources.IndexStore.loads.get() - l0) == 1,
      "two columns must share ONE artifact build/load")
    try {
      // each column serves individually from the shared artifact
      Seq(
        ("text", "query AND filter*"),
        ("source", "src7 src9")).foreach { case (c, q) =>
        val served = graft.sql.QueryFacade.sql(spark,
          s"SET explicitLimit = true; SELECT doc_id FROM documents " +
            s"WHERE TEXT_MATCH($c, '$q') ORDER BY doc_id")
        assert(served.queryExecution.executedPlan.toString
          .linesIterator.exists(l =>
            l.contains("PushedFilters") && l.contains("In(doc_id")),
          s"column $c not index-served")
        val expect = t.documents
          .filter(TextMatch.textMatch(col(c), q))
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        assert(served.collect().map(_.getLong(0)).toSeq == expect,
          s"column $c answers diverge")
      }
      // a fresh registration (new process analog) LOADS, no rebuild
      graft.operators.IndexCache.clear()
      TextIndex.clear()
      val b1 = graft.sources.IndexStore.builds.get()
      TextIndex.registerMulti("documents", t.documents, "doc_id",
        Seq("text", "source"))
      assert(graft.sources.IndexStore.builds.get() == b1,
        "unchanged corpus must reload the shared artifact")
    } finally TextIndex.clear()
  }

  test("multi-column index rides the table config surface") {
    graft.sql.QueryFacade.init(spark, sf)
    graft.operators.IndexCache.clear()
    TextIndex.clear()
    val cfg = graft.schema.TableConfig.fromJson(
      """{"tableName": "documents", "tableType": "OFFLINE",
        |"indexingConfig": {"multiColumnTextIndexConfig": {
        |  "columns": ["text", "source"],
        |  "properties": {"idColumn": "doc_id"}}}}""".stripMargin)
    assert(cfg.multiColumnText.exists(_.columns == Seq("text", "source")))
    try {
      graft.schema.TableConfig.applyIndexes(spark, cfg, t.documents,
        java.nio.file.Files.createTempDirectory("graft_mc_cfg").toString)
      assert(TextIndex.lookup("documents", "text").isDefined)
      assert(TextIndex.lookup("documents", "source").isDefined)
    } finally TextIndex.clear()
  }

  test("escaped quotes in the query literal survive the rewrite") {
    graft.sql.QueryFacade.init(spark, sf)
    TextIndex.register("documents", t.documents, "doc_id", "text")
    try {
      // '' is a SQL-escaped single quote; the candidate parse sees '
      val served = graft.sql.QueryFacade.sql(spark,
        "SET explicitLimit = true; SELECT count(*) AS n FROM documents " +
          "WHERE TEXT_MATCH(text, 'query AND \"the stream\" OR filter*')")
      val expect = t.documents.filter(TextMatch.textMatch(col("text"),
        "query AND \"the stream\" OR filter*")).count()
      assert(served.collect().head.getLong(0) == expect)
    } finally TextIndex.clear()
  }
}
