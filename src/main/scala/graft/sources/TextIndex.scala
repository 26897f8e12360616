package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-posting text-index layout — the Spark analog of the
  * reference's Lucene text index (`TextMatchFilterOperator.java:38`,
  * `pinot-segment-local/.../segment/index/text/lucene/`): the
  * reference builds a per-segment Lucene index at ingest so a
  * TEXT_MATCH predicate resolves to a doc-id bitmap instead of
  * scanning documents.
  *
  * Spark-first shape (the JsonShred pattern: ingest-time layout +
  * registry + rewrite-when-registered + scan fallback):
  *
  *   - At ingest the corpus is tokenized ONCE (same analyzer as the
  *     query path: `split(lower(text), "\\W+")` minus the reference's
  *     default English stop set) into a
  *     `(token, doc_id)` POSTING frame, range-partitioned and sorted
  *     by token — the inverted-index layout: a term lookup prunes to
  *     the token's partitions/row groups instead of touching the
  *     corpus. A distinct-token DICTIONARY frame (small — vocabulary,
  *     not corpus, sized) plays the role of Lucene's term dictionary:
  *     prefix/wildcard/fuzzy leaves scan IT, not the corpus, exactly
  *     as Lucene walks term automata.
  *   - A registered `TEXT_MATCH(col, 'q')` is answered index-first by
  *     the facade: [[graft.functions.TextMatch.candidateIds]] resolves
  *     the query AST to a candidate doc-id set (always a SUPERSET of
  *     the true matches), and the predicate rewrites to
  *     `idCol IN (ids) AND text_match(col, 'q')` — the IN-list PUSHES
  *     INTO the parquet scan (row-group pruning on the id column)
  *     while the original predicate re-verifies only the pruned rows,
  *     so the rewrite NEVER changes results (the reference's filter
  *     operator likewise re-checks index candidates against the
  *     forward index). An unbounded candidate set (> internalLimit,
  *     the `VectorSimilarityRadiusPredicate.DEFAULT_INTERNAL_LIMIT`
  *     discipline) falls back to the exact scan.
  *
  * At 100 TB the posting/dictionary frames are written tables (the
  * same layout, parquet, token-partitioned); queries touch postings
  * proportional to the terms they mention, and the corpus scan is
  * pruned to the candidate row groups — query cost scales with RESULT
  * size, not corpus size, which is the property the Lucene index buys
  * the reference.
  */
object TextIndex {

  /** Posting + dictionary frames, the ingest-time artifact. */
  final case class Model(postings: DataFrame, dict: DataFrame)

  /** Default candidate cap before falling back to the exact scan. */
  val DefaultInternalLimit = 100000

  /** Artifact-layout version — bump on any postings/dict schema or
    * analyzer change so persisted indexes from older layouts rebuild.
    * v2: default English stop set applied at build (reference's
    * default analyzer), positions original/gapped, adjacency bigrams. */
  private val LayoutVersion = 2

  /** Canonical analyzer tag for fingerprints/variants: a column whose
    * configured stop set differs from the default must not load an
    * artifact built with another analyzer. */
  private def analyzerTag(props: Map[String, String]): String = {
    val o = graft.functions.TextMatch.optionsFromProps(props)
    o.stopWords.getOrElse(Set.empty).toSeq.sorted.mkString(";")
  }

  def build(corpus: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 32,
      props: Map[String, String] = Map.empty): Model =
    graft.operators.IndexCache.getOrBuild(("textidx",
      corpus.queryExecution.analyzed.canonicalized,
      idCol, textCol, nBuckets, analyzerTag(props))) {
      val spark = corpus.sparkSession
      val stop = graft.functions.TextMatch.optionsFromProps(props)
        .stopWords.getOrElse(Set.empty)
      // DURABLE artifact (the reference builds its Lucene index into
      // the segment at ingest and only reads it afterwards): written
      // under the corpus table's _indexes/ dir with a fingerprint
      // manifest — a fresh process re-registering the same data LOADS
      // with no build job. Fingerprint-less corpora (derived frames)
      // keep the session-lifetime temp dir.
      val located = IndexStore.getOrBuild(corpus, "text", textCol,
        Seq("v" + LayoutVersion, idCol, nBuckets, analyzerTag(props))) { d =>
        writeArtifact(corpus, idCol, textCol, nBuckets, d, stop)
      }
      val dir = located match {
        case Some(l) => l.dir
        case None =>
          val d = java.nio.file.Files
            .createTempDirectory("graft_textidx").toString
          registerTempDir(d)
          writeArtifact(corpus, idCol, textCol, nBuckets, d, stop)
          d
      }
      Model(spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/dict"))
    }

  /** The `(doc_id, pos, token)` posting rows for one text column —
    * POSITIONAL postings (Lucene stores positions for PhraseQuery):
    * position = index in the empty-filtered token sequence BEFORE
    * stop removal, so a removed stop word leaves a position GAP —
    * Lucene's enablePositionIncrements — and adjacent survivors
    * stay adjacent positions. The reference's default analyzer
    * stops the 35-word English set on every unconfigured column
    * (TextIndexUtils.getAnalyzer), so stop tokens carry NO postings
    * (they are the corpus's heaviest rows — dropping them is also
    * the storage win the reference gets for free from Lucene).
    * BIGRAM shingles ("w1 w2", position of w1) are indexed for
    * pairs ADJACENT IN THE ORIGINAL token stream — a phrase of
    * exact tokens resolves to bigram lookups whose doc frequency is
    * the PAIR's, typically orders of magnitude below either word's
    * (the shingle-index trick for phrase selectivity). A
    * stop-separated pair ("machine the learning") has no bigram,
    * exactly as its positions 0/2 fail Lucene's adjacency. */
  private def tokenRows(corpus: DataFrame, idCol: String,
      textCol: String,
      stop: Set[String]): DataFrame = {
    val stopArr = stop.toSeq.sorted
    val words = corpus.select(col(idCol).cast("long").as("doc_id"),
      posexplode(filter(
        split(lower(col(textCol)), "\\W+"),
        t => t =!= lit(""))))
      .toDF("doc_id", "pos", "token")
      .filter(if (stopArr.isEmpty) lit(true)
        else !col("token").isin(stopArr: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = words
      .withColumn("ntok", lead(col("token"), 1).over(w))
      .withColumn("npos", lead(col("pos"), 1).over(w))
      .filter(col("ntok").isNotNull && col("npos") === col("pos") + 1)
      .select(col("doc_id"), col("pos"),
        concat(col("token"), lit(" "), col("ntok")).as("token"))
    words.unionByName(bigrams.select("doc_id", "pos", "token"))
  }

  private def writeArtifact(corpus: DataFrame, idCol: String,
      textCol: String, nBuckets: Int, dir: String,
      stop: Set[String]): Unit = {
      val spark = corpus.sparkSession
      // WRITTEN parquet tables, token-sorted: a term lookup pushes
      // `In(token, ...)` into the scan and prunes to the token's row
      // groups — the on-disk inverted-index layout (an in-memory frame
      // cannot prune, so every lookup would re-scan all postings)
      tokenRows(corpus, idCol, textCol, stop)
        .groupBy(col("token"), col("doc_id"))
        .agg(sort_array(collect_list(col("pos"))).as("positions"))
        .repartitionByRange(nBuckets, col("token"))
        .sortWithinPartitions("token")
        .write.mode("overwrite").parquet(s"$dir/postings")
      val postings = spark.read.parquet(s"$dir/postings")
      // dictionary carries per-token DOC FREQUENCY — the planner's
      // cost input: candidate-set size bounds are computed from df
      // sums BEFORE any posting is touched, so an unselective query
      // falls back to the scan without paying for a doomed evaluation
      postings.groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .repartitionByRange(math.max(1, nBuckets / 4), col("token"))
        .sortWithinPartitions("token")
        .write.mode("overwrite").parquet(s"$dir/dict")
  }

  /** ONE shared artifact + ONE build for N text columns — the
    * reference's multi-column Lucene text index
    * (`MultiColumnLuceneTextIndexCreator.java`: a single IndexWriter
    * indexes every configured column as its own field, so a segment
    * with many text columns pays one index instead of N open-file
    * sets; readers address fields by column name,
    * `MultiColumnRealtimeLuceneTextIndex.java`). Spark analog: the
    * posting/dict tables carry a `column` DISCRIMINATOR as the leading
    * range-partition key, so one build job tokenizes all columns and a
    * per-column lookup prunes to that column's partitions exactly as a
    * Lucene field query touches only its field's postings. */
  private def writeMultiArtifact(corpus: DataFrame, idCol: String,
      textCols: Seq[String], nBuckets: Int, dir: String,
      stops: Map[String, Set[String]]): Unit = {
    val spark = corpus.sparkSession
    textCols.map(c => tokenRows(corpus, idCol, c,
          stops.getOrElse(c, Set.empty))
        .withColumn("column", lit(c)))
      .reduce(_ unionByName _)
      .groupBy(col("column"), col("token"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .repartitionByRange(nBuckets, col("column"), col("token"))
      .sortWithinPartitions("column", "token")
      .write.mode("overwrite").parquet(s"$dir/postings")
    val postings = spark.read.parquet(s"$dir/postings")
    postings.groupBy(col("column"), col("token"))
      .agg(count(lit(1)).as("df"))
      .repartitionByRange(math.max(1, nBuckets / 4),
        col("column"), col("token"))
      .sortWithinPartitions("column", "token")
      .write.mode("overwrite").parquet(s"$dir/dict")
  }

  /** Build the shared multi-column artifact and return the per-column
    * [[Model]] views (each filters the `column` discriminator — the
    * filter prunes to the column's range partitions, and the facade's
    * per-column serving path is unchanged). */
  def buildMulti(corpus: DataFrame, idCol: String,
      textCols: Seq[String], nBuckets: Int = 32,
      perColumnProps: Map[String, Map[String, String]] = Map.empty)
      : Map[String, Model] = {
    val tags = textCols.map(c =>
      s"$c=${analyzerTag(perColumnProps.getOrElse(c, Map.empty))}")
      .mkString("|")
    graft.operators.IndexCache.getOrBuild(("textidxmc",
      corpus.queryExecution.analyzed.canonicalized,
      idCol, textCols, nBuckets, tags)) {
      val spark = corpus.sparkSession
      val colKey = textCols.mkString("+")
      val stops = textCols.map(c => c ->
        graft.functions.TextMatch
          .optionsFromProps(perColumnProps.getOrElse(c, Map.empty))
          .stopWords.getOrElse(Set.empty[String])).toMap
      val located = IndexStore.getOrBuild(corpus, "text_multi", colKey,
        Seq("v" + LayoutVersion, idCol, nBuckets, tags)) { d =>
        writeMultiArtifact(corpus, idCol, textCols, nBuckets, d, stops)
      }
      val dir = located match {
        case Some(l) => l.dir
        case None =>
          val d = java.nio.file.Files
            .createTempDirectory("graft_textidx_mc").toString
          registerTempDir(d)
          writeMultiArtifact(corpus, idCol, textCols, nBuckets, d, stops)
          d
      }
      val postings = spark.read.parquet(s"$dir/postings")
      val dict = spark.read.parquet(s"$dir/dict")
      textCols.map(c => c -> Model(
        postings.filter(col("column") === c)
          .select("token", "doc_id", "positions"),
        dict.filter(col("column") === c).select("token", "df"))).toMap
    }
  }

  // Index artifacts are session-lifetime temp tables; without cleanup
  // a long-lived process accumulates one directory per distinct
  // (corpus, column) build. A single shutdown hook reaps them all.
  private val tempDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempDirs.forEach { d =>
        try deleteRecursively(java.nio.file.Paths.get(d))
        catch { case _: Throwable => () }
      }))
  private[sources] def registerTempDir(dir: String): Unit = {
    cleanupHook; tempDirs.add(dir); ()
  }
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).forEach(deleteRecursively)
    java.nio.file.Files.deleteIfExists(p); ()
  }

  /** `opts`/`optionsArg`: the column's CONFIGURED analyzer
    * (TextIndexUtils.getAnalyzer with per-column override) — the
    * facade analyzes 2-arg TEXT_MATCH calls on this column with it,
    * and splices `optionsArg` as the re-verify's third argument. */
  private[graft] final case class Entry(idCol: String, model: Model,
      internalLimit: Int,
      opts: graft.functions.TextMatch.Options =
        graft.functions.TextMatch.DefaultOptions,
      optionsArg: String = "")

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Entry]()

  /** Build (memoized via IndexCache) + register a text index for
    * `table`.`textCol`; `idCol` is the doc id the IN-list filters.
    * `props` carries the column's FieldConfig text properties
    * (stopWordInclude/Exclude, useANDForMultiTermTextIndexQueries,
    * enablePrefixSuffixMatchingInPhraseQueries). */
  def register(table: String, corpus: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 32,
      internalLimit: Int = DefaultInternalLimit,
      props: Map[String, String] = Map.empty): Unit =
    reg.put((table.toLowerCase, textCol.toLowerCase),
      Entry(idCol, build(corpus, idCol, textCol, nBuckets, props),
        internalLimit,
        graft.functions.TextMatch.optionsFromProps(props),
        graft.functions.TextMatch.optionsArgFromProps(props)))

  /** Register ONE shared index over several text columns
    * (`MultiColumnTextIndexConfig.columns` + `perColumnProperties`):
    * one artifact, one build, every column individually servable by
    * the facade rewrite under its own configured analyzer. */
  def registerMulti(table: String, corpus: DataFrame, idCol: String,
      textCols: Seq[String], nBuckets: Int = 32,
      internalLimit: Int = DefaultInternalLimit,
      perColumnProps: Map[String, Map[String, String]] = Map.empty): Unit =
    buildMulti(corpus, idCol, textCols, nBuckets, perColumnProps).foreach {
      case (c, model) =>
        val props = perColumnProps.getOrElse(c, Map.empty)
        reg.put((table.toLowerCase, c.toLowerCase),
          Entry(idCol, model, internalLimit,
            graft.functions.TextMatch.optionsFromProps(props),
            graft.functions.TextMatch.optionsArgFromProps(props)))
    }

  def clear(): Unit = reg.clear()

  private[graft] def lookup(table: String, textCol: String): Option[Entry] =
    Option(reg.get((table.toLowerCase, textCol.toLowerCase)))

  /** Broker bring-up warmer — the analog of Lucene warming its index
    * reader at segment LOAD so the first query doesn't pay it
    * (reference `RealtimeLuceneTextIndex` readers are opened and
    * primed when the segment comes online, not on query one). A cold
    * JVM pays whole-stage-codegen compilation (~300-800 ms per
    * distinct generated-code shape) plus first-touch scan bring-up on
    * each of the three jobs a served TEXT_MATCH runs: the batched
    * dictionary resolution, the posting lookup, and the fact-table
    * IN-list serve scan. All three shapes are QUERY-INDEPENDENT:
    * `IN` past the 10-literal InSet conversion threshold generates the
    * same code for 12 ids as for 50,000, so one throwaway pass here
    * compiles exactly what the first real query will run.
    *
    * Costs one small artifact scan + one pruned fact scan (the 12
    * impossible ids push into the parquet row-group stats, so the
    * fact pass reads footers, not data). Call after `register` at
    * session bring-up; never required for correctness. */
  def prewarm(table: String, textCol: String, corpus: DataFrame): Unit =
    lookup(table, textCol).foreach { entry =>
      import org.apache.spark.sql.functions.col
      try {
        // 0: artifact bring-up — one full pass over the dictionary and
        // postings warms their parquet page reads (the artifacts are
        // orders of magnitude smaller than the corpus), so the first
        // real candidate resolution pays plan time only
        entry.model.dict.count()
        entry.model.postings.count()
        // 1+2: candidate-resolution shapes (dictionary aggregate pass,
        // token fetch pass, posting lookup) — a two-term AND with a
        // prefix leaf covers every batched-resolution branch
        graft.functions.TextMatch.candidateIds(
          "zqxwv AND zq*", entry.model.dict, entry.model.postings,
          opts = entry.opts).foreach(_._1.limit(2).collect())
        // 3: serve shape — InSet filter + re-verify predicate over the
        // fact scan, driven by REAL ids so one row group's data pages
        // are actually decoded (an impossible-id pass prunes to footer
        // reads and leaves the first real scan paying full first-touch
        // cost); 12 ids keeps the read to roughly one row group
        val ids = corpus.select(col(entry.idCol)).limit(12)
          .collect().map(_.get(0))
        if (ids.nonEmpty)
          corpus.filter(col(entry.idCol).isin(ids.toIndexedSeq: _*) &&
              graft.functions.TextMatch.textMatch(col(textCol), "zqxwv"))
            .count()
        ()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
}
