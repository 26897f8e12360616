package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FST-index analog: serve REGEXP_LIKE / LIKE predicates from a
  * VALUE DICTIONARY instead of a per-row regex scan.
  *
  * The reference builds an FST over a string column's dictionary
  * (sorted distinct values) and answers REGEXP_LIKE by materializing
  * the matching dictionary ids
  * (`pinot-segment-local/.../segment/index/fst/FstIndexType.java`;
  * evaluator `FSTBasedRegexpPredicateEvaluatorFactory.java:52-59` —
  * the matching-id bitmap, with all-ids → alwaysTrue and zero-ids →
  * alwaysFalse short circuits; LIKE routes through the same path via
  * `RegexpPatternConverterUtils.likeToRegexpLike`). The identity that
  * makes this EXACT — not a candidate superset — is
  *
  *   REGEXP_LIKE(col, p) ⟺ col ∈ { v ∈ dictionary : p matches v }
  *
  * because the dictionary covers every value the column takes, and the
  * predicate is a pure per-value function. NULLs need no special case:
  * `col IN (list)` is NULL for NULL input exactly as REGEXP_LIKE is.
  *
  * Spark-first re-expression: the dictionary is a WRITTEN parquet
  * table `(value, df)` sorted by value (vocabulary-sized — millions of
  * rows where the corpus has billions); a predicate is evaluated over
  * the dictionary with Spark's OWN `rlike`/`like` Columns — the same
  * regex engine that would evaluate the fallback scan, so the match
  * set is identical by construction. The resolved values come back as
  *   - `col IN (v1, …)` literal IN-list (≤ [[MaxInList]] values):
  *     pushes into the parquet scan as `In` — row-group stats, bloom
  *     filters and dictionary pages prune I/O;
  *   - a distributed semi-join against the filtered dictionary plan
  *     (larger sets): the regex runs once per DISTINCT value instead
  *     of once per row — at 100 TB that's the difference between a
  *     vocabulary-sized and a corpus-sized regex bill;
  *   - all values match → the predicate is dropped (alwaysTrue),
  *     none → literal FALSE (alwaysFalse), mirroring the evaluator's
  *     short circuits.
  */
object RegexpIndex {

  /** Value dictionary: `value` (string), `df` (row count). */
  final case class Model(dict: DataFrame, dictSize: Long)

  /** Literal IN-lists above this size stop paying their parse cost;
    * larger exact sets serve as a distributed semi-join. */
  val MaxInList = 10000

  /** Dictionaries larger than this are not worth a semi-join against
    * (a near-unique column: the "dictionary" is the corpus — the scan
    * is the honest plan, and the reference would not FST-index a
    * raw-encoded column either). */
  val DefaultMaxDictForSemiJoin = 10000000L

  /** Artifact-layout version — bump on dictionary schema changes so
    * persisted artifacts from older layouts rebuild. */
  private val LayoutVersion = 1

  def build(corpus: DataFrame, column: String,
      nBuckets: Int = 8): Model =
    graft.operators.IndexCache.getOrBuild(("regexpidx",
      corpus.queryExecution.analyzed.canonicalized, column, nBuckets)) {
      val spark = corpus.sparkSession
      // DURABLE artifact (the reference builds the FST into the
      // segment at ingest, `FstIndexType.java`): fingerprint-manifested
      // under the corpus table's _indexes/ dir, loaded with no build
      // job by a fresh process; fingerprint-less corpora keep the
      // session-lifetime temp dir.
      val located = IndexStore.getOrBuild(corpus, "regexp", column,
        Seq("v" + LayoutVersion, nBuckets)) { d =>
        writeArtifact(corpus, column, nBuckets, s"$d/dict")
      }
      val dir = located match {
        case Some(l) => s"${l.dir}/dict"
        case None =>
          val d = java.nio.file.Files
            .createTempDirectory("graft_regexpidx").toString
          TextIndex.registerTempDir(d)
          writeArtifact(corpus, column, nBuckets, d)
          d
      }
      val dict = spark.read.parquet(dir)
      Model(dict, dict.count())
    }

  private def writeArtifact(corpus: DataFrame, column: String,
      nBuckets: Int, dir: String): Unit =
      // written + value-sorted: an anchored-prefix predicate prunes the
      // dictionary scan itself via row-group stats on `value`
      corpus.select(col(column).cast("string").as("value"))
        .filter(col("value").isNotNull)
        .groupBy(col("value")).agg(count(lit(1)).as("df"))
        .repartitionByRange(nBuckets, col("value"))
        .sortWithinPartitions("value")
        .write.mode("overwrite").parquet(dir)

  final case class Entry(model: Model, maxDictForSemiJoin: Long)

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Entry]()

  /** Build (IndexCache-memoized) + register a value-dictionary index
    * for `table`.`column`. */
  def register(table: String, corpus: DataFrame, column: String,
      nBuckets: Int = 8,
      maxDictForSemiJoin: Long = DefaultMaxDictForSemiJoin): Unit =
    reg.put((table.toLowerCase, column.toLowerCase),
      Entry(build(corpus, column, nBuckets), maxDictForSemiJoin))

  def clear(): Unit = { reg.clear(); resolved.clear() }

  private[graft] def isEmpty: Boolean = reg.isEmpty

  private[graft] def lookup(table: String, column: String): Option[Entry] =
    Option(reg.get((table.toLowerCase, column.toLowerCase)))

  /** How a resolved predicate should be served. */
  sealed trait Served
  /** Every dictionary value matches — drop the predicate. */
  case object AlwaysTrue extends Served
  /** No dictionary value matches. */
  case object AlwaysFalse extends Served
  /** Small exact set — literal IN-list. */
  final case class InList(values: Seq[String]) extends Served
  /** Large exact set — semi-join against this single-column plan. */
  final case class SemiJoin(values: DataFrame) extends Served

  // Resolved predicates memoize per (dictionary, predicate): the
  // reference pays its FST walk once per segment per predicate too —
  // repeated queries must not re-run the dictionary job
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    (DataFrame, String), Option[Served]]()

  private[graft] def resolve(entry: Entry, pred: Column,
      predKey: String): Option[Served] = {
    if (resolved.size > 4096) resolved.clear() // crude bound
    resolved.computeIfAbsent((entry.model.dict, predKey),
      _ => resolveUncached(entry, pred))
  }

  /** Resolve a predicate Column (built by the caller with `rlike` /
    * `like` over `col("value")`) against the dictionary. None = the
    * dictionary is no better than the scan (near-unique column with a
    * large match set). */
  private def resolveUncached(entry: Entry, pred: Column): Option[Served] = {
    val matched = entry.model.dict.filter(pred).select("value")
    val head = matched.limit(MaxInList + 1)
      .collect().map(_.getString(0)).toSeq
    if (head.isEmpty) Some(AlwaysFalse)
    else if (head.length <= MaxInList) {
      if (head.length.toLong == entry.model.dictSize) Some(AlwaysTrue)
      else Some(InList(head))
    } else if (entry.model.dictSize <= entry.maxDictForSemiJoin)
      Some(SemiJoin(matched))
    else None
  }
}
