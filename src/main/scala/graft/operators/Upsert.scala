package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / dedup table semantics: latest (or first) row per primary key,
  * ordered by a comparison column, plus partial-upsert column merging.
  *
  * Reference semantics: apache/pinot
  * `pinot-segment-local/.../upsert/PartitionUpsertMetadataManager.java`
  * (FULL/PARTIAL upsert via `UpsertConfig.java:36-37`), partial-upsert
  * column mergers `upsert/merger/columnar/{Append,Ignore,Increment,Max,
  * Min,Overwrite,Union}Merger.java`, and dedup tables
  * `dedup/ConcurrentMapPartitionDedupMetadataManager.java`.
  *
  * Spark mapping: the queryable state of an upsert table is a VIEW —
  * `row_number() over (partition by pk order by cmp desc) = 1` — rather
  * than a mutated store. At scale this is one shuffle on the pk; with the
  * base table bucketed by pk the shuffle disappears entirely. Streaming
  * ingestion applies the same reduction per micro-batch (see
  * [[graft.streaming.UpsertStream]]), so state stays bounded by key count.
  */
object Upsert {

  /** FULL upsert view: the latest row per key by (cmpCol, tieCols...).
    *
    * @param deleteCol reference `UpsertConfig.deleteRecordColumn`
    *                  (CommonConstants.java:717-719): when set, a key
    *                  whose LATEST version has this boolean true is
    *                  tombstoned — removed from the view entirely. */
  def latestByKey(df: DataFrame, keys: Seq[String], cmpCol: String,
      tieCols: Seq[String] = Nil, deleteCol: Option[String] = None): DataFrame = {
    // non-delete records win comparison ties (same rule as the partial
    // path): the reference's upsert comparison lets the later-arriving
    // record win on equal values, so same-cmp delete-then-revive
    // revives — and the pick is deterministic either way
    val ord = (col(cmpCol).desc +: tieCols.map(col(_).desc)) ++
      deleteCol.map(d =>
        coalesce(col(d).cast("boolean"), lit(false)).asc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val latest = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    deleteCol match {
      case Some(d) => latest.filter(!coalesce(col(d), lit(false))).drop(d)
      case None => latest
    }
  }

  /** FULL upsert view with metadata TTL (`UpsertConfig._metadataTTL`,
    * `BasePartitionUpsertMetadataManager.isOutOfMetadataTTL`: keys
    * whose current doc ages below `largestSeenComparisonValue − TTL`
    * leave the metadata map, and invalidations already applied to a
    * segment's validDocIds persist).
    *
    * Under comparison-ordered replay (the same canonical-order
    * reduction as [[dedupTtl]]) the observable rule collapses to the
    * per-VERSION gap test: a record is invalidated exactly when its
    * next-newer version arrives within TTL of it (the key was still
    * tracked), and survives when the gap exceeds TTL (the key's
    * metadata had expired first — the reference's documented
    * duplicate-row hazard for gapped histories). So a row is served
    * iff it has no newer version, or its successor is more than TTL
    * away. Two rows of one key in the trailing TTL window always have
    * gap ≤ TTL, so in-window data resolves latest-per-key exactly as
    * plain upsert. One key-partitioned window (`lead`), fully lazy,
    * no driver scalar.
    *
    * `deletedKeysTTL` follows from the same rule: a tombstone
    * suppresses the versions it arrived within TTL of, is itself
    * never served, and once expired is forgotten — a later re-insert
    * starts the key fresh. */
  def latestByKeyMetadataTtl(df: DataFrame, keys: Seq[String],
      cmpCol: Column, ttl: Double, tieCols: Seq[String] = Nil,
      deleteCol: Option[String] = None): DataFrame = {
    val ord = (cmpCol.asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val served = df.withColumn("__gap", lead(cmpCol, 1).over(w) - cmpCol)
      .filter(col("__gap").isNull || col("__gap") > ttl)
      .drop("__gap")
    deleteCol match {
      case Some(d) => served.filter(!coalesce(col(d), lit(false))).drop(d)
      case None => served
    }
  }

  /** Dedup-table view: the FIRST row per key ever seen (reference keeps
    * the first and drops all later duplicates). */
  def firstByKey(df: DataFrame, keys: Seq[String], cmpCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(cmpCol).asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Dedup table with metadata TTL (`DedupConfig._metadataTTL` /
    * `_dedupTimeColumn`; expiry rule
    * `ConcurrentMapPartitionDedupMetadataManager.java:107` —
    * `smallestTimeToKeep = largestSeenTime - TTL`): an incoming record
    * is dropped iff its key has an UNEXPIRED store entry; an expired
    * key re-inserts and stores the new time. Processed in dedup-time
    * order the watermark rule reduces to a per-key greedy gap test —
    * keep iff `t - lastKeptTime(key) > ttl` — because largestSeenTime
    * equals the current record's time under a time-ordered replay.
    *
    * Scale shape: ONE hash repartition on the key, in-partition sort,
    * and a single-pass iterator carrying only (currentKey,
    * lastKeptTime) — constant memory per partition, no driver state,
    * no window materialization. The per-partition fold is genuinely
    * sequential state (greedy selection is not expressible as a
    * window/aggregate), the documented mapPartitions exception. */
  def dedupTtl(df: DataFrame, keys: Seq[String], timeMillis: Column,
      ttlMillis: Long, tieCols: Seq[String] = Nil): DataFrame = {
    val withT = df.withColumn("__t", timeMillis.cast("long"))
    val sortCols = keys.map(col) ++ (col("__t") +: tieCols.map(col))
    val parted = withT.repartition(keys.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = parted.schema
    val kIdx = keys.map(schema.fieldIndex)
    val tIdx = schema.fieldIndex("__t")
    val enc = org.apache.spark.sql.Encoders.row(schema)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var lastKept = Long.MinValue
      it.filter { r =>
        val k = kIdx.map(r.get)
        if (k != curKey) { curKey = k; lastKept = Long.MinValue }
        val t = r.getLong(tIdx)
        val keep = lastKept == Long.MinValue || t - lastKept > ttlMillis
        if (keep) lastKept = t
        keep
      }
    }(enc).drop("__t")
  }

  /** Partial-upsert merge strategies (reference merger/columnar). */
  sealed trait Merge { def column: String }
  /** latest non-null wins (OVERWRITE) */
  final case class Overwrite(column: String) extends Merge
  /** first value wins (IGNORE) */
  final case class Ignore(column: String) extends Merge
  /** numeric sum across versions (INCREMENT) */
  final case class Increment(column: String) extends Merge
  final case class MaxOf(column: String) extends Merge
  final case class MinOf(column: String) extends Merge
  /** collect all values in arrival order (APPEND) */
  final case class Append(column: String) extends Merge
  /** collect distinct values (UNION) */
  final case class UnionOf(column: String) extends Merge
  /** latest value even when null (FORCE_OVERWRITE — reference
    * `upsert/merger/columnar/ForceOverwriteMerger.java`: unlike
    * OVERWRITE, a null in the newest version replaces the old value) */
  final case class ForceOverwrite(column: String) extends Merge

  /** PARTIAL upsert view: one row per key where each column is merged
    * across all versions of the key per its strategy. Single groupBy on
    * the key — every strategy maps to a native aggregate (max_by for
    * OVERWRITE / min_by for IGNORE), so this is one shuffle, partial
    * aggregation enabled. */
  def partialUpsert(df: DataFrame, keys: Seq[String], cmpCol: String,
      merges: Seq[Merge]): DataFrame =
    partialUpsert(df, keys, cmpCol, merges, None)

  /** PARTIAL upsert with `UpsertConfig.deleteRecordColumn` semantics
    * (`UpsertTableIntegrationTest.testDeleteWithPartialUpsert`): a
    * tombstone record deletes the key AND resets its merge state — a
    * later revival record starts merging fresh from itself, not from
    * the pre-delete history. One window pass finds each key's last
    * tombstone time; newer versions enter the merge, and keys whose
    * history ends at a tombstone disappear. Ties break in favor of
    * NON-DELETE records: the reference's upsert comparison lets the
    * later-arriving record win on equal comparison values
    * (`UpsertUtils`/partial-upsert handler uses >=), so a
    * same-comparison-value delete-then-revive revives the key. */
  def partialUpsert(df: DataFrame, keys: Seq[String], cmpCol: String,
      merges: Seq[Merge], deleteCol: Option[String]): DataFrame = {
    val live = deleteCol match {
      case Some(d) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
        val isDel = coalesce(col(d).cast("boolean"), lit(false))
        df.withColumn("__del_ts",
            max(when(col(d) === true, col(cmpCol))).over(w))
          .filter(col("__del_ts").isNull ||
            col(cmpCol) > col("__del_ts") ||
            (col(cmpCol) === col("__del_ts") && !isDel))
          .drop("__del_ts")
      case None => df
    }
    partialUpsertImpl(live, keys, cmpCol, merges)
  }

  private def partialUpsertImpl(df: DataFrame, keys: Seq[String],
      cmpCol: String, merges: Seq[Merge]): DataFrame = {
    val aggs: Seq[Column] = merges.map {
      // OVERWRITE takes the latest NON-NULL version (the reference's
      // partial-upsert handler skips null incoming values for regular
      // mergers); nulling the comparator drops null-valued versions
      // from max_by's ordering.
      case Overwrite(c) =>
        max_by(col(c), when(col(c).isNotNull, col(cmpCol))).as(c)
      // FORCE_OVERWRITE takes the latest version verbatim, null or not:
      // max over (cmp, value) structs keeps the value of the max cmp row.
      case ForceOverwrite(c) =>
        max(struct(col(cmpCol), col(c))).getField(c).as(c)
      case Ignore(c)    => min_by(col(c), col(cmpCol)).as(c)
      case Increment(c) => sum(col(c)).as(c)
      case MaxOf(c)     => max(col(c)).as(c)
      case MinOf(c)     => min(col(c)).as(c)
      case Append(c)    => array_sort(collect_list(struct(col(cmpCol), col(c))))
        .getField(c).as(c)
      case UnionOf(c)   => array_sort(array_distinct(collect_list(col(c)))).as(c)
    } :+ max(col(cmpCol)).as(cmpCol)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Automatic time boundary (reference `TimeBoundaryManager.java:54`):
    * max offline time minus one granularity unit — offline answers up
    * to the boundary, realtime strictly after. The MAX itself is a
    * distributed aggregate; `.head` then pulls the single scalar row to
    * the driver (one row, not the data) to inline as a literal. */
  def timeBoundary(offline: DataFrame, timeCol: String,
      granularity: String = "1 hour"): Column = {
    import org.apache.spark.sql.functions.{expr, max => fmax}
    val b = offline.agg(fmax(col(timeCol)).minus(expr(s"INTERVAL $granularity")))
      .head.get(0)
    lit(b)
  }

  /** Hybrid table view (offline/realtime split by time boundary):
    * reference `TimeBoundaryManager.java:54` — offline answers rows at or
    * before the boundary, realtime strictly after. */
  def hybridView(offline: DataFrame, realtime: DataFrame, timeCol: String,
      boundary: Column): DataFrame =
    offline.filter(col(timeCol) <= boundary)
      .unionByName(realtime.filter(col(timeCol) > boundary))
}
