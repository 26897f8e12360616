package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Background maintenance jobs — the Spark analog of the reference's
  * minion tasks (apache/pinot
  * `pinot-plugins/pinot-minion-tasks/pinot-minion-builtin-tasks`:
  * `mergerollup`, `realtimetoofflinesegments`, `purge`,
  * `upsertcompaction`).
  *
  * Each is a batch job over the stored layout; at cluster scale these
  * run per partition-directory so a nightly task touches only the
  * partitions whose data changed.
  */
object Compaction {

  /** MergeRollupTask: re-aggregate a fact table to a coarser time
    * granularity (e.g. minute → hour), preserving additive measures.
    * The write keeps the partition layout so older data keeps shrinking
    * as it ages through granularity tiers. */
  def mergeRollup(
      df: DataFrame,
      timeCol: String,
      granularity: String, // date_trunc unit, e.g. "hour"
      dims: Seq[String],
      sums: Seq[String],
      outPath: String): Unit = {
    val aggs = count(lit(1)).as("cnt") +: sums.map(c => sum(col(c)).as(c))
    df.groupBy(date_trunc(granularity, col(timeCol)).as(timeCol) +:
        dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(outPath)
  }

  /** RealtimeToOfflineSegmentsTask: move rows at or before the time
    * boundary from the realtime store into the offline layout (sorted,
    * partitioned), returning the remaining realtime rows. */
  def realtimeToOffline(
      spark: SparkSession,
      realtime: DataFrame,
      timeCol: String,
      boundary: Column,
      offlinePath: String,
      partitionBy: Seq[String] = Nil,
      sortBy: Seq[String] = Nil): DataFrame = {
    BatchIngest.ingest(spark, realtime.filter(col(timeCol) <= boundary),
      offlinePath, partitionBy = partitionBy, sortBy = sortBy)
    realtime.filter(col(timeCol) > boundary)
  }

  /** PurgeTask: rewrite a table dropping rows matching the purge
    * predicate (GDPR-style deletes). */
  def purge(df: DataFrame, predicate: Column, outPath: String): Unit =
    df.filter(!coalesce(predicate, lit(false)))
      .write.mode("overwrite").parquet(outPath)

  /** UpsertCompactionTask: physically collapse an upsert table's history
    * to the latest row per key (the query-time view materialized, so
    * later scans stop paying for superseded versions). */
  def upsertCompact(
      df: DataFrame,
      keys: Seq[String],
      cmpCol: String,
      deleteCol: Option[String],
      outPath: String): Unit =
    graft.operators.Upsert.latestByKey(df, keys, cmpCol, Nil, deleteCol)
      .write.mode("overwrite").parquet(outPath)

  /** RefreshSegmentTask analog (`RefreshSegmentTaskExecutor.java:56-59`
    * covers exactly three cases: newly added columns, index
    * addition/removal, compatible datatype changes): re-apply the
    * CURRENT schema + layout config to a stored segment. Spark-first:
    * read → `Schema.evolve` (role-default backfill for new columns +
    * in-place compatible casts) → rewrite with the new physical layout
    * (sort order; per-row-group bloom filters when requested). The
    * task is per segment directory, so a config change refreshes only
    * the segments the generator marks stale — the reference's
    * processedTime watermark model. */
  def refreshSegment(
      spark: SparkSession,
      inPath: String,
      schema: graft.schema.PinotSchema.Schema,
      outPath: String,
      sortBy: Seq[String] = Nil,
      bloomNdv: Map[String, Long] = Map.empty): Unit = {
    val evolved = schema.evolve(spark.read.parquet(inPath))
    val laidOut =
      if (sortBy.nonEmpty) evolved.sortWithinPartitions(sortBy.map(col): _*)
      else evolved
    if (bloomNdv.nonEmpty)
      BucketedTables.writeParquetWithBloom(laidOut, outPath, bloomNdv)
    else laidOut.write.mode("overwrite").parquet(outPath)
  }

  /** UpsertCompactMergeTask analog
    * (`UpsertCompactMergeTaskExecutor.java:55`: "compacts and merges
    * multiple segments of an upsert table and uploads it back as one
    * single segment" — each input reduced to its validDocIds, then
    * merged): the union of the input segments collapses to the latest
    * row per key across ALL of them, deletes drop, and ONE output
    * segment replaces the inputs. The single output file is the task's
    * contract, not a scale hazard: the reference's generator groups
    * only small adjacent segments under an output-size cap, so each
    * task's union is bounded by config. */
  def upsertCompactMerge(
      spark: SparkSession,
      segmentPaths: Seq[String],
      keys: Seq[String],
      cmpCol: String,
      deleteCol: Option[String],
      outPath: String): Unit = {
    require(segmentPaths.nonEmpty, "upsertCompactMerge needs >= 1 segment")
    // allowMissingColumns: input segments may carry DRIFTED schemas —
    // e.g. refreshSegment added a column to only some of the segments
    // being merged (a realistic state in the reference's task
    // pipeline, round-13 ADVICE); absent columns null-fill, matching
    // the reference's role-default backfill on read
    val merged = segmentPaths.map(spark.read.parquet(_))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    graft.operators.Upsert.latestByKey(merged, keys, cmpCol, Nil, deleteCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(outPath)
  }
}
