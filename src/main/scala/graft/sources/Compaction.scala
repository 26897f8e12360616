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
}
