package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Streaming ingestion with upsert/dedup-table semantics.
  *
  * Reference: apache/pinot realtime tables consume a partitioned stream
  * into queryable segments with upsert metadata
  * (`RealtimeSegmentDataManager.java:129`,
  * `PartitionUpsertMetadataManager.java`). Spark mapping: Structured
  * Streaming + `foreachBatch` maintaining a keyed state table — each
  * micro-batch is reduced to latest-per-key, merged against the store,
  * and rewritten. With a Delta-style sink this becomes MERGE INTO; on
  * plain parquet we emulate the merge by union+reduce, which preserves
  * the same query-time semantics.
  *
  * Scale notes: per-batch work is one shuffle on the primary key; the
  * store stays bounded by distinct-key count, not event count. At
  * cluster scale the store would be partitioned (bucketed) by key so the
  * merge joins co-partitioned data.
  */
object UpsertStream {

  /** Reduce a micro-batch and merge it into `store` (a mutable var the
    * caller owns) with FULL-upsert semantics. Returns the new store. */
  def mergeBatch(store: Option[DataFrame], batch: DataFrame,
      keys: Seq[String], cmpCol: String, tieCols: Seq[String]): DataFrame = {
    val combined = store match {
      case Some(st) => st.unionByName(batch)
      case None => batch
    }
    Upsert.latestByKey(combined, keys, cmpCol, tieCols)
  }

  /** Durable, RESTARTABLE streaming upsert: the keyed store lives as a
    * parquet directory and every micro-batch merge is committed with a
    * write-to-tmp + atomic-rename swap. Together with the streaming
    * checkpoint this gives exactly-once MERGE semantics under restart
    * (reference: realtime segment commit,
    * `RealtimeSegmentDataManager.java:129`):
    *
    *  - the checkpoint replays at most the last uncommitted batch after
    *    a crash/stop (at-least-once delivery);
    *  - the merge is IDEMPOTENT — latest-per-key over (store ∪ batch)
    *    re-applied with the same batch is a fixpoint — so a replayed
    *    batch converges to the same store instead of double-applying.
    *
    * Same wiring works for a Kafka source (`spark.readStream.format(
    * "kafka")`) — exercised here with the file source, which shares the
    * checkpoint/replay machinery. */
  def startDurable(
      spark: SparkSession,
      stream: DataFrame,
      keys: Seq[String],
      cmpCol: String,
      tieCols: Seq[String],
      storePath: String,
      checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        val hconf = sess.sparkContext.hadoopConfiguration
        val cur = new org.apache.hadoop.fs.Path(storePath)
        val fs = cur.getFileSystem(hconf)
        val prev =
          if (fs.exists(cur)) Some(sess.read.parquet(storePath)) else None
        // materialize BEFORE swapping — the merged plan reads the old
        // store files
        val merged = mergeBatch(prev, batch, keys, cmpCol, tieCols)
          .localCheckpoint(true)
        val tmp = new org.apache.hadoop.fs.Path(storePath + ".tmp")
        merged.write.mode("overwrite").parquet(tmp.toString)
        fs.delete(cur, true)
        if (!fs.rename(tmp, cur))
          throw new java.io.IOException(s"store swap failed: $tmp -> $cur")
        ()
      }
      .start()
  }

  /** Run a streaming upsert from a streaming DataFrame into an in-memory
    * keyed store, synchronously (for tests: call with a MemoryStream or
    * file source, then processAllAvailable on the returned query). The
    * store is exposed as a temp view `viewName` after every batch. */
  def start(
      spark: SparkSession,
      stream: DataFrame,
      keys: Seq[String],
      cmpCol: String,
      tieCols: Seq[String],
      viewName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    var store: Option[DataFrame] = None
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // localCheckpoint truncates lineage so the store doesn't grow a
        // per-batch plan chain; re-bind the materialized RDD to the MAIN
        // session (foreachBatch hands us a cloned session whose temp
        // views would be invisible outside the stream).
        val merged = mergeBatch(store, batch, keys, cmpCol, tieCols)
          .localCheckpoint(true)
        val bound = spark.createDataFrame(merged.rdd, merged.schema)
        store = Some(bound)
        bound.createOrReplaceTempView(viewName)
        ()
      }
      .start()
  }
}
