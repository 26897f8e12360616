package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming CONTENT dedup: continuous ingestion where each micro-batch
  * is deduplicated (a) within itself, exactly and by near-dup cluster,
  * and (b) against everything already accepted — without ever re-reading
  * accepted text. The store holds one row per accepted doc:
  * (id, content_hash, signature). Exact rejection is an anti-join on the
  * content hash; near-dup rejection is the incremental LSH join
  * ([[Dedup.minhashLshAgainst]]) against the stored signatures.
  *
  * Extends the reference's PK-based streaming dedup tables
  * (apache/pinot `ConcurrentMapPartitionDedupMetadataManager.java` —
  * drop records whose primary key was ever seen) to content-defined
  * identity, the north-star training-pipeline requirement.
  *
  * Restart semantics mirror [[UpsertStream.startDurable]]: checkpoint
  * gives at-least-once batch delivery, and the batch step is IDEMPOTENT
  * — replaying an applied batch finds every accepted doc's content hash
  * already in the store and drops the whole batch, leaving the store at
  * its fixpoint. Store commits are write-tmp + atomic-rename.
  *
  * Scale: per batch, the only corpus-scale operand is the store's
  * signature table (fixed-size rows); the batch side is micro-batch
  * sized, so AQE broadcasts its banded buckets into the LSH join. At
  * cluster scale the store would be bucketed by band hash.
  */
object DedupStream {

  final case class Config(
      threshold: Double = 0.8,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3)

  /** One idempotent batch step: returns the new store (id, content_hash,
    * signature). `store` is None on the first batch. */
  def dedupBatch(store: Option[DataFrame], batch: DataFrame,
      idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val hashed = batch.select(col(idCol), col(textCol),
      md5(col(textCol)).as("content_hash"))
    // within-batch exact: keep the smallest id per content
    val exact = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol))
      .join(hashed, Seq(idCol, "content_hash"))
    // drop content already accepted (exact, store-wide, forever)
    val fresh = store match {
      case Some(st) => exact.join(
        st.select(col("content_hash")).distinct(), Seq("content_hash"),
        "left_anti")
      case None => exact
    }
    // within-batch near-dup: transitive closure, keep one per cluster
    val withinPairs = Dedup.minhashLsh(fresh, idCol, textCol,
      cfg.threshold, cfg.numHashes, cfg.bands, cfg.shingleSize)
    val reps = Dedup.keepRepresentatives(fresh, idCol, withinPairs)
    // near-dup vs the accepted corpus: signatures only, no text re-read
    val accepted = store match {
      case Some(st) =>
        val vs = Dedup.minhashLshAgainst(reps, idCol, textCol,
          st.select(col(idCol).as("id"), col("signature")),
          cfg.threshold, cfg.numHashes, cfg.bands, cfg.shingleSize)
        reps.join(vs.select(col("new_id").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
      case None => reps
    }
    val acceptedRows = accepted
      .join(Dedup.minhashSignatures(accepted, idCol, textCol,
          cfg.numHashes, cfg.shingleSize)
          .withColumnRenamed("id", idCol),
        idCol)
      .select(col(idCol), col("content_hash"), col("signature"))
    store match {
      case Some(st) => st.unionByName(acceptedRows)
      case None => acceptedRows
    }
  }

  /** Durable, restartable streaming content dedup over `stream`
    * (columns idCol, textCol). Same checkpoint + tmp/rename commit
    * protocol as [[UpsertStream.startDurable]]. */
  def startDurable(
      spark: SparkSession,
      stream: DataFrame,
      idCol: String,
      textCol: String,
      storePath: String,
      checkpointPath: String,
      cfg: Config = Config()): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        val hconf = sess.sparkContext.hadoopConfiguration
        val cur = new org.apache.hadoop.fs.Path(storePath)
        val fs = cur.getFileSystem(hconf)
        val prev =
          if (fs.exists(cur)) Some(sess.read.parquet(storePath)) else None
        val merged = dedupBatch(prev, batch, idCol, textCol, cfg)
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
}
