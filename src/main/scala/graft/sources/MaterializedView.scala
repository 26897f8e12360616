package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the Spark analog of the
  * reference's MaterializedViewTask minion job (apache/pinot
  * `pinot-plugins/.../tasks/materializedview/MaterializedViewTaskExecutor.java:96-330`,
  * `MaterializedViewTaskGenerator.java:41`): the MV is an aggregation of
  * a time-partitioned source, maintained one time window at a time with
  * a per-window state machine
  *
  *  - APPEND     — new window past the watermark: aggregate, write, mark
  *                 VALID, advance the watermark (executor preProcess
  *                 checks `watermarkMs <= windowStartMs`)
  *  - OVERWRITE  — a backfilled window: only legal when the partition is
  *                 tracked STALE; recompute and flip back to VALID
  *  - DELETE     — source window retention-deleted: only legal when
  *                 STALE; drop the MV rows but KEEP the entry as
  *                 VALID+empty-fingerprint so a later backfill flips it
  *                 VALID → STALE → OVERWRITE through the normal path
  *                 (the reference keeps "tracked but empty" entries for
  *                 exactly this reason)
  *
  * Staleness is detected by a source-window fingerprint (row count +
  * order-independent xor of row hashes — one partition-pruned aggregate
  * per window), the analog of the reference's PartitionFingerprint; an
  * OVERWRITE re-validates the fingerprint at commit time and leaves the
  * partition STALE if the source changed while the task ran.
  *
  * Scale shape: every operation touches exactly ONE source window (the
  * time predicate prunes the scan) and rewrites exactly ONE MV partition
  * directory — maintenance cost is proportional to the changed window,
  * never to MV size. State is a tiny driver-side file (the reference
  * keeps it in a ZK znode).
  */
object MaterializedView {

  /** MV definition: `SELECT dims..., aggs... FROM source WHERE timeCol in
    * [w, w+windowMs) GROUP BY dims` per window. Aggregate columns must be
    * pre-aliased. */
  final case class ViewDef(
      timeCol: String,
      windowMs: Long,
      dims: Seq[String],
      aggs: Seq[Column])

  /** Order-independent source-window fingerprint. `Empty` marks a
    * retention-deleted window that stays tracked. */
  final case class Fingerprint(rows: Long, hash: Long) {
    def isEmpty: Boolean = rows == 0L
  }
  val EmptyFingerprint: Fingerprint = Fingerprint(0L, 0L)

  sealed abstract class PState(val name: String)
  case object Valid extends PState("VALID")
  case object Stale extends PState("STALE")

  final case class PartitionInfo(state: PState, fingerprint: Fingerprint)
  final case class State(watermarkMs: Long, partitions: Map[Long, PartitionInfo])

  private def windowSlice(source: DataFrame, d: ViewDef, startMs: Long): DataFrame =
    source.filter(col(d.timeCol) >= timestamp_millis(lit(startMs)) &&
      col(d.timeCol) < timestamp_millis(lit(startMs + d.windowMs)))

  /** One partition-pruned aggregate over the window: (count, xor of
    * 64-bit row hashes) — commutative/associative, so deterministic under
    * any row order and partitioning. */
  def fingerprint(source: DataFrame, d: ViewDef, startMs: Long): Fingerprint = {
    val r = windowSlice(source, d, startMs)
      .select(xxhash64(struct(source.columns.map(col).toSeq: _*)).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x"))
      .head()
    Fingerprint(r.getLong(0), r.getLong(1))
  }

  /** The per-window MV aggregation (shared by every task mode). */
  def compute(source: DataFrame, d: ViewDef, startMs: Long): DataFrame =
    windowSlice(source, d, startMs)
      .groupBy(d.dims.map(col): _*)
      .agg(d.aggs.head, d.aggs.tail: _*)
      .withColumn("window_start_ms", lit(startMs))

  /** File-backed MV store: one parquet directory per window under
    * `path/w=<startMs>`, state in `path/_mv_state.txt`. */
  final class Store(spark: SparkSession, path: String, d: ViewDef) {

    private def stateFile = Paths.get(path, "_mv_state.txt")
    private def windowDir(startMs: Long) = s"$path/w=$startMs"

    def state: State =
      if (!Files.exists(stateFile)) State(Long.MinValue, Map.empty)
      else {
        val lines = new String(Files.readAllBytes(stateFile),
          StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
        val wm = lines.head.stripPrefix("watermark=").toLong
        val parts = lines.tail.map { l =>
          val Array(s, st, n, x) = l.split(",")
          s.toLong -> PartitionInfo(if (st == "STALE") Stale else Valid,
            Fingerprint(n.toLong, x.toLong))
        }.toMap
        State(wm, parts)
      }

    private def writeState(s: State): Unit = {
      Files.createDirectories(Paths.get(path))
      val body = (s"watermark=${s.watermarkMs}" +:
        s.partitions.toSeq.sortBy(_._1).map { case (w, p) =>
          s"$w,${p.state.name},${p.fingerprint.rows},${p.fingerprint.hash}"
        }).mkString("\n")
      val tmp = Paths.get(path, "_mv_state.txt.tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, stateFile, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }

    /** APPEND mode: new window at or past the watermark. */
    def append(source: DataFrame, startMs: Long): Unit = {
      val s = state
      require(s.watermarkMs <= startMs,
        s"watermark ${s.watermarkMs} should not be larger than windowStart $startMs")
      val fp = fingerprint(source, d, startMs)
      compute(source, d, startMs).write.mode("overwrite").parquet(windowDir(startMs))
      writeState(State(math.max(s.watermarkMs, startMs + d.windowMs),
        s.partitions + (startMs -> PartitionInfo(Valid, fp))))
    }

    /** Scheduler-side staleness scan: re-fingerprint a tracked window
      * and flip VALID → STALE when the source changed. Returns true if
      * it marked the window stale. */
    def markStaleIfChanged(source: DataFrame, startMs: Long): Boolean = {
      val s = state
      s.partitions.get(startMs) match {
        case Some(PartitionInfo(Valid, stored))
            if fingerprint(source, d, startMs) != stored =>
          writeState(s.copy(partitions =
            s.partitions + (startMs -> PartitionInfo(Stale, stored))))
          true
        case _ => false
      }
    }

    /** OVERWRITE mode: recompute a STALE window. The fingerprint is
      * re-taken after the write; if the source changed while the task
      * ran the window is left STALE for the next pass (the reference's
      * commit-time `validateSourceFingerprintAtCommit`). */
    def overwrite(source: DataFrame, startMs: Long): Unit = {
      val s = state
      require(s.partitions.get(startMs).exists(_.state == Stale),
        s"Overwrite target partition $startMs should exist and be STALE")
      val before = fingerprint(source, d, startMs)
      compute(source, d, startMs).write.mode("overwrite").parquet(windowDir(startMs))
      val after = fingerprint(source, d, startMs)
      val st = if (after == before) PartitionInfo(Valid, after)
        else PartitionInfo(Stale, after)
      writeState(s.copy(partitions = s.partitions + (startMs -> st)))
    }

    /** DELETE mode: the source window was retention-deleted. Drops the
      * MV rows but keeps the entry tracked as VALID+empty so a later
      * backfill re-enters through markStale → OVERWRITE; if a backfill
      * landed before commit, the window is left STALE instead. */
    def deleteWindow(source: DataFrame, startMs: Long): Unit = {
      val s = state
      require(s.partitions.get(startMs).exists(_.state == Stale),
        s"Delete target partition $startMs should exist and be STALE")
      val fp = fingerprint(source, d, startMs)
      if (!fp.isEmpty) {
        // commit-time emptiness re-check failed: leave STALE for OVERWRITE
        writeState(s.copy(partitions =
          s.partitions + (startMs -> PartitionInfo(Stale, fp))))
      } else {
        compute(source, d, startMs) // empty frame, keeps the schema
          .write.mode("overwrite").parquet(windowDir(startMs))
        writeState(s.copy(partitions =
          s.partitions + (startMs -> PartitionInfo(Valid, EmptyFingerprint))))
      }
    }

    /** Read the MV: union of all tracked window directories. */
    def read(): DataFrame = {
      val dirs = state.partitions.keys.toSeq.sorted.map(windowDir)
      if (dirs.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(dirs: _*)
    }
  }
}
