package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: assign gap-based session ids to an event stream —
  * a training-data-pipeline staple (and the natural extension of the
  * reference's funnel window, `FunnelBaseAggregationFunction` windows).
  *
  * Batch path: one shuffle per entity + window pass — `lag` detects
  * gap boundaries, a running sum numbers the sessions. Streaming path:
  * `flatMapGroupsWithState` with per-key (lastTs, sessionOrdinal)
  * state — the canonical Structured Streaming custom-state shape
  * (SURVEY §2.9's KeyValueGroupedDataset mapping).
  */
object Sessionize {

  /** Batch: adds `session_id` (per-entity ordinal, 1-based) to rows. */
  def assignSessions(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull ||
      (unix_millis(col(tsCol).cast("timestamp")) -
        unix_millis(prevTs.cast("timestamp"))) > gapMs, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Streaming: events (key, tsMillis, payload) → (key, payload,
    * session_id), per-key state = (last ts, session ordinal). In-order
    * delivery per key is assumed (Kafka partition-key semantics). */
  def sessionizeStream(
      events: Dataset[(Long, Long, String)],
      gapMs: Long): Dataset[(Long, String, Long)] = {
    implicit val stateEnc = Encoders.product[(Long, Long)]
    implicit val outEnc = Encoders.product[(Long, String, Long)]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[(Long, Long)]) => {
          var (lastTs, ord) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, ts, payload) =>
            if (lastTs == Long.MinValue || ts - lastTs > gapMs) ord += 1
            lastTs = ts
            (key, payload, ord)
          }
          state.update((lastTs, ord))
          out.iterator
        })
  }
}
