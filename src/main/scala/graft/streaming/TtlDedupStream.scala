package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keyed dedup with metadata TTL — the streaming form of
  * [[graft.operators.Upsert.dedupTtl]] and the semantics of the
  * reference's realtime dedup table with `metadataTTL`
  * (`ConcurrentMapPartitionDedupMetadataManager.java`): a record is
  * dropped iff its key was kept within the trailing TTL window, and —
  * the entire point of the TTL — per-key state is EVICTED once the
  * event-time watermark passes lastKeptTime + ttl, so state size is
  * bounded by the number of keys active within one TTL window, not by
  * all keys ever seen.
  *
  * `flatMapGroupsWithState` with `EventTimeTimeout`: state is one Long
  * per live key (lastKeptTime); kept records emit in Append mode.
  * Within a micro-batch, records sort by (time, id) so batch-boundary
  * placement never changes which records survive (same greedy rule as
  * the batch operator) — PROVIDED records arrive time-ordered ACROSS
  * batches per key. A late record with t < lastKept (still inside the
  * watermark) is unconditionally dropped by the gap test here, whereas
  * the batch operator's global per-key sort could have kept it and
  * dropped a different record instead; on out-of-order cross-batch
  * arrival the streaming and batch results may therefore diverge.
  * Buffering per key until the watermark would restore exact
  * equivalence at the cost of one watermark-delay of latency.
  */
object TtlDedupStream {

  final case class Rec(k: String, t: java.sql.Timestamp, id: Long)

  def kept(input: Dataset[Rec], ttlMillis: Long,
      watermarkDelay: String): Dataset[Rec] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.withWatermark("t", watermarkDelay)
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Rec], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed lastKept + ttl: no in-flight record can
            // be within the window anymore — drop the key's state
            state.remove()
            Iterator.empty
          } else {
            var lastKept = state.getOption.getOrElse(Long.MinValue)
            val out = rows.toSeq.sortBy(r => (r.t.getTime, r.id))
              .flatMap { r =>
                val t = r.t.getTime
                if (lastKept == Long.MinValue || t - lastKept > ttlMillis) {
                  lastKept = t; Some(r)
                } else None
              }
            state.update(lastKept)
            state.setTimeoutTimestamp(lastKept + ttlMillis + 1)
            out.iterator
          }
      }
  }
}
