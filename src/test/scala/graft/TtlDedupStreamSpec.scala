package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.TtlDedupStream
import graft.streaming.TtlDedupStream.Rec

/** Streaming TTL dedup: greedy gap rule across micro-batches, state
  * carried between batches, eviction via event-time timeout. */
class TtlDedupStreamSpec extends SparkSpec {

  test("keeps per TTL window across batches and re-admits after expiry") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Rec]
    // offset well past epoch: the initial watermark is 0, and rows at
    // epoch-adjacent times would be treated as late in the first batch
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)

    val q = TtlDedupStream.kept(mem.toDS(), ttlMillis = 100L,
        watermarkDelay = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ttl_out").start()
    try {
      // batch 1: A@0 kept, A@50 dropped (within ttl), B@10 kept
      mem.addData(Rec("A", ts(0), 1), Rec("A", ts(50), 2),
        Rec("B", ts(10), 3))
      q.processAllAvailable()
      // batch 2: state persists across batches — A@80 still dropped
      // (80 - 0 <= 100), A@150 kept (150 - 0 > 100)
      mem.addData(Rec("A", ts(80), 4), Rec("A", ts(150), 5))
      q.processAllAvailable()
      // batch 3: far beyond A's ttl — re-admitted (state either
      // evicted by timeout or the gap rule passes; same answer)
      mem.addData(Rec("A", ts(1000), 6))
      q.processAllAvailable()
      val kept = spark.table("ttl_out").as[Rec].collect()
        .map(_.id).toSet
      assert(kept == Set(1L, 3L, 5L, 6L))
    } finally q.stop()
  }
}
