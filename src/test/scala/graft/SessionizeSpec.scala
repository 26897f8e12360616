package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionization splits on gaps, per entity") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:10:00", 2L),
      (1L, "2024-01-01 01:00:00", 3L), // 50-min gap -> new session
      (2L, "2024-01-01 00:00:00", 4L))
      .toDF("user_id", "ts", "event_id")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Sessionize.assignSessions(events, "user_id", "ts", "event_id",
        gapMs = 30 * 60 * 1000L)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("streaming sessionization carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapMs = 1000L)
      .toDF("user_id", "payload", "session_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      mem.addData((1L, 0L, "a"), (1L, 500L, "b"))
      q.processAllAvailable()
      // batch 2: continues within gap, then a gap opens a new session
      mem.addData((1L, 1200L, "c"), (1L, 5000L, "d"), (2L, 0L, "x"))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .select($"payload", $"session_id").as[(String, Long)].collect().toMap
      assert(out == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "x" -> 1L))
    } finally q.stop()
  }
}
