package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.UpsertStream

class StreamingUpsertSpec extends SparkSpec {

  test("streaming dedup drops duplicate keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val deduped = mem.toDF().toDF("pk", "payload").dropDuplicates("pk")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData((1L, "a"), (2L, "b"), (1L, "dup-in-batch"))
      q.processAllAvailable()
      mem.addData((1L, "dup-across-batch"), (3L, "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_out")
        .select($"pk", $"payload").as[(Long, String)].collect().toMap
      assert(out == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    } finally q.stop()
  }

  test("streaming upsert converges to latest-per-key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("user_id", "ts", "payload")

    val q = UpsertStream.start(spark, stream, Seq("user_id"), "ts",
      Seq("payload"), viewName = "upsert_state")
    try {
      mem.addData((1L, 10L, "a"), (2L, 10L, "b"))
      q.processAllAvailable()
      val s1 = spark.table("upsert_state")
        .select($"user_id", $"payload").as[(Long, String)].collect().toMap
      assert(s1 == Map(1L -> "a", 2L -> "b"))

      // batch 2: newer row for user 1, older (late) row for user 2, new user 3
      mem.addData((1L, 20L, "a2"), (2L, 5L, "stale"), (3L, 1L, "c"))
      q.processAllAvailable()
      val s2 = spark.table("upsert_state")
        .select($"user_id", $"payload").as[(Long, String)].collect().toMap
      assert(s2 == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    } finally q.stop()
  }
}
