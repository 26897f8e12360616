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

  test("durable upsert survives stop + restart with exactly-once merge (file source)") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_stream").toString
    val inDir = s"$root/in"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = "user_id LONG, ts LONG, payload STRING"

    def startQ() = UpsertStream.startDurable(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(inDir),
      Seq("user_id"), "ts", Seq("payload"), store, ckpt)

    // phase 1: two files, then STOP (simulated crash/shutdown)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/f1.json"),
      """{"user_id":1,"ts":10,"payload":"a"}
        |{"user_id":2,"ts":10,"payload":"b"}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/f2.json"),
      """{"user_id":1,"ts":20,"payload":"a2"}
        |{"user_id":3,"ts":5,"payload":"c"}""".stripMargin)
    val q1 = startQ()
    q1.processAllAvailable(); q1.stop()

    // phase 2: late + newer rows arrive while "down"; RESTART from the
    // same checkpoint — only unseen files are processed, no re-merge
    // divergence from the replayed tail
    Files.writeString(java.nio.file.Paths.get(s"$inDir/f3.json"),
      """{"user_id":2,"ts":3,"payload":"stale"}
        |{"user_id":3,"ts":9,"payload":"c2"}
        |{"user_id":4,"ts":1,"payload":"d"}""".stripMargin)
    val q2 = startQ()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(store)
      .select($"user_id", $"payload").as[(Long, String)].collect().toMap
    // oracle: batch latest-per-key over ALL rows ever written
    val all = spark.read.schema(schema).json(inDir)
    val expect = graft.operators.Upsert
      .latestByKey(all, Seq("user_id"), "ts", Seq("payload"))
      .select($"user_id", $"payload").as[(Long, String)].collect().toMap
    assert(got == expect)
    assert(got == Map(1L -> "a2", 2L -> "b", 3L -> "c2", 4L -> "d"))

    // phase 3: restart once more with NOTHING new — replay must be a
    // no-op fixpoint (idempotent merge), store unchanged
    val q3 = startQ()
    q3.processAllAvailable(); q3.stop()
    val again = spark.read.parquet(store)
      .select($"user_id", $"payload").as[(Long, String)].collect().toMap
    assert(again == got)
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
