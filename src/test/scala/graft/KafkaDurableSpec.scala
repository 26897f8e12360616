package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{KafkaSource, UpsertStream}

/** End-to-end broker-free realtime-table path: a protocol-faithful
  * file-backed topic log (full Kafka record schema with partitions and
  * offsets) → KafkaSource.decodeJson → UpsertStream.startDurable, with
  * a kill/restart in the middle — asserting the exactly-once merge the
  * reference's realtime consumption guarantees
  * (`RealtimeSegmentDataManager.java:129` checkpointed offsets). */
class KafkaDurableSpec extends SparkSpec {

  test("file-backed kafka log -> decode -> durable upsert survives restart exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("kafka_log").toString
    val topicDir = s"$root/topic"
    val store = s"$root/store"
    val ckpt = s"$root/ckpt"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType),
      StructField("amount", DoubleType)))

    def rec(part: Int, off: Long, json: String) =
      (s"k$off".getBytes, json.getBytes, part, off, 1000L + off)

    def startQ() = UpsertStream.startDurable(spark,
      KafkaSource.decodeJson(KafkaSource.FileTopicLog.readStream(spark, topicDir), schema),
      Seq("user_id"), "ts", Seq("amount"), store, ckpt)

    // phase 1: two partitions, interleaved offsets
    KafkaSource.FileTopicLog.append(spark, topicDir, "t", Seq(
      rec(0, 0, """{"user_id":1,"ts":10,"amount":1.0}"""),
      rec(0, 1, """{"user_id":1,"ts":20,"amount":2.0}"""),
      rec(1, 0, """{"user_id":2,"ts":10,"amount":5.0}""")))
    val q1 = startQ()
    q1.processAllAvailable()
    q1.stop() // kill mid-stream

    val afterPhase1 = spark.read.parquet(store)
      .select("user_id", "ts", "amount")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(afterPhase1 == Map(1L -> (20L, 2.0), 2L -> (10L, 5.0)))

    // phase 2: new records appended while the consumer is down — one
    // stale (older ts, must lose the merge) and one fresh
    KafkaSource.FileTopicLog.append(spark, topicDir, "t", Seq(
      rec(1, 1, """{"user_id":2,"ts":5,"amount":99.0}"""),
      rec(0, 2, """{"user_id":3,"ts":30,"amount":7.0}""")))
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()

    val after2 = spark.read.parquet(store)
      .select("user_id", "ts", "amount")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(after2 == Map(1L -> (20L, 2.0), 2L -> (10L, 5.0), 3L -> (30L, 7.0)))
    // exactly-once: one row per key, phase-1 files not re-applied
    assert(spark.read.parquet(store).count() == 3)

    // phase 3: restart with nothing new — replay must be a no-op
    val q3 = startQ()
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(store).count() == 3)
  }
}
