package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{KafkaSource, KafkaSourceConfig, UpsertStream}

/** Broker-less verification of the Kafka source wiring: config
  * translation (reference streamConfigs → Spark Kafka source options)
  * and the JSON payload decode, driven end-to-end through the
  * streaming upsert via a MemoryStream shaped like Kafka's record
  * schema (binary key/value + timestamp). */
class KafkaWiringSpec extends SparkSpec {

  test("streamConfigs translate to Spark kafka source options") {
    val cfg = KafkaSource.fromStreamConfig(Map(
      "streamType" -> "kafka",
      "stream.kafka.topic.name" -> "events",
      "stream.kafka.broker.list" -> "broker-1:9092,broker-2:9092",
      "stream.kafka.consumer.prop.auto.offset.reset" -> "smallest",
      "stream.kafka.consumer.prop.group.id" -> "graft",
      "realtime.segment.flush.threshold.rows" -> "50000"))
    assert(cfg == KafkaSourceConfig(
      brokers = "broker-1:9092,broker-2:9092",
      topic = "events",
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L),
      extra = Map("group.id" -> "graft")))
    val opts = KafkaSource.options(cfg)
    assert(opts("kafka.bootstrap.servers") == "broker-1:9092,broker-2:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("kafka.group.id") == "graft")
    assert(opts("failOnDataLoss") == "false")
    // 'largest' → latest
    assert(KafkaSource.fromStreamConfig(Map(
      "stream.kafka.topic.name" -> "t", "stream.kafka.broker.list" -> "b",
      "stream.kafka.consumer.prop.auto.offset.reset" -> "largest"))
      .startingOffsets == "latest")
  }

  test("kafka-shaped records decode and drive the streaming upsert") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // MemoryStream with Kafka's record shape: key/value binary + timestamp
    val mem = MemoryStream[(Array[Byte], Array[Byte], java.sql.Timestamp)]
    val records = mem.toDF().toDF("key", "value", "timestamp")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType),
      StructField("payload", StringType)))
    val decoded = KafkaSource.decodeJson(records, schema)

    val q = UpsertStream.start(spark, decoded,
      Seq("user_id"), "ts", Seq("payload"), "kafka_upsert_view")
    try {
      def rec(json: String) =
        ("k".getBytes, json.getBytes, new java.sql.Timestamp(1000L))
      mem.addData(
        rec("""{"user_id":1,"ts":10,"payload":"a"}"""),
        rec("""{"user_id":2,"ts":10,"payload":"b"}"""))
      q.processAllAvailable()
      mem.addData(rec("""{"user_id":1,"ts":20,"payload":"a2"}"""))
      q.processAllAvailable()
      val out = spark.table("kafka_upsert_view")
        .select($"user_id", $"payload").as[(Long, String)].collect().toMap
      assert(out == Map(1L -> "a2", 2L -> "b"))
      // broker timestamp survives decode as _ingest_ts
      assert(spark.table("kafka_upsert_view").columns.contains("_ingest_ts"))
    } finally q.stop()
  }
}
