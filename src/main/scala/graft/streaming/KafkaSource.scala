package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Kafka stream-source wiring — the reference's realtime-table stream
  * config surface (`stream.kafka.*` keys in table config
  * `streamConfigs`, consumed by
  * `KafkaPartitionLevelConnectionHandler.java` /
  * `KafkaStreamMetadataProvider.java`, decoded by
  * `JSONMessageDecoder.java`) mapped onto Structured Streaming's Kafka
  * source (`spark.readStream.format("kafka")`).
  *
  * The container has no broker, so the wiring is factored for
  * broker-less verification (KafkaWiringSpec):
  *  - [[options]] / [[fromStreamConfig]] — pure config translation;
  *  - [[decodeJson]] — payload decode over ANY DataFrame with Kafka's
  *    record shape (key/value binary + timestamp), testable with a
  *    MemoryStream;
  *  - [[readStream]] composes the two against a real broker, and its
  *    output feeds [[UpsertStream.startDurable]] unchanged — the
  *    checkpoint/replay/idempotent-merge machinery is source-agnostic.
  *
  * Scale: the Kafka source maps one Spark task per topic partition —
  * ingestion parallelism is topic partitioning, the same contract as
  * the reference's partition-level consumers. maxOffsetsPerTrigger
  * bounds micro-batch size so a backlogged topic cannot produce an
  * unbounded batch (the reference's flush thresholds play this role).
  */
final case class KafkaSourceConfig(
    brokers: String,
    topic: String,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None,
    failOnDataLoss: Boolean = false,
    extra: Map[String, String] = Map.empty)

object KafkaSource {

  /** Structured-Streaming Kafka source options for a config. */
  def options(cfg: KafkaSourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.brokers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString
    ) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.extra.map { case (k, v) => s"kafka.$k" -> v }

  /** Translate a reference-style streamConfigs map (`stream.kafka.*`
    * keys, see `StreamConfigProperties.java`) into a source config.
    * offset criteria: reference `smallest`/`largest` → Spark
    * `earliest`/`latest`. */
  def fromStreamConfig(props: Map[String, String]): KafkaSourceConfig = {
    def req(k: String): String = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing streamConfig key $k"))
    val offsets =
      props.get("stream.kafka.consumer.prop.auto.offset.reset") match {
        case Some("smallest") | None => "earliest"
        case Some("largest")         => "latest"
        case Some(other)             => other // timestamp/json forms pass through
      }
    KafkaSourceConfig(
      brokers = req("stream.kafka.broker.list"),
      topic = req("stream.kafka.topic.name"),
      startingOffsets = offsets,
      maxOffsetsPerTrigger =
        props.get("realtime.segment.flush.threshold.rows").map(_.toLong),
      extra = props.collect {
        case (k, v) if k.startsWith("stream.kafka.consumer.prop.")
            && k != "stream.kafka.consumer.prop.auto.offset.reset" =>
          k.stripPrefix("stream.kafka.consumer.prop.") -> v
      })
  }

  /** JSON payload decode (reference `JSONMessageDecoder.java`): Kafka
    * record shape (binary `value`, `timestamp`) → typed columns per
    * `schema`, keeping the broker timestamp as `_ingest_ts`. Works on
    * any DataFrame/stream with those two columns. */
  def decodeJson(records: DataFrame, schema: StructType): DataFrame =
    records
      .select(from_json(col("value").cast("string"), schema).as("m"),
        col("timestamp").as("_ingest_ts"))
      .select(col("m.*"), col("_ingest_ts"))

  /** Live composition against a real broker (not exercisable in this
    * container): source options + JSON decode, ready to feed
    * [[UpsertStream.startDurable]]. */
  def readStream(spark: SparkSession, cfg: KafkaSourceConfig,
      schema: StructType): DataFrame =
    decodeJson(
      spark.readStream.format("kafka").options(options(cfg)).load(),
      schema)

  /** Exact record schema the Spark Kafka source emits — the shape both
    * [[decodeJson]] and the file-backed log below adhere to. */
  val RecordSchema: StructType = StructType(Seq(
    StructField("key", org.apache.spark.sql.types.BinaryType),
    StructField("value", org.apache.spark.sql.types.BinaryType),
    StructField("topic", org.apache.spark.sql.types.StringType),
    StructField("partition", org.apache.spark.sql.types.IntegerType),
    StructField("offset", org.apache.spark.sql.types.LongType),
    StructField("timestamp", org.apache.spark.sql.types.TimestampType),
    StructField("timestampType", org.apache.spark.sql.types.IntegerType)))

  /** Protocol-faithful FILE-BACKED topic log (the container has no
    * broker): records carry the full Kafka record schema
    * ([[RecordSchema]] — key/value/topic/partition/offset/timestamp),
    * appended as parquet batches and consumed through Spark's file
    * stream source, whose checkpoint tracks consumed files the way the
    * Kafka source tracks offsets — replay after a crash re-delivers
    * exactly the unprocessed batches. Combined with
    * [[UpsertStream.startDurable]] this exercises the full
    * source→decode→durable-merge→restart path broker-free; against a
    * real cluster only [[readStream]]'s format string differs. */
  object FileTopicLog {
    def append(spark: SparkSession, dir: String, topic: String,
        records: Seq[(Array[Byte], Array[Byte], Int, Long, Long)]): Unit = {
      import scala.jdk.CollectionConverters._
      val rows = records.map { case (k, v, part, off, tsMs) =>
        org.apache.spark.sql.Row(k, v, topic, part, off,
          new java.sql.Timestamp(tsMs), 0)
      }
      spark.createDataFrame(rows.asJava, RecordSchema)
        .coalesce(1).write.mode("append").parquet(dir)
    }

    def readStream(spark: SparkSession, dir: String): DataFrame =
      spark.readStream.schema(RecordSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(dir)
  }
}
