package graft.streaming

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import PulsarWire.MsgId

/** Structured-Streaming source over the Pulsar BINARY PROTOCOL
  * ([[PulsarWire]] / [[PulsarWireClient]]) — the analog of the
  * reference's `pinot-pulsar` plugin, built client-jar-free the same
  * way the Kafka and Kinesis paths were:
  *
  * `spark.readStream.format("graft.streaming.PulsarSocketSourceProvider")
  *   .option("serviceUrl", "pulsar://host:port").option("topic", t)
  *   .option("startPosition", "earliest"|"latest")
  *   .option("authenticationToken", tok).load()`
  *
  * Offset model mirrors the reference's `MessageIdStreamOffset`:
  * partition → last-consumed MessageId (`ledger:entry`, "" = nothing
  * consumed), JSON in the checkpoint's offset log; replay opens a
  * non-durable Reader subscription strictly after the start id
  * (`PulsarPartitionLevelConsumer.fetchMessages` seeks its Reader the
  * same way) and reads the exact (start, end] id range — exactly-once
  * like the Kafka/Kinesis paths. One Spark input partition per topic
  * partition (`topic-partition-N`, the reference's
  * `TopicName.getTopicPartitionNameString` naming).
  *
  * Scale note: unlike Kinesis, Pulsar HAS a tip API —
  * GET_LAST_MESSAGE_ID — so the driver's latestOffset is one RPC per
  * partition per trigger, never a record walk; payloads only ever
  * flow to executors. */
class PulsarSocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pulsar"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PulsarSocketSource.RecordSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val cfg = PulsarSourceConfig(
      topic = opts.get("topic"),
      serviceUrl = Option(opts.get("serviceurl"))
        .getOrElse(opts.get("bootstrap.servers")),
      startPosition = Option(opts.get("startposition")).getOrElse("latest"),
      authToken = Option(opts.get("authenticationtoken")),
      permits = Option(opts.get("permits")).map(_.toInt).getOrElse(1000),
      readTimeoutMs = Option(opts.get("readtimeoutms")).map(_.toInt)
        .getOrElse(30000))
    new PulsarSocketTable(cfg)
  }
}

/** The reference's `PulsarConfig.java` prop surface (`stream.pulsar.`
  * prefix): bootstrap.servers, authenticationToken, offset criteria →
  * initial position. TLS/OAuth props are parsed and rejected loudly
  * (they need cert/issuer infrastructure the reference delegates to
  * the SDK). */
final case class PulsarSourceConfig(
    topic: String,
    serviceUrl: String,
    startPosition: String = "latest",
    authToken: Option[String] = None,
    permits: Int = 1000,
    readTimeoutMs: Int = 30000) {
  def hostPort: (String, Int) = {
    val u = new java.net.URI(serviceUrl.replaceFirst("^pulsar://", "tcp://"))
    (u.getHost, if (u.getPort > 0) u.getPort else 6650)
  }
}

object PulsarSourceConfig {
  def fromProps(topic: String, props: Map[String, String]): PulsarSourceConfig = {
    val p = props.map { case (k, v) => k.stripPrefix("stream.pulsar.") -> v }
    require(!p.contains("tlsTrustCertsFilePath") && !p.contains("issuerUrl"),
      "TLS/OAuth Pulsar auth is not supported by the wire client")
    PulsarSourceConfig(
      topic = topic,
      serviceUrl = p.getOrElse("bootstrap.servers",
        p.getOrElse("serviceUrl", "pulsar://localhost:6650")),
      startPosition =
        p.getOrElse("consumer.prop.auto.offset.reset", "largest") match {
          case "smallest" => "earliest"
          case _ => "latest"
        },
      authToken = p.get("authenticationToken"))
  }
}

object PulsarSocketSource {
  /** Pulsar-native record schema (the fields the reference's
    * `PulsarStreamMessageMetadata` metadata extractors expose). */
  val RecordSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("ledgerId", LongType),
    StructField("entryId", LongType),
    StructField("batchIndex", IntegerType), // -1 = non-batched entry
    StructField("key", StringType),
    StructField("producerName", StringType),
    StructField("sequenceId", LongType),
    StructField("publishTime", TimestampType)))
}

final class PulsarSocketTable(cfg: PulsarSourceConfig)
  extends Table with SupportsRead {
  require(cfg.topic != null, "option 'topic' is required")
  require(cfg.serviceUrl != null, "option 'serviceUrl' is required")
  override def name(): String = s"graft-pulsar:${cfg.topic}"
  override def schema(): StructType = PulsarSocketSource.RecordSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PulsarSocketSource.RecordSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PulsarSocketMicroBatchStream(cfg)
      }
    }
}

/** partition → last-consumed MessageId ("" = nothing consumed). */
final case class PulsarOffset(ids: Map[Int, String]) extends Offset {
  override def json(): String =
    ids.toSeq.sorted
      .map { case (p, id) => s""""$p":"$id"""" }.mkString("{", ",", "}")
}

object PulsarOffset {
  def fromJson(s: String): PulsarOffset =
    PulsarOffset(
      """"(\d+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(s)
        .map(m => m.group(1).toInt -> m.group(2)).toMap)
}

final class PulsarSocketMicroBatchStream(cfg: PulsarSourceConfig)
  extends MicroBatchStream {

  private val (host, port) = cfg.hostPort
  private lazy val client =
    new PulsarWireClient(host, port, cfg.authToken, cfg.readTimeoutMs)

  // one non-durable metadata consumer per partition, subscribed at
  // Earliest but never given FLOW permits — it exists only so the
  // driver can issue GET_LAST_MESSAGE_ID (one RPC per trigger)
  private val metaConsumers = mutable.Map[Int, Long]()
  // 0 partitions = a non-partitioned topic, addressed by its bare name
  // (the reference's TopicName model). Re-fetched per trigger — the
  // reference's PulsarStreamMetadataProvider recomputes partition
  // groups each invocation, so a partition-count INCREASE (Pulsar's
  // resharding analog) is picked up live; new partitions start from
  // their horizon (a fresh partition holds only post-creation data).
  @volatile private var rawPartitions: Int = -1
  private def refreshPartitions(): Int = {
    rawPartitions = client.partitionedMetadata(cfg.topic)
    math.max(1, rawPartitions)
  }

  private def topicOf(p: Int): String = {
    // a restarted driver may plan a logged batch before any
    // latestOffset() refresh — resolve the topic shape first
    if (rawPartitions < 0) refreshPartitions()
    if (rawPartitions == 0) cfg.topic
    else PulsarWire.partitionTopic(cfg.topic, p)
  }

  private def metaConsumer(p: Int): Long =
    metaConsumers.getOrElseUpdate(p, {
      val cid = 1000L + p
      client.subscribe(topicOf(p), s"graft-meta-$p", cid, MsgId.Earliest)
      cid
    })

  private def tip(p: Int): String = {
    val id = client.getLastMessageId(metaConsumer(p))
    if (id.entry < 0) "" else id.toString
  }

  override def initialOffset(): Offset =
    PulsarOffset((0 until refreshPartitions()).map { p =>
      // latest = the current tip is already-consumed (the reference's
      // OffsetCriteria LARGEST → SubscriptionInitialPosition.Latest);
      // earliest = "" (nothing consumed)
      p -> (if (cfg.startPosition.equalsIgnoreCase("earliest")) "" else tip(p))
    }.toMap)

  override def latestOffset(): Offset =
    PulsarOffset((0 until refreshPartitions()).map { p =>
      val t = tip(p)
      p -> (if (t.isEmpty) "" else t)
    }.toMap)

  override def deserializeOffset(json: String): Offset =
    PulsarOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PulsarOffset].ids
    val e = end.asInstanceOf[PulsarOffset].ids
    e.toSeq.sorted.flatMap { case (p, endId) =>
      val startId = s.getOrElse(p, "")
      val fromId = if (startId.isEmpty) MsgId.Earliest else MsgId.parse(startId)
      // bounds compare WIDENED (MsgId.endBound): a batch-less id on a
      // bound means the whole entry is consumed, so a range whose end
      // repeats the start's entry with a concrete batch index plans
      // nothing (those elements were already served by the prior range)
      if (endId.nonEmpty && fromId.endBound < MsgId.parse(endId).endBound)
        Some(PulsarInputPartition(cfg, p, topicOf(p), startId, endId))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PulsarPartitionReader(
          partition.asInstanceOf[PulsarInputPartition])
    }

  override def stop(): Unit =
    try client.close() catch { case _: Throwable => () }
}

final case class PulsarInputPartition(cfg: PulsarSourceConfig,
    partition: Int, partitionTopic: String, startId: String, endId: String)
  extends InputPartition

/** Executor-side reader: own connection, non-durable Reader
  * subscription strictly after `startId`, exact (startId, endId]
  * replay — including MID-BATCH boundaries: batched payload frames
  * (`num_messages_in_batch`) unbatch into per-element ids
  * `(ledger, entry, batchIndex)` and the range filter applies per
  * element, the reference's `PulsarUtils.java:121-128`
  * BatchMessageIdImpl arithmetic. Compressed payloads (LZ4 / ZLIB /
  * ZSTD / SNAPPY) decompress before unbatching — the SDK the
  * reference wraps does both transparently. A broker that cannot
  * serve the committed range (retention trim) surfaces a replay-gap
  * error, not a silent truncated batch. */
final class PulsarPartitionReader(p: PulsarInputPartition)
  extends PartitionReader[InternalRow] {

  private val (host, port) = p.cfg.hostPort
  private val client =
    new PulsarWireClient(host, port, p.cfg.authToken, p.cfg.readTimeoutMs)
  private val consumerId = 1L
  private val seekId =
    if (p.startId.isEmpty) MsgId.Earliest else MsgId.parse(p.startId)
  // range bounds are WIDENED (MsgId.endBound) for the per-element
  // filter: a bound with batch = -1 — a non-batched entry, or a
  // batched tip whose GetLastMessageIdResponse omitted batch_index —
  // covers the WHOLE entry, so (start, end] neither defers that
  // entry's batch elements to a later range (they would wait
  // indefinitely on an idle topic) nor re-delivers them in the next
  // range (round-13 ADVICE). The wire seek keeps the raw id.
  private val start = seekId.endBound
  private val end = MsgId.parse(p.endId).endBound
  client.subscribe(p.partitionTopic, s"graft-read-${p.partition}",
    consumerId, seekId)
  client.flow(consumerId, p.cfg.permits)
  private var served = 0
  private var done = false
  // (elementId, outerMeta, singleMeta, payload)
  private val queue = mutable.Queue[
    (MsgId, PulsarWire.PbR, Option[PulsarWire.PbR], Array[Byte])]()
  private var current:
    (MsgId, PulsarWire.PbR, Option[PulsarWire.PbR], Array[Byte]) = _

  override def next(): Boolean = {
    while (queue.isEmpty && !done) {
      val f =
        try client.next()
        catch {
          case _: java.net.SocketTimeoutException =>
            // a timeout alone is NOT a data-loss signal (the broker
            // may merely be slower than readTimeoutMs — GC pause,
            // large backlog; round-13 ADVICE). Ask the broker for a
            // DEFINITIVE verdict: a tip strictly before the planned
            // end's entry proves the committed range can no longer be
            // served (topic truncated/recreated) — that is a replay
            // gap. Otherwise report the timeout as a timeout. Either
            // way the task throws, so a pushed MESSAGE frame the tip
            // RPC might skip past is re-read by the task retry.
            val gone = scala.util.Try(
              client.getLastMessageId(consumerId).endBound < end)
              .getOrElse(false)
            if (gone)
              throw new java.io.IOException(
                s"Pulsar replay gap: ${p.partitionTopic} tip is before " +
                  s"planned end ${p.endId} (start ${p.startId}) — " +
                  "committed range cannot be served")
            else
              throw new java.io.IOException(
                s"Pulsar read timed out (${p.cfg.readTimeoutMs} ms) " +
                  s"before planned end ${p.endId} on ${p.partitionTopic} " +
                  s"(start ${p.startId}) — broker slow or stalled; retry " +
                  "the task or raise readTimeoutMs")
        }
      f.cmdType match {
        case PulsarWire.MESSAGE =>
          val entryId = f.cmd.sub(PulsarWire.MESSAGE).flatMap(_.sub(2))
            .map(PulsarWire.parseMsgId)
            .getOrElse(throw new java.io.IOException("MESSAGE without id"))
          served += 1
          if (served * 2 >= p.cfg.permits) {
            client.flow(consumerId, p.cfg.permits); served = 0
          }
          val meta = f.metadata.get
          val raw = f.payload.get
          val comp = meta.long(8).map(_.toInt).getOrElse(0)
          val payload = PulsarWire.decompress(comp, raw,
            meta.long(9).map(_.toInt).getOrElse(raw.length))
          val nBatch = meta.long(11).map(_.toInt).getOrElse(-1)
          val elems =
            if (nBatch < 0) Seq((entryId, None, payload))
            else PulsarWire.unpackBatch(payload, nBatch).zipWithIndex.map {
              case ((sm, body), i) =>
                (entryId.copy(batch = i), Some(sm), body)
            }
          var anyInRange = false
          elems.foreach { case (eid, sm, body) =>
            // the range is (start, end]: the subscription starts
            // strictly after startId at ENTRY granularity, so a
            // mid-batch start still needs the per-element lower bound
            if (start < eid && eid <= end) {
              queue += ((eid, meta, sm, body)); anyInRange = true
            }
          }
          if (anyInRange) client.ack(consumerId, entryId)
          // done at ENTRY granularity: entries arrive whole, so once
          // the entry holding `end` has been seen nothing more in
          // (start, end] can arrive — and a widened end (batch
          // unknown) is satisfied by its entry, not by a batch index
          // no element will ever carry
          if (end <= entryId.endBound) done = true
        case PulsarWire.REACHED_END_OF_TOPIC =>
          throw new java.io.IOException(
            s"Pulsar replay gap: ${p.partitionTopic} ended before " +
              s"planned end ${p.endId} — committed range cannot be served")
        case _ => // ACTIVE_CONSUMER_CHANGE etc: ignore
      }
    }
    if (queue.isEmpty) false
    else { current = queue.dequeue(); true }
  }

  override def get(): InternalRow = {
    val (id, meta, single, payload) = current
    // per-element key / sequence from SingleMessageMetadata when
    // batched; the outer MessageMetadata otherwise
    val key = single.flatMap(_.str(2)).orElse(meta.str(6))
    val seqId = single.flatMap(_.long(8)).orElse(meta.long(2)).getOrElse(0L)
    new GenericInternalRow(Array[Any](
      payload,
      UTF8String.fromString(p.partitionTopic),
      p.partition,
      id.ledger,
      id.entry,
      id.batch,
      key.map(UTF8String.fromString).orNull,
      meta.str(1).map(UTF8String.fromString).orNull, // producer_name
      seqId,
      meta.long(3).getOrElse(0L) * 1000L)) // publish_time ms → micros
  }

  override def close(): Unit = {
    try client.closeConsumer(consumerId) catch { case _: Throwable => () }
    client.close()
  }
}
