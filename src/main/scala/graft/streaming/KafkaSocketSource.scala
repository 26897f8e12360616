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
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming source consuming over the Kafka WIRE PROTOCOL
  * ([[KafkaWire]] / [[KafkaWireClient]]) — the socket-transport
  * realization of the engine's stream-ingest path (the container
  * ships no Kafka jars, so the client side is [[KafkaWireClient]];
  * the bytes on the wire are the protocol's).
  *
  * `spark.readStream.format("graft.streaming.KafkaSocketSourceProvider")
  * .option("brokers", "host:port").option("topic", t).load()` emits
  * the exact record schema the stock Kafka source does
  * ([[KafkaSource.RecordSchema]]), so everything downstream —
  * decodeJson, durable upsert sinks, TTL dedup — is transport-
  * agnostic. Offsets are per-partition longs carried in the
  * checkpoint's offset log exactly like the stock source's; replay
  * after a crash re-fetches precisely [committed, end) from the
  * broker, giving the same exactly-once contract
  * (KafkaSocketDurableSpec kills and restarts mid-stream to prove
  * it). One Spark input partition per topic partition — ingestion
  * parallelism = topic partitioning, the reference's partition-level
  * consumer model. */
class KafkaSocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSource.RecordSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // getTable receives the CASE-SENSITIVE map — normalize so the
    // stock Kafka source's spellings (startingOffsets) work verbatim
    val opts = new CaseInsensitiveStringMap(properties)
    new KafkaSocketTable(
      opts.get("brokers"),
      opts.get("topic"),
      Option(opts.get("startingoffsets")).getOrElse("earliest"),
      // dialect=flexible upgrades the wire encodings to the
      // post-KIP-482 versions (Produce v9 / Fetch v12 / ApiVersions v3)
      Option(opts.get("dialect")).contains("flexible"))
  }
}

final class KafkaSocketTable(brokers: String, topic: String,
    startingOffsets: String, flexible: Boolean = false)
  extends Table with SupportsRead {
  require(brokers != null, "option 'brokers' is required")
  require(topic != null, "option 'topic' is required")
  override def name(): String = s"graft-kafka:$topic"
  override def schema(): StructType = KafkaSource.RecordSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaSource.RecordSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaSocketMicroBatchStream(brokers, topic, startingOffsets,
            flexible)
      }
    }
}

/** Per-partition next-offset map, JSON round-trippable for Spark's
  * offset log. */
final case class KafkaSocketOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object KafkaSocketOffset {
  def fromJson(s: String): KafkaSocketOffset =
    KafkaSocketOffset(
      """"(\d+)"\s*:\s*(\d+)""".r.findAllMatchIn(s)
        .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

final class KafkaSocketMicroBatchStream(brokers: String, topic: String,
    startingOffsets: String, flexible: Boolean = false)
  extends MicroBatchStream {

  private val Array(host, portStr) = brokers.split(":", 2)
  private val port = portStr.toInt
  private lazy val client = new KafkaWireClient(host, port, "graft-driver",
    flexible = flexible)

  private def partitions(): Seq[Int] =
    client.metadata(Seq(topic)).headOption.map(_._2).getOrElse(Nil)

  override def initialOffset(): Offset = {
    val ts = if (startingOffsets == "latest") KafkaWire.LatestTs
      else KafkaWire.EarliestTs
    KafkaSocketOffset(partitions()
      .map(p => p -> client.listOffset(topic, p, ts)).toMap)
  }

  override def latestOffset(): Offset =
    KafkaSocketOffset(partitions()
      .map(p => p -> client.listOffset(topic, p, KafkaWire.LatestTs)).toMap)

  override def deserializeOffset(json: String): Offset =
    KafkaSocketOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaSocketOffset].offsets
    val e = end.asInstanceOf[KafkaSocketOffset].offsets
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L)
      if (endOff > startOff)
        Some(KafkaSocketInputPartition(host, port, topic, p, startOff,
          endOff, flexible))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new KafkaSocketPartitionReader(
          partition.asInstanceOf[KafkaSocketInputPartition])
    }

  override def stop(): Unit =
    try client.close() catch { case _: Throwable => () }
}

final case class KafkaSocketInputPartition(host: String, port: Int,
    topic: String, partition: Int, startOffset: Long, endOffset: Long,
    flexible: Boolean = false)
  extends InputPartition

/** Executor-side reader: its own socket, fetch loop over
  * [start, end). */
final class KafkaSocketPartitionReader(p: KafkaSocketInputPartition)
  extends PartitionReader[InternalRow] {

  private val client = new KafkaWireClient(p.host, p.port,
    s"graft-exec-${p.partition}", flexible = p.flexible)
  private val buffer = mutable.Queue[KafkaWire.Record]()
  private var nextOffset = p.startOffset
  private var current: KafkaWire.Record = _

  override def next(): Boolean = {
    while (buffer.isEmpty && nextOffset < p.endOffset) {
      val (records, _) = client.fetch(p.topic, p.partition, nextOffset)
      val inRange = records.filter(r =>
        r.offset >= nextOffset && r.offset < p.endOffset)
      // a COMPACTED topic can legitimately serve a batch with a GAP at
      // nextOffset (survivors keep their offsets); retention
      // TRUNCATION produces the same fetch shape but must FAIL, not
      // silently under-deliver — the exactly-once replay contract
      // depends on the full range. The log start offset (ListOffsets
      // ts=-2) distinguishes them: compaction removes records without
      // advancing it, deletion/retention advances it. Checked only
      // when a gap is observed, so the hot path pays nothing.
      val gapAtNext =
        inRange.headOption.map(_.offset != nextOffset).getOrElse(true)
      if (gapAtNext) {
        val logStart =
          try client.listOffset(p.topic, p.partition, -2L)
          catch { case _: Throwable => Long.MinValue }
        if (logStart > nextOffset)
          throw new IllegalStateException(
            s"Kafka log start for ${p.topic}-${p.partition} advanced " +
              s"to $logStart past planned offset $nextOffset (range " +
              s"[$nextOffset, ${p.endOffset})): records were " +
              "truncated by retention, not compacted")
      }
      if (inRange.nonEmpty) {
        buffer ++= inRange
        nextOffset = inRange.last.offset + 1
      } else {
        val maxReturned =
          if (records.isEmpty) -1L else records.map(_.offset).max
        if (maxReturned >= nextOffset) nextOffset = maxReturned + 1
        else throw new IllegalStateException(
          s"Kafka fetch for ${p.topic}-${p.partition} returned no " +
            s"records at or above $nextOffset (planned " +
            s"[$nextOffset, ${p.endOffset})): log truncated below " +
            "planned range")
      }
    }
    if (buffer.isEmpty) false
    else {
      current = buffer.dequeue()
      true
    }
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      current.key,
      current.value,
      UTF8String.fromString(p.topic),
      p.partition,
      current.offset,
      current.timestampMs * 1000L, // micros
      0)) // timestampType: create time

  override def close(): Unit = client.close()
}
