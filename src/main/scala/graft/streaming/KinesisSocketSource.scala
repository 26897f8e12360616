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

/** Structured-Streaming source over the Kinesis WIRE PROTOCOL
  * ([[KinesisWire]] / [[KinesisWireClient]]) — the analog of the
  * reference's `pinot-kinesis` plugin (`KinesisConsumer` /
  * `KinesisStreamMetadataProvider`), built SDK-free the same way the
  * Kafka path was built broker-jar-free.
  *
  * `spark.readStream.format("graft.streaming.KinesisSocketSourceProvider")
  *   .option("endpoint", "http://host:port").option("stream", s)
  *   .option("region", r).option("accessKey", a).option("secretKey", k)
  *   .option("shardIteratorType", "TRIM_HORIZON"|"LATEST").load()`
  *
  * Offset model mirrors the reference's `KinesisPartitionGroupOffset`:
  * shardId → last-consumed sequence number, JSON in the checkpoint's
  * offset log; replay re-fetches exactly (start, end] per shard with
  * AFTER_SEQUENCE_NUMBER iterators (`KinesisConsumer.java`
  * getKinesisMessageBatch), giving the Kafka path's exactly-once
  * contract. One Spark input partition per shard — ingestion
  * parallelism = shard count, the reference's partition-group model.
  *
  * Scale note: Kinesis exposes no "tip sequence number" API, so the
  * driver's latestOffset discovers the tip by walking GetRecords from
  * its cached cursor (records discarded; executors re-fetch their
  * exact range). The walk is incremental across triggers — each
  * discovery starts at the previous tip, so steady-state driver work
  * per trigger is proportional to NEW records per shard, not the
  * stream. */
class KinesisSocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kinesis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisSocketSource.RecordSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val cfg = KinesisSourceConfig(
      streamName = opts.get("stream"),
      endpoint = opts.get("endpoint"),
      region = Option(opts.get("region")).getOrElse("us-east-1"),
      accessKey = Option(opts.get("accesskey")).getOrElse(""),
      secretKey = Option(opts.get("secretkey")).getOrElse(""),
      shardIteratorType =
        Option(opts.get("sharditeratortype")).getOrElse("LATEST"),
      maxRecordsToFetch =
        Option(opts.get("maxrecordstofetch")).map(_.toInt).getOrElse(10000))
    new KinesisSocketTable(cfg)
  }
}

object KinesisSocketSource {
  /** Kinesis-native record schema (the fields the reference's
    * `KinesisStreamMessageMetadata` + record carry). */
  val RecordSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("shardId", StringType),
    StField("sequenceNumber"),
    StField("partitionKey"),
    StructField("approximateArrivalTimestamp", TimestampType)))

  private def StField(name: String) = StructField(name, StringType)

  private[streaming] def seqLe(a: String, b: String): Boolean =
    (a, b) match {
      case ("", _) => true
      case (_, "") => false
      case _ => BigInt(a) <= BigInt(b)
    }
}

final class KinesisSocketTable(cfg: KinesisSourceConfig)
  extends Table with SupportsRead {
  require(cfg.streamName != null, "option 'stream' is required")
  require(cfg.endpoint != null, "option 'endpoint' is required")
  override def name(): String = s"graft-kinesis:${cfg.streamName}"
  override def schema(): StructType = KinesisSocketSource.RecordSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisSocketSource.RecordSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisSocketMicroBatchStream(cfg)
      }
    }
}

/** shardId → last-consumed sequence number ("" = nothing consumed). */
final case class KinesisOffset(seqs: Map[String, String]) extends Offset {
  override def json(): String =
    seqs.toSeq.sorted
      .map { case (s, q) => s""""$s":"$q"""" }.mkString("{", ",", "}")
}

object KinesisOffset {
  def fromJson(s: String): KinesisOffset =
    KinesisOffset(
      """"([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap)
}

final class KinesisSocketMicroBatchStream(cfg: KinesisSourceConfig)
  extends MicroBatchStream {
  import KinesisSocketSource.seqLe

  private lazy val client = new KinesisWireClient(cfg.endpoint,
    KinesisWire.Credentials(cfg.accessKey, cfg.secretKey, cfg.region))

  // driver-side discovery cursor: last tip seq + live iterator per
  // shard, so successive latestOffset() walks only the NEW records
  private val cursor = mutable.Map[String, (String, Option[String])]()

  private def shards(): Seq[String] = client.listShards(cfg.streamName)

  /** Walk a shard to its current tip from `from` ("" = horizon),
    * returning the last sequence number seen. */
  private def discoverTip(shardId: String, from: String): String = {
    var (seq, iter) = cursor.getOrElse(shardId,
      (from, client.getShardIterator(cfg.streamName, shardId,
        if (from.isEmpty) "TRIM_HORIZON" else "AFTER_SEQUENCE_NUMBER",
        if (from.isEmpty) None else Some(from))))
    var done = false
    while (!done && iter.isDefined) {
      val r = client.getRecords(iter.get, cfg.maxRecordsToFetch)
      if (r.records.nonEmpty) seq = r.records.last.sequenceNumber
      iter = r.nextShardIterator
      // an empty batch at the tip (or a closed shard's null iterator)
      // ends the walk; a mid-stream empty batch with data behind
      // reports MillisBehindLatest > 0 and we keep walking
      done = r.records.isEmpty && r.millisBehindLatest <= 0
    }
    cursor(shardId) = (seq, iter)
    seq
  }

  override def initialOffset(): Offset = {
    val init = shards().map { s =>
      // LATEST skips records existing at query start: resolve the
      // current tip ONCE and checkpoint it as already-consumed;
      // TRIM_HORIZON starts from the beginning ("")
      s -> (if (cfg.shardIteratorType.equalsIgnoreCase("LATEST"))
        discoverTip(s, "") else "")
    }.toMap
    KinesisOffset(init)
  }

  override def latestOffset(): Offset =
    KinesisOffset(shards().map { s =>
      val from = cursor.get(s).map(_._1).getOrElse("")
      s -> discoverTip(s, from)
    }.toMap)

  override def deserializeOffset(json: String): Offset =
    KinesisOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KinesisOffset].seqs
    val e = end.asInstanceOf[KinesisOffset].seqs
    e.toSeq.sorted.flatMap { case (shard, endSeq) =>
      val startSeq = s.getOrElse(shard, "")
      if (endSeq.nonEmpty && !seqLe(endSeq, startSeq))
        Some(KinesisInputPartition(cfg, shard, startSeq, endSeq))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new KinesisPartitionReader(
          partition.asInstanceOf[KinesisInputPartition])
    }

  override def stop(): Unit = ()
}

final case class KinesisInputPartition(cfg: KinesisSourceConfig,
    shardId: String, startSeq: String, endSeq: String)
  extends InputPartition

/** Executor-side reader: own client, AFTER_SEQUENCE_NUMBER iterator,
  * exact (startSeq, endSeq] replay. */
final class KinesisPartitionReader(p: KinesisInputPartition)
  extends PartitionReader[InternalRow] {
  import KinesisSocketSource.seqLe

  private val client = new KinesisWireClient(p.cfg.endpoint,
    KinesisWire.Credentials(p.cfg.accessKey, p.cfg.secretKey, p.cfg.region))
  private val buffer = mutable.Queue[KinesisWire.KRecord]()
  private var iter: Option[String] = client.getShardIterator(
    p.cfg.streamName, p.shardId,
    if (p.startSeq.isEmpty) "TRIM_HORIZON" else "AFTER_SEQUENCE_NUMBER",
    if (p.startSeq.isEmpty) None else Some(p.startSeq))
  private var exhausted = false
  private var current: KinesisWire.KRecord = _

  override def next(): Boolean = {
    while (buffer.isEmpty && !exhausted && iter.isDefined) {
      val r = client.getRecords(iter.get, p.cfg.maxRecordsToFetch)
      val inRange = r.records
        .filter(rec => seqLe(rec.sequenceNumber, p.endSeq) &&
          !seqLe(rec.sequenceNumber, p.startSeq))
      buffer ++= inRange
      iter = r.nextShardIterator
      // stop once the batch reached past the planned end, or the walk
      // hit the live tip (a shard cannot serve the planned range if
      // its retention trimmed it — surfaced as an empty final batch)
      val reachedEnd = r.records.nonEmpty &&
        !seqLe(r.records.last.sequenceNumber, p.endSeq)
      val atTip = r.records.isEmpty && r.millisBehindLatest <= 0
      exhausted = reachedEnd || atTip ||
        r.records.lastOption.exists(_.sequenceNumber == p.endSeq)
    }
    if (buffer.isEmpty) false
    else { current = buffer.dequeue(); true }
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      current.data,
      UTF8String.fromString(p.cfg.streamName),
      UTF8String.fromString(p.shardId),
      UTF8String.fromString(current.sequenceNumber),
      UTF8String.fromString(current.partitionKey),
      current.approximateArrivalMs * 1000L)) // micros

  override def close(): Unit = ()
}
