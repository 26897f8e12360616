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
  * stream. LATEST starts never replay the retained stream: the
  * initial offset is the `@latest` sentinel with a LATEST iterator
  * seeded driver-side, and the first records discovered checkpoint as
  * a composite `first:last` offset so an executor (or a restart) can
  * reposition with AT_SEQUENCE_NUMBER (round-12 ADVICE). The stream
  * implements SupportsAdmissionControl so each trigger receives the
  * committed start offset — a restarted driver reseeds its discovery
  * cursor from the checkpoint instead of re-walking TRIM_HORIZON. */
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

  /** Offset value grammar: `""` = nothing consumed (TRIM_HORIZON
    * start), [[Latest]] = LATEST start with the tip still unknown,
    * `first:last` = the FIRST batch after a LATEST start (both ends
    * needed so replay can reposition inclusively), plain `seq` = last
    * consumed. */
  private[streaming] val Latest = "@latest"

  /** The position a range ENDS at / resumes AFTER. */
  private[streaming] def lastOf(s: String): String = {
    val i = s.indexOf(':')
    if (i >= 0) s.substring(i + 1) else s
  }

  /** The inclusive first sequence of a composite `first:last` offset. */
  private[streaming] def firstOf(s: String): Option[String] = {
    val i = s.indexOf(':')
    if (i >= 0) Some(s.substring(0, i)) else None
  }

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
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import KinesisSocketSource.{firstOf, lastOf, seqLe, Latest}

  private lazy val client = new KinesisWireClient(cfg.endpoint,
    KinesisWire.Credentials(cfg.accessKey, cfg.secretKey, cfg.region))

  // driver-side discovery cursor: last tip seq + live iterator per
  // shard, so successive latestOffset() walks only the NEW records
  private val cursor = mutable.Map[String, (String, Option[String])]()

  private def shards(): Seq[String] = client.listShards(cfg.streamName)

  private def acquire(shardId: String, from: String): Option[String] =
    from match {
      case "" => client.getShardIterator(cfg.streamName, shardId,
        "TRIM_HORIZON")
      case Latest => client.getShardIterator(cfg.streamName, shardId,
        "LATEST")
      case seq => client.getShardIterator(cfg.streamName, shardId,
        "AFTER_SEQUENCE_NUMBER", Some(lastOf(seq)))
    }

  /** Walk a shard to its current tip from `from`, returning the
    * offset-grammar tip: unchanged `from` when nothing new arrived, a
    * composite `first:last` for the first records after a LATEST
    * start, a plain seq otherwise. Iterators expire after 5 minutes —
    * an ExpiredIteratorException re-acquires from the last seen
    * position instead of failing the trigger (round-12 ADVICE). */
  private def discoverTip(shardId: String, from: String): String = {
    var (seq, iter) = cursor.getOrElse(shardId, (from, acquire(shardId, from)))
    // only the FIRST records after a LATEST start need the composite
    // `first:last` form; once a concrete position exists, plain seqs
    var first: Option[String] = None
    var done = false
    while (!done && iter.isDefined) {
      val r =
        try client.getRecords(iter.get, cfg.maxRecordsToFetch)
        catch {
          case e: KinesisWire.KinesisApiException
              if e.errorType == "ExpiredIteratorException" =>
            iter = acquire(shardId, seq)
            KinesisWire.GetRecordsResult(Nil, iter, 1)
        }
      if (r.records.nonEmpty) {
        if (first.isEmpty && seq == Latest)
          first = Some(r.records.head.sequenceNumber)
        seq = r.records.last.sequenceNumber
      }
      iter = r.nextShardIterator
      // an empty batch at the tip (or a closed shard's null iterator)
      // ends the walk; a mid-stream empty batch with data behind
      // reports MillisBehindLatest > 0 and we keep walking
      done = r.records.isEmpty && r.millisBehindLatest <= 0
    }
    val tip = first match {
      case Some(f) if seq != Latest => s"$f:$seq"
      case _ => seq
    }
    cursor(shardId) = (tip, iter)
    tip
  }

  override def initialOffset(): Offset = {
    val latest = cfg.shardIteratorType.equalsIgnoreCase("LATEST")
    val init = shards().map { s =>
      // LATEST starts at the live tip WITHOUT replaying the retained
      // stream: seed the discovery cursor with a LATEST iterator and
      // checkpoint the sentinel; the first discovered records carry
      // their own inclusive start (`first:last`). TRIM_HORIZON starts
      // from the beginning ("").
      if (latest) { cursor(s) = (Latest, acquire(s, Latest)); s -> Latest }
      else s -> ""
    }.toMap
    KinesisOffset(init)
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  /** Admission-control variant: `start` is the committed offset, so a
    * restarted driver reseeds its discovery cursor from the checkpoint
    * instead of re-walking the retained stream from TRIM_HORIZON. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[KinesisOffset].seqs
    KinesisOffset(shards().map { sh =>
      // a shard in neither the cursor nor the checkpoint is a
      // MID-STREAM discovery (a reshard child): it always starts from
      // horizon ("") so records written before its first discovery
      // trigger are kept — the @latest sentinel applies only to the
      // query's very first trigger (initialOffset), matching the
      // reference's KinesisStreamMetadataProvider where children
      // consume from their beginning regardless of the configured
      // start position
      val from = cursor.get(sh).map(_._1).orElse(s.get(sh)).getOrElse("")
      sh -> discoverTip(sh, from)
    }.toMap)
  }

  override def deserializeOffset(json: String): Offset =
    KinesisOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KinesisOffset].seqs
    val e = end.asInstanceOf[KinesisOffset].seqs
    e.toSeq.sorted.flatMap { case (shard, endRaw) =>
      val startRaw = s.getOrElse(shard, "")
      val endSeq = if (endRaw == Latest) "" else lastOf(endRaw)
      // a LATEST-sentinel start consumes nothing before the end
      // offset's own inclusive first sequence
      val (startSeq, atSeq) =
        if (startRaw == Latest) ("", firstOf(endRaw))
        else (lastOf(startRaw), None)
      if (endSeq.nonEmpty &&
          (atSeq.isDefined || !seqLe(endSeq, startSeq)) &&
          !(startRaw == Latest && atSeq.isEmpty))
        Some(KinesisInputPartition(cfg, shard,
          atSeq.map("@at:" + _).getOrElse(startSeq), endSeq))
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

/** Executor-side reader: own client, AFTER_SEQUENCE_NUMBER iterator
  * (or AT_SEQUENCE_NUMBER for a `@at:first` inclusive start — the
  * first batch after a LATEST start), exact range replay. */
final class KinesisPartitionReader(p: KinesisInputPartition)
  extends PartitionReader[InternalRow] {
  import KinesisSocketSource.seqLe

  private val client = new KinesisWireClient(p.cfg.endpoint,
    KinesisWire.Credentials(p.cfg.accessKey, p.cfg.secretKey, p.cfg.region))
  private val buffer = mutable.Queue[KinesisWire.KRecord]()
  private val atStart = p.startSeq.startsWith("@at:")
  private val fromSeq = if (atStart) p.startSeq.stripPrefix("@at:") else p.startSeq
  private def acquire(afterSeen: Option[String]): Option[String] =
    afterSeen match {
      case Some(seen) => client.getShardIterator(p.cfg.streamName, p.shardId,
        "AFTER_SEQUENCE_NUMBER", Some(seen))
      case None if atStart => client.getShardIterator(p.cfg.streamName,
        p.shardId, "AT_SEQUENCE_NUMBER", Some(fromSeq))
      case None if fromSeq.isEmpty => client.getShardIterator(
        p.cfg.streamName, p.shardId, "TRIM_HORIZON")
      case None => client.getShardIterator(p.cfg.streamName, p.shardId,
        "AFTER_SEQUENCE_NUMBER", Some(fromSeq))
    }
  private var iter: Option[String] = acquire(None)
  private var lastSeen: Option[String] = None
  private var reachedEnd = false
  private var exhausted = false
  private var current: KinesisWire.KRecord = _

  private def inRange(seq: String): Boolean =
    seqLe(seq, p.endSeq) &&
      (if (atStart) seqLe(fromSeq, seq) else !seqLe(seq, fromSeq))

  override def next(): Boolean = {
    while (buffer.isEmpty && !exhausted && iter.isDefined) {
      val r =
        try client.getRecords(iter.get, p.cfg.maxRecordsToFetch)
        catch {
          // iterators expire after 5 min — re-acquire from the last
          // consumed position instead of failing the task
          case e: KinesisWire.KinesisApiException
              if e.errorType == "ExpiredIteratorException" =>
            iter = acquire(lastSeen)
            KinesisWire.GetRecordsResult(Nil, iter, 1)
        }
      buffer ++= r.records.filter(rec => inRange(rec.sequenceNumber))
      r.records.lastOption.foreach(rec => lastSeen = Some(rec.sequenceNumber))
      iter = r.nextShardIterator
      // the walk ends when the batch reached the planned end (or past
      // it) or hit the live tip
      reachedEnd ||= r.records.exists(rec =>
        !seqLe(rec.sequenceNumber, p.endSeq) ||
          rec.sequenceNumber == p.endSeq)
      val atTip = r.records.isEmpty && r.millisBehindLatest <= 0
      exhausted = reachedEnd || atTip
    }
    if (buffer.isEmpty) {
      // the committed offset range is a replay CONTRACT: if the shard
      // is exhausted (tip or closed iterator) before endSeq was
      // reached — retention trimmed mid-range — a silently truncated
      // batch would be data loss; surface the gap as an error
      if (!reachedEnd)
        throw new java.io.IOException(
          s"Kinesis replay gap: shard ${p.shardId} exhausted at " +
            s"${lastSeen.getOrElse("<none>")} before planned end " +
            s"${p.endSeq} (start ${p.startSeq}) — records trimmed " +
            "from retention, committed range cannot be served")
      false
    } else { current = buffer.dequeue(); true }
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
