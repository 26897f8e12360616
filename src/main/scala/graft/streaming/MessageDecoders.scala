package graft.streaming

import java.io.ByteArrayInputStream

import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{WireBson, WireCoerce, WireProto}

/** Stream-ingestion payload decoders: Kafka record `value` bytes →
  * typed columns, the Structured-Streaming analog of the reference's
  * StreamMessageDecoder plugins.
  *
  * Reference contracts mirrored:
  *  - `pinot-input-format/pinot-bson/.../BSONMessageDecoder.java` —
  *    each message is ONE BSON document (no length framing on the
  *    stream path; the bytes are the document).
  *  - `pinot-input-format/pinot-protobuf/.../ProtoBufMessageDecoder.java`
  *    — each message is one serialized protobuf message of the
  *    configured descriptor.
  *  - `pinot-confluent-{avro,protobuf,json}/.../KafkaConfluentSchemaRegistry*MessageDecoder.java`
  *    — Confluent wire framing: magic byte 0x00, int32 BIG-endian
  *    schema id, then (protobuf only) a message-indexes path encoded
  *    as Kafka zigzag varints (count, then indexes; the single byte
  *    0x00 is the optimized `[0]` = first message), then the payload.
  *    The schema-registry client is replaced by an explicit
  *    id → schema map — the same lookup, minus the HTTP round trip.
  *
  * All decoders operate on ANY DataFrame/stream with a binary `value`
  * and `timestamp` column (the Spark Kafka source shape,
  * [[KafkaSource.RecordSchema]]), keep the broker timestamp as
  * `_ingest_ts`, and run as one mapPartitions over the stream — no
  * shuffle, decode parallelism = input partitions, exactly the
  * per-consumer decode profile of the reference. */
object MessageDecoders {

  private def withIngestTs(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("_ingest_ts", TimestampType))

  private def decodeWith(records: DataFrame, schema: StructType)(
      f: Array[Byte] => collection.Map[String, Any]): DataFrame = {
    val out = withIngestTs(schema)
    val enc = Encoders.row(out)
    records.select(col("value"), col("timestamp")).mapPartitions { it =>
      it.map { r =>
        val fields = f(r.getAs[Array[Byte]](0))
        Row.fromSeq(WireCoerce.toRow(fields, schema).toSeq :+ r.getTimestamp(1))
      }
    }(enc)
  }

  /** BSON message decode: the value bytes are one BSON document. */
  def decodeBson(records: DataFrame, schema: StructType): DataFrame =
    decodeWith(records, schema)(bytes =>
      scala.collection.immutable.ListMap(WireBson.decodeDocument(bytes): _*))

  /** Protobuf message decode against a compiled descriptor set; the
    * message type defaults to the set's first message, as in the
    * reference's ProtoBufMessageDecoder. */
  def decodeProto(
      records: DataFrame,
      descriptorSet: Array[Byte],
      messageName: Option[String] = None): DataFrame = {
    val pool = WireProto.parseDescriptorSet(descriptorSet)
    val msgName = messageName.getOrElse(pool.firstMessage)
    val schema = WireProto.sparkSchema(msgName, pool)
    decodeWith(records, schema)(bytes =>
      WireProto.decodeMessage(bytes, pool.messages(msgName), pool))
  }

  // ---------------------------------------------------------------------
  // Confluent wire format
  // ---------------------------------------------------------------------

  /** Parsed Confluent frame: registry schema id, protobuf
    * message-indexes path (empty unless parsed with `withIndexes`),
    * and the payload offset. */
  final case class ConfluentFrame(schemaId: Int, indexes: Seq[Int], payloadOffset: Int)

  /** Strip the Confluent header: 0x00 magic + int32 BE schema id
    * (+ zigzag-varint message-indexes when `withIndexes`). */
  def confluentFrame(bytes: Array[Byte], withIndexes: Boolean): ConfluentFrame = {
    require(bytes.length >= 5 && bytes(0) == 0, "unknown magic byte")
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    if (!withIndexes) return ConfluentFrame(id, Nil, 5)
    var pos = 5
    def zig(): Int = {
      var shift = 0; var v = 0L
      var b = 0
      while ({ b = bytes(pos); pos += 1; (b & 0x80) != 0 }) {
        v |= (b & 0x7fL) << shift; shift += 7
      }
      v |= (b & 0x7fL) << shift
      ((v >>> 1) ^ -(v & 1)).toInt
    }
    val count = zig()
    val indexes = if (count == 0) Seq(0) else Seq.fill(count)(zig())
    ConfluentFrame(id, indexes, pos)
  }

  /** Confluent-framed protobuf: schema id → descriptor-set bytes is the
    * registry analog; the message-indexes path picks the message type
    * within the schema's declaration order. */
  def decodeConfluentProto(
      records: DataFrame,
      registry: Map[Int, Array[Byte]],
      schema: StructType): DataFrame = {
    val pools = registry.map { case (id, ds) => id -> WireProto.parseDescriptorSet(ds) }
    decodeWith(records, schema) { bytes =>
      val frame = confluentFrame(bytes, withIndexes = true)
      val pool = pools.getOrElse(frame.schemaId,
        throw new IllegalArgumentException(s"schema id ${frame.schemaId} not registered"))
      val msgName = pool.resolveIndexes(frame.indexes)
      val payload = java.util.Arrays.copyOfRange(bytes, frame.payloadOffset, bytes.length)
      WireProto.decodeMessage(payload, pool.messages(msgName), pool)
    }
  }

  /** Confluent-framed avro: schema id → avro writer-schema JSON. The
    * avro binary body decodes with the plain avro reader (on Spark's
    * classpath); GenericRecord fields surface by name. */
  def decodeConfluentAvro(
      records: DataFrame,
      registry: Map[Int, String],
      schema: StructType): DataFrame =
    decodeWith(records, schema) { bytes =>
      val frame = confluentFrame(bytes, withIndexes = false)
      val avroSchema = new org.apache.avro.Schema.Parser()
        .parse(registry.getOrElse(frame.schemaId,
          throw new IllegalArgumentException(s"schema id ${frame.schemaId} not registered")))
      val reader = new GenericDatumReader[GenericRecord](avroSchema)
      val dec = DecoderFactory.get().binaryDecoder(
        new ByteArrayInputStream(bytes, frame.payloadOffset, bytes.length - frame.payloadOffset), null)
      val rec = reader.read(null, dec)
      import scala.jdk.CollectionConverters._
      // recursive: nested GenericRecord / avro map values become scala
      // Maps (WireCoerce's struct/map shape), lists recurse per element
      def conv(v: Any): Any = v match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case l: java.util.List[_] => l.asScala.toArray[Any].map(conv)
        case r: GenericRecord =>
          r.getSchema.getFields.asScala
            .map(f => f.name -> conv(r.get(f.name))).toMap
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, x) => String.valueOf(k) -> conv(x) }.toMap
        case other => other
      }
      avroSchema.getFields.asScala.map(f => f.name -> conv(rec.get(f.name))).toMap
    }

  /** Confluent-framed JSON: strip the 5-byte header, then the plain
    * JSON decode (`KafkaConfluentSchemaRegistryJsonMessageDecoder`). */
  def decodeConfluentJson(records: DataFrame, schema: StructType): DataFrame =
    records
      .select(
        from_json(expr("substring(value, 6, length(value) - 5)").cast("string"), schema).as("m"),
        col("timestamp").as("_ingest_ts"))
      .select(col("m.*"), col("_ingest_ts"))
}
