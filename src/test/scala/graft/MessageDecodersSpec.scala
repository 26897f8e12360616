package graft

import java.sql.Timestamp

import graft.streaming.MessageDecoders
import graft.sources.WireProto
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Stream payload decoders (the reference's StreamMessageDecoder
  * plugins): BSON/protobuf message bodies and the Confluent
  * schema-registry wire framing (magic 0x00 + int32 BE schema id
  * [+ zigzag message-indexes for protobuf]). Decoders run over the
  * Kafka record shape, so these batch DataFrames exercise exactly the
  * code a readStream feeds. */
class MessageDecodersSpec extends SparkSpec {

  import WireTestEncoders._

  private val ts0 = new Timestamp(1700000000000L)

  private def records(values: Seq[Array[Byte]]) = {
    import scala.jdk.CollectionConverters._
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row(null, v, "t", 0, i.toLong, ts0, 0)
    }
    spark.createDataFrame(rows.asJava, graft.streaming.KafkaSource.RecordSchema)
  }

  test("decodeBson: one BSON document per message, _ingest_ts kept") {
    val docs = (1 to 5).map(i => bsonDoc(
      bsonElem(0x12, "id", le64(i.toLong)),
      bsonElem(0x02, "name", bsonString(s"m$i"))))
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val out = MessageDecoders.decodeBson(records(docs), schema)
      .orderBy("id").collect()
    assert(out.length == 5)
    assert(out(0) == Row(1L, "m1", ts0))
    assert(out(4) == Row(5L, "m5", ts0))
  }

  test("decodeProto: descriptor-set decode of bare message bodies") {
    val msgs = (1 to 4).map(i => pbVarint(1, i.toLong) ++ pbString(2, s"e$i"))
    val out = MessageDecoders.decodeProto(records(msgs), eventDescriptorSet)
      .selectExpr("id", "name", "color", "_ingest_ts").orderBy("id").collect()
    assert(out.length == 4)
    assert(out(0) == Row(1L, "e1", "RED", ts0)) // unset enum → default RED
  }

  test("confluent framing: schema id, optimized [0] indexes, explicit path") {
    val f0 = MessageDecoders.confluentFrame(
      confluentProtoFrame(7, Seq(0), Array[Byte](1, 2)), withIndexes = true)
    assert(f0 == MessageDecoders.ConfluentFrame(7, Seq(0), 6))
    val f1 = MessageDecoders.confluentFrame(
      confluentProtoFrame(300, Seq(1, 0), Array[Byte](9)), withIndexes = true)
    assert(f1.schemaId == 300 && f1.indexes == Seq(1, 0))
    val av = MessageDecoders.confluentFrame(
      confluentFrame(12, Array[Byte](5)), withIndexes = false)
    assert(av == MessageDecoders.ConfluentFrame(12, Nil, 5))
    intercept[IllegalArgumentException] {
      MessageDecoders.confluentFrame(Array[Byte](1, 0, 0, 0, 1), withIndexes = false)
    }
  }

  test("message-indexes resolve declaration order, incl. nested types") {
    val pool = WireProto.parseDescriptorSet(eventDescriptorSet)
    assert(pool.resolveIndexes(Seq(0)) == ".t.Event")
    assert(pool.resolveIndexes(Seq(1)) == ".t.Nested")
    assert(pool.resolveIndexes(Seq(0, 0)) == ".t.Event.AttrsEntry")
  }

  test("decodeConfluentProto: registry lookup + index path + payload decode") {
    val schema = WireProto.sparkSchema(".t.Event", WireProto.parseDescriptorSet(eventDescriptorSet))
    val frames = (1 to 3).map(i => confluentProtoFrame(42, Seq(0),
      pbVarint(1, i.toLong) ++ pbString(2, s"c$i") ++ pbVarint(5, 1)))
    val out = MessageDecoders.decodeConfluentProto(
      records(frames), Map(42 -> eventDescriptorSet), schema)
      .selectExpr("id", "name", "color").orderBy("id").collect()
    assert(out.toSeq == Seq(Row(1L, "c1", "BLUE"), Row(2L, "c2", "BLUE"), Row(3L, "c3", "BLUE")))
  }

  test("decodeConfluentAvro: id → writer schema, avro binary body") {
    val avroSchema =
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    // avro binary: long = zigzag varint, string = zigzag varint len + utf8
    def avroBody(id: Long, name: String): Array[Byte] = {
      val zig = (v: Long) => varint((v << 1) ^ (v >> 63))
      zig(id) ++ zig(name.length.toLong) ++ name.getBytes("UTF-8")
    }
    val frames = Seq(confluentFrame(9, avroBody(10L, "x")), confluentFrame(9, avroBody(11L, "y")))
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val out = MessageDecoders.decodeConfluentAvro(records(frames), Map(9 -> avroSchema), schema)
      .selectExpr("id", "name").orderBy("id").collect()
    assert(out.toSeq == Seq(Row(10L, "x"), Row(11L, "y")))
  }

  test("decodeConfluentJson: 5-byte header stripped, then plain JSON decode") {
    val frames = Seq(confluentFrame(3, """{"id":1,"name":"j"}""".getBytes("UTF-8")))
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val out = MessageDecoders.decodeConfluentJson(records(frames), schema).collect()
    assert(out.toSeq == Seq(Row(1L, "j", ts0)))
  }

  test("end-to-end: socket kafka broker → confluent-protobuf decode → typed rows") {
    // the full reference ingestion chain (kafka consumer +
    // KafkaConfluentSchemaRegistryProtoBufMessageDecoder) with zero
    // external deps: wire-protocol broker over a real socket,
    // Confluent-framed protobuf payloads, streaming decode.
    import graft.streaming.{KafkaSocketSourceProvider, KafkaWire, KafkaWireBroker, KafkaWireClient}
    val broker = new KafkaWireBroker(numPartitions = 1).start()
    try {
      val producer = new KafkaWireClient("127.0.0.1", broker.port, "producer")
      (1 to 6).foreach { i =>
        val payload = pbVarint(1, i.toLong) ++ pbString(2, s"ev$i") ++ pbVarint(5, i % 2)
        producer.produce("pb_topic", 0, Seq(KafkaWire.Record(
          null, confluentProtoFrame(7, Seq(0), payload), 1700000000000L + i)))
      }
      val schema = WireProto.sparkSchema(".t.Event",
        WireProto.parseDescriptorSet(eventDescriptorSet))
      val records = spark.readStream
        .format(classOf[KafkaSocketSourceProvider].getName)
        .option("brokers", s"127.0.0.1:${broker.port}")
        .option("topic", "pb_topic")
        .load()
      val decoded = MessageDecoders.decodeConfluentProto(
        records, Map(7 -> eventDescriptorSet), schema)
      val q = decoded.selectExpr("id", "name", "color")
        .writeStream.format("memory").queryName("md_sock")
        .outputMode("append").start()
      q.processAllAvailable()
      val got = spark.table("md_sock").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      q.stop()
      producer.close()
      assert(got.length == 6)
      assert(got(0) == ((1L, "ev1", "BLUE")))
      assert(got(1) == ((2L, "ev2", "RED")))
      assert(got(5) == ((6L, "ev6", "RED")))
    } finally broker.close()
  }

  test("decoders run on a real stream (rate-shaped memory of kafka records)") {
    // mapPartitions-based decode must be streaming-legal: run one
    // micro-batch through a MemoryStream with the Kafka record shape.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], Long)]
    val recordsDf = mem.toDF().toDF("value", "ts_ms")
      .selectExpr("value", "timestamp_millis(ts_ms) AS timestamp")
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val decoded = MessageDecoders.decodeBson(recordsDf, schema)
    val q = decoded.writeStream.format("memory").queryName("md_stream")
      .outputMode("append").start()
    mem.addData((bsonDoc(bsonElem(0x12, "id", le64(77L)),
      bsonElem(0x02, "name", bsonString("s"))), ts0.getTime))
    q.processAllAvailable()
    val got = spark.table("md_stream").collect()
    q.stop()
    assert(got.toSeq == Seq(Row(77L, "s", ts0)))
  }
}
