package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Kafka wire-protocol codec — the public binary protocol
  * (kafka.apache.org/protocol) at the pre-flexible API versions whose
  * layouts are fixed-width and stable: Produce v0 (api key 0),
  * Fetch v0 (1), ListOffsets v0 (2), Metadata v0 (3), ApiVersions v0
  * (18), and the magic-1 MessageSet record format (offset, size, crc,
  * magic, attributes, timestamp, key, value; CRC32 over magic..value).
  * Everything is big-endian; strings are int16-length-prefixed,
  * byte blobs int32-length-prefixed, arrays int32-counted — exactly
  * the framing a real broker or client of these versions emits.
  *
  * This codec backs both sides of the engine's socket path: the
  * in-process broker ([[KafkaWireBroker]]) serving the topic log and
  * the streaming source's client ([[KafkaWireClient]]) — the
  * reference's `KafkaPartitionLevelConnectionHandler.java` role. The
  * container ships no Kafka jars, so both ends are implemented here;
  * the bytes on the socket are the protocol's.
  */
object KafkaWire {

  val ApiProduce: Short = 0
  val ApiFetch: Short = 1
  val ApiListOffsets: Short = 2
  val ApiMetadata: Short = 3
  val ApiVersions: Short = 18

  val EarliestTs: Long = -2L
  val LatestTs: Long = -1L

  final case class Record(key: Array[Byte], value: Array[Byte],
      timestampMs: Long, offset: Long = -1L)

  // ---- primitive writers over a growable buffer ----
  final class Writer {
    private var buf = ByteBuffer.allocate(256)
    private def ensure(n: Int): Unit =
      if (buf.remaining < n) {
        val grown = ByteBuffer.allocate(math.max(buf.capacity * 2,
          buf.position() + n))
        buf.flip()
        grown.put(buf)
        buf = grown
      }
    def i8(v: Byte): Writer = { ensure(1); buf.put(v); this }
    def i16(v: Short): Writer = { ensure(2); buf.putShort(v); this }
    def i32(v: Int): Writer = { ensure(4); buf.putInt(v); this }
    def i64(v: Long): Writer = { ensure(8); buf.putLong(v); this }
    def raw(b: Array[Byte]): Writer = { ensure(b.length); buf.put(b); this }
    def str(s: String): Writer =
      if (s == null) i16(-1)
      else {
        val b = s.getBytes("UTF-8")
        i16(b.length.toShort).raw(b)
      }
    def bytes(b: Array[Byte]): Writer =
      if (b == null) i32(-1) else i32(b.length).raw(b)
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  final class Reader(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes)
    def i8(): Byte = bb.get()
    def i16(): Short = bb.getShort()
    def i32(): Int = bb.getInt()
    def i64(): Long = bb.getLong()
    def str(): String = {
      val n = bb.getShort()
      if (n < 0) null
      else {
        val b = new Array[Byte](n)
        bb.get(b)
        new String(b, "UTF-8")
      }
    }
    def blob(): Array[Byte] = {
      val n = bb.getInt()
      if (n < 0) null
      else {
        val b = new Array[Byte](n)
        bb.get(b)
        b
      }
    }
    def raw(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      bb.get(b)
      b
    }
    def remaining: Int = bb.remaining
  }

  // ---- framing ----
  /** [int32 size][payload] */
  def writeFrame(out: DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
  }

  def readFrame(in: DataInputStream): Array[Byte] = {
    val size = in.readInt()
    require(size >= 0 && size <= (64 << 20), s"bad frame size $size")
    val b = new Array[Byte](size)
    in.readFully(b)
    b
  }

  /** Request header (v1): api_key, api_version, correlation_id,
    * client_id. */
  final case class RequestHeader(apiKey: Short, apiVersion: Short,
      correlationId: Int, clientId: String)

  def readRequestHeader(r: Reader): RequestHeader =
    RequestHeader(r.i16(), r.i16(), r.i32(), r.str())

  def writeRequestHeader(w: Writer, h: RequestHeader): Unit = {
    w.i16(h.apiKey).i16(h.apiVersion).i32(h.correlationId).str(h.clientId)
    ()
  }

  // ---- magic-1 MessageSet ----
  /** Encode records as a v1 MessageSet with the given base offsets
    * (each record's `offset` field is used verbatim). */
  def encodeMessageSet(records: Seq[Record]): Array[Byte] = {
    val w = new Writer
    records.foreach { rec =>
      val body = new Writer
      body.i8(1) // magic 1
      body.i8(0) // attributes: no compression
      body.i64(rec.timestampMs)
      body.bytes(rec.key)
      body.bytes(rec.value)
      val bodyBytes = body.result()
      val crc = new CRC32
      crc.update(bodyBytes)
      w.i64(rec.offset)
      w.i32(4 + bodyBytes.length) // message size: crc + body
      w.i32(crc.getValue.toInt)
      w.raw(bodyBytes)
    }
    w.result()
  }

  /** Decode a v1 (or v0) MessageSet; tolerates a trailing partial
    * message (the protocol allows brokers to return one). */
  def decodeMessageSet(bytes: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    val bb = ByteBuffer.wrap(bytes)
    var ok = true
    while (ok && bb.remaining >= 12) {
      val offset = bb.getLong()
      val size = bb.getInt()
      if (size < 0 || bb.remaining < size) ok = false
      else {
        val msg = new Array[Byte](size)
        bb.get(msg)
        val m = ByteBuffer.wrap(msg)
        val storedCrc = m.getInt()
        val crc = new CRC32
        crc.update(msg, 4, msg.length - 4)
        require(crc.getValue.toInt == storedCrc,
          s"CRC mismatch at offset $offset")
        val magic = m.get()
        m.get() // attributes
        val ts = if (magic >= 1) m.getLong() else -1L
        def blob(): Array[Byte] = {
          val n = m.getInt()
          if (n < 0) null
          else {
            val b = new Array[Byte](n)
            m.get(b)
            b
          }
        }
        out += Record(blob(), blob(), ts, offset)
      }
    }
    out.result()
  }
}
