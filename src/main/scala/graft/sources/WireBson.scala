package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** BSON input format, decoded from the public BSON spec (bsonspec.org)
  * with no driver dependency.
  *
  * Reference: apache/pinot BSON plugin
  * (`pinot-plugins/pinot-input-format/pinot-bson/.../BSONRecordReader.java:34`
  * — a BSON *file* is a concatenation of framed documents, each
  * self-delimited by its leading little-endian int32 length, the
  * `mongodump` layout; GZIP-compressed files supported;
  * `BSONRecordExtractor.java:39` — the type-mapping contract this
  * object mirrors:
  *   double/int32/int64/boolean/string pass through; embedded document
  *   → Map; array → Object[]; ObjectId → 24-char hex String; UTC
  *   datetime → java.sql.Timestamp; Decimal128 → BigDecimal with
  *   NaN/±Infinity → null and negative zero → ZERO; the internal
  *   replication Timestamp → java.sql.Timestamp at second granularity
  *   with the seconds field read UNSIGNED (correct past 2038), ordinal
  *   dropped; Binary (all subtypes, incl. the UUID ones) → raw bytes;
  *   null → null; every other type → a pinned string rendering).
  *
  * Scale design: files are the parallelism unit (a dump directory has
  * one file per collection chunk); each executor streams its file
  * through the frame reader without materializing the whole file, so a
  * 100 TB dump ingests as one `binaryFiles` scan with per-file
  * streaming decode — the same shape as the reference's one
  * RecordReader per input file.
  */
object WireBson {

  /** Bounds from the reference reader (`BSONRecordReader.java:41-46`):
    * an empty document is 5 bytes (int32 length + NUL terminator);
    * MongoDB caps documents at 16 MB, and without the cap a corrupt
    * length prefix would over-allocate. */
  private val MinDocLen = 5
  private val MaxDocLen = 16 * 1024 * 1024

  // ---------------------------------------------------------------------
  // Document decode (spec: document ::= int32 e_list "\x00")
  // ---------------------------------------------------------------------

  /** Decode one BSON document from `bytes(off until off+len)` into an
    * insertion-ordered field map with the type mapping documented above. */
  def decodeDocument(bytes: Array[Byte], off: Int, len: Int): Seq[(String, Any)] = {
    val in = new BsonCursor(bytes, off, off + len)
    val declared = in.readInt32()
    require(declared == len, s"BSON length prefix $declared != frame $len")
    readElements(in)
  }

  def decodeDocument(bytes: Array[Byte]): Seq[(String, Any)] =
    decodeDocument(bytes, 0, bytes.length)

  private final class BsonCursor(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def readInt32(): Int = {
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readInt64(): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
      pos += 8; v
    }
    def readCString(): String = {
      val start = pos
      while (bytes(pos) != 0) pos += 1
      val s = new String(bytes, start, pos - start, StandardCharsets.UTF_8)
      pos += 1; s
    }
    /** string ::= int32 (byte*) "\x00" — length counts the NUL. */
    def readString(): String = {
      val n = readInt32()
      val s = new String(bytes, pos, n - 1, StandardCharsets.UTF_8)
      pos += n; s
    }
    def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
  }

  private def readElements(in: BsonCursor): Seq[(String, Any)] = {
    val out = Seq.newBuilder[(String, Any)]
    var t = in.u8()
    while (t != 0x00) {
      val name = in.readCString()
      out += name -> readValue(in, t)
      t = in.u8()
    }
    out.result()
  }

  private def readValue(in: BsonCursor, t: Int): Any = t match {
    case 0x01 => java.lang.Double.longBitsToDouble(in.readInt64())
    case 0x02 => in.readString()
    case 0x03 => // embedded document → ordered Map
      val len = in.readInt32()
      val inner = new BsonCursor(in.bytes, in.pos, in.pos + len - 4)
      in.pos += len - 4
      scala.collection.immutable.ListMap(readElements(inner): _*)
    case 0x04 => // array: a document keyed "0","1",… — keep document order
      val len = in.readInt32()
      val inner = new BsonCursor(in.bytes, in.pos, in.pos + len - 4)
      in.pos += len - 4
      readElements(inner).map(_._2).toArray
    case 0x05 => // binary: int32 len, subtype, bytes; subtype 0x02 ("old
      // binary") wraps the payload in one more int32 length, stripped
      // here the way drivers do
      val n = in.readInt32()
      val subtype = in.u8()
      if (subtype == 0x02 && n >= 4) { in.readInt32(); in.take(n - 4) }
      else in.take(n)
    case 0x06 => "undefined" // deprecated Undefined — pinned rendering
    case 0x07 => // ObjectId: 12 bytes → 24-char hex
      in.take(12).map(b => f"${b & 0xff}%02x").mkString
    case 0x08 => in.u8() != 0
    case 0x09 => new Timestamp(in.readInt64()) // UTC datetime, millis
    case 0x0A => null
    case 0x0B => // regex → pinned "/pattern/options" rendering
      val pat = in.readCString(); val opts = in.readCString()
      s"/$pat/$opts"
    case 0x0C => // deprecated DBPointer → "ns:hexid"
      val ns = in.readString()
      val id = in.take(12).map(b => f"${b & 0xff}%02x").mkString
      s"$ns:$id"
    case 0x0D => in.readString() // JavaScript code → the code string
    case 0x0E => in.readString() // deprecated Symbol → its string
    case 0x0F => // code_w_scope: int32 total, string code, document scope
      in.readInt32()
      val code = in.readString()
      val len = in.readInt32()
      in.pos += len - 4 // scope dropped from the rendering
      code
    case 0x10 => in.readInt32()
    case 0x11 => // internal replication Timestamp: uint32 ordinal (low),
      // uint32 seconds (high) — seconds read UNSIGNED so 2038+ is correct;
      // the ordinal cannot live in a Timestamp and is dropped
      val raw = in.readInt64()
      new Timestamp(((raw >>> 32) & 0xFFFFFFFFL) * 1000L)
    case 0x12 => in.readInt64()
    case 0x13 => // decimal128, little-endian: low64 then high64
      val low = in.readInt64(); val high = in.readInt64()
      decodeDecimal128(high, low)
    case 0xFF => "MinKey"
    case 0x7F => "MaxKey"
    case other => throw new IllegalArgumentException(f"unknown BSON type 0x$other%02x")
  }

  /** IEEE 754-2008 decimal128 (BID encoding) → BigDecimal.
    * NaN / ±Infinity → null (no BigDecimal representation); negative
    * zero → BigDecimal.ZERO — both per the reference extractor's
    * documented contract (`BSONRecordExtractor.java:45-47,104-117`). */
  private[sources] def decodeDecimal128(high: Long, low: Long): JBigDecimal = {
    val ExponentBias = 6176
    if ((high & 0x7C00000000000000L) == 0x7C00000000000000L) return null // NaN
    if ((high & 0x7800000000000000L) == 0x7800000000000000L) return null // ±Inf
    val negative = high < 0
    val (exponent, sigHigh) =
      if ((high & 0x6000000000000000L) == 0x6000000000000000L)
        // "11" combination: coefficient would exceed 34 digits — every such
        // encoding is non-canonical and decodes to zero at its exponent
        ((((high >>> 47) & 0x3FFF).toInt - ExponentBias), 0L)
      else ((((high >>> 49) & 0x3FFF).toInt - ExponentBias), high & 0x0001FFFFFFFFFFFFL)
    val buf = java.nio.ByteBuffer.allocate(16)
    buf.putLong(sigHigh).putLong(low)
    val unscaled = new BigInteger(if (negative) -1 else 1, buf.array())
    if (unscaled.signum() == 0 && negative) JBigDecimal.ZERO
    else new JBigDecimal(unscaled, -exponent)
  }

  // ---------------------------------------------------------------------
  // Framed-file reader (mongodump layout)
  // ---------------------------------------------------------------------

  /** Stream framed documents off an InputStream: each frame is a
    * little-endian int32 total length (validated against the 5-byte /
    * 16 MB bounds) followed by the rest of the document. GZIP streams
    * are detected by magic and unwrapped. */
  def frames(raw: InputStream): Iterator[Array[Byte]] = {
    val buffered = new BufferedInputStream(raw)
    buffered.mark(2)
    val m0 = buffered.read(); val m1 = buffered.read()
    buffered.reset()
    val in = new DataInputStream(
      if (m0 == 0x1f && m1 == 0x8b) new BufferedInputStream(new GZIPInputStream(buffered))
      else buffered)

    new Iterator[Array[Byte]] {
      private var nextDoc: Array[Byte] = fetch()
      private def fetch(): Array[Byte] = {
        val b0 = in.read()
        if (b0 < 0) return null
        val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
        if (b3 < 0) throw new EOFException("truncated BSON length prefix")
        val len = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        require(len >= MinDocLen && len <= MaxDocLen, s"invalid BSON document length $len")
        val doc = new Array[Byte](len)
        doc(0) = b0.toByte; doc(1) = b1.toByte; doc(2) = b2.toByte; doc(3) = b3.toByte
        in.readFully(doc, 4, len - 4)
        doc
      }
      override def hasNext: Boolean = nextDoc != null
      override def next(): Array[Byte] = {
        val d = nextDoc; nextDoc = fetch(); d
      }
    }
  }

  // ---------------------------------------------------------------------
  // Spark integration
  // ---------------------------------------------------------------------

  /** Read a directory/glob of framed BSON files into a DataFrame with the
    * given explicit schema (Pinot schemas are always explicit). Fields
    * are extracted from the top-level document by name and coerced to
    * the declared Spark type; missing fields → null. One Spark input
    * partition per file; decode streams. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val stream = pds.open()
      frames(stream).map { doc =>
        val fields = scala.collection.immutable.ListMap(decodeDocument(doc): _*)
        WireCoerce.toRow(fields, schema)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
