package graft

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.math.{BigDecimal => JBigDecimal}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp
import java.util.zip.GZIPOutputStream

import graft.sources.{ArrowIngest, WireBson, WireProto, WireThrift}
import org.apache.spark.sql.types._

/** Wire-level input formats built from the public specs — BSON
  * (bsonspec.org), protobuf (protobuf.dev encoding), thrift binary
  * protocol (THRIFT-110), arrow IPC — mirroring the reference's
  * pinot-input-format plugins (bson/protobuf/thrift/arrow). Golden
  * byte vectors are the published canonical examples, so the decoders
  * are pinned to the specs rather than to our own encoders. */
class WireFormatsSpec extends SparkSpec {

  import WireTestEncoders._

  // --------------------------------------------------------------------
  // BSON
  // --------------------------------------------------------------------

  test("BSON: the bsonspec.org canonical hello-world document decodes") {
    // {"hello": "world"} — the published example on bsonspec.org
    val bytes = Array[Int](
      0x16, 0x00, 0x00, 0x00, 0x02, 'h', 'e', 'l', 'l', 'o', 0x00,
      0x06, 0x00, 0x00, 0x00, 'w', 'o', 'r', 'l', 'd', 0x00, 0x00).map(_.toByte)
    assert(WireBson.decodeDocument(bytes) == Seq("hello" -> "world"))
  }

  test("BSON: full type matrix decodes per the reference extractor contract") {
    val oid = (1 to 12).map(_.toByte).toArray
    val doc = bsonDoc(
      bsonElem(0x01, "dbl", le64(java.lang.Double.doubleToLongBits(2.5))),
      bsonElem(0x02, "str", bsonString("héllo")),
      bsonElem(0x03, "sub", bsonDoc(bsonElem(0x10, "x", le32(7)))),
      bsonElem(0x04, "arr", bsonDoc(bsonElem(0x10, "0", le32(1)), bsonElem(0x10, "1", le32(2)))),
      bsonElem(0x05, "bin", le32(3) ++ Array(0.toByte) ++ Array[Byte](9, 8, 7)),
      bsonElem(0x05, "oldbin", le32(7) ++ Array(2.toByte) ++ le32(3) ++ Array[Byte](4, 5, 6)),
      bsonElem(0x07, "oid", oid),
      bsonElem(0x08, "flag", Array(1.toByte)),
      bsonElem(0x09, "dt", le64(1700000000123L)),
      bsonElem(0x0A, "nul", Array.emptyByteArray),
      bsonElem(0x0B, "re", "ab*".getBytes ++ Array(0.toByte) ++ "i".getBytes ++ Array(0.toByte)),
      bsonElem(0x10, "i32", le32(-5)),
      // replication Timestamp: seconds 0x90000000 (unsigned, past 2038), ordinal 3
      bsonElem(0x11, "ts", le64((0x90000000L << 32) | 3L)),
      bsonElem(0x12, "i64", le64(1L << 40)),
      bsonElem(0xFF, "mink", Array.emptyByteArray))
    val m = WireBson.decodeDocument(doc).toMap
    assert(m("dbl") == 2.5)
    assert(m("str") == "héllo")
    assert(m("sub") == Map("x" -> 7))
    assert(m("arr").asInstanceOf[Array[Any]].toSeq == Seq(1, 2))
    assert(m("bin").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9, 8, 7))
    // old-binary subtype 0x02: the inner int32 length wrapper is stripped
    assert(m("oldbin").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](4, 5, 6))
    assert(m("oid") == "0102030405060708090a0b0c")
    assert(m("flag") == true)
    assert(m("dt") == new Timestamp(1700000000123L))
    assert(m("nul") == null)
    assert(m("re") == "/ab*/i")
    assert(m("i32") == -5)
    // unsigned seconds * 1000, ordinal dropped — correct past 2038
    assert(m("ts") == new Timestamp(0x90000000L * 1000L))
    assert(m("i64") == (1L << 40))
    assert(m("mink") == "MinKey")
  }

  test("BSON: decimal128 — value, NaN/Infinity → null, negative zero → ZERO") {
    def dec(high: Long, low: Long): Array[Byte] =
      bsonDoc(bsonElem(0x13, "d", le64(low) ++ le64(high)))
    def get(high: Long, low: Long): Any = WireBson.decodeDocument(dec(high, low)).head._2
    // 1 at exponent 0: biased exponent 6176 → high = 6176L << 49
    assert(get(6176L << 49, 1L) == new JBigDecimal("1"))
    // 1.5 = 15 × 10^-1: exponent -1 → bias 6175
    assert(get(6175L << 49, 15L) == new JBigDecimal("1.5"))
    // negative: sign bit set
    assert(get((6176L << 49) | Long.MinValue, 42L) == new JBigDecimal("-42"))
    // NaN (combination 11111) and +Inf (11110) → null
    assert(get(0x7C00000000000000L, 0L) == null)
    assert(get(0x7800000000000000L, 0L) == null)
    // negative zero → ZERO (reference BSONRecordExtractor.java:112-117)
    assert(get((6176L << 49) | Long.MinValue, 0L) == JBigDecimal.ZERO)
  }

  test("BSON: framed mongodump file reads end-to-end through Spark, incl. gzip") {
    val dir = Files.createTempDirectory("graft_bson").toString
    val docs = (1 to 50).map { i =>
      bsonDoc(
        bsonElem(0x12, "id", le64(i.toLong)),
        bsonElem(0x02, "name", bsonString(s"doc$i")),
        bsonElem(0x01, "score", le64(java.lang.Double.doubleToLongBits(i / 2.0))))
    }
    val plain = new FileOutputStream(s"$dir/a.bson")
    docs.take(30).foreach(plain.write); plain.close()
    val gz = new GZIPOutputStream(new FileOutputStream(s"$dir/b.bson.gz"))
    docs.drop(30).foreach(gz.write); gz.close()

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = WireBson.read(spark, s"$dir/*", schema)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == 50)
    assert(rows(0) == ((1L, "doc1", 0.5)))
    assert(rows(49) == ((50L, "doc50", 25.0)))
  }

  test("BSON: corrupt length prefix is rejected by the 5-byte/16MB bounds") {
    val bogus = le32(Int.MaxValue) ++ Array[Byte](0)
    val ex = intercept[Exception] {
      WireBson.frames(new java.io.ByteArrayInputStream(bogus)).toList
    }
    assert(ex.getMessage.contains("invalid BSON document length"))
  }

  // --------------------------------------------------------------------
  // Protobuf
  // --------------------------------------------------------------------

  /** descriptor set for:
    *   syntax proto3; package t;
    *   message Event { int64 id=1; string name=2; repeated int32 vals=3;
    *     Nested sub=4; Color color=5; sint32 zz=6; optional int32 opt=7;
    *     map<string,int64> attrs=8; double score=9; bytes raw=10; }
    *   message Nested { string tag=1; }
    *   enum Color { RED=0; BLUE=1; }
    * hand-encoded per the public descriptor.proto field numbers. */
  private def descriptorSet: Array[Byte] = eventDescriptorSet

  test("protobuf: the protobuf.dev canonical varint example decodes (08 96 01 = field 1, 150)") {
    assert(WireProto.rawFields(Array[Byte](0x08, 0x96.toByte, 0x01)) == Seq((1, 0, 150L)))
  }

  test("protobuf: descriptor bootstrap + full decode with presence semantics") {
    val pool = WireProto.parseDescriptorSet(descriptorSet)
    assert(pool.proto3)
    assert(pool.firstMessage == ".t.Event")
    assert(pool.messages(".t.Event.AttrsEntry").mapEntry)
    assert(pool.enums(".t.Color").values == Map(0 -> "RED", 1 -> "BLUE"))

    val msgBytes =
      pbVarint(1, 42L) ++ pbString(2, "ev") ++
        pbBytes(3, varint(3) ++ varint(300) ++ varint(5)) ++ // packed repeated
        pbVarint(3, 9) ++ // plus one unpacked occurrence — merges
        pbBytes(4, pbString(1, "inner")) ++
        pbVarint(5, 1) ++ // BLUE
        pbVarint(6, varintZig(-7)) ++
        pbBytes(8, pbString(1, "k1") ++ pbVarint(2, 10L)) ++
        pbBytes(8, pbString(1, "k2") ++ pbVarint(2, 20L)) ++
        pbTag(9, 1) ++ le64(java.lang.Double.doubleToLongBits(1.25)) ++
        pbBytes(10, Array[Byte](1, 2))
    val m = WireProto.decodeMessage(msgBytes, pool.messages(".t.Event"), pool)
    assert(m("id") == 42L)
    assert(m("name") == "ev")
    assert(m("vals").asInstanceOf[Array[Any]].toSeq == Seq(3, 300, 5, 9))
    assert(m("sub") == Map("tag" -> "inner"))
    assert(m("color") == "BLUE")
    assert(m("zz") == -7)
    assert(m("opt") == null) // proto3 optional, unset → null (presence)
    assert(m("attrs") == Map("k1" -> 10L, "k2" -> 20L))
    assert(m("score") == 1.25)
    assert(m("raw").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2))

    // unset fields WITHOUT presence → proto defaults; message → null
    val empty = WireProto.decodeMessage(Array.emptyByteArray, pool.messages(".t.Event"), pool)
    assert(empty("id") == 0L)
    assert(empty("name") == "")
    assert(empty("vals").asInstanceOf[Array[Any]].isEmpty)
    assert(empty("sub") == null)
    assert(empty("color") == "RED")
    assert(empty("opt") == null)
    assert(empty("attrs") == Map())
  }
  private def varintZig(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xFFFFFFFFL

  test("protobuf: --include_imports descriptor sets keep per-file syntax" +
      " and scope Confluent indexes to the last (registered) file") {
    // dependency file FIRST (protoc writes imports before the
    // requested file): proto2 `d.proto` with message Dep{int32 a=1}
    val T = WireProto.T
    val depField = pbBytes(2, pbString(1, "a") ++ pbVarint(3, 1) ++
      pbVarint(4, 1) ++ pbVarint(5, T.Int32))
    val depFile = pbBytes(1, pbString(1, "d.proto") ++ pbString(2, "d") ++
      pbBytes(4, pbString(1, "Dep") ++ depField)) // no syntax field ⇒ proto2
    val set = depFile ++ eventDescriptorSet // event file second (proto3)
    val pool = WireProto.parseDescriptorSet(set)
    // per-file presence semantics: proto2 singular scalar tracks
    // presence (absent → null); proto3 singular scalar defaults
    assert(pool.messages(".d.Dep").proto3 == false)
    assert(pool.messages(".t.Event").proto3 == true)
    val dep = WireProto.decodeMessage(Array.emptyByteArray,
      pool.messages(".d.Dep"), pool)
    assert(dep("a") == null)
    val ev = WireProto.decodeMessage(Array.emptyByteArray,
      pool.messages(".t.Event"), pool)
    assert(ev("id") == 0L)
    // Confluent message-indexes resolve against the registered (last)
    // file's top-level declarations, never an imported dependency's
    assert(pool.resolveIndexes(Seq(0)) == ".t.Event")
    assert(pool.resolveIndexes(Seq(1)) == ".t.Nested")
    assert(pool.proto3)
  }

  test("protobuf: delimited file reads end-to-end through Spark with the derived schema") {
    val dir = Files.createTempDirectory("graft_pb").toString
    val out = new FileOutputStream(s"$dir/events.pb")
    (1 to 40).foreach { i =>
      val msg = pbVarint(1, i.toLong) ++ pbString(2, s"e$i") ++
        pbTag(9, 1) ++ le64(java.lang.Double.doubleToLongBits(i * 0.5))
      out.write(varint(msg.length)); out.write(msg)
    }
    out.close()
    val df = WireProto.read(spark, s"$dir/*", descriptorSet)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("vals").dataType == ArrayType(IntegerType))
    assert(df.schema("attrs").dataType == MapType(StringType, LongType))
    assert(df.schema("sub").dataType.isInstanceOf[StructType])
    val rows = df.selectExpr("id", "name", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == 40)
    assert(rows(0) == ((1L, "e1", 0.5)))
    assert(rows(39) == ((40L, "e40", 20.0)))
  }

  // --------------------------------------------------------------------
  // Thrift
  // --------------------------------------------------------------------

  import WireThrift._

  private def tStruct(out: DataOutputStream)(body: => Unit): Unit = { body; out.writeByte(0) }
  private def tField(out: DataOutputStream, t: Int, id: Int): Unit = {
    out.writeByte(t); out.writeShort(id)
  }
  private def tString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8); out.writeInt(b.length); out.write(b)
  }

  private val personSchema = TStruct(Seq(
    TField(1, "id", TPrim(TT.I32)),
    TField(2, "name", TPrim(TT.Str)),
    TField(3, "scores", TList(TPrim(TT.I64))),
    TField(4, "tags", TMapT(TPrim(TT.Str), TPrim(TT.Str))),
    TField(5, "home", TStruct(Seq(TField(1, "city", TPrim(TT.Str))))),
    TField(6, "active", TPrim(TT.Bool))))

  private def writePerson(out: DataOutputStream, id: Int, name: String): Unit =
    tStruct(out) {
      tField(out, TT.I32, 1); out.writeInt(id)
      tField(out, TT.Str, 2); tString(out, name)
      tField(out, TT.List, 3); out.writeByte(TT.I64); out.writeInt(2)
      out.writeLong(id * 10L); out.writeLong(id * 20L)
      tField(out, TT.Map, 4); out.writeByte(TT.Str); out.writeByte(TT.Str)
      out.writeInt(1); tString(out, "k"); tString(out, s"v$id")
      tField(out, TT.Struct, 5)
      tStruct(out) { tField(out, TT.Str, 1); tString(out, "here") }
      // an unknown field (id 99, double) the schema must skip
      tField(out, TT.Double, 99); out.writeDouble(3.14)
      tField(out, TT.Bool, 6); out.writeByte(1)
    }

  test("thrift: binary-protocol struct decodes; unknown fields skip") {
    val buf = new ByteArrayOutputStream()
    writePerson(new DataOutputStream(buf), 7, "ada")
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(buf.toByteArray))
    val m = readStruct(in, personSchema)
    assert(m("id") == 7)
    assert(m("name") == "ada")
    assert(m("scores").asInstanceOf[Array[Any]].toSeq == Seq(70L, 140L))
    assert(m("tags") == Map("k" -> "v7"))
    assert(m("home") == Map("city" -> "here"))
    assert(m("active") == true)
    assert(in.read() == -1) // fully consumed, incl. the skipped field
  }

  test("thrift: back-to-back struct file reads end-to-end through Spark") {
    val dir = Files.createTempDirectory("graft_thrift").toString
    val out = new DataOutputStream(new FileOutputStream(s"$dir/people.thrift"))
    (1 to 25).foreach(i => writePerson(out, i, s"p$i"))
    out.close()
    val df = WireThrift.read(spark, s"$dir/*", personSchema)
    assert(df.schema("scores").dataType == ArrayType(LongType))
    assert(df.schema("home").dataType.isInstanceOf[StructType])
    val rows = df.selectExpr("id", "name", "home.city", "active").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getBoolean(3))).sortBy(_._1)
    assert(rows.length == 25)
    assert(rows(0) == ((1, "p1", "here", true)))
  }

  // --------------------------------------------------------------------
  // Arrow
  // --------------------------------------------------------------------

  test("arrow: IPC file with two batches reads end-to-end through Spark") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import scala.jdk.CollectionConverters._

    val dir = Files.createTempDirectory("graft_arrow").toString
    val alloc = new RootAllocator(Long.MaxValue)
    val schema = new Schema(Seq(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("name", FieldType.nullable(new ArrowType.Utf8()), null),
      new Field("score", FieldType.nullable(
        new ArrowType.FloatingPoint(org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)), null)
    ).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val fos = new FileOutputStream(s"$dir/t.arrow")
    val writer = new ArrowFileWriter(root, null, fos.getChannel)
    writer.start()
    for (batch <- 0 until 2) {
      val ids = root.getVector("id").asInstanceOf[BigIntVector]
      val names = root.getVector("name").asInstanceOf[VarCharVector]
      val scores = root.getVector("score").asInstanceOf[Float8Vector]
      root.allocateNew()
      for (i <- 0 until 10) {
        val v = batch * 10 + i
        ids.setSafe(i, v.toLong)
        if (v == 3) names.setNull(i)
        else names.setSafe(i, s"row$v".getBytes(StandardCharsets.UTF_8))
        scores.setSafe(i, v * 1.5)
      }
      root.setRowCount(10)
      writer.writeBatch()
    }
    writer.end(); writer.close(); fos.close(); root.close(); alloc.close()

    val df = ArrowIngest.read(spark, s"$dir/*.arrow")
    assert(df.schema == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == 20)
    assert(rows(0) == ((0L, "row0", 0.0)))
    assert(rows(3)._2 == null) // the null slot survives
    assert(rows(19) == ((19L, "row19", 28.5)))
  }
}
