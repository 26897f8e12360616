package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Test-side wire encoders — independent re-implementations used to
  * build corpora for the decoder specs (the decoders themselves are
  * additionally pinned by published canonical byte vectors). */
object WireTestEncoders {

  def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  def le64(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
  def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  // --- BSON ---
  def bsonElem(t: Int, name: String, payload: Array[Byte]): Array[Byte] =
    Array(t.toByte) ++ name.getBytes(StandardCharsets.UTF_8) ++ Array(0.toByte) ++ payload
  def bsonString(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    le32(b.length + 1) ++ b ++ Array(0.toByte)
  }
  def bsonDoc(elems: Array[Byte]*): Array[Byte] = {
    val body = elems.flatten.toArray
    le32(body.length + 5) ++ body ++ Array(0.toByte)
  }

  // --- protobuf ---
  def varint(v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
    out.toByteArray
  }
  /** Kafka ByteUtils zigzag varint (Confluent message-indexes). */
  def zigVarint(v: Int): Array[Byte] = varint(((v.toLong << 1) ^ (v.toLong >> 63)) & 0xFFFFFFFFL)
  def pbTag(field: Int, wt: Int): Array[Byte] = varint((field.toLong << 3) | wt)
  def pbVarint(field: Int, v: Long): Array[Byte] = pbTag(field, 0) ++ varint(v)
  def pbBytes(field: Int, b: Array[Byte]): Array[Byte] =
    pbTag(field, 2) ++ varint(b.length) ++ b
  def pbString(field: Int, s: String): Array[Byte] =
    pbBytes(field, s.getBytes(StandardCharsets.UTF_8))

  /** descriptor set for the spec's Event/Nested/Color schema (package
    * `t`, proto3) — hand-encoded per the public descriptor.proto. */
  def eventDescriptorSet: Array[Byte] = {
    val T = graft.sources.WireProto.T
    def field(name: String, num: Int, label: Int, tpe: Int,
        typeName: String = "", p3opt: Boolean = false): Array[Byte] = {
      val body = pbString(1, name) ++ pbVarint(3, num) ++ pbVarint(4, label) ++
        pbVarint(5, tpe) ++
        (if (typeName.nonEmpty) pbString(6, typeName) else Array.emptyByteArray) ++
        (if (p3opt) pbVarint(17, 1) else Array.emptyByteArray)
      pbBytes(2, body)
    }
    val mapEntry = pbBytes(3,
      pbString(1, "AttrsEntry") ++
        field("key", 1, 1, T.String) ++ field("value", 2, 1, T.Int64) ++
        pbBytes(7, pbVarint(7, 1)))
    val eventMsg = pbBytes(4,
      pbString(1, "Event") ++
        field("id", 1, 1, T.Int64) ++
        field("name", 2, 1, T.String) ++
        field("vals", 3, 3, T.Int32) ++
        field("sub", 4, 1, T.Message, ".t.Nested") ++
        field("color", 5, 1, T.Enum, ".t.Color") ++
        field("zz", 6, 1, T.SInt32) ++
        field("opt", 7, 1, T.Int32, p3opt = true) ++
        field("attrs", 8, 3, T.Message, ".t.Event.AttrsEntry") ++
        field("score", 9, 1, T.Double) ++
        field("raw", 10, 1, T.Bytes) ++
        mapEntry)
    val nestedMsg = pbBytes(4, pbString(1, "Nested") ++ field("tag", 1, 1, T.String))
    val colorEnum = pbBytes(5, pbString(1, "Color") ++
      pbBytes(2, pbString(1, "RED") ++ pbVarint(2, 0)) ++
      pbBytes(2, pbString(1, "BLUE") ++ pbVarint(2, 1)))
    val file = pbString(1, "t.proto") ++ pbString(2, "t") ++
      eventMsg ++ nestedMsg ++ colorEnum ++ pbString(12, "proto3")
    pbBytes(1, file)
  }

  // --- Confluent framing ---
  def confluentFrame(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    Array(0.toByte) ++ be32(schemaId) ++ payload
  def confluentProtoFrame(schemaId: Int, indexes: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val idx =
      if (indexes == Seq(0)) zigVarint(0) // the optimized single-0 form
      else zigVarint(indexes.length) ++ indexes.flatMap(zigVarint).toArray
    Array(0.toByte) ++ be32(schemaId) ++ idx ++ payload
  }
}
