package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Thrift input format: TBinaryProtocol structs decoded from the public
  * wire format (thrift.apache.org, THRIFT-110 binary protocol spec)
  * with no libthrift dependency.
  *
  * Reference: apache/pinot thrift plugin
  * (`pinot-plugins/pinot-input-format/pinot-thrift/.../ThriftRecordReader.java:84`
  * — a thrift data file is a back-to-back sequence of
  * TBinaryProtocol-serialized structs read until EOF; the field-id →
  * name mapping comes from the generated class's metadata map, our
  * analog being an explicit [[TStruct]] schema, and
  * `ThriftRecordExtractor.java` converts nested structs to maps and
  * collections to arrays).
  *
  * Wire format (binary protocol): struct ::= (field-type:i8
  * field-id:i16 value)* stop:0x00; i32-length-prefixed strings; list/
  * set ::= elem-type:i8 size:i32 elems; map ::= key-type:i8
  * val-type:i8 size:i32 pairs. Unknown field ids are skipped by wire
  * type, so readers tolerate schema evolution the same way generated
  * thrift code does. */
object WireThrift {

  /** Thrift wire type ids (TType). */
  object TT {
    val Stop = 0; val Bool = 2; val Byte = 3; val Double = 4
    val I16 = 6; val I32 = 8; val I64 = 10; val Str = 11
    val Struct = 12; val Map = 13; val Set = 14; val List = 15
  }

  sealed trait TSchema { def wireType: Int }
  /** A primitive of the given TType; Str decodes as UTF-8 String,
    * use [[TBinary]] for raw bytes. */
  final case class TPrim(wireType: Int) extends TSchema
  case object TBinary extends TSchema { val wireType: Int = TT.Str }
  final case class TList(elem: TSchema) extends TSchema { val wireType: Int = TT.List }
  final case class TSet(elem: TSchema) extends TSchema { val wireType: Int = TT.Set }
  final case class TMapT(key: TSchema, value: TSchema) extends TSchema { val wireType: Int = TT.Map }
  final case class TStruct(fields: Seq[TField]) extends TSchema { val wireType: Int = TT.Struct }
  final case class TField(id: Short, name: String, tpe: TSchema)

  // ---------------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------------

  /** Decode one struct off the stream; returns null cleanly when the
    * stream is already at EOF (the end-of-file probe the reference
    * does with mark/read/reset). */
  def readStruct(in: DataInputStream, schema: TStruct): Map[String, Any] = {
    val first = in.read()
    if (first < 0) return null
    decodeStructBody(in, schema, first)
  }

  private def decodeStructBody(in: DataInputStream, schema: TStruct, firstType: Int): Map[String, Any] = {
    val byId = schema.fields.map(f => f.id -> f).toMap
    val out = collection.mutable.LinkedHashMap.empty[String, Any]
    schema.fields.foreach(f => out(f.name) = null)
    var t = firstType
    while (t != TT.Stop) {
      val id = in.readShort()
      byId.get(id) match {
        case Some(f) if f.tpe.wireType == t => out(f.name) = readValue(in, f.tpe)
        case _ => skip(in, t) // unknown or type-mismatched field id
      }
      t = in.readByte() & 0xff
    }
    out.toMap
  }

  private def readValue(in: DataInputStream, schema: TSchema): Any = schema match {
    case TPrim(TT.Bool) => in.readByte() != 0
    case TPrim(TT.Byte) => in.readByte()
    case TPrim(TT.Double) => in.readDouble()
    case TPrim(TT.I16) => in.readShort()
    case TPrim(TT.I32) => in.readInt()
    case TPrim(TT.I64) => in.readLong()
    case TPrim(TT.Str) =>
      new String(readRaw(in), StandardCharsets.UTF_8)
    case TBinary => readRaw(in)
    case TList(elem) => readSeq(in, elem)
    case TSet(elem) => readSeq(in, elem)
    case TMapT(k, v) =>
      val kt = in.readByte() & 0xff; val vt = in.readByte() & 0xff
      require(kt == k.wireType && vt == v.wireType,
        s"map wire types ($kt,$vt) != schema (${k.wireType},${v.wireType})")
      val n = in.readInt()
      (0 until n).map(_ => String.valueOf(readValue(in, k)) -> readValue(in, v)).toMap
    case s: TStruct => decodeStructBody(in, s, in.readByte() & 0xff)
    case TPrim(other) => throw new IllegalArgumentException(s"bad TType $other")
  }

  private def readSeq(in: DataInputStream, elem: TSchema): Array[Any] = {
    val et = in.readByte() & 0xff
    require(et == elem.wireType, s"element wire type $et != schema ${elem.wireType}")
    val n = in.readInt()
    Array.tabulate[Any](n)(_ => readValue(in, elem))
  }

  private def readRaw(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    val buf = new Array[Byte](n)
    in.readFully(buf)
    buf
  }

  /** Skip a value of the given wire type — mirrors TProtocolUtil.skip,
    * which is what lets thrift readers ignore unknown fields. */
  private def skip(in: DataInputStream, t: Int): Unit = t match {
    case TT.Bool | TT.Byte => in.readByte()
    case TT.Double | TT.I64 => in.skipBytes(8)
    case TT.I16 => in.skipBytes(2)
    case TT.I32 => in.skipBytes(4)
    case TT.Str => in.skipBytes(in.readInt())
    case TT.Struct =>
      var ft = in.readByte() & 0xff
      while (ft != TT.Stop) { in.readShort(); skip(in, ft); ft = in.readByte() & 0xff }
    case TT.Map =>
      val kt = in.readByte() & 0xff; val vt = in.readByte() & 0xff
      val n = in.readInt()
      (0 until n).foreach { _ => skip(in, kt); skip(in, vt) }
    case TT.Set | TT.List =>
      val et = in.readByte() & 0xff
      val n = in.readInt()
      (0 until n).foreach(_ => skip(in, et))
    case other => throw new IllegalArgumentException(s"cannot skip TType $other")
  }

  // ---------------------------------------------------------------------
  // Spark integration
  // ---------------------------------------------------------------------

  def sparkSchema(schema: TStruct): StructType =
    StructType(schema.fields.map(f => StructField(f.name, dataType(f.tpe), nullable = true)))

  private def dataType(s: TSchema): DataType = s match {
    case TPrim(TT.Bool) => BooleanType
    case TPrim(TT.Byte) => ByteType
    case TPrim(TT.Double) => DoubleType
    case TPrim(TT.I16) => ShortType
    case TPrim(TT.I32) => IntegerType
    case TPrim(TT.I64) => LongType
    case TPrim(TT.Str) => StringType
    case TBinary => BinaryType
    case TList(e) => ArrayType(dataType(e))
    case TSet(e) => ArrayType(dataType(e))
    case TMapT(_, v) => MapType(StringType, dataType(v))
    case st: TStruct => sparkSchema(st)
    case TPrim(other) => throw new IllegalArgumentException(s"bad TType $other")
  }

  /** Read a directory/glob of files, each a back-to-back sequence of
    * binary-protocol structs (the reference's file layout). One input
    * partition per file, streaming decode. */
  def read(spark: SparkSession, path: String, schema: TStruct): DataFrame = {
    val sparkSchema0 = sparkSchema(schema)
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val in = new DataInputStream(new BufferedInputStream(pds.open()))
      Iterator.continually(readStruct(in, schema)).takeWhile(_ != null)
        .map(WireCoerce.toRow(_, sparkSchema0))
    }
    spark.createDataFrame(rows, sparkSchema0)
  }
}
