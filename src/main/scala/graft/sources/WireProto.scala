package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Protobuf input format, decoded from the public wire format
  * (protobuf.dev/programming-guides/encoding) with no protobuf-java
  * dependency. The schema comes from a compiled descriptor set
  * (`protoc --descriptor_set_out`) — itself a protobuf message whose
  * layout is the public `descriptor.proto`, so the descriptor parser
  * bootstraps off the same generic wire reader.
  *
  * Reference: apache/pinot protobuf plugin
  * (`pinot-plugins/pinot-input-format/pinot-protobuf/.../ProtoBufRecordReader.java:80-86`
  * — descriptor = first message type of the first file in the
  * FileDescriptorSet; records are varint-length-delimited
  * (`mergeDelimitedFrom`, :106); `ProtoBufRecordExtractor.java:19-35`
  * — the type contract mirrored here: int/long/float/double/bool/
  * string pass through, bytes → byte[], enum → constant name, message
  * → Map over the message's SET fields, repeated → Object[], map →
  * Map with stringified keys; :113-119 — fields WITH presence
  * (proto2 fields, proto3 `optional`, message fields, oneof members)
  * surface null when unset, fields WITHOUT presence surface the proto
  * default).
  *
  * Scale design: like the reference, one sequential decode per file —
  * parallelism is the file set (`binaryFiles`), and the descriptor
  * pool is built once on the driver and shipped in the task closure
  * (it is a few KB of case classes).
  */
object WireProto {

  // ---------------------------------------------------------------------
  // Generic wire reader
  // ---------------------------------------------------------------------

  final class PbCursor(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "varint too long")
      }
      v
    }
    def readFixed32(): Int = {
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readFixed64(): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
      pos += 8; v
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
  }

  /** One wire record: (field number, wire type, raw payload).
    * Payloads: wire 0 → Long (varint), 1 → Long (fixed64), 2 →
    * Array[Byte], 5 → Int (fixed32). Groups (3/4) are skipped. */
  def rawFields(bytes: Array[Byte]): Seq[(Int, Int, Any)] = {
    val in = new PbCursor(bytes, 0, bytes.length)
    val out = Seq.newBuilder[(Int, Int, Any)]
    while (in.hasRemaining) {
      val tag = in.readVarint()
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      wt match {
        case 0 => out += ((num, 0, in.readVarint()))
        case 1 => out += ((num, 1, in.readFixed64()))
        case 2 => out += ((num, 2, in.readBytes()))
        case 5 => out += ((num, 5, in.readFixed32()))
        case 3 => skipGroup(in, num) // deprecated groups: skip to END_GROUP
        case 4 => // stray END_GROUP: ignore
        case other => throw new IllegalArgumentException(s"bad wire type $other")
      }
    }
    out.result()
  }

  private def skipGroup(in: PbCursor, groupNum: Int): Unit = {
    while (true) {
      val tag = in.readVarint()
      val num = (tag >>> 3).toInt
      (tag & 7).toInt match {
        case 0 => in.readVarint()
        case 1 => in.readFixed64()
        case 2 => in.readBytes()
        case 5 => in.readFixed32()
        case 3 => skipGroup(in, num)
        case 4 => if (num == groupNum) return
      }
    }
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  // ---------------------------------------------------------------------
  // Descriptor model (descriptor.proto field numbers, public)
  // ---------------------------------------------------------------------

  /** descriptor.proto `FieldDescriptorProto.Type` values. */
  object T {
    val Double = 1; val Float = 2; val Int64 = 3; val UInt64 = 4
    val Int32 = 5; val Fixed64 = 6; val Fixed32 = 7; val Bool = 8
    val String = 9; val Group = 10; val Message = 11; val Bytes = 12
    val UInt32 = 13; val Enum = 14; val SFixed32 = 15; val SFixed64 = 16
    val SInt32 = 17; val SInt64 = 18
  }

  final case class FieldDesc(
      name: String, number: Int, label: Int, tpe: Int, typeName: String,
      proto3Optional: Boolean, oneofMember: Boolean) {
    def repeated: Boolean = label == 3
    /** protobuf field-presence rule: repeated/map never track presence;
      * message fields, oneof members, proto3 `optional`, and every
      * proto2 singular field do. */
    def hasPresence(proto3: Boolean): Boolean =
      !repeated && (tpe == T.Message || tpe == T.Group || oneofMember ||
        proto3Optional || !proto3)
  }
  final case class MessageDesc(fullName: String, fields: Seq[FieldDesc],
    mapEntry: Boolean, proto3: Boolean = false)
  final case class EnumDesc(fullName: String, values: Map[Int, String])
  final case class DescriptorPool(
      messages: Map[String, MessageDesc],
      enums: Map[String, EnumDesc],
      proto3: Boolean,
      firstMessage: String,
      /** declaration-ordered top-level message names of the first file
        * and per-message nested names — the structure Confluent's
        * message-indexes walk (index i = i-th declared message at each
        * level). */
      topLevel: Seq[String] = Nil,
      nestedNames: Map[String, Seq[String]] = Map.empty) {
    /** Resolve a Confluent message-indexes path to a full name. */
    def resolveIndexes(indexes: Seq[Int]): String =
      indexes.tail.foldLeft(topLevel(indexes.head))((scope, i) => nestedNames(scope)(i))
  }

  /** Parse a `FileDescriptorSet` (the `protoc --descriptor_set_out`
    * artifact). Field numbers below are the public descriptor.proto:
    * FileDescriptorSet.file=1; FileDescriptorProto{name=1, package=2,
    * message_type=4, enum_type=5, syntax=12}; DescriptorProto{name=1,
    * field=2, nested_type=3, enum_type=4, options=7};
    * MessageOptions.map_entry=7; FieldDescriptorProto{name=1, number=3,
    * label=4, type=5, type_name=6, oneof_index=9, proto3_optional=17};
    * EnumDescriptorProto{name=1, value=2};
    * EnumValueDescriptorProto{name=1, number=2}. */
  def parseDescriptorSet(bytes: Array[Byte]): DescriptorPool = {
    val msgs = Map.newBuilder[String, MessageDesc]
    val enums = Map.newBuilder[String, EnumDesc]
    var proto3 = false
    var firstMessage: String = null
    val topLevel = Seq.newBuilder[String]
    val nestedNames = Map.newBuilder[String, Seq[String]]

    def str(a: Any): String = new String(a.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8)

    def parseEnum(bytes: Array[Byte], scope: String): Unit = {
      var name = ""
      val values = Map.newBuilder[Int, String]
      rawFields(bytes).foreach {
        case (1, 2, v) => name = str(v)
        case (2, 2, v) =>
          var vn = ""; var num = 0
          rawFields(v.asInstanceOf[Array[Byte]]).foreach {
            case (1, 2, s) => vn = str(s)
            case (2, 0, n) => num = n.asInstanceOf[Long].toInt
            case _ =>
          }
          values += num -> vn
        case _ =>
      }
      enums += s"$scope.$name" -> EnumDesc(s"$scope.$name", values.result())
    }

    def parseMessage(bytes: Array[Byte], scope: String,
        fileProto3: Boolean): Unit = {
      var name = ""
      var mapEntry = false
      val fields = Seq.newBuilder[FieldDesc]
      val nested = Seq.newBuilder[Array[Byte]]
      val nestedEnums = Seq.newBuilder[Array[Byte]]
      rawFields(bytes).foreach {
        case (1, 2, v) => name = str(v)
        case (2, 2, v) =>
          var fn = ""; var num = 0; var label = 1; var tpe = 0
          var typeName = ""; var p3opt = false; var oneof = false
          rawFields(v.asInstanceOf[Array[Byte]]).foreach {
            case (1, 2, s) => fn = str(s)
            case (3, 0, n) => num = n.asInstanceOf[Long].toInt
            case (4, 0, n) => label = n.asInstanceOf[Long].toInt
            case (5, 0, n) => tpe = n.asInstanceOf[Long].toInt
            case (6, 2, s) => typeName = str(s)
            case (9, 0, _) => oneof = true
            case (17, 0, n) => p3opt = n.asInstanceOf[Long] != 0
            case _ =>
          }
          fields += FieldDesc(fn, num, label, tpe, typeName, p3opt, oneof)
        case (3, 2, v) => nested += v.asInstanceOf[Array[Byte]]
        case (4, 2, v) => nestedEnums += v.asInstanceOf[Array[Byte]]
        case (7, 2, v) =>
          rawFields(v.asInstanceOf[Array[Byte]]).foreach {
            case (7, 0, n) => mapEntry = n.asInstanceOf[Long] != 0
            case _ =>
          }
        case _ =>
      }
      val fullName = s"$scope.$name"
      if (firstMessage == null) firstMessage = fullName
      msgs += fullName -> MessageDesc(fullName, fields.result(), mapEntry,
        fileProto3)
      val children = nested.result()
      // declaration order of nested messages, for Confluent index paths
      nestedNames += fullName -> children.map { nb =>
        val nameField = rawFields(nb).collectFirst { case (1, 2, v) => str(v) }.getOrElse("")
        s"$fullName.$nameField"
      }
      children.foreach(parseMessage(_, fullName, fileProto3))
      nestedEnums.result().foreach(parseEnum(_, fullName))
    }

    // syntax is per FILE (descriptor field 12 — serialized AFTER the
    // message list, so each file buffers its fields, resolves its own
    // syntax, THEN parses messages); with --include_imports the set
    // holds dependency files too, each keeping its own presence
    // semantics, and Confluent message-indexes resolve against the
    // file that owns the registered schema — the LAST file (protoc
    // writes dependencies first, the requested file last)
    rawFields(bytes).foreach {
      case (1, 2, file) =>
        var pkg = ""
        var fileProto3 = false
        val messages = Seq.newBuilder[Array[Byte]]
        val fileEnums = Seq.newBuilder[Array[Byte]]
        rawFields(file.asInstanceOf[Array[Byte]]).foreach {
          case (2, 2, v) => pkg = str(v)
          case (4, 2, v) => messages += v.asInstanceOf[Array[Byte]]
          case (5, 2, v) => fileEnums += v.asInstanceOf[Array[Byte]]
          case (12, 2, v) => fileProto3 = str(v) == "proto3"
          case _ =>
        }
        val scope = if (pkg.isEmpty) "" else s".$pkg"
        val tops = messages.result()
        if (tops.nonEmpty) {
          // last message-bearing file wins the index scope
          topLevel.clear()
          topLevel ++= tops.map { mb =>
            val nameField = rawFields(mb).collectFirst { case (1, 2, v) => str(v) }.getOrElse("")
            s"$scope.$nameField"
          }
          proto3 = fileProto3
        }
        tops.foreach(parseMessage(_, if (scope.isEmpty) "" else scope, fileProto3))
        fileEnums.result().foreach(parseEnum(_, if (scope.isEmpty) "" else scope))
      case _ =>
    }
    DescriptorPool(msgs.result(), enums.result(), proto3, firstMessage,
      topLevel.result(), nestedNames.result())
  }

  // ---------------------------------------------------------------------
  // Message decode
  // ---------------------------------------------------------------------

  /** Decode one message against its descriptor. Fields WITH presence
    * that never appear on the wire → null; scalar fields WITHOUT
    * presence → the proto default; repeated → Array (empty when
    * absent); map → Map with stringified keys. */
  def decodeMessage(bytes: Array[Byte], msg: MessageDesc, pool: DescriptorPool): Map[String, Any] = {
    val byNum = msg.fields.map(f => f.number -> f).toMap
    val occur = collection.mutable.Map.empty[Int, List[Any]].withDefaultValue(Nil)
    rawFields(bytes).foreach { case (num, wt, payload) =>
      byNum.get(num).foreach { fd =>
        if (fd.repeated && wt == 2 && isPackable(fd.tpe))
          unpackPacked(payload.asInstanceOf[Array[Byte]], fd.tpe)
            .foreach(v => occur(num) = occur(num) :+ decodeScalar(v, fd, pool))
        else occur(num) = occur(num) :+ decodeScalar(payload, fd, pool)
      }
    }
    msg.fields.map { fd =>
      val vs = occur(fd.number)
      val entryDesc = if (fd.tpe == T.Message) pool.messages.get(fd.typeName) else None
      val value: Any =
        if (fd.repeated && entryDesc.exists(_.mapEntry))
          vs.map(_.asInstanceOf[Map[String, Any]])
            .map(m => String.valueOf(m.getOrElse("key", "")) -> m.getOrElse("value", null)).toMap
        else if (fd.repeated) vs.toArray
        else if (vs.nonEmpty) vs.last // last-one-wins, as protobuf merges
        else if (fd.hasPresence(msg.proto3)) null
        else defaultValue(fd, pool)
      fd.name -> value
    }.toMap
  }

  private def isPackable(tpe: Int): Boolean =
    tpe != T.String && tpe != T.Bytes && tpe != T.Message && tpe != T.Group

  private def unpackPacked(payload: Array[Byte], tpe: Int): Seq[Any] = {
    val in = new PbCursor(payload, 0, payload.length)
    val out = Seq.newBuilder[Any]
    while (in.hasRemaining) out += (tpe match {
      case T.Double | T.Fixed64 | T.SFixed64 => in.readFixed64()
      case T.Float | T.Fixed32 | T.SFixed32 => in.readFixed32()
      case _ => in.readVarint()
    })
    out.result()
  }

  private def decodeScalar(payload: Any, fd: FieldDesc, pool: DescriptorPool): Any = fd.tpe match {
    case T.Double => java.lang.Double.longBitsToDouble(payload.asInstanceOf[Long])
    case T.Float => java.lang.Float.intBitsToFloat(payload.asInstanceOf[Int])
    case T.Int64 | T.UInt64 | T.Fixed64 | T.SFixed64 => payload.asInstanceOf[Long]
    case T.SInt64 => zigzag(payload.asInstanceOf[Long])
    case T.Int32 | T.UInt32 => payload match {
      case l: Long => l.toInt
      case i: Int => i
    }
    case T.Fixed32 | T.SFixed32 => payload.asInstanceOf[Int]
    case T.SInt32 => zigzag(payload.asInstanceOf[Long]).toInt
    case T.Bool => payload.asInstanceOf[Long] != 0
    case T.String => new String(payload.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8)
    case T.Bytes => payload.asInstanceOf[Array[Byte]]
    case T.Enum =>
      val num = payload.asInstanceOf[Long].toInt
      pool.enums.get(fd.typeName).flatMap(_.values.get(num)).getOrElse(num.toString)
    case T.Message | T.Group =>
      val inner = pool.messages.getOrElse(fd.typeName,
        throw new IllegalArgumentException(s"unknown message type ${fd.typeName}"))
      decodeMessage(payload.asInstanceOf[Array[Byte]], inner, pool)
    case other => throw new IllegalArgumentException(s"unsupported field type $other")
  }

  private def defaultValue(fd: FieldDesc, pool: DescriptorPool): Any = fd.tpe match {
    case T.Double => 0.0
    case T.Float => 0.0f
    case T.Int64 | T.UInt64 | T.Fixed64 | T.SFixed64 | T.SInt64 => 0L
    case T.Int32 | T.UInt32 | T.Fixed32 | T.SFixed32 | T.SInt32 => 0
    case T.Bool => false
    case T.String => ""
    case T.Bytes => Array.emptyByteArray
    case T.Enum => pool.enums.get(fd.typeName).flatMap(_.values.get(0)).getOrElse("0")
    case _ => null
  }

  // ---------------------------------------------------------------------
  // Spark schema derivation (the reference's ProtoBufSchemaUtils analog)
  // ---------------------------------------------------------------------

  def sparkSchema(msgName: String, pool: DescriptorPool, depth: Int = 8): StructType = {
    val msg = pool.messages.getOrElse(msgName,
      throw new IllegalArgumentException(s"unknown message $msgName"))
    StructType(msg.fields.map { fd =>
      StructField(fd.name, fieldType(fd, pool, depth), nullable = true)
    })
  }

  private def fieldType(fd: FieldDesc, pool: DescriptorPool, depth: Int): DataType = {
    val entryDesc = if (fd.tpe == T.Message) pool.messages.get(fd.typeName) else None
    if (fd.repeated && entryDesc.exists(_.mapEntry)) {
      val valueFd = entryDesc.get.fields.find(_.name == "value").get
      MapType(StringType, scalarType(valueFd, pool, depth - 1))
    } else if (fd.repeated) ArrayType(scalarType(fd, pool, depth - 1))
    else scalarType(fd, pool, depth - 1)
  }

  private def scalarType(fd: FieldDesc, pool: DescriptorPool, depth: Int): DataType = fd.tpe match {
    case T.Double => DoubleType
    case T.Float => FloatType
    case T.Int64 | T.UInt64 | T.Fixed64 | T.SFixed64 | T.SInt64 => LongType
    case T.Int32 | T.UInt32 | T.Fixed32 | T.SFixed32 | T.SInt32 => IntegerType
    case T.Bool => BooleanType
    case T.String | T.Enum => StringType
    case T.Bytes => BinaryType
    case T.Message | T.Group =>
      require(depth > 0, s"message nesting too deep at ${fd.typeName}")
      sparkSchema(fd.typeName, pool, depth)
    case other => throw new IllegalArgumentException(s"unsupported field type $other")
  }

  // ---------------------------------------------------------------------
  // Delimited-file reader + Spark integration
  // ---------------------------------------------------------------------

  /** Stream varint-length-delimited messages (the `writeDelimitedTo` /
    * `mergeDelimitedFrom` framing the reference reads). */
  def delimited(raw: InputStream): Iterator[Array[Byte]] = {
    val in = new BufferedInputStream(raw)
    def readVarint(first: Int): Int = {
      var v = first & 0x7f; var shift = 7; var b = first
      while ((b & 0x80) != 0) {
        b = in.read()
        if (b < 0) throw new EOFException("truncated length prefix")
        v |= (b & 0x7f) << shift; shift += 7
      }
      v
    }
    new Iterator[Array[Byte]] {
      private var nextMsg: Array[Byte] = fetch()
      private def fetch(): Array[Byte] = {
        val first = in.read()
        if (first < 0) return null
        val len = readVarint(first)
        val buf = new Array[Byte](len)
        var got = 0
        while (got < len) {
          val n = in.read(buf, got, len - got)
          if (n < 0) throw new EOFException("truncated message")
          got += n
        }
        buf
      }
      override def hasNext: Boolean = nextMsg != null
      override def next(): Array[Byte] = { val m = nextMsg; nextMsg = fetch(); m }
    }
  }

  /** Read a directory/glob of delimited protobuf files. The message
    * type defaults to the descriptor set's first message of its first
    * file, exactly like the reference reader. */
  def read(
      spark: SparkSession,
      path: String,
      descriptorSet: Array[Byte],
      messageName: Option[String] = None): DataFrame = {
    val pool = parseDescriptorSet(descriptorSet)
    val msgName = messageName.getOrElse(pool.firstMessage)
    val schema = sparkSchema(msgName, pool)
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val msg = pool.messages(msgName)
      delimited(pds.open()).map { bytes =>
        WireCoerce.toRow(decodeMessage(bytes, msg, pool), schema)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
