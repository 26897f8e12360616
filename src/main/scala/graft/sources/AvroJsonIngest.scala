package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro batch ingestion with JSON destination columns — the analog of
  * the reference's avro record extractor feeding a JSON FieldSpec
  * through `ComplexTypeTransformer`/`JsonUtils` (contract pinned by
  * `pinot-core/.../queries/JsonIngestionFromAvroQueriesTest.java`):
  *
  *  - avro RECORD and MAP values render as JSON objects with SORTED
  *    keys ({"a":"1","b":"2"} regardless of insertion order);
  *  - ARRAY values render element-wise;
  *  - ENUM symbols and plain strings render as JSON strings ("UP");
  *  - a top-level string that parses as a JSON document renders in
  *    canonical form with its OWN key order preserved
  *    ({"name":"scooby","id":7} stays name-first) — nested strings are
  *    never re-parsed;
  *  - FIXED and BYTES render as base64 JSON strings;
  *  - UNION values render as whichever member is present, null as
  *    JSON null (SQL NULL here).
  *
  * Scale shape: one `binaryFiles` scan with a streaming avro decode
  * per file (the reference runs one RecordReader per input file); the
  * schema comes from one driver-side header read of the first file. */
object AvroJsonIngest {

  private lazy val plainMapper = new com.fasterxml.jackson.databind.ObjectMapper
  private lazy val sortedMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper
    m.configure(com.fasterxml.jackson.databind.SerializationFeature
      .ORDER_MAP_ENTRIES_BY_KEYS, true)
    m
  }

  /** Convert an avro generic value into Jackson-serializable shapes
    * (java maps/lists/strings/numbers); `top` gates the
    * parse-string-as-JSON rule to the column's own value. */
  private def jsonShape(v: Any, top: Boolean): Any = v match {
    case null => null
    case r: GenericRecord =>
      val m = new java.util.LinkedHashMap[String, Any]()
      r.getSchema.getFields.asScala.foreach(f =>
        m.put(f.name, jsonShape(r.get(f.pos), top = false)))
      m
    case m: java.util.Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.asScala.foreach { case (k, x) =>
        out.put(k.toString, jsonShape(x, top = false)) }
      out
    case l: java.util.List[_] =>
      val out = new java.util.ArrayList[Any]()
      l.asScala.foreach(x => out.add(jsonShape(x, top = false)))
      out
    case f: org.apache.avro.generic.GenericFixed =>
      java.util.Base64.getEncoder.encodeToString(f.bytes())
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      java.util.Base64.getEncoder.encodeToString(a)
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case s: CharSequence if top =>
      // a JSON-typed top-level string canonicalizes (key order kept);
      // a non-JSON string becomes a JSON string value
      try plainMapper.readTree(s.toString) catch { case _: Exception => s.toString }
    case s: CharSequence => s.toString
    case other => other // numbers, booleans
  }

  /** Canonical JSON string for one JSON-destination column value. */
  def jsonRender(v: Any): String =
    if (v == null) null
    else sortedMapper.writeValueAsString(jsonShape(v, top = true))

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) sparkType(nonNull.head)
      else StringType // multi-member unions only make sense as JSON
    case _ => StringType
  }

  /** Read avro files; columns named in `jsonColumns` land as canonical
    * JSON strings, everything else coerces to its primitive type. */
  def read(spark: SparkSession, path: String,
      jsonColumns: Set[String]): DataFrame = {
    val firstFile = {
      val p = new java.io.File(path)
      if (p.isDirectory)
        p.listFiles().filter(_.getName.endsWith(".avro")).sortBy(_.getName)
          .headOption.getOrElse(
            throw new IllegalArgumentException(s"no .avro files in $path"))
      else p
    }
    val header = new DataFileStream[GenericRecord](
      new java.io.FileInputStream(firstFile), new GenericDatumReader[GenericRecord]())
    val avroSchema = try header.getSchema finally header.close()
    val fieldNames = avroSchema.getFields.asScala.map(_.name).toSeq
    val schema = StructType(avroSchema.getFields.asScala.toSeq.map { f =>
      val dt = if (jsonColumns.contains(f.name)) StringType
        else sparkType(f.schema)
      StructField(f.name, dt, nullable = true)
    })
    val jsonCols = jsonColumns
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val stream = new DataFileStream[GenericRecord](
        pds.open(), new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = stream.hasNext
          if (!h) stream.close()
          h
        }
        def next(): Row = {
          val rec = stream.next()
          val fields = fieldNames.map { n =>
            val v = rec.get(n)
            n -> (if (jsonCols.contains(n)) jsonRender(v)
              else v match {
                case u: org.apache.avro.util.Utf8 => u.toString
                case f: org.apache.avro.generic.GenericFixed => f.bytes()
                case b: java.nio.ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
                case x => x
              })
          }.toMap
          WireCoerce.toRow(fields, schema)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
