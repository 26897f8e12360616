package graft.sources

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Apache Arrow IPC *file* format input (the random-access format with
  * the footer), read through the arrow-vector library that ships on
  * Spark's own classpath.
  *
  * Reference: apache/pinot arrow plugin
  * (`pinot-plugins/pinot-input-format/pinot-arrow/.../ArrowRecordReader.java:66`
  * — `ArrowFileReader` over the file channel, batches loaded one at a
  * time and rows extracted per batch; `ArrowRecordExtractor` converts
  * vector `getObject` values: Text → String, lists → arrays, structs →
  * maps, timestamps → long/Timestamp).
  *
  * Scale design: parallelism is the file set; each task holds ONE
  * record batch of vectors at a time (the arrow reader loads batches
  * sequentially), so memory is bounded by batch size, the same profile
  * as the reference's BatchedArrowFileSource. */
object ArrowIngest {

  /** Arrow field type → Spark type for the supported ingestion set. */
  def sparkType(f: Field): DataType = f.getType match {
    case t: ArrowType.Int => (t.getBitWidth, t.getIsSigned) match {
      case (64, _) => LongType
      case (32, false) => LongType // unsigned 32 needs the wider type
      case (32, true) => IntegerType
      case (16, false) => IntegerType // UInt2 max 65535 overflows Short
      case (16, true) => ShortType
      case (8, true) => ByteType
      case (8, false) => ShortType // UInt1 max 255 overflows Byte
      case _ => IntegerType
    }
    case t: ArrowType.FloatingPoint =>
      if (t.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE) FloatType
      else DoubleType
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary | _: ArrowType.FixedSizeBinary => BinaryType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Date => DateType
    case t: ArrowType.Decimal => DecimalType(t.getPrecision, t.getScale)
    case _: ArrowType.List | _: ArrowType.LargeList =>
      ArrayType(sparkType(f.getChildren.get(0)))
    case _: ArrowType.Struct =>
      StructType(f.getChildren.asScala.toSeq.map(c =>
        StructField(c.getName, sparkType(c), nullable = true)))
    case other => throw new IllegalArgumentException(s"unsupported arrow type $other")
  }

  def sparkSchema(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.getName, sparkType(f), nullable = true)))

  /** Epoch count in the vector's declared unit → java.sql.Timestamp
    * (tz-aware TimeStamp*TZVector.getObject returns the raw Long in
    * SECOND/MILLI/MICRO/NANO — scale per unit, don't assume micros). */
  private def tsFromUnit(v: Long, unit: org.apache.arrow.vector.types.TimeUnit)
      : Timestamp = unit match {
    case org.apache.arrow.vector.types.TimeUnit.SECOND =>
      new Timestamp(v * 1000L)
    case org.apache.arrow.vector.types.TimeUnit.MILLISECOND =>
      new Timestamp(v)
    case org.apache.arrow.vector.types.TimeUnit.MICROSECOND =>
      val sec = Math.floorDiv(v, 1000000L)
      val t = new Timestamp(sec * 1000L)
      t.setNanos(Math.floorMod(v, 1000000L).toInt * 1000)
      t
    case org.apache.arrow.vector.types.TimeUnit.NANOSECOND =>
      val sec = Math.floorDiv(v, 1000000000L)
      val t = new Timestamp(sec * 1000L)
      t.setNanos(Math.floorMod(v, 1000000000L).toInt)
      t
  }

  /** Vector `getObject` output → Spark external row value. `field`
    * carries the Arrow type detail Spark's DataType loses (timestamp
    * unit, child fields for list/struct recursion). */
  private def convert(v: Any, field: Field, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: org.apache.arrow.vector.util.Text, _) => t.toString
    case (t: java.time.LocalDateTime, TimestampType) => Timestamp.valueOf(t)
    case (t: java.lang.Long, TimestampType) => field.getType match {
      case ts: ArrowType.Timestamp => tsFromUnit(t, ts.getUnit)
      case _ => new Timestamp(t / 1000L)
    }
    case (t: java.time.LocalDate, DateType) => java.sql.Date.valueOf(t)
    case (d: java.math.BigDecimal, _: DecimalType) => BigDecimal(d)
    // small/unsigned integer getObject classes Catalyst won't coerce:
    // UInt1 → Byte (reinterpreted), UInt2 → Character, UInt4 → Integer
    case (b: java.lang.Byte, ShortType) => (b.byteValue() & 0xFF).toShort
    case (s: java.lang.Short, IntegerType) => s.intValue()
    case (c: java.lang.Character, IntegerType) => c.charValue().toInt
    case (i: java.lang.Integer, LongType) => i.longValue() & 0xFFFFFFFFL
    case (l: java.util.List[_], ArrayType(et, _)) =>
      val child = field.getChildren.get(0)
      l.asScala.toSeq.map(convert(_, child, et))
    case (m: java.util.Map[_, _], st: StructType) =>
      val children = field.getChildren.asScala
      Row.fromSeq(st.fields.toSeq.map(f => convert(m.asScala.asInstanceOf[
        scala.collection.Map[Any, Any]].collectFirst {
        case (k, x) if String.valueOf(k) == f.name => x
      }.orNull, children.find(_.getName == f.name).getOrElse(field),
        f.dataType)))
    case (x, _) => x
  }

  /** Decode one arrow IPC file (bytes) into rows. */
  def decodeFile(bytes: Array[Byte]): (StructType, Iterator[Row]) = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
    val root = reader.getVectorSchemaRoot
    val arrowFields = root.getSchema.getFields.asScala.toSeq
    val schema = sparkSchema(arrowFields)
    val it = new Iterator[Row] {
      private var rowInBatch = 0
      private var batchRows = 0
      private var done = false
      advanceBatch()
      private def advanceBatch(): Unit = {
        while (!done && rowInBatch >= batchRows) {
          if (reader.loadNextBatch()) { batchRows = root.getRowCount; rowInBatch = 0 }
          else { done = true; reader.close(); allocator.close() }
        }
      }
      override def hasNext: Boolean = !done
      override def next(): Row = {
        val vectors = root.getFieldVectors.asScala
        val row = Row.fromSeq(schema.fields.toSeq.zip(arrowFields).zip(vectors)
          .map { case ((f, af), vec) =>
            convert(vec.getObject(rowInBatch), af, f.dataType)
          })
        rowInBatch += 1
        advanceBatch()
        row
      }
    }
    (schema, it)
  }

  /** Schema from the footer only — no batch is loaded. */
  def readSchema(bytes: Array[Byte]): StructType = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
    try sparkSchema(reader.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq)
    finally { reader.close(); allocator.close() }
  }

  /** Read a directory/glob of arrow IPC files into a DataFrame. The
    * schema is taken from the first file's footer on the driver (all
    * files of a table share it, as in the reference); rows decode on
    * executors, one record batch resident at a time. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    val schema = readSchema(files.first()._2.toArray())
    val rows = files.flatMap { case (_, pds) => decodeFile(pds.toArray())._2 }
    spark.createDataFrame(rows, schema)
  }
}
