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
      case (16, _) => ShortType
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

  /** Vector `getObject` output → Spark external row value. */
  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: org.apache.arrow.vector.util.Text, _) => t.toString
    case (t: java.time.LocalDateTime, TimestampType) => Timestamp.valueOf(t)
    case (t: java.lang.Long, TimestampType) => new Timestamp(t / 1000L) // micros
    case (t: java.time.LocalDate, DateType) => java.sql.Date.valueOf(t)
    case (d: java.math.BigDecimal, _: DecimalType) => BigDecimal(d)
    case (l: java.util.List[_], ArrayType(et, _)) => l.asScala.toSeq.map(convert(_, et))
    case (m: java.util.Map[_, _], st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => convert(m.asScala.asInstanceOf[
        scala.collection.Map[Any, Any]].collectFirst {
        case (k, x) if String.valueOf(k) == f.name => x
      }.orNull, f.dataType)))
    case (x, _) => x
  }

  /** Decode one arrow IPC file (bytes) into rows. */
  def decodeFile(bytes: Array[Byte]): (StructType, Iterator[Row]) = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
    val root = reader.getVectorSchemaRoot
    val schema = sparkSchema(root.getSchema.getFields.asScala.toSeq)
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
        val row = Row.fromSeq(schema.fields.toSeq.zip(vectors).map { case (f, vec) =>
          convert(vec.getObject(rowInBatch), f.dataType)
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
