package graft.plans

import java.util.Base64

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ItemsSketch, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference-WIRE-FORMAT frequent-items sketches: FREQUENTSTRINGSSKETCH
  * / FREQUENTLONGSSKETCH return a base64 Apache DataSketches
  * `ItemsSketch<String>` / `LongsSketch` blob, and a BYTES column is
  * treated as serialized sketches to merge
  * (`FrequentStringsSketchAggregationFunction.java:46-103`,
  * `FrequentLongsSketchAggregationFunction.java`; default maxMapSize
  * 256). Same library Spark already ships (datasketches-java), so
  * blobs interchange with a reference deployment — complementing the
  * theta/KLL/tuple/CPC and IDSET/bitmap wire formats. The MAP-returning
  * Misra–Gries heavy-hitter aggregate (`FrequentItems`) stays as the
  * query-side surface (q_frequent_items); these are the
  * blob-interchange surface.
  */
object FrequentSketchDs {
  val DefaultMaxMapSize = 256

  def frequentStringsSketch(c: Column,
      maxMapSize: Int = DefaultMaxMapSize): Column =
    ColumnBridge.column(FrequentStringsSketchAgg(
      ColumnBridge.expression(c), maxMapSize).toAggregateExpression())

  def frequentLongsSketch(c: Column,
      maxMapSize: Int = DefaultMaxMapSize): Column =
    ColumnBridge.column(FrequentLongsSketchAgg(
      ColumnBridge.expression(c), maxMapSize).toAggregateExpression())

  /** Estimated frequency of `item` in a serialized ItemsSketch<String>
    * blob (the read side of the interchange). */
  def stringSketchEstimate(blobBase64: String, item: String): Long =
    ItemsSketch.getInstance(
      Memory.wrap(Base64.getDecoder.decode(blobBase64)),
      new ArrayOfStringsSerDe()).getEstimate(item)

  def longSketchEstimate(blobBase64: String, item: Long): Long =
    LongsSketch.getInstance(
      Memory.wrap(Base64.getDecoder.decode(blobBase64))).getEstimate(item)
}

case class FrequentStringsSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "frequent_strings_sketch"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
      row: InternalRow): ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType => // serialized sketch → merge (reference BYTES path)
        buf.merge(ItemsSketch.getInstance(
          Memory.wrap(v.asInstanceOf[Array[Byte]]),
          new ArrayOfStringsSerDe()))
      case _ => buf.update(v.toString)
    }
    buf
  }

  override def merge(buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = { buf.merge(other); buf }

  override def eval(buf: ItemsSketch[String]): Any =
    UTF8String.fromString(Base64.getEncoder.encodeToString(serialize(buf)))

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(o: Int): FrequentStringsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentStringsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

case class FrequentLongsSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "frequent_longs_sketch"

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case BinaryType =>
        buf.merge(LongsSketch.getInstance(
          Memory.wrap(v.asInstanceOf[Array[Byte]])))
      case LongType => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case ShortType => buf.update(v.asInstanceOf[Short].toLong)
      case ByteType => buf.update(v.asInstanceOf[Byte].toLong)
      case dt => throw new IllegalStateException(
        s"FREQUENTLONGSSKETCH: unsupported $dt")
    }
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: LongsSketch): Any =
    UTF8String.fromString(Base64.getEncoder.encodeToString(buf.toByteArray))

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): FrequentLongsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentLongsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
