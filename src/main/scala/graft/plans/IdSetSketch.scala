package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.util.Base64

import com.google.common.hash.{BloomFilter, Funnel, Funnels}
import org.roaringbitmap.RoaringBitmap
import org.roaringbitmap.longlong.Roaring64NavigableMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference-WIRE-FORMAT id sets and bitmap distinct counts.
  *
  * The reference's IDSET aggregation serializes
  * `[IdSet.Type byte][payload]` and base64-encodes it
  * (`pinot-core/.../query/utils/idset/IdSet.java:30` — EMPTY 0,
  * ROARING_BITMAP 1, ROARING_64_NAVIGABLE_MAP 2, BLOOM_FILTER 3;
  * `IdSets.java:58-75` picks by id type: INT → RoaringBitmap,
  * LONG → Roaring64NavigableMap, FLOAT/DOUBLE/STRING/BYTES → guava
  * BloomFilter with the matching funnel, floats/doubles funneled as
  * their raw bits / hash — `BloomFilterIdSet.java:56-120`). All three
  * backing libraries (RoaringBitmap, guava) ship on Spark's own
  * classpath, so delegating to the SAME implementations makes every
  * blob this engine writes readable by a reference deployment and vice
  * versa — the same delegation argument as the HLL/theta/KLL/tuple/CPC
  * sketches. The reference's merge degradation is honored too: when a
  * merged bitmap outgrows `sizeThresholdInBytes` it converts to the
  * BloomFilter form (`IdSets.merge`).
  *
  * DISTINCTCOUNTBITMAP
  * (`DistinctCountBitmapAggregationFunction.java:74-140`): RoaringBitmap
  * of the value for INT columns, of `Type.hashCode(value)` otherwise;
  * a BYTES column is treated as SERIALIZED BITMAPS and or-merged — the
  * rollup-table re-aggregation path. Blobs are the plain RoaringBitmap
  * serialization (`ObjectSerDeUtils.ROARING_BITMAP_SER_DE`).
  */
object IdSetSketch {

  val DefaultSizeThresholdBytes: Int = 8 * 1024 * 1024
  val DefaultExpectedInsertions: Int = 5000000
  val DefaultFpp: Double = 0.03

  /** Mutable aggregation state — exactly one of the reference's four
    * IdSet kinds. */
  final class IdSetState(
      var kind: Byte, // 0 empty, 1 roaring, 2 roaring64, 3 bloom
      var rb: RoaringBitmap,
      var rb64: Roaring64NavigableMap,
      var funnel: Byte, // 0 int, 1 long, 2 string, 3 bytes
      var bloom: BloomFilter[AnyRef])

  def emptyState(): IdSetState = new IdSetState(0, null, null, -1, null)

  private def funnelFor(id: Byte): Funnel[AnyRef] = (id match {
    case 0 => Funnels.integerFunnel()
    case 1 => Funnels.longFunnel()
    case 2 => Funnels.unencodedCharsFunnel()
    case 3 => Funnels.byteArrayFunnel()
  }).asInstanceOf[Funnel[AnyRef]]

  def newBloom(funnel: Byte, expectedInsertions: Int,
      fpp: Double): BloomFilter[AnyRef] =
    BloomFilter.create(funnelFor(funnel), expectedInsertions, fpp)

  /** Pinot wire bytes (IdSet.toBytes layout). */
  def toBytes(s: IdSetState): Array[Byte] = s.kind match {
    case 0 => Array[Byte](0)
    case 1 =>
      val n = 1 + s.rb.serializedSizeInBytes()
      val out = new Array[Byte](n)
      val bb = ByteBuffer.wrap(out); bb.put(1.toByte); s.rb.serialize(bb)
      out
    case 2 =>
      val bos = new ByteArrayOutputStream()
      val dos = new DataOutputStream(bos)
      dos.write(2); s.rb64.serialize(dos); dos.flush()
      bos.toByteArray
    case 3 =>
      val bos = new ByteArrayOutputStream()
      bos.write(3); bos.write(s.funnel.toInt)
      s.bloom.writeTo(bos)
      bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): IdSetState = {
    val kind = bytes(0)
    kind match {
      case 0 => emptyState()
      case 1 =>
        val rb = new RoaringBitmap()
        rb.deserialize(ByteBuffer.wrap(bytes, 1, bytes.length - 1))
        new IdSetState(1, rb, null, -1, null)
      case 2 =>
        val rb64 = new Roaring64NavigableMap()
        rb64.deserialize(new DataInputStream(
          new ByteArrayInputStream(bytes, 1, bytes.length - 1)))
        new IdSetState(2, null, rb64, -1, null)
      case 3 =>
        val funnel = bytes(1)
        val in = new ByteArrayInputStream(bytes, 2, bytes.length - 2)
        new IdSetState(3, null, null, funnel,
          BloomFilter.readFrom(in, funnelFor(funnel)))
    }
  }

  def serializedSize(s: IdSetState): Long = s.kind match {
    case 0 => 1L
    case 1 => 1L + s.rb.serializedSizeInBytes()
    case 2 => 1L + s.rb64.serializedSizeInBytes()
    case 3 => Long.MaxValue // bloom never converts further
  }

  // ——— Column builders ———

  def idSet(c: Column,
      sizeThresholdBytes: Int = DefaultSizeThresholdBytes,
      expectedInsertions: Int = DefaultExpectedInsertions,
      fpp: Double = DefaultFpp): Column =
    ColumnBridge.column(IdSetAgg(ColumnBridge.expression(c),
      sizeThresholdBytes, expectedInsertions, fpp)
      .toAggregateExpression())

  def inIdSet(c: Column, blob: Column): Column =
    ColumnBridge.column(InIdSet(ColumnBridge.expression(c),
      ColumnBridge.expression(blob)))

  def distinctCountBitmap(c: Column): Column =
    ColumnBridge.column(BitmapDistinctAgg(ColumnBridge.expression(c),
      emitBlob = false).toAggregateExpression())

  def bitmapState(c: Column): Column =
    ColumnBridge.column(BitmapDistinctAgg(ColumnBridge.expression(c),
      emitBlob = true).toAggregateExpression())
}

/** IDSET aggregation → base64 STRING in the reference wire format. */
case class IdSetAgg(
    child: Expression,
    sizeThresholdBytes: Int,
    expectedInsertions: Int,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[IdSetSketch.IdSetState] {
  import IdSetSketch._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "id_set"

  override def createAggregationBuffer(): IdSetState = emptyState()

  private def ensureKind(buf: IdSetState): Unit =
    if (buf.kind == 0) child.dataType match {
      case IntegerType | ShortType | ByteType | BooleanType =>
        // honor the reference's "directly create BloomFilter when the
        // threshold is non-positive" rule (IdSets.java:59-61)
        if (sizeThresholdBytes <= 0) {
          buf.kind = 3; buf.funnel = 0
          buf.bloom = newBloom(0, expectedInsertions, fpp)
        } else { buf.kind = 1; buf.rb = new RoaringBitmap() }
      case LongType | TimestampType | TimestampNTZType | DateType =>
        if (sizeThresholdBytes <= 0) {
          buf.kind = 3; buf.funnel = 1
          buf.bloom = newBloom(1, expectedInsertions, fpp)
        } else { buf.kind = 2; buf.rb64 = new Roaring64NavigableMap() }
      case FloatType =>
        buf.kind = 3; buf.funnel = 0
        buf.bloom = newBloom(0, expectedInsertions, fpp)
      case DoubleType =>
        buf.kind = 3; buf.funnel = 1
        buf.bloom = newBloom(1, expectedInsertions, fpp)
      case StringType =>
        buf.kind = 3; buf.funnel = 2
        buf.bloom = newBloom(2, expectedInsertions, fpp)
      case BinaryType =>
        buf.kind = 3; buf.funnel = 3
        buf.bloom = newBloom(3, expectedInsertions, fpp)
      case dt => throw new IllegalStateException(s"IDSET: unsupported $dt")
    }

  override def update(buf: IdSetState, row: InternalRow): IdSetState = {
    val v = child.eval(row)
    if (v != null) {
      ensureKind(buf)
      (child.dataType, buf.kind) match {
        case (IntegerType, 1) => buf.rb.add(v.asInstanceOf[Int])
        case (ShortType, 1) => buf.rb.add(v.asInstanceOf[Short].toInt)
        case (ByteType, 1) => buf.rb.add(v.asInstanceOf[Byte].toInt)
        case (BooleanType, 1) =>
          buf.rb.add(if (v.asInstanceOf[Boolean]) 1 else 0)
        case (LongType, 2) => buf.rb64.addLong(v.asInstanceOf[Long])
        case (TimestampType | TimestampNTZType, 2) =>
          buf.rb64.addLong(Math.floorDiv(v.asInstanceOf[Long], 1000L))
        case (DateType, 2) => buf.rb64.addLong(v.asInstanceOf[Int].toLong)
        case (FloatType, 3) => buf.bloom.put(Integer.valueOf(
          java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float])))
        case (DoubleType, 3) => buf.bloom.put(java.lang.Long.valueOf(
          java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])))
        case (StringType, 3) => buf.bloom.put(v.toString)
        case (BinaryType, 3) => buf.bloom.put(v.asInstanceOf[Array[Byte]])
        // int/long column whose state degraded to bloom (threshold <= 0
        // or post-merge conversion)
        case (IntegerType | ShortType | ByteType | BooleanType, 3) =>
          buf.bloom.put(Integer.valueOf(v match {
            case i: Int => i
            case s: Short => s.toInt
            case b: Byte => b.toInt
            case b: Boolean => if (b) 1 else 0
          }))
        case (LongType | TimestampType | TimestampNTZType | DateType, 3) =>
          buf.bloom.put(java.lang.Long.valueOf(v match {
            case l: Long => l
            case i: Int => i.toLong
          }))
        case (dt, k) =>
          throw new IllegalStateException(s"IDSET: $dt with state kind $k")
      }
    }
    buf
  }

  override def merge(buf: IdSetState, other: IdSetState): IdSetState = {
    if (other.kind == 0) return buf
    if (buf.kind == 0) return other
    require(buf.kind == other.kind,
      s"IDSET merge of mixed kinds ${buf.kind}/${other.kind}")
    buf.kind match {
      case 1 => buf.rb.or(other.rb)
      case 2 => buf.rb64.or(other.rb64)
      case 3 => buf.bloom.putAll(other.bloom)
    }
    // reference merge degradation: oversized bitmaps convert to bloom
    // (IdSets.merge → convertToBloomFilterIdSet)
    if (sizeThresholdBytes > 0 &&
        IdSetSketch.serializedSize(buf) > sizeThresholdBytes &&
        (buf.kind == 1 || buf.kind == 2)) convertToBloom(buf)
    buf
  }

  private def convertToBloom(buf: IdSetState): Unit = {
    if (buf.kind == 1) {
      val bloom = newBloom(0, expectedInsertions, fpp)
      buf.rb.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(i: Int): Unit = bloom.put(Integer.valueOf(i))
      })
      buf.kind = 3; buf.funnel = 0; buf.bloom = bloom; buf.rb = null
    } else {
      val bloom = newBloom(1, expectedInsertions, fpp)
      val it = buf.rb64.getLongIterator
      while (it.hasNext) bloom.put(java.lang.Long.valueOf(it.next()))
      buf.kind = 3; buf.funnel = 1; buf.bloom = bloom; buf.rb64 = null
    }
  }

  override def eval(buf: IdSetState): Any =
    UTF8String.fromString(
      Base64.getEncoder.encodeToString(IdSetSketch.toBytes(buf)))

  override def serialize(buf: IdSetState): Array[Byte] =
    IdSetSketch.toBytes(buf)
  override def deserialize(b: Array[Byte]): IdSetSketch.IdSetState =
    IdSetSketch.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): IdSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IdSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** IN_ID_SET(value, base64IdSet) — decodes the blob ONCE per execution
  * (the blob operand is a literal or an executed scalar subquery, both
  * constant at runtime) and probes by value type. */
case class InIdSet(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import IdSetSketch._

  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_id_set"

  @transient private lazy val set: IdSetState = {
    val b = right.eval(null)
    require(b != null, "IN_ID_SET: null id-set blob")
    fromBytes(Base64.getDecoder.decode(b.toString))
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val s = set
    s.kind match {
      case 0 => false
      case 1 => s.rb.contains(l match {
        case i: Int => i
        case sh: Short => sh.toInt
        case b: Byte => b.toInt
        case lo: Long => lo.toInt
      })
      case 2 => s.rb64.contains(l match {
        case lo: Long => lo
        case i: Int => i.toLong
      })
      case 3 => s.funnel match {
        case 0 => s.bloom.mightContain(Integer.valueOf(l match {
          case i: Int => i
          case f: Float => java.lang.Float.floatToRawIntBits(f)
          case sh: Short => sh.toInt
        }))
        case 1 => s.bloom.mightContain(java.lang.Long.valueOf(l match {
          case lo: Long => lo
          case d: Double => java.lang.Double.doubleToRawLongBits(d)
          case i: Int => i.toLong
        }))
        case 2 => s.bloom.mightContain(l.toString)
        case 3 => s.bloom.mightContain(l.asInstanceOf[Array[Byte]])
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InIdSet =
    copy(left = newLeft, right = newRight)
}

/** DISTINCTCOUNTBITMAP: RoaringBitmap of values (INT) / value
  * hashCodes (other types); BYTES input or-merges serialized bitmaps
  * (the reference's rollup re-aggregation path). `emitBlob` emits the
  * plain serialized RoaringBitmap instead of the INT cardinality. */
case class BitmapDistinctAgg(
    child: Expression,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else IntegerType
  override def prettyName: String =
    if (emitBlob) "distinct_count_bitmap_state" else "distinct_count_bitmap"

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  private def add(buf: RoaringBitmap, v: Any, dt: DataType): Unit = dt match {
    case IntegerType => buf.add(v.asInstanceOf[Int])
    case ShortType => buf.add(v.asInstanceOf[Short].toInt)
    case ByteType => buf.add(v.asInstanceOf[Byte].toInt)
    case BooleanType => buf.add(if (v.asInstanceOf[Boolean]) 1 else 0)
    case LongType => buf.add(java.lang.Long.hashCode(v.asInstanceOf[Long]))
    case TimestampType | TimestampNTZType => buf.add(
      java.lang.Long.hashCode(Math.floorDiv(v.asInstanceOf[Long], 1000L)))
    case FloatType =>
      buf.add(java.lang.Float.hashCode(v.asInstanceOf[Float]))
    case DoubleType =>
      buf.add(java.lang.Double.hashCode(v.asInstanceOf[Double]))
    case StringType => buf.add(v.toString.hashCode)
    case BinaryType => // serialized bitmap → or-merge
      val bytes = v.asInstanceOf[Array[Byte]]
      val rb = new RoaringBitmap()
      rb.deserialize(ByteBuffer.wrap(bytes))
      buf.or(rb)
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) add(buf, arr.get(i, et), et)
        i += 1
      }
    case dt =>
      throw new IllegalStateException(s"DISTINCTCOUNTBITMAP: unsupported $dt")
  }

  override def update(buf: RoaringBitmap, row: InternalRow): RoaringBitmap = {
    val v = child.eval(row)
    if (v != null) add(buf, v, child.dataType)
    buf
  }

  override def merge(buf: RoaringBitmap, other: RoaringBitmap): RoaringBitmap = {
    buf.or(other); buf
  }

  override def eval(buf: RoaringBitmap): Any =
    if (emitBlob) serialize(buf) else buf.getCardinality

  override def serialize(buf: RoaringBitmap): Array[Byte] = {
    val out = new Array[Byte](buf.serializedSizeInBytes())
    buf.serialize(ByteBuffer.wrap(out))
    out
  }
  override def deserialize(b: Array[Byte]): RoaringBitmap = {
    val rb = new RoaringBitmap()
    rb.deserialize(ByteBuffer.wrap(b))
    rb
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
