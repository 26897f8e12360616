package graft.plans

import com.clearspring.analytics.stream.cardinality.HyperLogLog
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog with FIRST-CLASS SERIALIZED STATE, WIRE-COMPATIBLE with
  * the reference's stored sketch columns.
  *
  * The reference's `DISTINCTCOUNTHLL` / `DISTINCTCOUNTRAWHLL`
  * (`DistinctCountHLLAggregationFunction.java`,
  * `DistinctCountRawHLLAggregationFunction.java`) are backed by the
  * stream-lib (clearspring) HyperLogLog, serialized via
  * `ObjectSerDeUtils.HYPER_LOG_LOG_SER_DE` → `HyperLogLog.getBytes()`.
  * The very same library ships on the Spark classpath (`stream-*.jar`,
  * used by `RDD.countApproxDistinct`), so these aggregates delegate to
  * it directly: register contents, estimates, and blob bytes are
  * BIT-IDENTICAL to the reference's (verified against the reference's
  * own MSE gold outputs, `CountDistinct:countDistinct_non_h2:28-34`).
  * Blobs written by a reference deployment (rollup tables, star-tree
  * MVs) deserialize and re-merge here unchanged.
  *
  * Merge is an elementwise register max — associative and commutative,
  * so partial/final plans and blob re-aggregation give BIT-IDENTICAL
  * estimates to a direct pass. State crossing the shuffle is the packed
  * register array (2^log2m · 5 bits) regardless of input size.
  */
object Hll {

  /** Boxed offer value matching the reference's per-type
    * `HyperLogLog.offer` calls (stream-lib `MurmurHash.hash(Object)`
    * dispatches on the runtime class): integral types as
    * Integer/Long, FLOAT kept as Float (1.01f hashes via its raw int
    * bits, ≠ 1.01d), STRING via its UTF-8 bytes, BYTES as byte[]. */
  def canonical(v: Any, dt: DataType): AnyRef = dt match {
    case IntegerType => Integer.valueOf(v.asInstanceOf[Int])
    case ShortType => Integer.valueOf(v.asInstanceOf[Short].toInt)
    case ByteType => Integer.valueOf(v.asInstanceOf[Byte].toInt)
    case LongType => java.lang.Long.valueOf(v.asInstanceOf[Long])
    case BooleanType =>
      Integer.valueOf(if (v.asInstanceOf[Boolean]) 1 else 0)
    case FloatType => java.lang.Float.valueOf(v.asInstanceOf[Float])
    case DoubleType => java.lang.Double.valueOf(v.asInstanceOf[Double])
    case StringType => v.toString // UTF8String → String (offer hashes getBytes)
    case BinaryType => v.asInstanceOf[Array[Byte]]
    // reference TIMESTAMP is epoch millis stored as long
    case TimestampType | TimestampNTZType =>
      java.lang.Long.valueOf(Math.floorDiv(v.asInstanceOf[Long], 1000L))
    case _ => v.toString
  }

  def offer(h: HyperLogLog, v: Any, dt: DataType): Unit = {
    h.offer(canonical(v, dt))
    ()
  }

  def merge(into: HyperLogLog, from: HyperLogLog): HyperLogLog =
    try { into.addAll(from); into }
    catch {
      // differing log2m can only merge when one side is an untouched
      // default-sized buffer (e.g. an empty partition's initial buffer
      // meeting deserialized wire blobs of a non-default size) — keep
      // the populated side, mirroring the reference's treatment of the
      // pre-aggregated BYTES path
      case e: com.clearspring.analytics.stream.cardinality.CardinalityMergeException =>
        if (into.cardinality() == 0) from
        else if (from.cardinality() == 0) into
        else throw new IllegalStateException(e.getMessage, e)
    }

  def fromBlob(bytes: Array[Byte]): HyperLogLog =
    HyperLogLog.Builder.build(bytes)

  def toBlob(h: HyperLogLog): Array[Byte] = h.getBytes
}

/** DISTINCTCOUNTHLL / DISTINCTCOUNTRAWHLL over raw values.
  * `emitBlob = false` → LongType estimate; `true` → BinaryType blob in
  * the reference wire format. */
case class HllAgg(
    child: Expression,
    p: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HyperLogLog] {

  // clearspring RegisterSet bound; 16 caps state at 64 KiB per group
  require(p >= 1 && p <= 16, "HLL log2m must be in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "distinct_count_raw_hll" else "distinct_count_hll"

  override def createAggregationBuffer(): HyperLogLog = new HyperLogLog(p)

  override def update(buf: HyperLogLog, row: InternalRow): HyperLogLog = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      // MV column (DISTINCTCOUNTHLLMV family): each element counts
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) Hll.offer(buf, arr.get(i, et), et)
          i += 1
        }
      // BYTES = serialized HLLs in the reference
      // (DistinctCountHLLAggregationFunction deserializes and addAll's
      // them — the pre-aggregated HLL-column path), never raw values
      case BinaryType =>
        return Hll.merge(buf, Hll.fromBlob(v.asInstanceOf[Array[Byte]]))
      case dt => Hll.offer(buf, v, dt)
    }
    buf
  }

  override def merge(buf: HyperLogLog, other: HyperLogLog): HyperLogLog =
    Hll.merge(buf, other)

  override def eval(buf: HyperLogLog): Any =
    if (emitBlob) Hll.toBlob(buf) else buf.cardinality()

  override def serialize(buf: HyperLogLog): Array[Byte] = buf.getBytes
  override def deserialize(b: Array[Byte]): HyperLogLog = Hll.fromBlob(b)

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED sketch blobs (the rollup-table read
  * path): merges reference-wire-format blobs — including blobs written
  * by an actual reference deployment — and emits the merged blob or
  * the estimate. */
case class HllMergeAgg(
    child: Expression,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[HyperLogLog]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "hll_merge_raw" else "hll_merge_count"

  override def createAggregationBuffer(): Option[HyperLogLog] = None

  private def combine(buf: Option[HyperLogLog], h: HyperLogLog): Option[HyperLogLog] =
    buf match {
      case None => Some(h)
      case Some(b) => Some(Hll.merge(b, h))
    }

  override def update(buf: Option[HyperLogLog], row: InternalRow): Option[HyperLogLog] = {
    val v = child.eval(row)
    if (v == null) buf
    else combine(buf, Hll.fromBlob(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: Option[HyperLogLog], other: Option[HyperLogLog]): Option[HyperLogLog] =
    other match {
      case None => buf
      case Some(h) => combine(buf, h)
    }

  override def eval(buf: Option[HyperLogLog]): Any = buf match {
    case None => if (emitBlob) null else 0L
    case Some(h) => if (emitBlob) Hll.toBlob(h) else h.cardinality()
  }

  override def serialize(buf: Option[HyperLogLog]): Array[Byte] =
    buf.map(_.getBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(b: Array[Byte]): Option[HyperLogLog] =
    if (b.isEmpty) None else Some(Hll.fromBlob(b))

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** DISTINCTCOUNTSMARTHLL (`DistinctCountSmartHLLAggregationFunction`):
  * exact value set until `threshold` distinct values, then converts to
  * HLL at `log2m`. Exact-mode state stores the canonical offer values
  * (tagged so set equality matches the reference's per-type sets);
  * conversion re-offers the stored values, so the resulting HLL is
  * identical to one built directly. */
case class SmartHllAgg(
    child: Expression,
    threshold: Int,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmartHllAgg.State] {
  import SmartHllAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_count_smart_hll"

  override def createAggregationBuffer(): State = new State(null, null)

  /** Set-friendly form of the canonical offer value: byte arrays wrap
    * to Seq for equality, everything else is a value-equal box. */
  private def setKey(v: AnyRef): Any = v match {
    case b: Array[Byte] => b.toSeq
    case x => x
  }

  private def offerKey(h: HyperLogLog, k: Any): Unit = {
    val v: AnyRef = k match {
      case b: Seq[_] => b.asInstanceOf[Seq[Byte]].toArray
      case x => x.asInstanceOf[AnyRef]
    }
    h.offer(v)
    ()
  }

  private def toHll(st: State): Unit = {
    st.hll = new HyperLogLog(p)
    if (st.set != null) {
      val it = st.set.iterator()
      while (it.hasNext) offerKey(st.hll, it.next())
      st.set = null
    }
  }

  override def update(st: State, row: InternalRow): State = {
    val v = child.eval(row)
    if (v != null) {
      val c = Hll.canonical(v, child.dataType)
      if (st.hll != null) { st.hll.offer(c); () }
      else {
        if (st.set == null) st.set = new java.util.HashSet[Any]()
        st.set.add(setKey(c))
        if (st.set.size > threshold) toHll(st)
      }
    }
    st
  }

  override def merge(st: State, other: State): State = {
    if (other.hll != null && st.hll == null) toHll(st)
    if (other.set != null) {
      if (st.hll != null) {
        val it = other.set.iterator()
        while (it.hasNext) offerKey(st.hll, it.next())
      } else {
        if (st.set == null) st.set = new java.util.HashSet[Any]()
        st.set.addAll(other.set)
        if (st.set.size > threshold) toHll(st)
      }
    }
    if (other.hll != null) Hll.merge(st.hll, other.hll)
    st
  }

  override def eval(st: State): Any =
    if (st.hll != null) st.hll.cardinality()
    else if (st.set == null) 0L
    else st.set.size.toLong

  override def serialize(st: State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    if (st.hll != null) {
      out.writeByte(1)
      out.write(st.hll.getBytes)
    } else {
      out.writeByte(0)
      val n = if (st.set == null) 0 else st.set.size
      out.writeInt(n)
      if (n > 0) {
        val it = st.set.iterator()
        while (it.hasNext) it.next() match {
          case i: Integer => out.writeByte(0); out.writeLong(i.longValue())
          case l: java.lang.Long => out.writeByte(0); out.writeLong(l)
          case f: java.lang.Float => out.writeByte(1); out.writeInt(
            java.lang.Float.floatToRawIntBits(f))
          case d: java.lang.Double => out.writeByte(2); out.writeLong(
            java.lang.Double.doubleToRawLongBits(d))
          case s: String =>
            val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            out.writeByte(3); out.writeInt(b.length); out.write(b)
          case b: Seq[_] =>
            val arr = b.asInstanceOf[Seq[Byte]].toArray
            out.writeByte(4); out.writeInt(arr.length); out.write(arr)
        }
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new State(null, null)
    if (in.readByte() == 1) {
      val rest = new Array[Byte](bytes.length - 1)
      in.readFully(rest)
      st.hll = Hll.fromBlob(rest)
    } else {
      val n = in.readInt()
      if (n > 0) {
        st.set = new java.util.HashSet[Any]()
        var i = 0
        while (i < n) {
          in.readByte() match {
            case 0 => st.set.add(java.lang.Long.valueOf(in.readLong()))
            case 1 => st.set.add(java.lang.Float.valueOf(
              java.lang.Float.intBitsToFloat(in.readInt())))
            case 2 => st.set.add(java.lang.Double.valueOf(
              java.lang.Double.longBitsToDouble(in.readLong())))
            case 3 =>
              val b = new Array[Byte](in.readInt()); in.readFully(b)
              st.set.add(new String(b, java.nio.charset.StandardCharsets.UTF_8))
            case _ =>
              val b = new Array[Byte](in.readInt()); in.readFully(b)
              st.set.add(b.toSeq)
          }
          i += 1
        }
      }
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): SmartHllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SmartHllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object SmartHllAgg {
  /** Exact-or-sketch state: `set` until threshold, then `hll`. */
  final class State(var set: java.util.HashSet[Any], var hll: HyperLogLog)
}

object HllSketch {

  /** Column-API default precision (rse ≈ 1.6%); the SQL surface
    * defaults to the reference's log2m = 8
    * (`CommonConstants.DEFAULT_HYPERLOGLOG_LOG2M`). */
  val DefaultP = 12
  val ReferenceDefaultLog2m = 8

  /** Estimate over raw values (DISTINCTCOUNTHLL). */
  def distinctCountHll(c: Column, p: Int = DefaultP): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(c), p, emitBlob = false).toAggregateExpression())

  /** Serialized sketch over raw values (DISTINCTCOUNTRAWHLL). */
  def hllState(c: Column, p: Int = DefaultP): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(c), p, emitBlob = true).toAggregateExpression())

  /** Estimate from stored blobs. */
  def hllMergeCount(c: Column): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(c), emitBlob = false).toAggregateExpression())

  /** Merged blob from stored blobs. */
  def hllMergeState(c: Column): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(c), emitBlob = true).toAggregateExpression())

  /** DISTINCTCOUNTHLLPLUS / DISTINCTCOUNTRAWHLLPLUS, reference-WIRE-
    * FORMAT: the same stream-lib HyperLogLogPlus the reference
    * serializes (`DistinctCountHLLPlusAggregationFunction.java`,
    * `ObjectSerDeUtils.HYPER_LOG_LOG_PLUS_SER_DE` — getBytes /
    * Builder.build; defaults p=14, sp=0,
    * `CommonConstants.java:129-130`). */
  def distinctCountHllPlus(c: Column, p: Int = 14, sp: Int = 0): Column =
    ColumnBridge.column(HllPlusAgg(ColumnBridge.expression(c), p, sp,
      emitBlob = false).toAggregateExpression())

  def hllPlusState(c: Column, p: Int = 14, sp: Int = 0): Column =
    ColumnBridge.column(HllPlusAgg(ColumnBridge.expression(c), p, sp,
      emitBlob = true).toAggregateExpression())

  /** SQL names mirroring the reference aggregate family (reference
    * default log2m = 8). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def p(exprs: Seq[Expression]): Int =
      if (exprs.size > 1) exprs(1).eval().toString.toInt else ReferenceDefaultLog2m
    reg.createOrReplaceTempFunction("distinctcountrawhll",
      (e: Seq[Expression]) => HllAgg(e.head, p(e), emitBlob = true), "built-in")
    reg.createOrReplaceTempFunction("hllmergecount",
      (e: Seq[Expression]) => HllMergeAgg(e.head, emitBlob = false), "built-in")
    reg.createOrReplaceTempFunction("hllmergestate",
      (e: Seq[Expression]) => HllMergeAgg(e.head, emitBlob = true), "built-in")
    // legacy fastHLL: STRING column of char-encoded serialized HLLs
    // (FastHLLAggregationFunction.java — byte + 129 per char); decode
    // then the normal blob merge
    reg.createOrReplaceTempFunction("fasthll",
      (e: Seq[Expression]) => HllMergeAgg(FastHllDecode(e.head),
        emitBlob = false), "built-in")
  }
}

/** Decodes the reference's legacy fastHLL STRING encoding back to the
  * serialized HLL blob: each char is the blob byte + 129
  * (`FastHLLAggregationFunction.java` BYTE_TO_CHAR_OFFSET / its
  * `convertStringToHLL`). Deprecated compat surface — eval-mode only,
  * feeds [[HllMergeAgg]]. */
case class FastHllDecode(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { out(i) = (s.charAt(i) - 129).toByte; i += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): FastHllDecode =
    copy(child = c)
}

/** HLL++ aggregate delegating to stream-lib HyperLogLogPlus — the
  * EXACT sketch object the reference serializes for
  * DISTINCTCOUNT(RAW)HLLPLUS, so blobs interchange with a reference
  * deployment; a BYTES child is treated as serialized HyperLogLogPlus
  * sketches to merge (the reference's stored-column path,
  * DistinctCountHLLPlusAggregationFunction.java:96-110). */
case class HllPlusAgg(
    child: Expression,
    p: Int,
    sp: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    com.clearspring.analytics.stream.cardinality.HyperLogLogPlus] {
  import com.clearspring.analytics.stream.cardinality.HyperLogLogPlus

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "distinct_count_raw_hll_plus" else "distinct_count_hll_plus"

  override def createAggregationBuffer(): HyperLogLogPlus =
    new HyperLogLogPlus(p, sp)

  override def update(buf: HyperLogLogPlus, row: InternalRow): HyperLogLogPlus = {
    val v = child.eval(row)
    if (v == null) return buf
    child.dataType match {
      case BinaryType => // stored sketch column → merge
        merge(buf, HyperLogLogPlus.Builder.build(v.asInstanceOf[Array[Byte]]))
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) buf.offer(Hll.canonical(arr.get(i, et), et))
          i += 1
        }
        buf
      case dt =>
        buf.offer(Hll.canonical(v, dt))
        buf
    }
  }

  override def merge(buf: HyperLogLogPlus, other: HyperLogLogPlus): HyperLogLogPlus = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: HyperLogLogPlus): Any =
    if (emitBlob) buf.getBytes else buf.cardinality()

  override def serialize(buf: HyperLogLogPlus): Array[Byte] = buf.getBytes
  override def deserialize(b: Array[Byte]): HyperLogLogPlus =
    HyperLogLogPlus.Builder.build(b)

  override def withNewMutableAggBufferOffset(o: Int): HllPlusAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllPlusAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
