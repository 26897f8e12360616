package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Integer-sum TUPLE sketch — a KMV/theta sketch that carries a summed
  * 64-bit value per retained key: the reference's
  * `DISTINCTCOUNTTUPLESKETCH` / `SUMVALUESINTEGERSUMTUPLESKETCH` /
  * `AVGVALUEINTEGERSUMTUPLESKETCH` family
  * (`IntegerTupleSketchAggregationFunction.java`,
  * `SumValuesIntegerTupleSketchAggregationFunction.java:49-59`,
  * `AvgValueIntegerTupleSketchAggregationFunction.java:51-65`,
  * `AggregationFunctionType.java` DISTINCTCOUNTTUPLESKETCH…).
  *
  * Keep the k smallest key-hashes; for each retained hash keep the SUM
  * of the value column over all rows with that key. Estimators match
  * the reference exactly:
  *   - distinct  = size (exact) below k, else (k-1)/θ
  *   - sumValues = retainedTotal / θ        (θ = k-th min / 2^63)
  *   - avgValue  = retainedTotal / retainedEntries (per-key average)
  * Below k the sketch retains every key, θ = 1, and all three are
  * EXACT — which is what makes the oracle query checkable.
  *
  * Shuffle state is ≤ k (hash, value) pairs regardless of input size;
  * merge sums values on hash collision then re-trims — associative and
  * commutative, so partial/final plans and stored-blob re-aggregation
  * agree bit-for-bit.
  */
object TupleSketchImpl {
  type Buf = java.util.TreeMap[java.lang.Long, java.lang.Long]

  def add(buf: Buf, k: Int, h: Long, v: Long): Unit = {
    val prev = buf.get(h)
    buf.put(h, if (prev == null) v else prev + v)
    if (buf.size > k) buf.pollLastEntry() // keep k smallest hashes
  }

  def merge(buf: Buf, other: Buf, k: Int): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, k, e.getKey, e.getValue)
    }
    buf
  }

  /** θ = normalized k-th minimum when saturated, else 1 (exact). */
  def theta(buf: Buf, k: Int): Double =
    if (buf.size < k) 1.0
    else buf.lastKey().toDouble / (1L << 62).toDouble / 2.0

  def retainedTotal(buf: Buf): Long = {
    var s = 0L
    val it = buf.values().iterator()
    while (it.hasNext) s += it.next()
    s
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

/** mode: 0 = distinct count, 1 = sum of values, 2 = avg value per key,
  * 3 = raw serialized sketch blob. */
case class IntegerTupleSketchAgg(
    keyChild: Expression,
    valueChild: Expression,
    k: Int,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchImpl.Buf] {

  import TupleSketchImpl._

  override def children: Seq[Expression] = Seq(keyChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = if (mode == 3) BinaryType else LongType
  override def prettyName: String = mode match {
    case 0 => "distinct_count_tuple_sketch"
    case 1 => "sum_values_tuple_sketch"
    case 2 => "avg_value_tuple_sketch"
    case _ => "tuple_sketch_state"
  }

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, row: InternalRow): Buf = {
    val kv = keyChild.eval(row)
    if (kv != null) {
      val vv = valueChild.eval(row)
      val v: Long = vv match {
        case null       => 0L
        case l: Long    => l
        case i: Integer => i.toLong
        case s: Short   => s.toLong
        case b: Byte    => b.toLong
        case o          => o.toString.toLong
      }
      add(buf, k, XxHash64Function.hash(kv, keyChild.dataType, 42L) >>> 1, v)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf =
    TupleSketchImpl.merge(buf, other, k)

  override def eval(buf: Buf): Any = mode match {
    case 0 =>
      if (buf.size < k) buf.size.toLong
      else math.round((k - 1) / theta(buf, k))
    case 1 => math.round(retainedTotal(buf) / theta(buf, k))
    case 2 =>
      if (buf.isEmpty) 0L
      else math.round(retainedTotal(buf).toDouble / buf.size)
    case _ => serialize(buf)
  }

  override def serialize(buf: Buf): Array[Byte] = TupleSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Buf =
    TupleSketchImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): IntegerTupleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntegerTupleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(keyChild = c(0), valueChild = c(1))
}

/** Re-aggregation over STORED tuple-sketch blobs (the rollup-table
  * path): merge binary states produced by `tuplesketchstate` and
  * extract any of the three estimates — mirrors the reference's
  * segment-level `IntegerTupleSketchValueAggregator` merge. */
case class TupleSketchMergeAgg(
    child: Expression,
    k: Int,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchImpl.Buf] {

  import TupleSketchImpl._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (mode == 3) BinaryType else LongType
  override def prettyName: String = "tuple_sketch_merge"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null)
      TupleSketchImpl.merge(buf, TupleSketchImpl.deserialize(
        v.asInstanceOf[Array[Byte]]), k)
    else buf
  }

  override def merge(buf: Buf, other: Buf): Buf =
    TupleSketchImpl.merge(buf, other, k)

  override def eval(buf: Buf): Any = mode match {
    case 0 =>
      if (buf.size < k) buf.size.toLong
      else math.round((k - 1) / theta(buf, k))
    case 1 => math.round(retainedTotal(buf) / theta(buf, k))
    case 2 =>
      if (buf.isEmpty) 0L
      else math.round(retainedTotal(buf).toDouble / buf.size)
    case _ => serialize(buf)
  }

  override def serialize(buf: Buf): Array[Byte] = TupleSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Buf =
    TupleSketchImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TupleSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object TupleSketch {
  private def agg(key: Column, value: Column, k: Int, mode: Int): Column =
    ColumnBridge.column(IntegerTupleSketchAgg(
      ColumnBridge.expression(key), ColumnBridge.expression(value),
      k, mode).toAggregateExpression())

  def distinctCountTuple(key: Column, value: Column, k: Int = 16384): Column =
    agg(key, value, k, 0)
  def sumValuesTuple(key: Column, value: Column, k: Int = 16384): Column =
    agg(key, value, k, 1)
  def avgValueTuple(key: Column, value: Column, k: Int = 16384): Column =
    agg(key, value, k, 2)
  def tupleState(key: Column, value: Column, k: Int = 16384): Column =
    agg(key, value, k, 3)

  def mergeDistinct(blob: Column, k: Int = 16384): Column =
    ColumnBridge.column(TupleSketchMergeAgg(
      ColumnBridge.expression(blob), k, 0).toAggregateExpression())
  def mergeSum(blob: Column, k: Int = 16384): Column =
    ColumnBridge.column(TupleSketchMergeAgg(
      ColumnBridge.expression(blob), k, 1).toAggregateExpression())
  def mergeAvg(blob: Column, k: Int = 16384): Column =
    ColumnBridge.column(TupleSketchMergeAgg(
      ColumnBridge.expression(blob), k, 2).toAggregateExpression())

  /** SQL names mirroring the reference enum (key, value[, k]). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def builder(mode: Int)(exprs: Seq[Expression]): Expression = {
      val k = if (exprs.size > 2) exprs(2).eval().toString.toInt else 16384
      IntegerTupleSketchAgg(exprs(0), exprs(1), k, mode)
    }
    Seq(
      "distinctcounttuplesketch" -> 0,
      "sumvaluesintegersumtuplesketch" -> 1,
      "avgvalueintegersumtuplesketch" -> 2,
      "distinctcountrawintegersumtuplesketch" -> 3
    ).foreach { case (n, m) =>
      reg.createOrReplaceTempFunction(n, builder(m), "built-in")
    }
  }
}
