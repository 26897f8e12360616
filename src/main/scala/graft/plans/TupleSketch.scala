package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tuple.{Sketches => DsTupleSketches, Union => DsTupleUnion}
import org.apache.datasketches.tuple.aninteger.{IntegerSketch, IntegerSummary, IntegerSummaryDeserializer, IntegerSummarySetOperations}
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Integer-sum TUPLE sketch — a theta sketch carrying a summed integer
  * per retained key — backed by the REAL Apache DataSketches
  * `aninteger.IntegerSketch` on Spark's own classpath,
  * WIRE-COMPATIBLE with the reference's stored sketch columns: the
  * reference's `DISTINCTCOUNTTUPLESKETCH` /
  * `SUMVALUESINTEGERSUMTUPLESKETCH` / `AVGVALUEINTEGERSUMTUPLESKETCH`
  * family (`IntegerTupleSketchAggregationFunction.java`,
  * `SumValuesIntegerTupleSketchAggregationFunction.java:49-59`,
  * `AvgValueIntegerTupleSketchAggregationFunction.java:51-65`) builds
  * the same library type in SUM mode and serializes
  * `sketch.compact().toByteArray()` — the blob format emitted and
  * accepted here.
  *
  * Estimators match the reference: distinct = getEstimate (exact below
  * nominal entries), sumValues = Σ retained values / θ, avgValue =
  * Σ retained values / retained count. Shuffle state is the compact
  * sketch; merge is the library's native tuple Union with summing
  * summary semantics — associative and commutative.
  */
object TupleSketchImpl {

  /** Mutable update-or-merged state, like [[ThetaDs.State]]. */
  final class State(val lgK: Int) {
    var upd: IntegerSketch = _
    var uni: DsTupleUnion[IntegerSummary] = _

    def forUpdate(): IntegerSketch = {
      if (upd == null) upd = new IntegerSketch(lgK, IntegerSummary.Mode.Sum)
      upd
    }

    def mergeSketch(s: org.apache.datasketches.tuple.Sketch[IntegerSummary]): Unit = {
      if (uni == null) uni = new DsTupleUnion[IntegerSummary](1 << lgK,
        new IntegerSummarySetOperations(IntegerSummary.Mode.Sum, IntegerSummary.Mode.Sum))
      uni.union(s)
      ()
    }

    def result(): org.apache.datasketches.tuple.CompactSketch[IntegerSummary] = {
      if (uni != null) {
        if (upd != null) { uni.union(upd.compact()); upd = null }
        uni.getResult
      } else if (upd != null) upd.compact()
      else new IntegerSketch(lgK, IntegerSummary.Mode.Sum).compact()
    }
  }

  def heapify(bytes: Array[Byte]): org.apache.datasketches.tuple.Sketch[IntegerSummary] =
    DsTupleSketches.heapifySketch(Memory.wrap(bytes), new IntegerSummaryDeserializer())

  def updateKey(sk: IntegerSketch, key: Any, dt: DataType, v: Int): Unit = {
    dt match {
      case IntegerType => sk.update(key.asInstanceOf[Int].toLong, v)
      case ShortType => sk.update(key.asInstanceOf[Short].toLong, v)
      case ByteType => sk.update(key.asInstanceOf[Byte].toLong, v)
      case LongType => sk.update(key.asInstanceOf[Long], v)
      case BooleanType => sk.update(if (key.asInstanceOf[Boolean]) 1L else 0L, v)
      case FloatType => sk.update(key.asInstanceOf[Float].toDouble, v)
      case DoubleType => sk.update(key.asInstanceOf[Double], v)
      case StringType => sk.update(key.toString, v)
      case BinaryType => sk.update(key.asInstanceOf[Array[Byte]], v)
      case _ => sk.update(key.toString, v)
    }
    ()
  }

  /** (distinctEstimate, Σ values / θ, Σ values / retained). */
  def estimates(c: org.apache.datasketches.tuple.CompactSketch[IntegerSummary])
      : (Long, Long, Long) = {
    var sum = 0.0
    var n = 0L
    val it = c.iterator()
    while (it.next()) { sum += it.getSummary.getValue; n += 1 }
    (math.round(c.getEstimate),
      math.round(sum / c.getTheta),
      if (n == 0) 0L else math.round(sum / n))
  }

  def eval(c: org.apache.datasketches.tuple.CompactSketch[IntegerSummary],
      mode: Int): Any = mode match {
    case 0 => estimates(c)._1
    case 1 => estimates(c)._2
    case 2 => estimates(c)._3
    case _ => c.toByteArray
  }
}

/** mode: 0 = distinct count, 1 = sum of values, 2 = avg value per key,
  * 3 = raw serialized sketch blob (reference wire format). */
case class IntegerTupleSketchAgg(
    keyChild: Expression,
    valueChild: Expression,
    k: Int,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchImpl.State] {
  import TupleSketchImpl._

  private val lgK = math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(k.toLong - 1)).toInt

  override def children: Seq[Expression] = Seq(keyChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = if (mode == 3) BinaryType else LongType
  override def prettyName: String = mode match {
    case 0 => "distinct_count_tuple_sketch"
    case 1 => "sum_values_tuple_sketch"
    case 2 => "avg_value_tuple_sketch"
    case _ => "tuple_sketch_state"
  }

  override def createAggregationBuffer(): State = new State(lgK)

  override def update(st: State, row: InternalRow): State = {
    val kv = keyChild.eval(row)
    if (kv != null) {
      val vv = valueChild.eval(row)
      val v: Int = vv match {
        case null       => 0
        case l: Long    => l.toInt
        case i: Integer => i
        case s: Short   => s.toInt
        case b: Byte    => b.toInt
        case o          => o.toString.toDouble.toInt
      }
      updateKey(st.forUpdate(), kv, keyChild.dataType, v)
    }
    st
  }

  override def merge(st: State, other: State): State = {
    st.mergeSketch(other.result())
    st
  }

  override def eval(st: State): Any = TupleSketchImpl.eval(st.result(), mode)

  override def serialize(st: State): Array[Byte] = st.result().toByteArray
  override def deserialize(bytes: Array[Byte]): State = {
    val st = new State(lgK)
    st.mergeSketch(heapify(bytes))
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): IntegerTupleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntegerTupleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(keyChild = c(0), valueChild = c(1))
}

/** Re-aggregation over STORED tuple-sketch blobs (the rollup-table
  * path): merge binary states produced by `tuplesketchstate` — or by a
  * reference deployment — and extract any of the three estimates. */
case class TupleSketchMergeAgg(
    child: Expression,
    k: Int,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchImpl.State] {
  import TupleSketchImpl._

  private val lgK = math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(k.toLong - 1)).toInt

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (mode == 3) BinaryType else LongType
  override def prettyName: String = "tuple_sketch_merge"

  override def createAggregationBuffer(): State = new State(lgK)

  override def update(st: State, row: InternalRow): State = {
    val v = child.eval(row)
    if (v != null) st.mergeSketch(heapify(v.asInstanceOf[Array[Byte]]))
    st
  }

  override def merge(st: State, other: State): State = {
    st.mergeSketch(other.result())
    st
  }

  override def eval(st: State): Any = TupleSketchImpl.eval(st.result(), mode)

  override def serialize(st: State): Array[Byte] = st.result().toByteArray
  override def deserialize(bytes: Array[Byte]): State = {
    val st = new State(lgK)
    st.mergeSketch(heapify(bytes))
    st
  }

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

  /** SQL names mirroring the reference enum. The reference's aggregate
    * form is SINGLE-argument over a BYTES column of serialized tuple
    * sketches (+ optional literal lgK —
    * `IntegerTupleSketchAggregationFunction.java:150-170` rejects any
    * non-BYTES stored type), so a 1-arg call (or 1-arg + numeric
    * literal) routes to the blob-merging aggregate; the 2-column
    * (key, value[, k]) build form is graft's ingest-side extension
    * (the reference builds sketches via toIntegerSumTupleSketch in
    * ingestion transforms). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def builder(mode: Int)(exprs: Seq[Expression]): Expression = exprs match {
      case Seq(b) => TupleSketchMergeAgg(b, 16384, mode)
      case Seq(b, l) if l.foldable &&
          (l.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
            l.dataType == org.apache.spark.sql.types.NullType) =>
        // A numeric literal is the nominal-entries count itself
        // (IntegerTupleSketchAggregationFunction.java:126 assigns
        // getIntValue() straight to _nominalEntries); a NULL literal
        // falls back to the 2^DEFAULT_TUPLE_SKETCH_LGK default.
        val nominal = Option(l.eval()).map(_.toString.toDouble.toInt).getOrElse(16384)
        TupleSketchMergeAgg(b, nominal, mode)
      case Seq(k0, v) => IntegerTupleSketchAgg(k0, v, 16384, mode)
      case _ =>
        val k = exprs(2).eval().toString.toInt
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
