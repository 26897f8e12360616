package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin/Lang/Liberty, FOCS'16) backed by the
  * REAL Apache DataSketches `KllDoublesSketch` on Spark's own
  * classpath — WIRE-COMPATIBLE with the reference's stored sketch
  * columns: `PercentileKLLAggregationFunction.java` builds
  * `KllDoublesSketch` and serializes `toByteArray()`
  * (`ObjectSerDeUtils.KLL_SKETCH_SER_DE`), which is exactly the blob
  * format these aggregates emit and accept. Quantiles use the
  * library's INCLUSIVE search criterion — the same rule the
  * reference's PERCENTILE_KLL surfaces (verified against the
  * reference's own MSE gold outputs,
  * `UDFAggregates:pinot_percentile_agg_udf_tests`).
  *
  * The capability Spark's `percentile_approx` lacks: the SERIALIZED
  * state can be stored in rollup tables and re-aggregated later
  * ([[KllMergeAgg]]). State crossing the shuffle is O(k log(n/k))
  * doubles; merge is the library's native bound-preserving merge.
  */
object KllSketchOps {
  def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** PERCENTILEKLL(col, p 0-100) → double estimate, or PERCENTILERAWKLL →
  * serialized sketch blob (`emitBlob`). */
case class KllAgg(
    child: Expression,
    percentile: Double,
    k: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else DoubleType
  override def prettyName: String =
    if (emitBlob) "percentile_raw_kll" else "percentile_kll"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    def one(x: Any): Unit = buf.update(x match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      // STRING child: the reference parses string values numerically
      case s: org.apache.spark.unsafe.types.UTF8String =>
        java.lang.Double.parseDouble(s.toString)
      case other => throw new IllegalArgumentException(
        s"$prettyName: unsupported input type ${other.getClass.getSimpleName}" +
          " (expected a numeric, numeric-string, or array column)")
    })
    child.eval(row) match {
      case null => ()
      // BYTES child: stored KLL blobs re-merge under the same function
      // name — the reference's PercentileKLLAggregationFunction treats
      // a BYTES column as serialized sketches, never as values
      case b: Array[Byte] => buf.merge(KllSketchOps.heapify(b))
      // MV column (PERCENTILERAW…MV family): every element feeds in
      case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
        val et = child.dataType.asInstanceOf[ArrayType].elementType
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) one(arr.get(i, et))
          i += 1
        }
      case x => one(x)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (emitBlob) buf.toByteArray
    else if (buf.isEmpty) null
    else buf.getQuantile(percentile / 100.0) // INCLUSIVE (library default)

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllSketchOps.heapify(b)

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED KLL blobs (reference-wire-format —
  * including blobs written by a reference deployment): merge, then
  * estimate (or emit the merged blob). */
case class KllMergeAgg(
    child: Expression,
    percentile: Double,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else DoubleType
  override def prettyName: String =
    if (emitBlob) "kll_merge_raw" else "kll_merge_percentile"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllSketch.DefaultK)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.merge(KllSketchOps.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (emitBlob) buf.toByteArray
    else if (buf.isEmpty) null
    else buf.getQuantile(percentile / 100.0)

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllSketchOps.heapify(b)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object KllSketch {

  /** Reference default K (`PercentileKLLAggregationFunction`
    * DEFAULT_K_VALUE = 200). */
  val DefaultK = 200

  def percentileKll(c: Column, p: Double, k: Int = DefaultK): Column =
    ColumnBridge.column(KllAgg(ColumnBridge.expression(c), p, k,
      emitBlob = false).toAggregateExpression())

  def kllState(c: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(KllAgg(ColumnBridge.expression(c), 50.0, k,
      emitBlob = true).toAggregateExpression())

  def kllMergePercentile(c: Column, p: Double): Column =
    ColumnBridge.column(KllMergeAgg(ColumnBridge.expression(c), p,
      emitBlob = false).toAggregateExpression())

  def kllMergeState(c: Column): Column =
    ColumnBridge.column(KllMergeAgg(ColumnBridge.expression(c), 50.0,
      emitBlob = true).toAggregateExpression())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def num(e: Expression): Double = e.eval().toString.toDouble
    reg.createOrReplaceTempFunction("percentilerawkll",
      (e: Seq[Expression]) => KllAgg(e.head, 50.0,
        if (e.size > 1) num(e(1)).toInt else DefaultK, emitBlob = true),
      "built-in")
    // MV name shares the KLL blob (the native KLL update already
    // iterates ArrayType children); TDIGEST/EST raw blobs have their
    // own reference-wire-format implementations (TDigestSketch,
    // QDigestSketch)
    Seq("percentilerawkllmv").foreach { n =>
      reg.createOrReplaceTempFunction(n,
        (e: Seq[Expression]) => KllAgg(e.head, 50.0,
          if (e.size > 1) num(e(1)).toInt else DefaultK, emitBlob = true),
        "built-in")
    }
    reg.createOrReplaceTempFunction("kllmergepercentile",
      (e: Seq[Expression]) => KllMergeAgg(e.head, num(e(1)),
        emitBlob = false), "built-in")
  }
}
