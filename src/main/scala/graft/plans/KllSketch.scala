package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketch — the KLL compactor scheme
  * (Karnin/Lang/Liberty, FOCS'16) with a deterministic alternating
  * compaction offset instead of random coins, so results are
  * reproducible under a fixed merge order.
  *
  * Reference surface: apache/pinot `PERCENTILEKLL` /
  * `PERCENTILERAWKLL` / `PERCENTILERAWTDIGEST`
  * (`AggregationFunctionType.java`, DataSketches-backed): percentile
  * aggregates whose SERIALIZED state can be stored in rollup tables and
  * re-aggregated later — the capability Spark's `percentile_approx`
  * lacks (its digest is locked inside the aggregate).
  *
  * Structure: level i holds values of weight 2^i, capacity k. A full
  * level sorts and keeps alternating elements (offset flips per
  * compaction), promoting survivors to level i+1. State crossing the
  * shuffle is O(k log(n/k)) doubles; merge concatenates levels and
  * re-compacts — associative up to the documented rank-error bound
  * (≈ O(1/k) of n per query, like the randomized original in
  * expectation; merge order shifts estimates within the same bound,
  * which is why oracle checks gate |est − exact| rather than equality).
  */
final class KllState(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer())
  var compactions: Long = 0L
  var count: Long = 0L

  def update(v: Double): Unit = {
    levels(0) += v
    count += 1
    if (levels(0).length > k) compact(0)
  }

  private def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) levels += ArrayBuffer()
    val lvl = levels(i)
    val sorted = lvl.sorted
    val offset = (compactions & 1L).toInt // deterministic alternating coin
    compactions += 1
    val up = levels(i + 1)
    var j = offset
    while (j < sorted.length) { up += sorted(j); j += 2 }
    lvl.clear()
    if (up.length > k) compact(i + 1)
  }

  def merge(other: KllState): Unit = {
    var i = 0
    while (i < other.levels.length) {
      if (i >= levels.length) levels += ArrayBuffer()
      levels(i) ++= other.levels(i)
      i += 1
    }
    count += other.count
    compactions += other.compactions
    i = 0
    while (i < levels.length) {
      if (levels(i).length > k) compact(i)
      i += 1
    }
  }

  /** Quantile q in [0,1]: smallest item whose inclusive weighted rank
    * reaches ⌈q·N⌉ — the DataSketches INCLUSIVE search criterion
    * (`KllDoublesSketch.getQuantile` default), which the reference's
    * PERCENTILE_KLL surfaces. */
  def query(q: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var idx = 0
    while (idx < sorted.length) {
      cum += sorted(idx)._2
      if (cum >= target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val sizes = levels.map(_.length)
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + sizes.length * 4 +
      sizes.sum * 8)
    bb.putInt(k); bb.putLong(compactions); bb.putLong(count)
    bb.putInt(levels.length)
    levels.foreach { l => bb.putInt(l.length) }
    levels.foreach(_.foreach(bb.putDouble))
    bb.array()
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.compactions = bb.getLong
    st.count = bb.getLong
    val nLevels = bb.getInt
    val sizes = Array.fill(nLevels)(bb.getInt)
    st.levels.clear()
    sizes.foreach { n =>
      val l = ArrayBuffer.empty[Double]
      var i = 0
      while (i < n) { l += bb.getDouble; i += 1 }
      st.levels += l
    }
    if (st.levels.isEmpty) st.levels += ArrayBuffer()
    st
  }
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
  extends TypedImperativeAggregate[KllState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else DoubleType
  override def prettyName: String =
    if (emitBlob) "percentile_raw_kll" else "percentile_kll"

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, row: InternalRow): KllState = {
    def one(x: Any): Unit = buf.update(x match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
    })
    child.eval(row) match {
      case null => ()
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

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.merge(other); buf
  }

  override def eval(buf: KllState): Any =
    if (emitBlob) buf.serialize()
    else if (buf.count == 0) null
    else buf.query(percentile / 100.0)

  override def serialize(buf: KllState): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): KllState = KllState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED KLL blobs: merge, then estimate (or emit
  * the merged blob). */
case class KllMergeAgg(
    child: Expression,
    percentile: Double,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else DoubleType
  override def prettyName: String =
    if (emitBlob) "kll_merge_raw" else "kll_merge_percentile"

  override def createAggregationBuffer(): KllState = new KllState(0)

  private def combine(buf: KllState, other: KllState): KllState =
    if (buf.k == 0) other
    else if (other.k == 0) buf
    else { buf.merge(other); buf }

  override def update(buf: KllState, row: InternalRow): KllState = {
    val v = child.eval(row)
    if (v == null) buf
    else combine(buf, KllState.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: KllState, other: KllState): KllState =
    combine(buf, other)

  override def eval(buf: KllState): Any =
    if (emitBlob) buf.serialize()
    else if (buf.count == 0) null
    else buf.query(percentile / 100.0)

  override def serialize(buf: KllState): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): KllState = KllState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object KllSketch {

  val DefaultK = 256

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
    // raw-blob aliases: EST (qdigest), TDIGEST and the MV names share
    // the KLL blob in this engine (same accuracy class, mergeable);
    // the native KLL update already iterates ArrayType children
    Seq("percentilerawtdigest", "percentilerawest", "percentilerawkllmv",
      "percentilerawestmv", "percentilerawtdigestmv").foreach { n =>
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
