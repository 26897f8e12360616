package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Dense HyperLogLog with FIRST-CLASS SERIALIZED STATE — the mergeable
  * sketch-blob surface of the reference's `DISTINCTCOUNTHLL` /
  * `DISTINCTCOUNTRAWHLL` pair (`DistinctCountHLLAggregationFunction
  * .java`, `DistinctCountRawHLLAggregationFunction.java`): a rollup
  * table can STORE per-group sketch blobs and later answer
  * distinct-count queries by merging blobs — the star-tree use case
  * Spark's built-in `approx_count_distinct` can't serve (its HLL++
  * state is locked inside the aggregate).
  *
  * Blob format: [p: 1 byte][2^p register bytes]. Register merge is an
  * elementwise max — associative and commutative, so partial/final
  * plans and blob re-aggregation give BIT-IDENTICAL estimates to a
  * direct pass (asserted by the q_agg_hll_remerge oracle query).
  *
  * State crossing the shuffle is 2^p bytes (4 KiB at the default
  * p=12, ~1.6% rse) regardless of input size.
  */
object Hll {

  def m(p: Int): Int = 1 << p

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Standard Flajolet HLL estimator + small-range linear counting. */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xFF
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    var e = alpha(m) * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
    math.round(e)
  }

  def offer(regs: Array[Byte], h: Long, p: Int): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val cap = 64 - p + 1
    val rank =
      if (w == 0) cap
      else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, cap)
    if (rank > (regs(idx) & 0xFF)) regs(idx) = rank.toByte
  }

  def toBlob(p: Int, regs: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](1 + regs.length)
    out(0) = p.toByte
    System.arraycopy(regs, 0, out, 1, regs.length)
    out
  }

  def fromBlob(blob: Array[Byte]): (Int, Array[Byte]) = {
    val p = blob(0).toInt
    require(blob.length == 1 + (1 << p), s"corrupt HLL blob (p=$p, len=${blob.length})")
    (p, java.util.Arrays.copyOfRange(blob, 1, blob.length))
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < into.length) {
      if ((from(i) & 0xFF) > (into(i) & 0xFF)) into(i) = from(i)
      i += 1
    }
  }
}

/** DISTINCTCOUNTHLL / DISTINCTCOUNTRAWHLL over raw values.
  * `emitBlob = false` → LongType estimate; `true` → BinaryType blob. */
case class HllAgg(
    child: Expression,
    p: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  // reference log2m accepts tiny registers too (clearspring HLL via
  // DistinctCountHLLAggregationFunction — log2m >= 0); keep 18 as the
  // sane upper bound (256 KiB state per group)
  require(p >= 2 && p <= 18, "HLL precision p must be in [2, 18]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "distinct_count_raw_hll" else "distinct_count_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.m(p))

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      // MV column (DISTINCTCOUNTHLLMV family): each element counts
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i))
            Hll.offer(buf, XxHash64Function.hash(arr.get(i, et), et, 42L), p)
          i += 1
        }
      case dt => Hll.offer(buf, XxHash64Function.hash(v, dt, 42L), p)
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    if (emitBlob) Hll.toBlob(p, buf) else Hll.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(b: Array[Byte]): Array[Byte] = b

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED sketch blobs (the rollup-table read path):
  * merges [p][regs] blobs; emits the merged blob or the estimate. */
case class HllMergeAgg(
    child: Expression,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "hll_merge_raw" else "hll_merge_count"

  // empty marker until the first blob fixes p
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def combine(buf: Array[Byte], blob: Array[Byte]): Array[Byte] =
    if (blob.length == 0) buf
    else if (buf.length == 0) blob.clone()
    else {
      require(buf.length == blob.length,
        s"HLL blobs built with different p (${buf.length} vs ${blob.length})")
      // skip the shared 1-byte header, max-merge registers
      var i = 1
      while (i < buf.length) {
        if ((blob(i) & 0xFF) > (buf(i) & 0xFF)) buf(i) = blob(i)
        i += 1
      }
      buf
    }

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v == null) buf
    else combine(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    combine(buf, other)

  override def eval(buf: Array[Byte]): Any =
    if (emitBlob) buf
    else if (buf.length == 0) 0L
    else Hll.estimate(Hll.fromBlob(buf)._2)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(b: Array[Byte]): Array[Byte] = b

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object HllSketch {

  val DefaultP = 12

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

  /** SQL names mirroring the reference aggregate family. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def p(exprs: Seq[Expression]): Int =
      if (exprs.size > 1) exprs(1).eval().toString.toInt else DefaultP
    reg.createOrReplaceTempFunction("distinctcountrawhll",
      (e: Seq[Expression]) => HllAgg(e.head, p(e), emitBlob = true), "built-in")
    reg.createOrReplaceTempFunction("hllmergecount",
      (e: Seq[Expression]) => HllMergeAgg(e.head, emitBlob = false), "built-in")
    reg.createOrReplaceTempFunction("hllmergestate",
      (e: Seq[Expression]) => HllMergeAgg(e.head, emitBlob = true), "built-in")
  }
}
