package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Pure-Scala merging t-digest (Dunning & Ertl, "Computing Extremely
  * Accurate Quantiles Using t-Digests") whose serialized form is
  * byte-compatible with the reference's stored percentile columns:
  * the reference serializes `com.tdunning.math.stats.MergingDigest`
  * through `pinot-segment-local/.../utils/TDigestUtils.java`
  * (`ObjectSerDeUtils.TDIGEST_SER_DE`,
  * `PercentileTDigestAggregationFunction.java`), i.e. the VERBOSE
  * MergingDigest layout — big-endian
  * `[int 1][double min][double max][double compression][int n]`
  * followed by n `[double weight][double mean]` pairs — falling back
  * to the SMALL layout
  * `[int 2][double min][double max][float compression][short mainCap]
  * [short bufCap][short n]` + n `[float weight][float mean]` pairs
  * only when the verbose form exceeds the t-digest 3.2 capacity.
  * This implementation emits VERBOSE always (its centroid count is
  * bounded by ~compression/2 + 2, far under the legacy capacity
  * `2*ceil(compression)+10` where TDigestUtils switches), and decodes
  * both encodings, so blobs written by a reference deployment load
  * here and blobs written here parse in both t-digest 3.2 and 3.3.
  *
  * Scale function is K_1 (`k(q) = δ/(2π)·asin(2q−1)`) — the function
  * the reference pins for accuracy (`TDigestUtils.configureScaleFunction`).
  * With all-singleton centroids the quantile interpolation reduces to
  * the floor-index order statistic, matching the reference's
  * small-data behavior exactly.
  */
final class GraftTDigest(val compression: Double) extends Serializable {
  import GraftTDigest._

  // main centroids, ascending mean; buffer of pending (mean, weight)
  private var meanArr = new Array[Double](16)
  private var wArr = new Array[Double](16)
  private var used = 0
  private val bufCap = math.max(64, (5 * math.ceil(compression)).toInt)
  private val bMean = new Array[Double](bufCap)
  private val bW = new Array[Double](bufCap)
  private var bUsed = 0
  private var minV = Double.PositiveInfinity
  private var maxV = Double.NegativeInfinity

  def isEmpty: Boolean = used == 0 && bUsed == 0
  def centroidCount: Int = { flush(); used }
  def totalWeight: Double = {
    var s = 0.0
    var i = 0
    while (i < used) { s += wArr(i); i += 1 }
    i = 0
    while (i < bUsed) { s += bW(i); i += 1 }
    s
  }
  def min: Double = minV
  def max: Double = maxV

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN || w <= 0) return
    if (bUsed == bufCap) flush()
    bMean(bUsed) = x
    bW(bUsed) = w
    bUsed += 1
    if (x < minV) minV = x
    if (x > maxV) maxV = x
  }

  def merge(o: GraftTDigest): Unit = {
    o.flush()
    var i = 0
    while (i < o.used) { add(o.meanArr(i), o.wArr(i)); i += 1 }
    if (o.minV < minV) minV = o.minV
    if (o.maxV > maxV) maxV = o.maxV
  }

  /** Drain the buffer: one K_1 merge pass over (main ∪ buffer) sorted
    * by mean. Deterministic given the centroid multiset. */
  def flush(): Unit = {
    if (bUsed == 0) return
    val n = used + bUsed
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(meanArr, 0, ms, 0, used)
    System.arraycopy(wArr, 0, ws, 0, used)
    System.arraycopy(bMean, 0, ms, used, bUsed)
    System.arraycopy(bW, 0, ws, used, bUsed)
    bUsed = 0
    // index sort by (mean, weight) — stable and deterministic
    val idx = Array.range(0, n).sortBy(i => (ms(i), ws(i)))
    var total = 0.0
    var i = 0
    while (i < n) { total += ws(i); i += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    var wSoFar = 0.0
    var kLo = kOf(0.0)
    i = 1
    while (i < n) {
      val m = ms(idx(i))
      val w = ws(idx(i))
      val proposed = curW + w
      val qHi = (wSoFar + proposed) / total
      if (kOf(qHi) - kLo <= 1.0) {
        // absorb into the running centroid (weighted mean)
        curM += (m - curM) * w / proposed
        curW = proposed
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        kLo = kOf(wSoFar / total)
        curM = m; curW = w
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    if (meanArr.length < out) {
      meanArr = new Array[Double](out)
      wArr = new Array[Double](out)
    }
    System.arraycopy(outM, 0, meanArr, 0, out)
    System.arraycopy(outW, 0, wArr, 0, out)
    used = out
  }

  private def kOf(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Quantile estimate — the MergingDigest interpolation rule:
    * half-weight centroid positions, unit-weight centroids answered
    * exactly (hence floor-index order statistic when every centroid is
    * a singleton), boundary segments interpolated against min/max. */
  def quantile(q: Double): Double = {
    flush()
    if (used == 0) return Double.NaN
    if (used == 1) return meanArr(0)
    val total = totalWeight
    val index = q * total
    if (index < 1) return minV
    if (wArr(0) > 1 && index < wArr(0) / 2)
      return minV + (index - 1) / (wArr(0) / 2 - 1) * (meanArr(0) - minV)
    if (index > total - 1) return maxV
    if (wArr(used - 1) > 1 && total - index <= wArr(used - 1) / 2)
      return maxV - (total - index - 1) / (wArr(used - 1) / 2 - 1) *
        (maxV - meanArr(used - 1))
    var wSoFar = wArr(0) / 2
    var i = 0
    while (i < used - 1) {
      val dw = (wArr(i) + wArr(i + 1)) / 2
      if (wSoFar + dw > index) {
        var leftUnit = 0.0
        if (wArr(i) == 1) {
          if (index - wSoFar < 0.5) return meanArr(i)
          leftUnit = 0.5
        }
        var rightUnit = 0.0
        if (wArr(i + 1) == 1) {
          if (wSoFar + dw - index <= 0.5) return meanArr(i + 1)
          rightUnit = 0.5
        }
        val z1 = index - wSoFar - leftUnit
        val z2 = wSoFar + dw - index - rightUnit
        return (meanArr(i) * z2 + meanArr(i + 1) * z1) / (z1 + z2)
      }
      wSoFar += dw
      i += 1
    }
    // tail: interpolate between the last centroid's half-weight
    // position (total − w/2) and max (position total); each endpoint
    // is weighted by the index's distance to the OTHER one
    val z1 = index - total + wArr(used - 1) / 2.0 // distance from the centroid
    val z2 = wArr(used - 1) / 2.0 - z1 // distance from max
    (meanArr(used - 1) * z2 + maxV * z1) / (z1 + z2)
  }

  /** Reference-wire-format blob (VERBOSE MergingDigest — always fits:
    * centroid count stays under the 3.2 legacy capacity). */
  def toBytes: Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(32 + 16 * used) // big-endian default
    bb.putInt(VerboseEncoding)
    bb.putDouble(minV)
    bb.putDouble(maxV)
    bb.putDouble(compression)
    bb.putInt(used)
    var i = 0
    while (i < used) {
      bb.putDouble(wArr(i))
      bb.putDouble(meanArr(i))
      i += 1
    }
    bb.array()
  }
}

object GraftTDigest {
  /** Reference default (`PercentileTDigestAggregationFunction
    * .DEFAULT_TDIGEST_COMPRESSION`). */
  val DefaultCompression = 100.0
  val VerboseEncoding = 1
  val SmallEncoding = 2

  def apply(compression: Double = DefaultCompression): GraftTDigest =
    new GraftTDigest(compression)

  /** Decode either MergingDigest encoding (TDigestUtils emits verbose
    * or small; t-digest 3.2 blobs are the same layouts). */
  def fromBytes(bytes: Array[Byte]): GraftTDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val enc = bb.getInt()
    val mn = bb.getDouble()
    val mx = bb.getDouble()
    val (compression, n, wide) = enc match {
      case VerboseEncoding =>
        (bb.getDouble(), bb.getInt(), true)
      case SmallEncoding =>
        val c = bb.getFloat().toDouble
        bb.getShort() // main capacity — a memory hint, not data
        bb.getShort() // buffer capacity
        (c, bb.getShort().toInt, false)
      case other =>
        throw new IllegalArgumentException(
          s"Invalid t-digest encoding: $other")
    }
    val d = new GraftTDigest(compression)
    var i = 0
    while (i < n) {
      val w = if (wide) bb.getDouble() else bb.getFloat().toDouble
      val m = if (wide) bb.getDouble() else bb.getFloat().toDouble
      d.add(m, w)
      i += 1
    }
    // true extremes can lie outside centroid means — restore them
    if (n > 0) {
      if (mn < d.minV) d.minV = mn
      if (mx > d.maxV) d.maxV = mx
    }
    d
  }
}

/** PERCENTILETDIGEST(col, p[, compression]) as a mergeable aggregate:
  * value estimate, or PERCENTILERAWTDIGEST → reference-wire-format
  * blob. MV-aware (array children feed every element). */
case class TDigestAgg(
    child: Expression,
    percentile: Double,
    compression: Double,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftTDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else DoubleType
  override def prettyName: String =
    if (emitBlob) "percentile_raw_tdigest" else "percentile_tdigest"

  override def createAggregationBuffer(): GraftTDigest =
    GraftTDigest(compression)

  override def update(buf: GraftTDigest, row: InternalRow): GraftTDigest = {
    def one(x: Any): Unit = x match {
      case d: Double => buf.add(d)
      case f: Float => buf.add(f.toDouble)
      case l: Long => buf.add(l.toDouble)
      case i: Int => buf.add(i.toDouble)
      case d: org.apache.spark.sql.types.Decimal => buf.add(d.toDouble)
      case n: Number => buf.add(n.doubleValue())
      // STRING child: the reference parses string values numerically
      case s: org.apache.spark.unsafe.types.UTF8String =>
        buf.add(java.lang.Double.parseDouble(s.toString))
      case other => throw new IllegalArgumentException(
        s"$prettyName: unsupported input type ${other.getClass.getSimpleName}" +
          " (expected a numeric, numeric-string, array, or digest-blob column)")
    }
    child.eval(row) match {
      case null => buf
      // BYTES child: a stored digest blob — re-merge (the reference's
      // re-aggregation path under the same function name); an empty
      // buffer ADOPTS the first blob so its stored compression governs
      case b: Array[Byte] =>
        val incoming = GraftTDigest.fromBytes(b)
        if (buf.isEmpty) incoming else { buf.merge(incoming); buf }
      case arr: org.apache.spark.sql.catalyst.util.ArrayData
          if child.dataType.isInstanceOf[ArrayType] =>
        val et = child.dataType.asInstanceOf[ArrayType].elementType
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) one(arr.get(i, et))
          i += 1
        }
        buf
      case x =>
        one(x)
        buf
    }
  }

  override def merge(buf: GraftTDigest, other: GraftTDigest): GraftTDigest =
    if (buf.isEmpty && buf.compression != other.compression) other
    else { buf.merge(other); buf }

  override def eval(buf: GraftTDigest): Any =
    if (emitBlob) buf.toBytes
    else if (buf.isEmpty) null
    else buf.quantile(percentile / 100.0)

  // the shuffle format IS the wire format
  override def serialize(buf: GraftTDigest): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): GraftTDigest =
    GraftTDigest.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED t-digest blobs (reference wire format —
  * including blobs written by a reference deployment): merge, then
  * estimate (or emit the merged blob). */
case class TDigestMergeAgg(
    child: Expression,
    percentile: Double,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftTDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else DoubleType
  override def prettyName: String =
    if (emitBlob) "tdigest_merge_raw" else "tdigest_merge_percentile"

  override def createAggregationBuffer(): GraftTDigest = GraftTDigest()

  override def update(buf: GraftTDigest, row: InternalRow): GraftTDigest = {
    val v = child.eval(row)
    if (v == null) buf
    else {
      // the first blob's stored compression governs the merged digest
      // (the reference merges into the deserialized digest)
      val incoming = GraftTDigest.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buf.isEmpty) incoming else { buf.merge(incoming); buf }
    }
  }

  override def merge(buf: GraftTDigest, other: GraftTDigest): GraftTDigest =
    if (buf.isEmpty && buf.compression != other.compression) other
    else { buf.merge(other); buf }

  override def eval(buf: GraftTDigest): Any =
    if (emitBlob) buf.toBytes
    else if (buf.isEmpty) null
    else buf.quantile(percentile / 100.0)

  override def serialize(buf: GraftTDigest): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): GraftTDigest =
    GraftTDigest.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object TDigestSketch {

  def percentileTDigest(c: Column, p: Double,
      compression: Double = GraftTDigest.DefaultCompression): Column =
    ColumnBridge.column(TDigestAgg(ColumnBridge.expression(c), p,
      compression, emitBlob = false).toAggregateExpression())

  def tdigestState(c: Column,
      compression: Double = GraftTDigest.DefaultCompression): Column =
    ColumnBridge.column(TDigestAgg(ColumnBridge.expression(c), 50.0,
      compression, emitBlob = true).toAggregateExpression())

  def tdigestMergePercentile(c: Column, p: Double): Column =
    ColumnBridge.column(TDigestMergeAgg(ColumnBridge.expression(c), p,
      emitBlob = false).toAggregateExpression())

  def tdigestMergeState(c: Column): Column =
    ColumnBridge.column(TDigestMergeAgg(ColumnBridge.expression(c), 50.0,
      emitBlob = true).toAggregateExpression())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def num(e: Expression): Double = e.eval().toString.toDouble
    // PERCENTILERAWTDIGEST(col, percentile[, compression]) →
    // wire-format blob. The 2nd argument is the PERCENTILE (reference
    // signature — irrelevant to the blob but part of the call shape);
    // compression is the optional 3rd.
    Seq("percentilerawtdigest", "percentilerawtdigestmv").foreach { n =>
      reg.createOrReplaceTempFunction(n,
        (e: Seq[Expression]) => TDigestAgg(e.head,
          if (e.size > 1) num(e(1)) else 50.0,
          if (e.size > 2) num(e(2)) else GraftTDigest.DefaultCompression,
          emitBlob = true),
        "built-in")
    }
    reg.createOrReplaceTempFunction("tdigestmergepercentile",
      (e: Seq[Expression]) => TDigestMergeAgg(e.head, num(e(1)),
        emitBlob = false), "built-in")
  }
}
