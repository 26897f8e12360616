package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch — the theta-sketch
  * family's simplest member: keep the k smallest hash values seen; if
  * fewer than k were seen the count is exact, otherwise estimate
  * (k-1) / R where R is the k-th minimum normalized to [0,1).
  *
  * Reference surface: apache/pinot theta/CPC sketch aggregates
  * (`AggregationFunctionType.java:88-120`,
  * `DistinctCountThetaSketchAggregationFunction.java`). Implemented as a
  * `TypedImperativeAggregate` with a byte-serializable buffer (SURVEY
  * §7.4): the partial state that crosses the shuffle is ≤ k longs
  * regardless of input size, and merge is associative — the properties
  * that make the sketch correct on a 1000-executor partial/final plan.
  */
case class DistinctCountKmv(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_count_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast() // keep k smallest
  }

  /** Hash with VALUE-equality semantics matching the reference's theta
    * sketches (DataSketches `UpdateSketch`): all integral types hash
    * through the long path (int 2 and long 2 collide → union dedups),
    * float promotes to double (1.01f ≠ 1.01d, 300f == 300d) — verified
    * against the reference's own MSE gold outputs
    * (`UDFAggregates:pinot_sketch_agg_udf_tests`). */
  private def hashValue(v: Any, dt: DataType): Long = dt match {
    case ByteType | ShortType | IntegerType =>
      XxHash64Function.hash(v.asInstanceOf[Number].longValue(), LongType, 42L) >>> 1
    case FloatType =>
      XxHash64Function.hash(v.asInstanceOf[Float].toDouble, DoubleType, 42L) >>> 1
    case _ => XxHash64Function.hash(v, dt, 42L) >>> 1
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], row: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(row)
    // non-negative 63-bit hash → uniform in [0, 2^63)
    if (v != null) child.dataType match {
      // MV column (DISTINCTCOUNT…MV family): each element counts
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i))
            add(buf, hashValue(arr.get(i, et), et))
          i += 1
        }
      case dt => add(buf, hashValue(v, dt))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      val r = buf.last().toDouble / (1L << 62).toDouble / 2.0 // /2^63
      math.round((k - 1) / r)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): DistinctCountKmv =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctCountKmv =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Aggregate variant that RETURNS the serialized sketch (BinaryType)
  * instead of the estimate — the `DISTINCTCOUNTRAWTHETASKETCH` shape:
  * sketches can be stored, re-aggregated later, or fed to the set-op
  * estimators in [[KmvSetOps]]. */
case class KmvState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val impl = DistinctCountKmv(child, k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_state"

  override def createAggregationBuffer() = impl.createAggregationBuffer()
  override def update(b: java.util.TreeSet[java.lang.Long], r: InternalRow) =
    impl.update(b, r)
  override def merge(b: java.util.TreeSet[java.lang.Long],
      o: java.util.TreeSet[java.lang.Long]) = impl.merge(b, o)
  override def serialize(b: java.util.TreeSet[java.lang.Long]) = impl.serialize(b)
  override def deserialize(bytes: Array[Byte]) = impl.deserialize(bytes)
  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = impl.serialize(b)

  override def withNewMutableAggBufferOffset(o: Int): KmvState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Set-operation estimators over serialized KMV sketches — the theta
  * sketch family's set algebra (reference
  * `DistinctCountThetaSketchAggregationFunction.java` setOperation
  * parameters): estimate |A ∪ B|, |A ∩ B| and Jaccard from two sketch
  * blobs without the raw data. */
object KmvSetOps {

  private def decode(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  /** (unionEstimate, intersectionEstimate, jaccard) from two sketches
    * built with the same k. */
  def estimate(a: Array[Byte], b: Array[Byte], k: Int): (Long, Long, Double) = {
    val xa = decode(a); val xb = decode(b)
    val sa = xa.toSet; val sb = xb.toSet
    val merged = (sa ++ sb).toArray.sorted.take(k)
    val unionEst: Double =
      if (sa.size < k && sb.size < k) (sa ++ sb).size.toDouble
      else (k - 1) / (merged.last.toDouble / (1L << 62).toDouble / 2.0)
    val inBoth = merged.count(h => sa(h) && sb(h))
    val jaccard = if (merged.isEmpty) 0.0 else inBoth.toDouble / merged.length
    (math.round(unionEst), math.round(jaccard * unionEst), jaccard)
  }
}

/** Scalar set algebra over serialized KMV blobs — the MSE theta
  * surface `THETA_SKETCH_UNION` / `THETA_SKETCH_INTERSECT` /
  * `THETA_SKETCH_DIFF` (reference
  * `DistinctCountThetaSketchAggregationFunction.java` set operations,
  * sketch scalar functions in `ThetaSketchFunctions`). Operates on the
  * exact retained hash sets; when a saturated (k-capped) sketch flows
  * in, union keeps all retained mins (small overestimate vs a re-capped
  * union) — for the principled capped path use [[KmvSetOps.estimate]].
  */
case class KmvBlobSetOp(left: Expression, right: Expression, op: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_sketch_$op"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = KmvBlob.decode(a.asInstanceOf[Array[Byte]])
    val sb = KmvBlob.decode(b.asInstanceOf[Array[Byte]])
    val res = op match {
      case "union" => sa union sb
      case "intersect" => sa intersect sb
      case _ => sa diff sb
    }
    KmvBlob.encode(res)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `GET_THETA_SKETCH_ESTIMATE(blob)`: retained-set size. Exact in
  * exact mode (n < k, which the reference also guarantees exactness
  * for); a saturated sketch should be estimated through the aggregate
  * path that knows k. */
case class KmvBlobEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "get_theta_sketch_estimate"
  override protected def nullSafeEval(a: Any): Any =
    KmvBlob.decode(a.asInstanceOf[Array[Byte]]).size.toLong
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

private[plans] object KmvBlob {
  def decode(bytes: Array[Byte]): Set[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = scala.collection.mutable.HashSet.empty[Long]
    var i = 0
    while (i < n) { out += bb.getLong; i += 1 }
    out.toSet
  }
  def encode(s: Set[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + s.size * 8)
    bb.putInt(s.size)
    s.toArray.sorted.foreach(bb.putLong)
    bb.array()
  }
}

object KmvSketch {

  /** Column API: sketch state aggregate (binary). */
  def kmvState(c: Column, k: Int = 1024): Column =
    ColumnBridge.column(
      KmvState(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: approximate distinct count with ≤ k longs of state. */
  def distinctCountKmv(c: Column, k: Int = 1024): Column =
    ColumnBridge.column(
      DistinctCountKmv(ColumnBridge.expression(c), k).toAggregateExpression())

  /** SQL name: DISTINCTCOUNTKMV(col[, k]). The reference theta-sketch
    * names (DISTINCTCOUNTTHETASKETCH, THETA_SKETCH_* scalars) are owned
    * by the DataSketches-wire-format implementation in
    * [[graft.plans.ThetaSketchDs]]; KMV remains as the lightweight
    * engine-native theta-family estimator. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def build(exprs: Seq[Expression]): Expression = {
      val k = if (exprs.size > 1)
        exprs(1).eval().toString.toInt else 1024
      DistinctCountKmv(exprs.head, k)
    }
    reg.createOrReplaceTempFunction("distinctcountkmv", build, "built-in")
  }
}
