package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{AnotB, CompactSketch, Intersection, SetOperation, Sketch, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Theta sketches backed by the REAL Apache DataSketches library (on
  * Spark's own classpath, `datasketches-java`), WIRE-COMPATIBLE with
  * the reference's stored sketch columns: the reference's
  * `DistinctCountThetaSketchAggregationFunction.java` builds
  * `org.apache.datasketches.theta.UpdateSketch` and serializes the
  * compact form (`ObjectSerDeUtils.DATA_SKETCH_SER_DE` →
  * `sketch.compact().toByteArray()`), which is exactly what these
  * aggregates emit and accept — blobs from a reference deployment
  * deserialize, re-merge and estimate here unchanged.
  *
  * Value equality matches the reference's per-type update calls:
  * integral types through `update(long)`, FLOAT promoted to
  * `update(double)`, STRING/BYTES through their byte hashes — verified
  * against the reference's own MSE gold outputs
  * (`UDFAggregates:pinot_sketch_agg_udf_tests`).
  *
  * Scale: state crossing the shuffle is a compact sketch (≤ k hashes);
  * merge is a native theta Union — associative, partial/final safe.
  */
object ThetaDs {

  /** Reference default nominal entries
    * (`CommonConstants.DEFAULT_THETA_SKETCH_NOMINAL_ENTRIES` = 16384). */
  val DefaultNominalEntries = 16384

  def update(sk: UpdateSketch, v: Any, dt: DataType): Unit = {
    dt match {
      case IntegerType => sk.update(v.asInstanceOf[Int].toLong)
      case ShortType => sk.update(v.asInstanceOf[Short].toLong)
      case ByteType => sk.update(v.asInstanceOf[Byte].toLong)
      case LongType => sk.update(v.asInstanceOf[Long])
      case BooleanType => sk.update(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case FloatType => sk.update(v.asInstanceOf[Float].toDouble)
      case DoubleType => sk.update(v.asInstanceOf[Double])
      case StringType => sk.update(v.toString)
      case BinaryType => sk.update(v.asInstanceOf[Array[Byte]])
      case TimestampType | TimestampNTZType =>
        sk.update(Math.floorDiv(v.asInstanceOf[Long], 1000L))
      case _ => sk.update(v.toString)
    }
    ()
  }

  def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  /** Mutable update-or-merged state: an UpdateSketch for raw values
    * plus a lazily-created Union once merges happen. */
  final class State(val k: Int) {
    var upd: UpdateSketch = _
    var uni: Union = _

    def forUpdate(): UpdateSketch = {
      if (upd == null)
        upd = UpdateSketch.builder().setNominalEntries(k).build()
      upd
    }

    def mergeSketch(s: Sketch): Unit = {
      if (uni == null)
        uni = SetOperation.builder().setNominalEntries(k).buildUnion()
      uni.union(s)
      ()
    }

    def result(): CompactSketch = {
      if (uni != null) {
        if (upd != null) { uni.union(upd.compact()); upd = null }
        uni.getResult
      } else if (upd != null) upd.compact()
      else UpdateSketch.builder().setNominalEntries(k).build().compact()
    }
  }
}

/** DISTINCT_COUNT_THETA_SKETCH / DISTINCT_COUNT_RAW_THETA_SKETCH.
  * `emitBlob = false` → LongType rounded estimate; `true` → compact
  * sketch bytes in the reference wire format. */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaDs.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "distinct_count_raw_theta_sketch" else "distinct_count_theta_sketch"

  override def createAggregationBuffer(): ThetaDs.State = new ThetaDs.State(k)

  override def update(st: ThetaDs.State, row: InternalRow): ThetaDs.State = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) ThetaDs.update(st.forUpdate(), arr.get(i, et), et)
          i += 1
        }
      // a BYTES column holds SERIALIZED sketches in the reference —
      // DistinctCountThetaSketchAggregationFunction deserializes and
      // unions them (`DistinctCountThetaSketchQueriesTest` bytesColumn
      // golds), it never hashes the raw bytes as a value
      case BinaryType =>
        st.mergeSketch(ThetaDs.heapify(v.asInstanceOf[Array[Byte]]))
      case dt => ThetaDs.update(st.forUpdate(), v, dt)
    }
    st
  }

  override def merge(st: ThetaDs.State, other: ThetaDs.State): ThetaDs.State = {
    st.mergeSketch(other.result())
    st
  }

  override def eval(st: ThetaDs.State): Any = {
    val r = st.result()
    if (emitBlob) r.toByteArray else math.round(r.getEstimate)
  }

  override def serialize(st: ThetaDs.State): Array[Byte] =
    st.result().toByteArray
  override def deserialize(b: Array[Byte]): ThetaDs.State = {
    val st = new ThetaDs.State(k)
    st.mergeSketch(ThetaDs.heapify(b))
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED theta blobs (the rollup-table path):
  * union-merge compact sketches produced by `thetaState` — or by a
  * reference deployment — and emit the estimate or the merged blob.
  * Union is associative, so a rollup answer is the same sketch a
  * direct fact pass builds (exact below nominal entries). */
case class ThetaMergeAgg(
    child: Expression,
    k: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaDs.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String = "theta_sketch_merge"

  override def createAggregationBuffer(): ThetaDs.State = new ThetaDs.State(k)

  override def update(st: ThetaDs.State, row: InternalRow): ThetaDs.State = {
    val v = child.eval(row)
    if (v != null)
      st.mergeSketch(ThetaDs.heapify(v.asInstanceOf[Array[Byte]]))
    st
  }

  override def merge(st: ThetaDs.State, other: ThetaDs.State): ThetaDs.State = {
    st.mergeSketch(other.result())
    st
  }

  override def eval(st: ThetaDs.State): Any =
    if (emitBlob) st.result().toByteArray
    else math.round(st.result().getEstimate)

  override def serialize(st: ThetaDs.State): Array[Byte] =
    st.result().toByteArray
  override def deserialize(b: Array[Byte]): ThetaDs.State = {
    val st = new ThetaDs.State(k)
    st.mergeSketch(ThetaDs.heapify(b))
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Scalar set algebra over reference-wire-format theta blobs —
  * THETA_SKETCH_UNION / THETA_SKETCH_INTERSECT / THETA_SKETCH_DIFF
  * (`ThetaSketchFunctions` scalars in the reference). */
case class ThetaBlobSetOp(left: Expression, right: Expression, op: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_sketch_$op"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaDs.heapify(a.asInstanceOf[Array[Byte]])
    val sb = ThetaDs.heapify(b.asInstanceOf[Array[Byte]])
    val res: CompactSketch = op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(sa); u.union(sb); u.getResult
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult
      case _ =>
        val d = SetOperation.builder().buildANotB()
        d.aNotB(sa, sb)
    }
    res.toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** GET_THETA_SKETCH_ESTIMATE(blob) → rounded long estimate. */
case class ThetaBlobEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "get_theta_sketch_estimate"
  override protected def nullSafeEval(a: Any): Any =
    math.round(ThetaDs.heapify(a.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** DISTINCT_COUNT_CPC_SKETCH / DISTINCT_COUNT_RAW_CPC_SKETCH —
  * DataSketches CPC (`CpcSketch`), the reference's compressed
  * probabilistic counting family (`DistinctCountCPCSketchAggregation
  * Function.java`, default lgK = 12). Same wire-format guarantee as
  * theta: blobs are `CpcSketch.toByteArray()`. */
case class CpcSketchAgg(
    child: Expression,
    lgK: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.cpc.CpcSketch] {
  import org.apache.datasketches.cpc.{CpcSketch, CpcUnion}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "distinct_count_raw_cpc_sketch" else "distinct_count_cpc_sketch"

  override def createAggregationBuffer(): CpcSketch = new CpcSketch(lgK)

  private def upd(sk: CpcSketch, v: Any, dt: DataType): Unit = {
    dt match {
      case IntegerType => sk.update(v.asInstanceOf[Int].toLong)
      case ShortType => sk.update(v.asInstanceOf[Short].toLong)
      case ByteType => sk.update(v.asInstanceOf[Byte].toLong)
      case LongType => sk.update(v.asInstanceOf[Long])
      case BooleanType => sk.update(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case FloatType => sk.update(v.asInstanceOf[Float].toDouble)
      case DoubleType => sk.update(v.asInstanceOf[Double])
      case StringType => sk.update(v.toString)
      case BinaryType => sk.update(v.asInstanceOf[Array[Byte]])
      case _ => sk.update(v.toString)
    }
    ()
  }

  override def update(sk: CpcSketch, row: InternalRow): CpcSketch = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) upd(sk, arr.get(i, et), et)
          i += 1
        }
      // BYTES = serialized sketches, merged not hashed (same contract
      // as the theta aggregate above)
      case BinaryType =>
        val u = new CpcUnion(lgK)
        u.update(sk)
        u.update(CpcSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
        return u.getResult
      case dt => upd(sk, v, dt)
    }
    sk
  }

  override def merge(sk: CpcSketch, other: CpcSketch): CpcSketch = {
    val u = new CpcUnion(lgK)
    u.update(sk)
    u.update(other)
    u.getResult
  }

  override def eval(sk: CpcSketch): Any =
    if (emitBlob) sk.toByteArray else math.round(sk.getEstimate)

  override def serialize(sk: CpcSketch): Array[Byte] = sk.toByteArray
  override def deserialize(b: Array[Byte]): CpcSketch =
    CpcSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): CpcSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CpcSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED CPC blobs (the rollup-table path):
  * CpcUnion-merge blobs produced by `cpcState` — or by a reference
  * deployment — and emit the estimate or the merged blob. */
case class CpcMergeAgg(
    child: Expression,
    lgK: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.cpc.CpcSketch] {
  import org.apache.datasketches.cpc.{CpcSketch, CpcUnion}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String = "cpc_sketch_merge"

  override def createAggregationBuffer(): CpcSketch = new CpcSketch(lgK)

  override def update(sk: CpcSketch, row: InternalRow): CpcSketch = {
    val v = child.eval(row)
    if (v == null) sk
    else {
      val u = new CpcUnion(lgK)
      u.update(sk)
      u.update(CpcSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      u.getResult
    }
  }

  override def merge(sk: CpcSketch, other: CpcSketch): CpcSketch = {
    val u = new CpcUnion(lgK)
    u.update(sk)
    u.update(other)
    u.getResult
  }

  override def eval(sk: CpcSketch): Any =
    if (emitBlob) sk.toByteArray else math.round(sk.getEstimate)

  override def serialize(sk: CpcSketch): Array[Byte] = sk.toByteArray
  override def deserialize(b: Array[Byte]): CpcSketch =
    CpcSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): CpcMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CpcMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object ThetaSketchDs {

  def distinctCountTheta(c: Column, k: Int = ThetaDs.DefaultNominalEntries): Column =
    ColumnBridge.column(ThetaSketchAgg(ColumnBridge.expression(c), k,
      emitBlob = false).toAggregateExpression())

  def thetaState(c: Column, k: Int = ThetaDs.DefaultNominalEntries): Column =
    ColumnBridge.column(ThetaSketchAgg(ColumnBridge.expression(c), k,
      emitBlob = true).toAggregateExpression())

  def thetaMerge(blob: Column, k: Int = ThetaDs.DefaultNominalEntries,
      emitBlob: Boolean = false): Column =
    ColumnBridge.column(ThetaMergeAgg(ColumnBridge.expression(blob), k,
      emitBlob).toAggregateExpression())

  def cpcState(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(CpcSketchAgg(ColumnBridge.expression(c), lgK,
      emitBlob = true).toAggregateExpression())

  def distinctCountCpc(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(CpcSketchAgg(ColumnBridge.expression(c), lgK,
      emitBlob = false).toAggregateExpression())

  def cpcMerge(blob: Column, lgK: Int = 12,
      emitBlob: Boolean = false): Column =
    ColumnBridge.column(CpcMergeAgg(ColumnBridge.expression(blob), lgK,
      emitBlob).toAggregateExpression())

  /** SQL names — takes over the theta surface with reference-format
    * blobs (the KMV variant stays available as DISTINCTCOUNTKMV). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def kOf(e: Seq[Expression]): Int =
      if (e.size <= 1) ThetaDs.DefaultNominalEntries
      else {
        val s = Option(e(1).eval()).map(_.toString).getOrElse("")
        "(?i)nominalEntries\\s*=\\s*(\\d+)".r.findFirstMatchIn(s)
          .map(_.group(1).toInt)
          .orElse(s.toIntOption)
          .getOrElse(ThetaDs.DefaultNominalEntries)
      }
    reg.createOrReplaceTempFunction("distinctcountthetasketch",
      (e: Seq[Expression]) => ThetaSketchAgg(e.head, kOf(e), emitBlob = false),
      "built-in")
    reg.createOrReplaceTempFunction("distinctcountrawthetasketch",
      (e: Seq[Expression]) => ThetaSketchAgg(e.head, kOf(e), emitBlob = true),
      "built-in")
    reg.createOrReplaceTempFunction("getthetasketchestimate",
      (e: Seq[Expression]) => ThetaBlobEstimate(e.head), "built-in")
    Seq("union", "intersect", "diff").foreach { op =>
      reg.createOrReplaceTempFunction(s"thetasketch$op",
        (e: Seq[Expression]) => e.reduce(ThetaBlobSetOp(_, _, op)), "built-in")
    }
    // CPC family (reference default lgK = 12)
    def lgkOf(e: Seq[Expression]): Int =
      if (e.size <= 1) 12
      else {
        val s = Option(e(1).eval()).map(_.toString).getOrElse("")
        "(?i)lgK\\s*=\\s*(\\d+)".r.findFirstMatchIn(s)
          .map(_.group(1).toInt).orElse(s.toIntOption).getOrElse(12)
      }
    reg.createOrReplaceTempFunction("distinctcountcpcsketch",
      (e: Seq[Expression]) => CpcSketchAgg(e.head, lgkOf(e), emitBlob = false),
      "built-in")
    reg.createOrReplaceTempFunction("distinctcountrawcpcsketch",
      (e: Seq[Expression]) => CpcSketchAgg(e.head, lgkOf(e), emitBlob = true),
      "built-in")
  }
}
