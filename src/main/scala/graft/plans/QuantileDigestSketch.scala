package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Pure-Scala q-digest (Cormode/Garofalakis-style quantile summary
  * over a binary trie of 64-bit keys) that is BYTE-COMPATIBLE with the
  * reference's `PERCENTILEEST` / `PERCENTILERAWEST` stored columns:
  * the reference serializes its airlift-derived `QuantileDigest`
  * (`pinot-segment-local/.../customobject/QuantileDigest.java`,
  * `ObjectSerDeUtils.QUANTILE_DIGEST_SER_DE`) as big-endian
  * `[double maxError][double alpha][long landmark][long min][long max]
  * [int nodeCount]` followed by the trie nodes in post-order, each
  * `[byte flags(HAS_LEFT=1|HAS_RIGHT=2)][byte level][long bits]
  * [double weight]`, rebuilt stack-wise on read (right popped first).
  *
  * Keys are longs mapped to lexicographically-sortable bit strings by
  * flipping the sign bit; a trie node at `level` covers the value
  * range sharing `bits`'s top `64-level` bits, and compression folds
  * low-weight subtrees upward until every node's (own + children)
  * weight stays under `W/k` with `k = (rootLevel+1)/maxError` — the
  * classic q-digest invariant giving ε-rank-error quantiles. The
  * reference's exponential-decay machinery (alpha, landmark) is inert
  * in every percentile code path (alpha = 0), so this implementation
  * fixes alpha = 0 and writes landmark = 0; both fields round-trip
  * from foreign blobs untouched.
  */
final class GraftQDigest(val maxError: Double) extends Serializable {
  import GraftQDigest._

  private var root: QNode = null
  private var weightedCount = 0.0
  private var totalNodes = 0
  private var nonZeroNodes = 0
  private var minV = Long.MaxValue
  private var maxV = Long.MinValue
  // round-tripped verbatim for foreign blobs; 0 for digests built here
  private[plans] var landmark = 0L
  private[plans] var alpha = 0.0

  def isEmpty: Boolean = root == null
  def count: Double = weightedCount
  def nodeCount: Int = totalNodes

  def add(value: Long, n: Long = 1L): Unit = {
    require(n > 0, "count must be positive")
    val k = compressionFactor
    if (nonZeroNodes > 4.5 * k) compress() // 1.5 × the 3k expected size
    if (value > maxV) maxV = value
    if (value < minV) minV = value
    insert(sortable(value), n.toDouble)
  }

  def merge(o: GraftQDigest): Unit = {
    root = mergeNodes(root, o.root)
    if (o.maxV > maxV) maxV = o.maxV
    if (o.minV < minV) minV = o.minV
    compress()
  }

  /** Rank query: walk the trie in ascending-range order accumulating
    * weights; answer is the upper bound of the node where the running
    * sum first exceeds q·W, capped at the true max. */
  def quantile(q: Double): Long = {
    require(q >= 0 && q <= 1, "quantile must be in [0, 1]")
    var sum = 0.0
    var answer = maxV
    var found = false
    def walk(nd: QNode): Unit = {
      if (nd == null || found) return
      walk(nd.left)
      walk(nd.right)
      if (!found) {
        sum += nd.weight
        if (sum > q * weightedCount) {
          answer = math.min(fromSortable(nd.highBits), maxV)
          found = true
        }
      }
    }
    walk(root)
    answer
  }

  private def compressionFactor: Int =
    if (root == null) 1
    else math.max(((root.level + 1) / maxError).toInt, 1)

  private def sharePrefix(a: Long, b: Long, level: Int): Boolean =
    level == 64 || (a >>> level) == (b >>> level)

  private def insert(bits: Long, w: Double): Unit = {
    var parent: QNode = null
    var goLeft = false
    var cur = root
    var done = false
    while (!done) {
      if (cur == null) {
        attach(parent, goLeft, newNode(bits, 0, w))
        done = true
      } else if (!sharePrefix(bits, cur.bits, cur.level)) {
        attach(parent, goLeft, splitAt(cur, newNode(bits, 0, w)))
        done = true
      } else if (cur.level == 0 && cur.bits == bits) {
        val old = cur.weight
        cur.weight += w
        weightedCount += w
        if (old < ZeroWeight && cur.weight >= ZeroWeight) nonZeroNodes += 1
        done = true
      } else {
        parent = cur
        goLeft = (bits & cur.branchMask) == 0
        cur = if (goLeft) cur.left else cur.right
      }
    }
  }

  private def attach(parent: QNode, asLeft: Boolean, child: QNode): Unit =
    if (parent == null) root = child
    else if (asLeft) parent.left = child
    else parent.right = child

  /** Join two disjoint-prefix nodes under a fresh parent at the first
    * diverging bit. */
  private def splitAt(a: QNode, b: QNode): QNode = {
    val parentLevel = 64 - java.lang.Long.numberOfLeadingZeros(a.bits ^ b.bits)
    val parent = newNode(a.bits, parentLevel, 0)
    if ((b.bits & parent.branchMask) == 0) { parent.left = b; parent.right = a }
    else { parent.left = a; parent.right = b }
    parent
  }

  private def newNode(bits: Long, level: Int, w: Double): QNode = {
    weightedCount += w
    totalNodes += 1
    if (w >= ZeroWeight) nonZeroNodes += 1
    new QNode(bits, level, w)
  }

  private def cloneTree(nd: QNode): QNode =
    if (nd == null) null
    else {
      val c = newNode(nd.bits, nd.level, nd.weight)
      c.left = cloneTree(nd.left)
      c.right = cloneTree(nd.right)
      c
    }

  private def mergeNodes(a: QNode, b: QNode): QNode =
    if (a == null) cloneTree(b)
    else if (b == null) a
    else if (!sharePrefix(a.bits, b.bits, math.max(a.level, b.level)))
      splitAt(a, cloneTree(b))
    else if (a.level > b.level) {
      if ((b.bits & a.branchMask) == 0) a.left = mergeNodes(a.left, b)
      else a.right = mergeNodes(a.right, b)
      a
    } else if (a.level < b.level) {
      val r = newNode(b.bits, b.level, b.weight)
      if ((a.bits & b.branchMask) == 0) {
        r.left = mergeNodes(a, b.left)
        r.right = cloneTree(b.right)
      } else {
        r.left = cloneTree(b.left)
        r.right = mergeNodes(a, b.right)
      }
      r
    } else {
      val old = a.weight
      a.weight += b.weight
      weightedCount += b.weight
      a.left = mergeNodes(a.left, b.left)
      a.right = mergeNodes(a.right, b.right)
      if (old < ZeroWeight && a.weight >= ZeroWeight) nonZeroNodes += 1
      a
    }

  /** Fold low-weight subtrees upward: a parent absorbs its children
    * when own+children weight < floor(W/k) (and always absorbs
    * effectively-zero children). Bottom-up so folds cascade. */
  def compress(): Unit = {
    val k = compressionFactor
    def walk(nd: QNode): Unit = {
      if (nd == null) return
      walk(nd.left)
      walk(nd.right)
      if (!nd.isLeaf) {
        val lw = if (nd.left != null) nd.left.weight else 0.0
        val rw = if (nd.right != null) nd.right.weight else 0.0
        val fold = nd.weight + lw + rw < (weightedCount / k).toInt
        val old = nd.weight
        if (fold || lw < ZeroWeight) {
          nd.left = unhook(nd.left)
          weightedCount += lw
          nd.weight += lw
        }
        if (fold || rw < ZeroWeight) {
          nd.right = unhook(nd.right)
          weightedCount += rw
          nd.weight += rw
        }
        if (old < ZeroWeight && nd.weight >= ZeroWeight) nonZeroNodes += 1
      }
    }
    walk(root)
    if (root != null && root.weight < ZeroWeight) root = unhook(root)
  }

  /** Detach a node whose weight moved to its parent: leaves vanish,
    * single-child chains hoist the child, two-child nodes stay as
    * zero-weight structure. */
  private def unhook(nd: QNode): QNode = {
    if (nd == null) return null
    if (nd.weight >= ZeroWeight) nonZeroNodes -= 1
    weightedCount -= nd.weight
    if (nd.isLeaf) { totalNodes -= 1; null }
    else if (nd.left == null) { totalNodes -= 1; nd.right }
    else if (nd.right == null) { totalNodes -= 1; nd.left }
    else { nd.weight = 0; nd }
  }

  /** Reference-wire-format blob. */
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + 18 * totalNodes) // big-endian
    bb.putDouble(maxError)
    bb.putDouble(alpha)
    bb.putLong(landmark)
    bb.putLong(minV)
    bb.putLong(maxV)
    bb.putInt(totalNodes)
    def walk(nd: QNode): Unit = {
      if (nd == null) return
      walk(nd.left)
      walk(nd.right)
      var flags = 0
      if (nd.left != null) flags |= HasLeft
      if (nd.right != null) flags |= HasRight
      bb.put(flags.toByte)
      bb.put(nd.level.toByte)
      bb.putLong(nd.bits)
      bb.putDouble(nd.weight)
    }
    walk(root)
    bb.array()
  }
}

object GraftQDigest {

  private[plans] final class QNode(
      val bits: Long,
      val level: Int,
      var weight: Double,
      var left: QNode = null,
      var right: QNode = null) {
    def isLeaf: Boolean = left == null && right == null
    def branchMask: Long = 1L << (level - 1)
    def highBits: Long =
      if (level == 0) bits
      else bits | (-1L >>> (64 - level))
  }

  /** Reference default (`PercentileEstAggregationFunction
    * .DEFAULT_MAX_ERROR`). */
  val DefaultMaxError = 0.05
  val ZeroWeight = 1e-5
  val HasLeft = 1
  val HasRight = 2

  private[plans] def sortable(v: Long): Long = v ^ Long.MinValue
  private[plans] def fromSortable(bits: Long): Long = bits ^ Long.MinValue

  def apply(maxError: Double = DefaultMaxError): GraftQDigest =
    new GraftQDigest(maxError)

  def fromBytes(bytes: Array[Byte]): GraftQDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new GraftQDigest(bb.getDouble())
    d.alpha = bb.getDouble()
    d.landmark = bb.getLong()
    val mn = bb.getLong()
    val mx = bb.getLong()
    val n = bb.getInt()
    val stack = new scala.collection.mutable.Stack[QNode]()
    var i = 0
    var total = 0.0
    var nonZero = 0
    while (i < n) {
      val flags = bb.get()
      val level = bb.get() & 0xff
      val bits = bb.getLong()
      val w = bb.getDouble()
      val nd = new QNode(bits, level, w)
      if ((flags & HasRight) != 0) nd.right = stack.pop()
      if ((flags & HasLeft) != 0) nd.left = stack.pop()
      stack.push(nd)
      total += w
      if (w >= ZeroWeight) nonZero += 1
      i += 1
    }
    if (n > 0) {
      require(stack.size == 1, "corrupt q-digest: multiple roots")
      setState(d, stack.pop(), total, n, nonZero, mn, mx)
    } else setState(d, null, 0.0, 0, 0, mn, mx)
    d
  }

  private def setState(d: GraftQDigest, r: QNode, total: Double,
      nodes: Int, nonZero: Int, mn: Long, mx: Long): Unit = {
    d.root = r
    d.weightedCount = total
    d.totalNodes = nodes
    d.nonZeroNodes = nonZero
    d.minV = mn
    d.maxV = mx
  }
}

/** PERCENTILEEST(col, p) as a mergeable q-digest aggregate: long
  * estimate, or PERCENTILERAWEST → reference-wire-format blob.
  * MV-aware. */
case class QDigestAgg(
    child: Expression,
    percentile: Double,
    maxError: Double,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftQDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "percentile_raw_est" else "percentile_est"

  override def createAggregationBuffer(): GraftQDigest =
    GraftQDigest(maxError)

  override def update(buf: GraftQDigest, row: InternalRow): GraftQDigest = {
    def one(x: Any): Unit = x match {
      case l: Long => buf.add(l)
      case i: Int => buf.add(i.toLong)
      case d: Double => buf.add(d.toLong)
      case f: Float => buf.add(f.toLong)
      case d: org.apache.spark.sql.types.Decimal => buf.add(d.toLong)
      case n: Number => buf.add(n.longValue())
      // STRING child: the reference parses string values numerically
      case s: org.apache.spark.unsafe.types.UTF8String =>
        buf.add(java.lang.Double.parseDouble(s.toString).toLong)
      case other => throw new IllegalArgumentException(
        s"$prettyName: unsupported input type ${other.getClass.getSimpleName}" +
          " (expected a numeric, numeric-string, array, or digest-blob column)")
    }
    child.eval(row) match {
      case null => buf
      // BYTES child: a stored digest blob — re-merge (the reference's
      // re-aggregation path under the same function name); an empty
      // buffer ADOPTS the first blob so its stored maxError governs
      case b: Array[Byte] =>
        val incoming = GraftQDigest.fromBytes(b)
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

  override def merge(buf: GraftQDigest, other: GraftQDigest): GraftQDigest =
    if (buf.isEmpty && buf.maxError != other.maxError) other
    else { buf.merge(other); buf }

  override def eval(buf: GraftQDigest): Any =
    if (emitBlob) buf.toBytes
    else if (buf.isEmpty) null
    else buf.quantile(percentile / 100.0)

  override def serialize(buf: GraftQDigest): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): GraftQDigest =
    GraftQDigest.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): QDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation over STORED q-digest blobs. */
case class QDigestMergeAgg(
    child: Expression,
    percentile: Double,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftQDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !emitBlob
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "qdigest_merge_raw" else "qdigest_merge_percentile"

  override def createAggregationBuffer(): GraftQDigest = GraftQDigest()

  override def update(buf: GraftQDigest, row: InternalRow): GraftQDigest = {
    val v = child.eval(row)
    if (v == null) buf
    else {
      // the first blob's stored maxError governs the merged digest
      val incoming = GraftQDigest.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buf.isEmpty) incoming else { buf.merge(incoming); buf }
    }
  }

  override def merge(buf: GraftQDigest, other: GraftQDigest): GraftQDigest =
    if (buf.isEmpty && buf.maxError != other.maxError) other
    else { buf.merge(other); buf }

  override def eval(buf: GraftQDigest): Any =
    if (emitBlob) buf.toBytes
    else if (buf.isEmpty) null
    else buf.quantile(percentile / 100.0)

  override def serialize(buf: GraftQDigest): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): GraftQDigest =
    GraftQDigest.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object QDigestSketch {

  def percentileEst(c: Column, p: Double,
      maxError: Double = GraftQDigest.DefaultMaxError): Column =
    ColumnBridge.column(QDigestAgg(ColumnBridge.expression(c), p,
      maxError, emitBlob = false).toAggregateExpression())

  def qdigestState(c: Column,
      maxError: Double = GraftQDigest.DefaultMaxError): Column =
    ColumnBridge.column(QDigestAgg(ColumnBridge.expression(c), 50.0,
      maxError, emitBlob = true).toAggregateExpression())

  def qdigestMergePercentile(c: Column, p: Double): Column =
    ColumnBridge.column(QDigestMergeAgg(ColumnBridge.expression(c), p,
      emitBlob = false).toAggregateExpression())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def num(e: Expression): Double = e.eval().toString.toDouble
    Seq("percentilerawest", "percentilerawestmv").foreach { n =>
      reg.createOrReplaceTempFunction(n,
        (e: Seq[Expression]) => QDigestAgg(e.head, 50.0,
          GraftQDigest.DefaultMaxError, emitBlob = true),
        "built-in")
    }
    reg.createOrReplaceTempFunction("qdigestmergepercentile",
      (e: Seq[Expression]) => QDigestMergeAgg(e.head, num(e(1)),
        emitBlob = false), "built-in")
  }
}
