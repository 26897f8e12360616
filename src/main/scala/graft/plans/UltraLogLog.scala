package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** wyhash (Wang Yi), final version 4 — the 64-bit hash the reference
  * feeds UltraLogLog sketches (`UltraLogLogUtils.defaultHasher()` =
  * hash4j `wyhashFinal4`, seed 0, default secret). Re-implemented
  * from the published algorithm: mum-mixing over 48-byte striped
  * lanes, 16-byte tail folds, and the 3/4/8-byte little-endian reads
  * of the short-input path. */
object WyHashFinal4 {

  private val S0 = 0xa0761d6478bd642fL
  private val S1 = 0xe7037ed1a0b428dbL
  private val S2 = 0x8ebc6af09c88c6e3L
  private val S3 = 0x589965cc75374cc3L

  @inline private def mix(a0: Long, b0: Long): Long = {
    // 64×64 → 128 multiply, fold hi ^ lo
    val hi = java.lang.Math.multiplyHigh(a0, b0) +
      (if (a0 < 0) b0 else 0L) + (if (b0 < 0) a0 else 0L) // unsigned hi
    val lo = a0 * b0
    hi ^ lo
  }

  @inline private def r8(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def r4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def r3(b: Array[Byte], i: Int, k: Int): Long =
    ((b(i) & 0xffL) << 16) | ((b(i + (k >> 1)) & 0xffL) << 8) |
      (b(i + k - 1) & 0xffL)

  def hash(bytes: Array[Byte], seed0: Long = 0L): Long = {
    val len = bytes.length
    var seed = seed0 ^ mix(seed0 ^ S0, S1)
    var a = 0L
    var b = 0L
    if (len <= 16) {
      if (len >= 4) {
        a = (r4(bytes, 0) << 32) | r4(bytes, (len >> 3) << 2)
        b = (r4(bytes, len - 4) << 32) |
          r4(bytes, len - 4 - ((len >> 3) << 2))
      } else if (len > 0) {
        a = r3(bytes, 0, len)
      }
    } else {
      var i = len
      var p = 0
      if (i >= 48) {
        var see1 = seed
        var see2 = seed
        while (i >= 48) {
          seed = mix(r8(bytes, p) ^ S1, r8(bytes, p + 8) ^ seed)
          see1 = mix(r8(bytes, p + 16) ^ S2, r8(bytes, p + 24) ^ see1)
          see2 = mix(r8(bytes, p + 32) ^ S3, r8(bytes, p + 40) ^ see2)
          p += 48
          i -= 48
        }
        seed ^= see1 ^ see2
      }
      while (i > 16) {
        seed = mix(r8(bytes, p) ^ S1, r8(bytes, p + 8) ^ seed)
        i -= 16
        p += 16
      }
      a = r8(bytes, p + i - 16)
      b = r8(bytes, p + i - 8)
    }
    a ^= S1
    b ^= seed
    val lo = a * b
    val hi = java.lang.Math.multiplyHigh(a, b) +
      (if (a < 0) b else 0L) + (if (b < 0) a else 0L)
    mix(lo ^ S0 ^ len, hi ^ S1)
  }

  // --- the reference's hash funnels (UltraLogLogUtils.OBJECT_FUNNEL:
  // fixed-width little-endian primitives; strings as UTF-16LE code
  // units followed by the int length) ---

  // seed state after the fixed seed-0 initialization — a constant
  private val Seed0 = 0L ^ mix(0L ^ S0, S1)

  @inline private def finish(a0: Long, b0: Long, len: Long): Long = {
    val a = a0 ^ S1
    val b = b0 ^ Seed0
    val lo = a * b
    val hi = java.lang.Math.multiplyHigh(a, b) +
      (if (a < 0) b else 0L) + (if (b < 0) a else 0L)
    mix(lo ^ S0 ^ len, hi ^ S1)
  }

  /** Allocation-free specialization of the 4-byte path (equals
    * hash(LE bytes of v) — spec-gated). */
  def hashInt(v: Int): Long = {
    val w = v & 0xffffffffL
    finish((w << 32) | w, (w << 32) | w, 4L)
  }

  /** Allocation-free specialization of the 8-byte path. */
  def hashLong(v: Long): Long = {
    val lo = v & 0xffffffffL
    val hi = v >>> 32
    finish((lo << 32) | hi, (hi << 32) | lo, 8L)
  }
  def hashFloat(v: Float): Long = hashInt(java.lang.Float.floatToRawIntBits(v))
  def hashDouble(v: Double): Long =
    hashLong(java.lang.Double.doubleToRawLongBits(v))
  def hashString(s: String): Long = {
    val b = new Array[Byte](2 * s.length + 4)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      b(2 * i) = c.toByte
      b(2 * i + 1) = (c >>> 8).toByte
      i += 1
    }
    writeInt(b, 2 * s.length, s.length)
    hash(b)
  }
  @inline private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }
}

/** UltraLogLog (Ertl 2023, arXiv:2308.16862) — the reference's
  * `DISTINCTCOUNT(RAW)ULL` sketch, wire-compatible with hash4j's
  * register layout as the reference frames it
  * (`ObjectSerDeUtils.ULTRA_LOG_LOG_OBJECT_SER_DE`: one byte of p
  * followed by the raw 2^p register bytes).
  *
  * Per 64-bit hash h: register index = top p bits; q = leading zeros
  * of the remaining value part (capped at 64-p); the register
  * accumulates the OR of `1 << (q+p-1)` positions, kept as the 3-bit
  * approximation `(k << 2) | t` where k is the highest position seen
  * and t the two flag bits right below it — the paper's u = 4k + t
  * encoding that makes one byte span the whole [4(p-1), 255] range.
  * Registers are position-wise monotone, so merge = unpack, OR,
  * repack — associative and commutative, giving bit-identical blobs
  * regardless of merge order (spec-gated).
  *
  * The estimator is a maximum-likelihood solve over the register
  * histogram: each register reports "max q = Q, q=Q-1 seen/unseen,
  * q=Q-2 seen/unseen, nothing above Q", each q-level is an
  * independent Poisson count with rate λ·2^-(q+1), and the concave
  * log-likelihood is maximized by Newton over ln λ. Deterministic in
  * the state and within ~1.2% at p=12 (the paper's accuracy class).
  */
final class GraftUll private (val p: Int, val state: Array[Byte])
  extends Serializable {
  import GraftUll._

  def m: Int = 1 << p

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    // q = leading zeros of the value part, capped at 64-p
    val q = java.lang.Long.numberOfLeadingZeros(~(~h << p))
    val pos = q + p - 1
    val prefix = unpack(state(idx)) | (1L << pos)
    state(idx) = pack(prefix)
  }

  def merge(o0: GraftUll): Unit = {
    // mixed precisions fold the higher-p side down (hash-prefix
    // positions are absolute, so downsizing is exact — the property
    // the paper designs for); merging into a SMALLER own p is the
    // aggregate's job (it swaps buffers via [[UltraLogLogSketch.combine]])
    require(o0.p >= p,
      s"cannot merge UltraLogLog p=${o0.p} into larger p=$p — downsize first")
    val o = if (o0.p > p) o0.downsize(p) else o0
    var i = 0
    while (i < state.length) {
      val u = unpack(state(i)) | unpack(o.state(i))
      if (u != 0) state(i) = pack(u)
      i += 1
    }
  }

  /** Exact fold-down to a smaller precision. A register's hash-prefix
    * positions are absolute (k = q + p − 1 with the index bits above),
    * so registers whose dropped index bits are all zero transfer
    * verbatim; otherwise every hash in the register shares the q
    * determined by the dropped bits' leading zeros, contributing one
    * position. */
  def downsize(targetP: Int): GraftUll = {
    require(targetP >= 3 && targetP <= p, s"bad downsize target $targetP")
    if (targetP == p) return this
    val d = GraftUll(targetP)
    val shift = p - targetP
    var idx = 0
    while (idx < state.length) {
      if (state(idx) != 0) {
        val idx1 = idx >>> shift
        val dropped = idx & ((1 << shift) - 1)
        val addPrefix =
          if (dropped == 0) unpack(state(idx))
          else {
            // dropped index bits become the head of the value part:
            // q1 = their leading-zero count within `shift` bits
            val q1 = shift - (32 - java.lang.Integer.numberOfLeadingZeros(dropped))
            1L << (q1 + targetP - 1)
          }
        d.state(idx1) = pack(unpack(d.state(idx1)) | addPrefix)
      }
      idx += 1
    }
    d
  }

  def isEmpty: Boolean = state.forall(_ == 0)

  /** Reference-wire-format blob: [byte p][2^p registers]. */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](state.length + 1)
    out(0) = p.toByte
    System.arraycopy(state, 0, out, 1, state.length)
    out
  }

  /** ML estimate of the distinct count. */
  def estimate: Double = {
    // histogram the registers: empty count + per-(Q, b1, b0) counts
    var empty = 0
    val hist = new Array[Int](256)
    var i = 0
    while (i < state.length) {
      val r = state(i) & 0xff
      if (r == 0) empty += 1
      else hist(r) += 1
      i += 1
    }
    if (empty == state.length) return 0.0
    val qMax = 64 - p
    // per-register probability that a value lands on q-level j
    def pOf(j: Int): Double =
      if (j < qMax) math.pow(2.0, -(j + 1).toDouble)
      else math.pow(2.0, -qMax.toDouble)
    // P(q > Q) — the "nothing above" mass
    def pAbove(qq: Int): Double =
      if (qq >= qMax) 0.0 else math.pow(2.0, -(qq + 1).toDouble)
    // derivative of the total log-likelihood wrt λ
    def dLogLik(lambda: Double): Double = {
      var d = -empty.toDouble // d/dλ of empty-register term -λ·empty
      var r = 1
      while (r < 256) {
        val n = hist(r).toDouble
        if (n > 0) {
        val k = r >>> 2
        val q = k - p + 1
        val b1 = (r >> 1) & 1
        val b0 = r & 1
        var dr = -pAbove(q) // no values above Q
        // at least one at Q: d/dλ log(1 - e^{-λ pQ}) = pQ e^{-λpQ}/(1-e^{-λpQ})
        val pq = pOf(q)
        dr += pq * math.exp(-lambda * pq) / (1 - math.exp(-lambda * pq))
        // the two tracked levels below Q (flag bits exist only when
        // the positions are above the index boundary)
        if (q - 1 >= 0 && k - 1 >= p - 1) {
          val pj = pOf(q - 1)
          if (b1 == 1)
            dr += pj * math.exp(-lambda * pj) / (1 - math.exp(-lambda * pj))
          else dr += -pj
        }
        if (q - 2 >= 0 && k - 2 >= p - 1) {
          val pj = pOf(q - 2)
          if (b0 == 1)
            dr += pj * math.exp(-lambda * pj) / (1 - math.exp(-lambda * pj))
          else dr += -pj
        }
        d += n * dr
        }
        r += 1
      }
      d
    }
    // concave in λ → bisect the monotone derivative on a wide bracket
    var lo = 1e-9
    var hi = 1e18
    if (dLogLik(lo) <= 0) return lo * m
    var iter = 0
    while (iter < 200 && hi / lo > 1 + 1e-12) {
      val mid = math.sqrt(lo * hi) // geometric — λ spans many decades
      if (dLogLik(mid) > 0) lo = mid else hi = mid
      iter += 1
    }
    math.sqrt(lo * hi) * m
  }
}

object GraftUll {
  /** Reference default (`CommonConstants.Helix.DEFAULT_ULTRALOGLOG_P`). */
  val DefaultP = 12

  def apply(p: Int = DefaultP): GraftUll = {
    require(p >= 3 && p <= 26, s"p out of range: $p")
    new GraftUll(p, new Array[Byte](1 << p))
  }

  /** u = (k << 2) | t ←→ hash-prefix with leading bit at k and the
    * two bits below preserved. */
  private[plans] def unpack(register: Byte): Long = {
    val r = register & 0xff
    if (r == 0) 0L
    else (4L | (r & 3)) << ((r >>> 2) - 2)
  }

  private[plans] def pack(prefix: Long): Byte = {
    val nlz = java.lang.Long.numberOfLeadingZeros(prefix)
    val k = 63 - nlz
    (((k << 2) | ((prefix >>> (k - 2)) & 3)).toInt & 0xff).toByte
  }

  def fromBytes(bytes: Array[Byte]): GraftUll = {
    val p = bytes(0).toInt
    require(bytes.length == (1 << p) + 1,
      s"bad UltraLogLog blob: p=$p len=${bytes.length}")
    val st = new Array[Byte](1 << p)
    System.arraycopy(bytes, 1, st, 0, st.length)
    new GraftUll(p, st)
  }
}

/** DISTINCTCOUNTULL(col[, p]) → long estimate; DISTINCTCOUNTRAWULL →
  * wire-format blob. BYTES children are treated as serialized
  * sketches and merged (the reference's re-aggregation path);
  * ArrayType children feed every element (MV). */
case class UllAgg(
    child: Expression,
    p: Int,
    emitBlob: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftUll] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType
  override def prettyName: String =
    if (emitBlob) "distinct_count_raw_ull" else "distinct_count_ull"

  override def createAggregationBuffer(): GraftUll = GraftUll(p)

  override def update(buf0: GraftUll, row: InternalRow): GraftUll = {
    var buf = buf0
    def one(x: Any): Unit = x match {
      // BYTES: stored sketch — fold precisions per combine()
      case b: Array[Byte] =>
        buf = UltraLogLogSketch.combine(buf, GraftUll.fromBytes(b))
      case i: Int => buf.addHash(WyHashFinal4.hashInt(i))
      case l: Long => buf.addHash(WyHashFinal4.hashLong(l))
      case f: Float => buf.addHash(WyHashFinal4.hashFloat(f))
      case d: Double => buf.addHash(WyHashFinal4.hashDouble(d))
      case s: UTF8String => buf.addHash(WyHashFinal4.hashString(s.toString))
      case s: String => buf.addHash(WyHashFinal4.hashString(s))
      case d: org.apache.spark.sql.types.Decimal =>
        buf.addHash(WyHashFinal4.hashString(d.toJavaBigDecimal.toString))
      case n: Number => buf.addHash(WyHashFinal4.hashLong(n.longValue()))
    }
    child.eval(row) match {
      case null => ()
      case arr: org.apache.spark.sql.catalyst.util.ArrayData
          if child.dataType.isInstanceOf[ArrayType] =>
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

  override def merge(buf: GraftUll, other: GraftUll): GraftUll =
    UltraLogLogSketch.combine(buf, other)

  override def eval(buf: GraftUll): Any =
    if (emitBlob) buf.toBytes
    else math.round(buf.estimate)

  override def serialize(buf: GraftUll): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): GraftUll = GraftUll.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): UllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object UltraLogLogSketch {

  /** Merge two sketches, folding mixed precisions to the SMALLER p
    * (the reference/hash4j rule) and letting an empty buffer adopt
    * the other's precision; may return either argument. */
  private[plans] def combine(a: GraftUll, b: GraftUll): GraftUll =
    if (a.p == b.p) { a.merge(b); a }
    else if (a.isEmpty) b
    else if (b.isEmpty) a
    else if (b.p < a.p) { val f = a.downsize(b.p); f.merge(b); f }
    else { a.merge(b); a } // b.p > a.p: merge folds b down

  def distinctCountUll(c: Column, p: Int = GraftUll.DefaultP): Column =
    ColumnBridge.column(UllAgg(ColumnBridge.expression(c), p,
      emitBlob = false).toAggregateExpression())

  def ullState(c: Column, p: Int = GraftUll.DefaultP): Column =
    ColumnBridge.column(UllAgg(ColumnBridge.expression(c), p,
      emitBlob = true).toAggregateExpression())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def num(e: Expression): Int = e.eval().toString.toDouble.toInt
    reg.createOrReplaceTempFunction("distinctcountull",
      (e: Seq[Expression]) => UllAgg(e.head,
        if (e.size > 1) num(e(1)) else GraftUll.DefaultP,
        emitBlob = false), "built-in")
    reg.createOrReplaceTempFunction("distinctcountrawull",
      (e: Seq[Expression]) => UllAgg(e.head,
        if (e.size > 1) num(e(1)) else GraftUll.DefaultP,
        emitBlob = true), "built-in")
  }
}
