package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One event in a funnel buffer: timestamp, 0-based step id (-1 = an
  * untagged event kept under KEEP_ALL mode), optional extra-field values
  * (FUNNELEVENTSFUNCTIONEVAL only). Ordering mirrors the reference's
  * `FunnelStepEvent.compareTo` (pinot-core
  * `funnel/FunnelStepEvent.java:85-93`): by timestamp, ties by step. */
private[plans] final case class FunnelEvt(ts: Long, step: Int, ext: Seq[String])

/** SQL-callable funnel window aggregates — the reference's windowed
  * funnel family (`AggregationFunctionType.java` FUNNELMAXSTEP,
  * FUNNELCOMPLETECOUNT, FUNNELMATCHSTEP, FUNNELSTEPDURATIONSTATS,
  * FUNNELEVENTSFUNCTIONEVAL; impls in
  * `pinot-core/.../aggregation/function/funnel/window/`), re-expressed
  * as one Spark `TypedImperativeAggregate` parameterized by output kind.
  *
  * SQL surface mirrors the reference's argument convention
  * (`FunnelBaseAggregationFunction.java:33-77`):
  * {{{
  *   funnelmaxstep(tsMillis, windowSize, numSteps, step1Bool, ..., [modes])
  * }}}
  * where trailing string literals are modes (`STRICT_ORDER`,
  * `STRICT_DEDUPLICATION`, `STRICT_INCREASE`, `KEEP_ALL`,
  * `MODE=a,b`, `MAXSTEPDURATION=n`, and for duration stats
  * `DURATIONFUNCTIONS=avg,min,max,median,count`).
  *
  * Scale design: the buffer that crosses the shuffle is the per-entity
  * tagged-event list — identical in size to what the reference's
  * PriorityQueue holds per group (`FunnelBaseAggregationFunction
  * .aggregate`), with partial aggregation putting the collect on the map
  * side. Untagged events never enter the buffer (unless KEEP_ALL, same
  * as the reference). The window replay in `eval` is a faithful port of
  * `fillWindow`/`processWindow`/`extractFinalResult` — including the
  * reference's exit-on-drained-queue behavior — so results are
  * bit-compatible. The DataFrame-native one-shuffle variants live in
  * [[graft.operators.Funnel]]; this class is the SQL-name-compatible
  * surface. One divergence, documented: FUNNELSTEPDURATIONSTATS
  * computes MEDIAN/MIN/MAX over exact retained durations where the
  * reference uses a QuantileDigest estimate
  * (`FunnelStepDurationStatsAggregationFunction.java:148-149`); AVG and
  * COUNT are exact in both. */
case class FunnelWindowAgg(
    kind: String,
    tsExpr: Expression,
    stepExprs: Seq[Expression],
    extraExprs: Seq[Expression],
    windowSize: Long,
    numSteps: Int,
    strictDedup: Boolean,
    strictOrder: Boolean,
    strictIncrease: Boolean,
    keepAll: Boolean,
    maxStepDuration: Long,
    durationFns: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[FunnelEvt]] {

  override def children: Seq[Expression] = (tsExpr +: stepExprs) ++ extraExprs
  override def nullable: Boolean = false
  override def dataType: DataType = kind match {
    case "maxstep" | "completecount" => IntegerType
    case "matchstep" => ArrayType(IntegerType, containsNull = false)
    case "durationstats" => ArrayType(DoubleType, containsNull = false)
    case "eventseval" => ArrayType(StringType, containsNull = false)
    case other => throw new IllegalArgumentException(s"unknown funnel kind: $other")
  }
  override def prettyName: String = s"funnel$kind"

  override def createAggregationBuffer(): mutable.ArrayBuffer[FunnelEvt] =
    mutable.ArrayBuffer.empty[FunnelEvt]

  private def tsOf(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case other => other.toString.toLong
  }

  override def update(buf: mutable.ArrayBuffer[FunnelEvt], row: InternalRow)
      : mutable.ArrayBuffer[FunnelEvt] = {
    val tsv = tsExpr.eval(row)
    if (tsv != null) {
      // first matching step predicate wins (reference `aggregate` loop:
      // FunnelBaseAggregationFunction.java:116-124 breaks on first hit)
      var found = -1
      var j = 0
      while (found < 0 && j < numSteps) {
        if (stepExprs(j).eval(row) == true) found = j
        j += 1
      }
      if (found >= 0 || keepAll) {
        val ext =
          if (extraExprs.isEmpty) Nil
          else extraExprs.map { e =>
            val v = e.eval(row)
            if (v == null) "" else v.toString
          }
        buf += FunnelEvt(tsOf(tsv), found, ext)
      }
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[FunnelEvt],
      other: mutable.ArrayBuffer[FunnelEvt]): mutable.ArrayBuffer[FunnelEvt] = {
    buf ++= other
    buf
  }

  override def serialize(buf: mutable.ArrayBuffer[FunnelEvt]): Array[Byte] = {
    var bytes = 4
    val encoded = buf.map { e =>
      val eb = e.ext.map(_.getBytes(StandardCharsets.UTF_8))
      bytes += 8 + 4 + 4 + eb.map(4 + _.length).sum
      (e, eb)
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    encoded.foreach { case (e, eb) =>
      bb.putLong(e.ts)
      bb.putInt(e.step)
      bb.putInt(eb.size)
      eb.foreach { b => bb.putInt(b.length); bb.put(b) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[FunnelEvt] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val ts = bb.getLong
      val step = bb.getInt
      val nExt = bb.getInt
      val ext = Seq.fill(nExt) {
        val len = bb.getInt
        val eb = new Array[Byte](len)
        bb.get(eb)
        new String(eb, StandardCharsets.UTF_8)
      }
      buf += FunnelEvt(ts, step, ext)
      i += 1
    }
    buf
  }

  /** Faithful replay of the reference's queue + sliding-window walk. */
  private final class Sim(events: Array[FunnelEvt]) {
    var qi = 0 // head of the sorted "PriorityQueue"
    val win = new java.util.ArrayDeque[FunnelEvt]()
    def queueNonEmpty: Boolean = qi < events.length

    /** `FunnelBaseAggregationFunction.fillWindow` (:267-299). */
    def fillWindow(): Unit = {
      while (!win.isEmpty && win.peekFirst.step != 0) win.pollFirst()
      if (win.isEmpty) {
        while (qi < events.length && events(qi).step != 0) qi += 1
        if (qi >= events.length) return
        win.addLast(events(qi)); qi += 1
      }
      val windowEnd = win.peekFirst.ts + windowSize
      var go = true
      while (go && qi < events.length && events(qi).ts < windowEnd) {
        if (maxStepDuration > 0 &&
          events(qi).ts - win.peekLast.ts > maxStepDuration) go = false
        else { win.addLast(events(qi)); qi += 1 }
      }
    }
  }

  /** `FunnelMaxStepAggregationFunction.processWindow` (:71-108) — also
    * the duration-stats variant's window scorer. */
  private def processWindow(win: java.util.ArrayDeque[FunnelEvt]): Int = {
    var maxStep = 0
    var prevTs = -1L
    val it = win.iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = e.step
      if (strictDedup && s == maxStep - 1) return maxStep
      if (strictOrder && s != maxStep) return maxStep
      if (!(strictIncrease && prevTs == e.ts)) {
        if (maxStep == s) { maxStep += 1; prevTs = e.ts }
        if (maxStep == numSteps) return maxStep
      }
    }
    maxStep
  }

  private def evalMaxStep(sim: Sim): Int = {
    var finalMax = 0
    var go = true
    while (go && sim.queueNonEmpty) {
      sim.fillWindow()
      if (sim.win.isEmpty) go = false
      else {
        finalMax = math.max(finalMax, processWindow(sim.win))
        if (finalMax == numSteps) go = false
        else if (!sim.win.isEmpty) sim.win.pollFirst()
      }
    }
    finalMax
  }

  /** `FunnelCompleteCountAggregationFunction.extractFinalResult`
    * (:48-108): counts completed rounds across the event stream,
    * resetting after each completion; the window then re-anchors at the
    * completing event. */
  private def evalCompleteCount(sim: Sim): Int = {
    var total = 0
    var go = true
    while (go && sim.queueNonEmpty) {
      sim.fillWindow()
      if (sim.win.isEmpty) go = false
      else {
        var windowStart = sim.win.peekFirst.ts
        var maxStep = 0
        var prevTs = -1L
        val it = sim.win.iterator()
        while (it.hasNext) {
          val e = it.next()
          val s = e.step
          if (strictDedup && s == maxStep - 1) maxStep = 0
          if (strictOrder && s != maxStep) maxStep = 0
          if (strictIncrease && prevTs == e.ts) {
            // skip: conditions apply only to strictly increasing ts
          } else {
            prevTs = e.ts
            if (maxStep == s) maxStep += 1
            if (maxStep == numSteps) {
              total += 1
              maxStep = 0
              windowStart = e.ts
            }
          }
        }
        if (!sim.win.isEmpty) sim.win.pollFirst()
        while (!sim.win.isEmpty && sim.win.peekFirst.ts < windowStart)
          sim.win.pollFirst()
      }
    }
    total
  }

  /** `FunnelStepDurationStatsAggregationFunction.extractFinalResult`
    * (:95-160): durations between first-per-step events of every
    * COMPLETING window; partial windows only set reached flags. */
  private def evalDurationStats(sim: Sim): GenericArrayData = {
    val reached = new Array[Int](numSteps)
    val durations = Array.fill(numSteps)(mutable.ArrayBuffer.empty[Long])
    var hasMatched = false
    val countRequested = durationFns.contains("COUNT")
    var go = true
    while (go && sim.queueNonEmpty) {
      sim.fillWindow()
      if (sim.win.isEmpty) go = false
      else {
        val maxSteps = processWindow(sim.win)
        if (maxSteps == numSteps) {
          // applyStepDurations (:132-160): first event per step in window
          // order defines the step timestamps
          val stepTs = mutable.ArrayBuffer.empty[Long]
          val it = sim.win.iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.step >= 0 && stepTs.size <= e.step) stepTs += e.ts
          }
          var i = 0
          while (i < stepTs.size - 1) {
            durations(i) += stepTs(i + 1) - stepTs(i)
            reached(i) = 1
            i += 1
          }
          reached(numSteps - 1) = 1
          hasMatched = true
        } else {
          var i = 0
          while (i < maxSteps) { reached(i) = 1; i += 1 }
        }
        if (!sim.win.isEmpty) sim.win.pollFirst()
      }
    }
    val canSkip = !countRequested // reference `_canSkipNonMatchedFunnel`
    if (canSkip && !hasMatched) return new GenericArrayData(Array.empty[Double])
    val out = mutable.ArrayBuffer.empty[Double]
    var step = 0
    while (step < numSteps) {
      val ds = durations(step)
      durationFns.foreach {
        case "COUNT" => out += reached(step).toDouble
        case fn =>
          // reference emits the null placeholder (0d) for the last step
          // and for unmatched funnels (:198-201)
          if (!hasMatched || step == numSteps - 1 || ds.isEmpty) out += 0.0
          else fn match {
            case "AVG" => out += ds.sum.toDouble / ds.size
            case "MIN" => out += ds.min.toDouble
            case "MAX" => out += ds.max.toDouble
            case "MEDIAN" =>
              val sorted = ds.sorted
              out += sorted((sorted.size - 1) / 2).toDouble
            case p if p.startsWith("PERCENTILE") =>
              val q = p.substring("PERCENTILE".length).toDouble / 100.0
              val sorted = ds.sorted
              val idx = math.min(sorted.size - 1,
                math.max(0, math.ceil(q * sorted.size).toInt - 1))
              out += sorted(idx).toDouble
            case other =>
              throw new IllegalArgumentException(s"duration fn: $other")
          }
      }
      step += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** `FunnelEventsFunctionEvalAggregationFunction.extractFinalResult`
    * (:454-517): complete-count walk collecting, per completed round,
    * the extra-field values of the first event at each step; output is
    * the reference's flattened header + values string list. */
  private def evalEventsEval(sim: Sim): GenericArrayData = {
    // each element: per matched round, the flattened extra-field values
    // (numSteps step-events × numExtraFields values)
    val matched = mutable.ArrayBuffer.empty[Seq[String]]
    var go = true
    while (go && sim.queueNonEmpty) {
      sim.fillWindow()
      if (sim.win.isEmpty) go = false
      else {
        var windowStart = sim.win.peekFirst.ts
        var maxStep = 0
        var prevTs = -1L
        val it = sim.win.iterator()
        while (it.hasNext) {
          val e = it.next()
          val s = e.step
          if (strictDedup && s == maxStep - 1) maxStep = 0
          if (strictOrder && s != maxStep) maxStep = 0
          if (strictIncrease && prevTs == e.ts) {
            // skip
          } else {
            prevTs = e.ts
            if (maxStep == s) maxStep += 1
            if (maxStep == numSteps) {
              // extractFunnelEventsExtraFields (:535-548): first event
              // at each step, its extra fields flattened in order
              val exts = mutable.ArrayBuffer.empty[String]
              var step = 0
              val wit = sim.win.iterator()
              while (wit.hasNext && step < numSteps) {
                val w = wit.next()
                if (w.step == step) { exts ++= w.ext; step += 1 }
              }
              matched += exts.toSeq
              maxStep = 0
              windowStart = e.ts
            }
          }
        }
        if (!sim.win.isEmpty) sim.win.pollFirst()
        while (!sim.win.isEmpty && sim.win.peekFirst.ts < windowStart)
          sim.win.pollFirst()
      }
    }
    // evalFunctionOnMatchedFunnelEvents (:519-533): header row = number
    // of matched rounds followed by each round's flattened value count,
    // then all values
    val header =
      matched.size.toString + matched.map(m => ", " + m.size).mkString
    val out = header +: matched.flatten.toSeq
    new GenericArrayData(out.map(UTF8String.fromString).toArray[Any])
  }

  override def eval(buf: mutable.ArrayBuffer[FunnelEvt]): Any = {
    val sorted = buf.toArray.sortBy(e => (e.ts, e.step))
    val sim = new Sim(sorted)
    kind match {
      case "maxstep" => evalMaxStep(sim)
      case "completecount" => evalCompleteCount(sim)
      case "matchstep" =>
        val m = evalMaxStep(sim)
        new GenericArrayData(Array.tabulate(numSteps)(i => if (i < m) 1 else 0))
      case "durationstats" => evalDurationStats(sim)
      case "eventseval" => evalEventsEval(sim)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): FunnelWindowAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FunnelWindowAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = {
    val n = numSteps
    copy(tsExpr = c.head, stepExprs = c.slice(1, 1 + n),
      extraExprs = c.drop(1 + n))
  }
}

/** FUNNELCOUNT — the non-windowed, set-intersection funnel (reference
  * `funnel/FunnelCountAggregationFunction.java` with
  * `SetMergeStrategy.java:30-44`): per group, step k's result is the
  * count of distinct correlation values present in ALL of steps 1..k
  * (cumulative retainAll). No time ordering — membership only.
  *
  * SQL: `funnelcount(correlateBy, numSteps, step1Bool, ...)` →
  * ARRAY<LONG>. Correlation values are tracked as 64-bit hashes
  * (fixed-seed xxhash64) so the shuffle state is bounded by distinct
  * correlation ids × steps, matching the reference's bitmap strategy
  * (dict-id bitmaps per step). */
case class FunnelCountAgg(
    corrExpr: Expression,
    stepExprs: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[mutable.HashSet[Long]]] {

  private def numSteps = stepExprs.size

  override def children: Seq[Expression] = corrExpr +: stepExprs
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "funnelcount"

  override def createAggregationBuffer(): Array[mutable.HashSet[Long]] =
    Array.fill(numSteps)(mutable.HashSet.empty[Long])

  override def update(buf: Array[mutable.HashSet[Long]], row: InternalRow)
      : Array[mutable.HashSet[Long]] = {
    val v = corrExpr.eval(row)
    if (v != null) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, corrExpr.dataType, 42L)
      var j = 0
      while (j < numSteps) {
        if (stepExprs(j).eval(row) == true) buf(j) += h
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[mutable.HashSet[Long]],
      other: Array[mutable.HashSet[Long]]): Array[mutable.HashSet[Long]] = {
    var i = 0
    while (i < numSteps) { buf(i) ++= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[mutable.HashSet[Long]]): Any = {
    // SetMergeStrategy.extractFinalResult: cumulative intersection
    val out = new Array[Long](numSteps)
    var acc = buf(0)
    out(0) = acc.size.toLong
    var i = 1
    while (i < numSteps) {
      acc = buf(i).intersect(acc)
      out(i) = acc.size.toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[mutable.HashSet[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.map(s => 4 + s.size * 8).sum)
    bb.putInt(numSteps)
    buf.foreach { s =>
      bb.putInt(s.size)
      s.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[mutable.HashSet[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n) {
      val sz = bb.getInt
      val s = mutable.HashSet.empty[Long]
      var i = 0
      while (i < sz) { s += bb.getLong; i += 1 }
      s
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): FunnelCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FunnelCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(corrExpr = c.head, stepExprs = c.tail)
}

/** TIMESERIESAGGREGATE — the time-series engine's bucketed aggregate
  * (reference `TimeSeriesAggregationFunction.java:75-140`): buckets a
  * time column into `numBuckets` fixed windows anchored at
  * `firstBucketValue` and aggregates the value column per bucket,
  * returning ARRAY<DOUBLE> of length numBuckets (null placeholder 0).
  *
  * SQL mirrors the reference's 10-argument form:
  * `timeseriesaggregate(language, aggFn, valueExpr, timeExpr, timeUnit,
  * offsetSeconds, firstBucketValue, bucketLenSeconds, numBuckets,
  * params)`. Supported aggFns: SUM, MIN, MAX, COUNT, AVG (the M3QL/PromQL
  * builder SPI reduces to these leaf aggregations). */
case class TimeSeriesAgg(
    valueExpr: Expression,
    timeExpr: Expression,
    aggFn: String,
    rawUnitsPerSec: Long, // e.g. MILLISECONDS → 1000
    offsetSeconds: Long,
    firstBucketValue: Long,
    bucketLenSeconds: Long,
    numBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(valueExpr, timeExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "timeseriesaggregate"

  override def createAggregationBuffer(): Array[(Double, Long)] = {
    val init = aggFn match {
      case "MIN" => Double.PositiveInfinity
      case "MAX" => Double.NegativeInfinity
      case _ => 0.0
    }
    Array.fill(numBuckets)((init, 0L))
  }

  private def bucketOf(rawTime: Long): Int = {
    // reference `TimeSeriesAggregationFunction.java:235`:
    // ((t + timeOffset) - timeReferencePoint - 1) / timeBucketDivisor,
    // all in the raw time unit, truncating division
    val ref = (firstBucketValue - bucketLenSeconds) * rawUnitsPerSec
    val off = offsetSeconds * rawUnitsPerSec
    val idx = ((rawTime + off) - ref - 1) / (bucketLenSeconds * rawUnitsPerSec)
    idx.toInt
  }

  override def update(buf: Array[(Double, Long)], row: InternalRow)
      : Array[(Double, Long)] = {
    val tv = timeExpr.eval(row)
    val vv = valueExpr.eval(row)
    if (tv != null && vv != null) {
      val t = tv match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => other.toString.toLong
      }
      val v = vv match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => other.toString.toDouble
      }
      val b = bucketOf(t)
      if (b >= 0 && b < numBuckets) {
        val (acc, n) = buf(b)
        buf(b) = aggFn match {
          case "SUM" | "AVG" => (acc + v, n + 1)
          case "MIN" => (math.min(acc, v), n + 1)
          case "MAX" => (math.max(acc, v), n + 1)
          case "COUNT" => (acc + 1.0, n + 1)
          case other => throw new IllegalArgumentException(s"aggFn: $other")
        }
      }
    }
    buf
  }

  override def merge(buf: Array[(Double, Long)],
      other: Array[(Double, Long)]): Array[(Double, Long)] = {
    var i = 0
    while (i < numBuckets) {
      val (a, na) = buf(i)
      val (b, nb) = other(i)
      buf(i) = aggFn match {
        case "MIN" => (math.min(a, b), na + nb)
        case "MAX" => (math.max(a, b), na + nb)
        case _ => (a + b, na + nb)
      }
      i += 1
    }
    buf
  }

  override def eval(buf: Array[(Double, Long)]): Any = {
    val out = buf.map { case (acc, n) =>
      if (n == 0L) 0.0 // reference NullValuePlaceHolder.DOUBLE
      else aggFn match {
        case "AVG" => acc / n
        case _ => acc
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + numBuckets * 16)
    bb.putInt(numBuckets)
    buf.foreach { case (d, n) => bb.putDouble(d); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)((bb.getDouble, bb.getLong))
  }

  override def withNewMutableAggBufferOffset(o: Int): TimeSeriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TimeSeriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(valueExpr = c(0), timeExpr = c(1))
}

object FunnelAgg {

  private def lit(e: Expression): Any = e.eval()
  private def litStr(e: Expression): String = {
    val v = lit(e)
    v match {
      case u: UTF8String => u.toString
      case other => other.toString
    }
  }
  private def litLong(e: Expression): Long = lit(e).toString.toLong
  private def litInt(e: Expression): Int = lit(e).toString.toInt

  /** Parse the windowed family's argument convention
    * (`FunnelBaseAggregationFunction.java:33-77`; events-eval adds
    * `numExtraFields, extraExpr...` after the steps per
    * `FunnelEventsFunctionEvalAggregationFunction.java:77-84`). */
  private def buildWindow(kind: String, exprs: Seq[Expression],
      withExtra: Boolean): Expression = {
    require(exprs.size >= 4,
      s"funnel$kind(ts, windowSize, numSteps, step1, ..., [modes])")
    val ts = exprs.head
    val windowSize = litLong(exprs(1))
    val numSteps = litInt(exprs(2))
    require(exprs.size >= 3 + numSteps, s"expected $numSteps step expressions")
    val steps = exprs.slice(3, 3 + numSteps)
    var tail = exprs.drop(3 + numSteps)
    val extra = if (withExtra) {
      require(tail.nonEmpty, s"funnel$kind expects numExtraFields after steps")
      val nExtra = litInt(tail.head)
      require(tail.size >= 1 + nExtra, s"expected $nExtra extra expressions")
      val es = tail.slice(1, 1 + nExtra)
      tail = tail.drop(1 + nExtra)
      es
    } else Seq.empty[Expression]
    var dedup = false; var order = false; var inc = false; var keepAll = false
    var maxDur = 0L
    var durationFns = Seq.empty[String]
    def addMode(m: String): Unit = m.trim.toUpperCase match {
      case "STRICT_DEDUPLICATION" => dedup = true
      case "STRICT_ORDER" => order = true
      case "STRICT_INCREASE" => inc = true
      case "KEEP_ALL" => keepAll = true
      case other => throw new IllegalArgumentException(s"funnel mode: $other")
    }
    tail.foreach { t =>
      val s = litStr(t).toUpperCase
      s.split("=") match {
        case Array(k, v) => k match {
          case "MAXSTEPDURATION" => maxDur = v.toLong
          case "MODE" => v.split(",").foreach(addMode)
          case "DURATIONFUNCTIONS" =>
            durationFns = v.split(",").map(_.trim.toUpperCase).toSeq
          case other => throw new IllegalArgumentException(s"funnel arg: $other")
        }
        case _ => addMode(s)
      }
    }
    if (kind == "durationstats")
      require(durationFns.nonEmpty,
        "funnelstepdurationstats requires DURATIONFUNCTIONS=...")
    FunnelWindowAgg(kind, ts, steps, extra, windowSize, numSteps,
      dedup, order, inc, keepAll, maxDur, durationFns)
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def register(name: String)(build: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, build, "built-in")

    register("funnelmaxstep")(buildWindow("maxstep", _, withExtra = false))
    register("funnelcompletecount")(
      buildWindow("completecount", _, withExtra = false))
    register("funnelmatchstep")(buildWindow("matchstep", _, withExtra = false))
    register("funnelstepdurationstats")(
      buildWindow("durationstats", _, withExtra = false))
    register("funneleventsfunctioneval")(
      buildWindow("eventseval", _, withExtra = true))
    register("funnelcount") { exprs =>
      require(exprs.size >= 3, "funnelcount(correlateBy, numSteps, step1, ...)")
      val numSteps = litInt(exprs(1))
      require(exprs.size >= 2 + numSteps, s"expected $numSteps step expressions")
      FunnelCountAgg(exprs.head, exprs.slice(2, 2 + numSteps))
    }
    register("timeseriesaggregate") { exprs =>
      require(exprs.size == 10,
        "timeseriesaggregate(language, aggFn, value, time, timeUnit, " +
          "offsetSec, firstBucketValue, bucketLenSec, numBuckets, params)")
      val unitsPerSec = litStr(exprs(4)).toUpperCase match {
        case "MILLISECONDS" => 1000L
        case "SECONDS" => 1L
        case "MICROSECONDS" => 1000000L
        case "NANOSECONDS" => 1000000000L
        case other => throw new IllegalArgumentException(s"timeUnit: $other")
      }
      TimeSeriesAgg(exprs(2), exprs(3), litStr(exprs(1)).toUpperCase,
        unitsPerSec, litLong(exprs(5)), litLong(exprs(6)), litLong(exprs(7)),
        litInt(exprs(8)))
    }
  }

  /** Column API mirrors for the DataFrame path. */
  def funnelMaxStep(ts: Column, windowMillis: Long, steps: Seq[Column]): Column =
    ColumnBridge.column(FunnelWindowAgg("maxstep",
      ColumnBridge.expression(ts), steps.map(ColumnBridge.expression),
      Nil, windowMillis, steps.size, strictDedup = false, strictOrder = false,
      strictIncrease = false, keepAll = false, 0L, Nil).toAggregateExpression())

  def funnelCompleteCount(ts: Column, windowMillis: Long,
      steps: Seq[Column]): Column =
    ColumnBridge.column(FunnelWindowAgg("completecount",
      ColumnBridge.expression(ts), steps.map(ColumnBridge.expression),
      Nil, windowMillis, steps.size, strictDedup = false, strictOrder = false,
      strictIncrease = false, keepAll = false, 0L, Nil).toAggregateExpression())

  def funnelCountSets(corr: Column, steps: Seq[Column]): Column =
    ColumnBridge.column(FunnelCountAgg(ColumnBridge.expression(corr),
      steps.map(ColumnBridge.expression)).toAggregateExpression())
}
