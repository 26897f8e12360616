package graft.plans

import java.util.Base64

import org.apache.datasketches.cpc.{CpcSketch, CpcUnion}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.UpdateSketch
import org.apache.datasketches.tuple.{Intersection => DsTupleIntersection,
  AnotB => DsTupleAnotB, Union => DsTupleUnion}
import org.apache.datasketches.tuple.aninteger.{IntegerSketch, IntegerSummary,
  IntegerSummarySetOperations}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `SketchFunctions.java` scalar statics
  * (`pinot-core/.../core/function/scalar/SketchFunctions.java`) —
  * row-level sketch CREATION (`toThetaSketch`, `toHLL`,
  * `toIntegerSumTupleSketch`, `toCpcSketch`, `toULL`), blob algebra
  * for the integer-sum tuple family (`int{Sum,Min,Max}TupleSketch
  * {Union,Intersect}`, `intSumTupleSketchDiff`), estimates, and text
  * rendering. These are the documented way to materialize sketch
  * columns inside ingestion transforms, so they are first-class here;
  * the theta blob algebra (`thetaSketchUnion`/`Intersect`/`Diff`,
  * `getThetaSketchEstimate`) already lives in [[ThetaSketchDs]].
  *
  * One CodegenFallback expression with a name dispatch — every
  * function is a per-row scalar over at most 5 arguments, off the
  * hot aggregation path (the aggregates in ThetaDs/HllSketch/… stay
  * codegen-planned). Inputs follow the reference's Object-typed
  * runtime dispatch: numerics, strings, BigDecimal, and raw bytes;
  * sketch-blob arguments accept bytes or base64 text, as the
  * reference's `asThetaSketch`/`asIntegerSketch`/`asCpcSketch` do.
  * Defaults mirror CommonConstants.Helix: theta 16384 nominal, HLL
  * log2m 8, tuple lgK 14, CPC lgK 12, ULL p 12. */
case class SketchScalar(fname: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = fname match {
    case "getinttuplesketchestimate" | "getcpcsketchestimate" => LongType
    case "thetasketchtostring" | "cpcsketchtostring" => StringType
    case _ => BinaryType
  }
  override def prettyName: String = fname

  private def obj(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case d: Decimal => d.toJavaBigDecimal
    case x => x
  }

  private def blob(v: Any): Array[Byte] = obj(v) match {
    case b: Array[Byte] => b
    case s: String => Base64.getDecoder.decode(s)
    case other => throw new IllegalArgumentException(
      s"$fname: unsupported sketch argument type " +
        other.getClass.getSimpleName)
  }

  private def int(v: Any, dflt: Int): Int = obj(v) match {
    case null => dflt
    case n: Number => n.intValue()
    case s: String => s.toDouble.toInt
    case other => throw new IllegalArgumentException(
      s"$fname: expected a numeric parameter, got $other")
  }

  private def thetaUpdate(sk: UpdateSketch, v: Any): Unit = obj(v) match {
    case null => ()
    case i: java.lang.Integer => sk.update(i.longValue())
    case l: java.lang.Long => sk.update(l.longValue())
    case f: java.lang.Float => sk.update(f.doubleValue())
    case d: java.lang.Double => sk.update(d.doubleValue())
    case b: java.math.BigDecimal => sk.update(b.toString)
    case s: String => sk.update(s)
    case b: Array[Byte] => sk.update(b)
    case other => throw new IllegalArgumentException(
      s"Unrecognised input type for Theta sketch: " +
        other.getClass.getSimpleName)
  }

  private def tupleMode(name: String): IntegerSummary.Mode =
    if (name.contains("min")) IntegerSummary.Mode.Min
    else if (name.contains("max")) IntegerSummary.Mode.Max
    else IntegerSummary.Mode.Sum

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    fname match {
      case "tothetasketch" =>
        val sk = UpdateSketch.builder()
          .setNominalEntries(if (vs.size > 1) int(vs(1), 16384) else 16384)
          .build()
        thetaUpdate(sk, vs.head)
        sk.compact().toByteArray

      case "tohll" =>
        val h = new com.clearspring.analytics.stream.cardinality.HyperLogLog(
          if (vs.size > 1) int(vs(1), 8) else 8)
        obj(vs.head) match {
          case null => ()
          case x => h.offer(x)
        }
        h.getBytes

      case "tointegersumtuplesketch" =>
        val lgK = if (vs.size > 2) int(vs(2), 14) else 14
        val sk = new IntegerSketch(lgK, IntegerSummary.Mode.Sum)
        (obj(vs.head), obj(vs(1))) match {
          case (null, _) | (_, null) => ()
          case (key, v) =>
            val value = v.asInstanceOf[Number].intValue()
            key match {
              case i: java.lang.Integer => sk.update(i.longValue(), value)
              case l: java.lang.Long => sk.update(l.longValue(), value)
              case f: java.lang.Float => sk.update(f.doubleValue(), value)
              case d: java.lang.Double => sk.update(d.doubleValue(), value)
              case b: java.math.BigDecimal => sk.update(b.toString, value)
              case s: String => sk.update(s, value)
              case b: Array[Byte] => sk.update(b, value)
              case other => throw new IllegalArgumentException(
                s"Unrecognised key type for Tuple sketch: " +
                  other.getClass.getSimpleName)
            }
        }
        sk.compact().toByteArray

      case "tocpcsketch" =>
        val sk = new CpcSketch(if (vs.size > 1) int(vs(1), 12) else 12)
        obj(vs.head) match {
          case null => ()
          case i: java.lang.Integer => sk.update(i.longValue())
          case l: java.lang.Long => sk.update(l.longValue())
          case f: java.lang.Float => sk.update(f.doubleValue())
          case d: java.lang.Double => sk.update(d.doubleValue())
          case b: java.math.BigDecimal => sk.update(b.toString)
          case s: String => sk.update(s)
          case b: Array[Byte] => sk.update(b)
          case other => throw new IllegalArgumentException(
            s"Unrecognised input type for CPC sketch: " +
              other.getClass.getSimpleName)
        }
        sk.toByteArray

      case "toull" =>
        val u = GraftUll(if (vs.size > 1) int(vs(1), GraftUll.DefaultP)
          else GraftUll.DefaultP)
        obj(vs.head) match {
          case null => ()
          case i: java.lang.Integer => u.addHash(WyHashFinal4.hashInt(i))
          case l: java.lang.Long => u.addHash(WyHashFinal4.hashLong(l))
          case f: java.lang.Float => u.addHash(WyHashFinal4.hashFloat(f))
          case d: java.lang.Double => u.addHash(WyHashFinal4.hashDouble(d))
          case b: java.math.BigDecimal =>
            u.addHash(WyHashFinal4.hashString(b.toString))
          case s: String => u.addHash(WyHashFinal4.hashString(s))
          case b: Array[Byte] => u.addHash(WyHashFinal4.hash(b))
          case other => u.addHash(WyHashFinal4.hashString(other.toString))
        }
        u.toBytes

      case "fromull" =>
        if (vs.head == null) null
        else GraftUll.fromBytes(blob(vs.head)).toBytes

      case "thetasketchtostring" =>
        if (vs.head == null) null
        else UTF8String.fromString(ThetaDs.heapify(blob(vs.head)).toString)

      case "cpcsketchtostring" =>
        if (vs.head == null) null
        else UTF8String.fromString(
          CpcSketch.heapify(Memory.wrap(blob(vs.head))).toString)

      case "getcpcsketchestimate" =>
        if (vs.head == null) null
        else math.round(CpcSketch.heapify(Memory.wrap(blob(vs.head)))
          .getEstimate)

      case "cpcsketchunion" =>
        if (vs.exists(_ == null)) null
        else {
          val u = new CpcUnion(12)
          vs.foreach(v => u.update(
            CpcSketch.heapify(Memory.wrap(blob(v)))))
          u.getResult.toByteArray
        }

      case "getinttuplesketchestimate" =>
        if (vs.head == null) null
        else math.round(TupleSketchImpl.heapify(blob(vs.head)).getEstimate)

      case n if n.endsWith("tuplesketchunion") =>
        // 2-arg (a, b) or 3-arg (nomEntries, a, b) — the int leads
        if (vs.exists(_ == null)) null
        else {
          val (nom, blobs) =
            if (vs.size > 2) (int(vs.head, 16384), vs.tail) else (16384, vs)
          val m = tupleMode(n)
          val u = new DsTupleUnion[IntegerSummary](nom,
            new IntegerSummarySetOperations(m, m))
          blobs.foreach(v => u.union(TupleSketchImpl.heapify(blob(v))))
          u.getResult.compact().toByteArray
        }

      case n if n.endsWith("tuplesketchintersect") =>
        if (vs.exists(_ == null)) null
        else {
          val m = tupleMode(n)
          val ix = new DsTupleIntersection[IntegerSummary](
            new IntegerSummarySetOperations(m, m))
          vs.foreach(v => ix.intersect(TupleSketchImpl.heapify(blob(v))))
          ix.getResult.compact().toByteArray
        }

      case "intsumtuplesketchdiff" =>
        if (vs.exists(_ == null)) null
        else {
          val d = new DsTupleAnotB[IntegerSummary]()
          d.setA(TupleSketchImpl.heapify(blob(vs.head)))
          d.notB(TupleSketchImpl.heapify(blob(vs(1))))
          d.getResult(false).compact().toByteArray
        }

      case other => throw new IllegalStateException(
        s"unknown sketch scalar: $other")
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(children = c)
}

object SketchScalars {
  val names: Seq[String] = Seq(
    "tothetasketch", "tohll", "tointegersumtuplesketch", "tocpcsketch",
    "toull", "fromull", "thetasketchtostring", "cpcsketchtostring",
    "getcpcsketchestimate", "cpcsketchunion", "getinttuplesketchestimate",
    "intsumtuplesketchunion", "intmintuplesketchunion",
    "intmaxtuplesketchunion", "intsumtuplesketchintersect",
    "intmintuplesketchintersect", "intmaxtuplesketchintersect",
    "intsumtuplesketchdiff")

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    names.foreach { n =>
      reg.createOrReplaceTempFunction(n,
        (exprs: Seq[Expression]) => SketchScalar(n, exprs), "built-in")
    }
  }
}
