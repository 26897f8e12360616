package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.schema.PinotSchema
import graft.sources.BatchIngest

/** SpecialValueTransformer analog — replay of the reference's
  * `RecordTransformerTest.java:511-526` (testSpecialValueTransformer)
  * and the :856-865 pipeline-order golds: FLOAT/DOUBLE −0.0 → 0.0
  * bit-exactly, NaN → null, MV arrays drop NaN elements, BigDecimal
  * text strips trailing zeros with exact JDK rendering. */
class SpecialValuesSpec extends SparkSpec {
  import spark.implicits._
  import java.lang.Float.floatToRawIntBits
  import java.lang.Double.doubleToRawLongBits

  private val sv = BatchIngest.SpecialValues(
    decimalStringColumns = Seq("bd0", "bd0p", "bd0e"))

  test("negative zero, NaN, and trailing-zero golds (RecordTransformerTest:511-526)") {
    val df = Seq((
      -0.0f, -0.0d,
      Array(-0.0f, 1.0f, 0.0f, 3.0f), Array(-0.0d, 1.0d, 0.0d, 3.0d),
      Float.NaN, Double.NaN,
      Array(-0.0f, Float.NaN, 2.0f), Array(-0.0d, Double.NaN, 2.0d),
      "0", "0.0", "0E-18"))
      .toDF("svFNeg", "svDNeg", "mvFNeg", "mvDNeg", "svFNaN", "svDNaN",
        "mvFNaN", "mvDNaN", "bd0", "bd0p", "bd0e")
    // NUM_ROUNDS idempotence: the reference applies the transformer
    // repeatedly and asserts the same golds every round
    var out = df
    (1 to 2).foreach { _ =>
      out = BatchIngest.applyTransforms(out, Seq(sv))
      val r = out.collect().head
      assert(floatToRawIntBits(r.getFloat(0)) == floatToRawIntBits(0.0f))
      assert(doubleToRawLongBits(r.getDouble(1)) == doubleToRawLongBits(0.0d))
      assert(r.getSeq[Float](2) == Seq(0.0f, 1.0f, 0.0f, 3.0f))
      assert(floatToRawIntBits(r.getSeq[Float](2).head) == 0)
      assert(r.getSeq[Double](3) == Seq(0.0d, 1.0d, 0.0d, 3.0d))
      assert(doubleToRawLongBits(r.getSeq[Double](3).head) == 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
      assert(r.getSeq[Float](6) == Seq(0.0f, 2.0f))
      assert(r.getSeq[Double](7) == Seq(0.0d, 2.0d))
      // BigDecimal("0"), ("0.0"), ("0E-18") all strip to ZERO
      assert(r.getString(8) == "0" && r.getString(9) == "0" &&
        r.getString(10) == "0")
    }
  }

  test("MV array edges: empty stays empty, all-NaN nulls, null stays null") {
    val df = Seq(
      (1, Some(Array.empty[Double])),
      (2, Some(Array(Double.NaN, Double.NaN))),
      (3, None: Option[Array[Double]]))
      .toDF("id", "mv")
    val out = BatchIngest.applyTransforms(df, Seq(BatchIngest.SpecialValues()))
      .orderBy($"id").collect()
    assert(out(0).getSeq[Double](1) == Seq.empty)
    // transformed-to-empty → null (SpecialValueTransformerUtils:134)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("MV NaN removal keeps NULL elements (ADVICE r12)") {
    // the reference removes ONLY NaN from float/double arrays — a bare
    // !isnan(x) filter predicate evaluates to null for a NULL element,
    // which filter() treats as drop
    val df = Seq((1, Seq[Option[Double]](Some(1.5), None, Some(Double.NaN))))
      .toDF("id", "mv")
    val out = BatchIngest.applyTransforms(df, Seq(BatchIngest.SpecialValues()))
      .collect().head
    assert(out.getSeq[Any](1) == Seq(1.5, null))
  }

  test("stripTrailingZeros keeps exact JDK BigDecimal rendering") {
    def s(x: String): String = {
      val r = BatchIngest.stripTrailingZeros(
        org.apache.spark.unsafe.types.UTF8String.fromString(x))
      if (r == null) null else r.toString
    }
    assert(s("600.0") == "6E+2") // JDK stripTrailingZeros surprise, kept
    assert(s("12.340") == "12.34")
    assert(s("0E-18") == "0")
    assert(s("-0.0500") == "-0.05")
    assert(s("not-a-number") == "not-a-number") // dirty rows pass through
    assert(BatchIngest.stripTrailingZeros(null) == null)
  }

  test("pipeline order: NaN nulls fill the FieldSpec default afterwards") {
    // `RecordTransformerTest.java:856-865`: SpecialValueTransformer runs
    // before NullValueTransformer, so a NaN becomes the type default
    // (dimension FLOAT → −∞, DOUBLE → −∞) in default-null mode
    val sch = PinotSchema.Schema("t", Seq(
      PinotSchema.Field("f", FloatType, PinotSchema.Dimension),
      PinotSchema.Field("d", DoubleType, PinotSchema.Dimension)))
    val df = Seq((Float.NaN, Double.NaN)).toDF("f", "d")
    val r = sch.withDefaultNulls(
      BatchIngest.applyTransforms(df, Seq(BatchIngest.SpecialValues())))
      .collect().head
    assert(r.getFloat(0) == Float.NegativeInfinity)
    assert(r.getDouble(1) == Double.NegativeInfinity)
  }

  test("column scoping: named columns only; untouched types pass through") {
    val df = Seq((-0.0d, -0.0d, "x")).toDF("a", "b", "s")
    val r = BatchIngest.applyTransforms(df,
      Seq(BatchIngest.SpecialValues(columns = Seq("a")))).collect().head
    assert(doubleToRawLongBits(r.getDouble(0)) == 0L)
    assert(doubleToRawLongBits(r.getDouble(1)) ==
      doubleToRawLongBits(-0.0d)) // not listed → untouched
    assert(r.getString(2) == "x")
  }
}
