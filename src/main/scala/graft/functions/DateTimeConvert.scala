package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinot `dateTimeConvert(col, inputFormat, outputFormat, granularity)`
  * (`TransformFunctionType.java:120-157`, format spec
  * `pinot-spi/.../data/DateTimeFormatSpec.java`):
  * formats are `size:unit:EPOCH` or `size:unit:SIMPLE_DATE_FORMAT:pattern`,
  * granularity is `size:unit`. The value is normalized to epoch millis,
  * floor-bucketed to the granularity, and emitted in the output format.
  * Everything compiles to native Catalyst arithmetic / date functions.
  */
object DateTimeConvert {

  private val unitMillis: Map[String, Long] = Map(
    "MILLISECONDS" -> 1L, "SECONDS" -> 1000L, "MINUTES" -> 60000L,
    "HOURS" -> 3600000L, "DAYS" -> 86400000L)

  private final case class Fmt(sizeMs: Long, sdf: Option[String])

  private def parseFmt(s: String): Fmt = {
    val parts = s.split(":", 4)
    parts match {
      case Array(n, unit, "EPOCH") =>
        Fmt(n.toLong * unitMillis(unit.toUpperCase), None)
      case Array(n, unit, "EPOCH", _) =>
        Fmt(n.toLong * unitMillis(unit.toUpperCase), None)
      case Array(_, _, "SIMPLE_DATE_FORMAT", pattern) => Fmt(1L, Some(pattern))
      case Array("TIMESTAMP") => Fmt(1L, None)
      case _ => throw new IllegalArgumentException(s"bad datetime format: $s")
    }
  }

  private def parseGranularity(s: String): Long = {
    val Array(n, unit) = s.split(":", 2)
    n.toLong * unitMillis(unit.toUpperCase)
  }

  /** Column-level implementation; format/granularity args are literals
    * (as in the reference, where they shape the plan). */
  def dateTimeConvert(c: Column, inputFormat: String, outputFormat: String,
      granularity: String, bucketTz: Option[String] = None): Column = {
    val in = parseFmt(inputFormat)
    val out = parseFmt(outputFormat)
    val gran = parseGranularity(granularity)

    val epochMs: Column = in.sdf match {
      case Some(p) => unix_millis(to_timestamp(c, p).cast(TimestampType))
      case None => graft.plans.ScalarExprs.epochNumeric(c) * lit(in.sizeMs)
    }
    // optional bucketing zone: floor in local wall-clock time, convert
    // back (exactly the reference's zoned-bucket hint semantics; for
    // UTC the round trip is the identity)
    val bucketed = bucketTz.filter(_.toUpperCase != "UTC") match {
      case Some(tz) =>
        val localMs = unix_millis(from_utc_timestamp(timestamp_millis(epochMs), tz))
        val localBucket = (localMs / lit(gran)).cast(LongType) * lit(gran)
        unix_millis(to_utc_timestamp(timestamp_millis(localBucket), tz))
      case None => (epochMs / lit(gran)).cast(LongType) * lit(gran)
    }
    out.sdf match {
      case Some(p) => date_format(timestamp_millis(bucketed), p)
      case None => (bucketed / lit(out.sizeMs)).cast(LongType)
    }
  }

  /** `timeSeriesBucket(timeExpr, timeUnit, firstBucketValueSeconds,
    * bucketWindowSeconds, offsetSeconds)`
    * (`TimeSeriesBucketTransformFunction.java:45-76`): the time-series
    * engine's bucket index — with everything converted from seconds to
    * `timeUnit`, `(v + offset − (first − bucketSize) − 1) / bucketSize`
    * truncated toward zero (Java long division), emitted as INT. Pure
    * native arithmetic. */
  def timeSeriesBucket(c: Column, timeUnit: String, firstBucketSeconds: Long,
      bucketSeconds: Long, offsetSeconds: Long): Column = {
    // TimeUnit.convert(Duration.ofSeconds(s)): scale up for sub-second
    // units, truncate down for super-second units
    def toUnit(s: Long): Long = timeUnit.toUpperCase match {
      case "NANOSECONDS" => s * 1000000000L
      case "MICROSECONDS" => s * 1000000L
      case "MILLISECONDS" => s * 1000L
      case "SECONDS" => s
      case "MINUTES" => s / 60L
      case "HOURS" => s / 3600L
      case "DAYS" => s / 86400L
      case u => throw new IllegalArgumentException(s"bad time unit: $u")
    }
    val reference = toUnit(firstBucketSeconds - bucketSeconds)
    val divisor = toUnit(bucketSeconds)
    val num = c.cast(LongType) + lit(toUnit(offsetSeconds)) -
      lit(reference) - lit(1L)
    // Java long division truncates toward zero (Spark % already keeps
    // the dividend's sign, so subtracting it leaves an exact multiple)
    ((num - num % lit(divisor)) / lit(divisor)).cast(IntegerType)
  }

  /** `dateTimeConvertWindowHop(col, inFmt, outFmt, granularity,
    * hopWindowSize)` (TransformFunctionType.java:125,
    * `BaseDateTimeWindowHopTransformer.hopWindows`): the ARRAY of
    * hopping-window starts covering the timestamp — floor to the
    * output granularity, then step back by the granularity while the
    * start stays inside the window (start > ts − windowSize), each
    * start emitted in the output format. Compiles to a native
    * `sequence` — no UDF, no explode. */
  def dateTimeConvertWindowHop(c: Column, inputFormat: String,
      outputFormat: String, granularity: String, hopWindow: String): Column = {
    val in = parseFmt(inputFormat)
    val out = parseFmt(outputFormat)
    val gran = parseGranularity(granularity)
    val window = parseGranularity(hopWindow)

    val epochMs: Column = in.sdf match {
      case Some(p) => unix_millis(to_timestamp(c, p).cast(TimestampType))
      case None => graft.plans.ScalarExprs.epochNumeric(c) * lit(in.sizeMs)
    }
    val adjusted = (epochMs / lit(gran)).cast(LongType) * lit(gran)
    // hop count: i = 0 .. n-1 with adjusted − i·gran > epochMs − window;
    // floor() (not long cast) so a window smaller than the granularity
    // yields n ≤ 0 → empty array, matching the reference loop
    val n = floor((adjusted - epochMs + lit(window) - 1) / lit(gran))
      .cast(LongType) + 1
    val starts = sequence(adjusted,
      adjusted - (greatest(n, lit(1L)) - 1) * lit(gran), lit(-gran))
    val emitted = out.sdf match {
      case Some(p) => transform(starts,
        s => date_format(timestamp_millis(s), p))
      case None => transform(starts,
        s => (s / lit(out.sizeMs)).cast(LongType))
    }
    val emptyT: DataType =
      if (out.sdf.isDefined) ArrayType(StringType) else ArrayType(LongType)
    when(lit(window) <= lit(0L) || n <= 0, array().cast(emptyT))
      .otherwise(emitted)
  }
}
