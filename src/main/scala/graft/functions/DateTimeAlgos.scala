package graft.functions

import java.time.{DayOfWeek, Instant, ZoneId}
import java.time.temporal.{ChronoUnit, TemporalAdjusters}

/** Static core for the reference's `dateTrunc`
  * (`scalar/DateTimeFunctions.java` dateTrunc family): floor an epoch-
  * millis value to a calendar unit boundary in an explicit zone
  * (default UTC — the reference truncates in UTC unless a zone argument
  * is passed), returning epoch millis. Static so the wrapping Catalyst
  * expression stays inside whole-stage codegen. */
object DateTimeAlgos {

  def dateTruncEpoch(unit: String, ms: Long, tz: String): Long = {
    val zone = ZoneId.of(tz)
    val zdt = Instant.ofEpochMilli(ms).atZone(zone)
    val truncated = unit.toLowerCase match {
      case "millisecond" => return ms
      case "second" => zdt.truncatedTo(ChronoUnit.SECONDS)
      case "minute" => zdt.truncatedTo(ChronoUnit.MINUTES)
      case "hour" => zdt.truncatedTo(ChronoUnit.HOURS)
      case "day" => zdt.truncatedTo(ChronoUnit.DAYS)
      case "week" => zdt.truncatedTo(ChronoUnit.DAYS)
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      case "month" => zdt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
      case "quarter" =>
        val qm = ((zdt.getMonthValue - 1) / 3) * 3 + 1
        zdt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1).withMonth(qm)
      case "year" => zdt.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
      case other => throw new IllegalArgumentException(s"dateTrunc unit: $other")
    }
    truncated.toInstant.toEpochMilli
  }
}
