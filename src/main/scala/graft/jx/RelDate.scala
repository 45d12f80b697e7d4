package graft.jx

import java.time._
import java.time.format.DateTimeFormatter

/** Parser for JX relative/absolute date literals: `"now"`, `"today"`,
  * `"eod"`, `"today-7day"`, `"month"`, `"1998-09-02"`,
  * `"1998-09-02 12:00:00"`, a raw unix-seconds number, with `+`/`-`
  * offsets in second|minute|hour|day|week|month|year units
  * (calendar-aware for month/year, like the reference's Duration —
  * public repo `vendor/mo_times/dates.py`, SURVEY.md §2 data model).
  * All arithmetic in UTC.
  */
object RelDate {
  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Parse to epoch millis; `nowMs` injectable for deterministic tests. */
  def parseMillis(spec: String,
                  nowMs: Long = System.currentTimeMillis()): Long = {
    val s = spec.trim
    // absolute forms first
    if (s.matches("""\d{4}-\d{2}-\d{2}"""))
      return LocalDate.parse(s, dateFmt).atStartOfDay(ZoneOffset.UTC)
        .toInstant.toEpochMilli
    if (s.matches("""\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}"""))
      return LocalDateTime.parse(s.replace('T', ' '), tsFmt)
        .toInstant(ZoneOffset.UTC).toEpochMilli
    if (s.matches("""-?\d+(\.\d+)?""")) // unix seconds
      return (s.toDouble * 1000).toLong

    // relative: BASE ((+|-) N? UNIT)*
    val m = """^([a-z]+)((?:[+\-]\d*[a-z]+)*)$""".r
    s.toLowerCase match {
      case m(base, offsets) =>
        var t = baseTime(base, nowMs)
        if (offsets.nonEmpty) {
          val off = """([+\-])(\d*)([a-z]+)""".r
          for (mm <- off.findAllMatchIn(offsets)) {
            val sign = if (mm.group(1) == "-") -1 else 1
            val n = if (mm.group(2).isEmpty) 1 else mm.group(2).toInt
            t = shift(t, sign * n, mm.group(3))
          }
        }
        t.toInstant.toEpochMilli
      case _ =>
        throw new IllegalArgumentException(s"bad date literal: $spec")
    }
  }

  def parseTimestamp(spec: String,
                     nowMs: Long = System.currentTimeMillis())
      : java.sql.Timestamp =
    new java.sql.Timestamp(parseMillis(spec, nowMs))

  private def baseTime(base: String, nowMs: Long): ZonedDateTime = {
    val now = Instant.ofEpochMilli(nowMs).atZone(ZoneOffset.UTC)
    base match {
      case "now"       => now
      case "today"     => now.truncatedTo(temporal.ChronoUnit.DAYS)
      case "eod" | "tomorrow" =>
        now.truncatedTo(temporal.ChronoUnit.DAYS).plusDays(1)
      case "yesterday" =>
        now.truncatedTo(temporal.ChronoUnit.DAYS).minusDays(1)
      case "week"  => now.truncatedTo(temporal.ChronoUnit.DAYS)
        .minusDays(now.getDayOfWeek.getValue % 7L) // week starts Sunday
      case "month" => now.truncatedTo(temporal.ChronoUnit.DAYS)
        .withDayOfMonth(1)
      case "year"  => now.truncatedTo(temporal.ChronoUnit.DAYS)
        .withDayOfYear(1)
      case u => throw new IllegalArgumentException(s"bad date base: $u")
    }
  }

  private def shift(t: ZonedDateTime, n: Int, unit: String): ZonedDateTime =
    unit match {
      case "second" | "seconds" => t.plusSeconds(n.toLong)
      case "minute" | "minutes" => t.plusMinutes(n.toLong)
      case "hour" | "hours"     => t.plusHours(n.toLong)
      case "day" | "days"       => t.plusDays(n.toLong)
      case "week" | "weeks"     => t.plusWeeks(n.toLong)
      case "month" | "months"   => t.plusMonths(n.toLong)
      case "year" | "years"     => t.plusYears(n.toLong)
      case u => throw new IllegalArgumentException(s"bad duration unit: $u")
    }
}
