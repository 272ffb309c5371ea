package graft.dates

import java.time.{Instant, LocalDateTime, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** scalding-date rebuilt on java.time (reference `RichDate.scala`,
  * `DateRange.scala`, `Duration.scala`). Driver-side utilities: used
  * to select input partitions/paths, never shipped into executors.
  */
final case class RichDate(timestamp: Long) extends Ordered[RichDate] {
  def compare(that: RichDate): Int = java.lang.Long.compare(timestamp, that.timestamp)

  def +(d: Duration): RichDate = d.addTo(this)
  def -(d: Duration): RichDate = d.subtractFrom(this)
  def -(that: RichDate): AbsoluteDuration =
    AbsoluteDuration.fromMillisecs(timestamp - that.timestamp)

  def toInstant: Instant = Instant.ofEpochMilli(timestamp)

  def at(zone: ZoneId): ZonedDateTime = toInstant.atZone(zone)

  /** Format with a java.time pattern (RichDate.scala:103-108). */
  def format(pattern: String)(implicit zone: ZoneId): String =
    DateTimeFormatter.ofPattern(pattern).format(at(zone))
}

object RichDate {
  /** Parse the reference's accepted formats (DateOps.scala:34-82):
    * yyyy-MM-dd[ HH:mm[:ss[.SSS]]] and yyyyMMdd[HH[mm[ss]]] — plus the
    * natural-language subset (see [[parseAt]]) the reference delegated
    * to a NLP date library for (DateOps.scala:72).
    */
  def parse(s: String)(implicit zone: ZoneId): RichDate = parseAt(s, now)

  /** [[parse]] with an explicit "now" — the natural-language forms are
    * relative, and pinning the reference instant keeps them testable
    * and lets job args be replayed.
    *
    * Supported phrases (case-insensitive): `now`; `today` /
    * `yesterday` / `tomorrow` (start of that calendar day — these
    * phrases select date partitions, so unlike the reference's NLP
    * library the answer does not depend on the submit clock time);
    * `N <unit>[s] ago` and `in N <unit>[s]` for second/minute/hour/
    * day/week/month/year (clock-time-preserving, calendar-aware
    * arithmetic via [[Duration]]);
    * `last/next/this <weekday>` (start of day: `last` = most recent
    * occurrence strictly before today, `next` = first strictly after,
    * `this` = the occurrence in the current Monday-based week); and
    * `first/second/third/fourth/last <weekday> of <month> [yyyy]`
    * (year defaults to the reference instant's); and a bare
    * `<month> [yyyy]` name ("january", "march 2025" — start of that
    * month, year defaulting to the reference instant's) — every form
    * a pure function of the injectable reference instant.
    *
    * Round-11 additions (the reference's NLP long tail, made
    * deterministic):
    * COMPOUND OFFSETS `[the] (a|an|N) <unit>[s] from|after|before
    * <phrase>` where `<phrase>` is ANY parseable form, recursively —
    * "a week from next tuesday", "2 days before yesterday", "3 months
    * after january 2026" — plus the idioms `[the] day after/before
    * <phrase>`; and COLLOQUIAL TIMES: `noon` (12:00 today),
    * `midnight` (00:00 today), `noon|midnight <phrase>` /
    * `<phrase> at noon|midnight` (that time on the phrase's day), and
    * `tonight`/`midnight tonight` (tonight's midnight is the one that
    * ENDS today — start of tomorrow; every other `midnight <day>`
    * means the 00:00 that STARTS the named day). Still excluded, by
    * contract rather than capability: vague parts of day ("evening"),
    * clock times inside phrases ("tomorrow at 3pm" — use the
    * formatted forms), and multi-date alternatives ("Sept 11th or
    * 12th", which the reference silently truncated to the first).
    */
  def parseAt(s: String, ref: => RichDate)(implicit zone: ZoneId): RichDate = {
    val trimmed = s.trim
    val lower = trimmed.toLowerCase
    val ago = """(\d+)\s+(second|minute|hour|day|week|month|year)s?\s+ago""".r
    val ahead = """in\s+(\d+)\s+(second|minute|hour|day|week|month|year)s?""".r
    val wdRel = """(last|next|this)\s+([a-z]+day)""".r
    val nthOf = """(first|second|third|fourth|last)\s+([a-z]+day)\s+of\s+([a-z]+)(?:\s+(\d{4}))?""".r
    val compound = """(?:the\s+)?(a|an|\d+)\s+(second|minute|hour|day|week|month|year)s?\s+(from|after|before)\s+(.+)""".r
    val dayOffset = """(?:the\s+)?day\s+(after|before)\s+(.+)""".r
    val timeFirst = """(noon|midnight)\s+(?:on\s+)?(.+)""".r
    val timeLast = """(.+?)\s+at\s+(noon|midnight)""".r
    val monthYr = """([a-z]+)(?:\s+(\d{4}))?""".r
    lower match {
      case "now" => ref
      case "today" => Days(1).floorOf(ref)
      case "yesterday" => Days(1).floorOf(Days(1).subtractFrom(ref))
      case "tomorrow" => Days(1).floorOf(Days(1).addTo(ref))
      case "noon" => Hours(12).addTo(Days(1).floorOf(ref))
      case "midnight" => Days(1).floorOf(ref)
      case "tonight" | "midnight tonight" | "tonight at midnight" =>
        Days(1).floorOf(Days(1).addTo(ref))
      case ago(n, u) => unitDuration(u, n.toInt).subtractFrom(ref)
      case ahead(n, u) => unitDuration(u, n.toInt).addTo(ref)
      case wdRel(rel, wd) => weekdayRelative(rel, weekday(wd), ref)
      case nthOf(ord, wd, mon, year) =>
        nthWeekdayOfMonth(ord, weekday(wd), mon, Option(year), ref)
      case compound(n, u, dir, rest) =>
        val cnt = if (n == "a" || n == "an") 1 else n.toInt
        val base = parseAt(rest, ref)
        if (dir == "before") unitDuration(u, cnt).subtractFrom(base)
        else unitDuration(u, cnt).addTo(base)
      case dayOffset(dir, rest) =>
        val base = parseAt(rest, ref)
        if (dir == "before") Days(1).subtractFrom(base)
        else Days(1).addTo(base)
      case timeFirst(t, rest) => atColloquialTime(t, rest, ref)
      case timeLast(rest, t) => atColloquialTime(t, rest, ref)
      case monthYr(mon, year) if monthOpt(mon).isDefined =>
        val y = Option(year).map(_.toInt).getOrElse(ref.at(zone).getYear)
        startOfDay(java.time.LocalDate.of(y, monthOpt(mon).get, 1))
      case _ => parseFormatted(trimmed)
    }
  }

  /** noon/midnight anchored on a recursively parsed day phrase; the
    * day is the phrase's calendar day (its floor), so "noon 3 days
    * ago" and "next friday at noon" both land mid-day exactly.
    */
  private def atColloquialTime(t: String, phrase: String,
      ref: => RichDate)(implicit zone: ZoneId): RichDate = {
    val day =
      if (phrase.trim == "tonight") {
        // "tonight" names today's night: its noon is today's, its
        // midnight is the one that ENDS today
        if (t == "midnight") return Days(1).floorOf(Days(1).addTo(ref))
        Days(1).floorOf(ref)
      } else Days(1).floorOf(parseAt(phrase, ref))
    if (t == "noon") Hours(12).addTo(day) else day
  }

  private[dates] def monthOpt(name: String): Option[java.time.Month] =
    try Some(java.time.Month.valueOf(name.toUpperCase))
    catch { case _: IllegalArgumentException => None }

  private def weekday(name: String): java.time.DayOfWeek =
    try java.time.DayOfWeek.valueOf(name.toUpperCase)
    catch { case _: IllegalArgumentException =>
      throw new IllegalArgumentException(s"unparseable weekday: $name") }

  private def startOfDay(d: java.time.LocalDate)(implicit zone: ZoneId): RichDate =
    RichDate(d.atStartOfDay(zone).toInstant.toEpochMilli)

  private def weekdayRelative(rel: String, dow: java.time.DayOfWeek,
      ref: RichDate)(implicit zone: ZoneId): RichDate = {
    import java.time.temporal.TemporalAdjusters
    val today = ref.at(zone).toLocalDate
    val d = rel match {
      case "last" => today.`with`(TemporalAdjusters.previous(dow))
      case "next" => today.`with`(TemporalAdjusters.next(dow))
      case "this" =>
        // the occurrence inside the current Monday-based week
        today.`with`(java.time.temporal.WeekFields.ISO.dayOfWeek(),
          dow.getValue.toLong)
    }
    startOfDay(d)
  }

  private def nthWeekdayOfMonth(ord: String, dow: java.time.DayOfWeek,
      monthName: String, year: Option[String], ref: RichDate)(
      implicit zone: ZoneId): RichDate = {
    import java.time.temporal.TemporalAdjusters
    val month =
      try java.time.Month.valueOf(monthName.toUpperCase)
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(s"unparseable month: $monthName") }
    val y = year.map(_.toInt).getOrElse(ref.at(zone).getYear)
    val first = java.time.LocalDate.of(y, month, 1)
    val d = ord match {
      case "last" => first.`with`(TemporalAdjusters.lastInMonth(dow))
      case _ =>
        val n = Seq("first", "second", "third", "fourth").indexOf(ord) + 1
        first.`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))
    }
    startOfDay(d)
  }

  private def unitDuration(unit: String, n: Int)(
      implicit zone: ZoneId): Duration = unit match {
    case "second" => Seconds(n)
    case "minute" => Minutes(n)
    case "hour"   => Hours(n)
    case "day"    => Days(n)
    case "week"   => Weeks(n)
    case "month"  => Months(n)
    case "year"   => Years(n)
  }

  private def parseFormatted(trimmed: String)(implicit zone: ZoneId): RichDate = {
    val patterns = Seq(
      "yyyy-MM-dd HH:mm:ss.SSS", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm",
      "yyyy-MM-dd", "yyyyMMddHHmmss", "yyyyMMddHHmm", "yyyyMMddHH", "yyyyMMdd")
    patterns.iterator.flatMap { p =>
      try {
        val fmt = DateTimeFormatter.ofPattern(p)
        val ldt =
          if (p.contains("HH")) LocalDateTime.parse(trimmed, fmt)
          else java.time.LocalDate.parse(trimmed, fmt).atStartOfDay()
        Some(RichDate(ldt.atZone(zone).toInstant.toEpochMilli))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }.nextOption().getOrElse(
      throw new IllegalArgumentException(s"unparseable date: $trimmed"))
  }

  def now: RichDate = RichDate(System.currentTimeMillis())
}

/** Calendar-aware and absolute durations (Duration.scala:40-99,
  * AbsoluteDuration.scala:143-167).
  */
sealed trait Duration extends Serializable {
  def addTo(d: RichDate): RichDate
  def subtractFrom(d: RichDate): RichDate

  /** Truncate a date down to this duration's boundary
    * (Duration.floorOf, Duration.scala:56-59).
    */
  def floorOf(d: RichDate): RichDate
}

abstract class CalendarDuration(count: Int, unit: ChronoUnit, zone: ZoneId)
    extends Duration {
  def addTo(d: RichDate): RichDate =
    RichDate(d.at(zone).plus(count.toLong, unit).toInstant.toEpochMilli)
  def subtractFrom(d: RichDate): RichDate =
    RichDate(d.at(zone).minus(count.toLong, unit).toInstant.toEpochMilli)
  def floorOf(d: RichDate): RichDate =
    RichDate(d.at(zone).truncatedTo(truncUnit).toInstant.toEpochMilli)
  protected def truncUnit: ChronoUnit = unit
}

final case class Millisecs(n: Int) extends Duration {
  def addTo(d: RichDate): RichDate = RichDate(d.timestamp + n)
  def subtractFrom(d: RichDate): RichDate = RichDate(d.timestamp - n)
  def floorOf(d: RichDate): RichDate = d
}

final case class Seconds(n: Int)(implicit zone: ZoneId)
    extends CalendarDuration(n, ChronoUnit.SECONDS, zone)
final case class Minutes(n: Int)(implicit zone: ZoneId)
    extends CalendarDuration(n, ChronoUnit.MINUTES, zone)
final case class Hours(n: Int)(implicit zone: ZoneId)
    extends CalendarDuration(n, ChronoUnit.HOURS, zone)

final case class Days(n: Int)(implicit zone: ZoneId) extends Duration {
  def addTo(d: RichDate): RichDate =
    RichDate(d.at(zone).plusDays(n.toLong).toInstant.toEpochMilli)
  def subtractFrom(d: RichDate): RichDate =
    RichDate(d.at(zone).minusDays(n.toLong).toInstant.toEpochMilli)
  def floorOf(d: RichDate): RichDate =
    RichDate(d.at(zone).truncatedTo(ChronoUnit.DAYS).toInstant.toEpochMilli)
}

final case class Weeks(n: Int)(implicit zone: ZoneId) extends Duration {
  def addTo(d: RichDate): RichDate =
    RichDate(d.at(zone).plusWeeks(n.toLong).toInstant.toEpochMilli)
  def subtractFrom(d: RichDate): RichDate =
    RichDate(d.at(zone).minusWeeks(n.toLong).toInstant.toEpochMilli)
  def floorOf(d: RichDate): RichDate = {
    val z = d.at(zone).truncatedTo(ChronoUnit.DAYS)
    // reference weeks floor to Monday (ISO)
    RichDate(z.minusDays((z.getDayOfWeek.getValue - 1).toLong).toInstant.toEpochMilli)
  }
}

final case class Months(n: Int)(implicit zone: ZoneId) extends Duration {
  def addTo(d: RichDate): RichDate =
    RichDate(d.at(zone).plusMonths(n.toLong).toInstant.toEpochMilli)
  def subtractFrom(d: RichDate): RichDate =
    RichDate(d.at(zone).minusMonths(n.toLong).toInstant.toEpochMilli)
  def floorOf(d: RichDate): RichDate = {
    val z = d.at(zone)
    RichDate(z.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS).toInstant.toEpochMilli)
  }
}

final case class Years(n: Int)(implicit zone: ZoneId) extends Duration {
  def addTo(d: RichDate): RichDate =
    RichDate(d.at(zone).plusYears(n.toLong).toInstant.toEpochMilli)
  def subtractFrom(d: RichDate): RichDate =
    RichDate(d.at(zone).minusYears(n.toLong).toInstant.toEpochMilli)
  def floorOf(d: RichDate): RichDate = {
    val z = d.at(zone)
    RichDate(z.withDayOfYear(1).truncatedTo(ChronoUnit.DAYS).toInstant.toEpochMilli)
  }
}

final case class AbsoluteDuration(millis: Long) {
  def toMillisecs: Long = millis
  def toSeconds: Double = millis / 1000.0
}
object AbsoluteDuration {
  def fromMillisecs(ms: Long): AbsoluteDuration = AbsoluteDuration(ms)
}

/** Closed time interval [start, end] (DateRange.scala:26-78). */
final case class DateRange(start: RichDate, end: RichDate) {
  require(start <= end, s"DateRange start after end: $start > $end")

  def contains(d: RichDate): Boolean = start <= d && d <= end
  def contains(that: DateRange): Boolean = contains(that.start) && contains(that.end)

  /** Step through the range at `duration` granularity, yielding
    * consecutive sub-ranges (DateRange.each, DateRange.scala:44-60).
    */
  def each(duration: Duration): Iterable[DateRange] = {
    val b = Iterable.newBuilder[DateRange]
    var cur = duration.floorOf(start)
    while (cur <= end) {
      val next = duration.addTo(cur)
      b += DateRange(
        if (cur < start) start else cur,
        if (RichDate(next.timestamp - 1) > end) end else RichDate(next.timestamp - 1))
      cur = next
    }
    b.result()
  }

  /** Widen symmetrically (DateRange.embiggen). */
  def embiggen(d: Duration): DateRange = DateRange(d.subtractFrom(start), d.addTo(end))

  /** Extend the end only (DateRange.extend). */
  def extend(d: Duration): DateRange = DateRange(start, d.addTo(end))
}

object DateRange {

  /** One-phrase natural-language RANGES under the same deterministic
    * injectable-`ref` contract as [[RichDate.parseAt]] (the reference
    * delegated these to its NLP library, DateOps.scala:72):
    * `yesterday`/`today`/`tomorrow` (that calendar day);
    * `last/this/next day|week|month|year` (the whole calendar period
    * — weeks are ISO Monday-based, matching [[Weeks.floorOf]]); and a
    * bare `<month> [yyyy]` name (that whole month, year defaulting to
    * the reference instant's). Anything else resolves through
    * [[RichDate.parseAt]] with the SAME pinned ref (so compound
    * offsets and colloquial times stay replayable): a phrase landing
    * on a day boundary covers that whole day, one carrying a
    * time-of-day is a point range.
    */
  def parseAt(s: String, ref: => RichDate)(
      implicit zone: ZoneId): DateRange = {
    val lower = s.trim.toLowerCase
    val relUnit = """(last|this|next)\s+(day|week|month|year)""".r
    val monthYr = """([a-z]+)(?:\s+(\d{4}))?""".r
    def period(start: RichDate, d: Duration): DateRange =
      DateRange(start, RichDate(d.addTo(start).timestamp - 1))
    lower match {
      case "yesterday" | "today" | "tomorrow" =>
        period(RichDate.parseAt(lower, ref), Days(1))
      case relUnit(rel, unit) =>
        val d: Duration = unit match {
          case "day" => Days(1)
          case "week" => Weeks(1)
          case "month" => Months(1)
          case "year" => Years(1)
        }
        val thisStart = d.floorOf(ref)
        val start = rel match {
          case "last" => d.subtractFrom(thisStart)
          case "this" => thisStart
          case "next" => d.addTo(thisStart)
        }
        period(start, d)
      case monthYr(mon, _) if RichDate.monthOpt(mon).isDefined =>
        period(RichDate.parseAt(lower, ref), Months(1))
      case _ =>
        val start = RichDate.parseAt(s, ref)
        if (start == Days(1).floorOf(start)) period(start, Days(1))
        else DateRange(start, start)
    }
  }

  /** [[parseAt]] with the submit clock as the reference instant. */
  def parse(s: String)(implicit zone: ZoneId): DateRange =
    parseAt(s, RichDate.now)

  def parse(from: String, to: String)(implicit zone: ZoneId): DateRange = {
    // end is inclusive at the granularity implied by the string
    // (reference `DateRange.parse` semantics): "2026-01-02" covers the
    // whole day.
    val start = RichDate.parse(from)
    val endStart = RichDate.parse(to)
    val end =
      if (to.trim.length <= 10) RichDate(Days(1)(zone).addTo(endStart).timestamp - 1)
      else endStart
    DateRange(start, end)
  }
}

/** Expand a time-path template over a DateRange into the concrete path
  * list — the operational replacement for the reference's glob algebra
  * (Globifier.scala:28-143; used by TimePathedSource,
  * FileSource.scala:318-384). Patterns use java.util.Formatter date
  * conversions, e.g. "/logs/%1$tY/%1$tm/%1$td" (a trailing glob is
  * allowed).
  *
  * The reference compressed the path list into a minimal glob set
  * because Hadoop path expansion was expensive; Spark's file index
  * handles explicit lists fine, so we emit one path per period —
  * simpler and exactly as correct.
  */
object TimePathUtil {
  def paths(pattern: String, range: DateRange, step: Duration)(
      implicit zone: ZoneId): Seq[String] =
    range.each(step).map { r =>
      String.format(pattern, java.util.GregorianCalendar.from(r.start.at(zone)))
    }.toSeq.distinct
}
