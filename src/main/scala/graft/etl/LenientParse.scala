package graft.etl

import java.sql.{Date, Timestamp}
import java.time._
import scala.util.matching.Regex

/** Lenient timestamp/date parsing — the JVM re-expression of the
  * reference's two Python UDFs (ingest.py:390-443), which wrap
  * `dateutil.parser.parse` with an America/New_York policy:
  *
  *   - guard: null / length<=3 / no digit → null
  *   - strict parse; naive values are interpreted in America/New_York,
  *     zone-aware values converted to it
  *   - timestamps in the future are clamped to now; future dates → null
  *   - on strict-parse failure, a "fuzzy" retry scans for a date-like
  *     substring anywhere in the text
  *   - total functions: anything unparseable → null, never an exception
  *
  * `dateutil`'s exact fuzzy grammar is not reproduced bug-for-bug
  * (SURVEY.md §7.4.2) — the accepted-format contract is the regex table
  * below, covering ISO 8601 (space or 'T', optional fraction/offset),
  * y/m/d and m/d/y with -, / or . separators (with dateutil's
  * day-first rescue when the first field can't be a month), English
  * month names (space- or dash-delimited), and the undelimited
  * compact YYYYMMDD[THHMMSS] forms.
  *
  * The clock is injectable for deterministic tests; production uses
  * wall-clock.
  */
object LenientParse {
  private val NY: ZoneId = ZoneId.of("America/New_York")

  @volatile private[graft] var clockOverride: Option[Instant] = None
  private def nowInstant: Instant = clockOverride.getOrElse(Instant.now())

  /** The clock a plan-time caller should CAPTURE once and thread through:
    * graft.functions.{LenientTimestamp,LenientDate} snapshot this at
    * expression construction so every row of a query clamps against the
    * same instant (per-row Instant.now() would make a nominally
    * deterministic expression yield different values across duplicated
    * or retried evaluations).
    */
  def effectiveNow: Instant = nowInstant

  private val months = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val timePart = """(?:[T ](\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?)?"""
  private val zonePart = """(Z|[+-]\d{2}:?\d{2})?"""

  private val isoYmd: Regex = ("""^(\d{4})[-/.](\d{1,2})[-/.](\d{1,2})""" + timePart + zonePart + "$").r
  private val mdy: Regex = ("""^(\d{1,2})[-/.](\d{1,2})[-/.](\d{4})""" + timePart + "$").r
  private val monthName: Regex =
    """^([A-Za-z]{3,9})\.? (\d{1,2}),? (\d{4})(?: (\d{1,2}):(\d{2})(?::(\d{2}))?)?$""".r
  private val dayFirst: Regex =
    """^(\d{1,2})[ -]([A-Za-z]{3,9})\.?[ -](\d{4})(?: (\d{1,2}):(\d{2})(?::(\d{2}))?)?$""".r
  // dateutil also accepts the undelimited compact forms: YYYYMMDD and
  // YYYYMMDD[T ]HHMMSS
  private val compactYmd: Regex =
    """^(\d{4})(\d{2})(\d{2})(?:[T ](\d{2})(\d{2})(\d{2}))?$""".r
  // fuzzy: a date-like token anywhere in the text
  private val embeddedYmd: Regex = ("""(\d{4})-(\d{1,2})-(\d{1,2})""" + timePart).r.unanchored
  private val embeddedMdy: Regex = """(\d{1,2})/(\d{1,2})/(\d{4})""".r.unanchored

  private def guard(s: String): Boolean =
    s == null || s.length <= 3 || !s.exists(_.isDigit)

  private def mk(y: Int, mo: Int, d: Int, h: Int, mi: Int, sec: Int, nano: Int,
      zone: String): Option[ZonedDateTime] =
    try {
      val ldt = LocalDateTime.of(y, mo, d, h, mi, sec, nano)
      val z = zone match {
        case null | "" => ldt.atZone(NY)
        case "Z" => ldt.atZone(ZoneOffset.UTC).withZoneSameInstant(NY)
        case off =>
          val norm = if (off.contains(":")) off else off.take(3) + ":" + off.drop(3)
          ldt.atZone(ZoneOffset.of(norm)).withZoneSameInstant(NY)
      }
      Some(z)
    } catch { case _: Exception => None }

  private def nanos(frac: String): Int =
    if (frac == null) 0 else (frac + "0" * (9 - frac.length)).toInt

  private def i(s: String, dflt: Int = 0): Int = if (s == null) dflt else s.toInt

  /** Strict parse of the whole string; None if no pattern matches. */
  private[etl] def strict(s: String): Option[ZonedDateTime] = s.trim match {
    case isoYmd(y, mo, d, h, mi, sec, frac, zone) =>
      mk(y.toInt, mo.toInt, d.toInt, i(h), i(mi), i(sec), nanos(frac), zone)
    case mdy(mo, d, y, h, mi, sec, frac) =>
      // dateutil's day-first rescue: "15/08/2026" has no valid month in
      // position 1, so the day and month swap (parser.py's _parse)
      val (m2, d2) =
        if (mo.toInt > 12 && d.toInt <= 12) (d.toInt, mo.toInt)
        else (mo.toInt, d.toInt)
      mk(y.toInt, m2, d2, i(h), i(mi), i(sec), nanos(frac), null)
    case monthName(mon, d, y, h, mi, sec) =>
      months.get(mon.toLowerCase.take(3)).flatMap(m =>
        mk(y.toInt, m, d.toInt, i(h), i(mi), i(sec), 0, null))
    case dayFirst(d, mon, y, h, mi, sec) =>
      months.get(mon.toLowerCase.take(3)).flatMap(m =>
        mk(y.toInt, m, d.toInt, i(h), i(mi), i(sec), 0, null))
    case compactYmd(y, mo, d, h, mi, sec) =>
      mk(y.toInt, mo.toInt, d.toInt, i(h), i(mi), i(sec), 0, null)
    case _ => None
  }

  /** Fuzzy parse: first date-like token embedded anywhere (the analogue of
    * `dateutil.parser.parse(fuzzy=True)`, ingest.py:418-419).
    */
  private[etl] def fuzzy(s: String): Option[ZonedDateTime] = s match {
    case embeddedYmd(y, mo, d, h, mi, sec, frac) =>
      mk(y.toInt, mo.toInt, d.toInt, i(h), i(mi), i(sec), nanos(frac), null)
    case embeddedMdy(mo, d, y) => mk(y.toInt, mo.toInt, d.toInt, 0, 0, 0, 0, null)
    case _ => None
  }

  /** Total lenient timestamp parse (ingest.py:390-422): future values are
    * clamped to `now`; fuzzy fallback on strict failure.
    */
  def timestamp(s: String, now: Instant): Timestamp = {
    if (guard(s)) return null
    val parsed = strict(s) match {
      case Some(z) =>
        val inst = z.toInstant
        Some(if (inst.isAfter(now)) now else inst)
      case None => fuzzy(s).map(_.toInstant) // reference fuzzy path skips the clamp
    }
    parsed.map(Timestamp.from).orNull
  }

  def timestamp(s: String): Timestamp = timestamp(s, nowInstant)

  /** Total lenient date parse (ingest.py:424-443): future dates → null. */
  def date(s: String, now: Instant): Date = {
    if (guard(s)) return null
    strict(s) match {
      case Some(z) =>
        val d = z.toLocalDate
        if (d.isAfter(LocalDate.ofInstant(now, NY))) null
        else Date.valueOf(d)
      case None => null
    }
  }

  def date(s: String): Date = date(s, nowInstant)
}
