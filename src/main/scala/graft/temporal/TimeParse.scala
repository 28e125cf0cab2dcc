package graft.temporal

import java.time.{Duration, LocalDate, LocalDateTime, LocalTime}
import java.time.format.DateTimeFormatter

/** Deterministic natural-language timestamp parsing — the reference
  * accepts `GET /query?timestamp=yesterday at 4:00 PM` via
  * `parsedatetime` (reference app/main.py:105-108). This is the
  * reproducible subset: relative phrases resolve against an injected
  * `now` (never the wall clock), so the same query string always means
  * the same instant in tests and replays.
  *
  * Supported: ISO date / datetime, `now`, `today`, `yesterday`,
  * `tomorrow`, `N <seconds|minutes|hours|days|weeks> ago`,
  * `in N <unit>`, and an optional `at HH:MM[:SS]` / `at H AM|PM`
  * suffix on the day forms.
  */
object TimeParse {

  private val IsoDateTime = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val Ago = """(\d+)\s+(second|minute|hour|day|week)s?\s+ago""".r
  private val In = """in\s+(\d+)\s+(second|minute|hour|day|week)s?""".r
  private val DayAt = """(today|yesterday|tomorrow)(?:\s+at\s+(.+))?""".r

  private def unit(n: Long, u: String): Duration = u match {
    case "second" => Duration.ofSeconds(n)
    case "minute" => Duration.ofMinutes(n)
    case "hour" => Duration.ofHours(n)
    case "day" => Duration.ofDays(n)
    case "week" => Duration.ofDays(7 * n)
  }

  private def timeOfDay(s: String): LocalTime = {
    val t = s.trim.toUpperCase(java.util.Locale.ROOT)
    val ampm = """(\d{1,2})(?::(\d{2}))?\s*(AM|PM)""".r
    t match {
      case ampm(h, m, ap) =>
        val h24 = (h.toInt % 12) + (if (ap == "PM") 12 else 0)
        LocalTime.of(h24, Option(m).map(_.toInt).getOrElse(0))
      case _ => LocalTime.parse(if (t.length == 5) t + ":00" else t)
    }
  }

  /** Parse `s` relative to `now` (format `yyyy-MM-dd HH:mm:ss`). */
  def parse(s: String, now: String): String = {
    val nowDt = LocalDateTime.parse(now, IsoDateTime)
    def day(d: LocalDate, at: Option[String]): LocalDateTime =
      d.atTime(at.map(timeOfDay).getOrElse(LocalTime.MIDNIGHT))
    val res = s.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "now" => nowDt
      case DayAt(which, at) =>
        val base = which match {
          case "today" => nowDt.toLocalDate
          case "yesterday" => nowDt.toLocalDate.minusDays(1)
          case "tomorrow" => nowDt.toLocalDate.plusDays(1)
        }
        day(base, Option(at))
      case Ago(n, u) => nowDt.minus(unit(n.toLong, u))
      case In(n, u) => nowDt.plus(unit(n.toLong, u))
      case iso if iso.matches("""\d{4}-\d{2}-\d{2}""") =>
        LocalDate.parse(iso).atStartOfDay()
      case iso => LocalDateTime.parse(iso, IsoDateTime)
    }
    res.format(IsoDateTime)
  }
}
