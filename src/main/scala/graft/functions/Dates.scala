package graft.functions

import java.time.{LocalDate, LocalDateTime, LocalTime, ZoneOffset}

/** Flexible date parsing for program arguments — the twin of the
  * reference's `--start-date` contract (common/Utils.java:21-47 and its
  * users FlinkCommitProgram.java:53,92, FlinkMailingListToKafka.java:31,
  * FlinkPullRequestsToKafka.java:35): a user may pass a year-month, a
  * full date, or a date-time, and the missing fields default — day of
  * month to 1, time of day to midnight. The empty string (the programs'
  * default when the argument is absent) means "now". All times are UTC
  * (the reference's EVALUATION_ZONE).
  *
  * Semantics matched exactly, construction original: the reference builds
  * a DateTimeFormatter with optional sections and parse defaults; this
  * twin names the three accepted shapes directly, which also gives the
  * caller a better error message than a formatter's index-based one.
  */
object Dates {

  private val YearMonth = """(\d{4})-(\d{2})""".r
  private val FullDate  = """(\d{4})-(\d{2})-(\d{2})""".r
  // time part: ISO local time with a literal Z, case-insensitive T/Z —
  // the reference appends ISO_LOCAL_TIME under parseCaseInsensitive, so
  // HH:mm, HH:mm:ss and fractional seconds are all accepted
  private val DateTime  = """(?i)(\d{4})-(\d{2})-(\d{2})T(\d{2}:\d{2}(?::\d{2}(?:\.\d{1,9})?)?)Z""".r

  /** Parse a flexible date string; null/empty → `now` (injectable for
    * tests; defaults to the current UTC wall clock, as the reference's
    * `LocalDateTime.now()`). Throws IllegalArgumentException on any
    * other shape — a mistyped `--start-date` must fail the program
    * loudly, not silently scan from epoch. */
  def parseFlexibleDate(s: String,
      now: () => LocalDateTime = () => LocalDateTime.now(ZoneOffset.UTC)): LocalDateTime =
    s match {
      case null | "" => now()
      case YearMonth(y, m) =>
        LocalDateTime.of(y.toInt, m.toInt, 1, 0, 0)
      case FullDate(y, m, d) =>
        LocalDateTime.of(y.toInt, m.toInt, d.toInt, 0, 0)
      case DateTime(y, m, d, t) =>
        LocalDateTime.of(LocalDate.of(y.toInt, m.toInt, d.toInt),
          LocalTime.parse(t.toUpperCase))
      case other =>
        throw new IllegalArgumentException(
          s"unparseable date '$other' — expected YYYY-MM, YYYY-MM-DD or YYYY-MM-DDTHH:MM[:SS]Z")
    }

  /** The parsed instant on the UTC line — what a Spark timestamp filter
    * wants (session timezone is UTC throughout the library). */
  def parseFlexibleInstant(s: String,
      now: () => LocalDateTime = () => LocalDateTime.now(ZoneOffset.UTC)): java.time.Instant =
    parseFlexibleDate(s, now).toInstant(ZoneOffset.UTC)
}
