package graft.api

import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}

/** Datetime parsing at the HTTP/CLI edge — reference `parse_datetime`
  * (app/__init__.py:158-166): an integer is an epoch timestamp; anything
  * else must parse as ISO8601 (naive datetimes are UTC, like the
  * iso8601 package's default). The reference's `/graph` route defaults
  * the window to the last hour ending at "now truncated to the minute"
  * (app/__init__.py:177-183).
  *
  * Additionally accepts plain fractional epoch seconds ("123.5") — the
  * engine stores timestamps as epoch-second doubles, and earlier CLI
  * versions took them raw; a strict superset of the reference's forms.
  */
object Datetimes {

  class ParseError(msg: String) extends IllegalArgumentException(msg)

  /** Epoch seconds of an epoch-int / epoch-double / ISO8601 string.
    * Non-finite doubles ('NaN'/'Infinity', which `toDoubleOption`
    * happily parses) are NOT timestamps: accepted, a NaN interval
    * bound matches no rows and the route returns plausible-looking
    * empty data with HTTP 200 instead of the documented 400.
    */
  def parse(value: String): Double = {
    val v = value.trim
    v.toLongOption.map(_.toDouble)
      .orElse(v.toDoubleOption.filter(d =>
        !d.isNaN && !d.isInfinity))
      .getOrElse(parseIso(v))
  }

  private def parseIso(v: String): Double = {
    // iso8601.parse_date accepts 'T' or ' ' as the date/time separator,
    // offset or no offset (naive = UTC), and a bare date (midnight UTC)
    val s = if (v.contains('T') || !v.contains(' ')) v else {
      val i = v.indexOf(' ')
      v.substring(0, i) + "T" + v.substring(i + 1)
    }
    def offset = OffsetDateTime.parse(s).toInstant
    def naive = LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
    def dateOnly = LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)
    val inst =
      try offset catch { case _: Exception =>
        try naive catch { case _: Exception =>
          try dateOnly catch { case _: Exception =>
            throw new ParseError(s"not an epoch timestamp or ISO8601 datetime: $v")
          }
        }
      }
    inst.toEpochMilli / 1000.0
  }

  /** The /graph default window: (end − 1h, end) with end = `now`
    * truncated to the minute (app/__init__.py:177-178).
    */
  def defaultInterval(now: Double): (Double, Double) = {
    val end = math.floor(now / 60.0) * 60.0
    (end - 3600.0, end)
  }
}
