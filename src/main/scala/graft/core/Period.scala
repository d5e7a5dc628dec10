package graft.core

/** An aggregation period (tumbling-window size).
  *
  * Reference: smalltsdb `Period(name, duration)` NamedTuple and the fixed
  * default set of six periods (tsdb.py:53-65).
  */
final case class Period(name: String, seconds: Long) {
  require(seconds > 0, s"period seconds must be positive: $seconds")
}

object Periods {
  val OneSecond: Period = Period("onesecond", 1L)
  val TenSecond: Period = Period("tensecond", 10L)
  val OneMinute: Period = Period("oneminute", 60L)
  val FiveMinute: Period = Period("fiveminute", 300L)
  val OneHour: Period = Period("onehour", 3600L)
  val OneDay: Period = Period("oneday", 86400L)

  /** Default period set, mirroring tsdb.py:58-65. */
  val all: Seq[Period] =
    Seq(OneSecond, TenSecond, OneMinute, FiveMinute, OneHour, OneDay)

  val byName: Map[String, Period] = all.map(p => p.name -> p).toMap

  /** Longest period; drives raw-data retention (tsdb.py:412-420). */
  def maxSeconds(periods: Seq[Period] = all): Long = periods.map(_.seconds).max
}

/** The closed stat vocabulary of an aggregate series (tsdb.py:67). */
object Stats {
  val all: Seq[String] = Seq("n", "min", "max", "avg", "sum", "p50", "p90", "p99")
  private val set = all.toSet
  def isValid(stat: String): Boolean = set(stat)

  /** Columns of a period table: (path, timestamp) key + the stats
    * (tsdb.py:165-180).
    */
  val aggColumns: Seq[String] = Seq("path", "timestamp") ++ all
}
