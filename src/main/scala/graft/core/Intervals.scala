package graft.core

/** The incremental-sync interval algebra — the testable core of the engine.
  *
  * Faithful port of smalltsdb's `intervals()` (tsdb.py:234-268): for a given
  * period and time, return which bucket range is now *final* (safe to
  * materialize, will never be revisited) and which is still *partial*
  * (in-flight, visible only to view-mode reads).
  *
  * Both intervals are half-open `[start, end)` (the reference docstring at
  * tsdb.py:247 says so explicitly; see SURVEY.md §2.9 Q2 for the one place
  * the reference's SQL deviates from its own algebra and our decision to
  * follow the algebra, not the bug).
  *
  * `tail` is the lateness bound: datapoints newer than `now - tail` are not
  * yet considered final (tsdb.py:302-303) — the same role a watermark delay
  * plays in Structured Streaming.
  */
object Intervals {

  final case class Interval(start: Double, end: Double) {
    def isEmpty: Boolean = start >= end
  }

  final case class Result(finalInterval: Interval, partialInterval: Interval)

  /** Python's `//` floor-division on doubles. */
  private def floorDiv(a: Double, b: Double): Double = math.floor(a / b)

  /** @param period     bucket width in seconds (e.g. 10 for tensecond)
    * @param tail       lateness bound in seconds
    * @param now        current time, epoch seconds
    * @param lastFinal  bucket start of the last finalized bucket for this
    *                   series, or None if never synced (⇒ sync from epoch,
    *                   tsdb.py:260-261)
    */
  def intervals(
      period: Long,
      tail: Long,
      now: Double,
      lastFinal: Option[Double]): Result = {
    val lf = lastFinal.getOrElse(-period.toDouble)
    val finalStart = lf + period
    val finalEnd = floorDiv(now - tail, period.toDouble) * period
    val partialStart = finalEnd
    val partialEnd = (floorDiv(now, period.toDouble) + 1) * period
    Result(Interval(finalStart, finalEnd), Interval(partialStart, partialEnd))
  }
}
