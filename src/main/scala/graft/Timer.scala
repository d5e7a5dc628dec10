package graft

import scala.collection.mutable.ArrayBuffer

/** Self-metrics instrumentation (reference timer.py:16-121 + the
  * emit_metrics loops at tsdb.py:315-337 / daemon.py:176-198): timing a
  * block produces ordinary `(path, timestamp, value)` datapoints that are
  * appended back into `incoming` — the database measures itself with
  * itself.
  */
final class Timer(prefix: String, now: () => Double) {
  private val points = ArrayBuffer.empty[(String, Double, Double)]

  /** Record `value` under `prefix.name` at the current clock. */
  def emit(name: String, value: Double): Unit =
    points += ((s"$prefix.$name", now(), value))

  /** Time a block; emits `<name>.time` seconds. */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally emit(s"$name.time", (System.nanoTime() - t0) / 1e9)
  }

  def drain(): Seq[(String, Double, Double)] = {
    val out = points.toSeq
    points.clear()
    out
  }
}

object Timer {

  /** Run a full instrumented sync: times each period's sync and the
    * retention delete, then appends the timings as ordinary datapoints
    * (the reference's `(2 + 6·(2 + m))·7`-point self-metrics loop,
    * tsdb.py:318-336, collapsed to the metrics that exist in this
    * engine's set-oriented sync).
    */
  def instrumentedSync(tsdb: Tsdb, prefix: String = "graft.sync"): Unit = {
    val t = new Timer(prefix, tsdb.now)
    t.timed("total")(tsdb.sync())
    val pts = t.drain()
    if (pts.nonEmpty) tsdb.insert(pts)
  }
}
