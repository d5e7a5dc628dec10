package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's 16-case `intervals` spec table
  * (tests/test_smalltsdb.py:85-118) plus algebraic properties swept over a
  * deterministic input grid.
  */
class IntervalsSpec extends AnyFunSuite {

  // (period, tail, now, lastFinal) -> ((finalStart, finalEnd), (partialStart, partialEnd))
  val cases: Seq[((Long, Long, Long, Option[Long]), ((Long, Long), (Long, Long)))] = Seq(
    ((10L, 30L, 102L, Some(30L)), ((40L, 70L), (70L, 110L))),
    ((10L, 30L, 102L, Some(50L)), ((60L, 70L), (70L, 110L))),
    ((10L, 30L, 102L, Some(60L)), ((70L, 70L), (70L, 110L))),
    ((10L, 30L, 109L, Some(60L)), ((70L, 70L), (70L, 110L))),
    ((10L, 30L, 110L, Some(60L)), ((70L, 80L), (80L, 120L))),
    ((60L, 30L, 102L, Some(0L)), ((60L, 60L), (60L, 120L))),
    ((60L, 30L, 119L, Some(0L)), ((60L, 60L), (60L, 120L))),
    ((60L, 30L, 120L, Some(0L)), ((60L, 60L), (60L, 180L))),
    ((60L, 30L, 149L, Some(0L)), ((60L, 60L), (60L, 180L))),
    ((60L, 30L, 150L, Some(0L)), ((60L, 120L), (120L, 180L))),
    ((60L, 30L, 150L, Some(60L)), ((120L, 120L), (120L, 180L))),
    ((300L, 60L, 1499L, Some(0L)), ((300L, 1200L), (1200L, 1500L))),
    ((300L, 60L, 1499L, Some(900L)), ((1200L, 1200L), (1200L, 1500L))),
    ((300L, 60L, 1500L, Some(900L)), ((1200L, 1200L), (1200L, 1800L))),
    ((300L, 60L, 1559L, Some(900L)), ((1200L, 1200L), (1200L, 1800L))),
    ((300L, 60L, 1560L, Some(900L)), ((1200L, 1500L), (1500L, 1800L))))

  test("reference 16-case spec table") {
    for (((p, t, n, lf), ((fs, fe), (ps, pe))) <- cases) {
      val r = Intervals.intervals(p, t, n.toDouble, lf.map(_.toDouble))
      assert(r.finalInterval.start == fs && r.finalInterval.end == fe,
        s"final mismatch for intervals($p, $t, $n, $lf): $r")
      assert(r.partialInterval.start == ps && r.partialInterval.end == pe,
        s"partial mismatch for intervals($p, $t, $n, $lf): $r")
    }
  }

  test("never-synced series starts at epoch (lastFinal = None => -period)") {
    val r = Intervals.intervals(10, 30, 102, None)
    assert(r.finalInterval == Intervals.Interval(0, 70))
    assert(r.partialInterval == Intervals.Interval(70, 110))
  }

  test("docstring example: intervals(10, 30, 102, 30) == ((40,70),(70,110))") {
    val r = Intervals.intervals(10, 30, 102.0, Some(30.0))
    assert(r.finalInterval == Intervals.Interval(40, 70))
    assert(r.partialInterval == Intervals.Interval(70, 110))
  }

  test("property sweep: final and partial are adjacent, aligned, cover now") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val period = Seq(1L, 10L, 60L, 300L, 3600L, 86400L)(rng.nextInt(6))
      val tail = rng.nextLong(600)
      val now = rng.nextLong(10_000_000L).toDouble
      val lastFinal =
        if (rng.nextBoolean()) Some((rng.nextLong(100_000L) / period) * period.toDouble)
        else None
      val r = Intervals.intervals(period, tail, now, lastFinal)
      // adjacency: partial picks up exactly where final ends
      assert(r.finalInterval.end == r.partialInterval.start)
      // bucket alignment of every boundary (finalStart = lastFinal + period
      // is aligned whenever lastFinal is)
      assert(r.finalInterval.end % period == 0)
      assert(r.partialInterval.end % period == 0)
      assert(r.finalInterval.start % period == 0)
      // the partial interval always contains `now`
      assert(r.partialInterval.end > now)
      // nothing newer than now - tail is ever final
      assert(r.finalInterval.end <= now - tail + period)
    }
  }
}
