package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class TimerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("instrumented sync emits its own timing datapoints into incoming (W10)") {
    val root = Files.createTempDirectory("graft-timer").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)
    tsdb.insert(Seq(("one", 1.0, 1.0)))
    Timer.instrumentedSync(tsdb)
    val selfMetrics = tsdb.incoming
      .filter(org.apache.spark.sql.functions.col("path")
        .startsWith("graft.sync"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val byPath = selfMetrics.map(p => p._1 -> p._3).toMap
    assert(byPath.keySet.contains("graft.sync.total.time"))
    assert(byPath("graft.sync.total.time") > 0)
    assert(selfMetrics.forall(_._2 == 1000.0))
    // psutil-parity clocks ride along for whatever procfs exposes here
    // (one delta per clock; kernels without task IO accounting report
    // only the CPU clocks, matching the production degradation)
    Timer.procTimings().map(_._1).foreach { clock =>
      assert(byPath.keySet.contains(s"graft.sync.total.$clock"), clock)
    }
  }

  test("timer records block timings under prefix.name.time") {
    val t = new Timer("p", () => 42.0, callbacks = Seq.empty)
    val r = t.timed("work") { 7 }
    t.emit("count", 3)
    assert(r == 7)
    val pts = t.drain()
    assert(pts.map(_._1) == Seq("p.work.time", "p.count"))
    assert(pts.forall(_._2 == 42.0))
    assert(t.drain().isEmpty)
  }

  test("psutil-parity process clocks: per-block deltas, non-negative") {
    val clocks = Timer.procTimings().map(_._1)
    assume(clocks.nonEmpty) // procfs platforms only
    val t = new Timer("p", () => 1.0)
    t.timed("busy") {
      // burn some user CPU and do real I/O so the deltas can move
      var s = 0L
      (0 until 2000000).foreach(i => s += i * i)
      val f = Files.createTempFile("timer-io", ".bin")
      Files.write(f, Array.fill[Byte](1 << 16)(1))
      Files.readAllBytes(f)
      Files.delete(f)
      s
    }
    val pts = t.drain().map(p => p._1 -> p._3).toMap
    // exactly one delta per clock procfs exposes here, plus wall time
    assert(pts.keySet == (clocks.map(c => s"p.busy.$c").toSet + "p.busy.time"))
    assert(pts.forall(_._2 >= 0.0))
    // syscall counting, where available, must see our write
    if (clocks.contains("write_count")) assert(pts("p.busy.write_count") > 0)
  }
}
