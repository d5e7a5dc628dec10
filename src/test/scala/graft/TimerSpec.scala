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
    assert(selfMetrics.length == 1)
    assert(selfMetrics(0).getString(0) == "graft.sync.total.time")
    assert(selfMetrics(0).getDouble(1) == 1000.0)
    assert(selfMetrics(0).getDouble(2) > 0)
  }

  test("timer records block timings under prefix.name.time") {
    val t = new Timer("p", () => 42.0)
    val r = t.timed("work") { 7 }
    t.emit("count", 3)
    assert(r == 7)
    val pts = t.drain()
    assert(pts.map(_._1) == Seq("p.work.time", "p.count"))
    assert(pts.forall(_._2 == 42.0))
    assert(t.drain().isEmpty)
  }
}
