package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Periods

/** W1–W6 as a genuine Structured Streaming query: tumbling event-time
  * windows + watermark(tail) + append-mode finalization + late drop,
  * reproducing the reference's sync-visibility behavior
  * (tests/test_smalltsdb.py:121-155) without a batch sync loop.
  */
class StreamingAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append-mode window agg finalizes once and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Double, Double)]
    val agg = StreamingAgg.finalBuckets(
      stream.toDF().toDF("path", "timestamp", "value"),
      Periods.TenSecond, tailSeconds = 60)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sagg").start()

    def rows: Seq[(String, Double, Double)] =
      spark.table("sagg").select("path", "timestamp", "n")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .toSeq.sorted

    // batch 1: the golden points — nothing final yet (watermark at 5-60)
    stream.addData(("one", 1.0, 1.0), ("one", 2.0, 5.0), ("two", 5.0, 2.0))
    q.processAllAvailable()
    assert(rows == Seq())

    // batch 2: tick advances event time to 70 => watermark 10: bucket 0
    // finalizes with BOTH of one's points (1 and 5) and two's point
    stream.addData(("tick", 70.0, 0.0))
    q.processAllAvailable()
    stream.addData(("tick", 71.0, 0.0)) // flush batch to emit
    q.processAllAvailable()
    assert(rows == Seq(("one", 0.0, 2.0), ("two", 0.0, 1.0)))

    // golden percentiles survived streaming state: p90 of [1,5] = 4.6
    val g = spark.table("sagg")
      .filter($"path" === "one" && $"timestamp" === 0.0)
      .select("p50", "p90", "p99").collect()(0)
    assert((g.getDouble(0), g.getDouble(1), g.getDouble(2)) == (3.0, 4.6, 4.96))

    // batch 3: a point for bucket 10 (>= watermark, accepted) + tick to
    // push the watermark far past it
    stream.addData(("one", 12.0, 1.0), ("tick", 200.0, 0.0))
    q.processAllAvailable()
    stream.addData(("tick", 201.0, 0.0))
    q.processAllAvailable()
    assert(rows.contains(("one", 10.0, 1.0)))

    // batch 4: late data for the long-finalized bucket 0 — dropped (W6)
    stream.addData(("one", 3.0, 99.0), ("tick", 300.0, 0.0))
    q.processAllAvailable()
    stream.addData(("tick", 301.0, 0.0))
    q.processAllAvailable()
    q.stop()
    assert(rows.count { case (p, t, _) => p == "one" && t == 0.0 } == 1)
    assert(rows.filter(_._1 == "one").map(_._3).sum == 3.0) // 2 + 1, no 99
  }

  test("approxPercentileAccuracy bounds the percentile state to a " +
    "sketch: same window algebra, rank-bounded (non-interpolated) " +
    "percentile columns") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Double, Double)]
    val agg = StreamingAgg.finalBuckets(
      stream.toDF().toDF("path", "timestamp", "value"),
      Periods.TenSecond, tailSeconds = 60,
      approxPercentileAccuracy = Some(10000))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("saggapx").start()
    stream.addData(("one", 1.0, 1.0), ("one", 2.0, 5.0))
    q.processAllAvailable()
    stream.addData(("tick", 70.0, 0.0))
    q.processAllAvailable()
    stream.addData(("tick", 71.0, 0.0))
    q.processAllAvailable()
    q.stop()
    val g = spark.table("saggapx")
      .filter($"path" === "one" && $"timestamp" === 0.0)
      .select("n", "min", "max", "avg", "sum", "p50", "p90", "p99")
      .collect()(0)
    assert((g.getDouble(0), g.getDouble(1), g.getDouble(2), g.getDouble(3),
      g.getDouble(4)) == (2.0, 1.0, 5.0, 3.0, 6.0))
    // the sketch returns ACTUAL data values (the documented parity
    // trade vs the exact interpolated 3.0/4.6/4.96) within rank bounds
    for (i <- 5 to 7) {
      assert(Set(1.0, 5.0).contains(g.getDouble(i)),
        s"col $i = ${g.getDouble(i)}")
    }
    assert(g.getDouble(5) <= g.getDouble(6) && g.getDouble(6) <= g.getDouble(7))
  }
}
