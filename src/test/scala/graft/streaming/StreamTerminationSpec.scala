package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamTerminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def noopQuery(name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    stream.addData(1L)
    val q = stream.toDF().writeStream
      .format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q
  }

  test("drains registered with the same layoutKey are serialized; " +
    "different layouts run concurrently; awaitDrain sees both complete") {
    val active = new AtomicInteger(0)
    val maxActive = new AtomicInteger(0)
    val ran = new AtomicInteger(0)
    def body(): Unit = {
      val a = active.incrementAndGet()
      maxActive.getAndUpdate(m => math.max(m, a))
      Thread.sleep(250)
      active.decrementAndGet()
      ran.incrementAndGet()
      ()
    }
    val q1 = noopQuery("st_term_a")
    val q2 = noopQuery("st_term_b")
    StreamTermination.onCleanTermination(spark, q1, "t1",
      layoutKey = "/layout/X")(body())
    StreamTermination.onCleanTermination(spark, q2, "t2",
      layoutKey = "/layout/X")(body())
    q1.stop(); q2.stop()
    assert(StreamTermination.awaitDrain(q1), "q1 drain timed out")
    assert(StreamTermination.awaitDrain(q2), "q2 drain timed out")
    assert(ran.get() == 2)
    assert(maxActive.get() == 1,
      s"same-layout drains overlapped (max concurrent ${maxActive.get()})")

    // distinct layouts are NOT serialized against each other: each
    // body waits at a 2-party barrier, so the test passes only if both
    // bodies are IN FLIGHT at once — were per-layout locking wrongly
    // global, the first body would hold the lock at the barrier and
    // the second could never arrive (barrier timeout -> overlapped
    // stays false)
    val p1 = noopQuery("st_term_c")
    val p2 = noopQuery("st_term_d")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val overlapped = new AtomicInteger(0)
    def body2(): Unit =
      try {
        barrier.await(15, java.util.concurrent.TimeUnit.SECONDS)
        overlapped.incrementAndGet()
        ()
      } catch { case _: Throwable => () }
    StreamTermination.onCleanTermination(spark, p1, "t3",
      layoutKey = "/layout/Y")(body2())
    StreamTermination.onCleanTermination(spark, p2, "t4",
      layoutKey = "/layout/Z")(body2())
    p1.stop(); p2.stop()
    assert(StreamTermination.awaitDrain(p1) && StreamTermination.awaitDrain(p2))
    assert(overlapped.get() == 2,
      "distinct-layout drains should have overlapped — per-layout " +
        "locking is over-serializing")
  }
}
