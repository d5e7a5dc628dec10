package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CoreQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggRounded: ONE aggregation carries the decimal sum beside the " +
    "8 stats — no second aggregate, no self-join in the plan") {
    val inc = Seq(
      ("a", 3.0, 1.0), ("a", 7.0, 5.0),  // one tensecond bucket
      ("a", 13.0, 2.0),
      ("b", 3.0, 4.0)).toDF("path", "timestamp", "value")
    val df = CoreQueries.aggRounded(inc, 10)
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case a: Aggregate => a }.size == 1,
      s"expected exactly one Aggregate in:\n$plan")
    assert(plan.collect { case j: Join => j }.isEmpty,
      s"expected no Join in:\n$plan")
    // and the values are the comparison semantics the oracles pin:
    // decimal-exact sum/avg, numpy-style interpolated percentiles
    val r = df.filter($"path" === "a" && $"timestamp" === 0.0).head()
    assert(r.getDouble(2) == 2.0)            // n
    assert(r.getDouble(3) == 1.0)            // min
    assert(r.getDouble(4) == 5.0)            // max
    assert(r.getDouble(5) == 3.0)            // avg
    assert(r.getDouble(6) == 6.0)            // sum
    assert(r.getDouble(7) == 3.0)            // p50 of [1,5]
    assert(r.getDouble(8) == 4.6)            // p90 of [1,5] — golden value
    assert(r.getDouble(9) == 4.96)           // p99 of [1,5] — golden value
  }
}
