package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{TestSpark, Tsdb}
import graft.api.Graph.{MetricSpec, Series}

/** Graph data prep vs the reference's make_graph on its own "notebook
  * dataset" (the commented fixture in app/__init__.py:46-61).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val notebookPoints = Seq(
    ("one", 5.0, 2.0), ("two", 6.0, 4.0), ("one", 8.0, 1.0),
    ("two", 12.0, 4.0), ("one", 16.0, 5.0), ("one", 22.0, 2.0),
    ("one", 31.0, 1.0), ("one", 33.0, 2.0), ("two", 40.0, 6.0),
    ("one", 48.0, 4.0))

  private lazy val tsdb = {
    val root = Files.createTempDirectory("graft-graph").toString
    val t = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)
    t.insert(notebookPoints)
    t.sync()
    t
  }

  test("graphData: ms timestamps, per-metric series, short labels") {
    val got = Graph.graphData(tsdb,
      Seq(MetricSpec("one", "tensecond", "avg"),
        MetricSpec("two", "tensecond", "avg")),
      (0.0, 60.0))
    assert(got == Seq(
      Series("one", Seq(0.0, 10000.0, 20000.0, 30000.0, 40000.0),
        Seq(Some(1.5), Some(5.0), Some(2.0), Some(1.5), Some(4.0))),
      Series("two", Seq(0.0, 10000.0, 40000.0),
        Seq(Some(4.0), Some(4.0), Some(6.0)))))
  }

  test("empty series becomes the [[0],[0]] placeholder") {
    val got = Graph.graphData(tsdb,
      Seq(MetricSpec("one", "tensecond", "avg"),
        MetricSpec("nosuch", "tensecond", "avg")),
      (0.0, 60.0))
    assert(got(1) == Series("nosuch", Seq(0.0), Seq(Some(0.0))))
  }

  test("parseRequest: query string -> metrics, window, flags (the /graph route)") {
    val q = Map(
      "metrics.0.name" -> "one", "metrics.0.period" -> "tensecond",
      "metrics.0.stat" -> "avg",
      "metrics.1.name" -> "  ", "metrics.1.period" -> "tensecond",
      "metrics.1.stat" -> "max",
      "start" -> "100", "title" -> "t", "points" -> "1")
    val r = Graph.parseRequest(q, now = 7325.0)
    assert(r.metrics == Seq(MetricSpec("one", "tensecond", "avg"))) // blank dropped
    assert(r.interval == (100.0, 7320.0)) // explicit start, default end = minute-truncated now
    assert(r.title.contains("t") && r.label.isEmpty && r.points)

    val defaults = Graph.parseRequest(Map.empty, now = 7325.0)
    assert(defaults.interval == (3720.0, 7320.0)) // last hour
    assert(defaults.metrics.isEmpty && !defaults.points)
  }

  test("shortNames keeps varying positions, position 0 when all equal") {
    // app/__init__.py:72-82
    assert(Graph.shortNames(Seq(
      Seq("one", "tensecond", "avg"),
      Seq("two", "tensecond", "avg"))) == Seq("one", "two"))
    assert(Graph.shortNames(Seq(
      Seq("one", "tensecond", "avg"),
      Seq("one", "onehour", "max"))) ==
      Seq("tensecond avg", "onehour max"))
    assert(Graph.shortNames(Seq(
      Seq("one", "tensecond", "avg"),
      Seq("one", "tensecond", "avg"))) == Seq("one", "one"))
  }

  test("nonBlank drops blank metric names (the /graph route filter)") {
    assert(Graph.nonBlank(Seq(
      MetricSpec("one", "p", "s"), MetricSpec("  ", "p", "s"),
      MetricSpec("", "p", "s"))) == Seq(MetricSpec("one", "p", "s")))
  }
}
