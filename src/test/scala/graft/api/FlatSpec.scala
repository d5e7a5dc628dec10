package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's flatten/unflatten round-trip cases
  * (tests/test_app_flat.py:11-79).
  */
class FlatSpec extends AnyFunSuite {

  // the reference's canonical example (FIXTURES.md A7)
  private val nested: Map[String, Any] = Map(
    "a" -> Seq(Map("x" -> 1), Map("x" -> 2, "y" -> 3)),
    "b" -> Map("c" -> Seq("foo", "bar"), "d" -> 4),
    "e" -> 5)

  private val flat: Map[String, Any] = Map(
    "a.0.x" -> 1, "a.1.x" -> 2, "a.1.y" -> 3,
    "b.c.0" -> "foo", "b.c.1" -> "bar", "b.d" -> 4, "e" -> 5)

  test("flatten matches the reference example") {
    assert(Flat.flatten(nested) == flat)
  }

  test("unflatten matches the reference example") {
    assert(Flat.unflatten(flat) == nested)
  }

  test("round trips both ways") {
    assert(Flat.unflatten(Flat.flatten(nested)) == nested)
    assert(Flat.flatten(Flat.unflatten(flat)) == flat)
  }

  test("integer-keyed siblings become ordered lists") {
    assert(Flat.unflatten(Map("x.1" -> "b", "x.0" -> "a", "x.2" -> "c")) ==
      Map("x" -> Seq("a", "b", "c")))
  }

  test("strict int keys: offset or gapped indices raise (int_keys_to_list)") {
    // tests/test_app_flat.py:58-62
    val e1 = intercept[IllegalArgumentException] {
      Flat.unflatten(Map("x.1" -> "a"))
    }
    assert(e1.getMessage == "must start from 0")
    val e2 = intercept[IllegalArgumentException] {
      Flat.unflatten(Map("x.0" -> "a", "x.2" -> "b"))
    }
    assert(e2.getMessage == "must have no gaps")
  }

  test("conflicting leaf-and-prefix keys and duplicate normalized " +
    "indices raise instead of silently dropping entries") {
    val e1 = intercept[IllegalArgumentException] {
      Flat.unflatten(Map("metrics" -> "x", "metrics.0.name" -> "cpu"))
    }
    assert(e1.getMessage.contains("conflicting"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Flat.unflatten(Map("m.0.name" -> "a", "m.00.name" -> "b"))
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
  }

  test("depth limit raises (reference max depth)") {
    val deep = Map("a.b.c.d.e.f.g.h.i.j.k.l" -> 1)
    intercept[Flat.DepthError] { Flat.unflatten(deep) }
    var v: Any = 1
    for (_ <- 1 to 12) v = Map("k" -> v)
    intercept[Flat.DepthError] { Flat.flatten(v) }
  }

  test("legend shortener drops constant components (F8)") {
    assert(Flat.shortenLabels(Seq(
      "local.random.diceroll.onesecond.avg",
      "local.random.diceroll.onesecond.max",
      "local.random.diceroll.oneminute.avg")) ==
      Seq("onesecond.avg", "onesecond.max", "oneminute.avg"))
    // all-constant labels keep position 0 (make_short_names fallback)
    assert(Flat.shortenLabels(Seq("a.b", "a.b")) == Seq("a", "a"))
    assert(Flat.shortenLabels(Seq("only.one")) == Seq("only.one"))
  }
}
