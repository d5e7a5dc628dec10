package graft.api

import org.scalatest.funsuite.AnyFunSuite

class DatetimesSpec extends AnyFunSuite {

  test("epoch ints and doubles pass through") {
    assert(Datetimes.parse("1234") == 1234.0)
    assert(Datetimes.parse("-5") == -5.0)
    assert(Datetimes.parse("123.5") == 123.5)
  }

  test("ISO8601 forms: offset, naive (=UTC), space separator, bare date") {
    assert(Datetimes.parse("2020-01-01T00:00:30+00:00") == 1577836830.0)
    assert(Datetimes.parse("2020-01-01T01:00:30+01:00") == 1577836830.0)
    assert(Datetimes.parse("2020-01-01T00:00:30") == 1577836830.0)
    assert(Datetimes.parse("2020-01-01 00:00:30") == 1577836830.0)
    assert(Datetimes.parse("2020-01-01") == 1577836800.0)
    assert(Datetimes.parse("2020-01-01T00:00:30.500Z") == 1577836830.5)
  }

  test("non-finite doubles raise ParseError instead of becoming a " +
    "silently-empty interval") {
    for (bad <- Seq("NaN", "Infinity", "-Infinity", "nan", "inf")) {
      intercept[Datetimes.ParseError] { Datetimes.parse(bad) }
    }
  }

  test("garbage raises ParseError") {
    intercept[Datetimes.ParseError](Datetimes.parse("not a date"))
    intercept[Datetimes.ParseError](Datetimes.parse("2020-13-45"))
  }

  test("default window: last hour ending at now truncated to the minute") {
    // app/__init__.py:177-183
    assert(Datetimes.defaultInterval(3725.9) == (120.0, 3720.0))
    assert(Datetimes.defaultInterval(3600.0) == (0.0, 3600.0))
  }
}
