package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LineParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wire order (path, value, timestamp) reorders to (path, timestamp, value)") {
    val got = LineParser.parse(Seq("one 1 1", "two 2.5 99.5").toDF("line"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got == Seq(("one", 1.0, 1.0), ("two", 99.5, 2.5)))
  }

  test("whitespace runs and surrounding blanks are tolerated (str.split parity)") {
    val got = LineParser.parse(Seq("  one   1\t12  ").toDF("line"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got == Seq(("one", 12.0, 1.0)))
  }

  test("lenient parse nulls malformed lines") {
    val got = LineParser.parse(Seq("one 1", "one x 2", "ok 3 4").toDF("line"))
      .collect()
    assert(got.count(_.isNullAt(0)) == 1)     // "one 1": wrong arity
    assert(got.count(r => !r.isNullAt(0) && r.isNullAt(2)) == 1) // bad float
  }

  test("strict parse is batch-atomic: one bad line rejects the whole batch (Q3)") {
    val bad = Seq("one 1 1\ntwo x 5").toDF("line")
    intercept[LineParser.ParseException] {
      LineParser.parseStrict(bad).collect()
    }
    val good = Seq("one 1 1\ntwo 2 5", "three 3 6\n").toDF("line")
    assert(LineParser.parseStrict(good).count() == 3)
  }
}
