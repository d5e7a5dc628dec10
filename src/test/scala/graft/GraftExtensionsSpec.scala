package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("poly_hash and dot_product are callable from spark.sql") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT poly_hash('abc') AS h,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.functions.PolyHash.hash("abc"))
    assert(r.getDouble(1) == 11.0)
  }

  test("simhash expression is bit-identical to the interpreted lambda fold") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    import graft.functions.TextHash
    val bits = 32
    // the portable interpreted form the oracle mirrors
    val folds = (0 until bits).map { j =>
      val bitOf = s"((${TextHash.universalHashSql("x", j)}) % 2)"
      s"(CASE WHEN aggregate(arr, 0L, (s, x) -> s + (2 * $bitOf - 1)) > 0 " +
        s"THEN ${1L << j}L ELSE 0L END)"
    }.mkString("(", " + ", ")")
    val rows = spark.sql(
      s"""SELECT simhash(arr, $bits) AS fast, $folds AS slow FROM (
         |  SELECT array(1L, 99999L, 123456789L, 1000000006L) AS arr
         |  UNION ALL SELECT array(42L)
         |  UNION ALL SELECT CAST(array() AS array<bigint>)
         |)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("shingle_hashes and min_hashes are callable from spark.sql") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT shingle_hashes('a b c d', 3) AS sh,
        |       min_hashes(array(5L, 17L, 99L), 4) AS mh
        |""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0) ==
      Seq(graft.functions.PolyHash.hash("a b c"),
        graft.functions.PolyHash.hash("b c d")))
    assert(r.getSeq[Long](1).length == 4)
  }

  test("window_poly_hashes is callable from spark.sql and matches the " +
    "kernel's per-token-hash fold") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT window_poly_hashes(array('a', 'b', 'c', 'd'), 3) AS wh")
      .collect()(0)
    val P = graft.functions.TextHash.P
    val B = graft.functions.TextHash.WB
    def th(s: String) = graft.functions.PolyHash.hash(s)
    def fold(ts: Seq[String]) =
      ts.foldLeft(0L)((acc, t) => (acc * B + th(t)) % P)
    assert(r.getSeq[Long](0) ==
      Seq(fold(Seq("a", "b", "c")), fold(Seq("b", "c", "d"))))
    // short input: empty array, not an error
    assert(spark.sql("SELECT window_poly_hashes(array('a'), 3)")
      .collect()(0).getSeq[Long](0).isEmpty)
  }

  test("token_stats and marker_count are callable from spark.sql") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT token_stats('the cat the') AS ts,
        |       marker_count('the cat the', array('the', 'and')) AS mc
        |""".stripMargin).collect()(0)
    val ts = r.getStruct(0)
    assert(ts.getLong(0) == 3L && ts.getLong(1) == 9L && ts.getLong(2) == 2L)
    assert(r.getLong(1) == 2L)
    // the lexicon must be a constant array of strings
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT marker_count('x', array(1, 2))").collect()
    }
    assert(e.getMessage.contains("marker_count words"))
  }

  test("constant int args accept foldable expressions, reject non-constants") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    // bigint literal, cast, and arithmetic all fold to Int
    val r = spark.sql(
      "SELECT simhash(array(42L), CAST(32 AS BIGINT)) AS a, " +
        "simhash(array(42L), 8 * 4) AS b, simhash(array(42L), 32) AS c")
      .collect()(0)
    assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(2))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash(array(x), CAST(x AS INT)) FROM (SELECT 1L AS x)")
        .collect()
    }
    assert(e.getMessage.contains("integer constant"))
  }

  test("srp_key expression is bit-identical to the interpreted lambda fold") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val (startBit, nRows) = (24, 8)
    val folds = (0 until nRows).map { j =>
      val bit = startBit + j
      val signed =
        s"aggregate(zip_with(vec, sequence(0, size(vec) - 1), " +
          s"(x, i) -> x * (CASE WHEN ((i * 2654435761L + $bit * 40503) % 97) % 2 = 0 " +
          s"THEN 1.0D ELSE -1.0D END)), 0D, (s, v) -> s + v)"
      s"(CASE WHEN $signed > 0 THEN ${1L << j}L ELSE 0L END)"
    }.mkString("(", " + ", ")")
    val rows = spark.sql(
      s"""SELECT srp_key(vec, $startBit, $nRows) AS fast, $folds AS slow FROM (
         |  SELECT array(0.5D, -1.5D, 2.25D, 0.125D, -3.0D) AS vec
         |  UNION ALL SELECT array(1e-9D, -1e9D, 3.14D)
         |  UNION ALL SELECT array(0.0D)
         |)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("pack_int8 and int8_dot are callable from spark.sql and agree " +
    "with the interpreted integer fold") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT int8_dot(pack_int8(a), pack_int8(b)) AS fast,
        |       aggregate(zip_with(a, b,
        |         (x, y) -> CAST(x AS BIGINT) * y), 0L, (s, v) -> s + v)
        |         AS slow
        |FROM (SELECT array(127, -128, 3, 0) AS a,
        |             array(-1, 2, 100, 127) AS b)""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    // overflow refuses instead of wrapping
    val e = intercept[Exception] {
      spark.sql("SELECT pack_int8(array(128))").collect()
    }
    assert(e.getMessage.contains("int8") ||
      (e.getCause != null && e.getCause.getMessage.contains("int8")))
  }
}
