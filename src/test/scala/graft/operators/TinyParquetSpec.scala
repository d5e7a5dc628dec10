package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The driver-side sidecar writer must round-trip through BOTH readers
  * the layouts use: [[TinyParquet.rows]] (every `_meta`/`_centroids`
  * open on a probe path) and a plain Spark scan (specs, fsck, the
  * mergeSchema compaction read) — same names, same types, same values
  * as the Spark `toDF.write.parquet` writes it replaces.
  */
class TinyParquetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("write round-trips through TinyParquet.rows and a Spark scan; " +
    "overwrite replaces; schema matches the Spark-written shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tpw").toString +
      "/_meta"
    val fields = Seq("m" -> "int", "big" -> "long", "x" -> "double",
      "flag" -> "boolean", "name" -> "string",
      "codebook" -> "list<double>", "ids" -> "list<long>")
    TinyParquet.write(spark, dir, fields, Seq(Map(
      "m" -> 8, "big" -> 123456789012L, "x" -> 2.5, "flag" -> true,
      "name" -> "c42", "codebook" -> Seq(1.0, -2.25, 3.5),
      "ids" -> Seq(7L, 9L))))
    // driver-side reader
    val r = TinyParquet.row(spark, dir)
    assert(r("m") == 8 && r("big") == 123456789012L && r("x") == 2.5)
    assert(r("flag") == true && r("name") == "c42")
    assert(r("codebook") == Seq(1.0, -2.25, 3.5) && r("ids") == Seq(7L, 9L))
    assert(TinyParquet.fieldNames(spark, dir) == fields.map(_._1))
    // Spark scan: identical READ-BACK schema and rows to the
    // toDF.write.parquet this replaces (footers byte-equivalent:
    // 3-level list/element, required elements, UTF8 strings)
    val df = spark.read.parquet(dir)
    val sparkDir = java.nio.file.Files.createTempDirectory("graft-tpw2")
      .toString + "/_meta"
    locally {
      import spark.implicits._
      Seq((8, 123456789012L, 2.5, true, "c42", Seq(1.0, -2.25, 3.5),
        Seq(7L, 9L)))
        .toDF("m", "big", "x", "flag", "name", "codebook", "ids")
        .write.parquet(sparkDir)
    }
    val want = spark.read.parquet(sparkDir)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      want.schema.map(f => (f.name, f.dataType)))
    assert(df.collect().toSeq == want.collect().toSeq)
    // a field absent from a row's map writes as null (the schema-
    // evolution shape rows() reports as an absent key)
    TinyParquet.write(spark, dir, fields, Seq(
      Map("m" -> 1, "name" -> "a"), Map("m" -> 2)))
    val rs = TinyParquet.rows(spark, dir)
    assert(rs.map(_("m")) == Seq(1, 2))
    assert(rs(0)("name") == "a" && !rs(1).contains("name"))
    assert(spark.read.parquet(dir).where("name is null")
      .count() == 1)
  }
}
