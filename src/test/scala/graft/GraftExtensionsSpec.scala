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
}
