package graft

import org.apache.spark.sql.SparkSession
import graft.core.Periods
import graft.operators.Agg
import graft.queries.CoreQueries

/** Ad-hoc plan inspection main (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val inc = CoreQueries.incomingFromEvents(spark, dir)
    inc.count() // warmup

    for (n <- Seq(1, 2, 3, 6)) {
      val t = System.nanoTime()
      val union = Periods.all.take(n).map(p => Agg.aggregate(inc, p).select("path"))
        .reduce(_ union _).distinct()
      println(s"legs=$n count=${union.count()} in ${(System.nanoTime()-t)/1e9}s (aqe=$aqe)")
    }
    spark.stop()
  }
}
