package graft

import org.apache.spark.sql.SparkSession
import graft.core.Periods
import graft.operators.Agg
import graft.queries.CoreQueries

/** Ad-hoc plan inspection main (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val localDir = args.headOption.getOrElse("/tmp")
    val parts = args.lift(1).getOrElse("4")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.local.dir", localDir).config("spark.buffer.pageSize", sys.env.getOrElse("PAGE_SIZE", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val inc = CoreQueries.incomingFromEvents(spark, dir)
    inc.count() // warmup

    for (i <- 1 to 3) {
      val t = System.nanoTime()
      val union = Periods.all.map(p => Agg.aggregate(inc, p).select("path"))
        .reduce(_ union _).distinct()
      println(s"run$i localDir=$localDir parts=$parts count=${union.count()} in ${(System.nanoTime()-t)/1e9}s")
    }
    spark.stop()
  }
}
