package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch same-JVM interleaved A/B of the q21 candidate join with and
  * without pinned pre-join partitioning — run with
  * `sbt "Test/runMain graft.tools.ScratchTiming <dir>"`. Not a test; a
  * diagnosis harness for the scale rehearsal.
  */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/dev/shm/sf0.8x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = graft.operators.Dedup.shingled(docs, "text", 3)
    sh.cache()
    time("materialize sh")(sh.count())

    val cores = spark.sparkContext.defaultParallelism
    val sizes = sh.select(col("doc_id"), size(col("shh")).as("n_sh"))

    def pipeline(pin: Boolean): DataFrame = {
      val ex0 = sh.select(col("doc_id"), explode(col("shh")).as("h"))
      val ex = if (pin) ex0.repartition(cores, col("h")) else ex0
      ex.as("a").join(ex.as("b"), Seq("h"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared_light"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
        .withColumn("jaccard", round(col("shared_light").cast("double")
          / (col("n_a") + col("n_b") - col("shared_light")), 6))
        .filter(col("jaccard") >= 0.5)
    }

    for (round <- 1 to 2; pin <- Seq(true, false))
      time(s"round $round pin=$pin")(pipeline(pin).count())

    sh.unpersist()
    spark.stop()
  }
}
