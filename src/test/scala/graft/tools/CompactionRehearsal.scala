package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measured rehearsal (NOT a spec — run by hand with
  * `sbt "Test/runMain graft.tools.CompactionRehearsal"`): the cost of
  * partition-SCOPED compaction vs the whole-layout rewrite on the
  * sf0.1 embeddings corpus, under the realistic shape that motivates
  * the selective variant — a layout whose append cadence fragmented a
  * FEW hot partitions while the rest stayed compact. Numbers land in
  * SCALING.md; the ratio (selective ≈ the fragmented slice's share of
  * the corpus) is what scales to 100 TB, where "slice" is TBs and
  * "whole" is the full corpus.
  */
object CompactionRehearsal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[rehearse] $what: ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }

    val emb = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
    println(s"[rehearse] corpus rows=${emb.count()}")
    val root =
      java.nio.file.Files.createTempDirectory("graft-rehearse").toString
    val path = s"$root/ivf"
    t("initial writeIvfPartitioned (k=64)") {
      Similarity.writeIvfPartitioned(emb, path, centroidK = 64)
    }
    // settle the base to one file per dir first (the steady state a
    // weekly compaction cadence maintains), THEN fragment a few hot
    // partitions with epochs of near-copies of stored vectors — the
    // realistic shape: append cadence fragments the hot slice only
    Similarity.compactIvf(spark, path, "base")
    val hotRows = spark.read
      .parquet(Similarity.ivfDataRoot(spark, path))
      .select("vec_id", "vec", "centroid_id")
      .dropDuplicates("centroid_id")
      .orderBy("vec_id").limit(3).collect()
    (1 to 6).foreach { e =>
      val dup = hotRows.zipWithIndex.flatMap { case (r, j) =>
        val v = r.getSeq[Double](1).map(_.toFloat).toArray
        (1 to 500).map(i => (1000000L * e + 10000L * j + i, v))
      }.toSeq.toDF("vec_id", "embedding")
      Similarity.appendIvfEpoch(dup, path, s"re$e")
    }
    val stats = Similarity.ivfPartitionStats(spark, path)
    val frag = stats.filter(_._2 > 3)
    val fragBytes = frag.map(_._3).sum
    val allBytes = stats.map(_._3).sum
    println(s"[rehearse] partitions=${stats.size} " +
      s"maxFiles=${stats.map(_._2).max} fragmented(>3 files)=${frag.size} " +
      f"fragmentedBytesShare=${fragBytes.toDouble / allBytes}%.3f")
    val n = t("compactIvfPartitions (threshold 3)") {
      Similarity.compactIvfPartitions(spark, path, "pc1",
        maxFilesPerPartition = 3)
    }
    println(s"[rehearse] selective compacted dirs=$n " +
      s"(rewrote $fragBytes of $allBytes bytes)")
    t("compactIvf (whole-layout generation rewrite)") {
      Similarity.compactIvf(spark, path, "wc1")
    }
    println("[rehearse] DONE")
    spark.stop()
  }
}
