package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. One warm-up PASS runs every query once (codegen
  * compile + file listing + page cache), then `SPARK_GRAFT_BENCH_N`
  * (default 3) timed passes round-robin the FULL query list — a query's
  * N timed runs are separated by a whole pass, NOT back-to-back. The
  * reported number is the MIN of the timed runs — every run recomputes
  * from scratch (operator caches are scoped to the call and the cache
  * manager is cleared between queries), so the workload is deterministic
  * and run-to-run spread is environmental: this sandbox exhibits
  * intermittent multi-second stalls that used to poison ALL runs of
  * whichever query they landed on when runs were consecutive (observed:
  * the same query at 1.25 s isolated and 6.19 s min-of-3 in-suite with
  * identical code). Interleaved, a stall shorter than a full pass can
  * poison at most one run per query, so min-of-N survives it. The
  * per-query MEDIANs are also emitted (`medians`, `total_median`) so the
  * spread stays visible. A query that throws is reported in an `errors`
  * map (and as value -1), never as a near-zero "success".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 64m default pages stall on fresh-page faults in this sandbox;
      // small partitions never need them anyway.
      .config("spark.buffer.pageSize", "4m")
      // sandbox FS shuffle I/O is slow and erratic; tmpfs is stable
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // optional comma-separated subset, for isolated timing while iterating
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    /** Warm-up pass + n INTERLEAVED timed passes over `items` (the full
      * list per pass, round-robin); a query that throws is recorded in
      * `errors`, dropped from later passes, and reported as (-1, -1).
      */
    def runInterleaved(
        items: Seq[(String, (SparkSession, String) =>
          org.apache.spark.sql.DataFrame)],
        label: String): Seq[(String, (Double, Double))] = {
      val times = scala.collection.mutable.LinkedHashMap(
        items.map(i => i._1 -> Vector.empty[Double]): _*)
      val dead = scala.collection.mutable.Set.empty[String]
      def once(name: String, fn: (SparkSession, String) =>
          org.apache.spark.sql.DataFrame): Option[Double] =
        try {
          // operators scope their own caches (Caching.withCached), but
          // clear the cache manager between queries anyway so one
          // query's leftover storage can never color the next query's
          // number; the GC nudge lets the ContextCleaner release
          // checkpointed result blocks (which live until their RDD is
          // collected, not in the cache manager)
          spark.catalog.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(200)
            dead += name
            None
        }
      items.foreach { case (name, fn) => once(name, fn); () } // warm-up pass
      (1 to n).foreach { pass =>
        items.foreach { case (name, fn) =>
          if (!dead(name)) once(name, fn).foreach { t =>
            System.err.println(f"[bench] $label pass $pass/$n $name $t%.2f")
            times(name) :+= t
          }
        }
      }
      items.map { case (name, _) =>
        val ts = times(name)
        if (dead(name) || ts.isEmpty) name -> (-1.0, -1.0)
        else name -> (ts.min, median(ts))
      }
    }

    val results = runInterleaved(
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) },
      "suite")
    // probe-only variants of the layout-building queries (q59/q60):
    // the layout is built once (inside the warm-up pass, memoized by
    // PipelineQueries) and the timed passes measure ONLY the probe —
    // the per-query number a deployment actually pays, next to the
    // suite's build-inclusive q59/q60 rehearsal numbers. Reported
    // separately; never part of `total`.
    val probeResults = runInterleaved(
      graft.queries.PipelineQueries.benchProbes.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) },
      "probe").filter(_._2._1 >= 0)
    val qs = results.map { case (k, (mn, _)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val probeQs = probeResults.map { case (k, (mn, _)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val probeMeds = probeResults.map { case (k, (_, md)) => s"\"" + k + "\":" + md }
      .mkString("{", ",", "}")
    val meds = results.map { case (k, (_, md)) => s"\"" + k + "\":" + md }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, (mn, _)) if mn >= 0 => mn }.sum
    val totalMedian = results.collect { case (_, (_, md)) if md >= 0 => md }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_of_n","n":$n,"queries":$qs,"total_median":$totalMedian,"medians":$meds,"probe_queries":$probeQs,"probe_medians":$probeMeds,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // marker-prefixed copy: a harness can grep the one line starting with
    // BENCH_JSON: instead of pattern-matching bare JSON out of sbt noise
    println("BENCH_JSON: " + json)
    // structured artifact: the same JSON as its own file, so harnesses can
    // read the result directly instead of regex-scraping sbt stdout (where
    // log interleaving can corrupt the line)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
