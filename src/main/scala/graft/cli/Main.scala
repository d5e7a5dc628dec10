package graft.cli

import java.io.RandomAccessFile
import java.nio.channels.FileLock

import org.apache.spark.sql.SparkSession

import graft.{Timer, Tsdb}
import graft.streaming.Ingest

/** CLI mirroring the reference's entry points (cli.py:12-68):
  *
  * {{{
  * graft.cli.Main sync   <root> [--lock-file F] [--emit-metrics]
  * graft.cli.Main daemon <root> <host:port> [--interval S]
  * graft.cli.Main show   <root> <period>          # daemon.py:219-229
  * graft.cli.Main metric <root> <path> <period> <stat> <start> <end>
  * }}}
  *
  * `--lock-file` takes an exclusive OS file lock for process-level mutual
  * exclusion of concurrent syncs, like the reference's InterProcessLock
  * (cli.py:50-55).
  */
object Main {

  private def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.buffer.pageSize", "4m")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withLock[T](path: Option[String])(f: => T): T = path match {
    case None => f
    case Some(p) =>
      val raf = new RandomAccessFile(p, "rw")
      val lock: FileLock = raf.getChannel.lock()
      try f finally { lock.release(); raf.close() }
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "sync" :: root :: rest =>
      val lockFile = rest.sliding(2).collectFirst {
        case List("--lock-file", f) => f
      }
      val emit = rest.contains("--emit-metrics")
      val spark = session()
      val tsdb = new Tsdb(spark, root)
      withLock(lockFile) {
        if (emit) Timer.instrumentedSync(tsdb) else tsdb.sync()
      }
      spark.stop()

    case "daemon" :: root :: hostPort :: rest =>
      val Array(host, port) = hostPort.split(":")
      val interval = rest.sliding(2).collectFirst {
        case List("--interval", s) => s.toLong
      }.getOrElse(10L)
      val spark = session()
      val tsdb = new Tsdb(spark, root)
      // dev-parity line-protocol listener (reference daemon.py; Spark's
      // socket source carries the same "dev only" caveat as the
      // reference's single-threaded socketserver)
      val lines = spark.readStream.format("socket")
        .option("host", host).option("port", port.toInt).load()
      val q = Ingest.start(tsdb, lines, interval)
      q.awaitTermination()

    case "show" :: root :: period :: Nil =>
      val spark = session()
      new Tsdb(spark, root).table(period)
        .orderBy("path", "timestamp")
        .show(1000, truncate = false)
      spark.stop()

    case "metric" :: root :: path :: period :: stat :: start :: end :: Nil =>
      val spark = session()
      new Tsdb(spark, root)
        .getMetric(path, period, stat, (start.toDouble, end.toDouble))
        .show(1000, truncate = false)
      spark.stop()

    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      System.err.println("usage: sync|daemon|show|metric ...")
      sys.exit(2)
  }
}
