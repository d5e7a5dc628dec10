package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{TestSpark, Tsdb}

/** The reference's end-to-end daemon test (tests/test_smalltsdb.py:36-82)
  * with MemoryStream standing in for the UDP/TCP sockets — same messages,
  * same golden output.
  */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("golden integration: wire messages -> stream -> sync -> golden rows") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)

    val stream = MemoryStream[String]
    val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0)
    // the reference's three messages (tests/test_smalltsdb.py:57)
    stream.addData("one 1 1")
    stream.addData("one 5 2\ntwo 2 5")
    stream.addData("one 1 12\n")
    query.processAllAvailable()
    query.stop()

    tsdb.sync()
    val got = tsdb.table("tensecond").orderBy("path", "timestamp")
      .collect().toSeq.map(r =>
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8), r.getDouble(9)))
    assert(got == Seq(
      ("one", 0.0, 2.0, 1.0, 5.0, 3.0, 6.0, 3.0, 4.6, 4.96),
      ("one", 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      ("two", 0.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0)))
  }

  // the reference's full integration matrix (tests/test_smalltsdb.py:36-82):
  // 3 backends (view / tables / two-databases) x 2 transports, each
  // ending in the same golden tensecond rows incl. exact percentiles
  for (backend <- Seq("view", "tables", "twodb"); transport <- Seq("memory", "udp"))
    test(s"integration matrix: $backend backend over $transport transport") {
      implicit val sqlCtx = spark.sqlContext
      val root = Files.createTempDirectory(s"graft-m-$backend-$transport").toString
      val tsdb = backend match {
        case "view" => new Tsdb(spark, root, materialized = false, tail = 60,
          now = () => 1000.0)
        case "tables" => new Tsdb(spark, root, materialized = true, tail = 60,
          now = () => 1000.0)
        case "twodb" => new Tsdb(spark, root, materialized = true, tail = 60,
          now = () => 1000.0, incomingRoot = Some(
            Files.createTempDirectory(s"graft-m-$backend-inc").toString))
      }
      val messages = Seq("one 1 1", "one 5 2\ntwo 2 5", "one 1 12\n")
      transport match {
        case "memory" =>
          val stream = MemoryStream[String]
          val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0)
          messages.foreach(stream.addData(_))
          query.processAllAvailable()
          query.stop()
        case "udp" =>
          val spool = s"$root/udp-spool"
          val bridge = new UdpBridge("127.0.0.1", 0, spool).start()
          try {
            val sender = new java.net.DatagramSocket()
            val addr = java.net.InetAddress.getByName("127.0.0.1")
            messages.foreach { m =>
              val b = m.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              sender.send(new java.net.DatagramPacket(b, b.length, addr, bridge.localPort))
            }
            sender.close()
            org.scalatest.concurrent.Eventually.eventually(
              org.scalatest.concurrent.Eventually.timeout(
                org.scalatest.time.Span(10, org.scalatest.time.Seconds))) {
              val n = Option(new java.io.File(spool)
                .listFiles((_, f) => f.startsWith("datagram-"))).map(_.length)
              assert(n.contains(3))
            }
            val query = Ingest.start(tsdb, UdpBridge.lines(spark, spool),
              intervalSeconds = 0)
            query.processAllAvailable()
            query.stop()
          } finally bridge.close()
      }
      tsdb.sync() // no-op in view mode, finalization in tables/twodb mode
      val got = tsdb.table("tensecond").orderBy("path", "timestamp")
        .collect().toSeq.map(r =>
          (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
            r.getDouble(8), r.getDouble(9)))
      assert(got == Seq(
        ("one", 0.0, 2.0, 1.0, 5.0, 3.0, 6.0, 3.0, 4.6, 4.96),
        ("one", 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
        ("two", 0.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0)))
    }

  test("malformed batch is dropped whole; stream keeps running (Q3)") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-bad").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)
    var errors = 0

    val stream = MemoryStream[String]
    val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0,
      onBatchError = _ => errors += 1)
    stream.addData("ok 1 1\nbroken x y")   // one bad line -> batch dropped
    query.processAllAvailable()
    stream.addData("ok 2 5")               // next batch unaffected
    query.processAllAvailable()
    query.stop()

    assert(errors == 1)
    val got = tsdb.incoming.select("path", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("ok", 2.0)))
  }

  test("self-metrics: each flush inserts {prefix}.insert with the non-self count") {
    // daemon.py:176-193 — count excludes self rows; inserted with the batch
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-self").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 500.0)

    val stream = MemoryStream[String]
    val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0,
      selfMetricPrefix = Some("graft.daemon"))
    stream.addData("one 1 1\ntwo 2 5")
    query.processAllAvailable()
    // a batch that already contains a self row: not counted again
    stream.addData("three 3 7\ngraft.daemon.insert 9 400")
    query.processAllAvailable()
    query.stop()

    val inserts = tsdb.incoming
      .filter("path = 'graft.daemon.insert'")
      .select("timestamp", "value").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq.sorted
    // flush 1: 2 non-self rows; flush 2: 1 non-self row (the replayed
    // self row at ts=400 is inserted as data but not counted)
    assert(inserts == Seq((400.0, 9.0), (500.0, 1.0), (500.0, 2.0)))
    assert(tsdb.incoming.count() == 6) // 4 parsed rows (incl. replayed self) + 2 insert metrics
  }

  test("dedupe: repeated wire lines within the watermark produce one row") {
    // the StreamingDedup first-seen pattern composed into the ingest
    // path: a retried datagram (same bytes) collapses to one stored row
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-dedup").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)

    val stream = MemoryStream[String]
    val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0,
      dedupe = true)
    stream.addData("one 1 1")
    stream.addData("one 1 1")            // exact retry, later batch
    stream.addData("two 2 5", "two 2 5") // same-batch duplicate datagrams
    stream.addData("one 1 1")            // retried once more
    query.processAllAvailable()
    query.stop()

    val got = tsdb.incoming.orderBy("path").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq(("one", 1.0, 1.0), ("two", 5.0, 2.0)))
  }

  test("dedupe: a rejected batch leaves no dedup residue — the retry lands") {
    // the store-is-the-state property: lines of a poisoned (Q3-rejected)
    // batch were never stored, so their retry must NOT be treated as a
    // duplicate (streaming-state dedup would remember digests of rows
    // that never landed, turning transient rejection into permanent loss)
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-dedup-rej").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)
    var errors = 0
    val stream = MemoryStream[String]
    val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0,
      onBatchError = _ => errors += 1, dedupe = true)
    stream.addData("one 1 1\nbroken x y") // poisoned: whole batch rejected
    query.processAllAvailable()
    stream.addData("one 1 1")             // retry of the good line
    query.processAllAvailable()
    query.stop()
    assert(errors == 1)
    val got = tsdb.incoming.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq(("one", 1.0, 1.0)))
  }

  test("self-metrics: a poisoned batch inserts {prefix}.error instead") {
    // daemon.py:194-198 — failed flush records an error datapoint
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-selferr").toString
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 500.0)
    var errors = 0

    val stream = MemoryStream[String]
    val query = Ingest.start(tsdb, stream.toDF(), intervalSeconds = 0,
      onBatchError = _ => errors += 1,
      selfMetricPrefix = Some("graft.daemon"))
    stream.addData("ok 1 1\nbroken x y")
    query.processAllAvailable()
    query.stop()

    assert(errors == 1)
    val got = tsdb.incoming.select("path", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("graft.daemon.error", 1.0)))
  }
}
