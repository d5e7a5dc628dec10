package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Millis, Seconds, Span}

import graft.{TestSpark, Tsdb}

/** End-to-end UDP ingest: real datagrams → bridge spool → file source →
  * foreachBatch insert → sync → the reference's golden tensecond rows
  * (the test_smalltsdb.py:36-82 scenario over the wire protocol's
  * default transport, rundev.py:44-47).
  */
class UdpBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("datagrams -> spool -> stream -> sync -> golden rows") {
    val root = Files.createTempDirectory("graft-udp").toString
    val spool = s"$root/udp-spool"
    val tsdb = new Tsdb(spark, root, materialized = true, tail = 60,
      now = () => 1000.0)

    val bridge = new UdpBridge("127.0.0.1", 0, spool).start()
    try {
      val sender = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      // the reference's three messages (tests/test_smalltsdb.py:57)
      Seq("one 1 1", "one 5 2\ntwo 2 5", "one 1 12\n").foreach { msg =>
        val bytes = msg.getBytes(UTF_8)
        sender.send(new DatagramPacket(bytes, bytes.length, addr, bridge.localPort))
      }
      sender.close()

      // the receive loop is async: wait until all three datagrams landed
      eventually(timeout(Span(10, Seconds)), interval(Span(50, Millis))) {
        val spooled = new java.io.File(spool)
          .listFiles((_, n) => n.startsWith("datagram-"))
        assert(spooled != null && spooled.length == 3)
      }

      val query = Ingest.start(tsdb, UdpBridge.lines(spark, spool),
        intervalSeconds = 0)
      query.processAllAvailable()
      query.stop()
    } finally bridge.close()

    tsdb.sync()
    val got = tsdb.table("tensecond").orderBy("path", "timestamp")
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got == Seq(("one", 0.0, 2.0), ("one", 10.0, 1.0), ("two", 0.0, 1.0)))
  }

  test("construction sweeps a dead instance's stranded .tmp files; a " +
    "buffer-filling datagram is dropped loudly instead of spooling a " +
    "kernel-truncated line that would poison its whole micro-batch") {
    val root = Files.createTempDirectory("graft-udp2").toString
    val spool = s"$root/spool"
    Files.createDirectories(java.nio.file.Paths.get(spool))
    // a kill -9'd prior bridge's in-flight temp: dot-hidden, invisible
    // to Spark and cleanSource, never matched by a fresh instanceId
    val stale = java.nio.file.Paths.get(spool, ".tmp-deadbeef-0")
    Files.writeString(stale, "one 1 1")
    // tiny buffer so a multi-line datagram fills it (the 64 KiB
    // default makes the condition unreachable for real IPv4 UDP)
    val bridge = new UdpBridge("127.0.0.1", 0, spool, bufBytes = 16)
      .start()
    try {
      assert(!Files.exists(stale), "stale tmp must be swept at start")
      val sender = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      for (msg <- Seq("one 1 1\ntwo 2 2\nthree 3 3", "ok 1 2")) {
        val bytes = msg.getBytes(UTF_8)
        sender.send(new DatagramPacket(bytes, bytes.length, addr,
          bridge.localPort))
      }
      sender.close()
      // only the in-budget datagram spools; the oversized one is
      // dropped whole (never a truncated trailing line)
      eventually(timeout(Span(10, Seconds)), interval(Span(50, Millis))) {
        val spooled = new java.io.File(spool)
          .listFiles((_, n) => n.startsWith("datagram-"))
        assert(spooled != null && spooled.length == 1)
        assert(Files.readString(spooled.head.toPath) == "ok 1 2")
      }
    } finally bridge.close()
  }
}
