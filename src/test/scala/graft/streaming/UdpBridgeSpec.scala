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
}
