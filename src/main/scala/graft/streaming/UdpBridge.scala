package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** UDP line-protocol source — the reference daemon's datagram listener
  * (daemon.py:50-56; rundev.py sends UDP by default), bridged into
  * Structured Streaming.
  *
  * Spark has no UDP source, and can't meaningfully have one: a UDP
  * listener is a single bound socket on a single host — exactly like the
  * reference's single-threaded socketserver — while a streaming source's
  * offsets must be replayable across executors and restarts. So the
  * bridge does the one host-bound thing (receive datagrams) and hands
  * durability to the file system: each datagram's payload is written
  * atomically (temp file + rename; the dot-prefixed temp is invisible to
  * Spark's file source) into a spool directory that `readStream.text`
  * tails with ordinary file-source offset tracking. On a cluster the
  * spool directory lives on the shared file system and the bridge runs
  * wherever the ingest VIP points; everything downstream is already
  * distributed and replayable.
  *
  * One datagram = one file = one parse unit, preserving the reference's
  * per-datagram atomicity (daemon.py:39-47) at the granularity the
  * micro-batch engine sees.
  */
final class UdpBridge(
    host: String,
    port: Int,
    spoolDir: String,
    bufBytes: Int = 65536) extends AutoCloseable {

  private val socket = new DatagramSocket(new InetSocketAddress(host, port))
  private val seq = new AtomicLong(0L)
  // per-instance prefix: a restarted bridge must never reuse a previous
  // instance's filenames (the rename would silently replace a spooled,
  // possibly not-yet-ingested datagram)
  private val instanceId = java.lang.Long.toHexString(System.nanoTime())
  @volatile private var running = true

  Files.createDirectories(Paths.get(spoolDir))
  // sweep stale in-flight temps from crashed prior instances: a kill -9
  // strands a `.tmp-*` file no restart ever matches (fresh instanceId)
  // and nothing else deletes (dot-hidden, invisible to Spark's file
  // source and its cleanSource) — under an always-on daemon they would
  // accumulate without bound, inflating every directory listing. One
  // live bridge per spool dir (the reference's single daemon socket),
  // so any `.tmp-*` present at construction belongs to a dead instance.
  locally {
    val it = Files.list(Paths.get(spoolDir))
    try it
      .filter(p => p.getFileName.toString.startsWith(".tmp-"))
      .forEach { p =>
        try { Files.deleteIfExists(p); () }
        catch { case _: java.io.IOException => () }
      }
    finally it.close()
  }

  /** The bound port (useful when constructed with port 0). */
  def localPort: Int = socket.getLocalPort

  private val thread = new Thread(
    () => receiveLoop(), s"graft-udp-bridge-$host:$localPort")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }

  private def receiveLoop(): Unit = {
    val buf = new Array[Byte](bufBytes)
    while (running) {
      val pkt = new DatagramPacket(buf, buf.length)
      try {
        socket.receive(pkt)
        // a datagram that FILLS the buffer was silently truncated by
        // the kernel (or is unverifiable): a cut trailing line would
        // fail the batch-atomic parse downstream and drop the entire
        // micro-batch, not just this datagram. Drop IT loudly instead.
        // At the 64 KiB default this is unreachable for real traffic
        // (IPv4 UDP payloads cap at 65507 bytes < 65536) — it only
        // fires when a caller shrinks bufBytes below the senders' MTU.
        if (pkt.getLength >= bufBytes)
          System.err.println(s"[udp-bridge] dropping datagram: " +
            s"${pkt.getLength} bytes fills the $bufBytes-byte buffer " +
            "— payload was (or may be) kernel-truncated mid-line; " +
            "raise bufBytes")
        else
          spool(new String(pkt.getData, pkt.getOffset, pkt.getLength,
            UTF_8))
      } catch {
        case _: SocketException if !running => () // closed during shutdown
        case scala.util.control.NonFatal(e) =>
          // a transient failure (disk full, fs hiccup) must not kill the
          // receiver thread — the socket would stay bound and every
          // subsequent datagram would vanish silently. Log, back off,
          // keep receiving; the datagram that hit the failure is lost
          // (UDP semantics the sender already accepts). Fatal VM errors
          // still propagate, and an interrupt during the backoff is
          // swallowed here and honored by the loop condition.
          System.err.println(s"[udp-bridge] dropping datagram: $e")
          try Thread.sleep(100)
          catch { case _: InterruptedException => () }
      }
    }
  }

  private def spool(payload: String): Unit = {
    val n = seq.getAndIncrement()
    val tmp = Paths.get(spoolDir, s".tmp-$instanceId-$n")
    Files.writeString(tmp, payload)
    Files.move(tmp,
      Paths.get(spoolDir, f"datagram-$instanceId%s-$n%012d.txt"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def close(): Unit = {
    running = false
    socket.close()
    thread.join(2000)
  }
}

object UdpBridge {

  /** The spool directory as a streaming line DataFrame (column `value`),
    * ready for [[Ingest.start]]. Processed spool files are deleted by
    * the file source (`cleanSource`), bounding both the directory and
    * the source's seen-file log under an always-on daemon.
    */
  def lines(spark: SparkSession, spoolDir: String): DataFrame =
    spark.readStream
      .option("cleanSource", "delete")
      .text(spoolDir)
}
