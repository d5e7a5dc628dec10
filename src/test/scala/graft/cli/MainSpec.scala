package graft.cli

import java.io.RandomAccessFile
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The sync CLI's process-mutex (W8, reference cli.py:50-55): while the
  * body runs the lock file is exclusively held; afterwards it is free.
  */
class MainSpec extends AnyFunSuite {

  test("--lock-file takes an exclusive lock for the duration of the body") {
    val f = Files.createTempFile("graft-lock", ".lck").toString

    def tryConcurrent(): Boolean = {
      val raf = new RandomAccessFile(f, "rw")
      try {
        val l = raf.getChannel.tryLock()
        if (l != null) { l.release(); true } else false
      } catch {
        // same-JVM overlap surfaces as OverlappingFileLockException
        case _: java.nio.channels.OverlappingFileLockException => false
      } finally raf.close()
    }

    var heldInside = false
    Main.withLock(Some(f)) {
      heldInside = !tryConcurrent()
    }
    assert(heldInside, "lock was not held while the body ran")
    assert(tryConcurrent(), "lock was not released after the body")
  }

  test("no lock file means no locking, body still runs") {
    var ran = false
    Main.withLock(None) { ran = true }
    assert(ran)
  }
}
