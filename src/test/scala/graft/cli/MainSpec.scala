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

  test("ivf command group drives the full maintenance lifecycle: " +
    "health -> compact -> rotate --defer-retire -> retire-superseded " +
    "-> compact-ledger -> recover") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    def vec(id: Long): Array[Float] =
      Array.tabulate(8) { j =>
        val h = scala.util.hashing.byteswap64(id * 8 + j)
        (Math.floorMod(h, 1001L) - 500L).toFloat / 500f
      }
    val root = Files.createTempDirectory("graft-cli-ivf").toString
    val layout = s"$root/ivf"
    graft.operators.Similarity.writeIvfPartitioned(
      (0L until 16L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      layout, centroidK = 2)
    assert(graft.operators.Similarity.appendIvfEpoch(
      (100L until 108L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      layout, "e1"))

    def run(sub: String, posArg: Option[String] = None,
        flags: List[String] = Nil): String =
      Main.ivfCommand(spark, sub, layout, posArg, flags)

    val h0 = run("health", flags = List("--recall", "4"))
    assert(h0.contains("generation=-") && h0.contains("quarantined=0"))
    assert(h0.contains("recall=") && !h0.contains("recall=-"), h0)

    assert(run("compact", Some("c1")) == "applied=true")
    assert(run("compact", Some("c1")) == "applied=false") // replay
    assert(run("health").contains("generation=_gen-1"))
    assert(run("health").contains("maxFilesPerPartition=1"))

    assert(run("rotate", Some("r1"),
      List("--k", "2", "--defer-retire")) == "applied=true")
    assert(run("health").contains("generation=_gen-2"))
    val swept = run("retire-superseded", Some("sweep1"))
    assert(swept == "retired=1", swept) // _gen-1 (flat root already retired by c1)

    assert(run("compact-ledger") == "rolled=3") // e1, c1, r1
    assert(run("compact-ledger") == "rolled=0")
    assert(run("compact", Some("c1")) == "applied=false") // rolled-up id holds

    assert(run("recover") == "recovered quarantined=0")
    // rows intact through the whole lifecycle
    assert(spark.read.parquet(
        graft.operators.Similarity.ivfDataRoot(spark, layout))
      .count() == 24)

    intercept[RuntimeException] { run("rotate") } // missing id
    intercept[RuntimeException] { run("bogus") }
  }
}
