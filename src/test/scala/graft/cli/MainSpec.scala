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

    // the read-only doctor: clean before maintenance; --json is the
    // machine-readable twin (empty array when clean)
    assert(run("fsck", flags = List("--deep-schema")) == "clean")
    assert(run("fsck", flags = List("--deep-schema", "--json")) == "[]")

    // --rerank judges the SQ8 route's recall and reports the route
    val hq = run("health", flags = List("--recall", "4", "--rerank", "64"))
    assert(hq.contains("rerank=64"), hq)
    // health --json: same observables, typed and parseable
    val hj = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      run("health", flags = List("--recall", "4", "--rerank", "64",
        "--json")))
    assert(hj.get("quarantined").asInt() == 0, hj)
    assert(hj.get("generation").isNull, hj) // flat layout pre-compact
    assert(hj.get("recall").get("rerank").asInt() == 64, hj)
    assert(hj.get("files").asLong() > 0, hj)

    assert(run("compact", Some("c1")) == "applied=true")
    assert(run("compact", Some("c1")) == "applied=false") // replay
    assert(run("health").contains("generation=_gen-1"))
    assert(run("health").contains("maxFilesPerPartition=1"))

    assert(run("rotate", Some("r1"),
      List("--k", "2", "--defer-retire")) == "applied=true")
    assert(run("health").contains("generation=_gen-2"))
    val swept = run("retire-superseded", Some("sweep1"))
    assert(swept == "retired=1", swept) // _gen-1 (flat root already retired by c1)
    // the doctor reports the retired bytes awaiting purge, info-grade
    val fk = run("fsck")
    assert(fk.contains("INFO retired-present"), fk)
    // --json carries the SAME findings as parseable one-line JSON —
    // a monitoring agent never scrapes the human lines
    val fkj = run("fsck", flags = List("--json"))
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(fkj)
    assert(tree.isArray && tree.size() == fk.linesIterator.size, fkj)
    val nodes = (0 until tree.size()).map(tree.get)
    assert(nodes.forall(n =>
      Seq("code", "severity", "subject", "detail").forall(n.has)), fkj)
    assert(nodes.exists(n => n.get("code").asText() == "retired-present"
      && n.get("severity").asText() == "info"), fkj)

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

    // a flag taking the NEXT FLAG as its value is a usage error, not a
    // NumberFormatException from '--lock-file'.toInt
    val exFlag = intercept[RuntimeException] {
      run("health", flags = List("--recall", "--lock-file"))
    }
    assert(exFlag.getMessage.contains("--recall needs a value"), exFlag)
    val exTail = intercept[RuntimeException] {
      run("health", flags = List("--recall"))
    }
    assert(exTail.getMessage.contains("--recall needs a value"), exTail)

    // --lock-file goes through the SAME strict parse: a missing value
    // must error, never silently run the maintenance UNLOCKED
    val exLock = intercept[RuntimeException] {
      Main.flagValue(List("--lock-file"), "--lock-file", "ivf rotate")
    }
    assert(exLock.getMessage.contains("--lock-file needs a value"), exLock)
    val exLockFlag = intercept[RuntimeException] {
      Main.flagValue(List("--lock-file", "--defer-retire"),
        "--lock-file", "ivf rotate")
    }
    assert(exLockFlag.getMessage.contains("--lock-file needs a value"),
      exLockFlag)
    assert(Main.flagValue(List("--lock-file", "/tmp/l"),
      "--lock-file", "ivf rotate") == Some("/tmp/l"))
  }

  test("ivf maintain + compact-partitions commands: the policy runs " +
    "under explicit thresholds and reports what it did and why") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    def vec(id: Long): Array[Float] =
      Array.tabulate(8) { j =>
        val h = scala.util.hashing.byteswap64(id * 8 + j)
        (Math.floorMod(h, 1001L) - 500L).toFloat / 500f
      }
    val root = Files.createTempDirectory("graft-cli-maint").toString
    val layout = s"$root/ivf"
    graft.operators.Similarity.writeIvfPartitioned(
      (0L until 16L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      layout, centroidK = 2)
    (1 to 3).foreach { e =>
      assert(graft.operators.Similarity.appendIvfEpoch(
        (100L * e until 100L * e + 8L).map(i => (i, vec(i)))
          .toDF("vec_id", "embedding"),
        layout, s"e$e"))
    }
    def run(sub: String, posArg: Option[String] = None,
        flags: List[String] = Nil): String =
      Main.ivfCommand(spark, sub, layout, posArg, flags)

    // healthy under generous thresholds: reports the no-op AND the
    // observables it judged
    val m0 = run("maintain", Some("m0"),
      List("--max-files", "100", "--skew", "1000000"))
    assert(m0.startsWith("actions=none (healthy)"), m0)
    assert(m0.contains("maxFilesPerPartition="), m0)

    // fragmented: the policy compacts selectively
    val m1 = run("maintain", Some("m1"),
      List("--max-files", "1", "--skew", "1000000"))
    assert(m1.contains("compact-partitions("), m1)
    assert(run("health").contains("maxFilesPerPartition=1"))

    // direct selective compaction entry: nothing over threshold now
    assert(run("compact-partitions", Some("pc9"),
      List("--max-files", "1")) == "compacted_dirs=0")

    // rows intact
    assert(spark.read.parquet(
        graft.operators.Similarity.ivfDataRoot(spark, layout))
      .count() == 40)

    // serving-shaped recall from a held-out parquet: the recall
    // observable appears without --recall (the stored-sample knob)
    val qPath = s"$root/held"
    Seq((9000L, vec(9000L))).toDF("query_id", "embedding")
      .write.parquet(qPath)
    val hq = run("health", flags = List("--recall-queries", qPath))
    assert(hq.contains("recall=") && !hq.contains("recall=-"), hq)

    // purge-retired refuses without an explicit retention window
    val exP = intercept[RuntimeException] { run("purge-retired") }
    assert(exP.getMessage.contains("--older-than"), exP.getMessage)
    // nothing old enough yet: purged=0 (the m1-compact retire is fresh)
    assert(run("purge-retired",
      flags = List("--older-than", "1h")) == "purged=0")
  }

  test("pq command group: health/fsck are listing-only without the " +
    "corpus; rotate/maintain/recall need --emb and refuse loudly " +
    "without it; the lifecycle runs end to end") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    def vec(id: Long): Array[Float] =
      Array.tabulate(8) { j =>
        val h = scala.util.hashing.byteswap64(id * 8 + j)
        (Math.floorMod(h, 1001L) - 500L).toFloat / 500f
      }
    val root = Files.createTempDirectory("graft-cli-pq").toString
    val index = s"$root/pq"
    val built = (0L until 16L).map(i => (i, vec(i)))
    val appended = (100L until 108L).map(i => (i, vec(i)))
    graft.operators.Pq.writePqIndex(
      built.toDF("vec_id", "embedding"), index, m = 4, k = 8,
      centroidK = 2)
    assert(graft.operators.Pq.appendPqEpoch(
      appended.toDF("vec_id", "embedding"), index, "e1"))
    // the source corpus, as a deployment would hold it: a parquet the
    // commands reference by path
    val embPath = s"$root/emb"
    (built ++ appended).toDF("vec_id", "embedding").write.parquet(embPath)

    def run(sub: String, posArg: Option[String] = None,
        flags: List[String] = Nil): String =
      Main.pqCommand(spark, sub, index, posArg, flags)

    // listing-only health: no corpus needed
    val h0 = run("health")
    assert(h0.contains("generation=-") && h0.contains("recall=-") &&
      h0.contains("quarantined=0"), h0)
    // the read-only doctor, text + json twins, geometry checked
    assert(run("fsck", flags = List("--deep-codes")) == "clean")
    assert(run("fsck", flags = List("--deep-codes", "--json")) == "[]")

    // a recall probe needs the corpus: loud refusal, not an empty scan
    val exEmb = intercept[RuntimeException] {
      run("health", flags = List("--recall", "4"))
    }
    assert(exEmb.getMessage.contains("--emb"), exEmb.getMessage)
    // ...and with it, the measured-route observable appears (json too)
    val hr = run("health",
      flags = List("--recall", "4", "--emb", embPath))
    assert(hr.contains("recall=") && !hr.contains("recall=-"), hr)
    val hj = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      run("health", flags = List("--recall", "4", "--emb", embPath,
        "--rerank", "16", "--json")))
    assert(hj.get("recall").get("rerank").asInt() == 16, hj)
    assert(hj.get("files").asLong() > 0, hj)

    // the append fragmented its dirs: the policy compacts and reports
    val m1 = run("maintain", Some("m1"),
      List("--emb", embPath, "--max-files", "1", "--skew", "1000000",
        "--ledger-tail", "1"))
    assert(m1.contains("compact-partitions("), m1)
    assert(m1.contains("compact-ledger("), m1)
    assert(run("health").contains("maxFilesPerPartition=1"))
    assert(run("compact-partitions", Some("pc9"),
      List("--max-files", "1")) == "compacted_dirs=0")

    // maintain without the corpus refuses up front — its rotate arm
    // would otherwise re-train against nothing
    val exM = intercept[RuntimeException] { run("maintain", Some("m2")) }
    assert(exM.getMessage.contains("--emb"), exM.getMessage)

    // re-train: flat index migrates to a generational one
    assert(run("rotate", Some("r1"),
      List("--emb", embPath, "--m", "4", "--codebook-k", "8", "--k", "2",
        "--defer-retire")) == "applied=true")
    assert(run("health").contains("generation=_gen-"))
    // residual migration through the CLI: rotate is an explicit
    // re-train, so the bare flag flips the stored encoding — and the
    // listing/maintenance commands below all run over the residual
    // generation
    assert(!graft.operators.Pq.readPqMeta(spark, index).residual)
    assert(run("rotate", Some("r2"),
      List("--emb", embPath, "--m", "4", "--codebook-k", "8", "--k", "2",
        "--residual")) == "applied=true")
    assert(graft.operators.Pq.readPqMeta(spark, index).residual)
    // the value-form must mean what it says: `--residual False` is an
    // explicit RAW re-encode (the maintain arm's both-directions
    // syntax, case-insensitive like its toBoolean), not a bare-flag
    // enable with a silently dropped value
    assert(run("rotate", Some("r3"),
      List("--emb", embPath, "--m", "4", "--codebook-k", "8", "--k", "2",
        "--residual", "False")) == "applied=true")
    assert(!graft.operators.Pq.readPqMeta(spark, index).residual)
    // garbage refuses loudly instead of silently enabling
    intercept[IllegalArgumentException] {
      run("rotate", Some("r4"),
        List("--emb", embPath, "--m", "4", "--codebook-k", "8", "--k",
          "2", "--residual", "fasle"))
    }
    // pq meta surfaces the stored training geometry, text and JSON
    assert(run("meta") ==
      "m=4 k=8 dim=8 trainIters=0 residual=false")
    val mj = run("meta", flags = List("--json"))
    assert(mj.contains("\"residual\":false") && mj.contains("\"m\":4"), mj)
    val swept = run("retire-superseded", Some("sweep1"))
    assert(swept.startsWith("retired="), swept)
    assert(run("purge-retired",
      flags = List("--older-than", "1h")) == "purged=0")
    assert(run("recover") == "recovered quarantined=0")
    // every row probes through the rotated index
    assert(spark.read.parquet(graft.operators.Similarity.ivfDataRoot(
      spark, index)).count() == 24)

    intercept[RuntimeException] { run("rotate") } // missing id
    intercept[RuntimeException] { run("bogus") }
  }

  test("dedup command group: stats -> compact-history -> recover -> " +
    "purge-retired, with the retention window required") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    def text(i: Long) = (1 to 12).map(j => s"d${i}w$j").mkString(" ")
    val root = Files.createTempDirectory("graft-cli-dedup").toString
    val hist = s"$root/hist"
    val idx = s"$root/idx"
    val h0 = (0L until 20L).map(i => (i, text(i))).toDF("doc_id", "text")
    graft.operators.Dedup.writeHistoryBucketed(h0, hist, nBuckets = 4)
    graft.operators.Dedup.writeMinhashIndex(h0, idx)
    var bloom = spark.sparkContext.broadcast(
      graft.operators.Dedup.digestBloom(h0, 1000, 0.001))
    (1 to 2).foreach { e =>
      val n = (100L * e until 100L * e + 4L).map(i => (i, text(1000 + i)))
        .toDF("doc_id", "text")
      bloom = graft.operators.Dedup.rotateEpochBucketed(n, hist, idx,
        bloom, 1000, 0.001, epochId = s"e$e")
    }
    bloom.unpersist(blocking = false)

    def run(sub: String, pos: List[String],
        flags: List[String] = Nil): String =
      Main.dedupCommand(spark, sub, pos, flags)

    val st = run("stats", List(hist))
    assert(st.contains("buckets=") && !st.contains("maxFilesPerBucket=1"),
      st)
    // stats --json mirrors the text observables
    val stj = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      run("stats", List(hist), List("--json")))
    assert(stj.get("buckets").asInt() > 0 &&
      stj.get("maxFilesPerBucket").asInt() > 1, stj)
    val c = run("compact-history", List(hist, idx, "hc1"))
    assert(c.stripPrefix("compacted_buckets=").toInt >= 1, c)
    assert(run("stats", List(hist)).contains("maxFilesPerBucket=1"))
    assert(run("compact-history", List(hist, idx, "hc1")) ==
      "compacted_buckets=0") // replay
    assert(run("recover", List(hist, idx)) == "recovered quarantined=0")
    val exP = intercept[RuntimeException] {
      run("purge-retired", List(hist, idx))
    }
    assert(exP.getMessage.contains("--older-than"))
    assert(run("purge-retired", List(hist, idx),
      List("--older-than", "1h")) == "purged=0") // hc1.compact is fresh
    assert(run("compact-ledger", List(hist)) == "rolled=3") // e1 e2 hc1
    // the policy step: healthy under generous thresholds, and it
    // reports the observables it judged
    val m = run("maintain", List(hist, idx, "m1"),
      List("--max-files", "100"))
    assert(m.startsWith("actions=none (healthy)") &&
      m.contains("maxFilesPerBucket="), m)
    // rebuild-bloom writes a FRESH sidecar from the at-rest history
    // (the pre-stream warm-up for a restored layout); --expected-items
    // is required (sketch geometry is a deliberate choice)
    intercept[RuntimeException] { run("rebuild-bloom", List(hist)) }
    assert(run("rebuild-bloom", List(hist),
      List("--expected-items", "1000")) == "sidecar_fresh=true")
    assert(graft.operators.Dedup.readBloomSidecar(spark, hist).isDefined)
    // the read-only doctor on the pair: the compaction's retired
    // buckets are the only finding, info-grade
    val fk = run("fsck", List(hist, idx))
    assert(fk.contains("INFO retired-present") &&
      !fk.contains("WARN") && !fk.contains("FATAL"), fk)
    // --json: same findings, machine-parseable (shared renderer with
    // ivf fsck — this pins the dedup wiring)
    val fkj = run("fsck", List(hist, idx), List("--json"))
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(fkj)
    assert(tree.isArray && tree.size() == fk.linesIterator.size, fkj)
    assert((0 until tree.size()).map(tree.get).forall(n =>
      n.get("severity").asText() == "info"), fkj)
    intercept[RuntimeException] { run("stats", Nil) }
    intercept[RuntimeException] { run("bogus", List(hist)) }
  }

  test("substring-dup command group: stats/spans/cut write fresh parquet " +
    "with one-line summaries; build/append/probe run the incremental " +
    "pair; overwrites and bad usage refuse") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-ss").toString
    // docs 0/1 share a 5-token run; 2 is unique; 3 short
    val corpus = Seq(
      (0L, "s1 s2 s3 s4 s5 u0a u0b u0c"),
      (1L, "v1a s1 s2 s3 s4 s5 v1b v1c"),
      (2L, "alone a1 a2 a3 a4 a5 a6 a7"),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val in = s"$root/docs"
    corpus.write.parquet(in)
    def run(sub: String, pos: List[String],
        flags: List[String] = Nil): String =
      Main.substringDupCommand(spark, sub, pos, flags)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()

    val w = List("--window", "4")
    val st = run("stats", List(in, s"$root/stats"), w)
    assert(st.contains("docs=4") && st.contains("dup_docs=2"), st)
    val stj = om.readTree(
      run("stats", List(in, s"$root/statsj"), "--json" :: w))
    assert(stj.get("docs").asLong() == 4L &&
      stj.get("dup_docs").asLong() == 2L &&
      stj.get("dup_windows").asLong() == 4L, stj)

    val sp = run("spans", List(in, s"$root/spans"), w)
    // docs 0 and 1 each get ONE maximal span covering the 5-token run
    assert(sp.contains("spans=2") && sp.contains("docs_with_spans=2") &&
      sp.contains("covered_tokens=10"), sp)

    val ct = run("cut", List(in, s"$root/cut"), w)
    assert(ct.contains("docs=4") && ct.contains("tokens_cut=10") &&
      ct.contains("docs_emptied=0"), ct)
    val cutRows = spark.read.parquet(s"$root/cut")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(cutRows(0) == "u0a u0b u0c" && cutRows(1) == "v1a v1b v1c", ct)

    // the convergence loop through the CLI: this corpus converges in
    // round 1, so the summary equals plain cut's
    val cc = run("cut-converge", List(in, s"$root/cutc"),
      "--max-rounds" :: "3" :: w)
    assert(cc.contains("tokens_cut=10") && cc.contains("docs_emptied=0"),
      cc)

    // overwrite refusal: the out path must be fresh
    val exO = intercept[RuntimeException] {
      run("stats", List(in, s"$root/stats"), w)
    }
    assert(exO.getMessage.contains("refusing to overwrite"), exO.getMessage)

    // the incremental pair: history = docs 0/2/3 built + appended,
    // batch = doc 1 probes (its shared run is dup via history doc 0)
    val hist1 = s"$root/h1"
    corpus.filter($"doc_id" === 0L).write.parquet(hist1)
    val hist2 = s"$root/h2"
    corpus.filter($"doc_id" === 2L || $"doc_id" === 3L).write.parquet(hist2)
    val batch = s"$root/batch"
    corpus.filter($"doc_id" === 1L).write.parquet(batch)
    val idx = s"$root/ssidx"
    assert(run("build", List(hist1, idx), List("--window", "4",
      "--buckets", "4")) == s"built index=$idx window=4 buckets=4")
    assert(run("append", List(hist2, idx, "ep1")) == "applied=true")
    assert(run("append", List(hist2, idx, "ep1")) == "applied=false") // replay
    val pj = om.readTree(
      run("probe", List(batch, idx, s"$root/probe"), List("--json")))
    assert(pj.get("docs").asLong() == 1L &&
      pj.get("dup_docs").asLong() == 1L &&
      pj.get("dup_windows").asLong() == 2L, pj)
    // the excision pair over the same index: spans locate doc 1's
    // shared run (starts 1,2 -> [1, 6), 5 tokens), probe-cut hands the
    // cleaned text
    val psj = om.readTree(
      run("probe-spans", List(batch, idx, s"$root/pspans"),
        List("--json")))
    assert(psj.get("spans").asLong() == 1L &&
      psj.get("covered_tokens").asLong() == 5L, psj)
    val pcj = om.readTree(
      run("probe-cut", List(batch, idx, s"$root/pcut"), List("--json")))
    assert(pcj.get("tokens_cut").asLong() == 5L &&
      pcj.get("docs_emptied").asLong() == 0L, pcj)
    assert(spark.read.parquet(s"$root/pcut").head().getString(1) ==
      "v1a v1b v1c")

    intercept[RuntimeException] { run("stats", List(in)) }
    intercept[RuntimeException] { run("bogus", List(in, s"$root/x")) }

    // the lifecycle subcommands over the pair just built: index-stats
    // reads the fragmentation, maintain compacts + rolls under the
    // policy, fsck is clean after, recover is a safe no-op
    val isj = om.readTree(run("index-stats", List(idx), List("--json")))
    assert(isj.get("buckets").asLong() > 0 &&
      isj.get("maxFilesPerBucket").asLong() > 1, isj)
    val mt = run("maintain", List(idx, "m1"),
      List("--max-files", "1", "--ledger-tail", "1"))
    assert(mt.contains("compact-index(") && mt.contains("compact-ledger("),
      mt)
    val isj2 = om.readTree(run("index-stats", List(idx), List("--json")))
    assert(isj2.get("maxFilesPerBucket").asLong() == 1, isj2)
    val mt2 = run("maintain", List(idx, "m2"),
      List("--max-files", "1", "--ledger-tail", "64"))
    assert(mt2.contains("actions=none (healthy)"), mt2)
    // the probe is invariant under the maintenance (summed-merge rows)
    val pj2 = om.readTree(
      run("probe", List(batch, idx, s"$root/probe2"), List("--json")))
    assert(pj2.get("dup_windows").asLong() == 2L, pj2)
    assert(run("fsck", List(idx)) == "clean" ||
      run("fsck", List(idx)).contains("retired-present"),
      run("fsck", List(idx)))
    val fkj = om.readTree(run("fsck", List(idx), List("--json")))
    assert(fkj.isArray(), fkj)
    assert(run("recover", List(idx)).startsWith("recovered quarantined=0"))
    intercept[RuntimeException] { run("maintain", List(idx)) }
    intercept[RuntimeException] { run("index-stats", Nil) }

    // geometry migration through the CLI: re-bucket 4 -> 8 over the
    // full index corpus; the probe is invariant and the replay no-ops
    val histAll = s"$root/histAll"
    corpus.filter($"doc_id" =!= 1L).write.parquet(histAll)
    assert(run("rotate", List(histAll, idx, "r1"),
        List("--window", "4", "--buckets", "8")) ==
      s"applied=true window=4 buckets=8")
    val pj3 = om.readTree(
      run("probe", List(batch, idx, s"$root/probe3"), List("--json")))
    assert(pj3.get("dup_windows").asLong() == 2L, pj3)
    assert(run("rotate", List(histAll, idx, "r1"),
        List("--window", "4", "--buckets", "8")) ==
      s"applied=false window=4 buckets=8")

    // --max-records-per-file reaches the policy's compaction (parity
    // with the compact subcommand): fragment with an append, then a
    // record-capped maintain must split each bucket's rewrite
    assert(run("append", List(hist1, idx, "ep2")) == "applied=true")
    val mt3 = run("maintain", List(idx, "m3"),
      List("--max-files", "1", "--ledger-tail", "64",
        "--max-records-per-file", "1", "--files-per-partition", "1"))
    assert(mt3.contains("compact-index("), mt3)
    // the cap reached the rewrite: with --files-per-partition 1 a
    // compacted bucket would land as ONE file unless the 1-record cap
    // split it — so a multi-file bucket after the compaction is the
    // cap's signature (single-file buckets under the threshold are
    // never rewritten and prove nothing either way)
    assert(graft.operators.Dedup.substringPartitionStats(spark, idx)
      .exists(_._2 > 1),
      "the --max-records-per-file cap did not reach the compaction")

    // deferRetire rotation + the retire-superseded/purge-retired pair:
    // the superseded generation stays until swept, then purges
    assert(run("rotate", List(histAll, idx, "r2"),
        List("--window", "4", "--buckets", "4", "--defer-retire")) ==
      s"applied=true window=4 buckets=4")
    assert(run("retire-superseded", List(idx, "sw1")).startsWith(
      "retired="))
    assert(graft.operators.EpochLedger.listRetired(spark, idx)
      .exists(_._1.contains("sw1.superseded")))
    // wiring only: just-retired dirs are newer than any window, so
    // purged=0 here — the deletion semantics are the API spec's
    // (SubstringLifecycleSpec pins the full sweep→purge lifecycle)
    val pr = run("purge-retired", List(idx), List("--older-than", "1h"))
    assert(pr.startsWith("purged="), pr)
    intercept[RuntimeException] { run("purge-retired", List(idx)) }
    intercept[RuntimeException] { run("retire-superseded", List(idx)) }
    // the probe still answers from the live generation after the sweep
    val pj4 = om.readTree(
      run("probe", List(batch, idx, s"$root/probe4"), List("--json")))
    assert(pj4.get("dup_windows").asLong() == 2L, pj4)
  }

  test("parseDuration accepts s/m/h/d suffixes and plain seconds, " +
    "refuses garbage and non-positive values") {
    assert(Main.parseDuration("45") == 45000L)
    assert(Main.parseDuration("45s") == 45000L)
    assert(Main.parseDuration("90m") == 90L * 60 * 1000)
    assert(Main.parseDuration("2h") == 2L * 3600 * 1000)
    assert(Main.parseDuration("7d") == 7L * 86400 * 1000)
    intercept[RuntimeException] { Main.parseDuration("") }
    intercept[RuntimeException] { Main.parseDuration("h") }
    intercept[RuntimeException] { Main.parseDuration("x7d") }
    intercept[IllegalArgumentException] { Main.parseDuration("0s") }
  }
}
