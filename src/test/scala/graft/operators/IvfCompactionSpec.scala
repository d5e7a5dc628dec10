package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IVF layout compaction ([[Similarity.compactIvf]]) and the `_epochs`
  * ledger roll-up ([[EpochLedger.compactLedger]]): every
  * [[Similarity.appendIvfEpoch]] lands one file-set per partition dir
  * per epoch plus one ledger entry file — at hourly cadence the file
  * counts grow unbounded and scan planning / recovery listings degrade.
  * Compaction must bound both WITHOUT changing a single query answer,
  * through the same crash-safe reader-atomic generation publish the
  * rotation uses.
  */
class IvfCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(id: Long): Array[Float] =
    Array.tabulate(8) { j =>
      val h = scala.util.hashing.byteswap64(id * 8 + j)
      (Math.floorMod(h, 1001L) - 500L).toFloat / 500f
    }

  private def emb(ids: Range): DataFrame =
    ids.map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "embedding")

  private def rows(p: String): Set[(Long, String)] =
    spark.read.parquet(Similarity.ivfDataRoot(spark, p))
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def probe(p: String): Set[(Long, Long, Int)] =
    Similarity.ivfKnnPartitioned(spark, p, Seq(0L, 3L, 7L), k = 3,
      nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** A layout grown by `epochs` ledgered appends — each partition dir
    * accumulates one file-set per epoch.
    */
  private def grown(root: String, epochs: Int): String = {
    val path = s"$root/ivf"
    Similarity.writeIvfPartitioned(emb(0 until 16), path, centroidK = 2)
    (1 to epochs).foreach { e =>
      assert(Similarity.appendIvfEpoch(
        emb((100 * e) until (100 * e + 8)), path, s"e$e"))
    }
    path
  }

  test("compactIvf bounds the per-partition file count after N appends " +
    "and leaves probe results row-identical; the superseded generation " +
    "is retired, a replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmp").toString
    val path = grown(root, epochs = 4)
    val before = rows(path)
    val probeBefore = probe(path)
    // appends really fragmented the layout (epoch file-sets accumulate)
    assert(Similarity.ivfPartitionStats(spark, path).exists(_._2 > 1))

    assert(Similarity.compactIvf(spark, path, "c1"))
    assert(rows(path) == before)
    assert(probe(path) == probeBefore)
    // ONE file per partition dir now
    assert(Similarity.ivfPartitionStats(spark, path).forall(_._2 == 1))
    // published as a generation; the fragmented root retired, not lost
    assert(Similarity.ivfDataRoot(spark, path) == s"$path/_gen-1")
    assert(Similarity.listIvfRetired(spark, path)
      .map(_._1) == Seq("c1.pre-rotate"))
    // replay: ledger hit, nothing rewritten
    assert(!Similarity.compactIvf(spark, path, "c1"))
    // partition pruning survives the generational layout: the probe
    // predicate still reaches the (gen-dir) scan as a PartitionFilter
    val plan = Similarity.ivfKnnPartitioned(spark, path, Seq(0L, 3L),
        k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"))
    // appends continue against the compacted generation
    assert(Similarity.appendIvfEpoch(emb(900 until 908), path, "e9"))
    assert(rows(path).size == before.size + 8)
  }

  test("compacting an already-generational layout retires the prior " +
    "generation in one rename and keeps answers identical") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmp2").toString
    val path = grown(root, epochs = 2)
    assert(Similarity.compactIvf(spark, path, "c1"))
    assert(Similarity.appendIvfEpoch(emb(500 until 510), path, "e5"))
    val before = rows(path)
    val probeBefore = probe(path)
    assert(Similarity.compactIvf(spark, path, "c2"))
    assert(Similarity.ivfDataRoot(spark, path) == s"$path/_gen-2")
    assert(rows(path) == before)
    assert(probe(path) == probeBefore)
    assert(Similarity.listIvfRetired(spark, path).map(_._1).sorted ==
      Seq("c1.pre-rotate", "c2.pre-rotate"))
    val f = Dedup.fsFor(spark, path)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/_gen-1")))
  }

  test("maxRecordsPerFile re-splits oversized partitions instead of " +
    "forcing one file") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmp3").toString
    val path = grown(root, epochs = 2)
    val before = rows(path)
    assert(Similarity.compactIvf(spark, path, "c1", maxRecordsPerFile = 3L))
    assert(rows(path) == before)
    val stats = Similarity.ivfPartitionStats(spark, path)
    // ceil(rows/3) files per partition — never one giant file
    stats.foreach { case (cid, files, _) =>
      val n = rows(path).count(_._2 == cid)
      assert(files == (n + 2) / 3, s"$cid: $files files for $n rows")
    }
  }

  test("crash injection at every compaction point: recovery plus a " +
    "same-id retry converge, rows and answers never change") {
    for (fp <- Seq("staged", "committed", "gen-move", "gen-moved",
      "published", "retire-dir", "retired")) {
      val root = java.nio.file.Files.createTempDirectory("graft-cmpcr").toString
      val path = grown(root, epochs = 2)
      val before = rows(path)
      val probeBefore = probe(path)
      val ex = intercept[RuntimeException] {
        Similarity.compactIvfStaged(spark, path, "c1", 0L,
          failpoint = p =>
            if (p == fp) throw new RuntimeException(s"injected at $p"))
      }
      assert(ex.getMessage.contains("injected"), fp)
      // whatever the crash point, the READER's view is already correct
      assert(rows(path) == before, fp)
      assert(probe(path) == probeBefore, fp)

      val appliedNow = Similarity.compactIvf(spark, path, "c1")
      assert(appliedNow == (fp == "staged"), fp)
      assert(EpochLedger.applied(spark, path, "c1"), fp)
      assert(rows(path) == before, fp)
      assert(probe(path) == probeBefore, fp)
      assert(Similarity.ivfPartitionStats(spark, path).forall(_._2 == 1), fp)
      val f = Dedup.fsFor(spark, path)
      assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/_retrain/c1")),
        fp)
      assert(Similarity.listIvfQuarantined(spark, path).isEmpty, fp)
    }
  }

  test("an id cannot cross protocols: compacting under an applied epoch " +
    "id fails loudly; appending under a compaction id fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmpkind").toString
    val path = grown(root, epochs = 1)
    val ex1 = intercept[IllegalArgumentException] {
      Similarity.compactIvf(spark, path, "e1")
    }
    assert(ex1.getMessage.contains("protocol"))
    assert(Similarity.compactIvf(spark, path, "c1"))
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.appendIvfEpoch(emb(700 until 704), path, "c1")
    }
    assert(ex2.getMessage.contains("protocol"))
  }

  test("compactLedger rolls the entry tail into one applied-set file: " +
    "applied()/kind checks and replay refusal survive, including " +
    "across a later compaction and further appends") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmpledg").toString
    val path = grown(root, epochs = 3)
    assert(Similarity.compactIvf(spark, path, "c1"))
    val f = Dedup.fsFor(spark, path)
    def ledgerFiles: Seq[String] =
      f.listStatus(new org.apache.hadoop.fs.Path(s"$path/_epochs"))
        .map(_.getPath.getName).toIndexedSeq.sorted
    assert(ledgerFiles == Seq("c1", "e1", "e2", "e3"))

    assert(EpochLedger.compactLedger(spark, path) == 4)
    assert(ledgerFiles == Seq("_compacted.1"))
    // every id still answers applied, with its kind preserved
    (1 to 3).foreach(e =>
      assert(EpochLedger.applied(spark, path, s"e$e"), s"e$e"))
    assert(EpochLedger.applied(spark, path, "c1"))
    assert(!EpochLedger.applied(spark, path, "e4"))
    // replays refuse off the roll-up alone
    assert(!Similarity.appendIvfEpoch(emb(100 until 108), path, "e1"))
    assert(!Similarity.compactIvf(spark, path, "c1"))
    // cross-protocol ids still fail loudly off the roll-up's kind tags
    val ex = intercept[IllegalArgumentException] {
      Similarity.compactIvf(spark, path, "e2")
    }
    assert(ex.getMessage.contains("protocol"))

    // the tail regrows with new epochs; a second roll-up merges both
    assert(Similarity.appendIvfEpoch(emb(800 until 808), path, "e8"))
    assert(ledgerFiles == Seq("_compacted.1", "e8"))
    assert(EpochLedger.compactLedger(spark, path) == 1)
    assert(ledgerFiles == Seq("_compacted.2"))
    (Seq("e1", "e2", "e3", "c1", "e8")).foreach(id =>
      assert(EpochLedger.applied(spark, path, id), id))
    // nothing to roll: no-op
    assert(EpochLedger.compactLedger(spark, path) == 0)
    assert(ledgerFiles == Seq("_compacted.2"))
  }

  test("compactLedger crash injection: a crash after the roll-up lands " +
    "or mid-prune leaves every id readable, and a re-run converges to " +
    "one roll-up file") {
    for (fp <- Seq("rolled", "prune-file")) {
      val root = java.nio.file.Files.createTempDirectory("graft-cmplcr").toString
      val path = grown(root, epochs = 3)
      val f = Dedup.fsFor(spark, path)
      def ledgerFiles: Seq[String] =
        f.listStatus(new org.apache.hadoop.fs.Path(s"$path/_epochs"))
          .map(_.getPath.getName).toIndexedSeq.sorted
      val ex = intercept[RuntimeException] {
        EpochLedger.compactLedgerStaged(spark, path,
          p => if (p == fp) throw new RuntimeException(s"injected at $p"))
      }
      assert(ex.getMessage.contains("injected"), fp)
      // superset state: the roll-up is durable and every id answers
      // applied from at least one place
      assert(ledgerFiles.contains("_compacted.1"), fp)
      (1 to 3).foreach(e =>
        assert(EpochLedger.applied(spark, path, s"e$e"), s"$fp e$e"))
      assert(!Similarity.appendIvfEpoch(emb(100 until 108), path, "e1"), fp)
      // re-run converges: one roll-up, no stray entries or temps
      EpochLedger.compactLedger(spark, path)
      val after = ledgerFiles
      assert(after.count(_.startsWith("_compacted.")) == 1, s"$fp: $after")
      assert(after.forall(_.startsWith("_compacted.")), s"$fp: $after")
      (1 to 3).foreach(e =>
        assert(EpochLedger.applied(spark, path, s"e$e"), s"$fp e$e"))
      // the layout itself still appends normally
      assert(Similarity.appendIvfEpoch(emb(800 until 804), path, "e8"), fp)
      assert(EpochLedger.applied(spark, path, "e8"), fp)
    }
  }

  test("ivfHealth: one call surfaces every runbook observable, " +
    "listing-only by default, across the flat->compacted transition") {
    val root = java.nio.file.Files.createTempDirectory("graft-health").toString
    val path = grown(root, epochs = 3)
    val h0 = Similarity.ivfHealth(spark, path)
    assert(h0.dataRoot == path && h0.generation.isEmpty)
    assert(h0.partitions > 0 && h0.files > h0.partitions && h0.bytes > 0)
    assert(h0.maxFilesPerPartition > 1) // the compaction trigger
    assert(h0.skewRatio >= 1.0)
    assert(h0.recall.isEmpty && h0.quarantined == 0 && h0.retired == 0)

    assert(Similarity.compactIvf(spark, path, "c1"))
    val h1 = Similarity.ivfHealth(spark, path, recallSampleN = 8, k = 3,
      nprobe = 2)
    assert(h1.dataRoot == s"$path/_gen-1" && h1.generation.contains("_gen-1"))
    assert(h1.maxFilesPerPartition == 1)
    assert(h1.retired == 1) // the pre-compaction root awaits purge
    val r = h1.recall.get
    assert(r.queries == 8 && r.k == 3 && r.nprobe == 2)
    assert(r.recallAtK >= 0.0 && r.recallAtK <= 1.0)
  }

  test("compactLedger is harmless on a layout with no ledger dir") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmpnl").toString
    val path = s"$root/ivf"
    Similarity.writeIvfPartitioned(emb(0 until 8), path, centroidK = 2)
    assert(EpochLedger.compactLedger(spark, path) == 0)
  }
}
