package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The id-rule migration contract: whitespace/control/',' rejection was
  * added after layouts shipped, so ids ALREADY in a ledger must keep
  * replaying as no-ops and resuming their stages — only NEW epoch
  * applications are held to the full rule, and the roll-up refuses to
  * fold format-corrupting names into its line format.
  */
class EpochLedgerLegacyIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 8L)
    .map(i => (i, (1 to 10).map(j => s"d${i}w$j").mkString(" ")))
    .toDF("doc_id", "text")

  test("a ledgered LEGACY id (spaces) replays as a no-op; the same id " +
    "NEW still rejects; control-char legacy entries survive compactLedger " +
    "as tail files") {
    val root = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    val idx = s"$root/idx"
    Dedup.writeSubstringIndex(docs, idx, window = 4, nBuckets = 4)
    assert(Dedup.appendSubstringEpoch(
      docs.filter($"doc_id" < 2), idx, "ok1"))

    // simulate a legacy deployment: entry files whose names were legal
    // before the whitespace/control rules existed
    val f = Dedup.fsFor(spark, idx)
    def ledgerEntry(name: String): Unit = {
      val out = f.create(
        new org.apache.hadoop.fs.Path(s"$idx/_epochs/$name"), true)
      try out.write("epoch".getBytes("UTF-8")) finally out.close()
    }
    ledgerEntry("legacy id 7")   // spaces: format-safe, rolls up fine
    ledgerEntry("legacy\tid8")   // tab: would corrupt the roll-up line

    // replaying the legacy ids NO-OPS (returns false) instead of
    // throwing — the layout must never wedge on ids it already holds
    assert(!Dedup.appendSubstringEpoch(docs, idx, "legacy id 7"))
    assert(!Dedup.appendSubstringEpoch(docs, idx, "legacy\tid8"))

    // a NEW application with such an id still rejects (full rule)
    val e = intercept[IllegalArgumentException] {
      Dedup.appendSubstringEpoch(docs, idx, "brand new id")
    }
    assert(e.getMessage.contains("whitespace"), e.getMessage)
    // and structurally unsafe ids reject before ANY path use
    intercept[IllegalArgumentException] {
      Dedup.appendSubstringEpoch(docs, idx, "../escape")
    }

    // the roll-up folds the space id (parse-safe) but leaves the tab
    // id as a tail FILE — folding it would re-parse as a different id
    // and make `applied` false for an applied epoch
    assert(EpochLedger.compactLedger(spark, idx) > 0)
    assert(EpochLedger.applied(spark, idx, "legacy id 7"))
    assert(EpochLedger.applied(spark, idx, "legacy\tid8"))
    assert(f.exists(new org.apache.hadoop.fs.Path(
      s"$idx/_epochs/legacy\tid8")),
      "control-char legacy entry must stay a tail file")
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      s"$idx/_epochs/legacy id 7")),
      "space legacy entry is format-safe and should have rolled up")
    // replay after the roll-up still no-ops
    assert(!Dedup.appendSubstringEpoch(docs, idx, "legacy id 7"))
    assert(!Dedup.appendSubstringEpoch(docs, idx, "legacy\tid8"))
  }
}
