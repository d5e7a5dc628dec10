package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The band-bucket population guard ([[Banding.selfPairs]] and the
  * probe-side cap in `Dedup.probeCandidates`): a mega near-dup cluster
  * (boilerplate pages banded into every bucket) must cost LINEAR
  * anchor/star candidates, not d²/2 — while light buckets, keeper
  * chaining, and everything the oracle queries pin stay bit-identical.
  */
class BandingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler =
    "subscribe to our newsletter for updates terms of service privacy policy all rights reserved"
  private val other =
    "completely different words about spark catalyst tungsten shuffles and joins"

  /** 300 identical boilerplate docs (ids 0..299) + one identical light
    * pair (1000, 1001) + one unrelated doc (2000).
    */
  private def skewedDocs = {
    val cluster = (0L until 300L).map(i => (i, boiler))
    val light = Seq((1000L, other), (1001L, other))
    val lone = Seq((2000L, "nothing here resembles anything else in this corpus at all"))
    (cluster ++ light ++ lone).toDF("doc_id", "text")
  }

  test("minhash LSH: over-cap bucket stars to the anchor, linear not quadratic") {
    val capped = Dedup.minhashLshPairs(skewedDocs, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the 300-member cluster: exactly 299 anchor pairs (0, i), all 1.0
    val clusterPairs = capped.keys.filter(_._2 < 1000L)
    assert(clusterPairs.size == 299)
    assert(clusterPairs.forall { case (a, b) => a == 0L && b >= 1L && b <= 299L })
    assert(clusterPairs.forall(p => capped(p) == 1.0))
    // the light 2-member bucket is untouched by the cap
    assert(capped((1000L, 1001L)) == 1.0)
    // uncapped = full quadratic cluster, and capped is a subset of it
    val uncapped = Dedup.minhashLshPairs(skewedDocs, threshold = 0.8,
        maxBandPop = None)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(p => p._2 < 1000L) == 300 * 299 / 2)
    assert(capped.keySet.subsetOf(uncapped))
  }

  test("capped pairs still resolve the full cluster via components (keeper chaining)") {
    val capped = Dedup.minhashLshPairs(skewedDocs, threshold = 0.8)
    val comp = Dedup.components(capped).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every cluster member reaches the anchor's component
    assert((0L until 300L).forall(i => comp(i) == 0L))
    assert(comp(1000L) == 1000L && comp(1001L) == 1000L)
  }

  test("srp LSH: over-cap embedding bucket stars to the anchor") {
    // 300 identical embeddings + 2 identical light ones + 1 apart
    val vecs =
      (0L until 300L).map(i => (i, Array(1.0f, 0.2f, 0.1f, 0.5f))) ++
        Seq((1000L, Array(-1.0f, 0.4f, -0.3f, 0.2f)),
          (1001L, Array(-1.0f, 0.4f, -0.3f, 0.2f)),
          (2000L, Array(0.0f, -1.0f, 1.0f, -0.8f)))
    val emb = vecs.toDF("vec_id", "embedding")
    // EXPLICIT cap: the default 12x8 geometry has 8-bit band keys and
    // resolves uncapped through the same geometry gate as simhashPairs
    // (random full-bucket agreements are routine at that key width) —
    // this case exercises the capped anchor/star path
    val capped = Similarity.srpDupPairs(emb, threshold = 0.99,
        maxBandPop = Some(Banding.DefaultMaxBandPop))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val clusterPairs = capped.keys.filter(_._2 < 1000L)
    assert(clusterPairs.size == 299)
    assert(clusterPairs.forall { case (a, b) => a == 0L && b <= 299L })
    assert(clusterPairs.forall(p => capped(p) == 1.0))
    assert(capped((1000L, 1001L)) == 1.0)
    val uncapped = Similarity.srpDupPairs(emb, threshold = 0.99,
        maxBandPop = None)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(p => p._2 < 1000L) == 300 * 299 / 2)
    assert(capped.keySet.subsetOf(uncapped))
  }

  test("simhash: over-cap bucket stars to the anchor") {
    val capped = Dedup.simhashPairs(skewedDocs, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val clusterPairs = capped.keys.filter(_._2 < 1000L)
    assert(clusterPairs.size == 299)
    assert(clusterPairs.forall { case (a, b) => a == 0L && b <= 299L })
    assert(clusterPairs.forall(p => capped(p) == 0))
    assert(capped((1000L, 1001L)) == 0)
    val uncapped = Dedup.simhashPairs(skewedDocs, maxHamming = 3,
        maxBandPop = None)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(p => p._2 < 1000L) == 300 * 299 / 2)
    assert(capped.keySet.subsetOf(uncapped))
  }

  test("incremental probe: over-cap index bucket pairs batch docs with the history anchor only") {
    val history = ((0L until 300L).map(i => (i, boiler)) :+ (500L, other))
      .toDF("doc_id", "text")
    val batch = Seq((1L, boiler), (2L, other)).toDF("doc_id", "text")
    val index = Dedup.minhashIndex(history)
    val capped = Dedup.minhashProbe(batch, index, history, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // batch doc 1 (boilerplate): ONLY the anchor history doc, not 300 rows
    assert(capped.keys.filter(_._1 == 1L).toSet == Set((1L, 0L)))
    assert(capped((1L, 0L)) == 1.0)
    // batch doc 2's 2-member bucket (hist doc 500) is light — untouched
    assert(capped((2L, 500L)) == 1.0)
    val uncapped = Dedup.minhashProbe(batch, index, history, threshold = 0.8,
        maxBandPop = None)
      .select("batch_id", "hist_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(_._1 == 1L) == 300)
    assert(capped.keySet.subsetOf(uncapped))
    // the bucketed-at-rest layout probes identically with the cap engaged
    val root = java.nio.file.Files.createTempDirectory("graft-bp").toString
    Dedup.writeHistoryBucketed(history, root, nBuckets = 8)
    val bucketed = Dedup.minhashProbeBucketed(batch, index, root,
        threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(bucketed == capped)
  }

  test("self-probe with excludeSameId: the anchor doc itself still chains " +
    "to its cluster via the bucket's second member") {
    val corpus = ((0L until 300L).map(i => (i, boiler)) :+ (500L, other))
      .toDF("doc_id", "text")
    // probing a SUBSET of the corpus against an index of itself — the
    // batch includes doc 0, the heavy bucket's own anchor
    val batch = corpus.filter(col("doc_id").isin(0L, 7L, 500L))
    val got = Dedup.minhashProbe(batch, Dedup.minhashIndex(corpus), corpus,
        threshold = 0.8, excludeSameId = true)
      .select("batch_id", "hist_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 0 would star only to itself and then be excluded — the fix
    // routes it to the bucket's second-min member instead
    assert(got.contains((0L, 1L)))
    assert(got.contains((7L, 0L)))
    assert(!got.exists(p => p._1 == p._2))
  }

  test("duplicate-id corpus: a row sharing another heavy cluster's anchor id " +
    "is not treated as that cluster's anchor") {
    // two orthogonal direction clusters, both over the cap; vec_id 100
    // appears TWICE — as cluster B's true anchor (direction d2) and as
    // an unrelated member of cluster A (direction d1)
    val d1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val d2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val vecs = (0L until 10L).map(i => (i, d1)) ++ Seq((100L, d1)) ++
      (100L until 110L).map(i => (i, d2))
    val emb = vecs.toDF("vec_id", "embedding")
    val spark2 = spark
    import spark2.implicits._
    val cents = Seq((0L, d1.map(_.toDouble).toSeq, 1.0),
      (1L, d2.map(_.toDouble).toSeq, 1.0)).toDF("centroid_id", "cvec", "cnrm")
    val got = Similarity.semanticDupPairs(emb, threshold = 0.9,
        centroids = Some(cents), maxClusterSize = Some(4))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want =
      (1L until 10L).map(b => (0L, b)).toSet + ((0L, 100L)) ++
        (101L until 110L).map(b => (100L, b)).toSet
    assert(got == want)
    // canonical order must hold for every pair
    assert(got.forall { case (a, b) => a < b })
  }

  test("no-skew corpus: capped and uncapped plans produce identical pairs") {
    val docs = Seq(
      (0L, boiler), (1L, boiler), (2L, other), (3L, other),
      (4L, "one more unrelated sentence that shares nothing with the rest of them here")
    ).toDF("doc_id", "text")
    def pairs(cap: Option[Int]) =
      Dedup.minhashLshPairs(docs, threshold = 0.8, maxBandPop = cap)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    assert(pairs(Some(Banding.DefaultMaxBandPop)) == pairs(None))
  }

  test("reliable-checkpoint path: withReliable materializes operator " +
    "results under the stable dir with identical pairs") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-reliable").toString
    // default path (executor-local blocks) as the expectation
    val want = Dedup.minhashLshPairs(skewedDocs, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    val got = Caching.withReliable(ckpt) {
      // engages BOTH materializations: selfPairs' heavy branch (the
      // 300-member cluster is over cap) and withCached's result
      Dedup.minhashLshPairs(skewedDocs, threshold = 0.8)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    }
    assert(got == want)
    // the reliable path really ran: checkpoint data landed in the dir
    def files(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
    }
    assert(files(new java.io.File(ckpt)).nonEmpty)
    // and the scope restored the default (local) materialization
    assert(Caching.reliableDir.isEmpty)
  }

  test("geometry-gated cap default: short band keys (<= 8 bits) run " +
    "uncapped, wide keys keep the population cap") {
    assert(Banding.defaultCapFor(32, 4).isEmpty) // 8-bit keys
    assert(Banding.defaultCapFor(64, 8).isEmpty) // 8-bit keys
    assert(Banding.defaultCapFor(64, 4).contains(Banding.DefaultMaxBandPop))
    assert(Banding.defaultCapFor(16, 1).contains(Banding.DefaultMaxBandPop))
    // degenerate geometries fall through to the capped default (the
    // operators' own requires reject them before any plan runs)
    assert(Banding.defaultCapFor(32, 0).contains(Banding.DefaultMaxBandPop))

    // ENFORCEMENT, not documentation: the 32-bit geometry's default is
    // now the uncapped join — on the over-cap cluster it emits the full
    // quadratic pair set, bit-identical to an explicit None, and NOT
    // the 299 anchor pairs an explicit cap would produce
    def pairs(cap: Option[Int]) =
      Dedup.simhashPairs(skewedDocs, maxHamming = 3, bits = 32, bands = 4,
          maxBandPop = cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byDefault = Dedup.simhashPairs(skewedDocs, maxHamming = 3,
        bits = 32, bands = 4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byDefault == pairs(None))
    assert(byDefault.count(_._2 < 1000L) == 300 * 299 / 2)
    assert(pairs(Some(Banding.DefaultMaxBandPop))
      .count(_._2 < 1000L) == 299)
  }

  test("reliableDir scope is per-thread: two concurrent scopes never " +
    "see (or restore over) each other's dir") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-rel-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-rel-b").toString
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def worker(name: String, dir: String) = new Thread(() => {
      try {
        assert(Caching.reliableDir.isEmpty) // fresh thread: no inherited scope
        Caching.withReliable(dir) {
          barrier.await() // both scopes active simultaneously...
          seen.put(name, Caching.reliableDir)
          barrier.await() // ...and each must still see ITS OWN dir
        }
        // the finally-restore cleared only this thread's scope
        assert(Caching.reliableDir.isEmpty)
      } catch { case t: Throwable => errs.add(t) }
    }, name)
    val ta = worker("a", dirA)
    val tb = worker("b", dirB)
    ta.start(); tb.start(); ta.join(30000); tb.join(30000)
    assert(errs.isEmpty, s"worker failures: ${errs.toArray.mkString(", ")}")
    assert(seen.get("a") == Some(dirA))
    assert(seen.get("b") == Some(dirB))
    // and the main (test) thread's mode was never touched
    assert(Caching.reliableDir.isEmpty)
  }

  test("short-key uncapped default is LOUD: the hazard fires at 32/4 " +
    "(and every <= 8-bit-key geometry), not at 64/4, and resolution " +
    "through it never changes the resolved cap") {
    // the hazard exists exactly where the default resolves uncapped
    val hazard32 = Banding.shortKeyHazard(32, 4)
    assert(hazard32.isDefined)
    // the message must NAME the quadratic risk and the escape hatches
    assert(hazard32.get.contains("O(N^2/2^8)"))
    assert(hazard32.get.contains("maxBandPop"))
    assert(Banding.shortKeyHazard(64, 8).isDefined) // 8-bit keys too
    assert(Banding.shortKeyHazard(64, 4).isEmpty)
    assert(Banding.shortKeyHazard(16, 1).isEmpty)
    // the loud resolver is cap-transparent: same resolution, plus the log
    for ((bits, bands) <- Seq((32, 4), (64, 8), (64, 4), (16, 1), (32, 0)))
      assert(Banding.resolveDefaultCap(bits, bands) ==
        Banding.defaultCapFor(bits, bands), s"$bits/$bands")
  }

  test("simhash 64-bit geometry: same true pairs, no more random candidates than 32-bit") {
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    // 60 deterministic pseudo-random distinct docs + one identical pair
    val docs = ((0L until 60L).map { i =>
      val text = (0 until 12)
        .map(j => words(((i * 31 + j * 17 + j * j) % words.length).toInt))
        .mkString(" ")
      (i, text)
    } ++ Seq((100L, boiler), (101L, boiler))).toDF("doc_id", "text")
    // maxHamming = bits admits EVERY candidate — the output IS the
    // candidate set, so geometry's collision rate becomes observable
    def cands(bits: Int, bands: Int) =
      Dedup.simhashPairs(docs, maxHamming = bits, bits = bits, bands = bands)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c32 = cands(32, 4) // 8-bit bands: 1,024 keys total
    val c64 = cands(64, 4) // 16-bit bands: 268M keys total
    assert(c32.contains((100L, 101L)) && c64.contains((100L, 101L)))
    assert(c64.size <= c32.size)
    // identical docs stay hamming 0 at 64 bits
    val h = Dedup.simhashPairs(docs, maxHamming = 0, bits = 64, bands = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(h((100L, 101L)) == 0)

    // the DEFAULT geometry IS the corpus-scale one: calling without
    // bits/bands is bit-identical to the explicit 64-bit / 4×16 form
    // (the rehearsal showed the old 32-bit default saturating every
    // bucket at 40k docs — SCALING.md)
    def all(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toSet
    assert(all(Dedup.simhashPairs(docs, maxHamming = 3)) ==
      all(Dedup.simhashPairs(docs, maxHamming = 3, bits = 64, bands = 4)))
  }
}
