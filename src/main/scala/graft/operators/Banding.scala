package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared candidate generation for the LSH banding family
  * ([[Dedup.minhashLshPairs]], [[Dedup.simhashPairs]],
  * [[Similarity.srpDupPairs]], and the incremental probe's index join):
  * the (band, key) self-join that turns bucket rows into candidate
  * pairs, with the SAME population guard the shingle-df path
  * ([[Dedup.DefaultMaxShingleDf]]) and the cluster path
  * ([[Similarity.DefaultMaxClusterSize]]) already have.
  *
  * Why the guard exists: a d-member near-dup cluster (boilerplate /
  * template pages — the single most common pathology in web corpora)
  * collides in EVERY band, so the plain self-join emits d²/2 candidate
  * pairs per band before any dedup. The cap bounds that worst case at
  * linear cost: members of an over-cap bucket pair with the bucket's
  * ANCHOR (min id) only — every member still chains to one keeper, so
  * downstream connected-components resolve the cluster identically,
  * while non-anchor pairs WITHIN the over-cap bucket are the only
  * candidates not examined (the exact trade `DefaultMaxShingleDf`
  * documents). Verification stays exact in the callers, so the cap can
  * never create a false positive.
  *
  * RECALL CAVEAT — the cap IS a behavior change for mixed-population
  * buckets: "components resolve identically" holds when an over-cap
  * bucket is a genuine near-dup cluster (anchor pairs verify, the
  * cluster chains). If a DEGENERATE band key captures mostly UNRELATED
  * docs, a true near-dup pair inside such a bucket survives only if
  * (a) one of the pair is the bucket's anchor, or (b) the pair also
  * shares some under-cap bucket; otherwise it is dropped entirely —
  * its anchor pairs fail exact verification and nothing chains it.
  * Callers whose banding geometry risks degenerate keys (few bands ×
  * short keys, e.g. the 32-bit SimHash geometry) should raise the cap
  * or pass `None`; the default 64-bit/4×16 geometries make a random
  * 256-doc key agreement vanishingly unlikely, which is what makes
  * the default cap safe there.
  *
  * The cap is ADAPTIVE, like the shingle-df guard: one
  * map-side-combinable aggregation over the bucket rows counts each
  * (band, key) population, and a single `limit(1)` probe decides
  * whether any bucket exceeds the cap — the common no-skew corpus runs
  * the plain self-join untouched, with none of the tagging machinery
  * scheduled.
  */
object Banding {

  /** Default per-(band, key) population cap. Above it a bucket switches
    * from all-pairs (pop²/2 candidates) to star pairing (pop − 1). A
    * genuine boilerplate cluster this size is already fully chained
    * through its anchor; a RANDOM band collision this populated carries
    * no signal at all (the per-band collision probability of true
    * near-dups is what banding tunes, and 256 unrelated docs agreeing
    * on one band key is a degenerate key, not a near-dup signal).
    */
  val DefaultMaxBandPop: Int = 256

  /** Default cap for a banding geometry of `bits` total signature bits
    * in `bands` bands — the enforcement of the object docstring's
    * recall caveat, not just its documentation. Band keys of ≤ 8 bits
    * (≤ 256 distinct values per band, e.g. the 32-bit/4-band SimHash
    * geometry) make 256-doc RANDOM key agreements routine at corpus
    * scale, exactly the degenerate-bucket shape where anchor/star
    * pairing drops true near-dup pairs — so the default there is
    * `None` (uncapped; the caller can still pass an explicit cap).
    * Wider keys keep [[DefaultMaxBandPop]]: a random 256-doc agreement
    * on a 16-bit-plus key carries no near-dup signal. Degenerate
    * `bands`/`bits` combinations fall through to the capped default —
    * the operators' own `require`s reject them before any plan runs.
    */
  def defaultCapFor(bits: Int, bands: Int): Option[Int] =
    if (bands >= 1 && bits >= bands && bits / bands <= 8) None
    else Some(DefaultMaxBandPop)

  /** Some(hazard message) exactly when [[defaultCapFor]] resolves
    * `bits`/`bands` to the uncapped default — the scale warning that
    * keeps the short-key recall trade from being a silent O(N²) at
    * corpus scale: an uncapped self-join over k-bit band keys has
    * expected bucket population N/2^k, i.e. O(N²/2^k) candidate pairs
    * from random agreements alone. None for geometries whose default
    * keeps the population cap.
    */
  def shortKeyHazard(bits: Int, bands: Int): Option[String] =
    defaultCapFor(bits, bands) match {
      case None =>
        val keyBits = bits / bands
        Some(s"banding geometry $bits bits / $bands bands has $keyBits-bit " +
          s"band keys (${1L << keyBits} distinct values per band): the " +
          "resolved DEFAULT is uncapped, because random full-bucket " +
          "agreements are routine at this key width and anchor/star " +
          "pairing over mostly-unrelated buckets drops true near-dup " +
          "pairs. At corpus scale the uncapped bucket self-join emits " +
          s"O(N^2/2^$keyBits) candidate pairs from random agreements " +
          "alone — a scale-killer. Prefer a wider geometry (e.g. 64 " +
          "bits / 4 bands), or pass an explicit maxBandPop to accept " +
          "the recall trade, or an explicit None to silence this warning.")
      case Some(_) => None
    }

  /** [[defaultCapFor]] with the uncapped resolution made LOUD — the
    * operators' `maxBandPop = null` sites resolve through here, so a
    * short-key geometry left on its default logs the O(N²/2^keyBits)
    * hazard instead of burying it in a docstring. An EXPLICIT
    * Some/None from the caller never reaches this path.
    *
    * BEHAVIOR CHANGE (round 18): before the geometry gate existed,
    * every defaulted caller got `Some(DefaultMaxBandPop)` — short-key
    * geometries (the SRP 12×8 and SimHash-32 defaults included) now
    * resolve to UNCAPPED. A deployment that relied on the old implicit
    * cap to bound a boilerplate-heavy corpus must pass
    * `maxBandPop = Some(...)` explicitly; the warning this function
    * logs is the migration breadcrumb, not the fence.
    */
  def resolveDefaultCap(bits: Int, bands: Int): Option[Int] = {
    shortKeyHazard(bits, bands).foreach(m =>
      org.slf4j.LoggerFactory.getLogger(Banding.getClass).warn(m))
    defaultCapFor(bits, bands)
  }

  /** Distinct candidate pairs (`id_a` < `id_b`) from `(idCol, band,
    * key)` bucket rows — the banding self-join, population-capped when
    * `maxBandPop` is set. Pass `None` for the exact uncapped join
    * (what the oracle queries pin, so engine parity holds at any
    * fixture SF) — or when the geometry risks degenerate keys, where
    * the cap costs recall (see the object docstring's caveat).
    */
  def selfPairs(
      buckets: DataFrame,
      idCol: String,
      maxBandPop: Option[Int]): DataFrame = {
    def pairsOf(b: DataFrame): DataFrame =
      b.as("a").join(b.as("b"), Seq("band", "key"))
        .filter(col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    maxBandPop match {
      case None => pairsOf(buckets).distinct()
      case Some(cap) =>
        require(cap >= 2, s"maxBandPop must be >= 2, got $cap")
        // plan-audit passthrough: show the common no-skew plan without
        // running the probe action mid-explain
        if (Caching.passthrough) return pairsOf(buckets).distinct()
        // population + anchor per bucket: map-side-combinable, never a
        // window (the over-populated bucket is exactly the case where a
        // window would buffer one giant partition). Cached because both
        // the adaptive probe and the heavy-path tagged join read it —
        // but NOT Caching.withCached: the common no-skew branch must
        // return its pair plan LAZILY (streamed straight into the
        // caller's verify join, as the pre-guard code did), not an
        // eagerly checkpointed candidate materialization; only the
        // heavy branch — whose capped output is linear by construction —
        // materializes, so stats can be unpersisted on exit either way.
        val stats = buckets.groupBy("band", "key")
          .agg(count(lit(1)).as("pop"), min(col(idCol)).as("anchor"))
        stats.cache()
        try {
          val anyHeavy = stats.filter(col("pop") > cap).limit(1).count() > 0
          if (!anyHeavy) pairsOf(buckets).distinct() // lazy; no stats ref
          else {
            val tagged = buckets.join(stats, Seq("band", "key"))
            val light = pairsOf(tagged.filter(col("pop") <= cap)
              .select(col(idCol), col("band"), col("key")))
            // anchor = bucket min id, so id_a < id_b holds by construction
            val star = tagged
              .filter(col("pop") > cap && col(idCol) =!= col("anchor"))
              .select(col("anchor").as("id_a"), col(idCol).as("id_b"))
            // linear-bounded by construction; reliable when the job
            // set Caching.reliableDir (executor-loss survivable)
            Caching.materialize(light.unionByName(star).distinct())
          }
        } finally stats.unpersist(blocking = false)
    }
  }
}
