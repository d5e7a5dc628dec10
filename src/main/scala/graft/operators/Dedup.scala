package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextHash

/** Deduplication operators over a `documents(doc_id, text, …)` table.
  *
  * Scale design notes (100 TB framing):
  *  - exact dedup is one hash-shuffle on the digest — the canonical
  *    map-side-combinable groupBy.
  *  - exact n-gram Jaccard NEVER materializes the doc×doc cross product:
  *    it explodes (doc, shingle) pairs and self-joins on the shingle hash,
  *    so only pairs sharing ≥1 shingle (the only ones with Jaccard > 0)
  *    are generated — shuffle keyed on shingle hash. Stop-shingle skew is
  *    handled by dropping shingles above a document-frequency cap (a
  *    shingle shared by thousands of docs carries no dedup signal but
  *    creates a quadratic bucket).
  *  - MinHash LSH is the sublinear path: k permutations → b bands → join
  *    on band key; candidates are then verified exactly.
  *  - SimHash packs a document into one 32-bit signature; banding on 8-bit
  *    chunks gives the candidate join, Hamming distance the verdict.
  *
  * Everything is deterministic (portable polynomial hashes, no RNG) so
  * every operator is DuckDB-oracle-checkable.
  */
object Dedup {

  /** Exact duplicate groups by content digest: digest → keeper (min id) +
    * copy count. One shuffle, partial-aggregated map-side.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("copies"))

  /** doc_id + distinct 3-gram shingle hashes.
    *
    * Repartitioned first: higher-order functions evaluate interpreted (no
    * codegen), so shingling cost is real CPU — a single-file input would
    * otherwise run the whole pipeline in one task. Cached because every
    * pairing operator references the shingle sets from both sides of a
    * self-join, and projection collapse would re-inline (and re-run) the
    * full pipeline once per reference.
    */
  def shingled(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    docs.repartition(col("doc_id"))
      .withColumn("toks", TextHash.tokens(col(textCol)))
      .withColumn("sh", TextHash.shingles("toks", n))
      .withColumn("shh", TextHash.shingleHashes("sh"))
      .select(col("doc_id"), col("shh"))
      .cache()

  /** Default document-frequency cap for candidate-generating shingles.
    * A shingle shared by d documents creates a d²/2-pair join bucket while
    * carrying essentially no dedup signal once d is large — near-duplicate
    * pairs share many shingles, so they are still found through any one of
    * their rarer shared shingles. Capping DF bounds the worst join bucket
    * at cap²/2 pairs regardless of corpus size, which is what makes this
    * operator survive a 100× scale-up.
    */
  val DefaultMaxShingleDf: Int = 128

  /** N-gram Jaccard near-dup pairs (threshold in (0,1]).
    *
    * Candidate generation explodes (doc, shingle-hash) and self-joins on
    * the hash, restricted to shingles whose document frequency is at most
    * `maxShingleDf` (skew guard, on by default). Candidate pairs are then
    * verified with the EXACT Jaccard of the full shingle sets — the cap
    * never changes a reported similarity, it can only drop a pair whose
    * shared shingles are ALL above the cap (a documented approximation;
    * pass None to disable and get fully exact semantics).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      textCol: String = "text",
      n: Int = 3,
      maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    val sh = shingled(docs, textCol, n)
    val exploded = sh.select(col("doc_id"), explode(col("shh")).as("h"))
    val filtered = maxShingleDf match {
      case Some(cap) =>
        val df = exploded.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        exploded.join(df.select("h"), Seq("h"))
      case None => exploded
    }
    val candidates = filtered.as("a").join(filtered.as("b"), Seq("h"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature columns mh0..mh(k-1) over the shingle hash set. */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val cols = (0 until k).map { i =>
      expr(s"array_min(transform(shh, x -> ${TextHash.universalHashSql("x", i)}))")
        .as(s"mh$i")
    }
    sh.select(col("doc_id") +: col("shh") +: cols: _*)
  }

  /** MinHash + LSH banding near-dup pairs, exact-Jaccard-verified.
    *
    * k hashes split into `bands` bands of k/bands rows each; docs sharing
    * any band key become candidates; candidates are verified with the
    * exact Jaccard of their full shingle sets.
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      textCol: String = "text",
      k: Int = 8,
      bands: Int = 4): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val sh = shingled(docs, textCol).filter(size(col("shh")) > 0)
    val sig = minhashSignatures(sh, k).cache()
    // band key: fold the band's minhashes into one 64-bit value (each
    // minhash < P = 1e9+7, so key = mh*P + mh' stays within Long range
    // for rows <= 2)
    require(rows <= 2, "band key packing supports bands of <= 2 rows")
    val bandKeys = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => s"mh${b * rows + r}")
      val key = parts.reduce((a, c) => s"($a * ${TextHash.P} + $c)")
      struct(lit(b).as("band"), expr(key).as("key"))
    }
    val buckets = sig.select(col("doc_id"),
        explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val candidates = buckets.as("a").join(buckets.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shh").as("sh_b")), Seq("doc_b"))
    withSets
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 32-bit SimHash of the distinct 3-gram shingle-hash set. Shingles,
    * not unigram tokens: with a small vocabulary nearly all documents
    * share most tokens, collapsing unigram SimHashes together; 3-gram
    * features keep the signature discriminative.
    */
  def simhashed(docs: DataFrame, textCol: String = "text", bits: Int = 32): DataFrame = {
    val d = shingled(docs, textCol)
    // (cached by shingled(); the 32 bit-majority folds below are the only
    // per-doc work left)
    // bit j set iff the majority of shingle hashes have bit-hash_j odd:
    // sum over shingles of (2*((a_j*x+b_j mod P) mod 2) - 1) > 0
    val bitTerms = (0 until bits).map { j =>
      val bitOf = s"((${TextHash.universalHashSql("x", j)}) % 2)"
      s"(CASE WHEN aggregate(shh, 0L, (s, x) -> s + (2 * $bitOf - 1)) > 0 " +
        s"THEN ${1L << j}L ELSE 0L END)"
    }
    d.select(col("doc_id"),
      expr(bitTerms.mkString("(", " + ", ")")).as("simhash"))
  }

  /** SimHash near-dup pairs: 8-bit band blocking, then Hamming <= max. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int,
      textCol: String = "text"): DataFrame = {
    val sig = simhashed(docs, textCol).cache()
    val bandKeys = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("key")))
    val buckets = sig.select(col("doc_id"), col("simhash"),
        explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    buckets.as("a").join(buckets.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
