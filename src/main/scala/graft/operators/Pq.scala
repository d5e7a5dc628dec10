package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PqAdc, PqEncode, PqLut}

/** IVF-PQ: a COMPACT standalone ANN index artifact over an embedding
  * corpus — the compression point past IVF-SQ8 on the same curve.
  *
  * The index at `path` is its own small table, derived data like the
  * minhash index (lose it, rebuild it from the corpus):
  *
  *  - one `centroid_id=c<id>/` directory per coarse IVF centroid (the
  *    SAME deterministic assignment as [[Similarity.writeIvfPartitioned]],
  *    so a probe routes with the identical algebra and prunes to
  *    `nprobe / centroidK` of the index before a file is listed);
  *  - rows of `(id, pq, nrm)` where `pq` is `m` bytes — the vector
  *    quantized to one codeword per subspace ([[graft.functions.PqEncode]]).
  *    At dim = 64 and m = 8 that is 8 bytes of codes + 8 of norm per
  *    vector vs 512 for the `array<double>` vec column (~24 B/row with
  *    the id): the candidate stage of a probe scans ~5% of even the
  *    SQ8 layout's q8 width, and ~1.5% of the float corpus width;
  *  - `_centroids` (routing sidecar, [[Similarity]] conventions) and
  *    `_meta` (m, k, dim, the flat codebook) — the index is
  *    self-describing, a probe needs nothing but `path` + the corpus.
  *
  * The codebook is `k` SAMPLE VECTORS chosen by the same deterministic
  * multiplicative-id-hash order as [[Similarity.ivfCentroids]] (so a
  * DuckDB oracle re-derives it with a window sample); subspace j's
  * codeword c is sample c's own slice. A trained (k-means-per-subspace)
  * codebook would edge out the sample on recall, but determinism is
  * what makes the whole path hash-verifiable cross-engine, and the
  * recall knobs (`nprobe`, `rerank`) dominate the difference.
  *
  * Probe = the q68 two-stage shape ([[Similarity.ivfKnnQuantized]]):
  * route queries against the sidecar, scan ONLY the probed partitions'
  * codes, score by ADC — `m` table lookups per candidate against a
  * per-query LUT ([[graft.functions.PqLut]]), cheaper than any dot —
  * keep the top-`rerank`, then rerank those exactly against the SOURCE
  * corpus (the index carries no vectors; the corpus read is an id `IN`
  * pushdown in serving mode, a join in offline mode). Same
  * rounding/tie-breaks as every scorer in [[Similarity]], so with
  * exhaustive `rerank` + full `nprobe` the result is row-identical to
  * [[Similarity.bruteForceKnn]].
  *
  * 100 TB framing: the index for a 25B-vector corpus at these defaults
  * is ~600 GB — small enough to live on fast storage and scan at
  * interactive latency with partition pruning, while the corpus itself
  * is touched only for `|queries| * rerank` rows. Scale knobs are the
  * ones the IVF layouts already carry (centroidK for partition count,
  * `filesPerPartition` for write parallelism).
  */
object Pq {

  /** 8 subspaces at dim 64 → dsub = 8, 8-byte codes. */
  val DefaultM: Int = 8

  /** 16 codewords per subspace: 4 bits of entropy per subspace keeps
    * the fixture-scale oracle joins small; raise toward 256 at corpus
    * scale (codes stay one byte per subspace either way).
    */
  val DefaultK: Int = 16

  final case class PqMeta(m: Int, k: Int, dim: Int, codebook: Array[Double])

  /** The deterministic flat codebook AND the coarse-centroid frame,
    * from ONE corpus pass: both samples are prefixes of the same
    * (multiplicative id-hash, id) order — EXACTLY the
    * [[Similarity.ivfCentroids]] algebra — so a single
    * `TakeOrderedAndProject` over `max(k, centroidK)` rows yields the
    * codebook (first `k`, flattened sample-major `cb[c*dim + e]`) and
    * the centroid set (first `centroidK`) without a second corpus
    * scan. Codeword/centroid order is pinned by a driver-side re-sort
    * on the same (hash, id) key, so `c` is stable regardless of
    * collect order; the returned centroid frame is a driver-LOCAL
    * relation (O(centroidK·dim) — the budget the IVF paths already
    * spend), so assignment and the sidecar write never re-derive the
    * sample from the corpus.
    */
  private def codebookAndCentroids(
      all: DataFrame, k: Int, centroidK: Int, idCol: String)
      : (Array[Double], DataFrame) = {
    val p = graft.functions.TextHash.P
    val lim = math.max(k, centroidK)
    val rows = all
      .select(col(idCol).cast("long").as("sid"), col("vec"), col("nrm"))
      .withColumn("chash", (col("sid") % p) * lit(2654435761L) % p)
      .orderBy(col("chash"), col("sid"))
      .limit(lim)
      .select("sid", "chash", "vec", "nrm")
      .collect()
    require(rows.length >= k,
      s"pq codebook needs k=$k sample vectors, corpus has only " +
        s"${rows.length} — a codebook larger than the corpus is " +
        "degenerate; lower k")
    val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    val dim = sorted(0).getSeq[Double](2).length
    val flat = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val v = sorted(c).getSeq[Double](2)
      require(v.length == dim,
        s"pq codebook: mixed dimensions in corpus ($dim vs ${v.length})")
      var i = 0
      while (i < dim) { flat(c * dim + i) = v(i); i += 1 }
      c += 1
    }
    val spark = all.sparkSession
    import spark.implicits._
    val cents = sorted.take(centroidK).toIndexedSeq
      .map(r => (r.getLong(0), r.getSeq[Double](2), r.getDouble(3)))
      .toDF("centroid_id", "cvec", "cnrm")
    (flat, cents)
  }

  /** Build the index at `path` (overwrite): encode every corpus vector
    * and lay the codes out IVF-partitioned with the routing + geometry
    * sidecars. One sample pass + one encode/write pass over the
    * corpus; the write exchanges on the partition key so the index is
    * born settled (one file per dir — `filesPerPartition` is the
    * write-parallelism salt, the [[Similarity.writeIvfPartitioned]]
    * knob). Refuses to overwrite an existing IVF CORPUS layout at
    * `path` — the overwrite is destructive (codes replace vectors,
    * unrecoverable without the corpus), and a layout root is
    * recognizable by its own sidecars; rebuilding a previous PQ index
    * in place stays allowed.
    */
  def writePqIndex(
      emb: DataFrame,
      path: String,
      m: Int = DefaultM,
      k: Int = DefaultK,
      centroidK: Int = Similarity.DefaultCentroidK,
      idCol: String = "vec_id",
      filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition >= 1,
      s"filesPerPartition must be >= 1, got $filesPerPartition")
    val spark = emb.sparkSession
    val fs = Dedup.fsFor(spark, path)
    def existsAt(sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$sub"))
    // the same guard discipline as writeIvfPartitioned, plus the
    // flat-layout case: an IVF layout holds the corpus VECTORS; a
    // static overwrite here would replace them with 8-byte codes.
    // A PQ index is the one layout that carries BOTH sidecars
    // (_centroids + _meta) — that one may be rebuilt in place.
    require(!existsAt("_current"),
      s"$path is a generational IVF layout (a rotation/compaction " +
        "published a _current pointer) — writePqIndex would destroy " +
        "it; build the index at its own path")
    require(!(existsAt("_centroids") && !existsAt("_meta")),
      s"$path is an IVF corpus layout (_centroids sidecar, no PQ " +
        "_meta) — writePqIndex would replace its vectors with codes; " +
        "build the index at its own path")
    val all = Similarity.asDouble(emb, idCol = idCol)
    val (flat, centroids) = codebookAndCentroids(all, k, centroidK, idCol)
    val dim = flat.length / k
    require(dim % m == 0,
      s"pq: dim=$dim not divisible into m=$m subspaces — pick m | dim")
    val cbLit = typedLit(flat.toSeq)
    val rows = Similarity.rankCentroids(all, centroids, 1, idCol)
      .select(col(idCol),
        PqEncode(col("vec"), cbLit, m, k).as("pq"),
        col("nrm"),
        concat(lit("c"), col("centroid_id")).as("centroid_id"))
    (if (filesPerPartition <= 1) rows.repartition(col("centroid_id"))
     else rows.repartition(col("centroid_id"),
       pmod(xxhash64(col(idCol)), lit(filesPerPartition.toLong))))
      .write.partitionBy("centroid_id").mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .parquet(path)
    // sidecars AFTER the main overwrite (which clears the directory);
    // the centroid frame is the driver-local relation the assignment
    // above used, so sidecar and assignment agree by construction
    centroids
      .select(concat(lit("c"), col("centroid_id")).as("centroid_id"),
        col("cvec"), col("cnrm"))
      .write.mode("overwrite").parquet(s"$path/_centroids")
    import spark.implicits._
    Seq((m, k, dim, flat.toSeq)).toDF("m", "k", "dim", "codebook")
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** The index's geometry + codebook, from its `_meta` sidecar. */
  def readPqMeta(spark: SparkSession, path: String): PqMeta = {
    val r = spark.read.parquet(s"$path/_meta").head()
    PqMeta(r.getAs[Int]("m"), r.getAs[Int]("k"), r.getAs[Int]("dim"),
      r.getAs[Seq[Double]]("codebook").toArray)
  }

  /** ANN top-k for STORED query ids over a [[writePqIndex]] index +
    * its source corpus. `rerank` = 0 means the 4·k default; with
    * `rerank` covering the probed population and `nprobe = centroidK`
    * the result is row-identical to [[Similarity.bruteForceKnn]].
    * `collectShortlist` as in [[Similarity.ivfKnnQuantized]]: `true`
    * (serving) collects the |queries|·rerank shortlist into an id `IN`
    * pushdown for the corpus rerank read; `false` (offline batch)
    * keeps it a DataFrame and reranks via joins — no driver state
    * proportional to the query batch. Both modes are row-identical
    * (spec-pinned, like the SQ8 pair).
    */
  def pqKnn(
      spark: SparkSession,
      indexPath: String,
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      nprobe: Int = 1,
      rerank: Int = 0,
      idCol: String = "vec_id",
      collectShortlist: Boolean = true): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(rerank == 0 || rerank >= k,
      s"rerank must be 0 (the 4*k default) or >= k, got rerank=$rerank k=$k")
    val rerankM = if (rerank == 0) 4 * k else rerank
    val meta = readPqMeta(spark, indexPath)
    val all = Similarity.asDouble(emb, idCol = idCol)
    val queries = all.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col("vec").as("vec_q"),
        col("nrm").as("nrm_q"))
    val probes = Similarity.rankRoutes(spark, indexPath, queries, nprobe,
      Seq("query_id", "centroid_id", "vec_q", "nrm_q"))
    pqTopK(spark, indexPath, all, probes, meta, k, rerankM, idCol,
      excludeSelf = true, collectShortlist = collectShortlist)
  }

  /** The serving twin for EXTERNAL query vectors (`queryIdCol` +
    * `embedding`): no self-exclusion — external ids are their own
    * namespace ([[Similarity.bruteForceKnnWith]] semantics); queries
    * are routed by centroid RANKING against the sidecar and their LUTs
    * are built on the fly, so the index never needs to have seen them.
    */
  def pqKnnWith(
      spark: SparkSession,
      indexPath: String,
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 1,
      rerank: Int = 0,
      idCol: String = "vec_id",
      queryIdCol: String = "query_id",
      collectShortlist: Boolean = true): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(rerank == 0 || rerank >= k,
      s"rerank must be 0 (the 4*k default) or >= k, got rerank=$rerank k=$k")
    val rerankM = if (rerank == 0) 4 * k else rerank
    val meta = readPqMeta(spark, indexPath)
    val all = Similarity.asDouble(emb, idCol = idCol)
    val q = Similarity.asDouble(queries, idCol = queryIdCol)
      .select(col(queryIdCol).as("query_id"), col("vec").as("vec_q"),
        col("nrm").as("nrm_q"))
    val probes = Similarity.rankRoutes(spark, indexPath, q, nprobe,
      Seq("query_id", "centroid_id", "vec_q", "nrm_q"))
    pqTopK(spark, indexPath, all, probes, meta, k, rerankM, idCol,
      excludeSelf = false, collectShortlist = collectShortlist)
  }

  /** STAGE 1 of the PQ probe: the codes-only candidate frame over the
    * probed index partitions — the scan whose ReadSchema must carry
    * `pq`/`nrm` and can never read a vector column (the index has
    * none: that pruning is structural, not an optimizer favor).
    * Package-private so the probes and the spec share one definition.
    */
  private[operators] def pqCandidates(
      index: DataFrame,
      probes: DataFrame,
      meta: PqMeta,
      probed: Seq[String],
      idCol: String,
      excludeSelf: Boolean,
      broadcastProbes: Boolean): DataFrame = {
    val cbLit = typedLit(meta.codebook.toSeq)
    // the LUT is computed on the (tiny) probe side — k*dim multiplies
    // per query, built on the DISTINCT query set and joined back onto
    // the per-(query, centroid) probe rows so nprobe > 1 neither
    // recomputes nor ships nprobe copies of a query's m*k-double
    // table — and rides into the candidate join; each candidate row
    // then costs m lookups + adds (PqAdc), not a dot product
    val qluts = probes.select("query_id", "vec_q", "nrm_q").distinct()
      .withColumn("lut", PqLut(col("vec_q"), cbLit, meta.m, meta.k))
      .select("query_id", "lut", "nrm_q")
    val probesLut = probes.select("query_id", "centroid_id")
      .join(qluts, Seq("query_id"))
      .select("query_id", "centroid_id", "lut", "nrm_q")
    val cand = index
      .filter(col("centroid_id").isInCollection(probed)) // partition prune
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        col("pq"), col("nrm").as("nrm_n"))
      .join(if (broadcastProbes) broadcast(probesLut) else probesLut,
        Seq("centroid_id"))
    (if (excludeSelf) cand.filter(col("neighbor_id") =!= col("query_id"))
     else cand)
      .withColumn("qsim",
        round(PqAdc(col("pq"), col("lut"), meta.k) /
          (col("nrm_q") * col("nrm_n")), 6))
  }

  /** Shared two-stage scoring behind [[pqKnn]]/[[pqKnnWith]] — the
    * [[Similarity]] sq8TopK shape with the index supplying stage 1 and
    * the SOURCE CORPUS supplying the stage-2 exact rerank (the index
    * carries no vectors, so unlike SQ8 the exact read crosses back to
    * the corpus frame — unfiltered by centroid, filtered by candidate
    * ids in collected mode). Stage 2 itself is
    * [[Similarity.rerankExact]] — one definition with the SQ8 probes.
    *
    * `topK`/`rerankM` are the RANKING knobs (final k, shortlist
    * budget); the PQ GEOMETRY m/k (subspaces, codewords) lives only in
    * `meta` — the names differ on purpose, the four quantities coexist
    * here.
    */
  private def pqTopK(
      spark: SparkSession,
      indexPath: String,
      corpus: DataFrame,
      probes: DataFrame,
      meta: PqMeta,
      topK: Int,
      rerankM: Int,
      idCol: String,
      excludeSelf: Boolean,
      collectShortlist: Boolean): DataFrame = {
    Similarity.requireIntegralId(
      probes.schema("query_id").dataType, "query_id", "PQ")
    Similarity.requireIntegralId(corpus.schema(idCol).dataType, idCol, "PQ")
    val index = spark.read.parquet(indexPath)
    Similarity.requireIntegralId(
      index.schema(idCol).dataType, s"index $idCol", "PQ")
    // bounded by the index's centroid count in BOTH modes, never by
    // the query batch
    val probed: Seq[String] = probes.select("centroid_id").distinct()
      .collect().map(_.getString(0)).toSeq
    val wq = Window.partitionBy("query_id")
      .orderBy(col("qsim").desc, col("neighbor_id"))
    val ranked = pqCandidates(index, probes, meta, probed, idCol,
        excludeSelf, broadcastProbes = collectShortlist)
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= rerankM)
    Similarity.rerankExact(spark, ranked, probes, topK, collectShortlist,
      candIds => candIds.fold(corpus)(ids =>
          corpus.filter(col(idCol).isInCollection(ids)))
        .select(col(idCol).cast("long").as("neighbor_id"),
          col("vec").as("vec_n"), col("nrm").as("nrm_n")))
  }
}
