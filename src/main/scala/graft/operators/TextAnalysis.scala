package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextHash

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * `documents(doc_id, text, …)` table.
  *
  * All per-document: pure projections over the scan — no shuffle, fully
  * inside whole-stage codegen, embarrassingly parallel at any scale. The
  * only wide operation any caller might add is a ranking/filter afterwards.
  */
object TextAnalysis {

  /** Language marker words (tiny stopword lexicons; the n-gram-free
    * heuristic variant of language ID — deterministic and cheap enough to
    * run inline in a scan).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "dans"))

  private def markerScore(toks: String, words: Seq[String]): Column =
    expr(s"size(filter($toks, t -> t in (${words.map("'" + _ + "'").mkString(",")})))")

  /** doc_id + tokenized text, the shared first stage. */
  def withTokens(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("toks", TextHash.tokens(col(textCol)))

  /** Quality scoring: length / token shape / stopword / charset ratios.
    * Ratios are rounded to 6 decimals (cross-engine float stability).
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = withTokens(docs, textCol)
    val nToks = size(col("toks"))
    val sumLen = expr("aggregate(toks, 0L, (s, t) -> s + length(t))")
    val nDigits = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[0-9]", ""))
    val nPunct = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[^a-zA-Z0-9\\s]", ""))
    d.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars_calc"),
      nToks.as("n_tokens"),
      round(sumLen.cast(DoubleType) / nToks, 6).as("avg_token_len"),
      round(size(array_distinct(col("toks"))).cast(DoubleType) / nToks, 6)
        .as("uniq_token_ratio"),
      round(markerScore("toks", langMarkers.head._2).cast(DoubleType) / nToks, 6)
        .as("stopword_ratio"),
      round(nDigits.cast(DoubleType) / length(col(textCol)), 6).as("digit_ratio"),
      round(nPunct.cast(DoubleType) / length(col(textCol)), 6).as("punct_ratio"))
  }

  /** Marker-lexicon language ID with a fixed deterministic tie-break
    * (first language in [[langMarkers]] order wins ties).
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = withTokens(docs, textCol)
    val scored = langMarkers.foldLeft(d) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang", markerScore("toks", words))
    }
    val langs = langMarkers.map(_._1)
    // lang_i wins if its score >= every later language's score
    val pick = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val beats = langs.drop(i + 1)
          .map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _)
        when(beats, lit(lang)).otherwise(elseCol)
    }
    scored.select(
      (col("doc_id") +: langs.map(l => col(s"score_$l"))) :+
        pick.as("lang_pred"): _*)
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other-glyphs).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = withTokens(docs, textCol)
    val bpeish = expr(
      s"size(regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))")
    d.select(
      col("doc_id"),
      size(col("toks")).as("ws_tokens"),
      bpeish.as("bpeish_tokens"),
      round(length(col(textCol)).cast(DoubleType) / size(col("toks")), 6)
        .as("chars_per_token"))
  }

  /** Deterministic stratified sampling — the data-mixing step of a
    * training recipe: keep a row iff its id-hash's unit-interval value
    * falls under its stratum's rate. Hash-based, no RNG: the sample is
    * reproducible across runs, engines, executors, and cluster sizes
    * (a `rand()`-based sample is none of those), and a stratum's
    * sample is a SUBSET of any higher-rate sample of the same stratum,
    * so mixing weights can be tuned without resampling churn. Pure
    * narrow filter — no shuffle at any scale.
    */
  def stratifiedSample(
      rows: DataFrame,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      idCol: String = "doc_id"): DataFrame = {
    val P = TextHash.P
    val u = (((col(idCol) % P) * lit(2654435761L)) % P).cast(DoubleType) / P
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((stratum, r), els) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(els)
    }
    rows.filter(u < rate)
  }

  /** Sequence-packing plan — pretraining's concat-and-chunk step: lay
    * the corpus out as one token stream in doc_id order and cut it into
    * fixed `ctxTokens` context windows; each document learns its global
    * token offset and the first/last chunk it lands in.
    *
    * The global running sum is computed SCALABLY, not with a
    * single-partition window: range-partition + sort by doc_id, one
    * pass collecting per-partition token totals (one long per partition
    * to the driver), prefix those into partition offsets, then a second
    * per-partition pass assigns exact global offsets. This is the
    * standard two-pass distributed prefix sum — the one place the
    * engine drops to RDD `mapPartitionsWithIndex`, because a running
    * total over a global order is genuinely per-partition imperative
    * logic (`Window.orderBy` without partitioning moves the corpus to
    * ONE task). Output is independent of the partition count: only the
    * doc_id order defines the stream.
    */
  def packPlan(
      docs: DataFrame,
      ctxTokens: Int = 2048,
      textCol: String = "text"): DataFrame = {
    require(ctxTokens > 0, "ctxTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = withTokens(docs, textCol)
      .select(col("doc_id").cast("long"), size(col("toks")).cast("long"))
      .as[(Long, Long)]
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = toks.repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
    val perPartition = ranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = perPartition.scanLeft(0L)(_ + _)
    val ctx = ctxTokens.toLong
    val out = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { case (id, n) =>
        val start = run
        run += n
        (id, n, start, start / ctx, (start + math.max(n, 1L) - 1L) / ctx)
      }
    }
    spark.createDataset(out)
      .toDF("doc_id", "n_tok", "start_offset", "start_chunk", "end_chunk")
  }

  /** Document fingerprinting: full-text polynomial rolling hash plus the
    * minimum 3-gram shingle hash (a 1-element winnowing sketch — at scale
    * the natural clustering / shard-routing key for near-dup detection).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("shh", graft.functions.ShingleHashes(col(textCol), 3))
      .select(
        col("doc_id"),
        graft.functions.PolyHash(col(textCol)).as("text_hash"),
        when(size(col("shh")) > 0, array_min(col("shh"))).as("min_shingle_hash"),
        size(col("shh")).as("n_shingles"))
}
