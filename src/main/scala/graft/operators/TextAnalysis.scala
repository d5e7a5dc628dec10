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

  /** doc_id + tokenized text, the shared first stage for operators that
    * need the token STRINGS (vocab, perplexity, packing reference
    * formulations); the quality/langid family reads the fused
    * [[graft.functions.TokenStats]] / [[graft.functions.MarkerCount]]
    * expressions instead and never materializes a token array.
    */
  def withTokens(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("toks", TextHash.tokens(col(textCol)))

  /** Quality scoring: length / token shape / stopword / charset ratios.
    * Ratios are rounded to 6 decimals (cross-engine float stability).
    * Token statistics come from ONE compiled pass (`TokenStats` — the
    * split/aggregate/array_distinct lambda pipeline it fuses measured
    * interpreted, like every HOF); the two charset ratios stay builtin
    * regexp (codegen'd).
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = docs.withColumn("ts", graft.functions.TokenStats(col(textCol)))
    val nToks = col("ts.n_tokens")
    val sumLen = col("ts.sum_len")
    val nDigits = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[0-9]", ""))
    val nPunct = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[^a-zA-Z0-9\\s]", ""))
    d.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars_calc"),
      nToks.as("n_tokens"),
      round(sumLen.cast(DoubleType) / nToks, 6).as("avg_token_len"),
      round(col("ts.n_distinct").cast(DoubleType) / nToks, 6)
        .as("uniq_token_ratio"),
      round(graft.functions.MarkerCount(col(textCol), langMarkers.head._2)
        .cast(DoubleType) / nToks, 6).as("stopword_ratio"),
      round(nDigits.cast(DoubleType) / length(col(textCol)), 6).as("digit_ratio"),
      round(nPunct.cast(DoubleType) / length(col(textCol)), 6).as("punct_ratio"))
  }

  /** Marker-lexicon language ID with a fixed deterministic tie-break
    * (first language in [[langMarkers]] order wins ties).
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // ONE tokenization pass probes all four lexicons (MarkerCounts);
    // per-lexicon MarkerCount columns would re-split the text per lang
    val withCounts = docs.withColumn("mcs",
      graft.functions.MarkerCounts(col(textCol), langMarkers.map(_._2)))
    val scored = langMarkers.map(_._1).zipWithIndex
      .foldLeft(withCounts) { case (df, (lang, i)) =>
        df.withColumn(s"score_$lang", element_at(col("mcs"), i + 1))
      }
    val langs = langMarkers.map(_._1)
    // lang_i wins if its score >= every later language's score
    val pick0 = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val beats = langs.drop(i + 1)
          .map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _)
        when(beats, lit(lang)).otherwise(elseCol)
    }
    // a NULL document predicts NULL: with all scores null every
    // when() condition is skipped and the bare chain would fall
    // through to the LAST language — an artifact of lexicon ordering
    // masquerading as a prediction (and sampled under that stratum's
    // rate downstream). Scores are null iff the text is (MarkerCounts
    // propagates null; an EMPTY text scores 0s and still ties to the
    // documented first language).
    val pick = when(col(s"score_${langs.head}").isNull,
      lit(null).cast("string")).otherwise(pick0)
    scored.select(
      (col("doc_id") +: langs.map(l => col(s"score_$l"))) :+
        pick.as("lang_pred"): _*)
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other-glyphs).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nToks = graft.functions.TokenStats(col(textCol)).getField("n_tokens")
    // programmatic form (the piiScan formulation), not a raw SQL
    // splice of textCol — a column name needing quoting would fail to
    // parse or bind the wrong expression
    val bpeish = size(regexp_extract_all(col(textCol),
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
    docs.select(
      col("doc_id"),
      nToks.as("ws_tokens"),
      bpeish.as("bpeish_tokens"),
      round(length(col(textCol)).cast(DoubleType) / nToks, 6)
        .as("chars_per_token"))
  }

  /** PII patterns, portable between Java regex (Spark) and RE2 (DuckDB):
    * no backreferences, no lookaround — just classes, bounded repeats,
    * non-capturing groups, and `\b`. Redaction applies them IN THIS
    * ORDER (emails first, so a numeric mail domain can't be half-eaten
    * by the IPv4 rule).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** PII detection + redaction — the scrubbing pass of a training-data
    * pipeline: per-category match counts (on the ORIGINAL text, so
    * categories count independently) and the text with all categories
    * redacted sequentially. Pure per-row regex projections — no shuffle,
    * no UDFs, linear at any scale. Pattern-based detection is a
    * PRECISION tool (it finds formatted identifiers, not free-text
    * names); recall-critical deployments layer an NER model on top via
    * the multimodal-style batched boundary.
    */
  def piiScan(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .cast("long").as(s"n_$name")
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    docs.select(col("doc_id") +: counts :+ redacted.as("redacted"): _*)
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
    // pmod at BOTH stages: Spark's % keeps the dividend's sign, so a
    // negative id (a signed upstream hash) would map to u < 0 and be
    // kept at EVERY rate — even a rate-0.0 stratum — silently
    // overshooting its stratum in any derived mixture. Identical
    // values for nonnegative ids, so the oracle mirror's kept sets
    // are unchanged on the fixtures.
    val u = pmod(pmod(col(idCol), lit(P)) * lit(2654435761L), lit(P))
      .cast(DoubleType) / P
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((stratum, r), els) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(els)
    }
    rows.filter(u < rate)
  }

  /** Data mixing to a TARGET distribution — the step above
    * [[stratifiedSample]] in a training recipe: given mixture weights
    * per stratum (e.g. 50% en / 25% es / 25% zh), find the largest
    * total corpus achievable WITHOUT upsampling any stratum, derive the
    * per-stratum keep rates that hit the weights exactly, and apply the
    * deterministic hash sample. Rows in strata without a weight are
    * dropped (they're not in the recipe).
    *
    * The only driver-side data is one count per stratum (O(|strata|),
    * from a map-side-combined count — bounded at any corpus size). Rate
    * arithmetic is plain IEEE double in a FIXED operation order
    * (documented in the oracle SQL mirror), so the kept set is
    * reproducible across engines and cluster sizes like every other
    * hash sample here.
    *
    * A weighted stratum with ZERO rows fails loudly by default: the
    * largest corpus honoring such a recipe is empty, and silently
    * renormalizing over the strata that exist would train on a mixture
    * arbitrarily far from the declared one. Pass
    * `renormalizeMissing = true` to opt into exactly that renormalized
    * behavior when a best-effort mix over available strata is what's
    * wanted.
    */
  def mixToTarget(
      rows: DataFrame,
      strataCol: String,
      weights: Map[String, Double],
      idCol: String = "doc_id",
      renormalizeMissing: Boolean = false): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wsum = weights.values.sum
    val named = rows.filter(col(strataCol).isInCollection(weights.keys.toSeq))
    // toString, not getString: weights are keyed by String but the
    // strata column may be any type isInCollection coerces (an int
    // source id) — getString would ClassCastException at the driver
    val counts = named.groupBy(strataCol).agg(count(lit(1)).as("c"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val missing = weights.keys.filter(s => counts.getOrElse(s, 0L) == 0L)
    if (missing.nonEmpty && !renormalizeMissing)
      throw new IllegalArgumentException(
        s"mixToTarget: weighted strata with no rows: ${missing.toSeq.sorted
          .mkString(", ")} — the recipe is unsatisfiable without " +
          "upsampling (pass renormalizeMissing = true to mix over the " +
          "strata that exist instead)")
    // total = min over strata of c_s / w_s  (the stratum that runs out
    // first caps the recipe); rate_s = w_s * total / c_s  — identical
    // op order to the SQL mirror so the doubles match bit-for-bit
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) named.limit(0)
    else {
      val total = present.map { case (s, w) => counts(s).toDouble / (w / wsum) }.min
      val rates = present.map { case (s, w) =>
        s -> math.min(1.0, w / wsum * total / counts(s).toDouble)
      }
      stratifiedSample(named, strataCol, rates, defaultRate = 0.0, idCol)
    }
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
    val toks = docs
      .select(col("doc_id").cast("long"),
        graft.functions.TokenStats(col(textCol)).getField("n_tokens")
          .as("n_tokens"))
      // a null text (or null id) carries no tokens to lay out: drop it
      // here like perplexity's explode does, instead of crashing the
      // whole pack job on the non-nullable tuple encoder — the one
      // sibling that used to die on the nulls every other operator
      // passes through
      .filter(col("doc_id").isNotNull && col("n_tokens").isNotNull)
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

  /** Repetition-based quality stats (the Gopher / MassiveText filter
    * family): per document and per n-gram size, the fraction of n-gram
    * occurrences taken by the single most frequent n-gram
    * (`top{n}gram_frac`) and the fraction of occurrences whose n-gram
    * appears more than once (`dup{n}gram_frac`). Repetitious documents
    * (boilerplate, keyword stuffing, degenerate generations) score high
    * and get filtered; `quality`'s `uniq_token_ratio` is the n=1
    * analogue.
    *
    * Scale shape: n-grams are hashed to longs INSIDE the scan by the
    * fused codegen `ShingleHashes(…, distinct = false)` pass (one
    * compiled loop; the interpreted `transform`+`PolyHash`-per-gram
    * formulation measured ~20× slower and was the whole query's cost),
    * exploded, and counted with two map-side-combinable aggregations;
    * only (doc_id, hash, count) longs ever cross a shuffle, exactly the
    * q21 discipline. Docs shorter than n tokens have no n-grams:
    * total 0, fractions 0.0.
    */
  def repetition(
      docs: DataFrame,
      ns: Seq[Int] = Seq(2, 3),
      textCol: String = "text"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    require(ns.distinct.length == ns.length,
      s"ns must be distinct (got ${ns.mkString(", ")}) — duplicate n " +
        "values would emit duplicate ngrams$n columns and an " +
        "ambiguous join chain")
    val perN = ns.map { n =>
      val grams = docs.select(
        col("doc_id"),
        graft.functions.ShingleHashes(col(textCol), n, distinct = false)
          .as("gh"))
      val counts = grams
        .select(col("doc_id"), explode(col("gh")).as("h"))
        .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      counts.groupBy("doc_id").agg(
        sum("c").as(s"ngrams$n"),
        round(max("c").cast(DoubleType) / sum("c"), 6).as(s"top${n}gram_frac"),
        round(
          sum(when(col("c") > 1, col("c")).otherwise(0L)).cast(DoubleType) /
            sum("c"), 6).as(s"dup${n}gram_frac"))
    }
    val base = docs.select(col("doc_id"))
    perN.foldLeft(base)((acc, s) => acc.join(s, Seq("doc_id"), "left"))
      .select(
        col("doc_id") +:
          ns.flatMap(n => Seq(
            coalesce(col(s"ngrams$n"), lit(0L)).as(s"ngrams$n"),
            coalesce(col(s"top${n}gram_frac"), lit(0.0)).as(s"top${n}gram_frac"),
            coalesce(col(s"dup${n}gram_frac"), lit(0.0)).as(s"dup${n}gram_frac"))): _*)
  }

  /** Overlapping fixed-width token chunking — the RAG/retrieval-side
    * sibling of [[packPlan]] (which concatenates ACROSS documents for
    * pretraining; this windows WITHIN each document for indexing):
    * chunk i of a document covers tokens `[i·stride, i·stride + width)`,
    * the last chunk may run short, and a doc never emits more chunks
    * than needed to cover its tail. Emits the chunk's token span and a
    * portable content hash (what an embedding/index stage keys on).
    *
    * Pure per-row explode — chunk counts are derived arithmetically, so
    * the plan is one `Generate` over the scan with no shuffle; output
    * size is corpus tokens × (width/stride) overlap factor.
    */
  def chunkPlan(
      docs: DataFrame,
      width: Int = 128,
      stride: Int = 96,
      textCol: String = "text"): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width], got $stride (width $width)")
    val d = withTokens(docs, textCol)
      .withColumn("n_tok_doc", size(col("toks")))
      // ((n - width + stride - 1) / stride) + 1 extra chunks past the
      // first, all integer arithmetic (identical in any engine)
      .withColumn("n_chunks",
        when(col("n_tok_doc") <= width, lit(1))
          .otherwise(((col("n_tok_doc") - width + stride - 1) / stride)
            .cast("int") + 1))
    d.select(
        col("doc_id"), col("toks"), col("n_tok_doc"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(width), col("n_tok_doc") - col("start_tok")).cast("long")
          .as("n_tok"),
        graft.functions.PolyHash(
          concat_ws(" ", expr(s"slice(toks, start_tok + 1, $width)")))
          .as("chunk_hash"))
  }

  /** Corpus vocabulary statistics: per token, document frequency (docs
    * containing it) and collection frequency (total occurrences) — the
    * df table behind stop-shingle caps, idf weighting, tokenizer vocab
    * sizing, and Heaps'-law corpus diagnostics.
    *
    * One explode + two map-side-combinable aggregations (the classic
    * wordcount shuffle shape, keyed on the token). The result is
    * vocabulary-sized — Heaps' law keeps it far below corpus size — and
    * `minDf` prunes the hapax tail early when only the head matters.
    */
  def vocabStats(
      docs: DataFrame,
      minDf: Long = 1L,
      textCol: String = "text"): DataFrame =
    withTokens(docs, textCol)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("n"))
      .groupBy("token").agg(
        count(lit(1)).as("df"),
        sum("n").as("cf"))
      .filter(col("df") >= minDf)

  /** Model frames up to this many rows join back to the corpus as an
    * EXPLICIT broadcast (a token/bigram + two longs per row — ~tens of
    * MB at the limit), never a shuffle on the raw token key, where Zipf
    * heads ("the" alone is percent-scale of any corpus) would put whole
    * percent of the data in one task.
    */
  val DefaultBroadcastVocabLimit: Long = 1L << 20

  /** Head/tail split for models too big to broadcast: keys with count >
    * total/divisor are the head — there are PROVABLY fewer than
    * `divisor` of them, so the head sub-model always broadcasts — and
    * the remaining tail's per-key share of the corpus is bounded by
    * 1/divisor, so its shuffle cannot skew.
    */
  val DefaultHeadDfDivisor: Long = 1L << 16

  /** Join `rows` to a count-keyed `model` with an explicit skew policy:
    * broadcast the whole model when it fits; otherwise broadcast the
    * (bounded) Zipf head and shuffle only the skew-bounded tail — head
    * rows are removed from the shuffle input by a broadcast anti-join,
    * so the giant keys never cross the wire at all. Exact in both
    * branches: every row matches in exactly one of head/tail.
    *
    * The split branch deliberately consumes `rows` twice (head join +
    * tail join): `rows` is the corpus-scale exploded frame, and caching
    * it to save the second pass would spill corpus-sized state to disk —
    * a rescan of a narrow scan-side projection is the cheaper side of
    * that trade at every scale this branch runs at.
    */
  private def skewGuardedModelJoin(
      rows: DataFrame,
      model: DataFrame,
      keys: Seq[String],
      countCol: String,
      modelRows: Long,
      totalCount: Long,
      broadcastLimit: Long,
      headDivisor: Long): DataFrame =
    if (modelRows <= broadcastLimit) rows.join(broadcast(model), keys)
    else {
      // the "provably < headDivisor head keys" bound needs cap >= 1 to
      // come from the division itself: a divisor beyond the corpus total
      // would floor to cap 1 and sweep every repeated key into the
      // "head" — unbounded, force-broadcast. Reject the misuse loudly.
      require(headDivisor >= 1 && headDivisor <= math.max(totalCount, 1L),
        s"headDfDivisor must be in [1, total count $totalCount], got " +
          s"$headDivisor — a larger divisor would make the broadcast head " +
          "unbounded")
      val cap = math.max(1L, totalCount / headDivisor)
      val head = model.filter(col(countCol) > cap)
      val headKeys = head.select(keys.map(col): _*)
      rows.join(broadcast(head), keys)
        .unionByName(
          rows.join(broadcast(headKeys), keys, "left_anti")
            .join(model.filter(col(countCol) <= cap), keys))
    }

  /** Unigram language-model perplexity per document — the shape of the
    * classic model-based quality filter (a KenLM-style n-gram LM scored
    * over each doc; unigram here keeps it exactly reproducible in any
    * engine, and the plumbing — corpus-level model stats joined back to
    * exploded tokens — is identical for higher orders; [[perplexityBigram]]
    * is the order-2 instantiation). Add-one smoothing over the corpus
    * vocabulary; gibberish and word-salad documents score high against
    * the corpus distribution, boilerplate scores low, both tails get
    * filtered in a real recipe.
    *
    * Plan: the [[vocabStats]] wordcount shuffle builds the model; two
    * driver scalars (corpus token count, vocab size — O(1) state); one
    * skew-guarded join of exploded tokens to the frequency table
    * ([[skewGuardedModelJoin]] — explicit broadcast while the vocab
    * fits, Zipf-head/tail split beyond) and one map-side-combinable
    * per-doc aggregation.
    */
  def perplexity(
      docs: DataFrame,
      textCol: String = "text",
      broadcastVocabLimit: Long = DefaultBroadcastVocabLimit,
      headDfDivisor: Long = DefaultHeadDfDivisor): DataFrame = {
    val toks = withTokens(docs, textCol)
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("c"))
    Caching.withCached(freq) {
      val stats = freq.agg(
        sum("c").as("total"), count(lit(1)).as("vocab")).head()
      // empty corpus: sum over zero rows is null — no model, no docs.
      // (total + vocab) = 1 keeps the (never-evaluated) log finite.
      val (total, vocab) =
        if (stats.isNullAt(0)) (1L, 0L)
        else (stats.getLong(0), stats.getLong(1))
      // p(tok) = (c + 1) / (total + vocab); ppl = exp(-mean ln p) —
      // the oracle mirrors this exact operation order
      val lp = log((col("c") + lit(1.0)) / lit((total + vocab).toDouble))
      skewGuardedModelJoin(toks, freq, Seq("token"), "c",
          vocab, total, broadcastVocabLimit, headDfDivisor)
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tok"),
          round(exp(-sum(lp) / count(lit(1))), 6).as("ppl"))
    }
  }

  /** Bigram-LM perplexity per document — the order-2 model the unigram
    * docstring promises the plumbing generalizes to (the CCNet/KenLM-
    * style quality filter runs exactly this shape at order 5): add-one
    * smoothed conditionals `p(w | prev) = (c2(prev,w) + 1) / (c1(prev)
    * + V)` with `c2` the corpus bigram count, `c1` the count of bigrams
    * starting with `prev`, and `V` the corpus UNIGRAM vocabulary (the
    * smoothing denominator ranges over possible next tokens);
    * `ppl = exp(-mean ln p)` over a document's n−1 bigram positions.
    * Documents with fewer than 2 tokens have no bigram positions and
    * drop out — ungradable, like the repetition gate's sub-n docs.
    *
    * Plan shape is the unigram one, one order up: successor pairing is
    * a per-row `zip_with` + explode inside the scan — each token pairs
    * with its successor, the doc-final token with NULL — so ONE corpus
    * scan and ONE wordcount shuffle on (prev, cur) feed BOTH the bigram
    * model (cur non-null rows) and the unigram vocabulary V (distinct
    * `prev` over the cached model rows: every token occurrence appears
    * as `prev` exactly once, doc-final ones in their null-cur row, so V
    * is exact — no separate countDistinct corpus pass). Prefix counts
    * re-aggregate from the model (vocab²-bounded); three driver
    * scalars; and the same [[skewGuardedModelJoin]] back to the
    * exploded bigrams — "of the" is percent-scale of any English
    * corpus, so the giant-model path needs the head/tail split just
    * like the unigram join.
    */
  def perplexityBigram(
      docs: DataFrame,
      textCol: String = "text",
      broadcastVocabLimit: Long = DefaultBroadcastVocabLimit,
      headDfDivisor: Long = DefaultHeadDfDivisor): DataFrame = {
    // (prev, cur-or-null) successor pairs — the codegen'd
    // [[graft.functions.TokenSuccessors]] pass (bit-identical to the
    // interpreted zip_with/slice/concat chain it replaces, spec-
    // asserted; measured ~3× the tokenizing scan's cost per corpus
    // pass, paid twice here). One exploded frame carries both the
    // bigram positions and the unigram occurrences. Empty-token docs
    // are dropped up front (no successor rows to contribute).
    val pairs = withTokens(docs, textCol)
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        explode(graft.functions.TokenSuccessors(col("toks"))).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
    val counts = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    val b2 = counts.filter(col("cur").isNotNull)
    val b1 = b2.groupBy("prev").agg(sum("c2").as("c1"))
    val model = b2.join(b1, Seq("prev"))
    Caching.withCached(counts, model) {
      // ONE aggregation over the cached counts yields all three driver
      // scalars: V = distinct prev (every token occurrence appears as
      // prev exactly once, doc-final ones in their null-cur row), and
      // the model's total/row-count restricted to the bigram rows (the
      // b1 join is one-to-one on prev, so summing b2 rows here equals
      // summing the joined model)
      val st = counts.agg(
        countDistinct(col("prev")).as("vocab"),
        sum(when(col("cur").isNotNull, col("c2"))).as("total"),
        count(when(col("cur").isNotNull, lit(1))).as("nrows")).head()
      val vocab = st.getLong(0)
      val (total, nrows) =
        if (st.isNullAt(1)) (1L, 0L) else (st.getLong(1), st.getLong(2))
      val lp = log((col("c2") + lit(1.0)) / (col("c1") + lit(vocab.toDouble)))
      val bg = pairs.filter(col("cur").isNotNull)
      skewGuardedModelJoin(bg, model, Seq("prev", "cur"), "c2",
          nrows, total, broadcastVocabLimit, headDfDivisor)
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_bigrams"),
          round(exp(-sum(lp) / count(lit(1))), 6).as("ppl"))
    }
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
