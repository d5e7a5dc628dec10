package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quality metrics on a known document") {
    val df = Seq((1L, "the cat the cat 99!")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df).collect()(0)
    assert(r.getAs[Int]("n_chars_calc") == 19)
    assert(r.getAs[Long]("n_tokens") == 5L)
    // tokens: the(3) cat(3) the(3) cat(3) 99!(3) -> avg 3.0
    assert(r.getAs[Double]("avg_token_len") == 3.0)
    assert(r.getAs[Double]("uniq_token_ratio") == 0.6)
    assert(r.getAs[Double]("stopword_ratio") == 0.4)     // 'the' twice
    assert(r.getAs[Double]("digit_ratio") == math.rint(2.0 / 19 * 1e6) / 1e6)
    assert(r.getAs[Double]("punct_ratio") == math.rint(1.0 / 19 * 1e6) / 1e6)
  }

  test("language id picks the dominant marker lexicon, en wins ties") {
    val df = Seq(
      (1L, "el perro de la casa que ladra y corre"),
      (2L, "the dog of the house that barks and runs"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df).orderBy("doc_id")
      .select("lang_pred").collect().map(_.getString(0)).toSeq
    assert(got == Seq("es", "en", "en"))
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq((1L, "hello world42 x!y")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 3L)
    // hello | world | 42 | x | ! | y
    assert(r.getAs[Int]("bpeish_tokens") == 6)
  }

  test("fingerprint: identical texts collide, different texts do not") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d f"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L)._1 != fp(1L)._2)
  }

  test("pack plan: contiguous offsets in doc_id order, chunk math, partition-count invariant") {
    val df = (0L until 100L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packPlan(df, ctxTokens = 16).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // offsets are the exclusive prefix sum of token counts in id order
    var run = 0L
    got.foreach { case (id, n, start, sc, ec) =>
      assert(start == run, s"doc $id offset")
      assert(n == id % 7 + 1)
      assert(sc == start / 16 && ec == (start + n - 1) / 16)
      run += n
    }
    // invariant under partition count: single-partition input gives the
    // same plan (only doc_id order defines the stream)
    val one = TextAnalysis.packPlan(df.coalesce(1), ctxTokens = 16)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(one.toSeq == got.map(t => (t._1, t._3)).toSeq)
  }

  test("repetition: top/dup n-gram fractions, short-doc zeros") {
    val df = Seq(
      // 2-grams: "a b","b a","a b","b a","a b" -> top "a b"=3/5, dup 5/5
      // 3-grams: "a b a","b a b","a b a","b a b" -> top 2/4, dup 4/4
      (1L, "a b a b a b"),
      // all grams distinct
      (2L, "v w x y z"),
      // shorter than 3 tokens: ngrams3 = 0
      (3L, "p q"),
      // shorter than 2 tokens: all zero
      (4L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got(0) == ((1L, 5L, 0.6, 1.0, 4L, 0.5, 1.0)))
    assert(got(1) == ((2L, 4L, 0.25, 0.0, 3L, math.rint(1.0 / 3 * 1e6) / 1e6, 0.0)))
    assert(got(2) == ((3L, 1L, 1.0, 0.0, 0L, 0.0, 0.0)))
    assert(got(3) == ((4L, 0L, 0.0, 0.0, 0L, 0.0, 0.0)))
  }

  test("chunk plan: coverage, overlap, short tail, one chunk for short docs") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkPlan(df, width = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: starts 0,3,6 cover w1..w10 (ceil((10-4)/3)+1 = 3 chunks)
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L)))
    // doc 2 shorter than width: one chunk of its full length
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L)))
    // identical windows hash identically; different windows don't
    val hs = TextAnalysis.chunkPlan(df, width = 4, stride = 3)
      .select("chunk_hash").collect().map(_.getLong(0))
    assert(hs.distinct.length == hs.length)
  }

  test("perplexity: rare-token docs score higher, hand-checked value") {
    // corpus: "a" x 8, "b" x 1, "z" x 1 -> total 10, vocab 3
    val df = Seq(
      (1L, "a a a a"),
      (2L, "a a a a"),
      (3L, "b z")).toDF("doc_id", "text")
    val got = TextAnalysis.perplexity(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // p(a) = 9/13; common-token docs: ppl = 13/9
    assert(got(0) == ((1L, 4L, math.rint(13.0 / 9 * 1e6) / 1e6)))
    assert(got(0)._3 == got(1)._3)
    // p(b) = p(z) = 2/13; rare-token doc: ppl = 13/2, higher
    assert(got(2) == ((3L, 2L, 6.5)))
    assert(got(2)._3 > got(0)._3)
  }

  test("perplexity: giant-vocab head/tail fallback matches the broadcast path") {
    val df = Seq(
      (1L, "a a a a"),
      (2L, "a a a a"),
      (3L, "b z")).toDF("doc_id", "text")
    def run(limit: Long, divisor: Long) =
      TextAnalysis.perplexity(df, broadcastVocabLimit = limit,
          headDfDivisor = divisor)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val broadcastPath = run(Long.MaxValue, TextAnalysis.DefaultHeadDfDivisor)
    // limit 0 forces the split; divisor 4 -> cap 2: 'a' (c=8) is head,
    // 'b'/'z' are tail — both branches exercised
    assert(run(0, 4) == broadcastPath)
    // divisor 1 -> cap = total: head empty, everything through the
    // shuffled-tail branch
    assert(run(0, 1) == broadcastPath)
  }

  test("bigram perplexity: hand-checked conditionals, sub-2-token docs drop, " +
    "fallback parity") {
    // corpus bigrams: (a,b) x3, (b,a) x1 -> c1(a)=3, c1(b)=1; vocab {a,b,z}
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "z")).toDF("doc_id", "text")
    val got = TextAnalysis.perplexityBigram(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 2) // doc 3 has no bigram positions
    // p(b|a) = (3+1)/(3+3) = 2/3; p(a|b) = (1+1)/(1+3) = 1/2
    val pplDoc1 = math.rint(math.exp(
      -(2 * math.log(2.0 / 3) + math.log(0.5)) / 3) * 1e6) / 1e6
    assert(got(0) == ((1L, 3L, pplDoc1)))
    assert(got(1) == ((2L, 1L, math.rint(1.5 * 1e6) / 1e6)))
    // repetitious common bigrams score lower than the doc's rarer mix
    assert(got(1)._3 < got(0)._3)
    // head/tail fallback (limit 0, divisor 2 -> cap 2: (a,b) head,
    // (b,a) tail) matches the broadcast path
    val split = TextAnalysis.perplexityBigram(df,
        broadcastVocabLimit = 0, headDfDivisor = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(split.toSeq == got.toSeq)
  }

  test("chunk plan invariants under randomized widths/strides/lengths") {
    // coverage, stride spacing, tail shortening — for a sweep of shapes
    val shapes = for {
      (nTok, i) <- Seq(1, 2, 5, 31, 32, 33, 64, 97, 200).zipWithIndex
    } yield (i.toLong, (1 to nTok).map(j => s"t$j").mkString(" "), nTok)
    val df = shapes.map { case (id, text, _) => (id, text) }.toDF("doc_id", "text")
    for ((w, s) <- Seq((32, 24), (16, 16), (8, 3), (1, 1), (200, 150))) {
      val got = TextAnalysis.chunkPlan(df, w, s).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      shapes.foreach { case (id, _, nTok) =>
        val chunks = got(id).sortBy(_._2)
        // chunk i starts at i*stride; the first covers the head
        chunks.foreach { case (_, ci, start, n) =>
          assert(start == ci * s)
          assert(n >= 1 && n <= w)
          assert(start + n <= nTok || n == math.min(w, nTok))
        }
        // the last chunk reaches the last token; no extra chunk after
        val last = chunks.last
        assert(last._3 + last._4 >= nTok, s"doc $id w=$w s=$s tail")
        assert(chunks.size == (if (nTok <= w) 1 else (nTok - w + s - 1) / s + 1))
      }
    }
  }

  test("vocab stats: df counts docs, cf counts occurrences, minDf prunes") {
    val df = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabStats(df).orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2L, 3L), ("b", 1L, 1L), ("c", 2L, 2L)))
    val head = TextAnalysis.vocabStats(df, minDf = 2).orderBy("token").collect()
      .map(_.getString(0))
    assert(head.toSeq == Seq("a", "c"))
  }

  test("pii scan: counts per category, ordered redaction") {
    val df = Seq(
      (1L, "mail a.user+tag@sub.example.org now"),
      (2L, "servers 10.0.0.1 and 192.168.255.12 up"),
      (3L, "call 555-123-4567 or 555.987.6543"),
      (4L, "clean text only"),
      // "x@1.2.3.4com": no email (no letters-after-dot), no IP (no word
      // boundary before "com") — only the standalone ip matches
      (5L, "x@1.2.3.4com and real ip 1.2.3.4")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got(0) == ((1L, 1L, 0L, 0L, "mail <EMAIL> now")))
    assert(got(1) == ((2L, 0L, 2L, 0L, "servers <IP> and <IP> up")))
    assert(got(2) == ((3L, 0L, 0L, 2L, "call <PHONE> or <PHONE>")))
    assert(got(3) == ((4L, 0L, 0L, 0L, "clean text only")))
    assert(got(4) == ((5L, 0L, 1L, 0L, "x@1.2.3.4com and real ip <IP>")))
  }

  test("mix to target: hits the weights without upsampling, drops unnamed strata") {
    val rows = ((0L until 800L).map(i => (i, "en")) ++
      (800L until 1000L).map(i => (i, "fr")) ++
      (1000L until 1100L).map(i => (i, "junk"))).toDF("doc_id", "lang")
    // target 50/50 but only 200 fr exist -> fr caps the recipe: keep all
    // 200 fr, ~200 of 800 en, all junk dropped
    val kept = TextAnalysis.mixToTarget(rows, "lang", Map("en" -> 0.5, "fr" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = kept.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    assert(byLang("fr") == 200)
    assert(byLang.getOrElse("junk", 0) == 0)
    assert(byLang("en") > 150 && byLang("en") < 250,
      s"en kept ${byLang("en")} of 800 targeting 200")
    // deterministic
    val again = TextAnalysis.mixToTarget(rows, "lang", Map("en" -> 0.5, "fr" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
    // a weighted stratum with no rows is unsatisfiable: fail loudly...
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.mixToTarget(rows, "lang", Map("en" -> 0.5, "xx" -> 0.5))
    }
    assert(e.getMessage.contains("xx"))
    // ...unless the caller opts into renormalizing over present strata
    val renorm = TextAnalysis.mixToTarget(rows, "lang",
      Map("en" -> 0.5, "xx" -> 0.5), renormalizeMissing = true)
    assert(renorm.count() == 800) // all en kept: nothing else to balance
  }

  test("stratified sample: deterministic, rate-monotone, rate-respecting") {
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "stratum")
    def ids(rates: Map[String, Double]): Set[Long] =
      TextAnalysis.stratifiedSample(rows, "stratum", rates)
        .collect().map(_.getLong(0)).toSet
    val half = ids(Map("en" -> 0.5, "fr" -> 1.0))
    // deterministic: same call, same sample
    assert(half == ids(Map("en" -> 0.5, "fr" -> 1.0)))
    // all fr rows kept; en rows downsampled to ~half
    assert(half.count(_ % 2 == 1) == 1000)
    val enKept = half.count(_ % 2 == 0)
    assert(enKept > 400 && enKept < 600, s"en kept $enKept of 1000 at 0.5")
    // monotone: the 0.25 sample is a subset of the 0.5 sample
    val quarter = ids(Map("en" -> 0.25, "fr" -> 1.0))
    assert(quarter.filter(_ % 2 == 0).subsetOf(half.filter(_ % 2 == 0)))
    // unknown strata fall back to defaultRate
    val none = TextAnalysis.stratifiedSample(rows, "stratum",
      Map.empty, defaultRate = 0.0).count()
    assert(none == 0)
  }

  test("stratifiedSample hashes negative ids into [0,1): a rate-0.0 " +
    "stratum drops them (sign-preserving % used to keep them at EVERY " +
    "rate), and nonnegative ids keep their original hash values") {
    val rows = ((-8L to -1L) ++ (0L until 8L)).map(i => (i, "s"))
      .toDF("doc_id", "stratum")
    assert(TextAnalysis.stratifiedSample(rows, "stratum",
      Map("s" -> 0.0)).count() == 0)
    val all = TextAnalysis.stratifiedSample(rows, "stratum",
      Map("s" -> 1.0)).count()
    assert(all == 16)
    // a mid rate keeps a sign-independent subset, never the whole
    // negative half unconditionally
    val kept = TextAnalysis.stratifiedSample(rows, "stratum",
        Map("s" -> 0.5)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.count(_ < 0) < 8, s"negative ids kept unconditionally: $kept")
  }

  test("languageId predicts NULL for a null document instead of the " +
    "last lexicon's language") {
    val df = Seq((1L, "the of and is this"), (2L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getString(1))).toMap
    assert(got(1L) == "en")
    assert(got(2L) == null, s"null doc predicted '${got(2L)}'")
  }

  test("packPlan drops null docs instead of crashing the encoder; " +
    "repetition refuses duplicate ns; frameSample refuses step < 1") {
    val df = Seq((1L, "a b c"), (2L, null), (3L, "d e"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.packPlan(df, ctxTokens = 4)
      .select("doc_id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plan == Map(1L -> 3L, 3L -> 2L))
    intercept[IllegalArgumentException] {
      TextAnalysis.repetition(df, ns = Seq(2, 2))
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(spark.emptyDataFrame, step = 0)
    }
  }
}
