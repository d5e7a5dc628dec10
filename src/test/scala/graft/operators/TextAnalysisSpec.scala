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
    assert(r.getAs[Int]("n_tokens") == 5)
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
    assert(r.getAs[Int]("ws_tokens") == 3)
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
}
