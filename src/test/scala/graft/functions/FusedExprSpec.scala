package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bit-equality of the fused codegen expressions against the composable
  * interpreted pipelines they replace — on whitespace/empty/null edge
  * cases and on the real documents fixture.
  */
class FusedExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c", "a b", "a", "", "   ",
    "  leading and trailing  ",
    "tabs\tbetween\twords\tand more",
    "runs   of    spaces here",
    "newline\nin the\nmiddle of text",
    "dup dup dup dup dup dup",
    "emoji \uD83D\uDE00 and \uD83D\uDE00\uD83D\uDE01 pairs", // non-BMP: length() counts code points
    null)

  private def edgeDf = edgeTexts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def composableShh(n: Int) = {
    val toks = TextHash.tokens(col("text"))
    val withToks = edgeDf.withColumn("toks", toks)
    withToks.withColumn("sh", TextHash.shingles("toks", n))
      .withColumn("shh_ref", TextHash.shingleHashes("sh"))
      .select(col("doc_id"), col("shh_ref"),
        ShingleHashes(col("text"), n).as("shh_fused"))
  }

  test("ShingleHashes == tokenize/window/concat_ws/polyhash/distinct on edge cases") {
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = composableShh(n).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("TokenStats == size/aggregate/array_distinct lambda pipeline") {
    val got = edgeDf
      .withColumn("toks", TextHash.tokens(col("text")))
      .withColumn("ts", TokenStats(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_ref"),
        expr("aggregate(toks, 0L, (s, t) -> s + length(t))").as("sum_ref"),
        size(array_distinct(col("toks"))).cast("long").as("d_ref"),
        col("ts.n_tokens"), col("ts.sum_len"), col("ts.n_distinct"))
      .collect()
    got.foreach { r =>
      if (!r.isNullAt(1)) {
        assert(r.getLong(1) == r.getLong(4), s"n doc=${r.getLong(0)}")
        assert(r.getLong(2) == r.getLong(5), s"sum doc=${r.getLong(0)}")
        assert(r.getLong(3) == r.getLong(6), s"distinct doc=${r.getLong(0)}")
      } else // null text propagates NULL, exactly like the HOF forms
        assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("MarkerCount == size(filter(toks, t -> t IN lexicon)) per lexicon") {
    import graft.operators.TextAnalysis
    for ((_, words) <- TextAnalysis.langMarkers) {
      val inList = words.map("'" + _ + "'").mkString(",")
      val got = edgeDf
        .withColumn("toks", TextHash.tokens(col("text")))
        .select(
          col("doc_id"),
          expr(s"size(filter(toks, t -> t in ($inList)))").cast("long")
            .as("ref"),
          MarkerCount(col("text"), words).as("fused"))
        .collect()
      got.foreach { r =>
        if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2),
          s"doc=${r.getLong(0)} words=$words")
        else assert(r.isNullAt(2)) // null propagates like the filter form
      }
    }
  }

  test("ShingleHashes(distinct = false) == windowed transform+PolyHash, dups kept in order") {
    for (n <- Seq(1, 2, 3)) {
      val rows = edgeDf
        .withColumn("toks", TextHash.tokens(col("text")))
        .withColumn("gh_ref",
          transform(TextHash.shingles("toks", n), s => PolyHash(s)))
        .select(col("doc_id"), col("gh_ref"),
          ShingleHashes(col("text"), n, distinct = false).as("gh_fused"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("ShingleHashes == composable pipeline on randomized whitespace-heavy strings") {
    // property sweep: random texts over a hostile alphabet (letters,
    // digits, every \s class char, empties, repeats) must agree with the
    // interpreted pipeline bit-for-bit for several n
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alphabet = Gen.frequency(
      (6, Gen.alphaNumChar),
      (3, Gen.const(' ')),
      (1, Gen.oneOf('\t', '\n', '\u000B', '\f', '\r')))
    val textGen = Gen.chooseNum(0, 80)
      .flatMap(len => Gen.stringOfN(len, alphabet))
    val texts = (0 until 300).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val cmp = df
        .withColumn("toks", TextHash.tokens(col("text")))
        .withColumn("sh", TextHash.shingles("toks", n))
        .withColumn("shh_ref", TextHash.shingleHashes("sh"))
        .select(col("doc_id"), col("shh_ref"),
          ShingleHashes(col("text"), n).as("shh_fused"))
      assert(cmp.filter(col("shh_ref") =!= col("shh_fused")).count() == 0,
        s"fused/composable divergence at n=$n")
    }
  }

  test("ShingleHashes == composable pipeline on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = docs
      .withColumn("toks", TextHash.tokens(col("text")))
      .withColumn("sh", TextHash.shingles("toks", 3))
      .withColumn("shh_ref", TextHash.shingleHashes("sh"))
      .select(col("doc_id"), col("shh_ref"),
        ShingleHashes(col("text"), 3).as("shh_fused"))
    val bad = cmp.filter(col("shh_ref") =!= col("shh_fused")).count()
    assert(bad == 0)
  }

  test("WindowPolyHashes == interpreted per-token-hash fold on edge " +
    "cases, randomized strings, and the documents fixture") {
    // the interpreted reference IS the shared engine formulation: a
    // direct w-term fold per position over the per-token PolyHash list
    // (what the DuckDB oracle computes with list_reduce) — the rolling
    // O(1) update must match it bit-for-bit at every position
    def refCol(w: Int) = expr(
      "CASE WHEN toks IS NULL THEN NULL " +
        s"WHEN size(toks) < $w THEN array() " +
        s"ELSE transform(sequence(0, size(toks) - $w), p -> " +
        s"aggregate(slice(thh, p + 1, $w), 0L, " +
        s"(acc, h) -> (acc * ${TextHash.WB} + h) % ${TextHash.P})) END")
    def check(df: org.apache.spark.sql.DataFrame, label: String): Unit =
      for (w <- Seq(1, 2, 3, 8, 50)) {
        val cmp = df
          .withColumn("toks", TextHash.tokens(col("text")))
          .withColumn("thh", TextHash.tokenHashes("toks"))
          .select(col("doc_id"), refCol(w).as("ref"),
            WindowPolyHashes(col("toks"), w).as("fused"))
        assert(cmp.filter(not(col("ref") <=> col("fused"))).count() == 0,
          s"$label: fused/fold divergence at w=$w")
      }
    check(edgeDf, "edge cases")
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alphabet = Gen.frequency(
      (6, Gen.alphaNumChar),
      (3, Gen.const(' ')),
      (1, Gen.oneOf('\t', '\n', '\u000B', '\f', '\r')))
    val textGen = Gen.chooseNum(0, 80)
      .flatMap(len => Gen.stringOfN(len, alphabet))
    val texts = (0 until 300).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(7000L + i)))
    check(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "randomized")
    check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text"), "documents fixture")
  }

  test("MinHashes == k interpreted array_min(transform(...)) lambdas") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 8
    val sh = docs.select(col("doc_id"), ShingleHashes(col("text"), 3).as("shh"))
      .filter(size(col("shh")) > 0)
    val refCols = (0 until k).map { i =>
      expr(s"array_min(transform(shh, x -> ${TextHash.universalHashSql("x", i)}))")
    }
    val cmp = sh.select(col("doc_id"),
      array(refCols: _*).as("mh_ref"), MinHashes(col("shh"), k).as("mh_fused"))
    assert(cmp.filter(col("mh_ref") =!= col("mh_fused")).count() == 0)
  }

  test("MinHashes null semantics: empty/all-null arrays yield null, null skipped") {
    val df = Seq(
      (0L, Seq[java.lang.Long](1L, 2L, 3L)),
      (1L, Seq[java.lang.Long](null, 5L)),
      (2L, Seq[java.lang.Long](null)),
      (3L, Seq.empty[java.lang.Long])
    ).toDF("id", "arr")
    val got = df.select(col("id"), MinHashes(col("arr"), 2).as("mh"))
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1))
    // null element skipped: same as minhash of [5]
    val only5 = df.filter(col("id") === 1)
      .select(MinHashes(expr("array(5L)"), 2)).head().getSeq[Long](0)
    assert(got(1).getSeq[Long](1) == only5)
    assert(got(2).isNullAt(1) && got(3).isNullAt(1))
  }

  test("DotProduct refuses mismatched dimensions instead of scoring a " +
    "prefix — the Int8Dot loud-refusal contract on the float side") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val em = intercept[Exception] {
      spark.range(1).select(DotProduct(
        expr("array(1.0D, 2.0D, 3.0D)"),
        expr("array(1.0D, 2.0D)")).as("d")).collect()
    }
    assert(messages(em).exists(_.contains("dimension mismatch")),
      messages(em).mkString("\n"))
    // equal dims still score, both eval paths
    val ok = spark.range(1).select(DotProduct(
      expr("array(1.0D, 2.0D)"), expr("array(3.0D, 4.0D)")).as("d"))
      .head().getDouble(0)
    assert(ok == 11.0)
  }

  test("SimHash/SrpKey skip null elements instead of reading them as zero") {
    val withNull = Seq(Tuple1(Seq[java.lang.Long](7L, null, 9L))).toDF("arr")
    val without = Seq(Tuple1(Seq[java.lang.Long](7L, 9L))).toDF("arr")
    assert(
      withNull.select(SimHash(col("arr"), 16)).head().getLong(0) ==
        without.select(SimHash(col("arr"), 16)).head().getLong(0))
    val vNull = Seq(Tuple1(Seq[java.lang.Double](1.5, null, -2.5))).toDF("v")
    val vZero = Seq(Tuple1(Seq[java.lang.Double](1.5, 0.0, -2.5))).toDF("v")
    assert(
      vNull.select(SrpKey(col("v"), 0, 8)).head().getLong(0) ==
        vZero.select(SrpKey(col("v"), 0, 8)).head().getLong(0))
  }

  test("TokenSuccessors == zip_with/slice/concat successor pairing on edge cases + fixture") {
    def both(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", TextHash.tokens(col("text")))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        expr("zip_with(toks, concat(slice(toks, 2, greatest(size(toks) - 1, 0)), " +
          "array(CAST(NULL AS STRING))), (p, c) -> named_struct('prev', p, 'cur', c))")
          .as("ref"),
        TokenSuccessors(col("toks")).as("fused"))
    both(edgeDf).collect().foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1) == r.getSeq[org.apache.spark.sql.Row](2),
        s"doc=${r.getLong(0)}")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    both(docs).collect().foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1) == r.getSeq[org.apache.spark.sql.Row](2),
        s"doc=${r.getLong(0)}")
    }
  }
}
