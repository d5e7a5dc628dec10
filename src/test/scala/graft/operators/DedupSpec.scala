package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog again and again today"
  private val aNear = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val b = "completely different words about spark catalyst tungsten shuffles and joins"

  private def docsDf = Seq(
    (0L, a), (1L, a), (2L, aNear), (3L, b)
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeper = min id") {
    val got = Dedup.exact(docsDf).orderBy("keeper_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngram jaccard: identical docs -> 1.0; near pair high; distinct pair absent") {
    val pairs = Dedup.ngramJaccardPairs(docsDf, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.7 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((1L, 3L)))
  }

  test("minhash LSH finds the same pairs as exact jaccard at high threshold") {
    val exact = Dedup.ngramJaccardPairs(docsDf, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docsDf, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(lsh.contains((0L, 1L)))
  }

  test("simhash: identical docs at hamming 0, unrelated docs not candidates at <= 3") {
    val got = Dedup.simhashPairs(docsDf, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((0L, 1L)) == 0)
    assert(!got.contains((0L, 3L)))
  }

  test("shingle skew cap drops ultra-common shingles from pairing only") {
    // 'x y z' appears in every doc; with cap 1 it can't generate pairs
    val df = Seq((0L, "x y z a b c"), (1L, "x y z d e f")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(df, threshold = 0.01)
    val capped = Dedup.ngramJaccardPairs(df, threshold = 0.01, maxShingleDf = Some(1))
    assert(uncapped.count() == 1)
    assert(capped.count() == 0)
  }
}
