package graft.queries

import graft.functions.TextHash
import graft.operators.TextAnalysis

/** DuckDB fragments mirroring [[graft.functions.TextHash]] — kept next to
  * the oracle SQL so the two engines' hash algebra can't drift apart.
  */
object DuckSql {
  val P: Long = TextHash.P

  /** Polynomial char hash of the string held in variable/column `v`. */
  def polyHash(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($v)+1), i -> CAST(ascii(substr($v, i, 1)) AS BIGINT))), " +
      s"(a, b) -> (a*31 + b) % $P)"

  /** docs CTE: documents + whitespace tokens. */
  val docsCte: String =
    """docs AS (
      |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents)""".stripMargin

  /** shingle-hash CTE over docs (distinct 3-gram shingle poly-hashes). */
  val shCte: String =
    s"""sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           list_transform(range(1, len(toks) - 1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
       |           s -> ${polyHash("s")})) AS shh
       |  FROM docs)""".stripMargin

  /** Distinct token-hash CTE over docs. */
  val thCte: String =
    s"""th AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(toks, t -> ${polyHash("t")})) AS thh
       |  FROM docs)""".stripMargin

  def markerFilter(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> t in (${words.map("'" + _ + "'").mkString(",")})))"

  /** i-th universal hash of `x` — mirrors TextHash.universalHashSql. */
  def universalHash(x: String, i: Int): String =
    TextHash.universalHashSql(x, i)

  /** embeddings CTE with double vectors. */
  val embCte: String =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings)""".stripMargin

  /** Fixed-k deterministic IVF centroid CTE (mirrors
    * Similarity.ivfCentroids: k smallest multiplicative id-hashes).
    */
  def ivfCentCte(k: Int): String =
    s"""cent AS (
       |  SELECT vec_id AS centroid_id, vec AS cvec FROM e
       |  ORDER BY ((vec_id % $P) * 2654435761) % $P, vec_id
       |  LIMIT $k)""".stripMargin

  /** One SRP band key (`rows` sign bits from global bit `startBit`) over
    * the `vec` column — mirrors Similarity.srpKeySql bit-for-bit.
    */
  def srpBandKey(startBit: Int, rows: Int): String =
    (0 until rows).map { j =>
      val bit = startBit + j
      val signs = s"list_transform(range(0, len(vec)), " +
        s"i -> CASE WHEN ((i * 2654435761 + $bit * 40503) % 97) % 2 = 0 " +
        s"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
      s"(CASE WHEN list_dot_product(vec, $signs) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def cosine(a: String, b: String): String =
    s"(list_dot_product($a, $b) / " +
      s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"

  def langScores: Seq[(String, String)] =
    TextAnalysis.langMarkers.map { case (lang, words) =>
      lang -> markerFilter("toks", words)
    }
}
