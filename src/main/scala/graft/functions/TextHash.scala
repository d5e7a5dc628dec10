package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text hashing primitives.
  *
  * Everything here is expressed with codegen'd builtin higher-order
  * functions (`transform`/`aggregate`/`filter`) — no UDFs — and uses only
  * arithmetic that DuckDB evaluates identically, so every downstream
  * operator (dedup, fingerprinting, LSH) can be oracle-checked
  * bit-for-bit. Engine-native hashes (Spark murmur3 `hash()`, DuckDB
  * xxhash) deliberately do NOT appear anywhere results are compared.
  *
  * The base hash is a polynomial rolling hash over character codes:
  * `h = fold(chars)(acc = (acc * 31 + code) mod P)`, P = 1e9+7. Values
  * stay < 2^35, so 64-bit arithmetic never overflows in either engine.
  */
object TextHash {
  val P = 1000000007L

  /** The WINDOW-combine base: [[WindowPolyHashes]] folds per-token
    * hashes as `acc = (acc * WB + th) mod P`. Prime, and large enough
    * that single-token-hash windows stay spread; kept well below 2^20
    * so `acc * WB` (< 2^50) and the rolling subtraction's products
    * (< 2^60) never overflow 64-bit arithmetic in either engine. One
    * definition for the compiled kernel and the DuckDB fragment — the
    * drift contract every constant here lives under.
    */
  val WB = 1000003L

  /** SQL-expr fragment: polynomial hash of the string held in `v`
    * (a column name or lambda variable).
    */
  def polyHashSql(v: String): String =
    s"aggregate(transform(sequence(1, length($v)), i -> ascii(substr($v, i, 1))), " +
      s"0L, (acc, c) -> (acc * 31 + c) % $P)"

  /** Whitespace tokens of `textCol` (Python str.split() semantics). */
  def tokens(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** Per-token polynomial hashes of a token-array column named `toksCol`
    * (codegen'd [[PolyHash]] inside the transform — same values as the
    * portable fold, ~100× faster).
    */
  def tokenHashes(toksCol: String): Column =
    transform(col(toksCol), t => PolyHash(t))

  /** Word n-gram shingles (space-joined) of a token-array column.
    * Empty when the document has fewer than n tokens — guarded because
    * Spark's `sequence(1, k)` with k < 1 counts DOWN instead of producing
    * an empty array.
    */
  def shingles(toksCol: String, n: Int = 3): Column = {
    val joins = (0 until n).map(j => s"element_at($toksCol, i + $j)").mkString(", ")
    expr(
      s"CASE WHEN size($toksCol) >= $n THEN " +
        s"transform(sequence(1, size($toksCol) - ${n - 1}), i -> concat_ws(' ', $joins)) " +
        "ELSE array() END")
  }

  /** Distinct polynomial hashes of the shingle array `shCol`. */
  def shingleHashes(shCol: String): Column =
    array_distinct(transform(col(shCol), s => PolyHash(s)))

  /** The i-th universal hash over a 64-bit input value expression:
    * `(a_i * x + b_i) mod P` with fixed odd multipliers.
    */
  def universalHashSql(x: String, i: Int): String =
    s"((${uhA(i)} * $x + ${uhB(i)}) % $P)"

  /** The universal-hash family's coefficients — the ONE definition the
    * SQL fragment above and the compiled kernels ([[MinHashes]],
    * [[SimHash]]) share, so a change can never reach one engine's
    * algebra and not the other's (the drift hazard Tokenize's header
    * names for the tokenization contract).
    */
  @inline def uhA(i: Int): Long = 2L * i + 1L
  @inline def uhB(i: Int): Long = 12345L + 7L * i
}
