package graft.functions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** THE tokenization contract shared by every fused text expression
  * ([[TokenStats]], [[MarkerCount]], [[MarkerCounts]], [[ShingleHashes]]):
  * `UTF8String.trim()` (strips 0x20 only — identical to Spark's
  * `trim()`), then `Pattern.split(s, -1)` on `\\s+` (exactly what
  * Spark's `split(str, re)` runs, leading empty token and all). One
  * definition so a tokenization fix can never reach only some of the
  * expressions that the DuckDB oracles mirror.
  */
private[functions] object Tokenize {
  private val Ws = Pattern.compile("\\s+")

  /** null for null text (callers decide their null semantics). */
  def split(text: UTF8String): Array[String] =
    if (text == null) null else Ws.split(text.trim().toString, -1)
}
