package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd fused shingling: distinct polynomial hashes of the word
  * n-gram shingles of a string, in ONE compiled pass — the fusion of
  * `split(trim(text), "\\s+")` → space-joined n-gram windows →
  * [[PolyHash]] per shingle → `array_distinct`, bit-identical to that
  * composable pipeline (and to the DuckDB oracle's shingle CTE) step for
  * step: same space-only trim, same Java-regex whitespace split (leading
  * empty token and all), same ' ' join chars in the rolling hash, same
  * first-occurrence distinct order.
  *
  * Why a custom expression: the composable form evaluates ~4 interpreted
  * higher-order lambdas per document (tokenize, window, concat_ws,
  * hash) and materializes every shingle STRING just to hash it. That
  * made shingling the dominant cost of every n-gram dedup query — and
  * the reason their wall time was hostage to whether a cached copy of
  * the shingle table stayed resident. Fused, the shingle string never
  * exists: the rolling hash folds straight over the token chars and a
  * join space, so the whole step is a primitive loop inside whole-stage
  * codegen and cheap enough to simply recompute.
  *
  * Null text yields the empty array (as the composable form's
  * `CASE WHEN size(toks) >= n ... ELSE array() END` does), so the output
  * is never null.
  *
  * `distinct = false` keeps every shingle occurrence in document order
  * (no `array_distinct` step) — the input the repetition-quality
  * filters count over; the same fused loop, minus the dedup set.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleHashes.compute(
      child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleHashes.compute(
            ${c.isNull} ? null : ${c.value}, $n, $distinct);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  val P = TextHash.P

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (text == null) return Empty
    val toks = Tokenize.split(text) // THE shared tokenization contract
    if (toks.length < n) return Empty
    val total = toks.length - n + 1
    val all = if (distinct) null else new Array[Long](total)
    val seen = if (distinct) new java.util.LinkedHashSet[java.lang.Long]() else null
    var i = 0
    while (i < total) {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * 31 + ' ') % P
        val t = toks(i + j)
        var k = 0
        while (k < t.length) {
          acc = (acc * 31 + t.charAt(k)) % P
          k += 1
        }
        j += 1
      }
      if (distinct) seen.add(acc) else all(i) = acc
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    Glue.column(ShingleHashes(Glue.expression(c), n))

  def apply(c: Column, n: Int, distinct: Boolean): Column =
    Glue.column(ShingleHashes(Glue.expression(c), n, distinct))
}
