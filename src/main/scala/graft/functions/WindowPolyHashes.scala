package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd ROLLING window hash over a token array: every length-`window`
  * stride-1 window's hash in ONE compiled pass — `out(p)` combines the
  * per-token [[PolyHash]]es `th(p..p+w-1)` polynomially,
  * `fold(acc = (acc * WB + th) mod P)` with [[TextHash.WB]], advanced by
  * the O(1) rolling update `acc' = ((acc - th(p)·WB^(w-1)) · WB +
  * th(p+w)) mod P` instead of re-folding w terms per position.
  *
  * Why a custom expression: this is the inner loop of the entire
  * substring-dup family (q77–q84 and every in-stream probe batch). The
  * prior formulation materialized a STRING per window position —
  * `poly_hash(concat_ws(' ', slice(toks, p+1, w)))`, O(corpus tokens ×
  * window) character copying through the allocator before hashing and
  * discarding each window. Here each token is hashed once
  * (O(corpus text)) and each window costs a handful of long ops; no
  * window string ever exists.
  *
  * Engine-portable like every hash here: the DuckDB oracle computes the
  * identical values as `list_reduce(list_prepend(0, list_slice(th, p+1,
  * p+w)), (a, b) -> (a*WB + b) % P)` over the same per-token
  * [[graft.queries.DuckSql.polyHash]] list — the shared formulation
  * lives in `PipelineQueries.substringCtes`. All intermediates stay
  * below 2^63: acc < P ≈ 2^30, so acc·WB < 2^50 and th·WB^(w-1) mod P
  * products < 2^60.
  *
  * Null array ⇒ null; a null element hashes as the empty string (0L —
  * token arrays from `split` never contain nulls); fewer than `window`
  * tokens ⇒ empty array (the caller's `n_windows > 0` filter makes this
  * unreachable in the operators).
  *
  * CROSS-ENGINE DRIFT CONTRACT (registered-SQL use only): for an input
  * array CONTAINING NULL ELEMENTS, this kernel hashes the null as 0L
  * while the documented DuckDB mirror above propagates NULL through the
  * `list_reduce` fold and yields a NULL whash — the two engines agree
  * for every split-produced token array (no nulls possible) but diverge
  * on hand-built arrays with nulls passed to the registered
  * `window_poly_hashes` SQL function. Mirror with
  * `list_transform(th, t -> coalesce(t, 0))` on the DuckDB side when
  * hand-built arrays must match.
  */
case class WindowPolyHashes(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if window >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"window_poly_hashes window must be >= 1, got $window")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"window_poly_hashes requires an array<string> input, got " +
          t.simpleString)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WindowPolyHashes.compute(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowPolyHashes.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowPolyHashes {
  val P = TextHash.P

  /** All window hashes of `arr` in one pass: per-token [[PolyHash]],
    * then the rolling polynomial combine. Empty array when the input
    * holds fewer than `window` tokens.
    */
  def compute(arr: ArrayData, window: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - window + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 0L
        else PolyHash.hash(arr.getUTF8String(i).toString)
      i += 1
    }
    val b = TextHash.WB
    // WB^(window-1) mod P — the weight the oldest token leaves with
    var bw = 1L
    var j = 1
    while (j < window) { bw = bw * b % P; j += 1 }
    val out = new Array[Long](m)
    var acc = 0L
    j = 0
    while (j < window) { acc = (acc * b + th(j)) % P; j += 1 }
    out(0) = acc
    var p = 1
    while (p < m) {
      // subtract the departing token's weighted hash (kept non-negative
      // by the +P before the mod), shift, add the arriving token
      acc = ((acc - th(p - 1) * bw % P + P) % P * b + th(p + window - 1)) % P
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, window: Int): Column =
    Glue.column(WindowPolyHashes(Glue.expression(c), window))
}
