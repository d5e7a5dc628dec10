package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd SimHash signature of a feature-hash set (`array<long>`).
  *
  * Bit j of the signature is set iff the majority of feature hashes have
  * an odd j-th universal hash `(2j+1)·x + (12345+7j) mod 1e9+7` — the
  * same algebra as [[TextHash.universalHashSql]] and the DuckDB oracle's
  * per-bit `list_sum` folds, so signatures stay bit-identical across
  * engines.
  *
  * Why a custom expression: the composable form is `bits` interpreted
  * `aggregate` lambdas over every feature hash (one closure dispatch +
  * boxing per feature PER BIT). That made the simhash query's wall time
  * depend on whether upstream cached blocks stayed resident — evict them
  * and the interpreted fold re-runs at ~30× cost. This expression is one
  * compiled pass over the array inside whole-stage codegen, fast enough
  * that cache residency stops mattering.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"simhash bits must be in [1, 64], got $bits")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash requires an array<bigint> input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  val P = TextHash.P

  /** Null elements are SKIPPED (they are no feature, so they contribute
    * to no bit) — the SQL surface accepts array<bigint> with nullable
    * elements, where reading a null slot as 0 would silently bias the
    * majority vote. Coefficients are [[TextHash.uhA]]/[[uhB]] (the one
    * shared definition), hoisted out of the per-element loop like
    * [[MinHashes.compute]].
    */
  def compute(arr: ArrayData, bits: Int): Long = {
    val counts = new Array[Long](bits)
    val as = new Array[Long](bits)
    val bs = new Array[Long](bits)
    var j0 = 0
    while (j0 < bits) {
      as(j0) = TextHash.uhA(j0); bs(j0) = TextHash.uhB(j0); j0 += 1
    }
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var j = 0
        while (j < bits) {
          val h = (as(j) * x + bs(j)) % P
          counts(j) += (h % 2L) * 2L - 1L
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  def apply(c: Column, bits: Int): Column =
    Glue.column(SimHash(Glue.expression(c), bits))
}
