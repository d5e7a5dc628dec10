package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd signed-random-projection key of an `array<double>` vector:
  * `rows` sign bits (global hyperplane indices `startBit` onward) packed
  * into one long. Bit j is set iff the projection of the vector onto
  * deterministic hyperplane `startBit + j` is positive, where the
  * hyperplane's ±1 component for dimension i is
  * `((i·2654435761 + bit·40503) mod 97) mod 2 == 0 ? +1 : −1` — the
  * same integer mix as the portable SQL fold and the DuckDB oracle
  * fragment, with the same strict left-to-right summation, so keys stay
  * bit-identical across engines.
  *
  * Why a custom expression: the composable form is one interpreted
  * `aggregate(zip_with(...))` per bit per vector — banding needs
  * bands × rowsPerBand of them (≈100), which made LSH bucketing cost
  * more than the all-pairs join it is meant to replace at small scale.
  * This compiles to a rows × dim primitive loop inside whole-stage
  * codegen.
  */
case class SrpKey(child: Expression, startBit: Int, rows: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if rows >= 1 && rows <= 63 && startBit >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"srp_key needs startBit >= 0 and rows in [1, 63], got ($startBit, $rows)")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"srp_key requires an array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SrpKey.compute(input.asInstanceOf[ArrayData], startBit, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SrpKey.compute($c, $startBit, $rows)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpKey {

  /** Null elements are SKIPPED (a missing dimension contributes 0 to the
    * projection) — the SQL surface accepts array<double> with nullable
    * elements, where reading a null slot as garbage would corrupt signs.
    */
  def compute(vec: ArrayData, startBit: Int, rows: Int): Long = {
    val n = vec.numElements()
    var key = 0L
    var j = 0
    while (j < rows) {
      val bit = startBit + j
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val sign =
            if ((i * 2654435761L + bit * 40503L) % 97 % 2 == 0) 1.0 else -1.0
          s += vec.getDouble(i) * sign
        }
        i += 1
      }
      if (s > 0) key |= 1L << j
      j += 1
    }
    key
  }

  def apply(c: Column, startBit: Int, rows: Int): Column =
    Glue.column(SrpKey(Glue.expression(c), startBit, rows))
}
