package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}

/** Successor pairs of a token array: element i of the result is the
  * struct `(prev = toks(i), cur = toks(i+1))`, with the final element's
  * `cur` NULL — the single exploded frame that feeds BOTH the bigram
  * model (cur non-null rows) and the unigram vocabulary (every token
  * occurrence appears as `prev` exactly once) in
  * [[graft.operators.TextAnalysis.perplexityBigram]].
  *
  * Bit-identical to the composable formulation it replaces
  * (`zip_with(toks, concat(slice(toks, 2, …), array(NULL)), …)`),
  * asserted by spec. Why a custom expression: that chain is three
  * interpreted higher-order/array ops with a lambda dispatch and two
  * array copies per document, measured at ~3× the cost of the
  * tokenizing scan itself at sf0.1 (0.45 s vs 0.14 s per corpus pass) —
  * and the bigram operator pays it on BOTH its corpus passes. This is
  * one compiled loop inside whole-stage codegen.
  */
case class TokenSuccessors(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_successors requires an array<string> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("prev", StringType, nullable = true),
      StructField("cur", StringType, nullable = true))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenSuccessors.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSuccessors.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSuccessors {

  /** One pass, no intermediate arrays. Null input slots (not produced
    * by `split`, but legal in the array<string> surface) pass through
    * as null `prev`/`cur` values, exactly as the zip_with form did.
    */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val prev = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val cur =
        if (i + 1 < n && !toks.isNullAt(i + 1)) toks.getUTF8String(i + 1)
        else null
      out(i) = new GenericInternalRow(Array[Any](prev, cur)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = Glue.column(TokenSuccessors(Glue.expression(c)))
}
