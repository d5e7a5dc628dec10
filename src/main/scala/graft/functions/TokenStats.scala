package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd fused whitespace-token statistics of a string:
  * `struct(n_tokens, sum_len, n_distinct)` in ONE compiled pass — the
  * fusion of `split(trim(text), "\\s+")` → `size(toks)` /
  * `aggregate(toks, 0L, (s, t) -> s + length(t))` /
  * `size(array_distinct(toks))`, bit-identical to those interpreted
  * pipelines step for step: same tokenization ([[Tokenize]]), token
  * lengths in CODE POINTS (what Spark's `length()` and DuckDB's
  * `length()` both count — `String.length` would diverge on
  * supplementary-plane text), distinct on exact token STRINGS (no
  * hashing, so no collision can ever disagree with `array_distinct`),
  * and NULL for null text exactly like the lambda forms propagate it.
  *
  * Why: the quality-scoring family ran 2–3 interpreted lambdas per
  * document per metric; like [[ShingleHashes]], fusing them keeps the
  * whole quality projection inside whole-stage codegen.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TokenStats.schema

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  def compute(text: UTF8String): InternalRow = {
    val toks = Tokenize.split(text)
    var sum = 0L
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sum += t.codePointCount(0, t.length)
      seen.add(t)
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length.toLong, sum, seen.size.toLong))
  }

  def apply(c: Column): Column = Glue.column(TokenStats(Glue.expression(c)))
}
