package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd fused whitespace-token statistics of a string:
  * `struct(n_tokens, sum_len, n_distinct)` in ONE compiled pass — the
  * fusion of `split(trim(text), "\\s+")` → `size(toks)` /
  * `aggregate(toks, 0L, (s, t) -> s + length(t))` /
  * `size(array_distinct(toks))`, bit-identical to those interpreted
  * pipelines step for step (same space-only trim, same Java-regex split
  * with its leading empty token, distinct on exact token STRINGS — no
  * hashing, so no collision can ever disagree with `array_distinct`).
  *
  * Why: the quality-scoring family ran 2–3 interpreted lambdas per
  * document per metric; like [[ShingleHashes]], fusing them keeps the
  * whole quality projection inside whole-stage codegen. Null text
  * yields (0, 0, 0) — no tokens, nothing to measure.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TokenStats.schema

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStats.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.TokenStats.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  private val Ws = Pattern.compile("\\s+")
  private val Zero = new GenericInternalRow(Array[Any](0L, 0L, 0L))

  def compute(text: UTF8String): InternalRow = {
    if (text == null) return Zero
    val toks = Ws.split(text.trim().toString, -1)
    var sum = 0L
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      sum += toks(i).length
      seen.add(toks(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length.toLong, sum, seen.size.toLong))
  }

  def apply(c: Column): Column = Glue.column(TokenStats(Glue.expression(c)))
}
