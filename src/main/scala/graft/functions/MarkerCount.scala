package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd marker-lexicon token count: how many whitespace tokens of a
  * string are members of a fixed word set — the fused form of
  * `size(filter(toks, t -> t IN (...)))` (every OCCURRENCE counts, not
  * distinct words, exactly like the interpreted filter). One compiled
  * pass per document; the lexicon rides as a reference object, probed
  * with a hash set instead of an N-way IN chain per token. This is the
  * language-ID / stopword-ratio hot loop (4 lexicons × every token of
  * every doc). Null text counts 0.
  */
case class MarkerCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if words.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure("marker_count needs a non-empty lexicon")
    case t => TypeCheckResult.TypeCheckFailure(
      s"marker_count requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def eval(input: InternalRow): Any =
    MarkerCount.compute(child.eval(input).asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val setRef = ctx.addReferenceObj("markerWords", wordSet,
      classOf[java.util.HashSet[String]].getName)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.MarkerCount.compute(
          ${c.isNull} ? null : ${c.value}, $setRef);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCount {
  private val Ws = Pattern.compile("\\s+")

  def compute(text: UTF8String, words: java.util.HashSet[String]): Long = {
    if (text == null) return 0L
    val toks = Ws.split(text.trim().toString, -1)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (words.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  def apply(c: Column, words: Seq[String]): Column =
    Glue.column(MarkerCount(Glue.expression(c), words))
}
