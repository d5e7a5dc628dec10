package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd marker-lexicon token count: how many whitespace tokens of a
  * string are members of a fixed word set — the fused form of
  * `size(filter(toks, t -> t IN (...)))` (every OCCURRENCE counts, not
  * distinct words, exactly like the interpreted filter; NULL text
  * propagates NULL exactly like it too). One compiled pass per
  * document; the lexicon rides as a reference object, probed with a
  * hash set instead of an N-way IN chain per token.
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

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    MarkerCount.compute(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerWords", wordSet,
      classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkerCount.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCount {
  def compute(text: UTF8String, words: java.util.HashSet[String]): Long = {
    val toks = Tokenize.split(text)
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

/** The multi-lexicon sibling: `array(count_0, …, count_{k-1})` for k
  * word sets in ONE tokenization pass — language ID probes 4 lexicons
  * per document, and paying the trim+split 4 times (once per
  * [[MarkerCount]]) made tokenization the dominant cost of the scan.
  * Same per-lexicon semantics (occurrences, not distinct; NULL text →
  * NULL array).
  */
case class MarkerCounts(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if lexicons.nonEmpty && lexicons.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure("marker_counts needs non-empty lexicons")
    case t => TypeCheckResult.TypeCheckFailure(
      s"marker_counts requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lexicons.map { words =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    MarkerCounts.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerLexicons", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MarkerCounts.compute($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCounts {
  def compute(
      text: UTF8String,
      sets: Array[java.util.HashSet[String]]): GenericArrayData = {
    val toks = Tokenize.split(text)
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(toks(i))) counts(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  def apply(c: Column, lexicons: Seq[Seq[String]]): Column =
    Glue.column(MarkerCounts(Glue.expression(c), lexicons))
}
