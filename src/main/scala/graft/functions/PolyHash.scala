package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash of a string:
  * `fold(chars)(acc = (acc * 31 + code) mod 1e9+7)`.
  *
  * Same function as the portable SQL fold in [[TextHash.polyHashSql]] and
  * the DuckDB oracle fragment — but the char loop runs as compiled code
  * instead of ~20 interpreted lambda steps per character, which matters
  * when hashing 10⁵–10⁸ shingles (the fold form made the n-gram dedup
  * query ~400 s at bench scale; this takes it to seconds).
  *
  * Code points are UTF-16 units (`charAt`), identical to `ascii()`-based
  * folds for all BMP text; the fixtures are ASCII.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  val P = TextHash.P

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % P
      i += 1
    }
    acc
  }

  def apply(c: Column): Column = Glue.column(PolyHash(Glue.expression(c)))
}
