package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Pack an `array<int>` of int8-range values into a BINARY column —
  * the storage half of the IVF-SQ8 probe path. The quantization
  * ALGEBRA stays in the oracle-proven builtin expressions
  * ([[graft.operators.Similarity.quantizeInt8]]'s
  * `round(x / scale, 0)` fold, hash-matched against DuckDB since the
  * q41 row); this expression only narrows the already-rounded ints to
  * bytes, so there is no second rounding to drift. One byte per
  * dimension at rest — an 8× scan-width reduction over the
  * `array<double>` vector column in the probed partitions.
  *
  * Values outside [-128, 127] fail loudly (ANSI spirit): a silent
  * wraparound would corrupt every downstream distance.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_int8 requires array<int>, got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType

  // the null-element refusal only exists where the type system allows
  // null slots — containsNull=false arrays keep the pack loop
  // branch-free
  private def mayHaveNulls: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    val checkNulls = mayHaveNulls
    var i = 0
    while (i < n) {
      if (checkNulls && x.isNullAt(i)) PackInt8.nullElement()
      out(i) = PackInt8.toByteExact(x.getInt(i))
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val nullCheck =
        if (mayHaveNulls)
          s"if ($a.isNullAt($i)) graft.functions.PackInt8.nullElement();"
        else ""
      s"""
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $out[$i] = graft.functions.PackInt8.toByteExact($a.getInt($i));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackInt8 {
  def apply(a: Column): Column = Glue.column(PackInt8(Glue.expression(a)))

  /** Shared by eval and generated code: narrow with a loud overflow. */
  def toByteExact(v: Int): Byte = {
    if (v < Byte.MinValue || v > Byte.MaxValue)
      throw new ArithmeticException(
        s"pack_int8: $v outside int8 range — quantize before packing")
    v.toByte
  }

  /** A null array element would pack as a silent 0 (ArrayData.getInt
    * on a null slot) — exactly the corrupt-every-distance hazard the
    * overflow check refuses, so nulls refuse too.
    */
  def nullElement(): Nothing =
    throw new ArithmeticException(
      "pack_int8: null array element — a null would pack as 0, " +
        "silently corrupting every downstream int8 distance")
}

/** Codegen'd integer dot product of two BINARY int8 vectors (the
  * scoring half of the IVF-SQ8 probe): `sum(a[i] * b[i])` over signed
  * bytes, accumulated in a long — EXACT integer arithmetic, so the
  * result is bit-identical to any engine summing the same ints in any
  * order (no floating-point order sensitivity at all, unlike the
  * double fold). A tight primitive byte loop inside whole-stage
  * codegen; the composable alternative would first have to unpack to
  * arrays and pay interpreted lambda plumbing per element.
  *
  * Mismatched lengths fail loudly ([[PackInt8]]'s overflow/null
  * philosophy): two same-layout q8 columns always agree on dimension,
  * so a mismatch can only mean corruption or a cross-generation dim
  * change — scoring a silent prefix would return a plausible wrong
  * shortlist, the exact hazard the pack side refuses.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires two binary inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = Int8Dot.sameDim(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n =
         |  graft.functions.Int8Dot.sameDim($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a[$i] * $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  def apply(a: Column, b: Column): Column =
    Glue.column(Int8Dot(Glue.expression(a), Glue.expression(b)))

  /** Shared by eval and generated code: the common dimension, with a
    * loud refusal on mismatch — one comparison per row.
    */
  def sameDim(xlen: Int, ylen: Int): Int = {
    if (xlen != ylen)
      throw new ArithmeticException(
        s"int8_dot: dimension mismatch ($xlen vs $ylen) — scoring a " +
          "prefix would silently corrupt the shortlist; the operands " +
          "must come from the same layout/dimension")
    xlen
  }
}
