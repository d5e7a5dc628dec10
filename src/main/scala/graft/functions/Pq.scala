package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product-quantization kernels (the storage/scoring halves of the
  * IVF-PQ probe, [[graft.operators.Pq]]).
  *
  * Layout conventions shared by all three expressions:
  *  - a vector of dimension `dim` splits into `m` contiguous subspaces
  *    of `dsub = dim / m` elements each;
  *  - the codebook is `k` SAMPLE VECTORS flattened sample-major
  *    (`cb[c*dim + e]` = element `e` of sample `c`) — subspace `j`'s
  *    codeword `c` is the sample's own slice `[j*dsub, (j+1)*dsub)`,
  *    so ONE flat array serves every subspace and the DuckDB oracle
  *    can re-derive it with a row_number() sample + list slices;
  *  - codes store one UNSIGNED byte per subspace (k <= 256).
  *
  * All arithmetic is double, folded strictly left-to-right in ascending
  * element / subspace order — bit-identical to an oracle computing the
  * same slices with ordered list folds (the repo-wide determinism
  * discipline; see Similarity's header note).
  */
object PqShared {
  /** Validate (vecLen, cbLen, m, k) consistency once per row — loud on
    * any mismatch (a silent prefix/wraparound would corrupt every
    * downstream distance, the [[Int8Dot]] philosophy). Returns dsub.
    */
  def geometry(vecLen: Int, cbLen: Int, m: Int, k: Int): Int = {
    if (m < 1 || k < 1 || k > 256)
      throw new ArithmeticException(
        s"pq: need m >= 1 and 1 <= k <= 256, got m=$m k=$k")
    if (vecLen == 0 || vecLen % m != 0)
      throw new ArithmeticException(
        s"pq: vector dimension $vecLen is not divisible into m=$m subspaces")
    if (cbLen != k.toLong * vecLen)
      throw new ArithmeticException(
        s"pq: codebook length $cbLen != k*dim = ${k.toLong * vecLen} " +
          s"(k=$k dim=$vecLen) — codebook and vectors disagree on geometry")
    vecLen / m
  }

  def nullElement(what: String): Nothing =
    throw new ArithmeticException(
      s"pq: null $what element — a null would score as garbage, " +
        "silently corrupting every downstream distance")

  /** One up-front null sweep over the vector — the per-codeword inner
    * loops visit each vector element k times, so checking there would
    * re-ask the same answer k times on the hot kernel path. (Codebook
    * elements are each visited once per row, so their checks stay
    * inline.)
    */
  def requireNoNulls(v: ArrayData, what: String): Unit = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) nullElement(what)
      i += 1
    }
  }
}

/** Encode a double vector to its `m` PQ codes (BINARY, one unsigned
  * byte per subspace): code j = the codeword index minimizing the
  * squared L2 distance between subspace j of the vector and subspace j
  * of sample c, scanning c ascending and keeping the FIRST minimum
  * (strict `<`), so ties break toward the smaller codeword index —
  * the same rule as a `row_number() ORDER BY dist, c` oracle.
  */
case class PqEncode(vec: Expression, codebook: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires two array<double> inputs, got " +
          s"${a.simpleString} and ${b.simpleString}")
    }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      s"${ev.value} = graft.functions.PqEncode.encode($v, $cb, $m, $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebook = newRight)
}

object PqEncode {
  def apply(vec: Column, codebook: Column, m: Int, k: Int): Column =
    Glue.column(PqEncode(Glue.expression(vec), Glue.expression(codebook), m, k))

  /** Shared by eval and generated code (the loop is branchy enough that
    * a helper call beats inlined codegen for compile time; it is still
    * monomorphic and JIT-friendly).
    */
  def encode(v: ArrayData, cb: ArrayData, m: Int, k: Int): Array[Byte] = {
    val dim = v.numElements()
    val dsub = PqShared.geometry(dim, cb.numElements(), m, k)
    PqShared.requireNoNulls(v, "vector")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var bestC = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val cOff = c * dim + off
        var d = 0.0
        var i = 0
        while (i < dsub) {
          if (cb.isNullAt(cOff + i)) PqShared.nullElement("codebook")
          val t = v.getDouble(off + i) - cb.getDouble(cOff + i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(j) = bestC.toByte // k <= 256: unsigned byte, read back & 0xFF
      j += 1
    }
    out
  }
}

/** The query-side ADC lookup table: `lut[j*k + c]` = the dot product of
  * subspace j of the query vector with subspace j of sample c (ordered
  * left-to-right within the subspace). Computed ONCE per query —
  * `m*k*dsub = k*dim` multiplies — so scoring a candidate collapses to
  * `m` table lookups ([[PqAdc]]) instead of `dim` multiplies: the
  * asymmetric-distance trade that makes PQ scoring cheaper than even
  * the int8 dot at the same recall point.
  */
case class PqLut(vec: Expression, codebook: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires two array<double> inputs, got " +
          s"${a.simpleString} and ${b.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, cb: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      PqLut.lut(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.PqLut.lut($v, $cb, $m, $k));"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebook = newRight)
}

object PqLut {
  def apply(vec: Column, codebook: Column, m: Int, k: Int): Column =
    Glue.column(PqLut(Glue.expression(vec), Glue.expression(codebook), m, k))

  def lut(v: ArrayData, cb: ArrayData, m: Int, k: Int): Array[Double] = {
    val dim = v.numElements()
    val dsub = PqShared.geometry(dim, cb.numElements(), m, k)
    PqShared.requireNoNulls(v, "vector")
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var c = 0
      while (c < k) {
        val cOff = c * dim + off
        var s = 0.0
        var i = 0
        while (i < dsub) {
          if (cb.isNullAt(cOff + i)) PqShared.nullElement("codebook")
          s += v.getDouble(off + i) * cb.getDouble(cOff + i)
          i += 1
        }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    out
  }
}

/** The ADC score: sum over subspaces (ascending j, left fold from 0.0)
  * of `lut[j*k + code_j]` — `m` lookups and adds per candidate. Equals
  * the dot product of the query with the candidate's RECONSTRUCTED
  * vector, grouped per-subspace: the oracle mirrors the grouping with
  * `list_reduce` over per-subspace `list_dot_product` slices, so both
  * engines add the same partials in the same order.
  *
  * Mismatched geometry (lut length not a multiple of `k` times the
  * code count, or a code >= k) fails loudly — scoring through a wrong
  * table would return a plausible wrong shortlist.
  */
case class PqAdc(codes: Expression, lut: Expression, k: Int)
    extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = lut

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (binary, array<double>), got " +
          s"${a.simpleString} and ${b.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(c: Any, l: Any): Any =
    PqAdc.adc(c.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      s"${ev.value} = graft.functions.PqAdc.adc($c, $l, $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, lut = newRight)
}

object PqAdc {
  def apply(codes: Column, lut: Column, k: Int): Column =
    Glue.column(PqAdc(Glue.expression(codes), Glue.expression(lut), k))

  def adc(codes: Array[Byte], lut: ArrayData, k: Int): Double = {
    val m = codes.length
    if (lut.numElements() != m * k)
      throw new ArithmeticException(
        s"pq_adc: lut length ${lut.numElements()} != m*k = ${m * k} " +
          s"(m=$m k=$k) — codes and table disagree on geometry")
    var s = 0.0
    var j = 0
    while (j < m) {
      val code = codes(j) & 0xFF
      if (code >= k)
        throw new ArithmeticException(
          s"pq_adc: code $code >= k=$k at subspace $j — codes were " +
            "built against a different codebook geometry")
      if (lut.isNullAt(j * k + code)) PqShared.nullElement("lut")
      s += lut.getDouble(j * k + code)
      j += 1
    }
    s
  }
}
