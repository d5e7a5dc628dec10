package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature of a feature-hash set (`array<long>`): the
  * k minima of the universal hashes `(2i+1)·x + (12345+7i) mod 1e9+7`,
  * i = 0..k−1 — the same algebra as [[TextHash.universalHashSql]] and the
  * DuckDB oracle's `list_min(list_transform(...))` columns, so signatures
  * stay bit-identical across engines.
  *
  * Why a custom expression: the composable form is k interpreted
  * `array_min(transform(...))` lambdas per document (one closure dispatch
  * + boxing per feature PER HASH). Like the SimHash fold before it, that
  * made the minhash query's wall time hostage to cache residency — evict
  * the upstream shingle blocks and the interpreted lambdas re-run at
  * 10–30× cost. This expression is one compiled k×n primitive loop inside
  * whole-stage codegen, cheap enough that caching stops mattering.
  *
  * Null semantics match the composable form: null array ⇒ null; null
  * elements are skipped (as `array_min` ignores nulls); an array with no
  * non-null elements ⇒ null (as `array_min` of an empty transform).
  */
case class MinHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 && k <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"min_hashes k must be in [1, 64], got $k")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"min_hashes requires an array<bigint> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashes.compute($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashes {
  val P = TextHash.P

  /** All k universal-hash minima in one pass; null when the input has no
    * non-null elements (mirrors `array_min` over an empty/all-null array).
    * The coefficients are [[TextHash.uhA]]/[[uhB]] (the one shared
    * definition), hoisted into two k-long arrays per call — recomputing
    * them per (element, hash) pair roughly doubled the kernel's inner
    * arithmetic, in the loop whose whole purpose is to make cache
    * residency stop mattering.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var j = 0
    while (j < k) { as(j) = TextHash.uhA(j); bs(j) = TextHash.uhB(j); j += 1 }
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val x = arr.getLong(i)
        var j2 = 0
        while (j2 < k) {
          val h = (as(j2) * x + bs(j2)) % P
          if (h < mins(j2)) mins(j2) = h
          j2 += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  def apply(c: Column, k: Int): Column =
    Glue.column(MinHashes(Glue.expression(c), k))
}
