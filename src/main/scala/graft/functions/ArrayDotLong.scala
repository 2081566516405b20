package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two BIGINT arrays as a native codegen'd
  * Catalyst expression.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0L, _+_)`: Spark's
  * higher-order functions are interpreted (lambda evaluation per
  * element, no whole-stage codegen), which made the similarity queries'
  * inner loop the bottleneck. This expression emits a tight `long` loop
  * into the generated code instead — the custom-Expression tier of the
  * extension ladder (compose built-ins < custom Expression < custom
  * operator).
  *
  * Semantics identical to the higher-order form: Σ a(i)*b(i) over the
  * common prefix length, null if either side is null. Overflow follows
  * Java `long` arithmetic (callers quantize to ≤1e4-scale fixed point,
  * far from the 2^63 edge).
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(LongType, containsNull = false) ||
        left.dataType == ArrayType(LongType, containsNull = true)) {
      if (right.dataType == ArrayType(LongType, containsNull = false) ||
          right.dataType == ArrayType(LongType, containsNull = true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<bigint>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left argument must be array<bigint>, got ${left.dataType}")
  }

  // A pair with a null element contributes NOTHING to the sum — exactly
  // what the DuckDB-oracle form computes (a null term in list_transform
  // is SKIPPED by list_sum, not propagated), so both engines agree even
  // on arrays that carry nulls. The element null checks are emitted only
  // when the input type admits nulls (containsNull) — provably non-null
  // inputs keep the tight branch-free loop.
  private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!(mayHaveNullElements && (x.isNullAt(i) || y.isNullAt(i))))
        acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElements)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) continue;"""
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}
