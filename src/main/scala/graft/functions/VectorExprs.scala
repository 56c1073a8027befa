package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer vector kernels.
  *
  * The composable form `aggregate(zip_with(a, b, _ * _), 0L, _ + _)` is
  * semantically right but Spark's higher-order functions are
  * CodegenFallback: every row pays interpreted lambda dispatch per element
  * (2 * Dim closures per dot product), and the surrounding operator's
  * whole-stage codegen splits around them. These expressions emit one
  * fused loop inside the generated code instead — the SURVEY §2 preference
  * order in action: compose built-ins where they codegen; write a custom
  * `Expression` (with doGenCode) exactly where they don't.
  *
  * Contract (matches the engine's quantized-vector invariants, asserted by
  * VectorExprsSpec against the HOF formulation): both inputs are
  * array<bigint> of equal length with no NULL elements; a NULL array
  * yields NULL (nullSafeEval / nullSafeCodeGen); MISMATCHED lengths yield
  * NULL too — matching the aggregate(zip_with(...)) formulation this
  * replaces (zip_with null-pads the shorter side and the sum
  * null-propagates), so an upstream dimension bug surfaces as a visible
  * NULL instead of a plausible-but-wrong truncated fold.
  */
abstract class LongVectorFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // length mismatch -> NULL

  /** Java source for one element's contribution, given element exprs. */
  protected def elemJava(x: String, y: String): String
  protected def elemEval(x: Long, y: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0L
      var i = 0
      while (i < n) { acc += elemEval(x.getLong(i), y.getLong(i)); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${elemJava(s"$a.getLong($i)", s"$b.getLong($i)")};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** sum_i a_i * b_i */
case class LongDot(left: Expression, right: Expression) extends LongVectorFold {
  override protected def elemJava(x: String, y: String): String = s"$x * $y"
  override protected def elemEval(x: Long, y: Long): Long = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}

/** sum_i (a_i - b_i)^2 */
case class LongSqDist(left: Expression, right: Expression) extends LongVectorFold {
  override protected def elemJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def elemEval(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSqDist =
    copy(left = l, right = r)
}

object VectorExprs {
  def dotL(a: Column, b: Column): Column =
    GraftSqlShim.column(LongDot(GraftSqlShim.expression(a),
      GraftSqlShim.expression(b)))
  def sqDistL(a: Column, b: Column): Column =
    GraftSqlShim.column(LongSqDist(GraftSqlShim.expression(a),
      GraftSqlShim.expression(b)))
}
