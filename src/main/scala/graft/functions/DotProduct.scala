package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns
  * (`array<float>` inputs are implicitly cast — a columnar Cast, not a
  * per-element lambda).
  *
  * This is the hot kernel of the similarity/dedup surface (brute-force
  * top-k, IVF probing, embedding near-dup verification). The
  * `aggregate(zip_with(...))` formulation of the same arithmetic is a
  * higher-order function: interpreted, boxing per element, and opaque
  * to whole-stage codegen. This expression compiles to a tight
  * primitive loop inside the generated stage (`doGenCode`) and falls
  * back to an equivalent interpreted loop (`nullSafeEval`) where
  * codegen is disabled.
  *
  * Accumulation order is the left-to-right fold both the HOF form and
  * DuckDB's `list_reduce(list_prepend(0.0, ...))` use, so results are
  * bit-identical across all three (oracle parity holds).
  *
  * Null contract: a null array yields null (BinaryExpression default);
  * elements must be non-null (embedding vectors never carry null
  * lanes). Mismatched lengths dot the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (AbstractDataType itself is
  // private[sql], so the override narrows to the public supertype's
  // concrete subclass)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
