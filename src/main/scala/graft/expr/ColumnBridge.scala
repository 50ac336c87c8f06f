/* Package-injected shim: ExpressionUtils and several expression
 * supertypes are private[sql] in Spark 4 (Column no longer exposes
 * .expr publicly), so a library registering custom Catalyst expressions
 * needs a small bridge inside the sql package namespace. No Spark
 * internals are modified — this defines new expressions and re-exports
 * two conversions. */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Native Catalyst expression for the embedding dot product: a tight
  * codegen'd loop over two float arrays with per-element FLOAT→DOUBLE
  * promotion and ascending-index accumulation — the exact IEEE sequence
  * of `aggregate(zip_with(a, b, (x,y) => x*y), 0d, +)`, so results are
  * bit-identical to the declarative fold (and to the DuckDB oracle), at
  * a fraction of the cost: higher-order functions evaluate interpreted
  * lambdas per element, while this stays inside whole-stage codegen.
  *
  * Contract (matches the corpus): equal-length arrays, no null
  * elements. Null array → null result (nullSafe).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType, containsNull = false),
      ArrayType(FloatType, containsNull = false))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}
