package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two bigint arrays as a real codegen
  * expression. The built-in route (`aggregate(zip_with(...))`) is a
  * higher-order function — interpreted, never codegen'd — and dominated
  * the similarity queries' runtime; this compiles to a tight primitive
  * loop inside whole-stage codegen.
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(DotLong(graftbridge.expression(a), graftbridge.expression(b)))
  }
}
