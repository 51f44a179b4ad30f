package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer squared L2 distance Σ(aᵢ·scale − bᵢ)² of two bigint
  * arrays as a real codegen expression — [[DotLong]]'s sibling for the
  * k-means / IVF hot loop, where it runs once per (vector × centroid)
  * pair under a broadcast. The built-in route
  * (`aggregate(zip_with(...))`) is a higher-order function —
  * interpreted, never codegen'd. `scale` folds the fixed-point
  * alignment (raw int8/int32 vectors vs ×1000 centroids) into the same
  * fused loop instead of a separate interpreted `transform`.
  */
case class Dist2Long(left: Expression, right: Expression, scale: Long)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dist2_long"

  // Length-mismatched arrays yield NULL — same contract as the
  // `aggregate(zip_with(...))` formulation this expression replaced: a
  // ragged/corrupt vector must surface as null (and be filtered or
  // flagged), never silently score as a plausible small distance over
  // the common prefix.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) * scale - y.getLong(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $x.getLong($i) * ${scale}L - $y.getLong($i);
         |    $sum += $d * $d;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Dist2Long =
    copy(left = newLeft, right = newRight)
}

object Dist2Long {
  def apply(a: Column, b: Column, scale: Long = 1L): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(Dist2Long(graftbridge.expression(a), graftbridge.expression(b), scale))
  }
}
