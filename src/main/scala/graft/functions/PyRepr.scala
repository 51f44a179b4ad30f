package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python `repr(float)` as a real codegen expression — the distributed
  * form of [[graft.sinks.PyFormat.pyFloatRepr]] (shortest-roundtrip
  * digits, Python exponent/precision rules; parity pinned by SinksSpec
  * goldens and the PropertySpec roundtrip law). Lets any sink that
  * needs Python float text (Prometheus samples, JSON payloads) render
  * inside whole-stage codegen instead of collecting rows to the driver.
  */
case class PyRepr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.sinks.PyFormat.pyFloatRepr(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sinks.PyFormat.pyFloatRepr($c))")

  override protected def withNewChildInternal(newChild: Expression): PyRepr =
    copy(child = newChild)
}

object PyRepr {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(PyRepr(graftbridge.expression(c)))
  }
}
