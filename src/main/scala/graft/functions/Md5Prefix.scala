package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(s), 1, hexLen), 16, 10)` as ONE codegen
  * expression over the raw digest bytes — the engine's deterministic
  * string hash (`TextOps.hash32`/`hash60`), evaluated per shingle
  * occurrence in every text operator's hottest map stage.
  *
  * The composed built-in route allocates a 32-char hex UTF8String per
  * row (`Md5`), slices it (`Substring`) and re-parses the slice as
  * base-16 (`Conv`) — three expression nodes and an allocation to
  * extract bits the digest already holds. This expression reads the
  * first `hexLen` nibbles straight out of the 16-byte digest. Values
  * are bit-identical by construction (a hex prefix IS the digest's
  * leading nibbles, most-significant first); FunctionsSpec pins
  * equivalence against the composed form on randomized inputs, and the
  * DuckDB oracles keep their own `('0x'||substr(md5(s),…))::bigint`
  * spelling, so every hash-gated query re-proves it end-to-end.
  *
  * `hexLen` ≤ 15 keeps the value in 60 bits — always a non-negative
  * long, exactly like `conv(..., 16, 10).cast("long")` for these
  * lengths.
  */
case class Md5PrefixLong(child: Expression, hexLen: Int)
    extends UnaryExpression {
  require(hexLen >= 1 && hexLen <= 15,
    s"Md5PrefixLong supports 1..15 hex chars (60 bits), got $hexLen")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"Md5PrefixLong needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.md5Prefix(input.asInstanceOf[UTF8String], hexLen)

  // NOTE: the helper must NOT be named `eval` — the class inherits
  // Expression.eval(InternalRow), which suppresses the Scala static
  // forwarder for a companion method of the same name, and Janino then
  // fails to resolve the call (the stage silently falls back to the
  // interpreted path, defeating the whole point of the expression)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5PrefixLong.md5Prefix($s, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {

  // MessageDigest.getInstance per row would dominate the hash itself;
  // MD5 digests are cheap but instances are not thread-safe, so one
  // per task thread
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First `hexLen` nibbles of md5(s), most-significant first — the
    * exact value of `conv(substring(md5Hex, 1, hexLen), 16, 10)`.
    */
  def md5Prefix(s: UTF8String, hexLen: Int): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < hexLen) {
      val b = digest(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >>> 4 else b & 0xf
      acc = (acc << 4) | nibble
      i += 1
    }
    acc
  }

  def apply(s: Column, hexLen: Int): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(Md5PrefixLong(graftbridge.expression(s), hexLen))
  }
}
