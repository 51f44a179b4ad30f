package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as ONE codegen'd expression — the primitive
  * under every near-dup path (MinHash signatures q17/q18/q55/q68/q70,
  * Jaccard q16/q47, decontamination q67/q68). The two composition
  * routes Spark offers both pay structurally:
  *
  *   - `transform(sequence(...), slice(...))` — higher-order functions
  *     are interpreted (CodegenFallback) and break the whole-stage span;
  *   - posexplode + window `lead` — codegen'd, but the window SHUFFLES
  *     the tokenized corpus on doc id: a full-data exchange at 100 TB
  *     for a computation that is purely per-row.
  *
  * This expression is per-row AND codegen'd: shingle k of a
  * space-joined text is exactly the byte range [start of token k, end
  * of token k+n−1] (0x20 never occurs inside a UTF-8 multibyte
  * sequence, so byte scanning is char-safe), so each shingle is a
  * zero-copy `UTF8String.fromBytes` slice of the doc's byte array —
  * no per-token string churn at all. Matches `split(text, ' ')`
  * semantics exactly, including empty tokens from doubled/leading/
  * trailing spaces (FunctionsSpec pins equivalence against the HOF
  * formulation).
  */
object Shingles {

  /** One UTF8String slice per shingle OCCURRENCE, in document order;
    * null text → empty array (mirrors `when(size(...) >= 1, ...)
    * .otherwise(empty)` in the HOF formulation).
    */
  def shingleArray(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val tokens = spaces + 1
    val count = tokens - n + 1
    if (count < 1) return new GenericArrayData(Array.empty[Any])
    // starts(k) = byte offset of token k; sentinel start of token
    // `tokens` = len + 1 so `starts(k + n) - 1` is the end of token
    // k+n-1 for the last shingle too
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(tokens) = len + 1
    val out = new Array[Any](count)
    var s = 0
    while (s < count) {
      val from = starts(s)
      out(s) = UTF8String.fromBytes(bytes, from, starts(s + n) - 1 - from)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** `word_shingle_rows`-style scalar: array<string> of shingle
    * occurrences. `n` is a plan-time constant (it shapes the output,
    * not the data), so it is a constructor Int, not a child expression.
    */
  case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "word_shingles"
    override def eval(input: InternalRow): Any =
      shingleArray(child.eval(input).asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})" else c.value
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.Shingles.shingleArray($childVal, $n);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
      copy(child = newChild)
  }
}
