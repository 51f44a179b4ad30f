package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Base58 (Bitcoin/Solana alphabet) validation
  * (reference: dexscraper/scraper.py:925-946 — a probable Solana address
  * is 32-44 base58 chars whose full decode, including leading-'1' zero
  * bytes, is exactly 32 bytes).
  */
object Base58 {
  private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  // -1 = invalid char; index otherwise. Covers the full ASCII range.
  private val Index: Array[Byte] = {
    val t = Array.fill[Byte](128)(-1)
    Alphabet.zipWithIndex.foreach { case (ch, i) => t(ch) = i.toByte }
    t
  }

  /** Decoded byte length of a base58 string, or -1 if any char is invalid.
    * Long-division in base 58 over a byte buffer — no BigInteger churn on
    * the mining hot path.
    */
  def decodedLength(s: String): Int = {
    val n = s.length
    var leadingOnes = 0
    while (leadingOnes < n && s.charAt(leadingOnes) == '1') leadingOnes += 1
    // Upper bound for decoded size: n * log(58)/log(256) + 1
    val buf = new Array[Int](n)
    var bufLen = 0
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch >= 128 || Index(ch) < 0) return -1
      var carry: Int = Index(ch)
      var j = 0
      while (j < bufLen) {
        carry += buf(j) * 58
        buf(j) = carry & 0xff
        carry >>= 8
        j += 1
      }
      while (carry > 0) {
        buf(bufLen) = carry & 0xff
        carry >>= 8
        bufLen += 1
      }
      i += 1
    }
    // bufLen counts significant bytes of the numeric value; the reference
    // prepends one zero byte per leading '1' of the WHOLE string prefix.
    leadingOnes + bufLen
  }

  def isProbableSolanaAddress(s: String): Boolean =
    s != null && s.length >= 32 && s.length <= 44 && decodedLength(s) == 32

  case class IsBase58Address(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      isProbableSolanaAddress(input.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Base58.isProbableSolanaAddress($c.toString())")
    override protected def withNewChildInternal(newChild: Expression): IsBase58Address =
      copy(child = newChild)
  }
}
