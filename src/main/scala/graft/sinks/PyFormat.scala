package graft.sinks

/** Python-compatible value formatting for sink parity: the reference
  * serializes floats via `repr`/`str` (shortest round-trip decimal with
  * Python's positional/scientific switchover) and JSON via
  * `json.dumps(separators=(",", ":"))`. Java's `Double.toString` uses
  * different thresholds and exponent syntax, so exact-parity sinks format
  * through this shim.
  */
object PyFormat {

  /** repr(float): shortest round-trip decimal; positional when the
    * power-of-ten exponent E satisfies -4 <= E < 16, else scientific with
    * a two-digit signed exponent.
    */
  def pyFloatRepr(v: Double): String = {
    if (v.isNaN) return "nan"
    if (v == Double.PositiveInfinity) return "inf"
    if (v == Double.NegativeInfinity) return "-inf"
    if (v == 0.0) return if (1.0 / v < 0) "-0.0" else "0.0"

    // Shortest precision that round-trips through %.pe
    var p = 0
    var s = String.format("%.0e", Double.box(v))
    while (java.lang.Double.parseDouble(s) != v && p < 17) {
      p += 1
      s = String.format(s"%.${p}e", Double.box(v))
    }
    val Array(mantissa, expStr) = s.split("e")
    val exp = expStr.toInt
    val neg = mantissa.startsWith("-")
    val digits = mantissa.replace("-", "").replace(".", "")
      .reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case d => d
    }
    val sign = if (neg) "-" else ""

    if (exp >= -4 && exp < 16) {
      // positional
      val body =
        if (exp >= 0) {
          if (digits.length > exp + 1)
            digits.take(exp + 1) + "." + digits.drop(exp + 1)
          else
            digits + "0" * (exp + 1 - digits.length) + ".0"
        } else {
          "0." + "0" * (-exp - 1) + digits
        }
      sign + body
    } else {
      val m = if (digits.length > 1) digits.take(1) + "." + digits.drop(1) else digits
      val eSign = if (exp < 0) "-" else "+"
      val eAbs = math.abs(exp)
      val ePad = if (eAbs < 10) s"0$eAbs" else eAbs.toString
      s"$sign${m}e$eSign$ePad"
    }
  }

  /** str(int-or-float-typed number) as Python would print it. */
  def pyNum(v: Any): String = v match {
    case d: Double => pyFloatRepr(d)
    case f: Float => pyFloatRepr(f.toDouble)
    case other => other.toString
  }

  /** JSON string escaping per json.dumps defaults (ensure_ascii=True). */
  def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** json.dumps(value, separators=(",", ":")) over a minimal value model:
    * None/Option, String, Long/Int, Double, Boolean, Seq, ordered pairs.
    */
  def jsonValue(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => jsonValue(x)
    case s: String => jsonString(s)
    case d: Double => pyFloatRepr(d)
    case f: Float => pyFloatRepr(f.toDouble)
    case b: Boolean => if (b) "true" else "false"
    case m: Seq[_] if m.nonEmpty && m.head.isInstanceOf[(_, _)] =>
      jsonObj(m.asInstanceOf[Seq[(String, Any)]])
    case m: Seq[_] => m.map(jsonValue).mkString("[", ",", "]")
    case other => other.toString // Int, Long
  }

  def jsonObj(fields: Seq[(String, Any)]): String =
    fields.map { case (k, v) => jsonString(k) + ":" + jsonValue(v) }
      .mkString("{", ",", "}")

  private val utcFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  private val mt5Fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy.MM.dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  private val isoFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  /** Reference formats timestamps in local time; we pin UTC (intentional
    * divergence, SURVEY §1.2).
    */
  def tsDisplay(unixSeconds: Long): String = utcFmt.format(java.time.Instant.ofEpochSecond(unixSeconds))
  def tsMt5(unixSeconds: Long): String = mt5Fmt.format(java.time.Instant.ofEpochSecond(unixSeconds))
  def tsIso(unixSeconds: Long): String = isoFmt.format(java.time.Instant.ofEpochSecond(unixSeconds))
}
