package graft.sinks

import graft.model.TokenProfile

/** O14: the Rich-TUI layer rendered as plain strings (reference:
  * dexscraper/cli.py:168-241 table, :402-539 panels). The reference's
  * version is a `rich` Layout; the content — column set, value formats,
  * confidence emoji thresholds, stats arithmetic, quality status — is
  * reproduced exactly, minus ANSI styling. Deterministic: wall-clock
  * inputs (cycle, duration, clock string) are injected, never read.
  *
  * This is presentation over an already-computed top-K batch (≤10 rows),
  * so it runs driver-side by construction — no distributed concern.
  */
object Tui {

  /** cli.py:219-230. Python truthiness: `if token.symbol and ...` skips
    * empty strings, not just None — mirror with nonEmpty filters.
    */
  def displayName(t: TokenProfile, index: Int): String =
    t.symbol.filter(s => s.nonEmpty && !s.startsWith("TOKEN_")).map(_.take(15))
      .orElse(t.token_name.filter(_.nonEmpty).map(_.take(15)))
      .getOrElse(f"UNKNOWN_$index%02d")

  /** cli.py:204-213 */
  def confEmoji(conf: Double): String =
    if (conf >= 0.8) "⚡" else if (conf >= 0.6) "⭐"
    else if (conf >= 0.4) "🟡" else "🔴"

  /** Python `:.Nf` fixed formatting (round-half-even over the exact
    * binary value — Java's %.Nf rounds half-up and diverges on ties).
    */
  def pyFixed(v: Double, n: Int): String =
    new java.math.BigDecimal(v)
      .setScale(n, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** Python `:,` integer grouping. */
  def pyGrouped(v: Long): String = {
    val s = math.abs(v).toString
    val grouped = s.reverse.grouped(3).mkString(",").reverse
    (if (v < 0) "-" else "") + grouped
  }

  /** cli.py:232-241 */
  def formatLargeNumber(num: Double): String =
    if (num >= 1000000000d) "$" + pyFixed(num / 1000000000d, 1) + "B"
    else if (num >= 1000000d) "$" + pyFixed(num / 1000000d, 1) + "M"
    else if (num >= 1000d) "$" + pyFixed(num / 1000d, 0) + "K"
    else "$" + pyFixed(num, 0)

  private val Widths = Seq(16, 12, 10, 8, 8, 6)
  private val Headers = Seq("Token", "Price", "Volume", "Txns", "Makers", "Conf")

  private def pad(s: String, w: Int, right: Boolean): String =
    if (s.length >= w) s.take(w)
    else if (right) (" " * (w - s.length)) + s
    else s + " " * (w - s.length)

  /** cli.py:168-217: the token table over the T1 top-10 (confidence desc,
    * field_count desc), with the reference's per-column formats.
    */
  def tokenTable(tokens: Seq[TokenProfile]): String = {
    val top = tokens.sortBy(t => (-t.confidence_score, -t.field_count)).take(10)
    val sb = new StringBuilder
    sb.append("👻 Haunted Market Data\n")
    val header = Headers.zip(Widths).map { case (h, w) => pad(h, w, right = false) }
    sb.append(header.mkString(" | ")).append('\n')
    sb.append(Widths.map("-" * _).mkString("-+-")).append('\n')
    top.zipWithIndex.foreach { case (t, i) =>
      // cli.py:194-202 uses `if token.price` etc. — Python truthiness, so
      // a present-but-zero metric renders "N/A" exactly like a missing one.
      val cells = Seq(
        (displayName(t, i), false),
        (t.price.filter(_ != 0.0).map(p => "$" + pyFixed(p, 6)).getOrElse("N/A"), true),
        (t.volume_24h.filter(_ != 0.0).map(formatLargeNumber).getOrElse("N/A"), true),
        (t.txns_24h.filter(_ != 0).map(v => pyGrouped(v.toLong)).getOrElse("N/A"), true),
        (t.makers.filter(_ != 0).map(v => pyGrouped(v.toLong)).getOrElse("N/A"), true),
        (confEmoji(t.confidence_score), true))
      sb.append(cells.zip(Widths).map { case ((s, r), w) => pad(s, w, r) }
        .mkString(" | ")).append('\n')
    }
    sb.toString
  }

  /** Fixed-width HH:mm:ss clock from unix seconds (UTC) — the one
    * formatter both the streaming TUI and `--once` rich output use.
    * (`LocalTime.toString` would drop the seconds field when it is zero,
    * diverging from the reference's strftime("%H:%M:%S").)
    */
  def clockString(epochSeconds: Long): String =
    java.time.Instant.ofEpochSecond(epochSeconds)
      .atZone(java.time.ZoneOffset.UTC).toLocalTime
      .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))

  /** cli.py:417-496: three stats columns. `extractionRate` and clock are
    * injected for determinism (the reference reads time.time()/now()).
    */
  def statsPanel(tokens: Seq[TokenProfile], totalExtracted: Long,
      highConfidence: Long, complete: Long, cycle: Long,
      sessionSeconds: Double, clock: String): String = {
    val rate = cycle / math.max(sessionSeconds / 60.0, 0.1)
    val totalVol = tokens.flatMap(_.volume_24h).sum
    val volStr =
      if (totalVol >= 1000000d) "$" + pyFixed(totalVol / 1000000d, 1) + "M"
      else "$" + pyFixed(totalVol / 1000d, 0) + "K"
    val avgConf = tokens.map(_.confidence_score).sum / math.max(tokens.length, 1)
    Seq(
      "📈 LIVE STATISTICS 📈",
      s"📊 EXTRACTION  Total: $totalExtracted  High Conf: $highConfidence  Complete: $complete",
      s"⚡ SESSION  Cycle: #$cycle  Rate: ${pyFixed(rate, 1)}/min  Uptime: ${pyFixed(sessionSeconds, 0)}s",
      s"💎 MARKET  Volume: $volStr  Avg Conf: ${pyFixed(avgConf * 100, 0)}%  Time: $clock"
    ).mkString("\n")
  }

  /** cli.py:498-519 */
  def footer(highConfidence: Long): String = {
    val status =
      if (highConfidence >= 15) "🟢 EXCELLENT"
      else if (highConfidence >= 10) "🟡 GOOD"
      else "🔴 POOR"
    s"Data Quality: $status | Press Ctrl+C to exit | 🔄 Auto-refresh: 5s"
  }

  /** cli.py:521-539: header / stats / table / footer layout. */
  def render(tokens: Seq[TokenProfile], totalExtracted: Long, highConfidence: Long,
      complete: Long, cycle: Long, sessionSeconds: Double, clock: String): String =
    Seq(
      "🔷 DEXSCRAPER PRO 🔷\nReal-time DeFi Market Intelligence",
      statsPanel(tokens, totalExtracted, highConfidence, complete, cycle,
        sessionSeconds, clock),
      tokenTable(tokens),
      footer(highConfidence)
    ).mkString("\n\n")
}
