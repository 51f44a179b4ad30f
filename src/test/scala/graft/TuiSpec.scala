package graft

import graft.model.TokenProfile
import graft.sinks.Tui
import org.scalatest.funsuite.AnyFunSuite

/** O14 plain-string TUI goldens mirroring cli.py:168-241 and :402-539. */
class TuiSpec extends AnyFunSuite {

  private val token = TokenProfile(
    symbol = Some("PEPE"), price = Some(0.000123), volume_24h = Some(1500000.0),
    txns_24h = Some(12345), makers = Some(678), confidence_score = 0.85,
    field_count = 6)

  test("format_large_number suffixes (cli.py:232-241)") {
    assert(Tui.formatLargeNumber(2500000000.0) == "$2.5B")
    assert(Tui.formatLargeNumber(1500000.0) == "$1.5M")
    assert(Tui.formatLargeNumber(22000.0) == "$22K")
    assert(Tui.formatLargeNumber(999.0) == "$999")
  }

  test("display name fallback chain (cli.py:219-230)") {
    assert(Tui.displayName(token, 0) == "PEPE")
    assert(Tui.displayName(TokenProfile(symbol = Some("TOKEN_3"),
      token_name = Some("RealName")), 0) == "RealName")
    assert(Tui.displayName(TokenProfile(), 7) == "UNKNOWN_07")
    assert(Tui.displayName(TokenProfile(symbol = Some("VERYLONGSYMBOLNAME")), 0) ==
      "VERYLONGSYMBOLN") // truncated at 15
  }

  test("confidence emoji thresholds (cli.py:204-213)") {
    assert(Tui.confEmoji(0.85) == "⚡" && Tui.confEmoji(0.8) == "⚡")
    assert(Tui.confEmoji(0.7) == "⭐" && Tui.confEmoji(0.5) == "🟡")
    assert(Tui.confEmoji(0.1) == "🔴")
  }

  test("python-format helpers: half-even fixed, grouping") {
    assert(Tui.pyFixed(0.125, 2) == "0.12") // half-even, Java %.2f would give 0.13
    assert(Tui.pyFixed(0.000123, 6) == "0.000123")
    assert(Tui.pyGrouped(12345) == "12,345")
    assert(Tui.pyGrouped(1234567) == "1,234,567")
    assert(Tui.pyGrouped(678) == "678")
  }

  test("token table renders the T1 top-10 with formatted cells") {
    val low = token.copy(symbol = Some("LOW"), confidence_score = 0.2,
      price = None, volume_24h = None, txns_24h = None, makers = None)
    val table = Tui.tokenTable(Seq(low, token))
    val lines = table.linesIterator.toSeq
    assert(lines.head.contains("Haunted Market Data"))
    assert(lines(1).startsWith("Token"))
    // high-confidence row sorts first
    assert(lines(3).startsWith("PEPE"))
    assert(lines(3).contains("$0.000123") && lines(3).contains("$1.5M"))
    assert(lines(3).contains("12,345") && lines(3).contains("678"))
    assert(lines(4).startsWith("LOW") && lines(4).contains("N/A"))
  }

  test("stats + footer arithmetic (cli.py:417-519)") {
    val stats = Tui.statsPanel(Seq(token, token), totalExtracted = 20,
      highConfidence = 12, complete = 8, cycle = 3, sessionSeconds = 120.0,
      clock = "12:00:00")
    assert(stats.contains("Total: 20") && stats.contains("High Conf: 12"))
    assert(stats.contains("Cycle: #3") && stats.contains("1.5/min"))
    assert(stats.contains("Volume: $3.0M")) // 2 × 1.5M
    assert(stats.contains("Avg Conf: 85%"))
    assert(Tui.footer(16).contains("EXCELLENT"))
    assert(Tui.footer(12).contains("GOOD"))
    assert(Tui.footer(3).contains("POOR"))
    val full = Tui.render(Seq(token), 10, 5, 3, 1, 60.0, "09:00:00")
    assert(full.contains("DEXSCRAPER PRO") && full.contains("Auto-refresh: 5s"))
  }
}
