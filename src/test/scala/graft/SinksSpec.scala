package graft

import graft.model._
import graft.sinks.{PyFormat, Sinks}
import org.scalatest.funsuite.AnyFunSuite

/** Sink-format goldens mirrored from the reference's tests
  * (tests/test_models.py:28-77) plus Python-format parity checks.
  * Timestamps are rendered in UTC (documented divergence from the
  * reference's local-time rendering), so golden datetimes here are the
  * UTC rendering of the fixture epoch.
  */
class SinksSpec extends AnyFunSuite {

  // FIXTURES.md §A2: 1756793176 = 2025-09-02 06:06:16 UTC
  private val bar = Ohlc(1756793176L, 0.000123, 0.000127, 0.000119, 0.000125,
    1000000.50, Some(150))

  test("pyFloatRepr matches Python repr") {
    val cases = Seq(
      0.0004451 -> "0.0004451",
      0.00001169 -> "1.169e-05",
      3800000.0 -> "3800000.0",
      123.0 -> "123.0",
      0.1 -> "0.1",
      1e16 -> "1e+16",
      1.5e16 -> "1.5e+16",
      0.00012 -> "0.00012",
      -12.5 -> "-12.5",
      1234567890123456.0 -> "1234567890123456.0",
      -16.67 -> "-16.67",
      0.002 * 0.0004451 -> "8.902e-07",
      0.0 -> "0.0")
    cases.foreach { case (v, want) =>
      assert(PyFormat.pyFloatRepr(v) == want, s"repr($v)")
    }
  }

  test("MT5 golden (test_models.py:28-33)") {
    assert(Sinks.formatMt5(bar) ==
      "2025.09.02 06:06:16,0.00012300,0.00012700,0.00011900,0.00012500,1000000")
  }

  test("CSV OHLCV golden (test_models.py:35-40)") {
    assert(Sinks.formatCsv(bar) ==
      "2025-09-02 06:06:16,0.00012300,0.00012700,0.00011900,0.00012500,1000000.50")
  }

  test("OHLCVT golden with trades and with estimate (test_models.py:42-62)") {
    assert(Sinks.formatOhlcvt(bar) ==
      "2025-09-02 06:06:16,0.00012300,0.00012700,0.00011900,0.00012500,1000000.50,150")
    assert(Sinks.formatOhlcvt(bar.copy(trades = None)) ==
      "2025-09-02 06:06:16,0.00012300,0.00012700,0.00011900,0.00012500,1000000.50,1000")
  }

  test("CSV batch includes header and trailing newline") {
    val out = Sinks.formatCsvBatch(Seq(bar))
    assert(out.startsWith("DateTime,Open,High,Low,Close,Volume\n"))
    assert(out.endsWith("\n"))
  }

  private val token = TokenProfile(
    symbol = Some("TEST"), price = Some(0.000123), volume_24h = Some(1000000.50),
    txns_24h = Some(500), makers = Some(25), liquidity = Some(50000.0),
    market_cap = Some(5000000.0), confidence_score = 0.85, field_count = 8,
    timestamp = Some(1756793176L))

  test("streaming JSON envelope shape (scraper.py:1530-1540)") {
    val out = Sinks.formatStreamingJson(Seq(token), 1, 1, 1756793176L)
    assert(out.startsWith("""{"type":"enhanced_tokens","total_extracted":1,"high_confidence_count":1,"tokens":[{"""))
    assert(out.contains(""""price":0.000123"""))
    assert(out.contains(""""token_name":"TEST"""")) // null-coalesced to symbol
    assert(out.contains(""""chain":"solana""""))
    assert(out.contains(""""pair_address":"unknown""""))
    assert(out.endsWith(""""timestamp":1756793176}"""))
    assert(!out.contains("null")) // output dict coalesces every null
  }

  test("TradingView columnar (models.py:463-488)") {
    assert(Sinks.formatTradingView(Seq(bar)) ==
      """{"s":"ok","t":[1756793176],"o":[0.000123],"h":[0.000127],"l":[0.000119],"c":[0.000125],"v":[1000000.5]}""")
  }

  test("Binance klines (models.py:491-524)") {
    val out = Sinks.formatBinanceKlines(Seq(bar))
    assert(out ==
      """[[1756793176000,"0.00012300","0.00012700","0.00011900","0.00012500","1000000.50000000",1756793236000,"1000000.50000000",150,"600000.30000000","600000.30000000","0"]]""")
  }

  test("PancakeSwap map keyed by address (models.py:572-600)") {
    val t = token.copy(token_address = Some("ADDR1"), token_name = Some("Test Token"))
    val out = Sinks.formatPancakeSwap(Seq(t, token /* no address -> skipped */))
    assert(out ==
      """{"ADDR1":{"name":"Test Token","symbol":"TEST","price":"0.000123","price_BNB":"2.46e-07","updated_at":1756793176}}""")
  }

  test("CoinGecko market entry (models.py:527-569)") {
    val out = Sinks.formatCoinGecko(Seq(token))
    assert(out.contains(""""id":"token-0""""))
    assert(out.contains(""""current_price":0.000123"""))
    assert(out.contains(""""market_cap_rank":1"""))
    assert(out.contains(""""circulating_supply":null"""))
    assert(out.contains(""""ath_change_percentage":-16.67"""))
    assert(out.contains(""""last_updated":"2025-09-02T06:06:16""""))
    // ath = price * 1.2 via python float repr
    assert(out.contains(""""ath":""" + PyFormat.pyFloatRepr(0.000123 * 1.2)))
  }

  test("Excel CSV (models.py:603-662): falsy -> empty, crlf rows") {
    val out = Sinks.formatExcelCsv(Seq(token))
    val lines = out.split("\r\n")
    assert(lines(0).startsWith("Symbol,Name,Price"))
    assert(lines(1) ==
      "TEST,,0.000123,1000000.5,5000000.0,500,25,50000.0,,0.85,,,2025-09-02 06:06:16")
  }

  test("Prometheus exposition (models.py:701-752)") {
    val out = Sinks.formatPrometheus(Seq(token), 5, 3, 1756793176L)
    assert(out.contains("# TYPE dex_tokens_extracted_total counter"))
    assert(out.contains("dex_tokens_extracted_total 5 1756793176000"))
    assert(out.contains("dex_tokens_high_confidence 3 1756793176000"))
    assert(out.contains("""dex_token_price{symbol="TEST"} 0.000123 1756793176000"""))
    assert(out.contains("""dex_token_volume_24h{symbol="TEST"} 1000000.5 1756793176000"""))
    assert(out.endsWith("\n"))
  }

  test("JSONL token dict preserves key order and nulls (models.py:269-305)") {
    val out = Sinks.formatJsonlTokens(Seq(TokenProfile(symbol = Some("X"), timestamp = Some(1L))))
    assert(out.startsWith("""{"price":null,"volume_24h":null"""))
    assert(out.contains(""""symbol":"X""""))
    assert(out.endsWith(""""confidence_score":0.0,"field_count":0,"timestamp":1}"""))
  }

  test("OHLC stream line uses python float str (scraper.py:1542-1547)") {
    assert(Sinks.formatOhlcLine("TOKEN", bar) ==
      "TOKEN,1756793176,0.000123,0.000127,0.000119,0.000125,1000000.5")
  }

  test("distributed MT5/CSV line formatters match the bounded serializers") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(bar).toDS().toDF()
    assert(Sinks.mt5Lines(df).collect()(0).getString(0) == Sinks.formatMt5(bar))
    assert(Sinks.csvOhlcvLines(df).collect()(0).getString(0) == Sinks.formatCsv(bar))
    assert(Sinks.csvOhlcvtLines(df).collect()(0).getString(0) == Sinks.formatOhlcvt(bar))
  }
}
