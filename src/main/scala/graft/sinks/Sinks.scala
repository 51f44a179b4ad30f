package graft.sinks

import graft.model._
import graft.sinks.PyFormat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Export formats O1-O13 (SURVEY §2.11; reference: dexscraper/models.py
  * :396-752, scraper.py:1526-1576).
  *
  * Two shapes per format family:
  * - Distributed line formatters (`*Lines`) — Column expressions producing
  *   one text line per row; write with `df.write.text` at any scale.
  * - Bounded batch serializers (`format*`) — exact-parity string builders
  *   over the top-K projection (≤10/20 rows by the reference's own caps),
  *   used by the foreachBatch streaming path. These mirror Python's float
  *   repr and json.dumps byte-for-byte (modulo the documented UTC-vs-local
  *   timestamp divergence).
  */
object Sinks {

  // ---- Distributed line formatters (O3/O4/O5) ------------------------

  val CsvOhlcvHeader = "DateTime,Open,High,Low,Close,Volume"
  val CsvOhlcvtHeader = "DateTime,Open,High,Low,Close,Volume,Trades"

  /** Column-level line builders: the same expressions back both the
    * `*Lines` DataFrame sinks and the oracle-gated q35 formatting query.
    *
    * Rounding parity note (%.Nf): for N ≥ 1 a round-half tie would need
    * the value to be odd/(2·10^N), which is never exactly representable
    * in binary — so Java's HALF_UP and C/DuckDB printf's HALF_EVEN agree
    * on every double. Only %.0f can tie (x.5 IS representable); those
    * sites pre-round with `bround` (HALF_EVEN) to match C printf.
    */
  def mt5LineCol(ts: Column, open: Column, high: Column, low: Column,
      close: Column, volume: Column): Column =
    format_string("%s,%.8f,%.8f,%.8f,%.8f,%d",
      date_format(ts, "yyyy.MM.dd HH:mm:ss"),
      open, high, low, close, volume.cast("long"))

  /** O12 Prometheus sample line as a Column (models.py:736-748 shape):
    * `metric{symbol="S"} <python-repr> <ts-ms>` — null when the value is
    * null or 0.0 (the reference's truthiness skip), so a distributed
    * exposition export is `df.select(line).na.drop.write.text(...)` at
    * any scale instead of a driver-side top-10 loop.
    */
  def prometheusSampleCol(metric: String, symbol: Column, value: Column,
      tsMs: Column): Column =
    when(value.isNotNull && value =!= 0.0,
      format_string(s"""$metric{symbol="%s"} %s %s""",
        symbol, graft.functions.PyRepr(value), tsMs))

  def csvOhlcvLineCol(ts: Column, open: Column, high: Column, low: Column,
      close: Column, volume: Column): Column =
    format_string("%s,%.8f,%.8f,%.8f,%.8f,%.2f",
      date_format(ts, "yyyy-MM-dd HH:mm:ss"),
      open, high, low, close, volume)

  def csvOhlcvtLineCol(ts: Column, open: Column, high: Column, low: Column,
      close: Column, volume: Column, trades: Column): Column =
    format_string("%s,%.8f,%.8f,%.8f,%.8f,%.2f,%d",
      date_format(ts, "yyyy-MM-dd HH:mm:ss"),
      open, high, low, close, volume,
      coalesce(trades, (volume / 1000.0).cast("int")))

  /** P4 K/M/B suffix (cli.py:232-241) as a Column — same thresholds and
    * digit counts as [[Tui.formatLargeNumber]]; the %.0f branches
    * pre-round HALF_EVEN (see parity note above).
    */
  def largeNumberCol(num: Column): Column =
    when(num >= 1000000000d,
      concat(lit("$"), format_string("%.1f", num / 1000000000d), lit("B")))
      .when(num >= 1000000d,
        concat(lit("$"), format_string("%.1f", num / 1000000d), lit("M")))
      .when(num >= 1000d,
        concat(lit("$"), format_string("%.0f", bround(num / 1000d, 0)), lit("K")))
      .otherwise(concat(lit("$"), format_string("%.0f", bround(num, 0))))

  /** O11 Excel CSV row as a Column (models.py:603-662): csv.writer
    * minimal-quoting semantics (quote only fields containing , " CR LF,
    * doubling embedded quotes), Python falsy → empty field ("" strings,
    * 0/0.0 numerics, None), doubles via Python repr (the PyRepr codegen
    * expression), confidence always rendered, timestamp as
    * `YYYY-MM-DD HH:MM:SS` (format_timestamp, models.py:755-761). One
    * row's line without terminator — `df.write.text` + the header is the
    * distributed export; [[formatExcelCsv]] stays the bounded serializer.
    */
  def excelCsvLineCol(symbol: Column, name: Column, price: Column,
      volume: Column, marketCap: Column, txns: Column, makers: Column,
      liquidity: Column, change: Column, confidence: Column,
      website: Column, twitter: Column, tsSec: Column): Column = {
    def quoted(c: Column): Column = {
      val s = coalesce(c, lit(""))
      when(s.rlike("[,\"\n\r]"),
        concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\""))).otherwise(s)
    }
    def numD(c: Column): Column =
      when(c.isNotNull && c =!= 0.0, graft.functions.PyRepr(c)).otherwise(lit(""))
    def numI(c: Column): Column =
      when(c.isNotNull && c =!= 0, c.cast("string")).otherwise(lit(""))
    concat_ws(",",
      quoted(symbol), quoted(name),
      numD(price), numD(volume), numD(marketCap),
      numI(txns), numI(makers), numD(liquidity), numD(change),
      graft.functions.PyRepr(confidence),
      quoted(website), quoted(twitter),
      coalesce(date_format(timestamp_seconds(tsSec), "yyyy-MM-dd HH:mm:ss"),
        lit("")))
  }

  /** O5 MT5 line: `YYYY.MM.DD HH:MM:SS,O,H,L,C,int(V)` at %.8f. */
  def mt5Lines(ohlc: DataFrame): DataFrame =
    ohlc.select(mt5LineCol(timestamp_seconds(col("timestamp")),
      col("open"), col("high"), col("low"), col("close"), col("volume")).as("line"))

  /** O3 CSV OHLCV line (header written separately). */
  def csvOhlcvLines(ohlc: DataFrame): DataFrame =
    ohlc.select(csvOhlcvLineCol(timestamp_seconds(col("timestamp")),
      col("open"), col("high"), col("low"), col("close"), col("volume")).as("line"))

  /** O4 CSV OHLCVT line with the volume/1000 trades estimate. */
  def csvOhlcvtLines(ohlc: DataFrame): DataFrame =
    ohlc.select(csvOhlcvtLineCol(timestamp_seconds(col("timestamp")),
      col("open"), col("high"), col("low"), col("close"), col("volume"),
      col("trades")).as("line"))

  // ---- Bounded exact-parity serializers ------------------------------

  /** models.py:61-64 */
  def formatMt5(o: Ohlc): String =
    f"${tsMt5(o.timestamp)},${o.open}%.8f,${o.high}%.8f,${o.low}%.8f,${o.close}%.8f,${o.volume.toLong}"

  /** models.py:66-69 */
  def formatCsv(o: Ohlc): String =
    f"${tsDisplay(o.timestamp)},${o.open}%.8f,${o.high}%.8f,${o.low}%.8f,${o.close}%.8f,${o.volume}%.2f"

  /** models.py:71-77 */
  def formatOhlcvt(o: Ohlc): String =
    f"${tsDisplay(o.timestamp)},${o.open}%.8f,${o.high}%.8f,${o.low}%.8f,${o.close}%.8f,${o.volume}%.2f,${o.tradesOrEstimate}"

  /** models.py:396-418 (file body incl. header). */
  def formatCsvBatch(bars: Seq[Ohlc], formatType: String = "ohlcv"): String =
    if (formatType == "ohlcvt")
      (CsvOhlcvtHeader +: bars.map(formatOhlcvt)).mkString("", "\n", "\n")
    else
      (CsvOhlcvHeader +: bars.map(formatCsv)).mkString("", "\n", "\n")

  def formatMt5Batch(bars: Seq[Ohlc]): String =
    bars.map(formatMt5).mkString("", "\n", "\n")

  /** O2 JSONL over OHLC dicts (models.py:680-698). */
  def formatJsonlOhlc(bars: Seq[Ohlc]): String =
    bars.map(o => jsonObj(Seq(
      "timestamp" -> o.timestamp,
      "datetime" -> tsIso(o.timestamp),
      "open" -> o.open, "high" -> o.high, "low" -> o.low, "close" -> o.close,
      "volume" -> o.volume,
      "trades" -> o.trades))).mkString("\n")

  /** TokenProfile.to_dict key order (models.py:269-305). */
  def tokenDict(t: TokenProfile): Seq[(String, Any)] = Seq(
    "price" -> t.price, "volume_24h" -> t.volume_24h, "txns_24h" -> t.txns_24h,
    "makers" -> t.makers, "liquidity" -> t.liquidity, "market_cap" -> t.market_cap,
    "symbol" -> t.symbol, "token_name" -> t.token_name, "chain" -> t.chain,
    "protocol" -> t.protocol, "age" -> t.age, "boost" -> t.boost,
    "pair_address" -> t.pair_address, "creator_address" -> t.creator_address,
    "token_address" -> t.token_address, "quote_address" -> t.quote_address,
    "website" -> t.website, "twitter" -> t.twitter, "telegram" -> t.telegram,
    "change_5m" -> t.change_5m, "change_1h" -> t.change_1h,
    "change_6h" -> t.change_6h, "change_24h" -> t.change_24h,
    "confidence_score" -> t.confidence_score, "field_count" -> t.field_count,
    "timestamp" -> t.timestamp)

  /** to_output_dict null-coalescing (models.py:307-344). */
  def tokenOutputDict(t: TokenProfile): Seq[(String, Any)] = {
    val strings = Map(
      "symbol" -> t.symbol.getOrElse(""),
      "token_name" -> t.token_name.orElse(t.symbol).getOrElse(""),
      "chain" -> t.chain.getOrElse("solana"),
      "protocol" -> t.protocol.getOrElse("unknown"),
      "age" -> t.age.getOrElse(""),
      "pair_address" -> t.pair_address.getOrElse("unknown"),
      "creator_address" -> t.creator_address.getOrElse("unknown"),
      "token_address" -> t.token_address.getOrElse("unknown"),
      "quote_address" -> t.quote_address.getOrElse("unknown"),
      "website" -> t.website.getOrElse(""),
      "twitter" -> t.twitter.getOrElse(""),
      "telegram" -> t.telegram.getOrElse(""))
    val numbers: Map[String, Any] = Map(
      "price" -> t.price.getOrElse(0.0), "volume_24h" -> t.volume_24h.getOrElse(0.0),
      "txns_24h" -> t.txns_24h.getOrElse(0), "makers" -> t.makers.getOrElse(0),
      "liquidity" -> t.liquidity.getOrElse(0.0), "market_cap" -> t.market_cap.getOrElse(0.0),
      "boost" -> t.boost.getOrElse(0),
      "change_5m" -> t.change_5m.getOrElse(0.0), "change_1h" -> t.change_1h.getOrElse(0.0),
      "change_6h" -> t.change_6h.getOrElse(0.0), "change_24h" -> t.change_24h.getOrElse(0.0))
    tokenDict(t).map { case (k, v) =>
      k -> strings.getOrElse(k, numbers.getOrElse(k, v))
    }
  }

  /** O2 JSONL over tokens (models.py:665-678). */
  def formatJsonlTokens(tokens: Seq[TokenProfile]): String =
    tokens.map(t => jsonObj(tokenDict(t))).mkString("\n")

  /** O1 streaming envelope (scraper.py:1530-1540). */
  def formatStreamingJson(tokens: Seq[TokenProfile], totalExtracted: Long,
      highConfidenceCount: Long, extractionTs: Long, topK: Int = 10): String = {
    val top = tokens.sortBy(t => (-t.confidence_score, -t.field_count)).take(topK)
    jsonObj(Seq(
      "type" -> "enhanced_tokens",
      "total_extracted" -> totalExtracted,
      "high_confidence_count" -> highConfidenceCount,
      "tokens" -> top.map(tokenOutputDict),
      "timestamp" -> extractionTs))
  }

  /** W2 driver-side degenerate bar (models.py:253-264): price/volume
    * present → synthetic ±2% range bar; either missing → no bar.
    */
  def tokenOhlcBar(t: TokenProfile): Option[Ohlc] =
    for (p <- t.price; v <- t.volume_24h)
      yield Ohlc(t.timestamp.getOrElse(0L), p, p * 1.02, p * 0.98, p, v)

  /** EP1 one-shot serialization (cli.py:667-699 `build_batch_output`):
    * top-`limit` tokens by (confidence desc, field_count desc), then the
    * per-format batch string. Unknown formats return "" like the
    * reference.
    */
  def formatBatchOutput(tokens: Seq[TokenProfile], formatType: String,
      limit: Int, totalExtracted: Long, highConfidenceCount: Long,
      extractionTs: Long): String = {
    val top = tokens.sortBy(t => (-t.confidence_score, -t.field_count)).take(limit)
    lazy val bars = top.flatMap(tokenOhlcBar)
    formatType match {
      case "json" => jsonObj(Seq(
        "type" -> "enhanced_tokens",
        "extraction_timestamp" -> extractionTs,
        "total_extracted" -> totalExtracted,
        "high_confidence_count" -> highConfidenceCount,
        "tokens" -> top.map(tokenOutputDict)))
      case "ohlcv" => formatCsvBatch(bars, "ohlcv")
      case "ohlcvt" => formatCsvBatch(bars, "ohlcvt")
      case "ohlc" => bars.map(formatOhlcLine("TOKEN", _)).mkString("\n")
      case "mt5" => bars.map(formatMt5).mkString("\n")
      case _ => ""
    }
  }

  /** O6 OHLC line with Python str(float) values (scraper.py:1542-1547). */
  def formatOhlcLine(symbol: String, o: Ohlc): String =
    s"$symbol,${o.timestamp},${pyFloatRepr(o.open)},${pyFloatRepr(o.high)},${pyFloatRepr(o.low)},${pyFloatRepr(o.close)},${pyFloatRepr(o.volume)}"

  /** O7 TradingView columnar (models.py:463-488). */
  def formatTradingView(bars: Seq[Ohlc]): String =
    jsonObj(Seq(
      "s" -> "ok",
      "t" -> bars.map(_.timestamp),
      "o" -> bars.map(_.open), "h" -> bars.map(_.high),
      "l" -> bars.map(_.low), "c" -> bars.map(_.close),
      "v" -> bars.map(_.volume)))

  /** O8 Binance klines (models.py:491-524). */
  def formatBinanceKlines(bars: Seq[Ohlc]): String =
    jsonValue(bars.map { o =>
      Seq[Any](
        o.timestamp * 1000,
        f"${o.open}%.8f", f"${o.high}%.8f", f"${o.low}%.8f", f"${o.close}%.8f",
        f"${o.volume}%.8f",
        o.timestamp * 1000 + 60000,
        f"${o.volume}%.8f",
        o.trades.filter(_ != 0).getOrElse(1),
        f"${o.volume * 0.6}%.8f", f"${o.volume * 0.6}%.8f",
        "0")
    })

  /** O9 CoinGecko market data (models.py:527-569). */
  def formatCoinGecko(tokens: Seq[TokenProfile]): String =
    jsonValue(tokens.zipWithIndex.collect {
      case (t, i) if t.price.exists(_ != 0.0) => Seq[(String, Any)](
        "id" -> s"token-$i",
        "symbol" -> t.symbol.getOrElse(s"token$i"),
        "name" -> t.token_name.orElse(t.symbol).getOrElse(s"Token $i"),
        "current_price" -> t.price.get,
        "market_cap" -> t.market_cap,
        "total_volume" -> t.volume_24h,
        "price_change_percentage_24h" -> t.change_24h,
        "price_change_percentage_1h_in_currency" -> t.change_1h,
        "price_change_percentage_24h_in_currency" -> t.change_24h,
        "market_cap_rank" -> (i + 1),
        "circulating_supply" -> None,
        "total_supply" -> None,
        "max_supply" -> None,
        "ath" -> t.price.get * 1.2,
        "ath_change_percentage" -> -16.67,
        "last_updated" -> tsIso(t.timestamp.getOrElse(0L)))
    })

  /** O10 PancakeSwap map keyed by token address (models.py:572-600). */
  def formatPancakeSwap(tokens: Seq[TokenProfile]): String =
    jsonObj(tokens.collect {
      case t if t.token_address.exists(_.nonEmpty) && t.price.exists(_ != 0.0) =>
        t.token_address.get -> Seq[(String, Any)](
          "name" -> t.token_name.orElse(t.symbol),
          "symbol" -> t.symbol,
          "price" -> pyFloatRepr(t.price.get),
          "price_BNB" -> pyFloatRepr(t.price.get * 0.002),
          "updated_at" -> t.timestamp.getOrElse(0L))
    })

  /** O11 Excel CSV (models.py:603-662): csv.writer semantics — str()
    * values, falsy → "", minimal quoting.
    */
  def formatExcelCsv(tokens: Seq[TokenProfile]): String = {
    def csvField(v: String): String =
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    def orEmpty(v: Option[Any]): String = v match {
      case Some(d: Double) if d != 0.0 => pyFloatRepr(d)
      case Some(i: Int) if i != 0 => i.toString
      case _ => ""
    }
    val header = "Symbol,Name,Price,Volume_24h,Market_Cap,Transactions_24h,Makers,Liquidity,Change_24h,Confidence,Website,Twitter,Timestamp"
    val rows = tokens.map { t =>
      Seq(
        t.symbol.getOrElse(""), t.token_name.getOrElse(""),
        orEmpty(t.price), orEmpty(t.volume_24h), orEmpty(t.market_cap),
        orEmpty(t.txns_24h), orEmpty(t.makers), orEmpty(t.liquidity),
        orEmpty(t.change_24h), pyFloatRepr(t.confidence_score),
        t.website.getOrElse(""), t.twitter.getOrElse(""),
        t.timestamp.map(tsDisplay).getOrElse("")) // models.py:755-761, no suffix
        .map(csvField).mkString(",")
    }
    (header +: rows).mkString("", "\r\n", "\r\n")
  }

  /** O12 Prometheus exposition (models.py:701-752). */
  def formatPrometheus(tokens: Seq[TokenProfile], totalExtracted: Long,
      highConfidenceCount: Long, extractionTs: Long): String = {
    val tsMs = extractionTs * 1000
    val top = tokens.sortBy(t => (-t.confidence_score, -t.field_count)).take(10)
    val lines = Seq.newBuilder[String]
    lines += "# HELP dex_tokens_extracted_total Total tokens extracted"
    lines += "# TYPE dex_tokens_extracted_total counter"
    lines += s"dex_tokens_extracted_total $totalExtracted $tsMs"
    lines += "# HELP dex_tokens_high_confidence High confidence tokens extracted"
    lines += "# TYPE dex_tokens_high_confidence gauge"
    lines += s"dex_tokens_high_confidence $highConfidenceCount $tsMs"
    lines += "# HELP dex_token_price Token price in USD"
    lines += "# TYPE dex_token_price gauge"
    lines += "# HELP dex_token_volume_24h Token 24h volume in USD"
    lines += "# TYPE dex_token_volume_24h gauge"
    top.zipWithIndex.foreach { case (t, i) =>
      val symbol = t.symbol.getOrElse(s"token_$i")
      t.price.filter(_ != 0.0).foreach(p =>
        lines += s"""dex_token_price{symbol="$symbol"} ${pyFloatRepr(p)} $tsMs""")
      t.volume_24h.filter(_ != 0.0).foreach(v =>
        lines += s"""dex_token_volume_24h{symbol="$symbol"} ${pyFloatRepr(v)} $tsMs""")
    }
    lines.result().mkString("\n") + "\n"
  }

  /** O13 `--once --output`: serialized batch + trailing newline
    * (cli.py:1060-1074).
    */
  def writeBatchFile(path: String, serialized: String): Unit = {
    val out = if (serialized.endsWith("\n")) serialized else serialized + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), out)
  }
}
