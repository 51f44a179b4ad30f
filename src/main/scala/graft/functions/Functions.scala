package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function layer (SURVEY §2.5 P1-P11, §2.2 D9/D12, §2.4 F5):
  * every projection/predicate the reference applies per row, expressed as
  * codegen-friendly `Column` compositions of Spark built-ins. No UDFs —
  * these all stay inside whole-stage codegen.
  */
object Functions {

  /** P1 `clean_string` (reference: dexscraper/protocol.py:23-39): keep
    * printable ASCII + tab; if the result contains '@' or '\', truncate at
    * the first of each (no trim); otherwise trim whitespace.
    */
  def cleanString(c: Column): Column = {
    val printable = regexp_replace(c, "[^\\x20-\\x7E\\t]", "")
    val truncated = substring_index(substring_index(printable, "@", 1), "\\", 1)
    val trimmed = regexp_replace(regexp_replace(printable, "^[ \\t]+", ""), "[ \\t]+$", "")
    when(c.isNull, lit(""))
      .when(printable.contains("@") || printable.contains("\\"), truncated)
      .otherwise(trimmed)
  }

  /** P2 `normalize_symbol` (utils.py:391-409): upper, strip non-[A-Z0-9],
    * cap at 10 chars, empty/null → "UNK".
    */
  def normalizeSymbol(c: Column): Column = {
    val cleaned = substring(regexp_replace(upper(c), "[^A-Z0-9]", ""), 1, 10)
    when(c.isNull || cleaned === "", lit("UNK")).otherwise(cleaned)
  }

  /** P3 `format_number` (utils.py:307-323): fixed `precision` decimals
    * (thousands separators for |v| >= 1), then strip trailing zeros and a
    * trailing point; null → "N/A".
    */
  def formatNumber(c: Column, precision: Int = 8): Column = {
    val big = format_number(c, precision) // adds thousands separators
    val small = format_string(s"%.${precision}f", c)
    val raw = when(abs(c) >= 1, big).otherwise(small)
    val stripped = regexp_replace(regexp_replace(raw, "0+$", ""), "\\.$", "")
    when(c.isNull, lit("N/A")).otherwise(stripped)
  }

  /** P3 `format_percentage` (utils.py:326-337): `f"{v:.1%}"`. */
  def formatPercentage(c: Column): Column =
    when(c.isNull, lit("N/A")).otherwise(format_string("%.1f%%", c * 100))

  /** P3 `format_volume` (utils.py:340-358): $ with B/M/K suffix at 2dp. */
  def formatVolume(c: Column): Column =
    when(c.isNull, lit("N/A"))
      .when(abs(c) >= 1e9, format_string("$%.2fB", c / 1e9))
      .when(abs(c) >= 1e6, format_string("$%.2fM", c / 1e6))
      .when(abs(c) >= 1e3, format_string("$%.2fK", c / 1e3))
      .otherwise(format_string("$%.2f", c))

  /** P3 `format_large_number` (cli.py:232-241): coarser CLI variant. */
  def formatLargeNumber(c: Column): Column =
    when(c >= 1e9, format_string("$%.1fB", c / 1e9))
      .when(c >= 1e6, format_string("$%.1fM", c / 1e6))
      .when(c >= 1e3, format_string("$%.0fK", c / 1e3))
      .otherwise(format_string("$%.0f", c))

  /** P4 display timestamp (utils.py:289-302), from unix seconds, UTC. */
  def formatTimestampDisplay(unixSeconds: Column): Column =
    concat(date_format(timestamp_seconds(unixSeconds), "yyyy-MM-dd HH:mm:ss"), lit(" UTC"))

  /** P4 MT5 timestamp (models.py:61-64). */
  def formatTimestampMt5(unixSeconds: Column): Column =
    date_format(timestamp_seconds(unixSeconds), "yyyy.MM.dd HH:mm:ss")

  /** P4 CSV timestamp (models.py:66-69). */
  def formatTimestampCsv(unixSeconds: Column): Column =
    date_format(timestamp_seconds(unixSeconds), "yyyy-MM-dd HH:mm:ss")

  /** P5 `safe_divide` (utils.py:374-388). */
  def safeDivide(n: Column, d: Column, default: Column = lit(0.0)): Column =
    when(d === 0, default).otherwise(n / d)

  /** P6 `generate_token_id` (utils.py:361-371): md5 hex prefix, 8 chars. */
  def tokenId(c: Column): Column = substring(md5(c), 1, 8)

  /** P10 confidence score (utils.py:258-286). */
  def confidenceScore(fieldCount: Column, numericClusters: Column, metadataCount: Column): Column = {
    val base = least(fieldCount.cast("double") / 10.0, lit(0.5)) +
      least(numericClusters.cast("double") / 10.0, lit(0.3)) +
      least(metadataCount.cast("double") / 5.0, lit(0.2))
    val bonus = when(fieldCount >= 5 && numericClusters >= 3 && metadataCount >= 1, lit(0.1))
      .otherwise(lit(0.0))
    least(base + bonus, lit(1.0))
  }

  /** Variant confidence used by the record extractor (scraper.py:670):
    * `min(0.7 + 0.05*fields, 0.95)`.
    */
  def recordConfidence(fieldCount: Column): Column =
    least(lit(0.7) + lit(0.05) * fieldCount.cast("double"), lit(0.95))

  /** P11 completeness score (scraper.py:1371-1392): 10 per field type
    * capped at 60, + 10 per metadata kind present, out of 100.
    */
  def completenessScore(fieldTypes: Column, metadataKinds: Column): Column =
    (least(fieldTypes * 10, lit(60)) + metadataKinds * 10).cast("double") / 100.0

  /** F5 `is_valid_float` (utils.py:85-108): finite, |v| in (1e-15, 1e15),
    * not 0.0 and not ±1.0 (uninitialized-memory heuristics).
    */
  def isValidFloat(c: Column): Column =
    !isnan(c) && !c.isin(Double.PositiveInfinity, Double.NegativeInfinity) &&
      abs(c) > 1e-15 && abs(c) < 1e15 && c =!= 0.0 && abs(c) =!= 1.0

  /** F5 `validate_trading_data` (utils.py:445-469); null fields pass. */
  def validTradingData(price: Column, volume: Column): Column = {
    val priceOk = price.isNull || (isValidFloat(price) && price > 0 && price <= 1000000)
    val volumeOk = volume.isNull || (isValidFloat(volume) && volume >= 0 && volume <= 1e12)
    priceOk && volumeOk
  }

  /** D8 numeric-value validity gate (scraper.py:756-764). */
  def isValidNumericValue(c: Column): Column =
    !isnan(c) && !c.isin(Double.PositiveInfinity, Double.NegativeInfinity) &&
      abs(c) > 1e-10 && abs(c) < 1e12

  /** D9 value classifier (scraper.py:766-828): first-match-wins CASE over
    * the validated ranges; `dtype` ∈ {double, float, uint32}.
    */
  def classifyValue(v: Column, dtype: Column): Column =
    when(v >= 0.000001 && v <= 0.1, "prices")
      .when(dtype === "uint32" && v >= 10 && v <= 50000, "txns")
      .when(dtype.isin("uint32", "float") && v >= 10 && v <= 15000 && v < 20000, "makers")
      .when(v >= 100000.0 && v <= 10000000.0, "volumes")
      .when(v >= 10000.0 && v <= 1000000.0, "liquidity")
      .when(v >= 100000.0 && v <= 50000000.0, "market_caps")
      .when(v >= -100 && v <= 1000 && abs(v) > 0.01, "percentages")
      .otherwise(lit(null).cast("string"))

  /** D12 URL cleaner (utils.py:171-189): strip trailing garbage, drop
    * control chars.
    */
  def cleanUrl(c: Column): Column = {
    val noCtl = regexp_replace(c, "[\\x00-\\x1F]", "")
    regexp_replace(noCtl, "[^\\w\\-_.~:/?#\\[\\]@!$&'()*+,;=%]+$", "")
  }

  /** D12 URL validity (utils.py:192-211): length 10-200 and a known TLD. */
  def isValidUrl(c: Column): Column =
    length(c) >= 10 && length(c) <= 200 &&
      (lower(c).contains(".com") || lower(c).contains(".org") ||
        lower(c).contains(".net") || lower(c).contains(".io") || lower(c).contains(".me"))

  /** D12 URL type classifier (scraper.py:948-958). */
  def classifyUrl(c: Column): Column = {
    val u = lower(c)
    when(u.contains("twitter.com") || u.contains("x.com"), "twitter")
      .when(u.contains("t.me") || u.contains("telegram"), "telegram")
      .when(u.contains(".com") || u.contains(".io") || u.contains(".xyz") || u.contains(".org"), "website")
      .otherwise("unknown")
  }

  /** Address classifier (scraper.py:916-923). */
  def classifyAddress(c: Column): Column =
    when(c === "So11111111111111111111111111111111111111112", "SOL_token")
      .when(length(c) >= 40, "potential_contract")
      .otherwise("unknown")

  /** D11 Solana base58 address check (scraper.py:925-946): charset +
    * length gate, then full base58 decode must yield exactly 32 bytes.
    * Custom expression — no built-in decodes base58.
    */
  def isBase58Address(c: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(Base58.IsBase58Address(graftbridge.expression(c)))
  }

  /** P9 display-name fallback chain (models.py:350-356). */
  def displayName(tokenName: Column, symbol: Column, recordPosition: Column): Column =
    coalesce(tokenName, symbol,
      concat(lit("Token_"), coalesce(recordPosition.cast("string"), lit("Unknown"))))

  /** P7 null-coalescing output projection defaults (models.py:307-344). */
  val stringDefaults: Map[String, String] = Map(
    "symbol" -> "", "age" -> "", "website" -> "", "twitter" -> "", "telegram" -> "",
    "chain" -> "solana", "protocol" -> "unknown",
    "pair_address" -> "unknown", "creator_address" -> "unknown",
    "token_address" -> "unknown", "quote_address" -> "unknown")

  val numericDefaults: Seq[String] = Seq(
    "price", "volume_24h", "liquidity", "market_cap",
    "change_5m", "change_1h", "change_6h", "change_24h")

  val intDefaults: Seq[String] = Seq("txns_24h", "makers", "boost")
}
