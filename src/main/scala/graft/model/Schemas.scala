package graft.model

/** Typed row models mirroring the reference's dataclasses
  * (reference: dexscraper/models.py:168-356, :93-165, :49-90).
  * All analytics fields are Options — the reference tracks "dynamic
  * completeness" via field_count/confidence_score rather than schema.
  */
final case class TokenProfile(
    // Core trading data (models.py:173-178)
    price: Option[Double] = None,
    volume_24h: Option[Double] = None,
    txns_24h: Option[Int] = None,
    makers: Option[Int] = None,
    liquidity: Option[Double] = None,
    market_cap: Option[Double] = None,
    // Identification (models.py:181-186)
    symbol: Option[String] = None,
    token_name: Option[String] = None,
    chain: Option[String] = None,
    protocol: Option[String] = None,
    age: Option[String] = None,
    boost: Option[Int] = None,
    // Addresses (models.py:189-192)
    pair_address: Option[String] = None,
    creator_address: Option[String] = None,
    token_address: Option[String] = None,
    quote_address: Option[String] = None,
    // Social / web (models.py:195-197)
    website: Option[String] = None,
    twitter: Option[String] = None,
    telegram: Option[String] = None,
    // Percentage changes (models.py:200-203)
    change_5m: Option[Double] = None,
    change_1h: Option[Double] = None,
    change_6h: Option[Double] = None,
    change_24h: Option[Double] = None,
    // Quality & technical metrics (models.py:206-210)
    confidence_score: Double = 0.0,
    field_count: Int = 0,
    record_position: Option[Int] = None,
    record_span: Option[Int] = None,
    timestamp: Option[Long] = None) {

  /** models.py:346-348 */
  def isComplete(minFields: Int = 5): Boolean =
    field_count >= minFields && confidence_score >= 0.3

  /** models.py:350-356 */
  def displayName: String =
    token_name.orElse(symbol)
      .getOrElse(s"Token_${record_position.map(_.toString).getOrElse("Unknown")}")

  /** Legacy-compat conversion (models.py:217-251): nested metric structs
    * materialize only when their source field exists; string fields
    * coalesce to the reference's defaults.
    */
  def toTradingPair: TradingPair = TradingPair(
    chain = chain.getOrElse("solana"),
    protocol = protocol.getOrElse("unknown"),
    pair_address = pair_address.getOrElse("unknown"),
    base_token_name = token_name.orElse(symbol).getOrElse("Unknown Token"),
    base_token_symbol = symbol.getOrElse("UNK"),
    base_token_address = token_address.getOrElse("unknown"),
    price_data = price.map(p => PriceData(Some(p), Some(p), change_24h)),
    liquidity_data = liquidity.map(l => LiquidityData(Some(l), None, None)),
    volume_data = volume_24h.map(v => VolumeData(Some(v), None, None)),
    fdv = market_cap,
    created_at = timestamp)
}

/** Nested metric structs of the legacy pair record (models.py:11-46). */
final case class PriceData(current: Option[Double], usd: Option[Double], change_24h: Option[Double])
final case class LiquidityData(usd: Option[Double], base: Option[Double], quote: Option[Double])
final case class VolumeData(h24: Option[Double], h6: Option[Double], h1: Option[Double])

/** Legacy pair record (models.py:93-165). */
final case class TradingPair(
    chain: String,
    protocol: String,
    pair_address: String,
    base_token_name: String,
    base_token_symbol: String,
    base_token_address: String,
    price_data: Option[PriceData] = None,
    liquidity_data: Option[LiquidityData] = None,
    volume_data: Option[VolumeData] = None,
    fdv: Option[Double] = None,
    created_at: Option[Long] = None)

/** Candlestick bar (models.py:49-90); trades falls back to volume/1000. */
final case class Ohlc(
    timestamp: Long,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    trades: Option[Int] = None) {
  def tradesOrEstimate: Int = trades.getOrElse((volume / 1000.0).toInt)
}

/** Batch-level statistics (models.py:369-375). */
final case class TokenBatchStats(
    total_extracted: Long,
    high_confidence_count: Long,
    complete_profiles_count: Long,
    extraction_timestamp: Long)

/** A positional metadata hit (scraper.py:830-914): the decode stage emits
  * these and the proximity join (J1) attaches them to token anchors.
  */
final case class MetadataHit(kind: String, value: String, position: Int, hitType: String)
