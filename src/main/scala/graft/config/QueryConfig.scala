package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's typed query surface (reference: dexscraper/config.py:8-281):
  * enums + a `Filters` record + rank-by/order, compiled two ways —
  * (a) to source query params (the reference's pushdown form, byte-for-byte
  * URL parity, tested against the reference's own config goldens), and
  * (b) to a Catalyst `Column` predicate + sort, the engine-side
  * re-application that serves as the correctness backstop when the source
  * cannot push down (SURVEY §2.1 S2).
  */
sealed abstract class Chain(val value: String)
object Chain {
  case object Solana extends Chain("solana")
  case object Ethereum extends Chain("ethereum")
  case object Base extends Chain("base")
  case object Bsc extends Chain("bsc")
  case object Polygon extends Chain("polygon")
  case object Arbitrum extends Chain("arbitrum")
  case object Optimism extends Chain("optimism")
  case object Avalanche extends Chain("avalanche")
  val all: Seq[Chain] = Seq(Solana, Ethereum, Base, Bsc, Polygon, Arbitrum, Optimism, Avalanche)
  def fromString(s: String): Chain = all.find(_.value == s)
    .getOrElse(throw new IllegalArgumentException(s"unknown chain: $s"))
}

sealed abstract class Dex(val value: String)
object Dex {
  case object Raydium extends Dex("raydium")
  case object Pumpfun extends Dex("pumpfun")
  case object Pumpswap extends Dex("pumpswap")
  case object Orca extends Dex("orca")
  case object Jupiter extends Dex("jupiter")
  case object Meteora extends Dex("meteora")
  case object UniswapV2 extends Dex("uniswap")
  case object UniswapV3 extends Dex("uniswapv3")
  case object Sushiswap extends Dex("sushiswap")
  case object Pancakeswap extends Dex("pancakeswap")
  case object Aerodrome extends Dex("aerodrome")
  case object Baseswap extends Dex("baseswap")
  val all: Seq[Dex] = Seq(Raydium, Pumpfun, Pumpswap, Orca, Jupiter, Meteora,
    UniswapV2, UniswapV3, Sushiswap, Pancakeswap, Aerodrome, Baseswap)
}

sealed abstract class Timeframe(val value: String)
object Timeframe {
  case object M5 extends Timeframe("m5")
  case object H1 extends Timeframe("h1")
  case object H6 extends Timeframe("h6")
  case object H24 extends Timeframe("h24")
  val all: Seq[Timeframe] = Seq(M5, H1, H6, H24)
}

sealed abstract class RankBy(val value: String)
object RankBy {
  case object TrendingScoreM5 extends RankBy("trendingScoreM5")
  case object TrendingScoreH1 extends RankBy("trendingScoreH1")
  case object TrendingScoreH6 extends RankBy("trendingScoreH6")
  case object TrendingScoreH24 extends RankBy("trendingScoreH24")
  case object Volume extends RankBy("volume")
  case object Transactions extends RankBy("txns")
  case object PriceChangeH24 extends RankBy("priceChangeH24")
  case object PriceChangeH6 extends RankBy("priceChangeH6")
  case object PriceChangeH1 extends RankBy("priceChangeH1")
  case object Liquidity extends RankBy("liquidity")
  case object Fdv extends RankBy("fdv")
  case object MarketCap extends RankBy("marketCap")
  val trending: Set[RankBy] =
    Set(TrendingScoreM5, TrendingScoreH1, TrendingScoreH6, TrendingScoreH24)
}

sealed abstract class Order(val value: String)
object Order {
  case object Desc extends Order("desc")
  case object Asc extends Order("asc")
}

/** Range + membership filter record (config.py:87-132). Ints are modelled
  * as Long (the reference passes them through `str()` unchanged).
  */
final case class Filters(
    chainIds: Seq[Chain] = Seq(Chain.Solana),
    dexIds: Seq[Dex] = Seq.empty,
    liquidityMin: Option[Long] = None, liquidityMax: Option[Long] = None,
    volumeH24Min: Option[Long] = None, volumeH24Max: Option[Long] = None,
    volumeH6Min: Option[Long] = None, volumeH6Max: Option[Long] = None,
    volumeH1Min: Option[Long] = None, volumeH1Max: Option[Long] = None,
    txnsH24Min: Option[Long] = None, txnsH24Max: Option[Long] = None,
    txnsH6Min: Option[Long] = None, txnsH6Max: Option[Long] = None,
    txnsH1Min: Option[Long] = None, txnsH1Max: Option[Long] = None,
    pairAgeMin: Option[Long] = None, pairAgeMax: Option[Long] = None,
    priceChangeH24Min: Option[Double] = None, priceChangeH24Max: Option[Double] = None,
    priceChangeH6Min: Option[Double] = None, priceChangeH6Max: Option[Double] = None,
    priceChangeH1Min: Option[Double] = None, priceChangeH1Max: Option[Double] = None,
    fdvMin: Option[Long] = None, fdvMax: Option[Long] = None,
    marketCapMin: Option[Long] = None, marketCapMax: Option[Long] = None,
    enhancedTokenInfo: Boolean = false,
    activeBoostsMin: Option[Long] = None,
    recentPurchasedImpressionsMin: Option[Long] = None,
    maxAge: Option[Long] = None,
    profile: Option[Int] = None,
    maxLaunchpadProgress: Option[Double] = None) {

  /** Source-pushdown serialization, ordered exactly like the reference's
    * `to_query_params` (config.py:134-242).
    */
  def toQueryParams: Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    chainIds.zipWithIndex.foreach { case (c, i) => b += s"filters[chainIds][$i]" -> c.value }
    dexIds.zipWithIndex.foreach { case (d, i) => b += s"filters[dexIds][$i]" -> d.value }
    def range(key: String, mn: Option[Long], mx: Option[Long]): Unit = {
      mn.foreach(v => b += s"filters[$key][min]" -> v.toString)
      mx.foreach(v => b += s"filters[$key][max]" -> v.toString)
    }
    def rangeD(key: String, mn: Option[Double], mx: Option[Double]): Unit = {
      mn.foreach(v => b += s"filters[$key][min]" -> fmt(v))
      mx.foreach(v => b += s"filters[$key][max]" -> fmt(v))
    }
    range("liquidity", liquidityMin, liquidityMax)
    range("volume][h24", volumeH24Min, volumeH24Max)
    range("volume][h6", volumeH6Min, volumeH6Max)
    range("volume][h1", volumeH1Min, volumeH1Max)
    range("txns][h24", txnsH24Min, txnsH24Max)
    range("txns][h6", txnsH6Min, txnsH6Max)
    range("txns][h1", txnsH1Min, txnsH1Max)
    range("pairAge", pairAgeMin, pairAgeMax)
    rangeD("priceChange][h24", priceChangeH24Min, priceChangeH24Max)
    rangeD("priceChange][h6", priceChangeH6Min, priceChangeH6Max)
    rangeD("priceChange][h1", priceChangeH1Min, priceChangeH1Max)
    range("fdv", fdvMin, fdvMax)
    range("marketCap", marketCapMin, marketCapMax)
    if (enhancedTokenInfo) b += "filters[enhancedTokenInfo]" -> "true"
    activeBoostsMin.foreach(v => b += "filters[activeBoosts][min]" -> v.toString)
    recentPurchasedImpressionsMin.foreach(v =>
      b += "filters[recentPurchasedImpressions][min]" -> v.toString)
    maxAge.foreach(v => b += "maxAge" -> v.toString)
    profile.foreach(v => b += "profile" -> v.toString)
    maxLaunchpadProgress.foreach(v => b += "maxLaunchpadProgress" -> fmt(v))
    b.result()
  }

  /** Python str(float) prints 99.99 not 99.990000; match it. */
  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) s"${d.toLong}.0" else d.toString
}

final case class ScrapingConfig(
    timeframe: Timeframe = Timeframe.H24,
    rankBy: RankBy = RankBy.TrendingScoreH6,
    order: Order = Order.Desc,
    filters: Filters = Filters()) {

  /** Physical source request (config.py:254-281) including the
    * trendingScore* → h24 endpoint normalization (S3).
    */
  def buildWebsocketUrl: String = {
    val tf = if (RankBy.trending.contains(rankBy)) Timeframe.H24.value else timeframe.value
    val base = s"wss://io.dexscreener.com/dex/screener/v5/pairs/$tf/1"
    val params = Seq("rankBy[key]" -> rankBy.value, "rankBy[order]" -> order.value) ++
      filters.toQueryParams
    base + "?" + params.map { case (k, v) => s"$k=$v" }.mkString("&")
  }
}

/** Engine-side compilation of the query onto a TokenProfile-shaped
  * DataFrame: the correctness backstop for predicates the source did not
  * apply. Filters whose timeframe dimension has no engine column (volume
  * h6/h1, txns h6/h1, pair age, boosts/impressions, pumpfun knobs) are
  * source-only by design — the reference never evaluates them client-side
  * either (the server filters; see SURVEY §2.4 F1).
  */
object QueryCompiler {

  /** Conjunctive predicate over TokenProfile columns. */
  def filterPredicate(f: Filters): Column = {
    var p = lit(true)
    def and(c: Column): Unit = { p = p && c }
    if (f.chainIds.nonEmpty) and(col("chain").isin(f.chainIds.map(_.value): _*))
    if (f.dexIds.nonEmpty) and(col("protocol").isin(f.dexIds.map(_.value): _*))
    def range(c: String, mn: Option[Long], mx: Option[Long]): Unit = {
      mn.foreach(v => and(col(c) >= lit(v.toDouble)))
      mx.foreach(v => and(col(c) <= lit(v.toDouble)))
    }
    def rangeD(c: String, mn: Option[Double], mx: Option[Double]): Unit = {
      mn.foreach(v => and(col(c) >= lit(v)))
      mx.foreach(v => and(col(c) <= lit(v)))
    }
    range("liquidity", f.liquidityMin, f.liquidityMax)
    range("volume_24h", f.volumeH24Min, f.volumeH24Max)
    range("txns_24h", f.txnsH24Min, f.txnsH24Max)
    rangeD("change_24h", f.priceChangeH24Min, f.priceChangeH24Max)
    rangeD("change_6h", f.priceChangeH6Min, f.priceChangeH6Max)
    rangeD("change_1h", f.priceChangeH1Min, f.priceChangeH1Max)
    range("market_cap", f.fdvMin, f.fdvMax)
    range("market_cap", f.marketCapMin, f.marketCapMax)
    f.activeBoostsMin.foreach(v => and(col("boost") >= lit(v)))
    p
  }

  /** Rank key → engine sort columns. trendingScore* maps to the engine's
    * confidence ranking (T1: the reference's client-side top-K order,
    * models.py:377-381); the remaining keys map to their metric columns.
    */
  def sortColumns(rankBy: RankBy, order: Order): Seq[Column] = {
    val dir: Column => Column =
      if (order == Order.Desc) c => c.desc_nulls_last else c => c.asc_nulls_last
    val keys: Seq[Column] = rankBy match {
      case r if RankBy.trending.contains(r) =>
        Seq(col("confidence_score"), col("field_count"))
      case RankBy.Volume => Seq(col("volume_24h"))
      case RankBy.Transactions => Seq(col("txns_24h"))
      case RankBy.PriceChangeH24 => Seq(col("change_24h"))
      case RankBy.PriceChangeH6 => Seq(col("change_6h"))
      case RankBy.PriceChangeH1 => Seq(col("change_1h"))
      case RankBy.Liquidity => Seq(col("liquidity"))
      case RankBy.Fdv | RankBy.MarketCap => Seq(col("market_cap"))
    }
    keys.map(dir)
  }

  /** Full engine-side application: filter → rank → limit.
    * Spark plans the sort+limit as TakeOrderedAndProject (no global sort).
    */
  def apply(df: DataFrame, config: ScrapingConfig, limitN: Int = 0): DataFrame = {
    val ranked = df.filter(filterPredicate(config.filters))
      .orderBy(sortColumns(config.rankBy, config.order): _*)
    if (limitN > 0) ranked.limit(limitN) else ranked
  }
}

/** Preset configurations (config.py:285-388). */
object PresetConfigs {
  def trending(chain: Chain = Chain.Solana, timeframe: Timeframe = Timeframe.H24): ScrapingConfig = {
    val rank = timeframe match {
      case Timeframe.M5 => RankBy.TrendingScoreM5
      case Timeframe.H1 => RankBy.TrendingScoreH1
      case Timeframe.H6 => RankBy.TrendingScoreH6
      case Timeframe.H24 => RankBy.TrendingScoreH24
    }
    ScrapingConfig(timeframe, rank, Order.Desc, Filters(chainIds = Seq(chain)))
  }

  def topVolume(chain: Chain = Chain.Solana, minLiquidity: Long = 25000, minTxns: Long = 50): ScrapingConfig =
    ScrapingConfig(Timeframe.H1, RankBy.Volume, Order.Desc,
      Filters(chainIds = Seq(chain), liquidityMin = Some(minLiquidity), txnsH24Min = Some(minTxns)))

  def gainers(chain: Chain = Chain.Solana, minLiquidity: Long = 25000, minVolume: Long = 10000): ScrapingConfig =
    ScrapingConfig(Timeframe.H1, RankBy.PriceChangeH24, Order.Desc,
      Filters(chainIds = Seq(chain), liquidityMin = Some(minLiquidity),
        volumeH24Min = Some(minVolume), txnsH24Min = Some(50)))

  def newPairs(chain: Chain = Chain.Solana, maxAgeHours: Long = 24): ScrapingConfig =
    ScrapingConfig(Timeframe.H1, RankBy.TrendingScoreH6, Order.Desc,
      Filters(chainIds = Seq(chain), pairAgeMax = Some(maxAgeHours)))

  def topTransactions(chain: Chain = Chain.Solana): ScrapingConfig =
    ScrapingConfig(Timeframe.H1, RankBy.Transactions, Order.Desc, Filters(chainIds = Seq(chain)))

  def boostedOnly(chain: Chain = Chain.Solana): ScrapingConfig =
    ScrapingConfig(Timeframe.H1, RankBy.TrendingScoreH6, Order.Desc,
      Filters(chainIds = Seq(chain), enhancedTokenInfo = true, activeBoostsMin = Some(1)))

  def pumpfunTrending(dex: Dex = Dex.Pumpfun, maxAge: Long = 3,
      maxLaunchpadProgress: Double = 99.99): ScrapingConfig =
    ScrapingConfig(Timeframe.H1, RankBy.TrendingScoreH6, Order.Desc,
      Filters(chainIds = Seq(Chain.Solana), dexIds = Seq(dex), maxAge = Some(maxAge),
        profile = Some(1), maxLaunchpadProgress = Some(maxLaunchpadProgress)))
}
