package graft

import graft.config._
import org.scalatest.funsuite.AnyFunSuite

/** Query-config goldens mirrored from the reference's tests/test_config.py. */
class ConfigSpec extends AnyFunSuite {

  test("pumpfun preset query params (test_config.py:30-36)") {
    val p = PresetConfigs.pumpfunTrending().filters.toQueryParams.toMap
    assert(p("maxAge") == "3")
    assert(p("profile") == "1")
    assert(p("maxLaunchpadProgress") == "99.99")
  }

  test("multi-chain/dex/range params serialize in reference order (test_config.py:54-69)") {
    val f = Filters(
      chainIds = Seq(Chain.Solana, Chain.Ethereum),
      dexIds = Seq(Dex.Pumpfun, Dex.Raydium),
      liquidityMin = Some(25000), liquidityMax = Some(1000000),
      volumeH24Min = Some(10000), txnsH24Min = Some(50),
      enhancedTokenInfo = true, activeBoostsMin = Some(1))
    val p = f.toQueryParams.toMap
    assert(p("filters[chainIds][0]") == "solana")
    assert(p("filters[chainIds][1]") == "ethereum")
    assert(p("filters[dexIds][0]") == "pumpfun")
    assert(p("filters[dexIds][1]") == "raydium")
    assert(p("filters[liquidity][min]") == "25000")
    assert(p("filters[liquidity][max]") == "1000000")
    assert(p("filters[volume][h24][min]") == "10000")
    assert(p("filters[txns][h24][min]") == "50")
    assert(p("filters[enhancedTokenInfo]") == "true")
    assert(p("filters[activeBoosts][min]") == "1")
  }

  test("top_volume preset URL (test_config.py:86-93)") {
    val url = PresetConfigs.topVolume().buildWebsocketUrl
    assert(url.contains("wss://io.dexscreener.com/dex/screener/v5/pairs/h1/1"))
    assert(url.contains("rankBy[key]=volume"))
    assert(url.contains("rankBy[order]=desc"))
    assert(url.contains("filters[chainIds][0]=solana"))
  }

  test("trendingScore* forces h24 endpoint (test_config.py:113-118)") {
    val url = PresetConfigs.pumpfunTrending().buildWebsocketUrl
    assert(url.contains("/pairs/h24/1"))
    assert(url.contains("rankBy[key]=trendingScoreH6"))
    assert(url.contains("filters[dexIds][0]=pumpfun"))
    assert(url.contains("maxAge=3"))
    assert(url.contains("profile=1"))
    assert(url.contains("maxLaunchpadProgress=99.99"))
  }

  test("trending preset rank tracks timeframe (test_config.py:138-152)") {
    assert(PresetConfigs.trending().rankBy == RankBy.TrendingScoreH24)
    assert(PresetConfigs.trending(timeframe = Timeframe.M5).rankBy == RankBy.TrendingScoreM5)
    assert(PresetConfigs.trending(timeframe = Timeframe.H1).rankBy == RankBy.TrendingScoreH1)
    assert(PresetConfigs.trending(timeframe = Timeframe.H6).rankBy == RankBy.TrendingScoreH6)
  }

  test("enum values match the reference wire strings (test_config.py:225-257)") {
    assert(Chain.all.map(_.value) == Seq("solana", "ethereum", "base", "bsc",
      "polygon", "arbitrum", "optimism", "avalanche"))
    assert(Timeframe.all.map(_.value) == Seq("m5", "h1", "h6", "h24"))
    assert(Order.Desc.value == "desc" && Order.Asc.value == "asc")
    assert(RankBy.trending.map(_.value) == Set("trendingScoreM5", "trendingScoreH1",
      "trendingScoreH6", "trendingScoreH24"))
  }
}
