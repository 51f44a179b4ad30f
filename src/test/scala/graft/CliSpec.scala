package graft

import graft.cli.Cli
import graft.config._
import org.scalatest.funsuite.AnyFunSuite

/** CLI goldens mirroring the reference suite (tests/test_cli.py):
  * legacy subcommand normalization, preset-mode rank resolution,
  * default-rank-tracks-timeframe, invalid-argument errors, and config →
  * URL compilation through the same path the reference drives.
  */
class CliSpec extends AnyFunSuite {

  test("legacy subcommand normalization (cli.py:702-715)") {
    assert(Cli.normalizeLegacyArgs(Seq("interactive", "--once")) ==
      Seq("--format", "rich", "--once"))
    assert(Cli.normalizeLegacyArgs(Seq("trending", "--chain", "solana")) ==
      Seq("--mode", "trending", "--chain", "solana"))
    assert(Cli.normalizeLegacyArgs(Seq("TOP")) == Seq("--mode", "top"))
    assert(Cli.normalizeLegacyArgs(Seq("--mode", "new")) == Seq("--mode", "new"))
    assert(Cli.normalizeLegacyArgs(Nil) == Nil)
  }

  test("defaults match argparse (cli.py:887-1028)") {
    val a = Cli.parseArgs(Nil).toOption.get
    assert(a.format == "json" && a.limit == 20 && !a.once && !a.debug)
    assert(a.chain == Chain.Solana && a.timeframe == Timeframe.H24)
    assert(a.order == "desc" && a.rateLimit == 4.0 && a.maxRetries == 5)
    assert(a.rankBy.isEmpty && a.mode.isEmpty)
  }

  test("preset modes resolve to expected rank (test_cli.py:235-260)") {
    def rank(mode: String): RankBy =
      Cli.configFromArgv(Seq("--mode", mode, "--timeframe", "h1")).toOption.get.rankBy
    assert(rank("top") == RankBy.Volume)
    assert(rank("gainers") == RankBy.PriceChangeH24)
    assert(rank("new") == RankBy.TrendingScoreH6)
    assert(rank("transactions") == RankBy.Transactions)
    assert(rank("boosted") == RankBy.TrendingScoreH6)
    assert(rank("trending") == RankBy.TrendingScoreH1) // tracks timeframe
  }

  test("default rank tracks timeframe in custom mode (test_cli.py:187-232)") {
    assert(Cli.configFromArgv(Seq("--timeframe", "h1")).toOption.get.rankBy ==
      RankBy.TrendingScoreH1)
    assert(Cli.configFromArgv(Seq("--timeframe", "m5")).toOption.get.rankBy ==
      RankBy.TrendingScoreM5)
    assert(Cli.configFromArgv(Nil).toOption.get.rankBy == RankBy.TrendingScoreH24)
    // explicit --rank-by wins
    assert(Cli.configFromArgv(Seq("--timeframe", "h1", "--rank-by", "volume"))
      .toOption.get.rankBy == RankBy.Volume)
  }

  test("custom filters flow into the Filters record (cli.py:811-843)") {
    val cfg = Cli.configFromArgv(Seq(
      "--chains", "ethereum,base", "--dexs", "raydium,uniswapv3",
      "--min-liquidity", "50000", "--min-txns", "100",
      "--min-change", "5.5", "--enhanced", "--min-boosts", "2")).toOption.get
    val f = cfg.filters
    assert(f.chainIds == Seq(Chain.Ethereum, Chain.Base))
    assert(f.dexIds == Seq(Dex.Raydium, Dex.UniswapV3))
    assert(f.liquidityMin.contains(50000L) && f.txnsH24Min.contains(100L))
    assert(f.priceChangeH24Min.contains(5.5))
    assert(f.enhancedTokenInfo && f.activeBoostsMin.contains(2L))
    // --dex (single) takes precedence over --dexs (cli.py:804-808)
    val single = Cli.configFromArgv(Seq("--dex", "orca", "--dexs", "raydium")).toOption.get
    assert(single.filters.dexIds == Seq(Dex.Orca))
  }

  test("preset default floors (cli.py:779-788)") {
    val top = Cli.configFromArgv(Seq("--mode", "top")).toOption.get
    assert(top.filters.liquidityMin.contains(25000L) && top.filters.txnsH24Min.contains(50L))
    val topOverride = Cli.configFromArgv(
      Seq("--mode", "top", "--min-liquidity", "99000")).toOption.get
    assert(topOverride.filters.liquidityMin.contains(99000L))
    val gainers = Cli.configFromArgv(Seq("--mode", "gainers")).toOption.get
    assert(gainers.filters.volumeH24Min.contains(10000L))
    val newPairs = Cli.configFromArgv(Seq("--mode", "new", "--max-age", "6")).toOption.get
    assert(newPairs.filters.pairAgeMax.contains(6L))
    // --chains first entry wins over --chain in preset mode (cli.py:775)
    val multi = Cli.configFromArgv(
      Seq("--mode", "trending", "--chains", "base,solana")).toOption.get
    assert(multi.filters.chainIds == Seq(Chain.Base))
  }

  test("invalid arguments error like argparse") {
    assert(Cli.parseArgs(Seq("--chain", "dogecoin")).isLeft)
    assert(Cli.parseArgs(Seq("--timeframe", "h12")).isLeft)
    assert(Cli.parseArgs(Seq("--mode", "bogus")).isLeft)
    assert(Cli.parseArgs(Seq("--format", "yaml")).isLeft)
    assert(Cli.parseArgs(Seq("--min-liquidity", "abc")).isLeft)
    assert(Cli.parseArgs(Seq("--min-liquidity")).isLeft)
    assert(Cli.parseArgs(Seq("--bogus-flag")).isLeft)
    assert(Cli.parseArgs(Seq("--dexs", "raydium,nope")).isLeft)
  }

  test("EP1 e2e: argv -> decode -> --once --output file (cli.py:1053-1074)") {
    import graft.cli.Main
    import graft.decode.Wire
    val spark = SparkTestSession.spark
    import spark.implicits._

    def tokenFrame(seed: Int): Array[Byte] = {
      val nums = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      nums.putDouble(0.004).putDouble(250000.0).putDouble(500.0)
      val text = (s"  $$TOK${('A' + seed % 5).toChar} pumpfun 24h " +
        "So11111111111111111111111111111111111111112 ").getBytes("UTF-8")
      Wire.Preamble ++ Wire.PairsMarker ++ new Array[Byte](15) ++ nums.array() ++ text
    }
    val framesDir = java.nio.file.Files.createTempDirectory("cli_frames").toString
    (0 until 3).map(i => (i.toLong, tokenFrame(i), 1700000000L + i))
      .toDF("frame_id", "frame", "extraction_ts")
      .write.mode("overwrite").parquet(framesDir)
    val outFile = java.nio.file.Files.createTempFile("cli_out", ".json").toString

    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Main.run(
      Seq("--once", "--output", outFile, "--format", "json", "--limit", "2",
        "--frames", framesDir),
      _ => (), errs += _, sparkOpt = Some(spark))
    assert(code == 0 && errs.isEmpty)
    val payload = java.nio.file.Files.readString(java.nio.file.Paths.get(outFile))
    assert(payload.startsWith("""{"type":"enhanced_tokens","extraction_timestamp":"""))
    assert(payload.contains(""""total_extracted":"""))
    assert(payload.contains(""""symbol":"TOK"""))
    assert(payload.endsWith("\n")) // cli.py:1070-1071 trailing newline

    // mt5 one-shot to stdout
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(Main.run(Seq("--once", "--format", "mt5", "--frames", framesDir),
      lines += _, errs += _, sparkOpt = Some(spark)) == 0)
    assert(lines.mkString.startsWith("2023.11.14")) // 1700000000 UTC, W2 bar

    // exit codes: filter excluding everything -> 1 with the reference message
    assert(Main.run(Seq("--once", "--min-liquidity", "999999999",
      "--frames", framesDir), _ => (), errs += _, sparkOpt = Some(spark)) == 1)
    assert(errs.contains("Failed to extract token data"))
    // --output without --once -> 2 (cli.py:1077-1079)
    assert(Main.run(Seq("--output", "x.json", "--frames", framesDir),
      _ => (), errs += _, sparkOpt = Some(spark)) == 2)
    // parse error -> 2
    assert(Main.run(Seq("--bogus", "--frames", framesDir),
      _ => (), errs += _, sparkOpt = Some(spark)) == 2)
  }

  test("CLI config compiles to the reference URL (config goldens)") {
    val url = Cli.configFromArgv(Seq("--mode", "trending", "--chain", "solana",
      "--timeframe", "h6")).toOption.get.buildWebsocketUrl
    // trendingScore* rank forces the h24 endpoint (config.py:256-264)
    assert(url.startsWith("wss://io.dexscreener.com/dex/screener/v5/pairs/h24/1?"))
    assert(url.contains("rankBy[key]=trendingScoreH6"))
    assert(url.contains("filters[chainIds][0]=solana"))

    val custom = Cli.configFromArgv(Seq("--rank-by", "volume", "--timeframe", "h1",
      "--min-liquidity", "25000")).toOption.get.buildWebsocketUrl
    assert(custom.startsWith("wss://io.dexscreener.com/dex/screener/v5/pairs/h1/1?"))
    assert(custom.contains("rankBy[key]=volume&rankBy[order]=desc"))
    assert(custom.contains("filters[liquidity][min]=25000"))
  }
}
