package graft.cli

import graft.config._

/** CLI layer mirroring the reference's argparse surface
  * (reference: dexscraper/cli.py:864-1030), legacy subcommand
  * normalization (cli.py:702-715), and config building with the
  * default-rank-tracks-timeframe rule (cli.py:771-859).
  *
  * Parsing is pure (argv → Either[error, CliArgs]) so the query layer
  * stays testable; the engine consumes the resulting ScrapingConfig
  * through QueryCompiler exactly as the SDK path does.
  */
object Cli {

  final case class CliArgs(
      format: String = "json",
      debug: Boolean = false,
      once: Boolean = false,
      limit: Int = 20,
      output: Option[String] = None,
      cloudflareBypass: Boolean = false,
      rateLimit: Double = 4.0,
      maxRetries: Int = 5,
      mode: Option[String] = None,
      chain: Chain = Chain.Solana,
      chains: Option[Seq[Chain]] = None,
      timeframe: Timeframe = Timeframe.H24,
      rankBy: Option[RankBy] = None,
      order: String = "desc",
      dex: Option[Dex] = None,
      dexs: Option[Seq[Dex]] = None,
      minLiquidity: Option[Long] = None, maxLiquidity: Option[Long] = None,
      minVolume: Option[Long] = None, maxVolume: Option[Long] = None,
      minVolumeH6: Option[Long] = None, maxVolumeH6: Option[Long] = None,
      minVolumeH1: Option[Long] = None, maxVolumeH1: Option[Long] = None,
      minTxns: Option[Long] = None, maxTxns: Option[Long] = None,
      minTxnsH6: Option[Long] = None, maxTxnsH6: Option[Long] = None,
      minTxnsH1: Option[Long] = None, maxTxnsH1: Option[Long] = None,
      minAge: Option[Long] = None, maxAge: Option[Long] = None,
      minChange: Option[Double] = None, maxChange: Option[Double] = None,
      minChangeH6: Option[Double] = None, maxChangeH6: Option[Double] = None,
      minChangeH1: Option[Double] = None, maxChangeH1: Option[Double] = None,
      minFdv: Option[Long] = None, maxFdv: Option[Long] = None,
      minMcap: Option[Long] = None, maxMcap: Option[Long] = None,
      enhanced: Boolean = false,
      minBoosts: Option[Long] = None,
      minAds: Option[Long] = None)

  val Formats = Set("json", "ohlc", "mt5", "ohlcv", "ohlcvt", "rich")
  val Modes = Set("trending", "top", "gainers", "new", "transactions", "boosted")

  /** cli.py:702-715: `interactive` → `--format rich`; the six legacy
    * subcommands → `--mode <name>`; anything else passes through.
    */
  def normalizeLegacyArgs(argv: Seq[String]): Seq[String] = {
    if (argv.isEmpty) return argv
    val command = argv.head.toLowerCase
    if (command == "interactive") Seq("--format", "rich") ++ argv.tail
    else if (Modes.contains(command)) Seq("--mode", command) ++ argv.tail
    else argv
  }

  // cli.py:728-768 typed parsers with the reference's error style
  def parseChain(v: String): Either[String, Chain] =
    Chain.all.find(_.value == v.toLowerCase)
      .toRight(s"Invalid chain: $v. Choose from: ${Chain.all.map(_.value)}")
  def parseTimeframe(v: String): Either[String, Timeframe] =
    Timeframe.all.find(_.value == v.toLowerCase)
      .toRight(s"Invalid timeframe: $v. Choose from: ${Timeframe.all.map(_.value)}")
  def parseRankBy(v: String): Either[String, RankBy] =
    (RankBy.trending ++ Set(RankBy.Volume, RankBy.Transactions, RankBy.PriceChangeH24,
      RankBy.PriceChangeH6, RankBy.PriceChangeH1, RankBy.Liquidity, RankBy.Fdv,
      RankBy.MarketCap)).find(_.value == v)
      .toRight(s"Invalid rank method: $v")
  def parseDex(v: String): Either[String, Dex] =
    Dex.all.find(_.value == v.toLowerCase)
      .toRight(s"Invalid DEX: $v. Choose from: ${Dex.all.map(_.value)}")
  def parseDexList(v: String): Either[String, Seq[Dex]] = {
    val parts = v.split(",").toSeq.map(_.trim)
    val parsed = parts.map(parseDex)
    parsed.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(parsed.collect { case Right(d) => d }))
  }
  def parseChainList(v: String): Either[String, Seq[Chain]] = {
    val parsed = v.split(",").toSeq.map(c => parseChain(c.trim))
    parsed.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(parsed.collect { case Right(c) => c }))
  }

  /** Flag-based parse of the full cli.py:864-1030 surface (long names +
    * the reference's short aliases). Legacy subcommands are normalized
    * first, matching `parse_args(normalize_legacy_cli_args(...))`.
    */
  def parseArgs(argvRaw: Seq[String]): Either[String, CliArgs] = {
    val argv = normalizeLegacyArgs(argvRaw)
    var a = CliArgs()
    var i = 0
    def long(v: String): Either[String, Long] =
      v.toLongOption.toRight(s"invalid int value: '$v'")
    def dbl(v: String): Either[String, Double] =
      v.toDoubleOption.toRight(s"invalid float value: '$v'")
    while (i < argv.length) {
      val flag = argv(i)
      def value: Either[String, String] =
        if (i + 1 < argv.length) { i += 1; Right(argv(i)) }
        else Left(s"argument $flag: expected one argument")
      val res: Either[String, Unit] = flag match {
        case "--format" | "-f" => value.flatMap(v =>
          if (Formats.contains(v)) { a = a.copy(format = v); Right(()) }
          else Left(s"argument --format: invalid choice: '$v'"))
        case "--debug" | "-d" => a = a.copy(debug = true); Right(())
        case "--once" => a = a.copy(once = true); Right(())
        case "--limit" => value.flatMap(long).map(v => a = a.copy(limit = v.toInt))
        case "--output" => value.map(v => a = a.copy(output = Some(v)))
        case "--cloudflare-bypass" => a = a.copy(cloudflareBypass = true); Right(())
        case "--rate-limit" | "-r" => value.flatMap(dbl).map(v => a = a.copy(rateLimit = v))
        case "--max-retries" | "-m" => value.flatMap(long).map(v => a = a.copy(maxRetries = v.toInt))
        case "--mode" => value.flatMap(v =>
          if (Modes.contains(v)) { a = a.copy(mode = Some(v)); Right(()) }
          else Left(s"argument --mode: invalid choice: '$v'"))
        case "--chain" => value.flatMap(parseChain).map(v => a = a.copy(chain = v))
        case "--chains" => value.flatMap(parseChainList).map(v => a = a.copy(chains = Some(v)))
        case "--timeframe" | "-t" => value.flatMap(parseTimeframe).map(v => a = a.copy(timeframe = v))
        case "--rank-by" => value.flatMap(parseRankBy).map(v => a = a.copy(rankBy = Some(v)))
        case "--order" => value.flatMap(v =>
          if (v == "asc" || v == "desc") { a = a.copy(order = v); Right(()) }
          else Left(s"argument --order: invalid choice: '$v'"))
        case "--dex" => value.flatMap(parseDex).map(v => a = a.copy(dex = Some(v)))
        case "--dexs" => value.flatMap(parseDexList).map(v => a = a.copy(dexs = Some(v)))
        case "--min-liquidity" => value.flatMap(long).map(v => a = a.copy(minLiquidity = Some(v)))
        case "--max-liquidity" => value.flatMap(long).map(v => a = a.copy(maxLiquidity = Some(v)))
        case "--min-volume" => value.flatMap(long).map(v => a = a.copy(minVolume = Some(v)))
        case "--max-volume" => value.flatMap(long).map(v => a = a.copy(maxVolume = Some(v)))
        case "--min-volume-h6" => value.flatMap(long).map(v => a = a.copy(minVolumeH6 = Some(v)))
        case "--max-volume-h6" => value.flatMap(long).map(v => a = a.copy(maxVolumeH6 = Some(v)))
        case "--min-volume-h1" => value.flatMap(long).map(v => a = a.copy(minVolumeH1 = Some(v)))
        case "--max-volume-h1" => value.flatMap(long).map(v => a = a.copy(maxVolumeH1 = Some(v)))
        case "--min-txns" => value.flatMap(long).map(v => a = a.copy(minTxns = Some(v)))
        case "--max-txns" => value.flatMap(long).map(v => a = a.copy(maxTxns = Some(v)))
        case "--min-txns-h6" => value.flatMap(long).map(v => a = a.copy(minTxnsH6 = Some(v)))
        case "--max-txns-h6" => value.flatMap(long).map(v => a = a.copy(maxTxnsH6 = Some(v)))
        case "--min-txns-h1" => value.flatMap(long).map(v => a = a.copy(minTxnsH1 = Some(v)))
        case "--max-txns-h1" => value.flatMap(long).map(v => a = a.copy(maxTxnsH1 = Some(v)))
        case "--min-age" => value.flatMap(long).map(v => a = a.copy(minAge = Some(v)))
        case "--max-age" => value.flatMap(long).map(v => a = a.copy(maxAge = Some(v)))
        case "--min-change" => value.flatMap(dbl).map(v => a = a.copy(minChange = Some(v)))
        case "--max-change" => value.flatMap(dbl).map(v => a = a.copy(maxChange = Some(v)))
        case "--min-change-h6" => value.flatMap(dbl).map(v => a = a.copy(minChangeH6 = Some(v)))
        case "--max-change-h6" => value.flatMap(dbl).map(v => a = a.copy(maxChangeH6 = Some(v)))
        case "--min-change-h1" => value.flatMap(dbl).map(v => a = a.copy(minChangeH1 = Some(v)))
        case "--max-change-h1" => value.flatMap(dbl).map(v => a = a.copy(maxChangeH1 = Some(v)))
        case "--min-fdv" => value.flatMap(long).map(v => a = a.copy(minFdv = Some(v)))
        case "--max-fdv" => value.flatMap(long).map(v => a = a.copy(maxFdv = Some(v)))
        case "--min-mcap" => value.flatMap(long).map(v => a = a.copy(minMcap = Some(v)))
        case "--max-mcap" => value.flatMap(long).map(v => a = a.copy(maxMcap = Some(v)))
        case "--enhanced" => a = a.copy(enhanced = true); Right(())
        case "--min-boosts" => value.flatMap(long).map(v => a = a.copy(minBoosts = Some(v)))
        case "--min-ads" => value.flatMap(long).map(v => a = a.copy(minAds = Some(v)))
        case other => Left(s"unrecognized arguments: $other")
      }
      res match {
        case Left(e) => return Left(e)
        case Right(_) =>
      }
      i += 1
    }
    Right(a)
  }

  /** cli.py:771-859: preset-mode dispatch (with the reference's default
    * floors for top/gainers/new), else a custom Filters build with the
    * default-rank-tracks-timeframe rule (cli.py:846-852).
    */
  def buildConfigFromArgs(a: CliArgs): ScrapingConfig = {
    a.mode match {
      case Some(mode) =>
        val chain = a.chains.flatMap(_.headOption).getOrElse(a.chain)
        mode match {
          case "trending" => PresetConfigs.trending(chain, a.timeframe)
          case "top" => PresetConfigs.topVolume(chain,
            a.minLiquidity.getOrElse(25000L), a.minTxns.getOrElse(50L))
          case "gainers" => PresetConfigs.gainers(chain,
            a.minLiquidity.getOrElse(25000L), a.minVolume.getOrElse(10000L))
          case "new" => PresetConfigs.newPairs(chain, a.maxAge.getOrElse(24L))
          case "transactions" => PresetConfigs.topTransactions(chain)
          case "boosted" => PresetConfigs.boostedOnly(chain)
          case _ => PresetConfigs.trending(chain, a.timeframe)
        }
      case None =>
        val chains = a.chains.getOrElse(Seq(a.chain))
        val dexs = a.dex.map(Seq(_)).orElse(a.dexs).getOrElse(Seq.empty)
        val filters = Filters(
          chainIds = chains, dexIds = dexs,
          liquidityMin = a.minLiquidity, liquidityMax = a.maxLiquidity,
          volumeH24Min = a.minVolume, volumeH24Max = a.maxVolume,
          volumeH6Min = a.minVolumeH6, volumeH6Max = a.maxVolumeH6,
          volumeH1Min = a.minVolumeH1, volumeH1Max = a.maxVolumeH1,
          txnsH24Min = a.minTxns, txnsH24Max = a.maxTxns,
          txnsH6Min = a.minTxnsH6, txnsH6Max = a.maxTxnsH6,
          txnsH1Min = a.minTxnsH1, txnsH1Max = a.maxTxnsH1,
          pairAgeMin = a.minAge, pairAgeMax = a.maxAge,
          priceChangeH24Min = a.minChange, priceChangeH24Max = a.maxChange,
          priceChangeH6Min = a.minChangeH6, priceChangeH6Max = a.maxChangeH6,
          priceChangeH1Min = a.minChangeH1, priceChangeH1Max = a.maxChangeH1,
          fdvMin = a.minFdv, fdvMax = a.maxFdv,
          marketCapMin = a.minMcap, marketCapMax = a.maxMcap,
          enhancedTokenInfo = a.enhanced,
          activeBoostsMin = a.minBoosts,
          recentPurchasedImpressionsMin = a.minAds)
        val defaultRank = a.timeframe match {
          case Timeframe.M5 => RankBy.TrendingScoreM5
          case Timeframe.H1 => RankBy.TrendingScoreH1
          case Timeframe.H6 => RankBy.TrendingScoreH6
          case Timeframe.H24 => RankBy.TrendingScoreH24
        }
        val order = if (a.order == "desc") Order.Desc else Order.Asc
        ScrapingConfig(a.timeframe, a.rankBy.getOrElse(defaultRank), order, filters)
    }
  }

  /** argv → config (the composition every entry point uses). */
  def configFromArgv(argv: Seq[String]): Either[String, ScrapingConfig] =
    parseArgs(argv).map(buildConfigFromArgs)
}
