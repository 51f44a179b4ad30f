package graft

import graft.functions.{Base58, Functions => F}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function goldens mirrored from the reference's own tests
  * (tests/test_decode_pair.py, tests/test_edge_cases.py:129-158,
  * tests/test_config.py) plus direct readings of utils.py/scraper.py.
  */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def evalStr(input: String, f: Column => Column): String =
    Seq(Option(input)).toDF("v").select(f(col("v")).as("r")).collect()(0).getString(0)
  private def evalD(input: java.lang.Double, f: Column => Column): Any =
    Seq(Option(input.doubleValue())).toDF("v").select(f(col("v")).as("r")).collect()(0).get(0)

  test("cleanString removes non-printables, keeps tab") {
    assert(evalStr("foo\u0000bar\nbaz\tqux\r", F.cleanString) == "foobarbaz\tqux")
  }
  test("cleanString truncates at @ and backslash") {
    assert(evalStr("hello@world", F.cleanString) == "hello")
    assert(evalStr("test\\path", F.cleanString) == "test")
  }
  test("cleanString trims whitespace in the no-garbage branch") {
    assert(evalStr("  padded \t", F.cleanString) == "padded")
    assert(evalStr(null, F.cleanString) == "")
  }

  test("normalizeSymbol uppercases, strips, caps at 10, defaults UNK") {
    assert(evalStr("sol-usd!", F.normalizeSymbol) == "SOLUSD")
    assert(evalStr("abcdefghijklmno", F.normalizeSymbol) == "ABCDEFGHIJ")
    assert(evalStr("$$$", F.normalizeSymbol) == "UNK")
    assert(evalStr(null, F.normalizeSymbol) == "UNK")
  }

  test("formatVolume K/M/B suffixes (utils.py:340-358)") {
    assert(evalD(1500000000.0, F.formatVolume) == "$1.50B")
    assert(evalD(2500000.0, F.formatVolume) == "$2.50M")
    assert(evalD(1500.0, F.formatVolume) == "$1.50K")
    assert(evalD(999.0, F.formatVolume) == "$999.00")
  }

  test("formatLargeNumber CLI variant (cli.py:232-241)") {
    assert(evalD(1500000000.0, F.formatLargeNumber) == "$1.5B")
    assert(evalD(2500000.0, F.formatLargeNumber) == "$2.5M")
    assert(evalD(1500.0, F.formatLargeNumber) == "$2K") // %.0f rounds
    assert(evalD(999.4, F.formatLargeNumber) == "$999")
  }

  test("formatPercentage = python f'{v:.1%}'") {
    assert(evalD(0.05, F.formatPercentage) == "5.0%")
    assert(evalD(-0.123, F.formatPercentage) == "-12.3%")
  }

  test("formatNumber strips trailing zeros; N/A on null") {
    assert(evalD(0.000123, F.formatNumber(_)) == "0.000123")
    assert(evalD(1234.5, F.formatNumber(_)) == "1,234.5")
    val r = Seq((Option.empty[Double], 1)).toDF("v", "k")
      .select(F.formatNumber(col("v")).as("r")).collect()(0).getString(0)
    assert(r == "N/A")
  }

  test("safeDivide handles zero denominator (utils.py:374-388)") {
    val row = Seq((10.0, 0.0), (10.0, 4.0)).toDF("n", "d")
      .select(F.safeDivide(col("n"), col("d")).as("r")).collect()
    assert(row(0).getDouble(0) == 0.0 && row(1).getDouble(0) == 2.5)
  }

  test("confidenceScore formula + completeness bonus (utils.py:258-286)") {
    val df = Seq((8, 3, 2), (1, 0, 0), (4, 2, 1)).toDF("f", "c", "m")
      .select(F.confidenceScore(col("f"), col("c"), col("m")).as("r")).collect()
    assert(df(0).getDouble(0) == 1.0) // 0.5 + 0.3 + 0.2 + bonus, capped
    assert(math.abs(df(1).getDouble(0) - 0.1) < 1e-12)
    assert(math.abs(df(2).getDouble(0) - 0.8) < 1e-12) // 0.4 + 0.2 + 0.2, no bonus
  }

  test("isValidFloat rejects 0.0, ±1.0, non-finite, out-of-range (utils.py:85-108)") {
    val vals = Seq(0.0, 1.0, -1.0, Double.NaN, Double.PositiveInfinity, 1e16, 1e-16,
      0.0004451, 22000.0)
    val got = vals.toDF("v").select(F.isValidFloat(col("v")).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, false, false, false, false, false, false, true, true))
  }

  test("validTradingData accepts UI-validated rows, rejects zeros/huge/negative (test_edge_cases.py:99-127)") {
    val rows = Seq(
      (0.0004451, 22000.0, true), (0.0001349, 43000.0, true), (0.00001169, 3800000.0, true),
      (0.0, 0.0, false), (1e20, 1e20, false), (-0.001, 1000.0, false))
    val got = rows.toDF("p", "v", "want")
      .select(F.validTradingData(col("p"), col("v")).as("r"), col("want")).collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("classifyValue validated ranges, first-match-wins (scraper.py:766-828)") {
    val rows = Seq(
      (0.05, "double", "prices"), (357.0, "uint32", "txns"), (193.0, "float", "makers"),
      (500000.0, "double", "volumes"), (87000.0, "double", "liquidity"),
      (45000000.0, "double", "market_caps"), (55.5, "double", "percentages"))
    rows.foreach { case (v, dt, want) =>
      val got = Seq((v, dt)).toDF("v", "dt")
        .select(F.classifyValue(col("v"), col("dt")).as("r")).collect()(0).getString(0)
      assert(got == want, s"classify($v, $dt)")
    }
  }

  test("base58 goldens (test_edge_cases.py:129-142)") {
    assert(Base58.isProbableSolanaAddress("So11111111111111111111111111111111111111112"))
    assert(Base58.isProbableSolanaAddress("DjDzLNonA1XcWpzTBZhNZUqHCvq6SeLfT3otPYdVSMH"))
    assert(Base58.isProbableSolanaAddress("D9h4GK3kkm5GFpCTWUak6ZNN5hn9tJBNYCgbwMVPwSba"))
    assert(!Base58.isProbableSolanaAddress("VSo11111111111111111111111111111111111111112")) // 45 chars
    assert(!Base58.isProbableSolanaAddress("0OIl" * 10)) // invalid alphabet
    assert(!Base58.isProbableSolanaAddress("abc")) // too short
    assert(!Base58.isProbableSolanaAddress(null))
  }

  test("isBase58Address column expression matches the Scala impl") {
    val df = Seq("So11111111111111111111111111111111111111112", "not-an-address-but-long-enough-000000")
      .toDF("a").select(F.isBase58Address(col("a")).as("r")).collect()
    assert(df(0).getBoolean(0) && !df(1).getBoolean(0))
  }

  test("classifyUrl (scraper.py:948-958)") {
    val cases = Seq(
      "https://twitter.com/foo" -> "twitter", "https://x.com/foo" -> "twitter",
      "https://t.me/foo" -> "telegram", "https://mysite.io/x" -> "website",
      "ftp://weird" -> "unknown")
    cases.foreach { case (in, want) => assert(evalStr(in, F.classifyUrl) == want, in) }
  }

  test("displayName fallback chain (models.py:350-356)") {
    val df = Seq(
      (Some("Name"), Some("SYM"), Some(5)),
      (None, Some("SYM"), Some(5)),
      (None, None, Some(5)),
      (None, None, None)).toDF("n", "s", "p")
      .select(F.displayName(col("n"), col("s"), col("p")).as("r")).collect()
    assert(df.map(_.getString(0)).toSeq == Seq("Name", "SYM", "Token_5", "Token_Unknown"))
  }

  test("TokenProfile.toTradingPair legacy conversion (models.py:217-251)") {
    import graft.model._
    val full = TokenProfile(symbol = Some("PEPE"), token_name = Some("Pepe"),
      price = Some(0.001), change_24h = Some(5.0), volume_24h = Some(2e5),
      liquidity = Some(4e4), market_cap = Some(1e6), timestamp = Some(1700000000L),
      chain = Some("solana"), protocol = Some("pumpfun"),
      pair_address = Some("pairX"), token_address = Some("tokX"))
    val p = full.toTradingPair
    assert(p.base_token_name == "Pepe" && p.base_token_symbol == "PEPE")
    assert(p.price_data.contains(PriceData(Some(0.001), Some(0.001), Some(5.0))))
    assert(p.volume_data.contains(VolumeData(Some(2e5), None, None)))
    assert(p.liquidity_data.contains(LiquidityData(Some(4e4), None, None)))
    assert(p.fdv.contains(1e6) && p.created_at.contains(1700000000L))

    val empty = TokenProfile().toTradingPair
    assert(empty.chain == "solana" && empty.protocol == "unknown")
    assert(empty.pair_address == "unknown" && empty.base_token_name == "Unknown Token")
    assert(empty.base_token_symbol == "UNK" && empty.base_token_address == "unknown")
    assert(empty.price_data.isEmpty && empty.volume_data.isEmpty && empty.liquidity_data.isEmpty)

    // name falls back to symbol before the literal default
    assert(TokenProfile(symbol = Some("X")).toTradingPair.base_token_name == "X")
  }

  test("word_shingles expression ≡ HOF formulation, incl. empty-token edge cases") {
    import graft.ext.TextOps
    // the historical interpreted formulation, kept here as the oracle
    def hofShingles(text: Column, n: Int): Column = {
      val toks = split(text, " ")
      val count = size(toks) - (n - 1)
      when(count >= 1,
        array_distinct(transform(sequence(lit(1), count),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
        .otherwise(array().cast("array<string>"))
    }
    val fixtures = Seq(
      "alpha beta gamma delta", "one", "", "a b", "a  b", " lead", "trail ",
      "x y x y x y", "双字节 字符 混合 ascii test", "a b c d e f g h i",
      "repeat repeat repeat repeat", "  ", "tab\tis one token here")
    for (n <- Seq(1, 2, 3, 8)) {
      val df = fixtures.toDF("text")
      val got = df.select(TextOps.shingleArray(col("text"), n).as("s")).collect()
        .map(_.getSeq[String](0))
      val distinctGot = df.select(TextOps.wordShingles(col("text"), n).as("s"))
        .collect().map(_.getSeq[String](0))
      val want = df.select(hofShingles(col("text"), n).as("s")).collect()
        .map(_.getSeq[String](0))
      // distinct variant matches the HOF oracle exactly (order included)
      assert(distinctGot.toSeq == want.toSeq, s"n=$n distinct mismatch")
      // occurrence variant: distinct-preserving-first-occurrence == oracle
      assert(got.map(_.distinct).toSeq == want.toSeq, s"n=$n occurrence mismatch")
    }
    // occurrence multiplicity is preserved (the repetition gates count it)
    val occ = Seq("x y x y x y").toDF("text")
      .select(TextOps.shingleArray(col("text"), 2).as("s")).collect()(0).getSeq[String](0)
    assert(occ == Seq("x y", "y x", "x y", "y x", "x y"))
    // null text → empty array, both variants (matches the HOF otherwise-branch)
    val nullDf = Seq(Option.empty[String]).toDF("text")
    assert(nullDf.select(TextOps.shingleArray(col("text"), 3)).collect()(0)
      .getSeq[String](0).isEmpty)
    assert(nullDf.select(TextOps.wordShingles(col("text"), 3)).collect()(0)
      .getSeq[String](0).isEmpty)
    // SQL registration path
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").collect()(0).getSeq[String](0)
    assert(viaSql == Seq("a b c", "b c d"))
  }

  test("Md5PrefixLong ≡ conv(substring(md5(s),1,n),16,10) for n=8 and n=15") {
    import graft.ext.TextOps
    // randomized-but-deterministic inputs: unicode, empties, long strings,
    // leading-zero digests eventually covered by volume
    val rnd = new scala.util.Random(42)
    val inputs = (0 until 500).map { i =>
      val len = rnd.nextInt(40)
      new String((0 until len).map(_ => (rnd.nextInt(1 << 14) + 1).toChar).toArray) + s"#$i"
    } ++ Seq("", "a", " ", "κόσμε", "x" * 10000)
    val df = inputs.toDF("s")
    Seq(8, 15).foreach { n =>
      val got = df.select(graft.functions.Md5PrefixLong(col("s"), n)).collect().map(_.getLong(0))
      val want = df.select(conv(substring(md5(col("s")), 1, n), 16, 10).cast("long"))
        .collect().map(_.getLong(0))
      assert(got.sameElements(want), s"hexLen=$n diverged from the composed form")
    }
    // null in → null out, like the composed form
    val nullRow = Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.Md5PrefixLong(col("s"), 8)).collect()(0)
    assert(nullRow.isNullAt(0))
    // the two public wrappers route through it
    val viaOps = Seq("abc").toDF("s")
      .select(TextOps.hash32(col("s")), TextOps.hash60(col("s"))).collect()(0)
    val viaSql2 = Seq("abc").toDF("s")
      .select(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")).collect()(0)
    assert(viaOps == viaSql2)
  }
}
