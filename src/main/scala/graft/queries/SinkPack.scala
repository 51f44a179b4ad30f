package graft.queries

import graft.Tables
import graft.sinks.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gate for the sink/format layer (SURVEY §2.11 O3-O6, §2.6
  * P3-P4): hourly OHLC bars (the q10 aggregation) rendered through the
  * SAME Column-level line builders the `Sinks.*Lines` exports use —
  * MT5 lines, CSV OHLCV/OHLCVT lines (both real-trades and the W5
  * volume/1000 estimate branch), the K/M/B large-number suffix, and the
  * ISO timestamp format — each reproduced by DuckDB strftime/printf.
  *
  * Float-format parity is provable, not hoped-for: %.Nf for N ≥ 1 cannot
  * tie (odd/(2·10^N) is not a dyadic rational, hence not a double), so
  * Java's HALF_UP equals C's HALF_EVEN on every value; the only %.0f
  * sites pre-round with bround (HALF_EVEN), matching printf exactly.
  */
object SinkPack {

  def sinkFormats(spark: SparkSession, dir: String): DataFrame = {
    val bars = Tables.events(spark, dir)
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .groupBy(col("bucket"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        Tables.exactSum(col("value"), 2).as("volume"),
        count(lit(1)).as("trades"))
    // Odd trade counts go null so the OHLCVT line exercises BOTH the
    // real-trades branch and the W5 volume/1000 estimate fallback.
    val tradesOrNull = when(col("trades") % 2 === 0, col("trades"))
    bars.select(
      unix_timestamp(col("bucket")).as("bar_unix"),
      col("event_type"),
      Sinks.mt5LineCol(col("bucket"), col("open"), col("high"), col("low"),
        col("close"), col("volume")).as("mt5_line"),
      Sinks.csvOhlcvLineCol(col("bucket"), col("open"), col("high"), col("low"),
        col("close"), col("volume")).as("csv_line"),
      Sinks.csvOhlcvtLineCol(col("bucket"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), tradesOrNull).as("ohlcvt_line"),
      Sinks.largeNumberCol(col("volume")).as("volume_human"),
      date_format(col("bucket"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts"))
      .orderBy(col("bar_unix"), col("event_type"))
  }

  /** A6/O12 Prometheus exposition, distributed: sample lines built by
    * the Column-level builder (with the REAL Python-repr codegen
    * expression) instead of the driver-side top-10 loop. Values are
    * planted in repr-closed-form families (x.5 halves and
    * integer-valued doubles — repr is "<int>.5" / "<int>.0" exactly),
    * with the reference's zero/null truthiness skip exercised on both
    * metrics.
    */
  def prometheusLines(spark: SparkSession, dir: String): DataFrame = {
    val c = col("c_custkey")
    val k = c.cast("string")
    val tsMs = lit(1700000000000L)
    val price = when(c % 4 === 1, (c % 90).cast("double") + 0.5)
      .when(c % 4 === 3, (c % 500 + 1).cast("double"))
      .when(c % 4 === 0, lit(0.0)) // falsy → line skipped
      .otherwise(lit(null).cast("double")) // missing → line skipped
    val volume = when(c % 3 === 0, lit(0.0))
      .otherwise((c % 1000 + 1).cast("double") * 1024.0)
    Tables.customer(spark, dir).select(
        c,
        Sinks.prometheusSampleCol("dex_token_price",
          concat(lit("TK"), k), price, tsMs).as("price_line"),
        Sinks.prometheusSampleCol("dex_token_volume_24h",
          concat(lit("TK"), k), volume, tsMs).as("volume_line"))
      .orderBy(c)
  }

  /** O7-O11 export value math, oracle-gated (models.py:463-662) — the
    * five API-shaped exporters' DERIVED VALUES as columns, so DuckDB can
    * recompute every formula the serializers embed:
    *   - Binance klines (O8): open/close time ms (+60 000 1-minute
    *     close), %.8f price/volume strings, taker volume = 0.6·v,
    *     trades-falsy → 1;
    *   - CoinGecko (O9): rank = enumerate-index+1 (of the ORIGINAL list
    *     position — the skip happens after enumerate), ath = price·1.2,
    *     name fallback chain, skip-if-no-price;
    *   - PancakeSwap (O10): price_BNB = price·0.002, address-keyed map
    *     with empty-address/priceless skip;
    *   - TradingView (O7): the columnar transpose — per-series ordered
    *     t/c arrays rendered as csv strings (windowed ordered agg);
    *   - Excel (O11): the full csv.writer row via [[Sinks.excelCsvLineCol]]
    *     (minimal quoting, falsy → "", Python-repr doubles).
    * Planted values use q46's repr-closed-form families (x.5 halves and
    * integer-valued doubles) so DuckDB can spell the Python reprs; the
    * double-math columns (ath, price_BNB, taker) compare BITWISE.
    * The global ordinal and the envelope rank both run through the
    * range-partitioned prefix rank ([[graft.ext.PrefixOps]]) — no
    * single-partition window anywhere in the sink path.
    */
  def exportValueMath(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = col("c_custkey")
    val tvW = Window.partitionBy(c % 10).orderBy(c)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tvRank = Window.partitionBy(c % 10).orderBy(c)

    val base0 = Tables.customer(spark, dir).select(
      c,
      concat(lit("TK"), c.cast("string")).as("symbol"),
      when(c % 11 === 0, lit(null).cast("string"))
        .when(c % 5 === 0, concat(lit("Tok, "), c.cast("string")))
        .otherwise(concat(lit("Tok "), c.cast("string"))).as("name"),
      when(c % 4 === 1, (c % 90).cast("double") + 0.5)
        .when(c % 4 === 3, (c % 500 + 1).cast("double"))
        .when(c % 4 === 0, lit(0.0))
        .otherwise(lit(null).cast("double")).as("price"),
      ((c % 1000 + 1).cast("double") * 1024.0).as("volume"),
      ((c % 700 + 1).cast("double") * 4096.0).as("mcap"),
      (c % 1500 + 1).cast("int").as("txns"),
      (c % 300).cast("int").as("makers"),
      ((c % 32 + 128).cast("double") * 256.0).as("liquidity"),
      when(c % 7 === 0, -((c % 20).cast("double") + 0.5))
        .otherwise((c % 20).cast("double") + 0.5).as("change"),
      when(c % 3 === 0, lit("")).otherwise(concat(lit("ADDR"), c.cast("string")))
        .as("address"),
      when(c % 2 === 0, concat(lit("https://x.test/"), c.cast("string")))
        .otherwise(lit("")).as("website"),
      when(c % 6 === 0, concat(lit("@tk"), c.cast("string")))
        .otherwise(lit("")).as("twitter"),
      (lit(1700000000L) + c % 3600).as("ts"),
      // ODD numerator: open = odd/2^11 has exponent -11, so neither it
      // nor its 1.5x/0.5x/1.25x multiples can equal odd/(2*10^8) — the
      // only values where Java (HALF_UP) and C (HALF_EVEN) %.8f diverge.
      // An even numerator CAN tie (e.g. 180/2048*1.25 = 0.087890625).
      (((c % 32) * 2 + 129).cast("double") / 2048.0).as("open"))
    // the global ordinal `i` via the range-partitioned prefix rank — a
    // bare `row_number().over(Window.orderBy(c))` serializes the whole
    // export through one task (the WindowExec single-partition warning)
    val base = graft.ext.PrefixOps.groupedRunningAgg(
        base0.withColumn("_g", lit(0L)), Seq("_g"), Seq("c_custkey"),
        rankName = "_rk")
      .withColumn("i", (col("_rk") - 1).cast("long"))
      .drop("_g", "_rk")

    val hasPrice = col("price").isNotNull && col("price") =!= 0.0
    val psOk = col("address") =!= "" && hasPrice
    base.select(
      c,
      // O8 Binance klines
      (col("ts") * 1000).as("k_open_ms"),
      (col("ts") * 1000 + 60000).as("k_close_ms"),
      format_string("%.8f", col("open")).as("k_open"),
      format_string("%.8f", col("open") * 1.5).as("k_high"),
      format_string("%.8f", col("open") * 0.5).as("k_low"),
      format_string("%.8f", col("open") * 1.25).as("k_close"),
      format_string("%.8f", col("volume")).as("k_vol"),
      format_string("%.8f", col("volume") * 0.6).as("k_taker"),
      when(c % 2 === 0, col("txns")).otherwise(lit(1)).as("k_trades"),
      // O9 CoinGecko
      when(hasPrice, concat(lit("token-"), col("i").cast("string"))).as("cg_id"),
      when(hasPrice, coalesce(col("name"), col("symbol"))).as("cg_name"),
      when(hasPrice, col("i") + 1).as("cg_rank"),
      when(hasPrice, col("price") * 1.2).as("cg_ath"),
      when(hasPrice, date_format(timestamp_seconds(col("ts")),
        "yyyy-MM-dd'T'HH:mm:ss")).as("cg_last_updated"),
      // O10 PancakeSwap
      when(psOk, col("address")).as("ps_key"),
      when(psOk, col("price") * 0.002).as("ps_price_bnb"),
      when(psOk, col("ts")).as("ps_updated"),
      // O7 TradingView columnar transpose (per-series ordered arrays) —
      // materialized ONCE per series (first row), not repeated on every
      // row: the full-series csv on all n rows is O(n²/groups) bytes
      // (measured 4.7s of the query's 4.7s at sf0.1)
      when(row_number().over(tvRank) === 1,
        array_join(collect_list(col("ts").cast("string")).over(tvW), ","))
        .as("tv_t_csv"),
      when(row_number().over(tvRank) === 1,
        array_join(collect_list(format_string("%.8f", col("open") * 1.25)).over(tvW), ","))
        .as("tv_c_csv"),
      // O11 Excel CSV row
      Sinks.excelCsvLineCol(col("symbol"), col("name"), col("price"),
        col("volume"), col("mcap"), col("txns"), col("makers"),
        col("liquidity"), col("change"), lit(0.95),
        col("website"), col("twitter"), col("ts")).as("excel_line"))
      .orderBy(c)
  }

  /** O1/O2 JSON envelope value math, oracle-gated — the last two
    * string sinks leave golden-only status: the JSONL `to_dict` row
    * (models.py:665-678 via 269-305) and the streaming envelope
    * (scraper.py:1530-1540) with its `to_output_dict` null-coalescing
    * (models.py:307-344), emitted as real JSON text columns —
    * Spark `to_json(struct, ignoreNullFields=false)` vs DuckDB
    * `json_object` — so field ORDER, null rendering, and every
    * coalescing default ("", "solana", "unknown", 0, 0.0,
    * token_name→symbol fallback) are hash-checked, not golden-pinned.
    *
    * Envelope scalars (total_extracted / high_confidence_count) come
    * from a 1-row broadcast aggregate; the top-10-by-(confidence,
    * field_count) selection ranks through the range-partitioned prefix
    * pass (PrefixOps, negated keys for the desc order) — the
    * reference's sort without a single-partition window.
    *
    * Planted doubles are dyadic (x.5 / x.25 / x.0625 steps / integer-
    * valued) and < 1e7, where Java's Double.toString and DuckDB's
    * shortest-repr JSON writer spell the identical text.
    */
  def envelopeValueMath(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = col("c_custkey")
    val base = Tables.customer(spark, dir).select(
      c,
      when(c % 13 =!= 0, concat(lit("TK"), c.cast("string"))).as("symbol"),
      when(c % 5 =!= 0, concat(lit("Tok "), c.cast("string"))).as("token_name"),
      when(c % 3 =!= 0, lit("bsc")).as("chain"),
      when(c % 7 =!= 0, lit("v2")).as("protocol"),
      when(c % 2 =!= 0, concat((c % 48).cast("string"), lit("h"))).as("age"),
      when(c % 4 =!= 0, (c % 10).cast("long")).as("boost"),
      when(c % 6 =!= 0, concat(lit("PAIR"), c.cast("string"))).as("pair_address"),
      when(c % 8 =!= 0, concat(lit("CR"), c.cast("string"))).as("creator_address"),
      when(c % 9 =!= 0, concat(lit("TOK"), c.cast("string"))).as("token_address"),
      when(c % 10 =!= 0, concat(lit("QU"), c.cast("string"))).as("quote_address"),
      when(c % 2 === 0, concat(lit("https://x.test/"), c.cast("string"))).as("website"),
      when(c % 6 === 0, concat(lit("@tk"), c.cast("string"))).as("twitter"),
      when(c % 11 === 0, concat(lit("t.me/tk"), c.cast("string"))).as("telegram"),
      when(c % 4 === 1, (c % 90).cast("double") + 0.5)
        .when(c % 4 === 3, (c % 500 + 1).cast("double"))
        .when(c % 4 === 0, lit(0.0)).as("price"),
      when(c % 9 =!= 0, (c % 1000).cast("double") + 0.5).as("volume_24h"),
      when(c % 6 =!= 0, (c % 1500).cast("long")).as("txns_24h"),
      when(c % 8 =!= 0, (c % 300).cast("long")).as("makers"),
      when(c % 10 =!= 0, (c % 32 + 128).cast("double") * 256.0).as("liquidity"),
      when(c % 12 =!= 0, (c % 700 + 1).cast("double") * 4096.0).as("market_cap"),
      when(c % 5 =!= 2, (c % 20).cast("double") + 0.25).as("change_5m"),
      when(c % 5 =!= 3, -((c % 20).cast("double") + 0.5)).as("change_1h"),
      when(c % 7 =!= 1, (c % 40).cast("double") / 16.0).as("change_6h"),
      when(c % 7 =!= 2, (c % 12).cast("double") - 6.0).as("change_24h"),
      ((c % 16).cast("double") / 16.0).as("confidence_score"),
      (c % 26).cast("long").as("field_count"),
      (lit(1700000000L) + c % 3600).as("timestamp"))

    // models.py:269-305 to_dict key order — raw values, nulls kept
    val dictStruct = struct(
      col("price"), col("volume_24h"), col("txns_24h"), col("makers"),
      col("liquidity"), col("market_cap"), col("symbol"), col("token_name"),
      col("chain"), col("protocol"), col("age"), col("boost"),
      col("pair_address"), col("creator_address"), col("token_address"),
      col("quote_address"), col("website"), col("twitter"), col("telegram"),
      col("change_5m"), col("change_1h"), col("change_6h"), col("change_24h"),
      col("confidence_score"), col("field_count"), col("timestamp"))
    // models.py:307-344 to_output_dict — same order, null-coalesced
    val outStruct = struct(
      coalesce(col("price"), lit(0.0)).as("price"),
      coalesce(col("volume_24h"), lit(0.0)).as("volume_24h"),
      coalesce(col("txns_24h"), lit(0L)).as("txns_24h"),
      coalesce(col("makers"), lit(0L)).as("makers"),
      coalesce(col("liquidity"), lit(0.0)).as("liquidity"),
      coalesce(col("market_cap"), lit(0.0)).as("market_cap"),
      coalesce(col("symbol"), lit("")).as("symbol"),
      coalesce(col("token_name"), col("symbol"), lit("")).as("token_name"),
      coalesce(col("chain"), lit("solana")).as("chain"),
      coalesce(col("protocol"), lit("unknown")).as("protocol"),
      coalesce(col("age"), lit("")).as("age"),
      coalesce(col("boost"), lit(0L)).as("boost"),
      coalesce(col("pair_address"), lit("unknown")).as("pair_address"),
      coalesce(col("creator_address"), lit("unknown")).as("creator_address"),
      coalesce(col("token_address"), lit("unknown")).as("token_address"),
      coalesce(col("quote_address"), lit("unknown")).as("quote_address"),
      coalesce(col("website"), lit("")).as("website"),
      coalesce(col("twitter"), lit("")).as("twitter"),
      coalesce(col("telegram"), lit("")).as("telegram"),
      coalesce(col("change_5m"), lit(0.0)).as("change_5m"),
      coalesce(col("change_1h"), lit(0.0)).as("change_1h"),
      coalesce(col("change_6h"), lit(0.0)).as("change_6h"),
      coalesce(col("change_24h"), lit(0.0)).as("change_24h"),
      col("confidence_score"), col("field_count"), col("timestamp"))

    val stats = base.agg(
      count(lit(1)).as("env_total_extracted"),
      sum(when(col("confidence_score") >= 0.5, 1L).otherwise(0L))
        .as("env_high_confidence_count"))
    // rank by (confidence desc, field_count desc, key asc) via the
    // range-partitioned prefix rank (negated keys give the desc order)
    // instead of a single-partition global window
    val noNulls = Map("ignoreNullFields" -> "false")
    graft.ext.PrefixOps.groupedRunningAgg(
        base.withColumn("_g", lit(0L))
          .withColumn("_nc", -col("confidence_score"))
          .withColumn("_nf", -col("field_count")),
        Seq("_g"), Seq("_nc", "_nf", "c_custkey"), rankName = "rk")
      .drop("_g", "_nc", "_nf")
      .withColumn("rk", col("rk").cast("long"))
      .crossJoin(broadcast(stats))
      .select(
        c,
        to_json(dictStruct, noNulls).as("jsonl_line"),
        lit("enhanced_tokens").as("env_type"),
        col("env_total_extracted"),
        col("env_high_confidence_count"),
        lit(1700003600L).as("env_timestamp"),
        when(col("rk") <= 10, col("rk")).as("env_rank"),
        when(col("rk") <= 10, to_json(outStruct, noNulls)).as("env_token_json"))
      .orderBy(c)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sink_formats" -> sinkFormats _,
    "q46_prometheus_lines" -> prometheusLines _,
    "q49_export_formats" -> exportValueMath _,
    "q71_json_envelope" -> envelopeValueMath _)

  private val ohlcCte =
    s"""bars AS (
       |  SELECT date_trunc('hour', ts) AS bucket, event_type,
       |    arg_min(value, event_id) AS open,
       |    max(value) AS high,
       |    min(value) AS low,
       |    arg_max(value, event_id) AS close,
       |    ${Tables.sqlExactSum("value", 2)} AS volume,
       |    count(*) AS trades
       |  FROM events GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q71_json_envelope" ->
      """WITH t AS (
        |  SELECT c_custkey AS c,
        |    CASE WHEN c_custkey % 13 != 0 THEN 'TK' || c_custkey END AS symbol,
        |    CASE WHEN c_custkey % 5 != 0 THEN 'Tok ' || c_custkey END AS token_name,
        |    CASE WHEN c_custkey % 3 != 0 THEN 'bsc' END AS chain,
        |    CASE WHEN c_custkey % 7 != 0 THEN 'v2' END AS protocol,
        |    CASE WHEN c_custkey % 2 != 0 THEN (c_custkey % 48) || 'h' END AS age,
        |    CASE WHEN c_custkey % 4 != 0 THEN (c_custkey % 10)::bigint END AS boost,
        |    CASE WHEN c_custkey % 6 != 0 THEN 'PAIR' || c_custkey END AS pair_address,
        |    CASE WHEN c_custkey % 8 != 0 THEN 'CR' || c_custkey END AS creator_address,
        |    CASE WHEN c_custkey % 9 != 0 THEN 'TOK' || c_custkey END AS token_address,
        |    CASE WHEN c_custkey % 10 != 0 THEN 'QU' || c_custkey END AS quote_address,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'https://x.test/' || c_custkey END AS website,
        |    CASE WHEN c_custkey % 6 = 0 THEN '@tk' || c_custkey END AS twitter,
        |    CASE WHEN c_custkey % 11 = 0 THEN 't.me/tk' || c_custkey END AS telegram,
        |    CASE WHEN c_custkey % 4 = 1 THEN ((c_custkey % 90) + 0.5)::double
        |         WHEN c_custkey % 4 = 3 THEN (c_custkey % 500 + 1)::double
        |         WHEN c_custkey % 4 = 0 THEN 0.0::double END AS price,
        |    CASE WHEN c_custkey % 9 != 0
        |         THEN ((c_custkey % 1000) + 0.5)::double END AS volume_24h,
        |    CASE WHEN c_custkey % 6 != 0
        |         THEN (c_custkey % 1500)::bigint END AS txns_24h,
        |    CASE WHEN c_custkey % 8 != 0
        |         THEN (c_custkey % 300)::bigint END AS makers,
        |    CASE WHEN c_custkey % 10 != 0
        |         THEN ((c_custkey % 32 + 128) * 256)::double END AS liquidity,
        |    CASE WHEN c_custkey % 12 != 0
        |         THEN ((c_custkey % 700 + 1) * 4096)::double END AS market_cap,
        |    CASE WHEN c_custkey % 5 != 2
        |         THEN ((c_custkey % 20) + 0.25)::double END AS change_5m,
        |    CASE WHEN c_custkey % 5 != 3
        |         THEN (-((c_custkey % 20) + 0.5))::double END AS change_1h,
        |    CASE WHEN c_custkey % 7 != 1
        |         THEN (c_custkey % 40)::double / 16.0 END AS change_6h,
        |    CASE WHEN c_custkey % 7 != 2
        |         THEN (c_custkey % 12)::double - 6.0 END AS change_24h,
        |    (c_custkey % 16)::double / 16.0 AS confidence_score,
        |    (c_custkey % 26)::bigint AS field_count,
        |    (1700000000 + c_custkey % 3600)::bigint AS "timestamp"
        |  FROM customer),
        |s AS (
        |  SELECT count(*)::bigint AS total,
        |    sum(CASE WHEN confidence_score >= 0.5 THEN 1 ELSE 0 END)::bigint AS high
        |  FROM t),
        |r AS (
        |  SELECT t.*, row_number() OVER (ORDER BY confidence_score DESC,
        |    field_count DESC, c ASC)::bigint AS rk FROM t)
        |SELECT c AS c_custkey,
        |  json_object('price', price, 'volume_24h', volume_24h,
        |    'txns_24h', txns_24h, 'makers', makers, 'liquidity', liquidity,
        |    'market_cap', market_cap, 'symbol', symbol,
        |    'token_name', token_name, 'chain', chain, 'protocol', protocol,
        |    'age', age, 'boost', boost, 'pair_address', pair_address,
        |    'creator_address', creator_address, 'token_address', token_address,
        |    'quote_address', quote_address, 'website', website,
        |    'twitter', twitter, 'telegram', telegram, 'change_5m', change_5m,
        |    'change_1h', change_1h, 'change_6h', change_6h,
        |    'change_24h', change_24h, 'confidence_score', confidence_score,
        |    'field_count', field_count, 'timestamp', "timestamp")::varchar
        |    AS jsonl_line,
        |  'enhanced_tokens' AS env_type,
        |  (SELECT total FROM s) AS env_total_extracted,
        |  (SELECT high FROM s) AS env_high_confidence_count,
        |  1700003600::bigint AS env_timestamp,
        |  CASE WHEN rk <= 10 THEN rk END AS env_rank,
        |  CASE WHEN rk <= 10 THEN
        |    json_object('price', coalesce(price, 0.0::double),
        |      'volume_24h', coalesce(volume_24h, 0.0::double),
        |      'txns_24h', coalesce(txns_24h, 0::bigint),
        |      'makers', coalesce(makers, 0::bigint),
        |      'liquidity', coalesce(liquidity, 0.0::double),
        |      'market_cap', coalesce(market_cap, 0.0::double),
        |      'symbol', coalesce(symbol, ''),
        |      'token_name', coalesce(token_name, symbol, ''),
        |      'chain', coalesce(chain, 'solana'),
        |      'protocol', coalesce(protocol, 'unknown'),
        |      'age', coalesce(age, ''),
        |      'boost', coalesce(boost, 0::bigint),
        |      'pair_address', coalesce(pair_address, 'unknown'),
        |      'creator_address', coalesce(creator_address, 'unknown'),
        |      'token_address', coalesce(token_address, 'unknown'),
        |      'quote_address', coalesce(quote_address, 'unknown'),
        |      'website', coalesce(website, ''),
        |      'twitter', coalesce(twitter, ''),
        |      'telegram', coalesce(telegram, ''),
        |      'change_5m', coalesce(change_5m, 0.0::double),
        |      'change_1h', coalesce(change_1h, 0.0::double),
        |      'change_6h', coalesce(change_6h, 0.0::double),
        |      'change_24h', coalesce(change_24h, 0.0::double),
        |      'confidence_score', confidence_score,
        |      'field_count', field_count,
        |      'timestamp', "timestamp")::varchar END AS env_token_json
        |FROM r ORDER BY c""".stripMargin,
    "q49_export_formats" ->
      """WITH t AS (
        |  SELECT c_custkey AS c,
        |    row_number() OVER (ORDER BY c_custkey) - 1 AS i,
        |    'TK' || c_custkey AS symbol,
        |    CASE WHEN c_custkey % 11 = 0 THEN NULL
        |         WHEN c_custkey % 5 = 0 THEN 'Tok, ' || c_custkey
        |         ELSE 'Tok ' || c_custkey END AS name,
        |    CASE WHEN c_custkey % 4 = 1 THEN (c_custkey % 90) + 0.5
        |         WHEN c_custkey % 4 = 3 THEN (c_custkey % 500 + 1)::double
        |         WHEN c_custkey % 4 = 0 THEN 0.0
        |         ELSE NULL END AS price,
        |    (c_custkey % 1000 + 1) * 1024.0 AS volume,
        |    (c_custkey % 1500 + 1)::int AS txns,
        |    (c_custkey % 300)::int AS makers,
        |    CASE WHEN c_custkey % 3 = 0 THEN ''
        |         ELSE 'ADDR' || c_custkey END AS address,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'https://x.test/' || c_custkey
        |         ELSE '' END AS website,
        |    CASE WHEN c_custkey % 6 = 0 THEN '@tk' || c_custkey
        |         ELSE '' END AS twitter,
        |    1700000000 + c_custkey % 3600 AS ts,
        |    ((c_custkey % 32) * 2 + 129) / 2048.0 AS open
        |  FROM customer)
        |SELECT c AS c_custkey,
        |  ts * 1000 AS k_open_ms,
        |  ts * 1000 + 60000 AS k_close_ms,
        |  printf('%.8f', open) AS k_open,
        |  printf('%.8f', open * 1.5) AS k_high,
        |  printf('%.8f', open * 0.5) AS k_low,
        |  printf('%.8f', open * 1.25) AS k_close,
        |  printf('%.8f', volume) AS k_vol,
        |  printf('%.8f', volume * 0.6) AS k_taker,
        |  CASE WHEN c % 2 = 0 THEN txns ELSE 1 END AS k_trades,
        |  CASE WHEN price IS NOT NULL AND price <> 0.0
        |       THEN 'token-' || i END AS cg_id,
        |  CASE WHEN price IS NOT NULL AND price <> 0.0
        |       THEN coalesce(name, symbol) END AS cg_name,
        |  CASE WHEN price IS NOT NULL AND price <> 0.0
        |       THEN i + 1 END AS cg_rank,
        |  CASE WHEN price IS NOT NULL AND price <> 0.0
        |       THEN price * 1.2 END AS cg_ath,
        |  CASE WHEN price IS NOT NULL AND price <> 0.0
        |       THEN strftime(make_timestamp(ts * 1000000),
        |                     '%Y-%m-%dT%H:%M:%S') END AS cg_last_updated,
        |  CASE WHEN address <> '' AND price IS NOT NULL AND price <> 0.0
        |       THEN address END AS ps_key,
        |  CASE WHEN address <> '' AND price IS NOT NULL AND price <> 0.0
        |       THEN price * 0.002 END AS ps_price_bnb,
        |  CASE WHEN address <> '' AND price IS NOT NULL AND price <> 0.0
        |       THEN ts END AS ps_updated,
        |  CASE WHEN row_number() OVER (PARTITION BY c % 10 ORDER BY c) = 1
        |    THEN string_agg(ts::varchar, ',')
        |      OVER (PARTITION BY c % 10 ORDER BY c
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    END AS tv_t_csv,
        |  CASE WHEN row_number() OVER (PARTITION BY c % 10 ORDER BY c) = 1
        |    THEN string_agg(printf('%.8f', open * 1.25), ',')
        |      OVER (PARTITION BY c % 10 ORDER BY c
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    END AS tv_c_csv,
        |  symbol || ',' ||
        |    CASE WHEN name IS NULL THEN ''
        |         WHEN name LIKE '%,%' THEN '"' || name || '"'
        |         ELSE name END || ',' ||
        |    CASE WHEN c % 4 = 1 THEN (c % 90) || '.5'
        |         WHEN c % 4 = 3 THEN (c % 500 + 1) || '.0'
        |         ELSE '' END || ',' ||
        |    (c % 1000 + 1) * 1024 || '.0,' ||
        |    (c % 700 + 1) * 4096 || '.0,' ||
        |    txns || ',' ||
        |    CASE WHEN makers = 0 THEN '' ELSE makers::varchar END || ',' ||
        |    (c % 32 + 128) * 256 || '.0,' ||
        |    CASE WHEN c % 7 = 0 THEN '-' ELSE '' END || (c % 20) || '.5,' ||
        |    '0.95,' ||
        |    website || ',' || twitter || ',' ||
        |    strftime(make_timestamp(ts * 1000000), '%Y-%m-%d %H:%M:%S')
        |    AS excel_line
        |FROM t ORDER BY c_custkey""".stripMargin,
    "q46_prometheus_lines" ->
      """SELECT c_custkey,
        |  CASE
        |    WHEN c_custkey % 4 = 1 THEN
        |      'dex_token_price{symbol="TK' || c_custkey || '"} '
        |        || (c_custkey % 90) || '.5 1700000000000'
        |    WHEN c_custkey % 4 = 3 THEN
        |      'dex_token_price{symbol="TK' || c_custkey || '"} '
        |        || (c_custkey % 500 + 1) || '.0 1700000000000'
        |    END AS price_line,
        |  CASE WHEN c_custkey % 3 <> 0 THEN
        |      'dex_token_volume_24h{symbol="TK' || c_custkey || '"} '
        |        || ((c_custkey % 1000 + 1) * 1024) || '.0 1700000000000'
        |    END AS volume_line
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q35_sink_formats" ->
      s"""WITH $ohlcCte
         |SELECT epoch(bucket)::bigint AS bar_unix, event_type,
         |  strftime(bucket, '%Y.%m.%d %H:%M:%S') ||
         |    printf(',%.8f,%.8f,%.8f,%.8f,%d', open, high, low, close,
         |      trunc(volume)::bigint) AS mt5_line,
         |  strftime(bucket, '%Y-%m-%d %H:%M:%S') ||
         |    printf(',%.8f,%.8f,%.8f,%.8f,%.2f', open, high, low, close,
         |      volume) AS csv_line,
         |  strftime(bucket, '%Y-%m-%d %H:%M:%S') ||
         |    printf(',%.8f,%.8f,%.8f,%.8f,%.2f,%d', open, high, low, close,
         |      volume,
         |      coalesce(CASE WHEN trades % 2 = 0 THEN trades END,
         |               trunc(volume / 1000.0)::int)) AS ohlcvt_line,
         |  CASE
         |    WHEN volume >= 1000000000.0
         |      THEN '$$' || printf('%.1f', volume / 1000000000.0) || 'B'
         |    WHEN volume >= 1000000.0
         |      THEN '$$' || printf('%.1f', volume / 1000000.0) || 'M'
         |    WHEN volume >= 1000.0
         |      THEN '$$' || printf('%.0f', volume / 1000.0) || 'K'
         |    ELSE '$$' || printf('%.0f', volume) END AS volume_human,
         |  strftime(bucket, '%Y-%m-%dT%H:%M:%S') AS iso_ts
         |FROM bars ORDER BY bar_unix, event_type""".stripMargin)
}
