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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sink_formats" -> sinkFormats _,
    "q46_prometheus_lines" -> prometheusLines _)

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
