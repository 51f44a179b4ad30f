package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OHLC bar operators (SURVEY §2.9 W1-W5).
  *
  * W1/W2/W3 are the reference's degenerate single-tick projections;
  * W4 is the real time-bucketed aggregate the export formats imply —
  * one shuffle on (window, symbol), open/close via min_by/max_by over a
  * total order (no `first()` nondeterminism under parallel aggregation).
  */
object OhlcOps {

  /** W1 (models.py:145-165): pair tick → degenerate bar with placeholder
    * price=1.0 / volume=1000.0 when data is missing. `nowTs` is injected
    * rather than read from the clock (SURVEY §7.4.5).
    */
  def pairToOhlc(pairs: DataFrame, nowTs: Long, idCols: Seq[String] = Nil): DataFrame = {
    val hasData = col("price").isNotNull && col("volume_h24").isNotNull &&
      col("created_at").isNotNull
    val price = when(hasData, col("price")).otherwise(lit(1.0))
    val volume = when(hasData, col("volume_h24")).otherwise(lit(1000.0))
    val ts = when(hasData, col("created_at")).otherwise(lit(nowTs))
    pairs.select(idCols.map(col) ++ Seq(
      ts.as("timestamp"),
      price.as("open"), price.as("high"), price.as("low"), price.as("close"),
      volume.as("volume"), lit(null).cast("int").as("trades")): _*)
  }

  /** W2/W3 (models.py:253-264, :387-394): token tick → synthetic-range
    * bar (±2%); rows missing price or volume yield no bar.
    */
  def tokenToOhlc(tokens: DataFrame, idCols: Seq[String] = Nil): DataFrame =
    tokens.filter(col("price").isNotNull && col("volume_24h").isNotNull)
      .select(idCols.map(col) ++ Seq(
        col("timestamp"),
        col("price").as("open"),
        (col("price") * 1.02).as("high"),
        (col("price") * 0.98).as("low"),
        col("price").as("close"),
        col("volume_24h").as("volume"),
        lit(null).cast("int").as("trades")): _*)

  /** W5 trades estimate (models.py:74-76). */
  def tradesOrEstimate: Column =
    coalesce(col("trades"), (col("volume") / 1000.0).cast("int"))

  /** W4: true time-bucketed OHLC over a tick stream. `duration` is a
    * Spark interval string ("5 minutes", "1 hour", ...). Open/close are
    * selected by (ts, seq) — pass a unique tie-break column for full
    * determinism. Works identically on batch and streaming inputs (add
    * a watermark upstream for streaming).
    */
  def timeBucketed(ticks: DataFrame, duration: String,
      tsCol: String = "ts", priceCol: String = "price", volumeCol: String = "volume",
      keyCols: Seq[String] = Seq("symbol"), seqCol: String = null): DataFrame = {
    val ord = if (seqCol == null) struct(col(tsCol)) else struct(col(tsCol), col(seqCol))
    val groups = window(col(tsCol), duration) +: keyCols.map(col)
    ticks.groupBy(groups: _*)
      .agg(
        min_by(col(priceCol), ord).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), ord).as("close"),
        sum(col(volumeCol)).as("volume"),
        count(lit(1)).as("trades"))
      .select((Seq(col("window.start").as("bar_start"), col("window.end").as("bar_end")) ++
        keyCols.map(col) ++
        Seq(col("open"), col("high"), col("low"), col("close"), col("volume"), col("trades"))): _*)
  }
}
