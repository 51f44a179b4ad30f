package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessors for the driver-generated parquet fixtures (TESTDATA.md) plus
  * shared deterministic-aggregation helpers.
  *
  * Determinism note: the driver's correctness gate hash-compares our
  * parquet output against DuckDB running the oracle SQL. Floating-point
  * SUMs are order-dependent in the last ulps, and Spark's and DuckDB's
  * accumulation orders differ — so every money-style aggregate here is
  * computed over per-row integer-scaled values (exact int64 arithmetic,
  * order-independent), then converted back with a single deterministic
  * IEEE division. Both engines then produce bit-identical doubles.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.parquet`'s `ts` physical type has drifted across fixture
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader only
    * surfaces as a nanos long under `legacy.parquet.nanosAsLong`), and
    * later TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ). Dispatch on the
    * resolved schema instead of assuming either: a long is nanos (µs
    * payload, so `div 1000` is lossless), a timestamp is used directly,
    * cast to session-tz TimestampType (session tz is UTC, so the instant
    * matches DuckDB's µs-precision oracle timestamps bit-for-bit).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // surface TIMESTAMP(MICROS, isAdjustedToUTC=false) directly as the
    // session-tz TimestampType (session is UTC, so the instant is the
    // same) instead of TIMESTAMP_NTZ: a cast on top of an NTZ column
    // would sit between every ts predicate and the parquet scan and
    // block filter pushdown
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Exact decimal sum: per-row scale by 10^dp, round to exact int64,
    * sum exactly, divide back once. Deterministic across engines.
    * DuckDB equivalent: `cast(sum(cast(round(x * 1eN) as bigint)) as double) / 1eN`.
    */
  def exactSum(c: Column, dp: Int): Column = {
    val scale = math.pow(10, dp)
    (sum(round(c * lit(scale)).cast("long")).cast("double") / lit(scale))
  }

  /** Exact mean built from an exact integer sum and a count: one IEEE
    * division, deterministic across engines.
    * DuckDB: `cast(sum(cast(round(x*1eN) as bigint)) as double) / 1eN / count(*)`.
    */
  def exactAvg(c: Column, dp: Int): Column = {
    val scale = math.pow(10, dp)
    sum(round(c * lit(scale)).cast("long")).cast("double") / lit(scale) / count(lit(1))
  }

  /** SQL fragment builders mirroring exactSum/exactAvg for the DuckDB oracle. */
  def sqlExactSum(expr: String, dp: Int): String = {
    val scale = "1" + ("0" * dp)
    s"cast(sum(cast(round(($expr) * $scale.0) as bigint)) as double) / $scale.0"
  }
  def sqlExactAvg(expr: String, dp: Int): String =
    s"${sqlExactSum(expr, dp)} / count(*)"
}
