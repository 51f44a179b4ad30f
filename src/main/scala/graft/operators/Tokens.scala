package graft.operators

import graft.functions.{Functions => F}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-level operators over TokenProfile-shaped DataFrames (SURVEY
  * §2.6 A1/A2, §2.7 T1, §2.4 F4): the reference's
  * `ExtractedTokenBatch` semantics as declarative aggregates.
  */
object Tokens {

  /** T1 top-K (models.py:377-381): confidence desc, field_count desc.
    * Planned as TakeOrderedAndProject — no global sort at scale. A
    * deterministic final tie-break on symbol keeps results stable under
    * parallel execution (the reference inherits Python sort stability;
    * SURVEY §7.4.4).
    */
  def topTokens(tokens: DataFrame, count: Int = 10): DataFrame =
    tokens.orderBy(col("confidence_score").desc, col("field_count").desc,
      col("symbol").asc_nulls_last).limit(count)

  /** F4 completeness predicate (models.py:346-348). */
  def isComplete(minFields: Int = 5): Column =
    col("field_count") >= minFields && col("confidence_score") >= 0.3

  /** A1 batch statistics (models.py:369-375) as a 1-row aggregate; at
    * scale this is a map-side-combined global agg, not a collect.
    */
  def batchStats(tokens: DataFrame): DataFrame =
    tokens.agg(
      count(lit(1)).as("total_extracted"),
      count_if(col("confidence_score") >= 0.7).as("high_confidence_count"),
      count_if(isComplete()).as("complete_profiles_count"))

  /** A2 market stats panel (cli.py:458-471). */
  def marketStats(tokens: DataFrame): DataFrame =
    tokens.agg(
      coalesce(sum(col("volume_24h")), lit(0.0)).as("total_volume"),
      coalesce(avg(col("confidence_score")), lit(0.0)).as("avg_confidence"),
      count(lit(1)).as("n_tokens"))

  /** P7 null-coalescing output projection (models.py:307-344) — applied
    * only at sinks; storage keeps honest nulls.
    */
  def outputProjection(tokens: DataFrame): DataFrame = {
    val symbolFirst = tokens
      .withColumn("token_name", coalesce(col("token_name"), col("symbol"), lit("")))
    val withStrings = F.stringDefaults.foldLeft(symbolFirst) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), lit(d)))
    }
    val withNums = F.numericDefaults.foldLeft(withStrings) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0.0)))
    }
    F.intDefaults.foldLeft(withNums) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0)))
    }
  }
}
