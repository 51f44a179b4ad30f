package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics. Spark's own `percentile_approx`
  * trades accuracy for one pass; a training-data pipeline's gates
  * (token-count caps, quality-score cutoffs) want the exact quantile,
  * and the naive exact formulation — global sort, or a global
  * cumulative window — serializes onto one partition at scale. This is
  * the two-pass shape instead (same machinery as
  * [[TextOps.packOffsets]], generalized to keys of any orderable type
  * — the value column's type is preserved end to end, so int64 metrics
  * never round-trip through a double):
  *
  *   1. collapse to distinct values: groupBy(value) → (v, count) —
  *      the only full-data shuffle, combiner-friendly;
  *   2. range-partition the distinct values, per-partition subtotal to
  *      the driver (numParts longs, bounded), broadcast the prefix
  *      bases back, and emit each value's cumulative END count with a
  *      per-partition running sum — no global window, no single-
  *      partition sort;
  *   3. each requested percentile's target rank (1-based,
  *      `(n−1)·p/100 + 1` truncating — the "lower" interpolation, what
  *      DuckDB calls quantile_disc) selects the unique distinct value
  *      whose cumulative band contains it, via a broadcast join of the
  *      tiny (p, rank) relation against the banded counts.
  *
  * Everything is exact int64 counting plus values passed through
  * untouched, so any engine reproduces the output bit-for-bit.
  */
object StatOps {

  /** @return (p, target_rank, value) per requested percentile; `value`
    * keeps the INPUT column's type (an int64 column never routes
    * through a double, so quantiles of exact integer metrics stay
    * exact past 2⁵³ — q76's norm-fence contract).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Int],
      numParts: Int = 8): DataFrame =
    // nulls carry no rank — drop them up front (SQL quantile semantics);
    // without this the null group NPEs inside the prefix-sum pass
    exactQuantilesFromCounts(
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("v"))
        .agg(count(lit(1)).as("c")),
      ps, numParts)

  /** Finalize from a pre-built distinct-value count table `(v, c)` —
    * the MERGE seam: the count table is the quantile's additive
    * sufficient statistic (per-batch tables union + groupBy-sum into
    * the corpus table, exactly), so an incremental/streaming exact
    * quantile keeps per-batch counts and finalizes here on demand.
    */
  def exactQuantilesFromCounts(counts: DataFrame, ps: Seq[Int],
      numParts: Int = 8): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100), s"bad percentiles $ps")
    val spark = counts.sparkSession
    val vType = counts.schema("v").dataType
    val sorted = graft.Caches.persisted(
      counts.repartitionByRange(numParts, col("v"))
        .sortWithinPartitions("v"))
    val perPart = sorted.rdd
      .mapPartitionsWithIndex((pid, it) =>
        Iterator((pid, it.foldLeft(0L)(_ + _.getLong(1)))))
      .collect()
      .sortBy(_._1)
    val bases = perPart.map(_._2).scanLeft(0L)(_ + _)
    val n = bases.last
    require(n > 0, "exactQuantiles on an empty relation")
    val bBases = spark.sparkContext.broadcast(bases)
    val cums = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var running = bBases.value(pid)
        it.map { r =>
          running += r.getLong(1)
          Row(r.get(0), r.getLong(1), running)
        }
      },
      StructType(Seq(StructField("v", vType, nullable = false),
        StructField("c", LongType, nullable = false),
        StructField("cum_end", LongType, nullable = false))))
    // Long division truncates = floor for the non-negative operands here.
    val targets = ps.map(p => (p.toLong, (n - 1) * p / 100 + 1))
    import spark.implicits._
    broadcast(targets.toDF("p", "target_rank"))
      .join(cums, col("cum_end") >= col("target_rank") &&
        col("cum_end") - col("c") < col("target_rank"))
      .select(col("p"), col("target_rank"), col("v").as("value"))
  }
}
