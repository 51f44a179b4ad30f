package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location for repeated large-large joins.
  *
  * At 100 TB, a fact-fact join (e.g. decoded token records × metadata
  * hits keyed by frame, or documents × per-doc signatures) re-shuffles
  * both sides on every query. Writing both sides bucketed by the join
  * key into the SAME bucket count makes the join's partitioning a
  * storage property: Spark plans a SortMergeJoin with ZERO shuffle
  * exchanges (proved by BucketingSpec against the physical plan), so the
  * shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation on that key.
  *
  * Guidance: bucket counts should be a multiple of the executor-core
  * count and sized so one bucket's data fits an executor's memory at the
  * target scale; both join sides MUST use identical counts (mismatched
  * counts fall back to shuffling the smaller side).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table at
    * `path`. `sortBy` the join key so merge-join sides stream pre-sorted
    * runs (Spark elides the Sort when each bucket has one file).
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket keys. The caller is
    * responsible for having written them with the same bucket count.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    // name-based condition: catalog relations resolve lazily, so
    // instance-bound column refs would re-resolve to fresh attribute ids
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.expr(s"$leftKey = $rightKey"))
}
