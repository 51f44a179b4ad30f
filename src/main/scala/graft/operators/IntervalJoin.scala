package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join at scale. The direct formulation —
  * `points JOIN intervals ON key AND t BETWEEN start AND end` — is an
  * equi-join on key followed by a range THETA condition, which Spark
  * executes as a sort-merge on key with every (point, interval) pair of
  * that key streamed through the range filter: O(P_k · I_k) per key,
  * quadratic on hot keys. The bucketized form restores a pure equi-join:
  * intervals replicate to every fixed-width time bucket they cover,
  * points hash to their single bucket, the join keys on (key, bucket),
  * and the exact BETWEEN runs only on same-bucket candidates. Cost
  * shifts from per-key quadratic to interval replication
  * (len/bucketWidth rows per interval) — pick `bucketWidth` near the
  * typical interval length so replication stays O(1) per interval.
  * Same trick family as the banded LSH joins (J1's ±1000 B proximity
  * band join — `TokenExtractor.scala` — is the byte-offset instance of
  * this pattern; reference analog `scraper.py:369-394` does it
  * per-frame in a loop).
  *
  * Intervals of one key are assumed disjoint (session windows are);
  * overlapping intervals simply emit one row per containing interval.
  */
object IntervalJoin {

  /** @param points    (keyCols, ptCol) — integral time/position
    * @param intervals (keyCols, startCol, endCol) — inclusive bounds
    * @return points joined with the columns of their containing
    *         interval; points in no interval drop (inner join)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val pt = points.withColumn("_bucket",
      floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(iv, keyCols :+ "_bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bucket")
  }
}
