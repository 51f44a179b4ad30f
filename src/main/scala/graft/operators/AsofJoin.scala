package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, the single right row with
  * the greatest `rightTs <= leftTs` for the same key (LEFT semantics —
  * unmatched left rows keep null payloads).
  *
  * Scale shape: the naive formulations are a range theta-join (Catalyst
  * falls back to BroadcastNestedLoop / cartesian — quadratic) or a
  * per-left correlated max (a join PLUS a re-join). This operator is the
  * canonical distributed as-of instead: tag both sides, UNION them, and
  * run ONE window pass partitioned by key ordered by (ts, side) carrying
  * the right payload forward with `last(_, ignoreNulls)`. Both inputs
  * shuffle exactly once (hash on key), the window sort is per-key, and
  * nothing is quadratic. Right rows order BEFORE left rows at equal
  * timestamps, which yields inclusive (`<=`) semantics.
  *
  * Ties inside the right side (same key, same ts) are resolved before the
  * union: highest `tiebreak` wins — without this, `last()` could mix
  * payload columns from different rows of the tie group.
  *
  * Skew note: a hot key serializes into one window task. For a known-hot
  * keyspace, pre-split the left by time range and union — the operator
  * keeps the simple contract; q50 shows the salting machinery.
  */
object AsofJoin {

  /** @param payload right-side columns to carry onto each left row
    *                (must not collide with left column names)
    * @param tiebreak right-side column deciding equal-timestamp ties
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.mkString(",")} collides with left columns")

    val byTs = Window.partitionBy(col(rightKey), col(rightTs))
      .orderBy(col(tiebreak).desc)
    val dedupedRight = right
      .withColumn("_rn", row_number().over(byTs))
      .filter(col("_rn") === 1)

    // common shape: key, ts, side, payload..., left columns...
    val rSide = dedupedRight.select(
      Seq(col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side")) ++
        payload.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.select(
      Seq(col(leftKey).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side")) ++
        payload.map(c => lit(null).cast(dedupedRight.schema(c).dataType).as(c)) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(rSide.unionByName(lSide)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
