package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Append-only keyed state with one-batch rollback — the shared log
  * lifecycle for every incremental operator in this package
  * ([[CurationStream]]'s fingerprint/pair/doc logs, [[AnnStream]]'s
  * postings, [[NearDupStream]]'s band log, [[SpanDedupStream]]'s
  * occurrence log). `beforeLast` snapshots the log before the last
  * append so a foreachBatch RETRY of that batch can roll back instead
  * of double-appending; the pre-previous snapshot is freed once the
  * next batch commits (only the current batch can replay inside a
  * running query). At scale the log is an append-only bucketed table
  * on storage; locally each state is one localCheckpoint'ed plan so
  * lineage never nests across batches.
  */
private[streaming] final class AppendLog(spark: SparkSession, schema: StructType) {
  var cur: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  private var beforeLast: DataFrame = cur

  def append(rows: DataFrame): Unit = {
    val next = cur.union(rows.select(schema.fieldNames.map(col).toSeq: _*))
      .localCheckpoint(eager = true)
    if (beforeLast ne cur) graft.ext.GraphOps.unpersistCheckpoint(beforeLast)
    beforeLast = cur
    cur = next
  }

  def rollback(): Unit = if (cur ne beforeLast) {
    graft.ext.GraphOps.unpersistCheckpoint(cur)
    cur = beforeLast
  }

  def restore(rows: DataFrame): Unit = {
    cur = rows.select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(eager = true)
    beforeLast = cur
  }
}
