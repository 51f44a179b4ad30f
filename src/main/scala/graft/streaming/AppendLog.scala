package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Append-only keyed state with one-batch rollback — the shared log
  * lifecycle for every incremental operator in this package
  * ([[CurationStream]]'s fingerprint/pair/doc logs, [[AnnStream]]'s
  * postings, [[NearDupStream]]'s band log, [[SpanDedupStream]]'s
  * occurrence log).
  *
  * The log is a LIST OF SEGMENTS — one localCheckpoint'ed frame per
  * committed append — and `cur` is their union. Appending therefore
  * materializes ONLY the new batch's rows: the earlier form re-
  * checkpointed `cur.union(rows)` wholesale, which copies the entire
  * accumulated log every batch — O(corpus) work per micro-batch and
  * O(n²) total, a cost that grows without bound as the stream runs.
  * Per-batch ingest work must be a function of the BATCH, not of
  * everything ingested before it; this is exactly the append-only-
  * table-plus-compaction posture the production notes describe, held
  * locally too.
  *
  * Segments are compacted (union → one checkpoint) when their count
  * exceeds `maxSegments`, so `cur`'s plan width is bounded no matter
  * how many batches commit. Compaction runs at the START of the next
  * append — never on the segment the last append created — because
  * only the CURRENT batch can replay inside a running foreachBatch
  * query: a retry of batchId N rolls back exactly the segments N
  * appended ([[rollback]]), so those must stay distinct until batch
  * N+1 proves N committed.
  */
private[streaming] final class AppendLog(spark: SparkSession, schema: StructType) {
  private val empty: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  /** Checkpointed segments in append order; `cur` = union of all. */
  private var segments: Vector[DataFrame] = Vector.empty
  /** Segment count before the last append — rollback truncates to it. */
  private var committedCount: Int = 0
  private val maxSegments = 32

  def cur: DataFrame =
    if (segments.isEmpty) empty else segments.reduce(_ union _)

  def append(rows: DataFrame): Unit = {
    compactIfWide()
    val seg = rows.select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(eager = true)
    committedCount = segments.length
    segments :+= seg
  }

  /** Append a frame the CALLER already localCheckpoint'ed, taking
    * ownership of it (the log unpersists it on rollback/compaction).
    * Skips [[append]]'s re-checkpoint — one fewer copy job per batch on
    * the ingest hot path. Requires an exact column-name match so `cur`'s
    * union stays positionally sound; falls back to [[append]] otherwise.
    */
  def appendOwned(seg: DataFrame): Unit =
    if (seg.schema.fieldNames.sameElements(schema.fieldNames)) {
      compactIfWide()
      committedCount = segments.length
      segments :+= seg
    } else append(seg)

  def rollback(): Unit = {
    segments.drop(committedCount)
      .foreach(graft.ext.GraphOps.unpersistCheckpoint)
    segments = segments.take(committedCount)
  }

  def restore(rows: DataFrame): Unit = {
    segments = Vector(rows.select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(eager = true))
    committedCount = segments.length // nothing to roll back after a restore
  }

  /** Fold all COMMITTED segments into one checkpoint once the union
    * grows past `maxSegments` children (bounded plan width ↔ bounded
    * per-append work: each row is re-copied only every ~maxSegments
    * batches, amortized O(1) per batch). The last append's segments are
    * excluded so an in-flight retry can still roll them back.
    */
  private def compactIfWide(): Unit =
    if (committedCount > maxSegments) {
      val (done, pending) = segments.splitAt(committedCount)
      val folded = done.reduce(_ union _).localCheckpoint(eager = true)
      done.foreach(graft.ext.GraphOps.unpersistCheckpoint)
      segments = folded +: pending
      committedCount = 1
    }
}
