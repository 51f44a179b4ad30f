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
  /** Segments in append order (`cur` = union of all) with an OWNED bit:
    * owned segments hold their own localCheckpoint storage and the log
    * unpersists them on rollback/compaction; view segments (see
    * [[appendView]]) borrow a caller-materialized parent, so the log
    * only drops the reference and the ContextCleaner reclaims the
    * parent's blocks once nothing references it.
    */
  private var segments: Vector[(DataFrame, Boolean)] = Vector.empty
  /** Segment count before the last append — rollback truncates to it. */
  private var committedCount: Int = 0
  private val maxSegments = 32

  def cur: DataFrame =
    if (segments.isEmpty) empty else segments.map(_._1).reduce(_ union _)

  def append(rows: DataFrame): Unit = {
    compactIfWide()
    val seg = rows.select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(eager = true)
    committedCount = segments.length
    segments :+= ((seg, true))
  }

  /** Append a NARROW PROJECTION of a frame the caller already
    * localCheckpoint'ed, without re-checkpointing it — the plan is a
    * column select over a lineage-truncated LogicalRDD, so the union's
    * width stays bounded and the copy job [[append]] would run is
    * skipped entirely (two such jobs per CurationStream batch). The
    * log does NOT own the parent's storage: a rollback just drops the
    * segment reference (the parent may back several logs' views at
    * once, and unpersisting a local checkpoint is unrecoverable — its
    * lineage is gone), leaving reclamation to the ContextCleaner.
    */
  def appendView(rows: DataFrame): Unit = {
    compactIfWide()
    committedCount = segments.length
    segments :+= ((rows.select(schema.fieldNames.map(col).toSeq: _*), false))
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
      segments :+= ((seg, true))
    } else append(seg)

  def rollback(): Unit = {
    segments.drop(committedCount)
      .foreach { case (seg, owned) =>
        if (owned) graft.ext.GraphOps.unpersistCheckpoint(seg) }
    segments = segments.take(committedCount)
  }

  def restore(rows: DataFrame): Unit = {
    segments = Vector((rows.select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(eager = true), true))
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
      val folded = done.map(_._1).reduce(_ union _).localCheckpoint(eager = true)
      done.foreach { case (seg, owned) =>
        if (owned) graft.ext.GraphOps.unpersistCheckpoint(seg) }
      segments = (folded, true) +: pending
      committedCount = 1
    }
}
