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
  *
  * READER CONTRACT: a frame captured from [[cur]] stays readable until
  * the capturing batch's NEXT append — even if that very append's
  * compaction displaces the captured segments. Compaction materializes
  * the fold eagerly but DEFERS unpersisting the displaced segments to
  * the following append ([[reap]]): within a batch the idiom is
  * "capture `cur` lazily → append → materialize the derived frame"
  * (NearDupStream.ingestLazy under CurationStream's fused checkpoint),
  * and an immediate unpersist would yank the captured blocks out from
  * under that still-lazy read (the r14 'Checkpoint block not found'
  * race from ~batch maxSegments+2, pinned by SoakSpec). Frames held
  * ACROSS a later batch boundary (e.g. a lazy `reconcile()` result)
  * must be materialized before that batch ingests.
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
  /** Owned segments a compaction displaced, NOT yet unpersisted: the
    * reader contract lets the current batch's lazy captures of [[cur]]
    * materialize first, so their storage is reclaimed one append later.
    */
  private var displaced: Vector[DataFrame] = Vector.empty

  def cur: DataFrame =
    if (segments.isEmpty) empty else segments.map(_._1).reduce(_ union _)

  /** Unpersist the segments the PREVIOUS append's compaction displaced —
    * runs at the start of the next append, by which point the contract
    * says every frame captured before that compaction has materialized.
    */
  private def reap(): Unit = {
    displaced.foreach(graft.ext.GraphOps.unpersistCheckpoint)
    displaced = Vector.empty
  }

  def append(rows: DataFrame): Unit = {
    reap(); compactIfWide()
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
    reap(); compactIfWide()
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
      reap(); compactIfWide()
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
    // the replaced segments' storage goes through the deferred path too
    // (a restore abandons any in-flight readers, but reclamation need
    // not be synchronous)
    displaced ++= segments.collect { case (seg, true) => seg }
    segments = Vector((rows.select(schema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(eager = true), true))
    committedCount = segments.length // nothing to roll back after a restore
  }

  /** Fold all COMMITTED segments into one checkpoint once the union
    * grows past `maxSegments` children (bounded plan width ↔ bounded
    * per-append work: each row is re-copied only every ~maxSegments
    * batches, amortized O(1) per batch). The last append's segments are
    * excluded so an in-flight retry can still roll them back. Displaced
    * owned segments are NOT unpersisted here — the current batch may
    * hold lazy captures of `cur` over them (reader contract above);
    * they are reaped at the next append.
    */
  private def compactIfWide(): Unit =
    if (committedCount > maxSegments) {
      val (done, pending) = segments.splitAt(committedCount)
      val folded = done.map(_._1).reduce(_ union _).localCheckpoint(eager = true)
      displaced ++= done.collect { case (seg, true) => seg }
      segments = (folded, true) +: pending
      committedCount = 1
    }
}
