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
  * The log is a LIST OF SEGMENTS — one lineage-truncated frame per
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
  * TWO SEGMENT BACKENDS behind one API:
  *
  *   - DEFAULT (in-memory): each segment is a `localCheckpoint` —
  *     executor memory/disk, gone on driver restart. Fast (no
  *     serialization to storage), right for tests and for state a
  *     restarted query re-derives from its upstream.
  *   - DURABLE (`durableDir = Some(dir)`): each segment is a parquet
  *     directory under `dir`, and a MANIFEST file names the committed
  *     segments — append = write-then-register (the segment's parquet
  *     write completes BEFORE the manifest rename publishes it),
  *     compaction = rewrite + manifest swap, rollback = manifest
  *     truncate + file delete. The manifest rename is atomic
  *     (`ATOMIC_MOVE`), so a crash at any point leaves the PREVIOUS
  *     manifest: a half-written segment directory is simply
  *     unreferenced garbage, never half-visible state. A restarted
  *     process re-opens the log by constructing an [[AppendLog]] on
  *     the same dir: segments reload as parquet scans and
  *     [[restoredBatch]] reports the last appended batch id so the
  *     stream's replay-detection (`batchId == lastBatchId → rollback`)
  *     works ACROSS the restart, not just within a session. This is
  *     the local form of the "append-only bucketed table + manifest"
  *     posture at 100 TB (object storage + a transactional commit
  *     log); the I/O layer here is the local filesystem, the
  *     lifecycle — publish-after-write, atomic manifest swap,
  *     truncate-to-rollback — is the same.
  *
  * Segments are compacted (union → one segment) when their count
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
  * the fold eagerly but DEFERS reclaiming the displaced segments
  * (unpersist for checkpoints, file delete for durable segments) to
  * the following append ([[reap]]): within a batch the idiom is
  * "capture `cur` lazily → append → materialize the derived frame"
  * (NearDupStream.ingestLazy under CurationStream's fused checkpoint),
  * and an immediate unpersist would yank the captured blocks out from
  * under that still-lazy read (the r14 'Checkpoint block not found'
  * race from ~batch maxSegments+2, pinned by SoakSpec). The same
  * deferral applies to [[restore]]: a capture taken before the restore
  * materializes fine afterwards (AppendLogSpec pins this), though
  * frames held ACROSS a later batch boundary (e.g. a lazy
  * `reconcile()` result) must be materialized before that batch
  * ingests. A stream that is DONE with the log calls [[close]] —
  * without it, segments displaced by the last compaction/restore stay
  * stored until the next append that never comes.
  */
private[streaming] final class AppendLog(
    spark: SparkSession, schema: StructType,
    durableDir: Option[String] = None,
    maxSegments: Int = 32) {
  require(maxSegments >= 1, "maxSegments must be >= 1")

  private val empty: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** One committed-or-pending segment. `owned` = the log holds a
    * localCheckpoint it must unpersist on rollback/compaction/close;
    * view segments (see [[appendView]]) borrow a caller-materialized
    * parent, so the log only drops the reference and the
    * ContextCleaner reclaims the parent's blocks once nothing
    * references it. `path` = the parquet directory name (durable mode
    * only) so rollback/compaction can delete the files.
    */
  private final case class Seg(df: DataFrame, owned: Boolean, path: Option[String])

  /** Segments in append order (`cur` = union of all). */
  private var segments: Vector[Seg] = Vector.empty
  /** Segment count before the last append — rollback truncates to it. */
  private var committedCount: Int = 0
  /** Last batch id an append recorded (durable mode persists it in the
    * manifest so replay-detection survives a restart).
    */
  private var lastBatch: Long = Long.MinValue
  /** Segments a compaction/restore displaced, NOT yet reclaimed: the
    * reader contract lets the current batch's lazy captures of [[cur]]
    * materialize first, so their storage is reclaimed one append later.
    */
  private var displaced: Vector[Seg] = Vector.empty
  /** Monotone segment-file counter (durable mode): recovery resumes it
    * past every name the manifest has EVER referenced, so a rolled-back
    * append's half-state can never collide with a fresh segment.
    */
  private var segCounter: Long = 0L
  private var closed = false

  // ── durable backend ────────────────────────────────────────────────
  // The manifest is one header line `v1 batch=<id|-> committed=<k>`
  // followed by the segment directory names in append order; the first
  // <k> are committed, the rest are the last (still rollback-able)
  // append's. Written to manifest.tmp then ATOMIC_MOVE'd over manifest.

  private def manifest = java.nio.file.Paths.get(durableDir.get, "manifest")

  private def writeManifest(): Unit = durableDir.foreach { dir =>
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val batchStr = if (lastBatch == Long.MinValue) "-" else lastBatch.toString
    val lines = (s"v1 batch=$batchStr committed=$committedCount" +:
      segments.map(_.path.get)).mkString("", "\n", "\n")
    val tmp = d.resolve("manifest.tmp")
    java.nio.file.Files.writeString(tmp, lines)
    java.nio.file.Files.move(tmp, manifest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write `rows` as the next durable segment and return it re-read as
    * a parquet scan (restart-survivable lineage; the explicit schema
    * keeps nullability identical to the in-memory form).
    */
  private def writeSeg(rows: DataFrame): Seg = {
    val name = f"seg-$segCounter%06d"
    segCounter += 1
    val p = java.nio.file.Paths.get(durableDir.get, name).toString
    rows.select(schema.fieldNames.map(col).toSeq: _*)
      .write.mode("overwrite").parquet(p)
    Seg(spark.read.schema(schema).parquet(p), owned = false, Some(name))
  }

  private def deleteSegFiles(name: String): Unit = {
    val p = java.nio.file.Paths.get(durableDir.get, name)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // recovery: re-open a durable log from its manifest (no-op when the
  // dir is fresh or the mode is in-memory)
  durableDir.foreach { dir =>
    if (java.nio.file.Files.exists(manifest)) {
      val lines = java.nio.file.Files.readAllLines(manifest)
      require(!lines.isEmpty && lines.get(0).startsWith("v1 "),
        s"unrecognized AppendLog manifest header in $dir")
      val header = lines.get(0).split("\\s+")
      val batchStr = header(1).stripPrefix("batch=")
      lastBatch = if (batchStr == "-") Long.MinValue else batchStr.toLong
      committedCount = header(2).stripPrefix("committed=").toInt
      import scala.jdk.CollectionConverters._
      segments = lines.asScala.drop(1).filter(_.nonEmpty).toVector.map { name =>
        val p = java.nio.file.Paths.get(dir, name)
        // fail LOUDLY at open, not at first action: a manifest naming a
        // missing segment dir means the durable state is mangled (e.g.
        // files deleted out from under the manifest) — constructing a
        // scan over the void would surface as an opaque read error
        // mid-stream instead of a recovery-time contract violation
        require(java.nio.file.Files.isDirectory(p),
          s"AppendLog manifest in $dir references missing segment dir " +
            s"'$name' — durable state is corrupt (recovery refused)")
        Seg(spark.read.schema(schema).parquet(p.toString), owned = false, Some(name))
      }
      // resume naming past everything ever referenced; +1 headroom in
      // case a crash left an unreferenced seg dir at the max name
      segCounter = segments.flatMap(_.path)
        .map(_.stripPrefix("seg-").toLong).maxOption.getOrElse(-1L) + 2
    }
  }

  /** The batch id of the last append, recovered from the manifest —
    * a restarted stream compares the replayed batchId against this to
    * decide whether its first ingest is a retry needing [[rollback]].
    * None when the log is fresh (or in-memory).
    */
  def restoredBatch: Option[Long] =
    if (lastBatch == Long.MinValue) None else Some(lastBatch)

  def cur: DataFrame =
    if (segments.isEmpty) empty else segments.map(_.df).reduce(_ union _)

  /** Reclaim the segments the PREVIOUS append's compaction (or a
    * restore) displaced — runs at the start of the next append, by
    * which point the contract says every frame captured before that
    * compaction has materialized.
    */
  private def reap(): Unit = {
    displaced.foreach { s =>
      if (s.owned) graft.ext.GraphOps.unpersistCheckpoint(s.df)
      s.path.foreach(deleteSegFiles)
    }
    displaced = Vector.empty
  }

  /** Closed-instance guard — runs BEFORE any checkpoint/write work so a
    * refused append cannot strand a fresh checkpoint or segment dir.
    */
  private def guard(): Unit = require(!closed, "AppendLog is closed")

  private def register(seg: Seg, batch: Long): Unit = {
    committedCount = segments.length
    segments :+= seg
    lastBatch = batch
    writeManifest()
  }

  /** @param batch the ingesting batch's id (durable mode persists it in
    *              the manifest for cross-restart replay detection;
    *              in-memory callers may omit it)
    */
  def append(rows: DataFrame, batch: Long = Long.MinValue): Unit = {
    guard(); reap(); compactIfWide()
    val seg =
      if (durableDir.isDefined) writeSeg(rows)
      else Seg(rows.select(schema.fieldNames.map(col).toSeq: _*)
        .localCheckpoint(eager = true), owned = true, None)
    register(seg, batch)
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
    * DURABLE MODE has no zero-copy form — durability requires the
    * write — so this degrades to [[append]] (parent still untouched).
    */
  def appendView(rows: DataFrame, batch: Long = Long.MinValue): Unit =
    if (durableDir.isDefined) append(rows, batch)
    else {
      guard(); reap(); compactIfWide()
      register(Seg(rows.select(schema.fieldNames.map(col).toSeq: _*),
        owned = false, None), batch)
    }

  /** Append a frame the CALLER already localCheckpoint'ed, taking
    * ownership of it (the log unpersists it on rollback/compaction).
    * Skips [[append]]'s re-checkpoint — one fewer copy job per batch on
    * the ingest hot path. Requires an exact column-name match so `cur`'s
    * union stays positionally sound; falls back to [[append]] otherwise.
    * DURABLE MODE writes the checkpoint out as a parquet segment (the
    * write reads the checkpoint's blocks, not the original lineage) and
    * then owns the now-redundant checkpoint via the DEFERRED path: the
    * current batch's lazy reads of the caller's frame (NearDupStream's
    * candidate joins) materialize first; the storage is reclaimed at
    * the next append.
    */
  def appendOwned(seg: DataFrame, batch: Long = Long.MinValue): Unit =
    if (!seg.schema.fieldNames.sameElements(schema.fieldNames)) append(seg, batch)
    else if (durableDir.isDefined) {
      guard(); reap(); compactIfWide()
      val s = writeSeg(seg)
      displaced :+= Seg(seg, owned = true, None)
      register(s, batch)
    } else {
      guard(); reap(); compactIfWide()
      register(Seg(seg, owned = true, None), batch)
    }

  def rollback(): Unit = {
    val pending = segments.drop(committedCount)
    segments = segments.take(committedCount)
    // Publish the truncated view BEFORE touching the files — the mirror
    // of append's write-then-register. A crash after the swap leaves the
    // pending segments as unreferenced garbage (recovery never reads
    // them; the monotone segCounter keeps their names from colliding);
    // a crash before it leaves the old manifest over still-present
    // files, i.e. the rollback simply didn't happen yet. The previous
    // delete-then-publish order had a window where the manifest named
    // already-deleted dirs and recovery constructed scans over nothing.
    if (durableDir.isDefined) writeManifest()
    pending.foreach { s =>
      if (s.owned) graft.ext.GraphOps.unpersistCheckpoint(s.df)
      s.path.foreach(deleteSegFiles)
    }
  }

  /** Replace the whole log with `rows` — the restart-seed path for
    * in-memory logs (in production the caller re-reads its append-only
    * table and hands it here). The replaced segments' storage goes
    * through the deferred path: a restore abandons any in-flight
    * readers, but reclamation need not be synchronous — a capture of
    * [[cur]] taken before the restore still materializes afterwards
    * (AppendLogSpec pins this), and the PREVIOUS append's displaced
    * segments are reaped here so a restore-then-only-read session does
    * not retain two generations.
    */
  def restore(rows: DataFrame): Unit = {
    guard(); reap()
    displaced ++= segments.filter(s => s.owned || s.path.isDefined)
    val seg =
      if (durableDir.isDefined) writeSeg(rows)
      else Seg(rows.select(schema.fieldNames.map(col).toSeq: _*)
        .localCheckpoint(eager = true), owned = true, None)
    segments = Vector(seg)
    committedCount = segments.length // nothing to roll back after a restore
    lastBatch = Long.MinValue
    if (durableDir.isDefined) writeManifest()
  }

  /** Release every block this instance holds: the deferred-reap
    * graveyard AND the live owned segments. For a DURABLE log the LIVE
    * segments' files and the manifest stay — that being the point of
    * durability (a new [[AppendLog]] on the same dir recovers them) —
    * while displaced files (already out of the manifest) are deleted;
    * for an in-memory log the state is simply gone. The instance is
    * unusable afterwards (appends throw). Call
    * it when the stream shuts down — without it, segments displaced by
    * the last compaction or restore stay stored until a next append
    * that never comes (they are NOT leaked to process exit — the
    * ContextCleaner eventually collects unreferenced checkpoints — but
    * a long-lived session should not wait on weak-reference GC).
    */
  def close(): Unit = {
    // displaced durable segments are already out of the manifest —
    // unreferenced garbage a recovery would never read — so their
    // files go too; LIVE segments' files are the durable state itself
    // and stay untouched
    reap()
    segments.foreach(s =>
      if (s.owned) graft.ext.GraphOps.unpersistCheckpoint(s.df))
    segments = Vector.empty
    committedCount = 0
    closed = true
  }

  /** Fold all COMMITTED segments into one once the union grows past
    * `maxSegments` children (bounded plan width ↔ bounded per-append
    * work: each row is re-copied only every ~maxSegments batches,
    * amortized O(1) per batch). The last append's segments are
    * excluded so an in-flight retry can still roll them back.
    * Displaced segments are NOT reclaimed here — the current batch may
    * hold lazy captures of `cur` over them (reader contract above);
    * they are reaped at the next append.
    */
  private def compactIfWide(): Unit =
    if (committedCount > maxSegments) {
      val (done, pending) = segments.splitAt(committedCount)
      val union = done.map(_.df).reduce(_ union _)
      val folded =
        if (durableDir.isDefined) writeSeg(union)
        else Seg(union.localCheckpoint(eager = true), owned = true, None)
      displaced ++= done.filter(s => s.owned || s.path.isDefined)
      segments = folded +: pending
      committedCount = 1
      // the manifest now names the fold instead of the inputs; the
      // input FILES outlive the swap until the next append's reap
      if (durableDir.isDefined) writeManifest()
    }
}
