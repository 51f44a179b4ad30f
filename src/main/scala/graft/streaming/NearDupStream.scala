package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incremental near-dup candidate maintenance over micro-batches — the
  * streaming continuation of the batch dedup pipeline (banded LSH pairs
  * → connected components → min-member election, q18/q55/q68).
  *
  * Contract: PAIRS STREAM, GROUPS RECONCILE.
  *
  *   - Pair emission is incremental and keyed: each micro-batch's docs
  *     are banded with the SAME MinHash/band parameters as the batch
  *     operator ([[graft.queries.TextPack.bandedKeys]]), joined against
  *     the accumulated band log (new×seen) and against themselves
  *     (new×new) on the band key — equi-joins only, never all-pairs.
  *     Every candidate pair is emitted exactly once, in the batch where
  *     its LATER doc arrives, with the same `n_shared_bands` the batch
  *     join would count (both docs' band rows are complete by then).
  *   - The band log is append-only keyed state: O(docs × bands) rows on
  *     STORAGE (at scale: an append-only bucketed table compacted on
  *     band_key), not executor memory — the same posture as the
  *     watermarked state-store dedup in [[StatefulOps]], but unbounded
  *     retention because near-dup candidates never expire.
  *   - Component COLLAPSE is deliberately not incremental: min-label
  *     components are not maintainable under edge insertion with
  *     bounded work — one new edge can merge two components and
  *     relabel an unbounded number of nodes (the update fan-out is the
  *     component size, not the edge count). The scale-safe form is
  *     periodic batch reconciliation: run
  *     [[graft.ext.GraphOps.connectedComponents]] over the accumulated
  *     pair log ([[reconcileComponents]]) on whatever cadence the
  *     corpus build runs. StreamingSpec proves the composed story
  *     (streamed pairs ∪ reconciliation ≡ the batch pipeline).
  *
  * Reference analog: none — dexscraper dedups within one frame only
  * (`protocol.py` cluster overlap); this is the brief's 100 TB
  * training-data machinery.
  *
  * @param durableDir when set, the band log runs in [[AppendLog]]'s
  *        DURABLE mode (parquet segments + atomic manifest under this
  *        directory): the accumulated state survives a driver restart,
  *        and a NEW instance constructed on the same dir resumes where
  *        the dead one stopped — including replay detection for the
  *        one batch Structured Streaming re-delivers after recovery
  *        (the manifest remembers the last appended batchId, so the
  *        replayed ingest rolls back the dead session's append exactly
  *        as an in-session retry would). SoakSpec's kill-and-restart
  *        case proves stream ≡ batch across the restart.
  * @param logMaxSegments band-log compaction width (default 32): how
  *        many per-batch segments accumulate before the log folds them
  *        into one. Lower = narrower union plans but more frequent
  *        full-log rewrites; SoakSpec stresses the reap/rollback
  *        interleaving at 4 (a compaction every few batches).
  */
final class NearDupStream(spark: SparkSession,
    durableDir: Option[String] = None, logMaxSegments: Int = 32) {

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band_key", StringType, nullable = true)))

  /** Accumulated (doc_id, band_key) log across batches — an
    * [[AppendLog]], so lineage truncates per batch and a foreachBatch
    * RETRY of the last batch can roll back instead of double-appending.
    */
  private val bandLog = new AppendLog(spark, bandSchema, durableDir, logMaxSegments)
  private var lastBatchId: Long = bandLog.restoredBatch.getOrElse(Long.MinValue)

  /** Seed the band log after a query RESTART: in production the log is
    * an append-only table on storage, and a recovered query must
    * restore it before ingesting — a fresh instance with an empty log
    * would silently lose every cross-restart candidate pair
    * (StreamingSpec pins restore ≡ uninterrupted run).
    */
  def restore(rows: DataFrame): Unit = {
    bandLog.restore(rows
      .select(col("doc_id").cast("long").as("doc_id"), col("band_key")))
    lastBatchId = Long.MinValue
  }

  /** foreachBatch body: band the batch's (doc_id, text) rows, emit the
    * candidate pairs this batch introduces, append the batch to the
    * band log. Returns the new pairs (doc1 < doc2, n_shared_bands),
    * materialized — safe to collect or write from the caller (the
    * caller owns the returned checkpoint's lifetime). Re-ingesting the
    * SAME batchId (a foreachBatch retry after a downstream failure) is
    * idempotent: the failed attempt's append is rolled back first.
    */
  def ingest(batchDocs: DataFrame, batchId: Long): DataFrame = graft.Caches.scoped {
    ingestLazy(batchDocs, batchId).localCheckpoint(eager = true)
  }

  /** [[ingest]] minus the final pair materialization: the band log is
    * appended exactly as in [[ingest]] (the bands checkpoint is reused
    * three times within the batch and by every later batch, so it
    * stays eager), but the returned pairs frame is LAZY — the caller
    * owns its materialization. [[CurationStream.ingest]] uses this to
    * fuse the batch's pair rows and decision rows into ONE tagged-
    * union checkpoint job instead of two sequential ones.
    */
  def ingestLazy(batchDocs: DataFrame, batchId: Long): DataFrame = {
    if (batchId == lastBatchId) bandLog.rollback()
    val seen = bandLog.cur
    val bands = graft.queries.TextPack.bandedKeys(batchDocs)
      .localCheckpoint(eager = true)
    val nn = bands.select(col("doc_id").as("doc1"), col("band_key"))
      .join(bands.select(col("doc_id").as("doc2"), col("band_key")), "band_key")
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"))
    val ns = bands.select(col("doc_id").as("n_id"), col("band_key"))
      .join(seen.select(col("doc_id").as("s_id"), col("band_key")), "band_key")
      .filter(col("n_id") =!= col("s_id"))
      .select(least(col("n_id"), col("s_id")).as("doc1"),
        greatest(col("n_id"), col("s_id")).as("doc2"))
    val pairs = nn.union(ns)
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_shared_bands"))
    bandLog.appendOwned(bands, batchId) // log takes the checkpoint — no re-copy
    lastBatchId = batchId
    pairs
  }

  /** Release the band log's blocks (a durable log's files stay — a new
    * instance on the same dir recovers them). Call on stream shutdown.
    */
  def close(): Unit = bandLog.close()

  /** Periodic reconciliation: collapse the accumulated pair log into
    * (node, component) labels — the batch CC over streamed edges.
    */
  def reconcileComponents(pairLog: DataFrame): DataFrame =
    graft.ext.GraphOps.connectedComponents(pairLog, "doc1", "doc2")
}
