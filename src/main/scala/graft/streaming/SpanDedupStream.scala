package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Incremental cross-document exact-substring dedup over micro-batches
  * — the streaming continuation of the batch span operator
  * ([[graft.queries.CurationPack.spanDedup]], q75).
  *
  * Contract: HITS STREAM, SPANS RECONCILE.
  *
  *   - A HIT is a (doc_id, pos) shingle occurrence known to be
  *     duplicated (its 8-token shingle appears in ≥2 distinct docs).
  *     Unlike near-dup PAIRS (emitted once, when the later doc
  *     arrives), duplication is retroactive: the batch that brings a
  *     shingle's SECOND distinct doc makes every logged earlier
  *     occurrence a hit too. Emission is still exactly-once: a hit is
  *     emitted in the batch where its shingle first reaches 2 distinct
  *     docs, or in its own arrival batch if the shingle was already
  *     duplicated — never both (already-dup shingles never rejoin the
  *     log side).
  *   - State is the append-only occurrence log (doc_id, pos, sh) —
  *     same posture as [[NearDupStream]]'s band log: storage-backed
  *     and bucketed on `sh` at scale, not executor memory. The
  *     per-batch duplicate test derives (sh → min_doc, max_doc) from
  *     the log; a production deployment maintains that vocabulary-
  *     sized view incrementally (merge-on-read on `sh`) instead of
  *     re-aggregating, which changes cost, not semantics.
  *   - SPAN merge is deliberately not incremental: a retroactive hit
  *     can bridge two existing islands, so maximal spans are not
  *     maintainable with bounded per-batch work (the same argument as
  *     component collapse in [[NearDupStream]]). Reconciliation runs
  *     the per-doc gaps-and-islands pass over the accumulated hits on
  *     the corpus-build cadence; q77 gates it against q75's own
  *     DuckDB oracle.
  *
  * Retry/restart: re-ingesting the SAME batchId rolls back the failed
  * attempt's append first (foreachBatch retry idempotence), and
  * [[restore]] seeds the log after a query restart — both pinned by
  * StreamingSpec, same contracts as [[NearDupStream]].
  *
  * Reference analog: none — brief-mandated training-data machinery.
  *
  * @param durableDir when set, the occurrence log runs in
  *        [[AppendLog]]'s durable (parquet+manifest) mode: state and
  *        replay detection survive a driver restart — same contract as
  *        [[NearDupStream]]'s durable band log.
  */
final class SpanDedupStream(spark: SparkSession, durableDir: Option[String] = None) {

  private val occSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("sh", StringType, nullable = true)))

  private val occLog = new AppendLog(spark, occSchema, durableDir)
  private var lastBatchId: Long = occLog.restoredBatch.getOrElse(Long.MinValue)

  /** Seed the occurrence log after a query restart (production: the
    * log is an append-only table; a fresh instance with an empty log
    * would re-emit historical hits and mislabel already-dup shingles
    * as newly-dup).
    */
  def restore(rows: DataFrame): Unit = {
    occLog.restore(rows.select(col("doc_id").cast("long").as("doc_id"),
      col("pos").cast("int").as("pos"), col("sh")))
    lastBatchId = Long.MinValue
  }

  /** The accumulated occurrence log (for reconciliation/persistence). */
  def occurrenceLog: DataFrame = occLog.cur

  /** foreachBatch body: shingle the batch's (doc_id, text) rows, emit
    * every hit this batch PROVES (fresh occurrences of shingles that
    * are or become duplicated + retroactive log occurrences of
    * shingles that just crossed the threshold), append the batch to
    * the log. Returns the hits, materialized — the caller owns the
    * returned checkpoint's lifetime.
    */
  def ingest(batchDocs: DataFrame, batchId: Long): DataFrame = graft.Caches.scoped {
    if (batchId == lastBatchId) occLog.rollback()
    val seen = occLog.cur
    val occ = graft.queries.CurationPack.spanOccurrences(batchDocs)
      .localCheckpoint(eager = true)
    // batch-side and log-side distinct-doc envelopes, merged per shingle
    val bStat = occ.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("mn_b"), max(col("doc_id")).as("mx_b"))
    val lStat = seen.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("mn_s"), max(col("doc_id")).as("mx_s"))
    val st = bStat.join(lStat, Seq("sh"), "left")
      .select(col("sh"),
        (least(col("mn_b"), coalesce(col("mn_s"), col("mn_b"))) =!=
          greatest(col("mx_b"), coalesce(col("mx_s"), col("mx_b")))).as("dup_now"),
        coalesce(col("mn_s") =!= col("mx_s"), lit(false)).as("was_dup"))
    val dupSh = st.filter(col("dup_now")).select(col("sh"))
    val newlySh = st.filter(col("dup_now") && !col("was_dup")).select(col("sh"))
    // fresh hits: this batch's occurrences of any now-duplicated shingle;
    // retroactive hits: logged occurrences of shingles that JUST crossed
    val fresh = occ.join(dupSh, "sh").select(col("doc_id"), col("pos"))
    val retro = seen.join(newlySh, "sh").select(col("doc_id"), col("pos"))
    val hits = fresh.union(retro).localCheckpoint(eager = true)
    occLog.appendOwned(occ, batchId) // log takes the checkpoint — no re-copy
    lastBatchId = batchId
    hits
  }

  /** Release the log's blocks (durable files stay). Call on shutdown. */
  def close(): Unit = occLog.close()

  /** Periodic reconciliation: merge the accumulated hits into maximal
    * per-doc spans — the batch islands pass over streamed hits.
    */
  def reconcileSpans(hitLog: DataFrame): DataFrame =
    graft.queries.CurationPack.spansFromHits(hitLog)
}
