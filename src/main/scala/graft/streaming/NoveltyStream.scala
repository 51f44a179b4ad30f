package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incremental per-document shingle novelty over micro-batches — the
  * streaming continuation of the batch novelty panel
  * ([[graft.queries.TextPack.shingleNovelty]], q151).
  *
  * Contract: NOVELTY IS FINAL AT ARRIVAL. With batches ingested in
  * doc_id order (the same ingest-order premise q151's min(doc_id)
  * reading rests on), a document's novelty row is exact and immutable
  * the moment its batch commits: a shingle fingerprint is novel iff it
  * is absent from the first-occurrence registry AND this doc is the
  * batch's first (min doc_id) carrier. Later batches can only ADD
  * first occurrences of other fingerprints — they can never revise an
  * emitted row — so the stream's union equals the batch query exactly
  * (q152 gates this against q151's own DuckDB oracle).
  *
  * State is the first-occurrence registry (h, first_doc): one row per
  * DISTINCT fingerprint ever seen — the minimal state any exact
  * novelty account needs, and the same 64-bit fingerprint population
  * the span-dedup log already carries (at scale: a bucketed
  * append-only table keyed on h). Only fingerprints NEW to the
  * registry append, so per-batch append growth is O(batch's new
  * fingerprints), sublinear once the corpus goes stale — the novelty
  * curve itself predicts the registry's growth rate.
  *
  * Retry/restart: re-ingesting the SAME batchId rolls back the failed
  * attempt's append first (foreachBatch retry idempotence), and
  * [[restore]] seeds the registry after a query restart; durableDir
  * runs the registry on [[AppendLog]]'s parquet+manifest backend so
  * state and replay detection survive a driver restart — same
  * contracts as [[NearDupStream]]/[[SpanDedupStream]].
  *
  * Reference analog: none — brief-mandated training-data machinery.
  */
final class NoveltyStream(spark: SparkSession, durableDir: Option[String] = None,
    logMaxSegments: Int = 32) {

  private val regSchema = StructType(Seq(
    StructField("h", LongType, nullable = true),
    StructField("first_doc", LongType, nullable = false)))

  private val reg = new AppendLog(spark, regSchema, durableDir, logMaxSegments)
  private var lastBatchId: Long = reg.restoredBatch.getOrElse(Long.MinValue)

  /** Seed the registry after a query restart (production: the registry
    * is an append-only table; a fresh instance with an empty registry
    * would mislabel historical fingerprints as novel).
    */
  def restore(rows: DataFrame): Unit = {
    reg.restore(rows.select(col("h").cast("long").as("h"),
      col("first_doc").cast("long").as("first_doc")))
    lastBatchId = Long.MinValue
  }

  /** The accumulated first-occurrence registry (for persistence). */
  def registry: DataFrame = reg.cur

  /** foreachBatch body: fingerprint the batch's (doc_id, text) rows,
    * emit one exact novelty row per batch doc, append the batch's NEW
    * fingerprints to the registry. Returns the rows, materialized —
    * the caller owns the returned checkpoint's lifetime.
    */
  def ingest(batchDocs: DataFrame, batchId: Long): DataFrame = graft.Caches.scoped {
    ingestLazy(batchDocs, batchId).localCheckpoint(eager = true)
  }

  /** [[ingest]] minus the final verdict materialization: the batch's
    * NEW fingerprints checkpoint in their own job (the registry takes
    * ownership — every later batch's anti-join reads them, so they
    * stay eager), and the returned per-doc verdict frame is LAZY — the
    * caller owns its materialization. [[CurationStream.ingest]] rides
    * it on the batch's existing fused tagged-union checkpoint, so the
    * fifth gate costs ONE extra job per micro-batch instead of three
    * (round-17's q154 constant: the novelty path's `ex`/`fresh`/`out`
    * checkpoints were three of the five per-batch materializations).
    *
    * The verdict needs NO (doc, shingle)-grain shuffle at all:
    *
    *   - n_shingles (the denominator) is a per-document quantity —
    *     `size(array_distinct(hashes))` computed PER ROW over the
    *     shingle array, no explode, no exchange (exactly the oracle's
    *     per-doc `count(DISTINCT h)`);
    *   - n_novel: `fresh` carries one row per globally-new fingerprint
    *     with its batch-min carrier, so per-doc novel counts are just
    *     `fresh` grouped by first_doc — the exact set q151's "novel
    *     iff globally first" reading counts — a tiny aggregate the
    *     join below broadcasts.
    *
    * So the gate's whole per-batch shuffle budget is the ONE
    * fingerprint-grain exchange inside the fresh job.
    */
  def ingestLazy(batchDocs: DataFrame, batchId: Long): DataFrame = {
    import graft.ext.TextOps
    if (batchId == lastBatchId) reg.rollback()
    val fresh = batchDocs
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 3)).as("_s"))
      .select(col("doc_id"), TextOps.hash32(col("_s")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      .join(reg.cur.select(col("h")), Seq("h"), "left_anti")
      .localCheckpoint(eager = true)
    val novel = fresh.groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    val out = batchDocs
      .select(col("doc_id"),
        size(array_distinct(transform(TextOps.wordShingles(col("text"), 3),
          s => TextOps.hash32(s)))).cast("long").as("n_shingles"))
      // a doc too short to have any 3-shingle contributes no rows to
      // the fingerprint grain, hence no verdict row (the oracle's
      // inner-join semantics)
      .filter(col("n_shingles") > 0L)
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 1000000) div n_shingles").as("novelty_ppm"))
    reg.appendOwned(fresh, batchId) // registry takes the checkpoint — no re-copy
    lastBatchId = batchId
    out
  }

  /** Release the registry's blocks (durable files stay). Call on
    * shutdown — emitted rows are independent checkpoints and survive.
    */
  def close(): Unit = reg.close()
}
