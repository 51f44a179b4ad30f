package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental ANN index maintenance — the streaming form of the
  * trained-IVF path (q48): the codebook is BATCH-trained
  * ([[graft.ext.VectorOps.kmeansCodebook]], the train half of
  * train→assign→probe→re-rank) and FROZEN here, exactly like
  * [[CurationStream]]'s LM stats — a production vector index retrains
  * offline and serves/ingests online. Each micro-batch of embeddings
  * is assigned to its cell with one argmin over the broadcast codebook
  * (a narrow map — ingest cost is O(batch·k), no corpus-sized shuffle)
  * and appended to the postings log; probes run against the
  * accumulated postings through the same
  * [[graft.ext.VectorOps.probePostings]] code path the batch operator
  * uses, so a probe over streamed state is VALUE-identical to the
  * batch index built from the same vectors (oracle-gated as q73
  * against q48's own DuckDB SQL).
  *
  * The postings log is append-only keyed state on storage (bucketed by
  * cell at scale, so probes prune to nprobe buckets); retry of the
  * same batchId rolls back the failed attempt's append, and restore()
  * reseeds after a query restart — the same contracts as
  * [[NearDupStream]]/[[CurationStream]], spec-pinned in StreamingSpec.
  *
  * @param durableDir when set, the postings log runs in [[AppendLog]]'s
  *        durable (parquet+manifest) mode: the index state and replay
  *        detection survive a driver restart — same contract as
  *        [[NearDupStream]]'s durable band log. (The frozen codebook is
  *        the caller's input, re-supplied on restart like the LM stats.)
  */
final class AnnStream(spark: SparkSession, codebook: DataFrame,
    durableDir: Option[String] = None) {

  private val cb = graft.Caches.persisted(codebook)
  private val postings = new AppendLog(spark, StructType(Seq(
    StructField("cell", LongType, nullable = true),
    StructField("c_id", LongType, nullable = true),
    StructField("c_vec", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("c_nrm", DoubleType, nullable = true))), durableDir)
  private var lastBatchId: Long = postings.restoredBatch.getOrElse(Long.MinValue)

  /** Assign one micro-batch (idCol, vecCol) to cells and append the
    * postings; returns the batch's (cell, c_id, c_vec, c_nrm) rows.
    */
  def ingest(batchVecs: DataFrame, batchId: Long,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame =
    graft.Caches.scoped {
      if (batchId == lastBatchId) postings.rollback()
      val vecs = graft.Caches.persisted(batchVecs
        .select(col(idCol), col(vecCol),
          graft.ext.VectorOps.normInt(col(vecCol)).as("nrm")))
      val assigned = graft.ext.VectorOps.postingsOf(vecs, cb, idCol, vecCol)
        .localCheckpoint(eager = true)
      // appendView, not append: `assigned` is already a lineage-truncated
      // checkpoint, and the CALLER owns it (it's the return value), so
      // the log borrows a view instead of running a second copy job per
      // micro-batch — rollback/compaction drop only the reference and
      // the ContextCleaner reclaims the blocks once the caller's ref
      // drops too (the same borrowed-parent lifecycle as
      // CurationStream's fused-frame views).
      postings.appendView(assigned, batchId)
      lastBatchId = batchId
      assigned
    }

  /** Release the log's blocks (durable files stay). Call on shutdown. */
  def close(): Unit = postings.close()

  /** Top-k over everything ingested so far — the batch probe operator
    * pointed at the streamed postings.
    */
  def probe(queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val q = queries.select(col(idCol), col(vecCol),
      graft.ext.VectorOps.normInt(col(vecCol)).as("nrm"))
    graft.ext.VectorOps.probePostings(q, cb, postings.cur, k, nprobe, idCol, vecCol)
  }

  /** Seed the postings log after a query restart. */
  def restore(rows: DataFrame): Unit = {
    postings.restore(rows)
    lastBatchId = Long.MinValue
  }
}
