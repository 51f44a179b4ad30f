package graft.streaming

import org.apache.spark.sql.SparkSession

/** Execution posture for the eager micro-batch harnesses (the manual
  * `ingest(batch, id)` drivers over [[NearDupStream]], [[AnnStream]],
  * [[SpanDedupStream]], [[CurationStream]]): AQE off for the scope's
  * per-batch actions, restored afterwards.
  *
  * Rationale (r13 profile, `graft.tools.ProfileQ72`): each per-batch
  * eager action — the band/pair/decision checkpoints — is a FIXED-SHAPE
  * plan over one small increment. AQE re-plans per stage, turning every
  * such action into ~10 scheduler jobs (q72: 34 jobs per ingest, 13
  * with AQE off) whose fixed cost dominates at micro-batch sizes; the
  * runtime re-planning buys nothing on a plan whose shape never varies.
  * Structured Streaming's stateful micro-batches disable AQE for the
  * same reason. At production batch sizes (GBs per micro-batch) the
  * trade flips — re-enable by running the harness outside this scope.
  */
object MicroBatch {
  def withBatchPlans[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val was = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body
    finally spark.conf.set(key, was)
  }
}
