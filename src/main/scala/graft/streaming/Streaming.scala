package graft.streaming

import graft.decode.Decode
import graft.model.TokenProfile
import graft.operators.{OhlcOps, Tokens}
import graft.sinks.Sinks
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The continuous path (SURVEY §2.10 ST1-ST7; reference EP3,
  * scraper.py:1491-1591): each reference "extraction cycle" is one
  * micro-batch. The WebSocket client is a connectivity shim outside the
  * engine; the engine-side frame source is a streaming read over frame
  * files (one row per frame: frame_id, frame bytes, extraction_ts), which
  * is also the replay/test harness. Rate limiting (ST3) and retry/backoff
  * (ST4) are source-connector concerns; state is per-batch only (ST6) —
  * every cycle is a full snapshot (ST2), so stateless streaming +
  * foreachBatch reproduces the reference's delivery semantics.
  */
object Streaming {

  val frameSchema: StructType = StructType(Seq(
    StructField("frame_id", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
    StructField("extraction_ts", LongType, nullable = false)))

  /** Frame source abstraction (S1): streaming read of frame rows. */
  def frameSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(frameSchema).parquet(dir)

  /** Decode stage as a streaming transformation: frames → TokenProfile
    * rows (narrow flatMap; no state, no shuffle).
    */
  def tokenStream(spark: SparkSession, frames: DataFrame): DataFrame = {
    implicit val enc: Encoder[Decode.Frame] = Encoders.product[Decode.Frame]
    Decode.tokens(spark, frames.as[Decode.Frame])
  }

  /** EP3: stream frames → decode → per-micro-batch top-K + batch stats →
    * serialized envelope to `onBatch` (the reference's output callback,
    * scraper.py:1493-1515). Default trigger = the reference's 5 s cycle.
    */
  def runTokenPipeline(spark: SparkSession, framesDir: String,
      onBatch: (Long, String) => Unit,
      formatType: String = "json",
      topK: Int = 10,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      checkpointDir: Option[String] = None): StreamingQuery =
    runDecodedPipeline(tokenStream(spark, frameSource(spark, framesDir)),
      onBatch, formatType, topK, trigger, checkpointDir)

  /** The sink half of the pipeline over an ALREADY-DECODED token
    * stream — shared by the parquet frame replay above and the live
    * `graft-tokens` spool path (`cli.Main --ws`), whose source decodes
    * inside the reader.
    */
  def runDecodedPipeline(tokens: DataFrame,
      onBatch: (Long, String) => Unit,
      formatType: String = "json",
      topK: Int = 10,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      checkpointDir: Option[String] = None): StreamingQuery = {
    // Ring of recent top-K batches (ST6/O14): bounded driver-side state
    // feeding the TUI's session stats — scoped to THIS pipeline run, so
    // concurrent `rich` streams never interleave cycle counts and a
    // restarted pipeline starts from cycle 1.
    val ring = new DataBuffer[Seq[TokenProfile]](maxSize = 100)
    val writer = tokens.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(batchId, serializeBatch(batch, formatType, topK, ring))
        ()
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** One micro-batch → one serialized payload. Stats are a distributed
    * aggregate; only the bounded top-K rows reach the driver. The `ring`
    * (used by the `rich` format's cycle counter) is owned by the caller —
    * one per pipeline run.
    */
  def serializeBatch(tokens: DataFrame, formatType: String, topK: Int,
      ring: DataBuffer[Seq[TokenProfile]] = new DataBuffer(maxSize = 100)): String = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val statsRow = Tokens.batchStats(tokens).collect()(0)
    val (total, highConf, complete) =
      (statsRow.getLong(0), statsRow.getLong(1), statsRow.getLong(2))
    val top = Tokens.topTokens(tokens, topK)
      .drop("frame_id").as[TokenProfile].collect().toSeq
    val ts = top.flatMap(_.timestamp).headOption.getOrElse(0L)

    formatType match {
      case "json" =>
        Sinks.formatStreamingJson(top, total, highConf, ts, topK)
      case "ohlc" =>
        top.flatMap(tokenOhlc).map(Sinks.formatOhlcLine("TOKEN", _)).mkString("\n")
      case "mt5" =>
        top.flatMap(tokenOhlc).map(Sinks.formatMt5).mkString("\n")
      case "prometheus" =>
        Sinks.formatPrometheus(top, total, highConf, ts)
      case "rich" =>
        // O14: deterministic TUI frame — cycle from the ring, clock from
        // the batch's injected extraction ts, never wall-clock.
        ring.append(top)
        val cycle = ring.size.toLong
        graft.sinks.Tui.render(top, total, highConf, complete, cycle,
          sessionSeconds = cycle * 5.0,
          clock = graft.sinks.Tui.clockString(ts))
      case other =>
        throw new IllegalArgumentException(s"unknown stream format: $other")
    }
  }

  /** W2 per-token degenerate bar (models.py:253-264). */
  private def tokenOhlc(t: TokenProfile): Option[graft.model.Ohlc] =
    Sinks.tokenOhlcBar(t)

  /** Scale-adaptive STATE-STORE partition count for a stateful stream.
    *
    * A stateful streaming query's state partitioning is pinned by
    * `spark.sql.shuffle.partitions` at first checkpoint and AQE cannot
    * coalesce it (the engine disables AQE in stateful workloads), so the
    * count is a real capacity decision: every micro-batch pays one state
    * store open/commit per partition regardless of data. Sizing it to
    * the CORE COUNT — the session default — is wrong in both directions:
    * tiny inputs pay (cores × stores × batches) of pure constant
    * (measured: q93's three near-empty micro-batches at 32 stores cost
    * 4.7 s of store commits vs 1.2 s at the derived count), and a 100 TB
    * stream wants state sharded by VOLUME, not by one node's cores.
    *
    * Contract: `spark.graft.stream.statePartitions` (when set) wins —
    * production pins state shards explicitly, exactly like choosing a
    * Kafka partition count. Default derives from the stream input's
    * optimizer-estimated bytes at ~32 MB of input per state partition,
    * clamped to [1, defaultParallelism] — input-proportional, so the
    * local bench and a cluster both get a count that matches their data,
    * not their core count.
    */
  def statePartitions(spark: SparkSession, input: DataFrame): Int =
    spark.conf.getOption("spark.graft.stream.statePartitions")
      .map(_.toInt).getOrElse {
        val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
        val target = BigInt(32L << 20)
        val cap = spark.sparkContext.defaultParallelism.max(1)
        ((bytes + target - 1) / target).min(cap).max(1).toInt
      }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n` (the window in which a stateful stream must START so its state
    * layout picks the count up), restoring the previous value after.
    * Batch work outside the window is untouched.
    */
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** True streaming OHLC (W4 + ST5): watermarked tick stream → windowed
    * bars. `ticks` needs (ts: timestamp, price, volume, key columns).
    */
  def ohlcStream(ticks: DataFrame, duration: String, watermark: String,
      keyCols: Seq[String] = Seq("symbol")): DataFrame =
    OhlcOps.timeBucketed(ticks.withWatermark("ts", watermark), duration,
      keyCols = keyCols, seqCol = null)

  /** Streaming analog of q60's gap sessionization: `session_window`
    * merges events within `gap` of each other into one growing window
    * per key; with a watermark, append mode emits a session only once
    * it can no longer grow (watermark past last event + gap) — so the
    * emitted rows are CLOSED sessions, identical to the batch
    * formulation over the same events. State per key is the set of
    * open sessions only; closed sessions leave the store on emission.
    */
  def sessionStream(events: DataFrame, gap: String, watermark: String,
      keyCols: Seq[String] = Seq("symbol")): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(keyCols.map(org.apache.spark.sql.functions.col) :+
        session_window(org.apache.spark.sql.functions.col("ts"), gap): _*)
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event_id"))
      .select(keyCols.map(org.apache.spark.sql.functions.col) ++ Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("first_event_id")): _*)
}
