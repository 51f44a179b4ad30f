package graft

import graft.decode.Wire
import graft.operators.OhlcOps
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** EP3 end-to-end: frame replay through decode → top-K → envelope, and
  * batch/stream equivalence of the windowed OHLC aggregate.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def tokenFrame(seed: Int): Array[Byte] = {
    val nums = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nums.putDouble(0.004).putDouble(250000.0).putDouble(500.0)
    val text = (s"  $$TOK${('A' + seed % 5).toChar} pumpfun 24h " +
      "So11111111111111111111111111111111111111112 ").getBytes("UTF-8")
    Wire.Preamble ++ Wire.PairsMarker ++ new Array[Byte](15) ++ nums.array() ++ text
  }

  test("frame replay -> decode -> foreachBatch envelope (EP3)") {
    val framesDir = tmpDir("frames")
    val checkpoint = tmpDir("ckpt")
    (0 until 4).map(i => (i.toLong, tokenFrame(i), 1700000000L + i))
      .toDF("frame_id", "frame", "extraction_ts")
      .write.mode("overwrite").parquet(framesDir)

    val batches = mutable.ArrayBuffer.empty[(Long, String)]
    val q = Streaming.runTokenPipeline(spark, framesDir,
      (id, payload) => batches.synchronized { batches += id -> payload; () },
      trigger = Trigger.AvailableNow(), checkpointDir = Some(checkpoint))
    q.awaitTermination(60000)

    assert(batches.nonEmpty)
    val payload = batches.map(_._2).mkString
    assert(payload.contains(""""type":"enhanced_tokens""""))
    assert(payload.contains(""""symbol":"TOK"""))
    assert(payload.contains(""""quote_address":"So11111111111111111111111111111111111111112""""))
  }

  test("mt5/ohlc/prometheus stream formats render") {
    val frames = (0 until 2).map(i => (i.toLong, tokenFrame(i), 1700000000L))
      .toDF("frame_id", "frame", "extraction_ts")
    val tokens = graft.decode.Decode.tokens(spark, frames.as[graft.decode.Decode.Frame])
    val mt5 = Streaming.serializeBatch(tokens, "mt5", 10)
    assert(mt5.contains("2023.11.14")) // 1700000000 UTC date
    val ohlc = Streaming.serializeBatch(tokens, "ohlc", 10)
    assert(ohlc.startsWith("TOKEN,1700000000,0.004,"))
    val prom = Streaming.serializeBatch(tokens, "prometheus", 10)
    assert(prom.contains("dex_tokens_extracted_total"))
    val rich = Streaming.serializeBatch(tokens, "rich", 10)
    assert(rich.contains("DEXSCRAPER PRO") && rich.contains("Haunted Market Data"))
    assert(rich.contains("TOK")) // table rows carry the decoded symbol
    assert(rich.contains("Auto-refresh: 5s"))
  }

  test("stateful first-seen dedup across micro-batches (flatMapGroupsWithState)") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{FirstSeen, Keyed}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Keyed[String]]
    val deduped = StatefulOps.firstSeenDedup(input.toDS())
    val q = deduped.writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      input.addData(Keyed("a", 10L, "a-first"), Keyed("b", 11L, "b-first"),
        Keyed("a", 12L, "a-dup"))
      q.processAllAvailable()
      input.addData(Keyed("a", 20L, "a-late"), Keyed("c", 21L, "c-first"))
      q.processAllAvailable()
      val rows = spark.table("first_seen").as[FirstSeen[String]]
        .collect().sortBy(_.key).toSeq
      assert(rows == Seq(FirstSeen("a", "a-first", 10L),
        FirstSeen("b", "b-first", 11L), FirstSeen("c", "c-first", 21L)))
    } finally q.stop()
  }

  test("windowed OHLC: stream (complete mode) equals batch") {
    val eventsDir = tmpDir("events")
    val ticks = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type").as("symbol"),
        col("value").as("price"), col("value").as("volume"), col("event_id"))
    ticks.write.mode("overwrite").parquet(eventsDir)

    val batchBars = OhlcOps.timeBucketed(spark.read.parquet(eventsDir), "1 hour",
      keyCols = Seq("symbol"), seqCol = "event_id")
      .orderBy(col("bar_start"), col("symbol")).collect()

    val streamTicks = spark.readStream.schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
    val bars = OhlcOps.timeBucketed(streamTicks.withWatermark("ts", "1 minute"),
      "1 hour", keyCols = Seq("symbol"), seqCol = "event_id")
    val q = bars.writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamBars = spark.sql("select * from ohlc_stream")
      .orderBy(col("bar_start"), col("symbol")).collect()
    assert(streamBars.length == batchBars.length)
    assert(streamBars.map(_.toString).sameElements(batchBars.map(_.toString)))
  }
}
