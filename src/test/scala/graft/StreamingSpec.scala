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
object StreamingSpec {
  /** Event-time tick for the watermark tests (encoder-derivable). */
  final case class Tick(ts: java.sql.Timestamp, symbol: String,
      price: Double, volume: Double, event_id: Long)
}

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

  test("stateful funnel: within-batch disorder sorts, stages never regress, emits on change only") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelSnap}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val snaps = StatefulOps.funnelStates(input.toDS(), Seq("view", "click", "purchase"))
    val q = snaps.writeStream.format("memory").queryName("funnel_snaps")
      .outputMode("append").start()
    try {
      // batch 1 arrives DISORDERED: the click lands before the view in
      // the iterator but after it in event time — the in-batch sort must
      // still produce t1 < t2; a click at exactly t1 must NOT count
      input.addData(
        FunnelEvent(1L, 11L, 200L, "click"),
        FunnelEvent(1L, 10L, 100L, "view"),
        FunnelEvent(1L, 12L, 100L, "click"), // ts == t1 → strictly-after fails
        FunnelEvent(2L, 20L, 150L, "view"))
      q.processAllAvailable()
      // batch 2: user 1 purchases; user 2 has no qualifying event (a
      // purchase before any click) → no state change, no emission
      input.addData(
        FunnelEvent(1L, 13L, 300L, "purchase"),
        FunnelEvent(2L, 21L, 250L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_snaps").as[FunnelSnap].collect().toSeq
      // user 1: batch-1 snapshot (view+click), batch-2 snapshot (purchase)
      assert(rows.filter(_.userId == 1L).sortBy(_.t3) ==
        Seq(FunnelSnap(1L, 100L, 200L, -1L), FunnelSnap(1L, 100L, 200L, 300L)))
      // user 2: only the batch-1 snapshot — batch 2 changed nothing
      assert(rows.filter(_.userId == 2L) == Seq(FunnelSnap(2L, 150L, -1L, -1L)))
    } finally q.stop()
  }

  // --- ST5 event-time semantics: the stream≡batch proof must not depend
  // on in-order arrival. At scale the frame stream WILL deliver late
  // data; the watermark defines exactly which of it still counts. ------

  private val HourZero = 1700002800L // hour-aligned UTC epoch

  private def tick(h: Int, m: Int, symbol: String, price: Double,
      id: Long): StreamingSpec.Tick =
    StreamingSpec.Tick(new java.sql.Timestamp((HourZero + h * 3600L + m * 60L) * 1000L),
      symbol, price, price * 10.0, id)

  test("append-mode OHLC: out-of-order arrival within the watermark equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamingSpec.Tick]
    val bars = Streaming.ohlcStream(input.toDF(), "1 hour", "30 minutes")
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("ohlc_append").start()
    try {
      // every batch delivers out of order; late rows stay ABOVE watermark
      input.addData(tick(0, 5, "A", 1.0, 1), tick(1, 10, "A", 3.0, 2),
        tick(0, 50, "A", 2.0, 3), tick(1, 5, "B", 5.0, 4))
      q.processAllAvailable() // watermark now 00:40
      input.addData(tick(0, 55, "A", 2.5, 5), tick(2, 20, "A", 7.0, 6))
      q.processAllAvailable() // 00:55 beats the 00:40 watermark → counted
      input.addData(tick(3, 40, "A", 9.0, 7))
      q.processAllAvailable()
      input.addData(tick(9, 0, "Z", 1.0, 8)) // sentinel: closes hours 0-3
      q.processAllAvailable()

      val streamed = spark.table("ohlc_append")
        .orderBy(col("bar_start"), col("symbol")).collect().map(_.toSeq).toSeq
      // batch truth over the SAME ticks minus the sentinel (whose own
      // window never closes, so append mode never emits it)
      val all = Seq(tick(0, 5, "A", 1.0, 1), tick(1, 10, "A", 3.0, 2),
        tick(0, 50, "A", 2.0, 3), tick(1, 5, "B", 5.0, 4),
        tick(0, 55, "A", 2.5, 5), tick(2, 20, "A", 7.0, 6),
        tick(3, 40, "A", 9.0, 7))
      val batch = OhlcOps.timeBucketed(all.toDF(), "1 hour", seqCol = null)
        .orderBy(col("bar_start"), col("symbol")).collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      // the out-of-order 00:55 tick is IN the hour-0 bar (close 2.5)
      assert(streamed.head(6) == 2.5)
    } finally q.stop()
  }

  test("dedup within watermark: bursty dups collapse, expired keys re-emit") {
    import graft.streaming.StatefulOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamingSpec.Tick]
    val deduped = StatefulOps.dedupWithinWatermark(
      input.toDF(), Seq("symbol"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup").start()
    try {
      // burst: A then a retry-duplicate of A one minute later
      input.addData(tick(0, 0, "A", 1.0, 1), tick(0, 1, "A", 1.0, 2))
      q.processAllAvailable()
      // advance the watermark past A's last-seen + 10 min → A's state evicts
      input.addData(tick(1, 0, "Z", 9.0, 3))
      q.processAllAvailable()
      // replay of A AFTER eviction: re-emitted (bounded state, not
      // firstSeenDedup's forever-suppression)
      input.addData(tick(1, 5, "A", 2.0, 4))
      q.processAllAvailable()
      val got = spark.table("wm_dedup").select("event_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 3L, 4L)) // the in-burst dup (2) is the only drop
    } finally q.stop()
  }

  test("streaming corpus ingest: gate + cross-batch fingerprint dedup equals batch") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.Keyed
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // quality gate (stateless) BEFORE the stateful exact dedup — the
    // incremental form of the q68 front half: docs stream in, only
    // first-seen fingerprints that pass the gate join the corpus
    val docs = input.toDF().toDF("doc_id", "text")
    val keyed = docs.filter(size(split(col("text"), " ")) >= 3)
      .select(md5(col("text")).as("key"), col("doc_id").as("ts"),
        col("doc_id").as("value")).as[Keyed[Long]]
    val q = StatefulOps.firstSeenDedup(keyed).writeStream
      .format("memory").queryName("corpus_ingest").outputMode("append").start()
    try {
      input.addData((1L, "alpha beta gamma"), (2L, "too short"),
        (3L, "alpha beta gamma")) // in-batch duplicate
      q.processAllAvailable()
      input.addData((4L, "alpha beta gamma"), // cross-batch duplicate
        (5L, "delta epsilon zeta eta"))
      q.processAllAvailable()
      input.addData((6L, "delta epsilon zeta eta")) // dup of batch 2
      q.processAllAvailable()
      val streamed = spark.table("corpus_ingest")
        .select("value").collect().map(_.getLong(0)).toSet
      // batch truth over the same rows: gate, then min doc_id per md5
      val all = Seq((1L, "alpha beta gamma"), (2L, "too short"),
        (3L, "alpha beta gamma"), (4L, "alpha beta gamma"),
        (5L, "delta epsilon zeta eta"), (6L, "delta epsilon zeta eta"))
      val batch = all.toDF("doc_id", "text")
        .filter(size(split(col("text"), " ")) >= 3)
        .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("keep"))
        .select("keep").collect().map(_.getLong(0)).toSet
      assert(streamed == batch && streamed == Set(1L, 5L))
    } finally q.stop()
  }

  test("streaming near-dup: per-batch pair emission + CC reconciliation equals batch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dupA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupB = "one two three four five six seven eight nine ten eleven"
    // dup group A spans all three batches; group B has an in-batch dup
    // (11,13) AND a cross-batch dup (2,11) — both emission paths bind
    val b1 = Seq((1L, dupA), (2L, dupB),
      (3L, "quick brown fox jumps over the lazy dog right now"))
    val b2 = Seq((10L, dupA), (11L, dupB), (13L, dupB),
      (12L, "entirely different words appear inside this sentence over here"))
    val b3 = Seq((20L, dupA),
      (21L, "yet another unique document text goes right here okay then"))
    val input = MemoryStream[(Long, String)]
    val nd = new graft.streaming.NearDupStream(spark)
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        emitted ++= nd.ingest(batch, bid).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        ()
      }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batchPairs = Caches.scoped {
      graft.queries.TextPack.lshCandidatePairsFrom(all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // every pair exactly once, in the batch where its later doc landed,
    // with the batch join's n_shared_bands
    assert(emitted.size == emitted.toSet.size, s"duplicate emission: $emitted")
    assert(emitted.toSet == batchPairs)
    assert(emitted.toSet.exists(p => p._1 == 11L && p._2 == 13L)) // in-batch
    assert(emitted.toSet.exists(p => p._1 == 2L && p._2 == 11L)) // cross-batch
    // periodic reconciliation over the streamed pair log = the batch CC
    val streamedCC = Caches.scoped {
      nd.reconcileComponents(emitted.toSeq.map(p => (p._1, p._2))
          .toDF("doc1", "doc2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val batchCC = Caches.scoped {
      graft.ext.GraphOps.connectedComponents(
          graft.queries.TextPack.lshCandidatePairsFrom(all), "doc1", "doc2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(streamedCC == batchCC)
    assert(streamedCC(20L) == 1L && streamedCC(13L) == 2L)
  }

  test("NearDupStream: batch retry is idempotent, restore() rebuilds state") {
    import org.apache.spark.sql.DataFrame
    val dupA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    def pairsOf(df: DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nd = new graft.streaming.NearDupStream(spark)
    assert(pairsOf(nd.ingest(docs(1L -> dupA,
      2L -> "one two three four five six seven eight nine ten"), 0)).isEmpty)
    val p1 = pairsOf(nd.ingest(docs(10L -> dupA), 1))
    // foreachBatch retry: same batchId replayed after a downstream
    // failure — the first attempt's append must roll back, or the pair
    // re-emits with n_shared_bands inflated by the duplicated log rows
    val p1retry = pairsOf(nd.ingest(docs(10L -> dupA), 1))
    assert(p1 == p1retry && p1.map(p => (p._1, p._2)) == Set((1L, 10L)))
    // the batch AFTER a retry sees an un-doubled log: exact counts
    val p2 = pairsOf(nd.ingest(docs(20L -> dupA), 2))
    assert(p2.map(p => (p._1, p._2)) == Set((1L, 20L), (10L, 20L)))
    assert(p2 == p1.flatMap(p => Seq((1L, 20L, p._3), (10L, 20L, p._3))))
    // restart: a fresh instance restored from the band log continues
    // exactly like the uninterrupted run
    val nd2 = new graft.streaming.NearDupStream(spark)
    nd2.restore(graft.queries.TextPack.bandedKeys(docs(1L -> dupA,
      2L -> "one two three four five six seven eight nine ten", 10L -> dupA)))
    assert(pairsOf(nd2.ingest(docs(20L -> dupA), 0)) == p2)
  }

  test("NoveltyStream: exact per-doc novelty, retry idempotent, restore rebuilds") {
    import org.apache.spark.sql.DataFrame
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    def rowsOf(df: DataFrame): Map[Long, (Long, Long, Long)] =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val t1 = "w1 w2 w3 w4" // shingles {w1w2w3, w2w3w4}
    val t2 = "w2 w3 w4 w5" // {w2w3w4 (stale after batch 0), w3w4w5 (novel)}
    val nv = new graft.streaming.NoveltyStream(spark)
    assert(rowsOf(nv.ingest(docs(1L -> t1), 0)) == Map(1L -> (2L, 2L, 1000000L)))
    val b1 = rowsOf(nv.ingest(docs(2L -> t2), 1))
    assert(b1 == Map(2L -> (2L, 1L, 500000L)), s"half-novel doc: $b1")
    // foreachBatch retry: same batchId replayed — the first attempt's
    // registry append must roll back or w3w4w5 reads as stale on replay
    assert(rowsOf(nv.ingest(docs(2L -> t2), 1)) == b1)
    // post-retry registry is un-doubled and w3w4w5 is now registered
    assert(rowsOf(nv.ingest(docs(3L -> t2), 2)) == Map(3L -> (2L, 0L, 0L)))
    // within-batch first-carrier election: two docs sharing a NEW
    // shingle in ONE batch — only the min doc_id carrier is novel
    val b3 = rowsOf(nv.ingest(docs(4L -> "a b c", 5L -> "a b c"), 3))
    assert(b3 == Map(4L -> (1L, 1L, 1000000L), 5L -> (1L, 0L, 0L)), s"$b3")
    // restart: a fresh instance restored from the registry continues
    // exactly like the uninterrupted run
    val nv2 = new graft.streaming.NoveltyStream(spark)
    nv2.restore(nv.registry)
    nv.close()
    assert(rowsOf(nv2.ingest(docs(6L -> t2), 0)) == Map(6L -> (2L, 0L, 0L)))
    assert(rowsOf(nv2.ingest(docs(7L -> "a b c d"), 1)) ==
      Map(7L -> (2L, 1L, 500000L))) // abc stale, bcd novel
    nv2.close()
  }

  test("SpanDedupStream under a real streaming query: foreachBatch hits ≡ batch hit set") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dupP = "alpha beta gamma delta epsilon zeta eta theta"
    val b1 = Seq((1L, s"$dupP unique1a unique1b"),
      (2L, "ten totally unrelated filler words occupy this document right here"))
    val b2 = Seq((10L, s"prefix10a prefix10b $dupP"))
    val b3 = Seq((20L, s"$dupP tail20a tail20b"))
    val input = MemoryStream[(Long, String)]
    val st = new graft.streaming.SpanDedupStream(spark)
    val emitted = mutable.ArrayBuffer.empty[(Long, Int)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        emitted ++= st.ingest(batch, bid).collect()
          .map(r => (r.getLong(0), r.getInt(1)))
        ()
      }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batchHits = Caches.scoped {
      val occ = graft.queries.CurationPack.spanOccurrences(all)
      val dup = occ.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("sh"))
      occ.join(dup, "sh").select(col("doc_id"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    }
    assert(emitted.size == emitted.toSet.size, s"duplicate emission: $emitted")
    assert(emitted.toSet == batchHits)
  }

  test("SpanDedupStream: hits exactly-once with retroactive emission; retry + restore hold") {
    import org.apache.spark.sql.DataFrame
    val dupP = "alpha beta gamma delta epsilon zeta eta theta" // one 8-gram
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    def hitsOf(df: DataFrame): Set[(Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b0 = Seq(1L -> s"$dupP unique1a unique1b",
      2L -> "ten totally unrelated filler words occupy this document right here")
    val b1 = Seq(10L -> s"prefix10a prefix10b $dupP")
    val b2 = Seq(20L -> s"$dupP tail20a tail20b")
    val st = new graft.streaming.SpanDedupStream(spark)
    // batch 0: the phrase has ONE doc — nothing is provably duplicated
    val h0 = hitsOf(st.ingest(docs(b0: _*), 0))
    assert(h0.isEmpty, s"premature emission: $h0")
    // batch 1 brings the second doc: the fresh occurrence AND the
    // retroactive batch-0 occurrence emit together, exactly here
    val h1 = hitsOf(st.ingest(docs(b1: _*), 1))
    assert(h1 == Set((1L, 0), (10L, 2)), s"retroactive emission wrong: $h1")
    // foreachBatch retry of batch 1: rollback makes it identical
    val h1retry = hitsOf(st.ingest(docs(b1: _*), 1))
    assert(h1retry == h1, s"retry not idempotent: $h1retry")
    // batch 2: the shingle is ALREADY duplicated — fresh hit only,
    // nothing re-emits
    val h2 = hitsOf(st.ingest(docs(b2: _*), 2))
    assert(h2 == Set((20L, 0)), s"re-emission after dup established: $h2")
    // streamed hits ≡ the batch operator's hit set on the full corpus
    val all = docs((b0 ++ b1 ++ b2): _*)
    val batchHits = Caches.scoped {
      val occ = graft.queries.CurationPack.spanOccurrences(all)
      val dup = occ.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("sh"))
      hitsOf(occ.join(dup, "sh").select(col("doc_id"), col("pos")))
    }
    assert((h0 ++ h1 ++ h2) == batchHits)
    // reconcile over streamed hits = the batch islands pass
    val spans = Caches.scoped {
      st.reconcileSpans((h0 ++ h1 ++ h2).toSeq.toDF("doc_id", "pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(spans == Set((1L, 0L, 7L), (10L, 2L, 9L), (20L, 0L, 7L)))
    // restart: restore from the occurrence log, then batch 2 behaves
    // exactly like the uninterrupted run
    val st2 = new graft.streaming.SpanDedupStream(spark)
    st2.restore(st.occurrenceLog.filter(col("doc_id") =!= 20L))
    assert(hitsOf(st2.ingest(docs(b2: _*), 0)) == h2)
  }

  test("session windows: stream emits exactly the closed batch sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamingSpec.Tick]
    val sessions = Streaming.sessionStream(input.toDF(), "30 minutes", "10 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream").start()
    try {
      // A: two events 10 min apart (one session), then a 90-min gap (new
      // session); B: one event. The hour-9 sentinel closes everything.
      val live = Seq(tick(0, 0, "A", 1.0, 1), tick(0, 5, "B", 5.0, 4),
        tick(0, 10, "A", 1.1, 2), tick(1, 40, "A", 2.0, 3))
      live.foreach { t => input.addData(t); q.processAllAvailable() }
      input.addData(tick(9, 0, "Z", 0.0, 9))
      q.processAllAvailable()
      val streamed = spark.table("sess_stream")
        .orderBy(col("symbol"), col("session_start")).collect().map(_.toSeq).toSeq
      val batch = Streaming.sessionStream(live.toDF(), "30 minutes", "10 minutes")
        .orderBy(col("symbol"), col("session_start")).collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.count(_.head == "A") == 2) // the 90-min gap split A
    } finally q.stop()
  }

  test("append-mode OHLC: a row later than the watermark is dropped, bar stays final") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamingSpec.Tick]
    val bars = Streaming.ohlcStream(input.toDF(), "1 hour", "30 minutes")
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName("ohlc_late").start()
    try {
      input.addData(tick(0, 10, "A", 1.0, 1), tick(3, 0, "A", 5.0, 2))
      q.processAllAvailable() // watermark 02:30 — hour 0 is closed
      input.addData(tick(4, 0, "A", 6.0, 3))
      q.processAllAvailable() // hour-0 bar emitted (single 1.0 trade)
      // 00:50 is now BELOW the watermark: dropped before aggregation,
      // the already-emitted hour-0 bar must not change or re-emit
      input.addData(tick(0, 50, "A", 99.0, 4), tick(9, 0, "Z", 1.0, 5))
      q.processAllAvailable()

      val rows = spark.table("ohlc_late").collect()
      val hour0 = rows.filter(_.getTimestamp(0).getTime == HourZero * 1000L)
      assert(hour0.length == 1, "late row must not re-open the closed bar")
      assert(hour0.head.getDouble(6) == 1.0) // close untouched by the 99.0
      assert(hour0.head.getLong(8) == 1L) // trades: the late row is NOT counted
      assert(!rows.exists(_.getDouble(4) == 99.0)) // high: dropped everywhere
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

  test("CurationStream: batched ingest + reconcile ≡ the batch corpus build") {
    import graft.queries.CurationPack
    import graft.ext.TextOps
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      // frozen LM stats + benchmark shingle set from the SAME corpus the
      // batch build scores, so reconcile() must equal q68 exactly
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (uni, bi) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
      val benchSh = TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      val cs = new graft.streaming.CurationStream(spark, uni, bi, benchSh)

      val ids = docs.select(col("doc_id")).as[Long].collect().sorted
      val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
      val batches = Seq(
        docs.filter(col("doc_id") <= cuts(0)),
        docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
        docs.filter(col("doc_id") > cuts(1)))
      val decisions = batches.zipWithIndex.flatMap { case (b, i) =>
        cs.ingest(b, i.toLong).collect()
      }
      assert(decisions.length == ids.length)

      val got = cs.reconcile().collect().map(_.toString).sorted
      val want = CurationPack.corpusBuild(spark, dir).collect().map(_.toString).sorted
      assert(want.nonEmpty && got.sameElements(want))

      // in-id-order arrival: every finally-kept doc was provisionally
      // kept (provisional drops always imply a smaller component member)
      val provisionalKeep = decisions.filter(_.getAs[Boolean]("keep"))
        .map(_.getAs[Long]("doc_id")).toSet
      val finalKeep = cs.reconcile().collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(finalKeep.subsetOf(provisionalKeep))

      // stateless bits match their batch gates doc-for-doc
      val repBatch = CurationPack.repetitionFilterFrom(docs)
        .filter(col("keep") === 1L).select(col("doc_id")).as[Long].collect().toSet
      val lmBatch = CurationPack.bigramLikelihoodFrom(docs)
        .filter(col("keep") === 1L).select(col("doc_id")).as[Long].collect().toSet
      val contamBatch = CurationPack.benchOverlaps(docs)
        .select(col("doc_id")).distinct().as[Long].collect().toSet
      assert(decisions.filter(_.getAs[Boolean]("keep_rep"))
        .map(_.getAs[Long]("doc_id")).toSet == repBatch)
      assert(decisions.filter(_.getAs[Boolean]("keep_lm"))
        .map(_.getAs[Long]("doc_id")).toSet == lmBatch)
      assert(decisions.filter(_.getAs[Boolean]("contaminated"))
        .map(_.getAs[Long]("doc_id")).toSet == contamBatch)

      // foreachBatch retry: replaying the LAST batch with the same id
      // must leave the reconciled corpus unchanged
      cs.ingest(batches.last, 2L)
      val afterRetry = cs.reconcile().collect().map(_.toString).sorted
      assert(afterRetry.sameElements(want))

      // restart: a fresh instance restored from the first two batches'
      // logs ingests the third and reconciles to the same corpus
      val cs2 = new graft.streaming.CurationStream(spark, uni, bi, benchSh)
      val twoBatchDocs = docs.filter(col("doc_id") <= cuts(1))
      val fps2 = twoBatchDocs.select(md5(col("text")).as("fp"), col("doc_id"))
      val pairs2 = graft.queries.TextPack.lshCandidatePairsFrom(
          twoBatchDocs.select(col("doc_id"), col("text")))
        .select(col("doc1"), col("doc2"))
      val docLog2 = decisions.filter(_.getAs[Long]("doc_id") <= cuts(1))
      val docLogDf = spark.createDataFrame(
        spark.sparkContext.parallelize(docLog2.map(r =>
          org.apache.spark.sql.Row(r.getAs[Long]("doc_id"), r.getAs[String]("source"),
            r.getAs[Long]("n_tokens"), r.getAs[Boolean]("is_bench"),
            r.getAs[Boolean]("keep_rep"), r.getAs[Boolean]("keep_lm"),
            r.getAs[Boolean]("contaminated")))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("n_tokens",
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField("is_bench",
            org.apache.spark.sql.types.BooleanType, nullable = false),
          org.apache.spark.sql.types.StructField("keep_rep",
            org.apache.spark.sql.types.BooleanType, nullable = false),
          org.apache.spark.sql.types.StructField("keep_lm",
            org.apache.spark.sql.types.BooleanType, nullable = false),
          org.apache.spark.sql.types.StructField("contaminated",
            org.apache.spark.sql.types.BooleanType, nullable = false))))
      cs2.restore(fps2, pairs2,  docLogDf,
        graft.queries.TextPack.bandedKeys(twoBatchDocs.select(col("doc_id"), col("text"))))
      cs2.ingest(batches.last, 0L)
      val afterRestore = cs2.reconcile().collect().map(_.toString).sorted
      assert(afterRestore.sameElements(want))
    }
  }

  test("CurationStream novelty floor: five-gate ingest + reconcile ≡ the batch novelty-composed build") {
    import graft.queries.{CurationPack, TextPack}
    import graft.ext.TextOps
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (uni, bi) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
      val benchSh = TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      val cs = new graft.streaming.CurationStream(spark, uni, bi, benchSh,
        noveltyFloorPpm = Some(500000L))

      val ids = docs.select(col("doc_id")).as[Long].collect().sorted
      val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
      val batches = Seq(
        docs.filter(col("doc_id") <= cuts(0)),
        docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
        docs.filter(col("doc_id") > cuts(1)))
      val decisions = batches.zipWithIndex.flatMap { case (b, i) =>
        cs.ingest(b, i.toLong).collect()
      }
      assert(decisions.length == ids.length)

      // the streamed per-doc keep_novel bits ARE the batch q151 panel's
      // floor verdicts (novelty is final at arrival under id-order)
      val panelKeep = TextPack.shingleNovelty(spark, dir)
        .filter(col("novelty_ppm") >= 500000L)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(decisions.filter(_.getAs[Boolean]("keep_novel"))
        .map(_.getAs[Long]("doc_id")).toSet == panelKeep)

      // reconcile ≡ the batch five-gate build, and the composed keep bit
      // is the AND of the four-gate keep and the novelty verdict
      val got = cs.reconcile().collect().map(_.toString).sorted
      val want = CurationPack.corpusBuildNovelty(spark, dir)
        .collect().map(_.toString).sorted
      assert(want.nonEmpty && got.sameElements(want))
      assert(decisions.filter(_.getAs[Boolean]("keep"))
        .forall(_.getAs[Boolean]("keep_novel")))
      // the floor binds: some docs fail only the novelty gate, and the
      // composed corpus differs from q68's (NOT a subset — the sqrt
      // quota cap re-ranks over the post-novelty distribution, so a
      // cap-dropped q68 doc can be cap-kept here)
      assert(panelKeep.size < ids.length)
      val fourGate = CurationPack.corpusBuild(spark, dir)
        .select(col("doc_id")).as[Long].collect().toSet
      val fiveGate = cs.reconcile().collect().map(_.getAs[Long]("doc_id")).toSet
      assert(fiveGate != fourGate)

      // foreachBatch retry of the last batch: registry + verdict log
      // roll back, the reconciled corpus is unchanged
      cs.ingest(batches.last, 2L)
      val afterRetry = cs.reconcile().collect().map(_.toString).sorted
      assert(afterRetry.sameElements(want))
      cs.close()
    }
  }

  test("AnnStream: streamed postings serve the batch index's answers; retry/restore hold") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val vecs = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), VectorOps.quantize(col("embedding"), 1000.0).as("qvec"))
      val codebook = VectorOps.kmeansCodebook(vecs, 8, 2)
      val want = VectorOps.ivfProbeTopK(vecs, codebook, q => q < 10, 5, 2)
        .orderBy(col("q_id"), col("rank")).collect().map(_.toString)

      val as = new graft.streaming.AnnStream(spark, codebook)
      val mx = vecs.agg(max(col("vec_id"))).head.getLong(0)
      as.ingest(vecs.filter(col("vec_id") <= mx / 2), 0L)
      as.ingest(vecs.filter(col("vec_id") > mx / 2), 1L)
      // foreachBatch retry of the last batch must not double the postings
      as.ingest(vecs.filter(col("vec_id") > mx / 2), 1L)
      def probed(s: graft.streaming.AnnStream) =
        s.probe(vecs.filter(col("vec_id") < 10), 5, 2)
          .orderBy(col("q_id"), col("rank")).collect().map(_.toString)
      assert(probed(as).sameElements(want))

      // restart: restore the first batch's postings, re-ingest the rest
      val as2 = new graft.streaming.AnnStream(spark, codebook)
      as2.restore(VectorOps.postingsOf(
        vecs.filter(col("vec_id") <= mx / 2)
          .withColumn("nrm", VectorOps.normInt(col("qvec"))), codebook))
      as2.ingest(vecs.filter(col("vec_id") > mx / 2), 0L)
      assert(probed(as2).sameElements(want))
    }
  }
}
