package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Long-horizon micro-batch soaks for the
  * [[graft.streaming.AppendLog]]-backed streams (NearDupStream,
  * SpanDedupStream, AnnStream, CurationStream, NoveltyStream). The 3-batch
  * StreamingSpec cases never cross `AppendLog.maxSegments` (32), so log
  * COMPACTION — and the lifetime of checkpoint blocks it displaces —
  * was exercised by no test. These run 100+ batches (the compaction
  * boundary is crossed several times per log) with mid-stream
  * foreachBatch retries placed ON the boundary, and assert:
  *
  *   (a) correctness holds across compactions: streamed pairs/decisions
  *       still equal the batch operators exactly (this is the regression
  *       test for the r14 lazy-pairs race — `NearDupStream.ingestLazy`
  *       captured `bandLog.cur` lazily and `appendOwned`'s compaction
  *       then unpersisted the captured segments before the caller's
  *       fused checkpoint read them: "Checkpoint block not found" from
  *       ~batch 35 onward, fixed by deferring the displaced segments'
  *       unpersist to the NEXT append);
  *   (b) BlockManager storage PLATEAUS: view segments pin their parents'
  *       full-width fused checkpoints only until the fold copies the
  *       narrow projection out, so persistent-RDD count and stored bytes
  *       late in the soak must stay within a constant factor of the
  *       first post-compaction measurement — the empirical bound on the
  *       AppendLog retention question (VERDICT r14 #1).
  */
class SoakSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (persistent-RDD count, stored bytes) after nudging the
    * ContextCleaner: view-segment parents are reclaimed via weak refs,
    * so without a GC the measurement would count garbage awaiting
    * collection, not the retention bound under test. The cleanup is
    * ASYNC (cleaner thread drains a reference queue), so one gc + fixed
    * sleep can under-wait on a loaded machine and report still-pending
    * garbage as retention — poll until the count stabilizes across two
    * consecutive reads or a 5 s deadline passes (the deadline keeps a
    * genuinely-leaking run failing rather than spinning).
    */
  private def storageNow(): (Int, Long) = {
    def read(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.count(_.isCached), infos.map(_.memSize).sum)
    }
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    System.gc()
    Thread.sleep(200)
    var prev = read()
    var cur = prev
    var stable = false
    while (!stable && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
      cur = read()
      stable = cur == prev && cur._1 > 0 // two equal non-trivial reads
      if (cur._1 == 0 && prev._1 == 0) stable = true
      prev = cur
    }
    cur
  }

  private def docChunks(batchRows: Int): Vector[Seq[(Long, String)]] =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).grouped(batchRows).map(_.toSeq).toVector

  test("NearDupStream soak: 125 batches across compactions; pairs ≡ batch join; storage plateaus") {
    val chunks = docChunks(4) // 500 docs → 125 batches; compaction ~every 32
    val nd = new graft.streaming.NearDupStream(spark)
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val samples = mutable.ArrayBuffer.empty[(Int, (Int, Long))]
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val b = chunk.toDF("doc_id", "text")
      // foreachBatch retry ON the compaction boundary and mid-run: the
      // first attempt "fails downstream", the replay must roll back its
      // append and re-emit identical pairs
      if (i == 33 || i == 70) {
        val first = nd.ingest(b, i.toLong).collect().toSet
        val retry = nd.ingest(b, i.toLong).collect().toSet
        assert(first == retry, s"retry at batch $i not idempotent")
        emitted ++= retry.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      } else {
        emitted ++= nd.ingest(b, i.toLong).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      if (i == 40 || i == 80 || i == chunks.length - 1)
        samples += (i + 1) * 4 -> storageNow() // keyed by docs ingested
    }
    // exactly-once emission with the batch join's n_shared_bands,
    // across every compaction
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchPairs = Caches.scoped {
      graft.queries.TextPack.lshCandidatePairsFrom(all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a pair was emitted twice")
    assert(emitted.toSet == batchPairs)
    // retention bound: the band log's STATE is O(docs) by design (near-
    // dup candidates never expire), so stored bytes grow linearly with
    // the corpus — the bound under test is the OVERHEAD on top of that
    // irreducible state: (1) per-doc bytes must not grow (no super-
    // linear retention — e.g. un-reclaimed displaced segments would
    // double it every compaction cycle); (2) cached-RDD count stays
    // within one compaction cycle's segment width (maxSegments + the
    // in-flight tail), never "one leaked RDD per batch".
    info("storage (docs→(rdds,bytes)): " +
      samples.map { case (n, (c, m)) => s"$n→($c,$m)" }.mkString(" "))
    val (d0, (c0, m0)) = samples.head
    val (dEnd, (cEnd, mEnd)) = samples.last
    val perDoc0 = m0.toDouble / d0
    val perDocEnd = mEnd.toDouble / dEnd
    assert(perDocEnd <= 2.0 * perDoc0,
      s"per-doc stored bytes grew $perDoc0 → $perDocEnd: retention is super-linear")
    assert(samples.forall(_._2._1 <= 48),
      s"cached-RDD count ${samples.map(_._2._1)} exceeds one compaction cycle (~33 segments)")
  }

  test("NearDupStream durable kill-and-restart: stream ≡ batch across a driver restart, incl. the replayed batch") {
    // the restart-survivability proof for the DURABLE AppendLog: run
    // half the stream, throw the instance away (its in-memory state —
    // checkpoints, lastBatchId — dies with it, exactly like a driver
    // crash), construct a NEW instance on the same directory, replay
    // the last batch (Structured Streaming re-delivers the one batch
    // whose commit is in doubt after recovery), finish the stream, and
    // require the union of BOTH sessions' emissions to equal the batch
    // join exactly — no lost cross-restart candidate pair, no
    // double-emission from the replay.
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_durable").toString
    val chunks = docChunks(8) // 500 docs → 63 batches; compaction ~b33 in session 2
    val killAt = 31
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long)]

    val s1 = new graft.streaming.NearDupStream(spark, durableDir = Some(dir))
    var lastPairsS1: Set[(Long, Long, Long)] = Set.empty
    (0 until killAt).foreach { i =>
      val got = s1.ingest(chunks(i).toDF("doc_id", "text"), i.toLong).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      if (i < killAt - 1) emitted ++= got else lastPairsS1 = got.toSet
    }
    s1.close() // the dead session's executor blocks are gone; disk is not

    val s2 = new graft.streaming.NearDupStream(spark, durableDir = Some(dir))
    // recovery replays batch killAt-1: its append must roll back from
    // the MANIFEST (s2 never saw s1's lastBatchId in memory) and the
    // re-emission must match the dead session's bit for bit
    val replayed = s2.ingest(chunks(killAt - 1).toDF("doc_id", "text"),
        (killAt - 1).toLong).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(replayed == lastPairsS1,
      "replay after restart diverged from the dead session's emission")
    emitted ++= replayed
    (killAt until chunks.length).foreach { i =>
      emitted ++= s2.ingest(chunks(i).toDF("doc_id", "text"), i.toLong).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchPairs = Caches.scoped {
      graft.queries.TextPack.lshCandidatePairsFrom(all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a pair was emitted twice across the restart")
    assert(emitted.toSet == batchPairs)
    s2.close()
  }

  test("NearDupStream tight-compaction soak (maxSegments=4): ~12 compactions with boundary retries; pairs ≡ batch join") {
    // maxSegments=32 gives the 125-batch soak ~3 compactions; this one
    // compacts every ~4 appends (50 batches → ~12 folds), with retries
    // pinned where a fold, a rollback, and the deferred reap interleave
    // hardest — immediately after the compaction threshold crossings.
    val chunks = docChunks(10) // 500 docs → 50 batches
    val nd = new graft.streaming.NearDupStream(spark, logMaxSegments = 4)
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val b = chunk.toDF("doc_id", "text")
      if (i == 6 || i == 7 || i == 21 || i == 38) {
        val first = nd.ingest(b, i.toLong).collect().toSet
        val retry = nd.ingest(b, i.toLong).collect().toSet
        assert(first == retry, s"retry at batch $i not idempotent")
        emitted ++= retry.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      } else {
        emitted ++= nd.ingest(b, i.toLong).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
    }
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchPairs = Caches.scoped {
      graft.queries.TextPack.lshCandidatePairsFrom(all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a pair was emitted twice")
    assert(emitted.toSet == batchPairs)
    nd.close()
  }

  test("NearDupStream DURABLE tight-compaction soak (maxSegments=4): file reap/rollback/manifest interleaving; segment dirs bounded; pairs ≡ batch") {
    // the r16 durable soaks cross compaction at default width only; this
    // is the in-memory tight-compaction soak re-run on the parquet+
    // manifest backend, so every ~4 appends a fold REWRITES the log to
    // disk, swaps the manifest, and the displaced segment FILES must be
    // reaped one append later — with retries pinned right after the
    // compaction threshold crossings, where a fold, a manifest-first
    // rollback, and the deferred file reap interleave hardest.
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_dur_tight").toString
    def segDirs = new java.io.File(dir).list().count(_.startsWith("seg-"))
    val chunks = docChunks(10) // 500 docs → 50 batches → ~12 folds
    val nd = new graft.streaming.NearDupStream(spark,
      durableDir = Some(dir), logMaxSegments = 4)
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var maxSegDirs = 0
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val b = chunk.toDF("doc_id", "text")
      if (i == 6 || i == 7 || i == 21 || i == 38) {
        val first = nd.ingest(b, i.toLong).collect().toSet
        val retry = nd.ingest(b, i.toLong).collect().toSet
        assert(first == retry, s"retry at batch $i not idempotent")
        emitted ++= retry.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      } else {
        emitted ++= nd.ingest(b, i.toLong).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      maxSegDirs = math.max(maxSegDirs, segDirs)
    }
    // on-disk bound: ≤ maxSegments+1 committed + 1 pending referenced,
    // plus ≤ maxSegments+1 displaced files awaiting the one-append-
    // deferred reap, plus the in-flight fold — NEVER one dir per batch
    // (which would be 50+ here): compaction's file reclamation works
    assert(maxSegDirs <= 3 * 4 + 2, s"segment dirs grew to $maxSegDirs — displaced files not reaped")
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchPairs = Caches.scoped {
      graft.queries.TextPack.lshCandidatePairsFrom(all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a pair was emitted twice")
    assert(emitted.toSet == batchPairs)
    // the durable point: a fresh instance on the same dir recovers the
    // full band state across all those folds/rollbacks
    nd.close()
    val nd2 = new graft.streaming.NearDupStream(spark,
      durableDir = Some(dir), logMaxSegments = 4)
    assert(nd2.ingest(Seq((100000L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text"),
      chunks.length.toLong).collect() != null) // appends fine post-recovery
    nd2.close()
  }

  test("stream drives release state deterministically: repeated q72 executions leave flat immediate RDD storage (no GC)") {
    // the r16 drives left each execution's final log generation to the
    // ContextCleaner (weak-ref GC); with materialize-then-close() the
    // OWNED blocks (band checkpoints, compaction folds) are unpersisted
    // synchronously, so the immediate post-run persisted-RDD count —
    // measured WITHOUT any GC nudge — grows only by the per-run
    // non-owned leftovers, never by the log generation itself.
    //
    // Budget composition (the 6-block bound): a q72 drive's non-owned
    // per-run leftovers are the three fused tagged-union checkpoints
    // (one per micro-batch — the logs hold only VIEWS of them, nobody
    // owns them) + the reconcile result checkpoint = 4 RDDs; the
    // log generation close() releases synchronously is ~3 band
    // checkpoints + compaction folds + the final fp/pair/doc segments
    // (~10+), so a close() regression reads well above the budget.
    // Measurement determinism: the ContextCleaner reclaims the
    // non-owned leftovers at UNPREDICTABLE points (async weak-ref
    // drain), which can deflate one sample and inflate the next delta
    // — a deliberate GC-settle before each sample would be worse,
    // because a settled measurement can no longer distinguish
    // synchronous close() from cleaner-eventually-got-it (the leak
    // under test is also unreferenced, so it also settles away). So:
    // four runs, and the MIN of the three per-run deltas — cleaner
    // interference can only shrink a sample (inflating ONE delta);
    // only a real leak raises every delta.
    def persistedNow = spark.sparkContext.getRDDStorageInfo.count(_.isCached)
    val counts = (1 to 4).map { _ =>
      Caches.scoped {
        graft.queries.CurationPack.streamReconcile(spark, "/root/testdata/sf0.001")
          .queryExecution.toRdd.count()
      }
      persistedNow
    }
    info(s"post-run persisted RDD counts (no GC): ${counts.mkString(", ")}")
    // MEDIAN of the deltas (ADVICE r18): min can mask a real leak — one
    // ContextCleaner reclaim between two samples deflates a single delta
    // and min picks it, so a steady leak L passes whenever one reclaim R
    // has L - R <= bound; the median is robust to a single cleaner event
    // while still rejecting a leak that raises every delta.
    val deltas = counts.sliding(2).map(w => w(1) - w(0)).toSeq.sorted
    val perRun = deltas(deltas.length / 2)
    assert(perRun <= 6,
      s"per-execution immediate RDD-storage growth $perRun (median over " +
        s"${counts.mkString(",")}) — a stream drive is leaking its log " +
        "generation to weak-reference GC again")
  }

  test("SpanDedupStream soak: 100 batches across compactions; hits exactly-once ≡ batch hit set; storage bounded") {
    val chunks = docChunks(5) // 100 batches; occLog compaction ~b34, ~b67
    val st = new graft.streaming.SpanDedupStream(spark)
    val emitted = mutable.ArrayBuffer.empty[(Long, Int)]
    val samples = mutable.ArrayBuffer.empty[(Int, (Int, Long))]
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val b = chunk.toDF("doc_id", "text")
      if (i == 34 || i == 70) {
        val first = st.ingest(b, i.toLong).collect().toSet
        val retry = st.ingest(b, i.toLong).collect().toSet
        assert(first == retry, s"retry at batch $i not idempotent")
        emitted ++= retry.map(r => (r.getLong(0), r.getInt(1)))
      } else {
        emitted ++= st.ingest(b, i.toLong).collect()
          .map(r => (r.getLong(0), r.getInt(1)))
      }
      if (i == 40 || i == chunks.length - 1)
        samples += (i + 1) * 5 -> storageNow()
    }
    // exactly-once (incl. retroactive emissions) ≡ the batch duplicated-
    // occurrence set, across every compaction
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchHits = Caches.scoped {
      val occ = graft.queries.CurationPack.spanOccurrences(all)
      val dup = occ.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("sh"))
      occ.join(dup, "sh").select(col("doc_id"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a hit was emitted twice")
    assert(emitted.toSet == batchHits)
    info("storage (docs→(rdds,bytes)): " +
      samples.map { case (n, (c, m)) => s"$n→($c,$m)" }.mkString(" "))
    val (d0, (_, m0)) = samples.head
    val (dEnd, (_, mEnd)) = samples.last
    assert(mEnd.toDouble / dEnd <= 2.0 * (m0.toDouble / d0),
      s"per-doc stored bytes grew ${m0 / d0} → ${mEnd / dEnd}: retention is super-linear")
    assert(samples.forall(_._2._1 <= 48),
      s"cached-RDD count ${samples.map(_._2._1)} exceeds one compaction cycle")
  }

  test("SpanDedupStream durable kill-and-restart: hits exactly-once ≡ batch hit set across a restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sp_durable").toString
    val chunks = docChunks(10) // 50 batches
    val killAt = 24
    val emitted = mutable.ArrayBuffer.empty[(Long, Int)]
    val s1 = new graft.streaming.SpanDedupStream(spark, durableDir = Some(dir))
    var last: Set[(Long, Int)] = Set.empty
    (0 until killAt).foreach { i =>
      val got = s1.ingest(chunks(i).toDF("doc_id", "text"), i.toLong).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      if (i < killAt - 1) emitted ++= got else last = got.toSet
    }
    s1.close()
    val s2 = new graft.streaming.SpanDedupStream(spark, durableDir = Some(dir))
    val replayed = s2.ingest(chunks(killAt - 1).toDF("doc_id", "text"),
        (killAt - 1).toLong).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(replayed == last, "replayed hits diverged from the dead session's")
    emitted ++= replayed
    (killAt until chunks.length).foreach { i =>
      emitted ++= s2.ingest(chunks(i).toDF("doc_id", "text"), i.toLong).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
    }
    val all = chunks.flatten.toDF("doc_id", "text")
    val batchHits = Caches.scoped {
      val occ = graft.queries.CurationPack.spanOccurrences(all)
      val dup = occ.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("sh"))
      occ.join(dup, "sh").select(col("doc_id"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a hit was emitted twice across the restart")
    assert(emitted.toSet == batchHits)
    s2.close()
  }

  test("NoveltyStream soak: 125 batches across compactions; rows ≡ batch panel; storage plateaus") {
    val chunks = docChunks(4) // 500 docs → 125 batches; compaction ~every 32
    val nv = new graft.streaming.NoveltyStream(spark)
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val samples = mutable.ArrayBuffer.empty[(Int, (Int, Long))]
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val b = chunk.toDF("doc_id", "text")
      // foreachBatch retry ON the compaction boundary and mid-run: the
      // replay must roll back the registry append or every replayed
      // doc's fingerprints read as stale
      if (i == 33 || i == 70) {
        val first = nv.ingest(b, i.toLong).collect().toSet
        val retry = nv.ingest(b, i.toLong).collect().toSet
        assert(first == retry, s"retry at batch $i not idempotent")
        emitted ++= retry.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      } else {
        emitted ++= nv.ingest(b, i.toLong).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
      if (i == 40 || i == 80 || i == chunks.length - 1)
        samples += (i + 1) * 4 -> storageNow() // keyed by docs ingested
    }
    nv.close()
    val batch = Caches.scoped {
      graft.queries.TextPack.shingleNovelty(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a doc's row was emitted twice")
    assert(emitted.toSet == batch, "soak union diverged from the batch novelty panel")
    // retention bound: registry state is O(distinct fingerprints) by
    // design; the bound under test is the overhead on top — per-doc
    // stored bytes must not grow across compaction cycles and the
    // cached-RDD count stays within one cycle's segment width
    info("storage (docs→(rdds,bytes)): " +
      samples.map { case (n, (c, m)) => s"$n→($c,$m)" }.mkString(" "))
    val (d0, (_, m0)) = samples.head
    val (dEnd, (_, mEnd)) = samples.last
    assert(mEnd.toDouble / dEnd <= 2.0 * (m0.toDouble / d0),
      s"per-doc stored bytes grew ${m0 / d0} → ${mEnd / dEnd}: retention is super-linear")
    assert(samples.forall(_._2._1 <= 48),
      s"cached-RDD count ${samples.map(_._2._1)} exceeds one compaction cycle")
  }

  test("NoveltyStream durable kill-and-restart: streamed rows exactly-once ≡ batch panel across a restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nv_durable").toString
    val chunks = docChunks(10) // 50 doc_id-ordered batches
    val killAt = 24
    val emitted = mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    def rowsOf(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val s1 = new graft.streaming.NoveltyStream(spark, durableDir = Some(dir))
    var last: Set[(Long, Long, Long, Long)] = Set.empty
    (0 until killAt).foreach { i =>
      val got = rowsOf(s1.ingest(chunks(i).toDF("doc_id", "text"), i.toLong))
      if (i < killAt - 1) emitted ++= got else last = got.toSet
    }
    s1.close()
    val s2 = new graft.streaming.NoveltyStream(spark, durableDir = Some(dir))
    val replayed = rowsOf(s2.ingest(chunks(killAt - 1).toDF("doc_id", "text"),
      (killAt - 1).toLong)).toSet
    assert(replayed == last, "replayed novelty rows diverged from the dead session's")
    emitted ++= replayed
    (killAt until chunks.length).foreach { i =>
      emitted ++= rowsOf(s2.ingest(chunks(i).toDF("doc_id", "text"), i.toLong))
    }
    s2.close()
    val batch = Caches.scoped {
      graft.queries.TextPack.shingleNovelty(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(emitted.size == emitted.toSet.size, "a doc's row was emitted twice across the restart")
    assert(emitted.toSet == batch, "stream union diverged from the batch novelty panel")
  }

  test("AnnStream durable kill-and-restart: probe over recovered postings ≡ batch IVF index") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    val state = java.nio.file.Files.createTempDirectory("graft_ann_durable").toString
    Caches.scoped {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id"), VectorOps.quantize(col("embedding"), 1000.0).as("qvec"))
      val codebook = VectorOps.kmeansCodebook(vecs, 8, 2)
      val want = VectorOps.ivfProbeTopK(vecs, codebook, q => q < 10, 5, 2)
        .orderBy(col("q_id"), col("rank")).collect().map(_.toString)
      val ids = vecs.select(col("vec_id")).as[Long].collect().sorted
      val chunks = ids.grouped(20).map(_.toSeq).toVector // 25 batches
      val killAt = 13
      val s1 = new graft.streaming.AnnStream(spark, codebook, Some(state))
      (0 until killAt).foreach { i =>
        s1.ingest(vecs.filter(col("vec_id").between(chunks(i).head, chunks(i).last)), i.toLong)
      }
      s1.close()
      val s2 = new graft.streaming.AnnStream(spark, codebook, Some(state))
      (killAt - 1 until chunks.length).foreach { i => // killAt-1 = the replay
        s2.ingest(vecs.filter(col("vec_id").between(chunks(i).head, chunks(i).last)), i.toLong)
      }
      val got = s2.probe(vecs.filter(col("vec_id") < 10), 5, 2)
        .orderBy(col("q_id"), col("rank")).collect().map(_.toString)
      assert(got.sameElements(want),
        "probe over restart-recovered postings diverged from the batch index")
      s2.close()
    }
  }

  test("AnnStream soak: 100 ingest batches across compactions; probe ≡ batch IVF index; storage bounded") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id"), VectorOps.quantize(col("embedding"), 1000.0).as("qvec"))
      val codebook = VectorOps.kmeansCodebook(vecs, 8, 2)
      val want = VectorOps.ivfProbeTopK(vecs, codebook, q => q < 10, 5, 2)
        .orderBy(col("q_id"), col("rank")).collect().map(_.toString)

      val as = new graft.streaming.AnnStream(spark, codebook)
      val ids = vecs.select(col("vec_id")).as[Long].collect().sorted
      val chunks = ids.grouped(5).map(_.toSeq).toVector // 100 batches
      val samples = mutable.ArrayBuffer.empty[(Int, (Int, Long))]
      chunks.zipWithIndex.foreach { case (c, i) =>
        val b = vecs.filter(col("vec_id").between(c.head, c.last))
        if (i == 34 || i == 70) as.ingest(b, i.toLong) // retry path
        as.ingest(b, i.toLong)
        if (i == 40 || i == chunks.length - 1)
          samples += (i + 1) * 5 -> storageNow()
      }
      val got = as.probe(vecs.filter(col("vec_id") < 10), 5, 2)
        .orderBy(col("q_id"), col("rank")).collect().map(_.toString)
      assert(got.sameElements(want),
        "probe over 100-batch streamed postings diverged from the batch index")
      info("storage (vecs→(rdds,bytes)): " +
        samples.map { case (n, (c, m)) => s"$n→($c,$m)" }.mkString(" "))
      val (d0, (_, m0)) = samples.head
      val (dEnd, (_, mEnd)) = samples.last
      assert(mEnd.toDouble / dEnd <= 2.0 * (m0.toDouble / d0),
        s"per-vec stored bytes grew ${m0 / d0} → ${mEnd / dEnd}: retention is super-linear")
      assert(samples.forall(_._2._1 <= 48),
        s"cached-RDD count ${samples.map(_._2._1)} exceeds one compaction cycle")
    }
  }

  test("CurationStream durable kill-and-restart: reconcile ≡ batch corpus build across a driver restart") {
    // all four logs (bands/fp/pairs/docs) durable under one dir; the
    // restart happens mid-stream and the replayed batch's rollback is
    // driven entirely from the manifests (per-log replay detection) —
    // the full corpus build, not just pair emission, survives the kill
    import graft.queries.CurationPack
    import graft.ext.TextOps
    val dir = "/root/testdata/sf0.001"
    val state = java.nio.file.Files.createTempDirectory("graft_cs_durable").toString
    Caches.scoped {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (uni, bi) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
      val benchSh = TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      val ids = docs.select(col("doc_id")).as[Long].collect().sorted
      val chunks = ids.grouped(10).map(_.toSeq).toVector // 50 batches
      val killAt = 26 // session 2 still crosses a band-log compaction

      val s1 = new graft.streaming.CurationStream(spark, uni, bi, benchSh, Some(state))
      var lastDecisions: Set[String] = Set.empty
      (0 until killAt).foreach { i =>
        val b = docs.filter(col("doc_id").between(chunks(i).head, chunks(i).last))
        val got = s1.ingest(b, i.toLong).collect().map(_.toString).toSet
        if (i == killAt - 1) lastDecisions = got
      }
      s1.close() // driver dies: executor blocks gone, disk state not

      val s2 = new graft.streaming.CurationStream(spark, uni, bi, benchSh, Some(state))
      val replayBatch = docs.filter(
        col("doc_id").between(chunks(killAt - 1).head, chunks(killAt - 1).last))
      val replayed = s2.ingest(replayBatch, (killAt - 1).toLong)
        .collect().map(_.toString).toSet
      assert(replayed == lastDecisions,
        "replayed batch's decisions diverged from the dead session's")
      (killAt until chunks.length).foreach { i =>
        val b = docs.filter(col("doc_id").between(chunks(i).head, chunks(i).last))
        s2.ingest(b, i.toLong).count()
      }
      val got = s2.reconcile().collect().map(_.toString).sorted
      val want = CurationPack.corpusBuild(spark, dir).collect().map(_.toString).sorted
      assert(want.nonEmpty && got.sameElements(want))
      s2.close()
    }
  }

  test("CurationStream soak: 100 batches with boundary retries; reconcile ≡ batch corpus build; storage plateaus") {
    import graft.queries.CurationPack
    import graft.ext.TextOps
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (uni, bi) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
      val benchSh = TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      val cs = new graft.streaming.CurationStream(spark, uni, bi, benchSh)

      val rows = docs.select(col("doc_id")).as[Long].collect().sorted
      val chunks = rows.grouped(5).map(_.toSeq).toVector // 100 batches
      val nDecisions = mutable.ArrayBuffer.empty[Long]
      val samples = mutable.ArrayBuffer.empty[(Int, (Int, Long))]
      chunks.zipWithIndex.foreach { case (ids, i) =>
        val b = docs.filter(col("doc_id").between(ids.head, ids.last))
        if (i == 34 || i == 72) cs.ingest(b, i.toLong).collect() // retry
        nDecisions += cs.ingest(b, i.toLong).count()
        if (i == 45 || i == chunks.length - 1)
          samples += (i + 1) * 5 -> storageNow() // keyed by docs ingested
      }
      assert(nDecisions.sum == rows.length)

      val got = cs.reconcile().collect().map(_.toString).sorted
      val want = CurationPack.corpusBuild(spark, dir).collect().map(_.toString).sorted
      assert(want.nonEmpty && got.sameElements(want))

      // four logs (fp/pair/doc views + band log), all O(docs) state by
      // design — same overhead bounds as above: per-doc bytes constant
      // (views pin their full-width fused parents only until the fold
      // copies the narrow projection out — a constant factor, not a
      // growing one), RDD count within the logs' combined segment width.
      info("storage (docs→(rdds,bytes)): " +
        samples.map { case (n, (c, m)) => s"$n→($c,$m)" }.mkString(" "))
      val (d0, (_, m0)) = samples.head
      val (dEnd, (_, mEnd)) = samples.last
      assert(mEnd.toDouble / dEnd <= 2.0 * (m0.toDouble / d0),
        s"per-doc stored bytes grew ${m0 / d0} → ${mEnd / dEnd}: retention is super-linear")
      assert(samples.forall(_._2._1 <= 160),
        s"cached-RDD count ${samples.map(_._2._1)} exceeds the four logs' segment width")
    }
  }

  /** Recursive copy (for snapshotting a durable log dir mid-stream). */
  private def copyTree(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteTree(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
  }

  test("CurationStream FIVE-GATE durable kill-and-restart (all six logs, maxSegments=4): mid-ingest partial-append crash; reconcile ≡ corpusBuildNovelty") {
    // The five-gate configuration runs SIX durable logs under one dir
    // (bands / fp / pairs / docs / novelty registry / novdocs verdicts).
    // Ingest appends the novelty registry CONCURRENTLY with the bands
    // checkpoint (the two are overlapped on a second thread), then
    // fp/pairs/docs/novdocs in order — so the worst crash is BETWEEN
    // log appends mid-batch: some manifests already name the batch,
    // the rest never saw it, in ANY interleaving (recovery is per-log,
    // so every pattern is legal). ONE such state is constructed
    // LITERALLY here
    // (AppendLogSpec's method, at stream scope): snapshot the last
    // three logs in append order (docs/novelty/novdocs) just before
    // the final pre-kill batch, ingest it, kill the instance, then
    // splice the snapshots back — on disk, bands/fp/pairs have
    // appended the batch and docs/novelty/novdocs have not, exactly as
    // if the driver died after the pairs append. Recovery must be PER
    // LOG: on the
    // replayed batch the three ahead-logs roll back from their own
    // manifests while the three behind-logs simply append, and the
    // tight maxSegments=4 keeps compactions crossing the kill on both
    // sides. The final reconcile must equal the batch five-gate build.
    import graft.queries.CurationPack
    import graft.ext.TextOps
    val dir = "/root/testdata/sf0.001"
    val state = java.nio.file.Files.createTempDirectory("graft_cs5g_durable").toString
    val snap = java.nio.file.Files.createTempDirectory("graft_cs5g_snap").toString
    val behindLogs = Seq("docs", "novelty", "novdocs") // appended last, in order
    Caches.scoped {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (uni, bi) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
      val benchSh = TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      val ids = docs.select(col("doc_id")).as[Long].collect().sorted
      val chunks = ids.grouped(10).map(_.toSeq).toVector // 50 batches
      val killAt = 26 // both sessions cross several maxSegments=4 compactions

      def mkStream() = new graft.streaming.CurationStream(spark, uni, bi,
        benchSh, Some(state),
        noveltyFloorPpm = Some(CurationPack.NoveltyFloorPpm), logMaxSegments = 4)
      def batchOf(i: Int) =
        docs.filter(col("doc_id").between(chunks(i).head, chunks(i).last))

      val s1 = mkStream()
      var lastDecisions: Set[String] = Set.empty
      (0 until killAt).foreach { i =>
        if (i == killAt - 1) // pre-batch state of the logs the crash won't reach
          behindLogs.foreach(l => copyTree(s"$state/$l", s"$snap/$l"))
        val got = s1.ingest(batchOf(i), i.toLong).collect().map(_.toString).toSet
        if (i == killAt - 1) lastDecisions = got
      }
      s1.close() // driver dies; disk state stays

      // splice: bands/fp/pairs keep batch 25, docs/novelty/novdocs lose it
      behindLogs.foreach { l =>
        deleteTree(s"$state/$l"); copyTree(s"$snap/$l", s"$state/$l")
      }

      val s2 = mkStream()
      val replayed = s2.ingest(batchOf(killAt - 1), (killAt - 1).toLong)
        .collect().map(_.toString).toSet
      assert(replayed == lastDecisions,
        "replayed batch's decisions diverged from the dead session's")
      (killAt until chunks.length).foreach { i =>
        s2.ingest(batchOf(i), i.toLong).count()
      }
      val got = s2.reconcile().collect().map(_.toString).sorted
      val want = CurationPack.corpusBuildNovelty(spark, dir)
        .collect().map(_.toString).sorted
      assert(want.nonEmpty && got.sameElements(want))
      s2.close()
    }
    deleteTree(state); deleteTree(snap)
  }
}
