package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental corpus curation over micro-batches — the streaming form
  * of the q68 corpus build. Each micro-batch of (doc_id, source, text)
  * gets a PER-DOC decision row immediately; the corpus-global stages
  * reconcile in batch from accumulated keyed state, following the
  * pairs-stream/groups-reconcile contract of [[NearDupStream]].
  *
  * Gate-by-gate streaming posture:
  *
  *   - exact dedup — keyed state (the fingerprint log): a new doc is a
  *     provisional keep iff its md5 is unseen AND it is the smallest
  *     doc_id bearing that md5 within its own batch. With batches
  *     arriving in doc_id order this IS the batch rule (min doc per
  *     fingerprint); out of order, reconcile() re-elects the min.
  *   - near-dup — [[NearDupStream]]'s band log emits the batch's new
  *     candidate pairs; a doc is a provisional keep iff no emitted pair
  *     links it to an already-emitted doc (or a smaller id in its own
  *     batch). Transitive components that only form via LATER docs
  *     cannot be known yet — that is exactly why components reconcile.
  *   - repetition gate (q56) — per-doc, stateless: identical to batch.
  *   - LM-likelihood gate (q66) — scored against FROZEN (uni, bi)
  *     count tables ([[graft.queries.CurationPack.lmStats]]): the
  *     reference model is batch-trained, scoring is per-row (the
  *     standard streaming perplexity-filter shape). Bigrams unknown to
  *     the frozen stats contribute 0, deterministically.
  *   - decontamination (q67) — membership against a STATIC benchmark
  *     8-gram set (benchmarks are finite): per-doc, stateless.
  *   - domain cap (q58) — corpus-global by definition; reconcile-only.
  *
  * reconcile() recomposes the EXACT batch q68 output from the logs
  * without re-shingling anything: min-per-fingerprint from the fp log,
  * connected components over the accumulated pair log, stored per-doc
  * gate bits, then the sqrt quota cap — StreamingSpec proves it equals
  * `CurationPack.corpusBuild` row-for-row when the frozen stats/bench
  * set come from the same corpus.
  *
  * State scale: every log is O(corpus) on STORAGE (append-only tables
  * in production; the in-memory frames here stand in for them, lineage
  * truncated per batch), never executor memory. Retry of the same
  * batchId rolls back the failed attempt's appends first — same
  * idempotence contract as [[NearDupStream.ingest]].
  *
  * @param durableDir when set, ALL logs (bands/fp/pairs/docs, plus the
  *        novelty registry + verdict logs when the fifth gate is on)
  *        run in [[AppendLog]]'s durable mode under per-log
  *        subdirectories of this path, making the whole corpus build
  *        restart-survivable: a new instance on the same dir resumes
  *        the dead one's state, and replay detection is PER LOG (each
  *        manifest remembers its own last appended batchId), so even a
  *        crash BETWEEN log appends mid-ingest recovers exactly — the
  *        logs that already appended the replayed batch roll it back,
  *        the ones that never got to it simply append. SoakSpec's
  *        kill-and-restart case proves reconcile() ≡ the batch build
  *        across the restart. (Durable appendView degrades to a
  *        parquet write per log — durability costs the write; the
  *        default in-memory mode keeps the fused zero-copy views.)
  * @param noveltyFloorPpm optional FIFTH GATE — the marginal-content
  *        stopping criterion a corpus build reads q151's novelty curve
  *        for: keep a doc iff its shingle novelty (fraction of its
  *        distinct 3-gram fingerprints globally first-seen in it,
  *        [[NoveltyStream]]'s exact-at-arrival account) is at least
  *        this many ppm. Stale crawl tails — documents that mostly
  *        re-cover already-ingested content without being near-dups of
  *        any single earlier doc — fall below the floor and drop.
  *        When set, ingest additionally runs the batch through a
  *        [[NoveltyStream]] (the registry is the sixth keyed log) and
  *        appends the per-doc verdict rows to a novelty log;
  *        reconcile() composes `novelty_ppm >= floor` as one more
  *        doc-keyed semi-join before the quota cap. The default (None)
  *        leaves every plan and output of the four-gate build
  *        bit-identical to before the gate existed (q72's contract).
  */
final class CurationStream(spark: SparkSession,
    frozenUni: DataFrame, frozenBi: DataFrame, benchShingles: DataFrame,
    durableDir: Option[String] = None,
    noveltyFloorPpm: Option[Long] = None,
    logMaxSegments: Int = 32) {

  private def sub(name: String): Option[String] =
    durableDir.map(d => java.nio.file.Paths.get(d, name).toString)

  private val nd = new NearDupStream(spark, sub("bands"), logMaxSegments)
  private val bench = graft.Caches.persisted(
    benchShingles.select(col("sh")).distinct())

  private val fpLog = new AppendLog(spark, StructType(Seq(
    StructField("fp", StringType, nullable = true),
    StructField("doc_id", LongType, nullable = false))), sub("fp"),
    logMaxSegments)
  // carries n_shared_bands so [[NearDupStream.ingest]]'s returned
  // checkpoint can be appended by OWNERSHIP (no per-batch re-copy job);
  // reconcile() only reads doc1/doc2
  private val pairLog = new AppendLog(spark, StructType(Seq(
    StructField("doc1", LongType, nullable = false),
    StructField("doc2", LongType, nullable = false),
    StructField("n_shared_bands", LongType, nullable = false))), sub("pairs"),
    logMaxSegments)
  private val docLog = new AppendLog(spark, StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("n_tokens", LongType, nullable = true),
    StructField("is_bench", BooleanType, nullable = false),
    StructField("keep_rep", BooleanType, nullable = false),
    StructField("keep_lm", BooleanType, nullable = false),
    StructField("contaminated", BooleanType, nullable = false))), sub("docs"),
    logMaxSegments)

  // fifth gate (optional): the novelty registry rides a NoveltyStream
  // (its own keyed log + replay detection), and the per-doc verdict
  // rows it emits land in a novelty log for reconcile() — as a VIEW of
  // the batch's fused checkpoint (the verdicts materialize inside that
  // one job; the gate's only extra per-batch job is the registry's
  // new-fingerprint checkpoint)
  private val nv = noveltyFloorPpm.map(_ => new NoveltyStream(spark, sub("novelty"), logMaxSegments))
  private val novLog = noveltyFloorPpm.map(_ => new AppendLog(spark, StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_novel", LongType, nullable = false),
    StructField("novelty_ppm", LongType, nullable = true))), sub("novdocs"),
    logMaxSegments))

  /** Per-doc decisions for one micro-batch; appends all logs. Columns:
    * doc_id, source, n_tokens, is_bench, keep_exact, keep_neardup
    * (provisional), keep_rep, keep_lm, contaminated, keep (the AND).
    * Re-ingesting the same batchId first rolls back the failed
    * attempt's appends (foreachBatch retry contract).
    */
  def ingest(batchDocs: DataFrame, batchId: Long): DataFrame = graft.Caches.scoped {
    // PER-LOG replay detection (each log remembers its own last appended
    // batch — across a restart too, via the durable manifest): a retry
    // rolls back exactly the logs the failed attempt reached. The band
    // log's check lives in NearDupStream.ingestLazy.
    (Seq(fpLog, pairLog, docLog) ++ novLog).foreach { log =>
      if (log.restoredBatch.contains(batchId)) log.rollback()
    }
    val batch = graft.Caches.persisted(batchDocs
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text")))

    // fifth gate: the NoveltyStream handles its own registry append +
    // replay rollback (ONE checkpoint job — the batch's new
    // fingerprints, the gate's only per-batch exchange); the per-doc
    // verdict frame comes back LAZY and rides the fused tagged-union
    // checkpoint below, so verdicts materialize inside the batch's
    // existing job instead of their own.
    // OVERLAPPED with the band checkpoint below (guide §2.6): the two
    // eager per-batch jobs are independent (different logs, both read
    // only the persisted batch), so the driver submits them from a
    // second thread instead of serializing two scheduler round-trips;
    // values and the per-log replay/rollback contracts are untouched
    // (each log's mutations stay confined to the thread that owns its
    // ingestLazy call, and recovery already tolerates ANY partial-append
    // interleaving — the per-log manifests remember their own batch).
    val nvRowsF = nv.map(s => scala.concurrent.Future(
      s.ingestLazy(batch.select(col("doc_id"), col("text")), batchId))(
      scala.concurrent.ExecutionContext.global))

    // exact dedup: unseen fingerprint AND first (min doc_id) in batch.
    // One groupBy then one anti join — min-doc-per-fp of an unseen fp is
    // the same doc the row-wise form elects, without the per-row anti
    // join + doc_id semi-join round trip. No `.distinct()` on the log
    // side: an anti join ignores key multiplicity, and a per-batch
    // distinct over the ACCUMULATED log is O(corpus) work per batch.
    val fps = batch.select(md5(col("text")).as("fp"), col("doc_id"))
    val exactKeep = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .join(fpLog.cur.select(col("fp")), Seq("fp"), "left_anti")
      .select(col("doc_id"))

    // near-dup: the batch's new candidate pairs from the band log —
    // LAZY (ingestLazy appends the band log but leaves the pair frame
    // unmaterialized): the pairs materialize once, inside the fused
    // checkpoint below, instead of in their own per-batch job
    val pairs = nd.ingestLazy(batch.select(col("doc_id"), col("text")), batchId)
    // join the overlapped novelty job (it ran while the bands
    // checkpoint above was executing)
    val nvRows = nvRowsF.map(f => scala.concurrent.Await.result(
      f, scala.concurrent.duration.Duration.Inf))

    // stateless gates, the SAME code paths the batch operators verify —
    // one shared bigram explode for both, as in the batch build
    val t = batch.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bigrams = graft.Caches.persisted(
      graft.queries.CurationPack.bigramRows(batch))
    val rep = graft.queries.CurationPack.repetitionFilterOn(t, bigrams)
      .select(col("doc_id"), (col("keep") === 1L).as("keep_rep"))
    val lm = graft.queries.CurationPack.bigramLikelihoodScored(
        bigrams, frozenUni, frozenBi)
      .select(col("doc_id"), (col("keep") === 1L).as("keep_lm"))
    // bench docs trivially self-overlap; like the batch gate, only
    // TRAINING candidates can be contaminated
    val contam = graft.ext.TextOps.shingleRows(
        batch.filter(col("doc_id") % 101 =!= 0), "doc_id", "text", 8)
      .select(col("doc_id"), col("_s").as("sh"))
      .join(bench, Seq("sh"), "left_semi")
      .select(col("doc_id")) // groupBy below dedups

    // assemble the eager gate verdicts as ONE tagged union + one
    // doc-keyed aggregation + one join — not sequential left joins
    // each re-shuffling the batch on doc_id (2 exchanges instead of 5;
    // at 100 TB the batch is the corpus increment, so exchange count on
    // it is the ingest cost). The near-dup provisional bit is NOT here:
    // no log stores it (reconcile() re-derives components from the pair
    // log), only the RETURNED frame carries it — so it is derived below
    // as a view over the batch's own checkpointed pair rows instead of
    // riding the eager tree, which would otherwise plan the whole pairs
    // subtree a second time plus the members/nearDrop joins (round-19:
    // ~8 fewer stage/broadcast jobs per micro-batch, values identical).
    def tagged(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"), lit(tag).as("_g"))
    val bits = tagged(exactKeep, "exact")
      .union(tagged(rep.filter(col("keep_rep")), "rep"))
      .union(tagged(lm.filter(col("keep_lm")), "lm"))
      .union(tagged(contam, "ct"))
      .groupBy(col("doc_id"))
      .agg(
        max(col("_g") === "exact").as("keep_exact"),
        max(col("_g") === "rep").as("keep_rep"),
        max(col("_g") === "lm").as("keep_lm"),
        max(col("_g") === "ct").as("contaminated"))
    // `fp` rides the decisions rows so the fingerprint-log append
    // below is a column-select of an already-materialized frame instead
    // of its own md5-recompute job over the batch
    val decisionRows = batch
      .select(col("doc_id"), col("source"),
        graft.ext.TextOps.tokenCount(col("text")).as("n_tokens"),
        (col("doc_id") % 101 === 0).as("is_bench"),
        md5(col("text")).as("fp"))
      .join(bits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("is_bench"),
        col("fp"),
        coalesce(col("keep_exact"), lit(false)).as("keep_exact"),
        // a doc with no bigram rows is absent from the gates — the
        // batch build's left_semi drops it, so default to false
        coalesce(col("keep_rep"), lit(false)).as("keep_rep"),
        coalesce(col("keep_lm"), lit(false)).as("keep_lm"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))

    // FUSED multi-log append: the batch's pair rows and decision rows
    // materialize in ONE tagged-union checkpoint job instead of two
    // sequential ones (round-14: the only remaining per-batch jobs are
    // now the bands checkpoint and this union — the ProfileQ72 matrix
    // showed stage/exchange materialization, not scheduling, is the
    // per-batch constant, so halving the checkpoint jobs attacks the
    // constant directly). Every log segment is then a narrow
    // filter+projection VIEW of the one materialized frame.
    def nulls(pairs: (String, String)*): Seq[org.apache.spark.sql.Column] =
      pairs.map { case (n, t) => lit(null).cast(t).as(n) }
    val fusedBase = pairs
      .select(Seq(lit("p").as("_t"), col("doc1"), col("doc2"),
        col("n_shared_bands")) ++
        nulls("doc_id" -> "long", "source" -> "string", "n_tokens" -> "long",
          "is_bench" -> "boolean", "fp" -> "string", "keep_exact" -> "boolean",
          "keep_rep" -> "boolean", "keep_lm" -> "boolean",
          "contaminated" -> "boolean"): _*)
      .unionByName(decisionRows
        .select(Seq(lit("d").as("_t")) ++
          nulls("doc1" -> "long", "doc2" -> "long",
            "n_shared_bands" -> "long") ++
          Seq(col("doc_id"), col("source"), col("n_tokens"), col("is_bench"),
            col("fp"), col("keep_exact"), col("keep_rep"),
            col("keep_lm"), col("contaminated")): _*))
    // fifth gate on: the batch's lazy novelty verdicts join the union as
    // a third tag, so they materialize in THIS job — the four-gate
    // path's union shape (and therefore q72's plans) is untouched
    val fused = nvRows.fold(fusedBase) { r =>
      fusedBase
        .select(col("*") +: nulls("n_shingles" -> "long", "n_novel" -> "long",
          "novelty_ppm" -> "long"): _*)
        .unionByName(r.select(Seq(lit("n").as("_t")) ++
          nulls("doc1" -> "long", "doc2" -> "long", "n_shared_bands" -> "long") ++
          Seq(col("doc_id")) ++
          nulls("source" -> "string", "n_tokens" -> "long",
            "is_bench" -> "boolean", "fp" -> "string",
            "keep_exact" -> "boolean", "keep_rep" -> "boolean",
            "keep_lm" -> "boolean", "contaminated" -> "boolean") ++
          Seq(col("n_shingles"), col("n_novel"), col("novelty_ppm")): _*))
    }.localCheckpoint(eager = true)
    val dRows = fused.filter(col("_t") === "d")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("is_bench"),
        col("fp"), col("keep_exact"), col("keep_rep"),
        col("keep_lm"), col("contaminated"))
    fpLog.appendView(dRows.select(col("fp"), col("doc_id")), batchId)
    pairLog.appendView(fused.filter(col("_t") === "p")
      .select(col("doc1"), col("doc2"), col("n_shared_bands")), batchId)
    docLog.appendView(dRows.select(col("doc_id"), col("source"), col("n_tokens"),
      col("is_bench"), col("keep_rep"), col("keep_lm"), col("contaminated")), batchId)
    // the verdict rows are "n"-tagged slices of the fused checkpoint —
    // the novelty log's append is a view, like fp/docs
    val nvView = nvRows.map(_ => fused.filter(col("_t") === "n")
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        col("novelty_ppm")))
    nvView.foreach(v => novLog.get.appendView(v, batchId))

    // RETURNED frame only below this point — every input is a slice of
    // the batch's own fused checkpoint, so the frame is self-contained
    // (safe to materialize at any later time) and none of it costs a
    // per-batch job when the caller discards it.
    //
    // near-dup provisional bit, from the checkpointed pair rows: drop a
    // batch member linked to an earlier-emitted doc, or to a smaller id
    // within its own batch (in-id-order arrival this is the batch
    // min-member election; reconcile() is exact regardless).
    val pairsCk = fused.filter(col("_t") === "p")
      .select(col("doc1"), col("doc2"))
    val batchIds = dRows.select(col("doc_id"))
    val members = pairsCk.select(col("doc1").as("member"), col("doc2").as("other"))
      .union(pairsCk.select(col("doc2").as("member"), col("doc1").as("other")))
      .join(batchIds.select(col("doc_id").as("member")), Seq("member"), "left_semi")
    val nearDrop = members
      .join(batchIds.select(col("doc_id").as("other"),
        lit(true).as("_in_batch")), Seq("other"), "left")
      .filter(col("_in_batch").isNull || col("other") < col("member"))
      .select(col("member").as("doc_id"))
    val decisions = dRows.drop("fp")
      .join(nearDrop.distinct().withColumn("_nd", lit(true)),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("is_bench"),
        col("keep_exact"),
        (!coalesce(col("_nd"), lit(false))).as("keep_neardup"),
        col("keep_rep"), col("keep_lm"), col("contaminated"))
      .withColumn("keep",
        !col("is_bench") && col("keep_exact") && col("keep_neardup") &&
          col("keep_rep") && col("keep_lm") && !col("contaminated"))
    // with the fifth gate on, the returned per-doc row gains a trailing
    // keep_novel column (final at arrival — NoveltyStream's contract)
    // folded into keep; the join reads the batch's already-materialized
    // fused checkpoint, so the four-gate path's plans are untouched
    nvView.fold(decisions) { v =>
      decisions
        .join(v.select(col("doc_id"),
          (col("novelty_ppm") >= noveltyFloorPpm.get).as("keep_novel")),
          Seq("doc_id"), "left")
        .withColumn("keep_novel", coalesce(col("keep_novel"), lit(false)))
        .withColumn("keep", col("keep") && col("keep_novel"))
    }
  }

  /** Release every log's blocks (durable files stay). Call on shutdown. */
  def close(): Unit = {
    nd.close(); fpLog.close(); pairLog.close(); docLog.close()
    nv.foreach(_.close()); novLog.foreach(_.close())
  }

  /** The exact batch corpus build recomposed from accumulated state —
    * NOTHING is re-shingled: fingerprints, candidate pairs and gate
    * bits come from the logs; only the component collapse and the
    * corpus-global sqrt quota cap run here. Output schema == q68
    * (doc_id, source, n_tokens, cap_rank, quota).
    */
  def reconcile(): DataFrame = {
    val exactKeep = fpLog.cur.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val comps = graft.ext.GraphOps.connectedComponents(pairLog.cur, "doc1", "doc2")
    val nearDupDrop = comps.filter(col("node") =!= col("comp"))
      .select(col("node").as("doc_id"))
    val gated0 = docLog.cur
      .filter(!col("is_bench") && col("keep_rep") && col("keep_lm") &&
        !col("contaminated"))
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearDupDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_tokens"))
    // fifth gate: novelty floor from the stored verdict rows — one more
    // doc-keyed semi-join BEFORE the quota cap, so source quotas count
    // the post-novelty surviving distribution (the batch composition)
    val gated = novLog.fold(gated0)(log => gated0.join(
      log.cur.filter(col("novelty_ppm") >= noveltyFloorPpm.get)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi"))
    graft.queries.CurationPack.sqrtQuotaCap(gated)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cap_rank"),
        col("quota"))
      .orderBy(col("doc_id"))
  }

  /** Seed state after a query restart (production logs live on
    * storage; a recovered query restores them before ingesting) —
    * see [[NearDupStream.restore]].
    */
  def restore(fps: DataFrame, pairs: DataFrame, docs: DataFrame,
      bandLog: DataFrame): Unit = {
    // the stored pair log carries n_shared_bands (appendOwned takes the
    // ingest checkpoint verbatim); a restore from a bare edge list —
    // reconcile() only reads doc1/doc2 — backfills the column
    val pairsFull =
      if (pairs.columns.contains("n_shared_bands")) pairs
      else pairs.withColumn("n_shared_bands", lit(0L))
    fpLog.restore(fps); pairLog.restore(pairsFull); docLog.restore(docs)
    nd.restore(bandLog) // every restore resets its log's replay marker
  }
}
