package graft.queries

import graft.Tables
import graft.ext.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity-search query pack over the `embeddings` table.
  * Vectors are quantized to int64 (×1000) so dot products and norms are
  * exact integers and cosine is a single deterministic IEEE expression —
  * the DuckDB oracle reproduces every value bit-for-bit.
  */
object VectorPack {

  private val Scale = 1000.0
  private val TopK = 5
  private val Threshold = 0.35
  private val Dims = 64

  /** SRP bucket sizing target: ~this many vectors per bucket, so the
    * within-bucket candidate join stays bounded as the corpus grows (the
    * plane count is DERIVED from the corpus size, never pinned).
    */
  private[graft] val TargetBucket = 256L

  /** The sizing rule q23 uses, driver-side: one metadata-count of the
    * corpus → plane count. The oracle derives the identical count in SQL
    * (same integer formulation), so both engines bucket identically.
    */
  private[graft] def lshPlanes(spark: SparkSession, dir: String): Int =
    VectorOps.planesForCorpus(Tables.embeddings(spark, dir).count(), TargetBucket)

  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), VectorOps.quantize(col("embedding"), Scale).as("qvec"))

  /** Brute-force cosine top-k for the first 10 vectors as queries. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val vecs = quantized(spark, dir)
    val queries = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_vec"))
    val corpus = vecs.select(col("vec_id").as("c_id"), col("qvec").as("c_vec"))
    VectorOps.bruteForceTopK(queries, corpus, TopK)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Near-duplicate pairs above a cosine threshold (quadratic candidate
    * set, bounded corpus; the LSH query is the scale path).
    */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame =
    VectorOps.thresholdPairs(quantized(spark, dir), Threshold)
      .orderBy(col("id1"), col("id2"))

  /** LSH-bucketed ANN: sign-random-projection bucket key (md5-derived ±1
    * hyperplanes — reproducible in SQL), candidates only within buckets.
    * Plane count is sized to the corpus via [[VectorOps.planesForCorpus]]
    * so bucket occupancy — and the quadratic within-bucket join — stays
    * ~constant as the corpus scales.
    */
  def lshAnn(spark: SparkSession, dir: String): DataFrame =
    VectorOps.lshTopK(quantized(spark, dir), TopK, Dims, lshPlanes(spark, dir))
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("id1"), col("rank"))

  /** Label centroid + per-vector distance-to-centroid stats, exact-int
    * formulation: centroid components stay as (sum, count) integer pairs.
    */
  def labelCentroidStats(spark: SparkSession, dir: String): DataFrame = {
    val vecs = quantized(spark, dir)
      .select(col("vec_id"), col("label"), posexplode(col("qvec")).as(Seq("dim", "v")))
    vecs.groupBy(col("label"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      // decimal/hugeint internally: s ≤ n·10³ per dim, so Σ_dim s² ≤
      // d·n²·10⁶ — int64 wraps near 4×10⁵ vectors per label. The final
      // column must still be BIGINT (output schemas carry only driver-
      // hashable types — see OutputSchemaSpec), so the wide sum is
      // guard-cast: past the envelope this errors loudly instead of
      // wrapping (DuckDB's hugeint→bigint cast errors the same way).
      .agg(sum(col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)"))
        .as("ss_wide"),
        max(col("n")).as("n_vectors"))
      .select(col("label"),
        // NULL first: sum over an all-NULL group is NULL, and DuckDB's
        // hugeint→bigint cast passes NULL through — without this branch
        // the otherwise() would raise where the oracle yields NULL
        when(col("ss_wide").isNull, lit(null).cast("long"))
          .when(col("ss_wide") <= lit(Long.MaxValue).cast("decimal(38,0)"),
          col("ss_wide").cast("long"))
          .otherwise(raise_error(concat(
            lit("q24 sum_sq_sums exceeds int64 for label "),
            col("label").cast("string"),
            lit("; rescale the quantization"))))
          .as("sum_sq_sums"),
        col("n_vectors"))
      .orderBy(col("label"))
  }

  private val NProbe = 2

  /** IVF ANN: coarse-quantize the corpus into label-centroid cells, probe
    * the 2 nearest cells per query, exact cosine re-rank within probed
    * cells (see VectorOps.ivfTopK for the scale shape).
    */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame =
    VectorOps.ivfTopK(quantized(spark, dir), q => q < 10, TopK, NProbe)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("q_id"), col("rank"))

  private val KmK = 8
  private val KmIters = 2

  /** Real codebook training for the IVF path: deterministic integer
    * k-means (Lloyd, id-spread seeds, 2 unrolled rounds — see
    * VectorOps.kmeansCodebook), gated on the full training trajectory:
    * final cell sizes + total within-cell integer distance.
    */
  def kmeansCells(spark: SparkSession, dir: String): DataFrame = {
    val vecs = quantized(spark, dir).select(col("vec_id"), col("qvec"))
    val codebook = VectorOps.kmeansCodebook(vecs, KmK, KmIters)
    VectorOps.assignToCodebook(vecs, codebook)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("dist2")).as("total_dist2"))
      .orderBy(col("cell"))
  }

  /** The production ANN story as ONE gated path: train the IVF index with
    * the real k-means trainer (same k/iters as q38), then assign / probe /
    * re-rank against THAT codebook (VectorOps.ivfProbeTopK) — q30 keeps
    * the label-centroid stand-in for continuity; this query proves the
    * trained-index composition end-to-end against an oracle that re-derives
    * the identical integer training in SQL.
    */
  def ivfTrainedAnn(spark: SparkSession, dir: String): DataFrame = {
    val vecs = quantized(spark, dir).select(col("vec_id"), col("qvec"))
    val codebook = VectorOps.kmeansCodebook(vecs, KmK, KmIters)
    VectorOps.ivfProbeTopK(vecs, codebook, q => q < 10, TopK, NProbe)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Embedding-cosine near-dup dedup (the brief's last dedup mode as a
    * first-class operator): SRP-bucketed candidate pairs, exact cosine
    * gate, drop-any-with-smaller-id-dup, survivors out. Plane count
    * derives from the corpus size exactly as q23's.
    */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame =
    VectorOps.nearDupSurvivors(
        quantized(spark, dir), Threshold, Dims, lshPlanes(spark, dir))
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))

  private val SemThreshold = Threshold // cosine gate for semantic groups

  /** q82: SEMANTIC dedup — the SemDeDup shape (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", 2023): cluster the embedding space with the SAME
    * trained k-means codebook as q38/q48, generate candidate pairs only
    * WITHIN a cluster (the paper's O(n²/k) reduction — semantically
    * distant vectors never meet), gate on exact cosine, collapse pairs
    * into duplicate GROUPS with connected components, keep each group's
    * min vec_id. Output: every vector with its cell, its semantic-group
    * label, and the keep bit.
    *
    * Scale: the codebook is tiny and broadcast; the pair join is an
    * equi-join on `cell`; within-cell work is quadratic BY DESIGN, so at
    * scale k grows with the corpus (k ≈ n/target_cell_size, exactly like
    * [[VectorOps.planesForCorpus]] sizes SRP buckets) — here k is pinned
    * to q38's oracle-shared codebook. Components run on the
    * already-sparse pair set, never the corpus.
    */
  /** The candidate-pair stage of [[semanticDedup]], exposed so
    * PlanContractSpec can pin its physical shape (the whole-query plan
    * can't show it: components materialize the pair join eagerly inside
    * the label-propagation loop, so the final plan only sees the
    * checkpointed labels).
    */
  private[graft] def semanticPairs(assigned: DataFrame): DataFrame = {
    val a = assigned.select(col("cell"), col("vec_id").as("id1"),
      col("qvec").as("v1"), col("nrm").as("n1"))
    val b = assigned.select(col("cell"), col("vec_id").as("id2"),
      col("qvec").as("v2"), col("nrm").as("n2"))
    a.join(b, "cell")
      .filter(col("id1") < col("id2"))
      .filter(VectorOps.dotInt(col("v1"), col("v2")).cast("double") /
        (col("n1") * col("n2")) >= SemThreshold)
      .select(col("id1"), col("id2"))
  }

  /** The assignment stage of [[semanticDedup]]: every vector with its
    * trained cell, quantized vector and precomputed norm.
    */
  private[graft] def semanticAssigned(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(
      quantized(spark, dir).select(col("vec_id"), col("qvec")))
    val codebook = VectorOps.kmeansCodebook(vecs, KmK, KmIters)
    VectorOps.assignToCodebook(vecs, codebook)
      .select(col("vec_id"), col("cell"))
      .join(vecs, "vec_id")
      .withColumn("nrm", VectorOps.normInt(col("qvec")))
  }

  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val assigned = graft.Caches.persisted(semanticAssigned(spark, dir))
    val pairs = semanticPairs(assigned)
    val comps = graft.ext.GraphOps.connectedComponents(pairs, "id1", "id2")
      .select(col("node").as("vec_id"), col("comp").as("sem_group"))
    assigned.select(col("vec_id"), col("cell"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("sem_group"), col("vec_id")).as("sem_group"))
      .withColumn("keep",
        (col("sem_group") === col("vec_id")).cast("long"))
      .orderBy(col("vec_id"))
  }

  private val PqM = 4 // subspaces
  private val PqSubDim = Dims / PqM
  private val PqKs = 8 // cells per subspace codebook

  /** q94: product-quantization ANN ([[VectorOps.pqTopK]] — 4×16-dim
    * subspaces, 8-cell integer Lloyd codebooks, ADC scoring), with the
    * same recall-gate shape as q54: each PQ hit flagged for membership
    * in the exact full-precision squared-L2 top-k, so the gate pins
    * BOTH the quantized arithmetic and the measured recall of the
    * compression. The oracle re-trains all four subspace codebooks
    * with the shared integer k-means SQL and re-derives every ADC
    * table entry bit-for-bit.
    */
  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(
      quantized(spark, dir).select(col("vec_id"), col("qvec")))
    val pq = VectorOps.pqTopK(vecs, q => q < 10, TopK, PqM, PqSubDim, PqKs, KmIters)
    val exact = VectorOps.bruteForceL2TopK(
      vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("qvec").as("q_vec")),
      vecs.select(col("vec_id").as("c_id"), col("qvec").as("c_vec")), TopK)
    pq.join(exact.select(col("q_id"), col("c_id"), lit(1L).as("_hit")),
        Seq("q_id", "c_id"), "left")
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("c_id"),
        col("approx_dist2"), coalesce(col("_hit"), lit(0L)).as("in_exact_topk"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val CoresetK = 8

  /** q101: k-center greedy CORESET selection ([[VectorOps
    * .kCenterCoreset]]) — the geometric data-selection member beside
    * SemDeDup (q82, redundancy removal) and DSIR (q81, distribution
    * matching): pick the k points that 2-approximately minimize the
    * maximum distance of any point to its nearest pick (Gonzalez
    * 1985), i.e. the most *coverage-diverse* subset. Gated on the full
    * selection trajectory: every round's center AND its
    * distance-at-selection, ties and all.
    */
  def coresetSelect(spark: SparkSession, dir: String): DataFrame =
    VectorOps.kCenterCoreset(
      quantized(spark, dir).select(col("vec_id"), col("qvec")), CoresetK)

  /** q86: semi-hard negative mining for contrastive training
    * ([[VectorOps.hardNegatives]]) — per anchor (vec_id < 10, same
    * query-set convention as q21/q30/q48), the nearest same-label
    * positive's cosine plus the TopK hardest different-label negatives,
    * each flagged semi-hard (below the positive, the FaceNet band).
    */
  def hardNegativeMining(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(quantized(spark, dir))
    val anchors = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("qvec").as("q_vec"))
    val corpus = vecs.select(col("vec_id").as("c_id"),
      col("label").as("c_label"), col("qvec").as("c_vec"))
    VectorOps.hardNegatives(anchors, corpus, TopK)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Int8-quantized ANN with a recall gate: brute-force cosine top-k over
    * per-vector symmetric int8 vectors ([[VectorOps.int8Quantize]] — the
    * 8×-smaller index that makes broadcast/memory-resident ANN viable at
    * scale), each hit flagged 1/0 for membership in the full-precision
    * top-k — so the gate pins BOTH the quantized arithmetic and the
    * measured recall of the compression.
    */
  def int8Ann(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(quantized(spark, dir)
      .select(col("vec_id"), col("qvec"),
        VectorOps.int8Quantize(col("qvec")).as("q8")))
    val top8 = VectorOps.bruteForceTopK(
      vecs.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("q8").as("q_vec")),
      vecs.select(col("vec_id").as("c_id"), col("q8").as("c_vec")), TopK)
    val exact = VectorOps.bruteForceTopK(
      vecs.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("qvec").as("q_vec")),
      vecs.select(col("vec_id").as("c_id"), col("qvec").as("c_vec")), TopK)
    top8.join(exact.select(col("q_id"), col("c_id"), lit(1L).as("_hit")),
        Seq("q_id", "c_id"), "left")
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("c_id"),
        col("cosine"), coalesce(col("_hit"), lit(0L)).as("in_exact_topk"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** q73: the STREAMING half of the trained-IVF path, oracle-gated —
    * train the codebook in batch (as a production index does), then
    * ingest the corpus in three id-ordered micro-batches through
    * [[graft.streaming.AnnStream]] and probe the accumulated postings.
    * Hash-gated against q48's own DuckDB oracle: streamed index state
    * must serve exactly the batch index's answers.
    */
  def streamAnn(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(
      quantized(spark, dir).select(col("vec_id"), col("qvec")))
    val codebook = VectorOps.kmeansCodebook(vecs, KmK, KmIters)
    val as = new graft.streaming.AnnStream(spark, codebook)
    val mx = vecs.agg(max(col("vec_id"))).head.getLong(0)
    as.ingest(vecs.filter(col("vec_id") <= mx / 3), 0L)
    as.ingest(vecs.filter(col("vec_id") > mx / 3 && col("vec_id") <= 2 * mx / 3), 1L)
    as.ingest(vecs.filter(col("vec_id") > 2 * mx / 3), 2L)
    // probe() reads the postings log LAZILY — materialize the answers,
    // then release the stream's state deterministically
    val out = as.probe(vecs.filter(col("vec_id") < 10), TopK, NProbe)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("q_id"), col("rank"))
      .localCheckpoint(eager = true)
    as.close()
    out
  }

  // ---------------------------------------------------------------- q76

  /** q76: embedding-space QUALITY GATE — flag vectors whose quantized
    * squared L2 norm falls outside the exact Tukey fence
    * [q1 − 1.5·IQR, q3 + 1.5·IQR] of the corpus distribution. A
    * training pipeline runs this ahead of ANN indexing: broken encoders
    * emit zero/exploded vectors that poison centroid training and
    * cosine thresholds. Planted fixtures guarantee both fence sides
    * fire (`% 97` → ×3.0 exploded, `% 89` → ×0.25 collapsed; the
    * natural corpus contributes its true outliers too). All math is
    * exact: int64 norms (×1000 quantization), exact distributed
    * quantiles ([[graft.ext.StatOps.exactQuantiles]] — two-pass
    * prefix-sum, no global sort), and a division-free integer fence:
    * v < q1 − 1.5·(q3−q1) ⟺ 2v < 5·q1 − 3·q3. The quantile operator
    * preserves the int64 norm type end to end (no double routing), so
    * exactness holds at any norm magnitude int64 can carry.
    *
    * Scale: one narrow (vec_id, norm2) projection feeds the quantile
    * operator (its distinct-value groupBy is the only full shuffle);
    * the two fence constants come back as a broadcast — the corpus
    * never re-shuffles. Reference analog: none — brief-mandated
    * training-data machinery.
    */
  /** Every embedding against the exact Tukey fence: (vec_id, norm2,
    * low, high). `plant` applies q76's deterministic ×3/×0.25 scale
    * factors; q79 runs the natural corpus (plant = false). Shared by
    * [[embeddingOutliers]] and [[CurationPack.crossModalGate]].
    */
  private[graft] def normFence(spark: SparkSession, dir: String,
      plant: Boolean): DataFrame = {
    val s =
      if (plant)
        when(col("vec_id") % 97 === 0, lit(3.0))
          .when(col("vec_id") % 89 === 0, lit(0.25))
          .otherwise(lit(1.0))
      else lit(1.0)
    val norms = graft.Caches.persisted(Tables.embeddings(spark, dir)
      .withColumn("s", s)
      .select(col("vec_id"),
        aggregate(
          transform(col("embedding"),
            x => round(x * col("s") * lit(Scale)).cast("long")),
          lit(0L), (a, x) => a + x * x).as("norm2")))
    val fences = graft.ext.StatOps.exactQuantiles(norms, "norm2", Seq(25, 75))
      .groupBy()
      .agg(min(when(col("p") === 25, col("value"))).cast("long").as("q1"),
        min(when(col("p") === 75, col("value"))).cast("long").as("q3"))
    norms.crossJoin(broadcast(fences))
      .select(col("vec_id"), col("norm2"),
        (lit(2L) * col("norm2") < lit(5L) * col("q1") - lit(3L) * col("q3"))
          .as("low"),
        (lit(2L) * col("norm2") > lit(5L) * col("q3") - lit(3L) * col("q1"))
          .as("high"))
  }

  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame =
    normFence(spark, dir, plant = true)
      .filter(col("low") || col("high"))
      .select(col("vec_id"), col("norm2"),
        when(col("low"), lit("low")).otherwise(lit("high")).as("side"))
      .orderBy(col("vec_id"))

  private val PcaRounds = 32
  private val PcaVs = 1000L

  /** q104: top principal direction of the embedding corpus — exact int64
    * centered scatter matrix ([[VectorOps.scatterState]]: the d²
    * outer-product aggregation, the one linear-algebra reduction every
    * embedding pipeline runs for PCA whitening / drift monitoring), then
    * 32 rounds of fixed-point power iteration ([[VectorOps
    * .pcaPowerDirection]]). Output per dimension: the scatter diagonal
    * (n² × variance, exact) and the direction component in [-1000, 1000].
    * The oracle re-derives the scatter and every iterate bit-for-bit.
    *
    * Round count: convergence is geometric in λ₂/λ₁; the fixture corpus
    * is near-isotropic (λ₂/λ₁ ≈ 0.98), so 32 rounds land the Rayleigh
    * quotient within ~2.5 % of λ₁ — on real embedding corpora (which
    * have dominant directions; that's why PCA whitening works) the same
    * 32 rounds converge to machine fixed-point. AgreementSpec proves
    * exact top-direction recovery on a planted anisotropic corpus.
    */
  def pcaPower(spark: SparkSession, dir: String): DataFrame =
    VectorOps.pcaPowerDirection(
      quantized(spark, dir).select(col("vec_id"), col("qvec")), PcaRounds, PcaVs)

  /** q105: PCA PROJECTION — score every vector by its exact int64 dot
    * product with the q104 direction (the direction → application link,
    * like q103 is to q97): the corpus-wide drift/outlier score every
    * embedding pipeline derives from its PCA. The direction is computed
    * once ([[VectorOps.pcaFromState]], driver-local on the collected
    * scatter) and enters the plan as a LITERAL array, so the projection
    * is one narrow codegen pass over the corpus — no join, nothing
    * broadcast but d constants.
    */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(
      quantized(spark, dir).select(col("vec_id"), col("qvec")))
    val direction = VectorOps.pcaFromState(
        VectorOps.scatterState(vecs), PcaRounds, PcaVs)
      .select(col("dim"), col("v")).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    vecs.select(col("vec_id"),
        VectorOps.dotInt(col("qvec"), array(direction.map(lit(_)): _*)).as("proj"))
      .orderBy(col("vec_id"))
  }

  /** q106: INCREMENTAL scatter maintenance, oracle-gated — the corpus
    * splits into three vec_id-ranged micro-batches, each builds its own
    * additive scatter state independently ([[VectorOps.scatterState]]),
    * the states merge by plain addition ([[VectorOps
    * .mergeScatterStates]] — the mergeability that makes the scatter a
    * streaming/cross-day structure), and the PCA finished from the
    * MERGED state must hash-equal the one-shot batch q104 via q104's own
    * oracle. The linear-algebra sibling of the q96 HLL register gate.
    */
  def streamScatter(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(
      quantized(spark, dir).select(col("vec_id"), col("qvec")))
    val mx = vecs.agg(max(col("vec_id"))).head.getLong(0)
    val states = Seq(
      vecs.filter(col("vec_id") <= mx / 3),
      vecs.filter(col("vec_id") > mx / 3 && col("vec_id") <= 2 * mx / 3),
      vecs.filter(col("vec_id") > 2 * mx / 3))
      .map(VectorOps.scatterState(_))
    VectorOps.pcaFromState(VectorOps.mergeScatterStates(states), PcaRounds, PcaVs)
  }

  private val DriftScale = 1000000L // mean-shift fixed point (ppm of a unit)

  /** q109: embedding DRIFT monitor — per-dimension first/second moments
    * of two corpus halves (vec_id-ranged: "yesterday's crawl vs
    * today's") and the exact fixed-point mean shift between them, the
    * check a production embedding pipeline runs before trusting a new
    * batch (an upstream model/preprocessing change moves the marginal
    * statistics long before it breaks anything visibly). All outputs
    * are exact int64: counts, sums, sums of squares per half, and
    * `mean_shift_fp = floor((s1·n2 − s2·n1)·10⁶ / (n1·n2))` — the
    * repo-standard floor-of-double-quotient normalization.
    *
    * Scale shape: ONE narrow posexplode + ONE groupBy(half, dim)
    * aggregation over the corpus (map-side combinable, shuffle carries
    * parts × 2d partial rows); the halves then meet in a d-row
    * broadcast self-join. No second corpus pass, nothing quadratic.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Caches.persisted(
      quantized(spark, dir).select(col("vec_id"), col("qvec")))
    val mid = vecs.agg(max(col("vec_id"))).head.getLong(0) / 2
    val moments = vecs
      .select((col("vec_id") <= mid).cast("long").as("half"),
        posexplode(col("qvec")).as(Seq("dim", "x")))
      .groupBy(col("half"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
    val h1 = moments.filter(col("half") === 1L)
      .select(col("dim"), col("n").as("n1"), col("s").as("s1"), col("ss").as("ss1"))
    val h2 = moments.filter(col("half") === 0L)
      .select(col("dim"), col("n").as("n2"), col("s").as("s2"), col("ss").as("ss2"))
    h1.join(broadcast(h2), "dim")
      .withColumn("mean_shift_fp",
        // the cross term s1·n2 is (n·10³)·n — int64 wraps near 10⁸
        // vectors per half, so it rides in decimal/hugeint; the final
        // decimal→double is the same correctly-rounded conversion in
        // both engines (identical 128-bit value in, identical double out)
        floor((col("s1").cast("decimal(38,0)") * col("n2")
            - col("s2").cast("decimal(38,0)") * col("n1")).cast("double")
          * lit(DriftScale.toDouble)
          / (col("n1") * col("n2")).cast("double")).cast("long"))
      .select(col("dim"), col("n1"), col("n2"), col("s1"), col("s2"),
        col("ss1"), col("ss2"), col("mean_shift_fp"))
      .orderBy(col("dim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_pca_power" -> pcaPower _,
    "q105_pca_project" -> pcaProject _,
    "q106_stream_scatter" -> streamScatter _,
    "q109_embedding_drift" -> embeddingDrift _,
    "q86_hard_negatives" -> hardNegativeMining _,
    "q94_pq_ann" -> pqAnn _,
    "q101_coreset" -> coresetSelect _,
    "q76_embedding_outliers" -> embeddingOutliers _,
    "q54_int8_ann" -> int8Ann _,
    "q21_ann_topk" -> annTopK _,
    "q22_cosine_pairs" -> cosinePairs _,
    "q23_lsh_ann" -> lshAnn _,
    "q24_label_centroids" -> labelCentroidStats _,
    "q30_ivf_ann" -> ivfAnn _,
    "q38_kmeans_codebook" -> kmeansCells _,
    "q39_embedding_dedup" -> embeddingDedup _,
    "q48_ivf_trained_ann" -> ivfTrainedAnn _,
    "q73_stream_ann" -> streamAnn _,
    "q82_semantic_dedup" -> semanticDedup _)

  // cast to double BEFORE the multiply: DuckDB would otherwise keep
  // FLOAT×DECIMAL in single precision (0.3195f·1000 = 319.5f → 320),
  // while Spark promotes to double (319.4999… → 319)
  private val qv =
    s"list_transform(embedding, x -> cast(round(cast(x AS double) * $Scale) AS bigint))"
  private def dot(a: String, b: String) = s"list_dot_product($a, $b)"
  // Plane count derived in SQL with the same integer rule as
  // planesForCorpus: smallest p in [4,24] with 2^p·target ≥ corpus size.
  private val planesCteSql =
    s"""np AS (
       |  SELECT coalesce(min(p), 24) AS planes
       |  FROM range(4, 25) t(p)
       |  WHERE (1::bigint << p) * $TargetBucket >= (SELECT count(*) FROM embeddings))""".stripMargin
  private val srpBucketSql =
    s"""array_to_string([CASE WHEN list_sum(
       |    list_transform(range($Dims), d ->
       |      (((('0x' || substr(md5('srp-' || pl || '-' || d), 1, 8))::bigint & 1) * 2 - 1) * qvec[d+1]))
       |  ) > 0 THEN 1 ELSE 0 END for pl in range((SELECT planes FROM np))], '')""".stripMargin

  // ---- shared trained-codebook SQL (q38 gate + q48 trained-IVF probe) ----
  // Unrolled Lloyd rounds, each = assign (argmin of exact integer
  // distance, ties to lower cell) + centroid update ((sum·1000) // count —
  // DuckDB // truncates toward zero exactly like Spark div).
  private def kmDistSql(cvecExpr: String, dims: Int = Dims) =
    s"""list_sum(list_transform(range($dims), i ->
       |      (qvec[i+1]*1000 - ($cvecExpr)[i+1]) * (qvec[i+1]*1000 - ($cvecExpr)[i+1])))""".stripMargin
  private def kmAssignCte(name: String, cb: String, vtab: String = "v",
      dims: Int = Dims) =
    s"""$name AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, s.cell,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${kmDistSql("s.cvec", dims)}, s.cell) AS rn
       |    FROM $vtab v CROSS JOIN $cb s) WHERE rn = 1)""".stripMargin
  private def kmUpdateCte(name: String, assign: String, vtab: String = "v") =
    s"""$name AS (
       |  SELECT cell, list(c ORDER BY d) AS cvec FROM (
       |    SELECT cell, d, (sum(x) * 1000) // count(*) AS c FROM (
       |      SELECT a.cell, generate_subscripts(qvec, 1) - 1 AS d, unnest(qvec) AS x
       |      FROM $vtab v JOIN $assign a USING (vec_id))
       |    GROUP BY cell, d)
       |  GROUP BY cell)""".stripMargin
  private def kmSeedsCte(name: String, vtab: String, k: Int) =
    s"""$name AS (
       |  SELECT cell, list_transform(qvec, x -> x * 1000) AS cvec FROM (
       |    SELECT ((v.vec_id - b.lo) * $k) // (b.hi - b.lo + 1) AS cell,
       |      v.qvec,
       |      row_number() OVER (
       |        PARTITION BY ((v.vec_id - b.lo) * $k) // (b.hi - b.lo + 1)
       |        ORDER BY v.vec_id) AS rn
       |    FROM $vtab v, bounds b) WHERE rn = 1)""".stripMargin

  /** CTE chain ending in `cb2`, the KmIters=2-round trained codebook. */
  private val kmTrainedCtes =
    s"""v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
       |bounds AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM v),
       |${kmSeedsCte("seeds", "v", KmK)},
       |${kmAssignCte("a1", "seeds")},
       |${kmUpdateCte("cb1", "a1")},
       |${kmAssignCte("a2", "cb1")},
       |${kmUpdateCte("cb2", "a2")}""".stripMargin

  /** One PQ subspace's full chain for the q94 oracle: slice `v`'s
    * 64-dim quantized vector to subspace `m` (dims [m·subDim+1,
    * (m+1)·subDim], 1-based inclusive), train the same 2-round integer
    * Lloyd codebook the engine trains ([[VectorOps.kmeansCodebook]] on
    * the sliced frame — `bounds` is shared: the id domain is subspace-
    * invariant), and encode every vector (`af$m`). Ends in `cb2$m` +
    * `af$m`.
    */
  private def pqSubspaceCtes(m: Int, subDim: Int, ks: Int): String = {
    val lo = m * subDim + 1
    val hi = (m + 1) * subDim
    s"""v$m AS (SELECT vec_id, qvec[$lo:$hi] AS qvec FROM v),
       |${kmSeedsCte(s"seeds$m", s"v$m", ks)},
       |${kmAssignCte(s"a1$m", s"seeds$m", s"v$m", subDim)},
       |${kmUpdateCte(s"cb1$m", s"a1$m", s"v$m")},
       |${kmAssignCte(s"a2$m", s"cb1$m", s"v$m", subDim)},
       |${kmUpdateCte(s"cb2$m", s"a2$m", s"v$m")},
       |${kmAssignCte(s"af$m", s"cb2$m", s"v$m", subDim)}""".stripMargin
  }

  private def coresetDist(q: String, c: String) =
    s"""list_sum(list_transform(range($Dims), i ->
       |      ($q[i+1] - $c[i+1]) * ($q[i+1] - $c[i+1])))""".stripMargin

  /** One unrolled farthest-first round for the q101 oracle: argmax of
    * the running min-distance (ties to the smaller id), then the
    * incremental `least` update against the new center only — the
    * identical trajectory [[VectorOps.kCenterCoreset]] walks.
    */
  private def coresetRoundCtes(r: Int): String =
    s"""c$r AS (
       |  SELECT m.vec_id AS center_id, v.qvec AS cvec, m.d2
       |  FROM m${r - 1} m JOIN v USING (vec_id)
       |  ORDER BY m.d2 DESC, m.vec_id LIMIT 1),
       |m$r AS (
       |  SELECT m.vec_id,
       |    least(m.d2, ${coresetDist("v.qvec", "c.cvec")}::bigint) AS d2
       |  FROM m${r - 1} m JOIN v USING (vec_id) CROSS JOIN c$r c)""".stripMargin

  /** One power-iteration round for the q104 oracle: exact int64 matvec
    * against the centered scatter, then the repo-standard deterministic
    * normalization floor((w·vs)::double / max|w|::double).
    */
  private def pcaRoundCtes(r: Int): String =
    s"""w$r AS MATERIALIZED (SELECT c.di AS dim, sum(c.g * p.v)::bigint AS w
       |        FROM c JOIN p${r - 1} p ON p.dim = c.dj GROUP BY 1),
       |m$r AS (SELECT max(abs(w))::bigint AS m FROM w$r),
       |p$r AS MATERIALIZED (SELECT dim,
       |          floor((w::double * ${PcaVs}.0::double) / m::double)::bigint AS v
       |        FROM w$r CROSS JOIN m$r)""".stripMargin

  private val baseOracles: Map[String, String] = Map(
    "q104_pca_power" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |e AS (SELECT vec_id, unnest(qvec) AS x,
         |        (generate_subscripts(qvec, 1) - 1)::bigint AS i FROM v),
         |g AS (SELECT a.i AS di, b.i AS dj, sum(a.x * b.x)::bigint AS gfull
         |      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |s AS (SELECT i, sum(x)::bigint AS s FROM e GROUP BY 1),
         |nn AS (SELECT count(*)::bigint AS n FROM v),
         |c AS MATERIALIZED (
         |      SELECT g.di, g.dj, (nn.n * g.gfull - s1.s * s2.s)::bigint AS g
         |      FROM g JOIN s s1 ON s1.i = g.di JOIN s s2 ON s2.i = g.dj
         |      CROSS JOIN nn),
         |p0 AS (SELECT DISTINCT di AS dim, ${PcaVs}::bigint AS v FROM c),
         |${(1 to PcaRounds).map(pcaRoundCtes).mkString(",\n")}
         |SELECT c.di AS dim, c.g AS c_diag, p$PcaRounds.v AS v
         |FROM c JOIN p$PcaRounds ON p$PcaRounds.dim = c.di
         |WHERE c.di = c.dj ORDER BY dim""".stripMargin,
    "q109_embedding_drift" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |mid AS (SELECT max(vec_id) // 2 AS mid FROM v),
         |e AS (SELECT vec_id, unnest(qvec) AS x,
         |        (generate_subscripts(qvec, 1) - 1)::bigint AS dim FROM v),
         |m AS (
         |  SELECT CASE WHEN e.vec_id <= mid.mid THEN 1 ELSE 0 END AS half,
         |    e.dim, count(*)::bigint AS n, sum(e.x)::bigint AS s,
         |    sum(e.x * e.x)::bigint AS ss
         |  FROM e CROSS JOIN mid GROUP BY 1, 2)
         |SELECT h1.dim, h1.n AS n1, h2.n AS n2, h1.s AS s1, h2.s AS s2,
         |  h1.ss AS ss1, h2.ss AS ss2,
         |  floor((h1.s::hugeint * h2.n - h2.s::hugeint * h1.n)::double
         |    * ${DriftScale}.0::double
         |    / (h1.n * h2.n)::double)::bigint AS mean_shift_fp
         |FROM (SELECT * FROM m WHERE half = 1) h1
         |JOIN (SELECT * FROM m WHERE half = 0) h2 ON h2.dim = h1.dim
         |ORDER BY h1.dim""".stripMargin,
    "q105_pca_project" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |e AS (SELECT vec_id, unnest(qvec) AS x,
         |        (generate_subscripts(qvec, 1) - 1)::bigint AS i FROM v),
         |g AS (SELECT a.i AS di, b.i AS dj, sum(a.x * b.x)::bigint AS gfull
         |      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |s AS (SELECT i, sum(x)::bigint AS s FROM e GROUP BY 1),
         |nn AS (SELECT count(*)::bigint AS n FROM v),
         |c AS MATERIALIZED (
         |      SELECT g.di, g.dj, (nn.n * g.gfull - s1.s * s2.s)::bigint AS g
         |      FROM g JOIN s s1 ON s1.i = g.di JOIN s s2 ON s2.i = g.dj
         |      CROSS JOIN nn),
         |p0 AS (SELECT DISTINCT di AS dim, ${PcaVs}::bigint AS v FROM c),
         |${(1 to PcaRounds).map(pcaRoundCtes).mkString(",\n")}
         |SELECT e.vec_id, sum(e.x * p.v)::bigint AS proj
         |FROM e JOIN p$PcaRounds p ON p.dim = e.i
         |GROUP BY 1 ORDER BY vec_id""".stripMargin,
    "q76_embedding_outliers" ->
      """WITH scaled AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 97 = 0 THEN 3.0::double
        |         WHEN vec_id % 89 = 0 THEN 0.25::double
        |         ELSE 1.0::double END AS s,
        |    embedding
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id,
        |    list_sum([ (cast(round((cast(x AS double) * s) * 1000.0) AS bigint)
        |                * cast(round((cast(x AS double) * s) * 1000.0) AS bigint))
        |               for x in embedding ])::bigint AS norm2
        |  FROM scaled),
        |qs AS (SELECT quantile_disc(norm2, 0.25)::bigint AS q1,
        |              quantile_disc(norm2, 0.75)::bigint AS q3 FROM n)
        |SELECT vec_id, norm2,
        |  CASE WHEN 2*norm2 < 5*q1 - 3*q3 THEN 'low' ELSE 'high' END AS side
        |FROM n, qs
        |WHERE 2*norm2 < 5*q1 - 3*q3 OR 2*norm2 > 5*q3 - 3*q1
        |ORDER BY vec_id""".stripMargin,
    // int8 quantization re-derived with integer `//` (the engine proves
    // its floor(double) form identical — see VectorOps.int8Quantize)
    "q54_int8_ann" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |mx AS (SELECT vec_id, qvec,
         |  list_max(list_transform(qvec, x -> abs(x))) AS m FROM v),
         |v8 AS (SELECT vec_id, qvec,
         |  CASE WHEN m = 0 THEN list_transform(qvec, x -> 0::bigint)
         |    ELSE list_transform(qvec, x -> CASE WHEN x < 0
         |      THEN -(((-x) * 254 + m) // (2 * m))
         |      ELSE (x * 254 + m) // (2 * m) END) END AS q8 FROM mx),
         |s8 AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    cast(${dot("q.q8", "c.q8")} AS double) /
         |      (sqrt(cast(${dot("q.q8", "q.q8")} AS double)) *
         |       sqrt(cast(${dot("c.q8", "c.q8")} AS double))) AS cosine
         |  FROM v8 q CROSS JOIN v8 c
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |r8 AS (
         |  SELECT q_id, c_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
         |  FROM s8),
         |se AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    cast(${dot("q.qvec", "c.qvec")} AS double) /
         |      (sqrt(cast(${dot("q.qvec", "q.qvec")} AS double)) *
         |       sqrt(cast(${dot("c.qvec", "c.qvec")} AS double))) AS cosine
         |  FROM v8 q CROSS JOIN v8 c
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |re AS (
         |  SELECT q_id, c_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
         |  FROM se)
         |SELECT r8.q_id, r8.rank, r8.c_id, r8.cosine,
         |  CASE WHEN e.q_id IS NOT NULL THEN 1 ELSE 0 END::bigint AS in_exact_topk
         |FROM r8 LEFT JOIN (SELECT q_id, c_id FROM re WHERE rank <= $TopK) e
         |  ON r8.q_id = e.q_id AND r8.c_id = e.c_id
         |WHERE r8.rank <= $TopK
         |ORDER BY r8.q_id, r8.rank""".stripMargin,
    "q101_coreset" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |c1 AS (SELECT vec_id AS center_id, qvec AS cvec FROM v
         |       ORDER BY vec_id LIMIT 1),
         |m1 AS (
         |  SELECT v.vec_id, ${coresetDist("v.qvec", "c.cvec")}::bigint AS d2
         |  FROM v CROSS JOIN c1 c),
         |${(2 to CoresetK).map(coresetRoundCtes).mkString(",\n")}
         |SELECT 1::bigint AS round, center_id, 0::bigint AS d2 FROM c1
         |${(2 to CoresetK).map(r =>
             s"UNION ALL SELECT $r::bigint, center_id, d2::bigint FROM c$r")
            .mkString("\n")}
         |ORDER BY round""".stripMargin,
    "q94_pq_ann" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |bounds AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM v),
         |${(0 until PqM).map(pqSubspaceCtes(_, PqSubDim, PqKs)).mkString(",\n")},
         |enc AS (
         |  SELECT a0.vec_id AS c_id, a0.cell AS cell_0, a1.cell AS cell_1,
         |    a2.cell AS cell_2, a3.cell AS cell_3
         |  FROM af0 a0 JOIN af1 a1 USING (vec_id)
         |    JOIN af2 a2 USING (vec_id) JOIN af3 a3 USING (vec_id)),
         |${(0 until PqM).map(i =>
             s"""qt$i AS (
                |  SELECT q.vec_id AS q_id, s.cell,
                |    ${kmDistSql("s.cvec", PqSubDim)} AS d
                |  FROM v$i q CROSS JOIN cb2$i s WHERE q.vec_id < 10)""".stripMargin)
            .mkString(",\n")},
         |sc AS (
         |  SELECT t0.q_id, e.c_id,
         |    (t0.d + t1.d + t2.d + t3.d)::bigint AS approx_dist2
         |  FROM enc e
         |  JOIN qt0 t0 ON t0.cell = e.cell_0
         |  JOIN qt1 t1 ON t1.cell = e.cell_1 AND t1.q_id = t0.q_id
         |  JOIN qt2 t2 ON t2.cell = e.cell_2 AND t2.q_id = t0.q_id
         |  JOIN qt3 t3 ON t3.cell = e.cell_3 AND t3.q_id = t0.q_id
         |  WHERE t0.q_id <> e.c_id),
         |rk AS (
         |  SELECT q_id, c_id, approx_dist2,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY approx_dist2 ASC, c_id ASC) AS rank
         |  FROM sc),
         |ex AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    list_sum(list_transform(range($Dims), i ->
         |      (q.qvec[i+1] - c.qvec[i+1]) * (q.qvec[i+1] - c.qvec[i+1]))) AS d2
         |  FROM v q CROSS JOIN v c
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |re AS (
         |  SELECT q_id, c_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2 ASC, c_id ASC) AS rank
         |  FROM ex)
         |SELECT rk.q_id, rk.rank, rk.c_id, rk.approx_dist2,
         |  (CASE WHEN e2.q_id IS NOT NULL THEN 1 ELSE 0 END)::bigint AS in_exact_topk
         |FROM rk LEFT JOIN (SELECT q_id, c_id FROM re WHERE rank <= $TopK) e2
         |  ON rk.q_id = e2.q_id AND rk.c_id = e2.c_id
         |WHERE rk.rank <= $TopK
         |ORDER BY rk.q_id, rk.rank""".stripMargin,
    "q86_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, label, $qv AS qvec FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS q_id, q.label AS q_label,
         |    c.vec_id AS c_id, c.label AS c_label,
         |    cast(${dot("q.qvec", "c.qvec")} AS double) /
         |      (sqrt(cast(${dot("q.qvec", "q.qvec")} AS double)) *
         |       sqrt(cast(${dot("c.qvec", "c.qvec")} AS double))) AS cosine
         |  FROM v q CROSS JOIN v c
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |pos AS (
         |  SELECT q_id, max(cosine) AS pos_cosine FROM scored
         |  WHERE q_label = c_label GROUP BY q_id),
         |neg AS (
         |  SELECT q_id, c_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
         |  FROM scored WHERE q_label <> c_label)
         |SELECT n.q_id, n.rank, n.c_id, n.cosine,
         |  coalesce(p.pos_cosine, -2.0) AS pos_cosine,
         |  (CASE WHEN n.cosine < coalesce(p.pos_cosine, -2.0)
         |        THEN 1 ELSE 0 END)::bigint AS semi_hard
         |FROM neg n LEFT JOIN pos p USING (q_id)
         |WHERE n.rank <= $TopK
         |ORDER BY n.q_id, n.rank""".stripMargin,
    "q21_ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, $qv AS qvec FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS c_id, $qv AS cvec FROM embeddings),
         |scored AS (
         |  SELECT q_id, c_id,
         |    cast(${dot("qvec", "cvec")} AS double) /
         |      (sqrt(cast(${dot("qvec", "qvec")} AS double)) *
         |       sqrt(cast(${dot("cvec", "cvec")} AS double))) AS cosine
         |  FROM q CROSS JOIN c WHERE q_id <> c_id),
         |ranked AS (
         |  SELECT q_id, c_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, rank, c_id, cosine FROM ranked WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    "q22_cosine_pairs" ->
      s"""WITH v AS (SELECT vec_id, $qv AS qvec FROM embeddings)
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  cast(${dot("a.qvec", "b.qvec")} AS double) /
         |    (sqrt(cast(${dot("a.qvec", "a.qvec")} AS double)) *
         |     sqrt(cast(${dot("b.qvec", "b.qvec")} AS double))) AS cosine
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE cast(${dot("a.qvec", "b.qvec")} AS double) /
         |    (sqrt(cast(${dot("a.qvec", "a.qvec")} AS double)) *
         |     sqrt(cast(${dot("b.qvec", "b.qvec")} AS double))) >= $Threshold
         |ORDER BY id1, id2""".stripMargin,
    "q23_lsh_ann" ->
      s"""WITH $planesCteSql,
         |v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |b AS (SELECT vec_id, qvec, $srpBucketSql AS bucket FROM v),
         |cand AS (
         |  SELECT a.vec_id AS id1, b2.vec_id AS id2,
         |    cast(${dot("a.qvec", "b2.qvec")} AS double) /
         |      (sqrt(cast(${dot("a.qvec", "a.qvec")} AS double)) *
         |       sqrt(cast(${dot("b2.qvec", "b2.qvec")} AS double))) AS cosine
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
         |ranked AS (
         |  SELECT id1, id2, cosine,
         |    row_number() OVER (PARTITION BY id1 ORDER BY cosine DESC, id2 ASC) AS rank
         |  FROM cand)
         |SELECT id1, rank, id2, cosine FROM ranked WHERE rank <= $TopK
         |ORDER BY id1, rank""".stripMargin,
    "q30_ivf_ann" ->
      s"""WITH v AS (SELECT vec_id, label, $qv AS qvec FROM embeddings),
         |dims AS (
         |  SELECT vec_id, label, generate_subscripts(qvec, 1) - 1 AS d, unnest(qvec) AS x
         |  FROM v),
         |cent AS (
         |  SELECT label AS cell, d, (sum(x) * 1000) // count(*) AS c
         |  FROM dims GROUP BY label, d),
         |ad AS (
         |  SELECT dims.vec_id, cent.cell,
         |    sum((dims.x * 1000 - cent.c) * (dims.x * 1000 - cent.c)) AS dist2
         |  FROM dims JOIN cent ON dims.d = cent.d
         |  GROUP BY dims.vec_id, cent.cell),
         |assigned AS (
         |  SELECT vec_id AS c_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |    FROM ad) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |    FROM ad WHERE vec_id < 10) WHERE rn <= $NProbe),
         |cand AS (
         |  SELECT p.q_id, a.c_id FROM probes p
         |  JOIN assigned a ON a.cell = p.cell AND a.c_id <> p.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.c_id,
         |    cast(${dot("q.qvec", "c.qvec")} AS double) /
         |      (sqrt(cast(${dot("q.qvec", "q.qvec")} AS double)) *
         |       sqrt(cast(${dot("c.qvec", "c.qvec")} AS double))) AS cosine
         |  FROM cand JOIN v q ON q.vec_id = cand.q_id
         |            JOIN v c ON c.vec_id = cand.c_id),
         |ranked AS (
         |  SELECT q_id, c_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, rank, c_id, cosine FROM ranked WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    "q38_kmeans_codebook" ->
      s"""WITH $kmTrainedCtes,
         |final AS (
         |  SELECT vec_id, cell, dist2 FROM (
         |    SELECT v.vec_id, s.cell, ${kmDistSql("s.cvec")} AS dist2,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${kmDistSql("s.cvec")}, s.cell) AS rn
         |    FROM v CROSS JOIN cb2 s) WHERE rn = 1)
         |SELECT cell, count(*) AS n_vectors, sum(dist2)::bigint AS total_dist2
         |FROM final GROUP BY cell ORDER BY cell""".stripMargin,
    "q48_ivf_trained_ann" ->
      s"""WITH $kmTrainedCtes,
         |ad AS (
         |  SELECT v.vec_id, s.cell, ${kmDistSql("s.cvec")} AS dist2
         |  FROM v CROSS JOIN cb2 s),
         |assigned AS (
         |  SELECT vec_id AS c_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |    FROM ad) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |    FROM ad WHERE vec_id < 10) WHERE rn <= $NProbe),
         |cand AS (
         |  SELECT p.q_id, a.c_id FROM probes p
         |  JOIN assigned a ON a.cell = p.cell AND a.c_id <> p.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.c_id,
         |    cast(${dot("q.qvec", "c.qvec")} AS double) /
         |      (sqrt(cast(${dot("q.qvec", "q.qvec")} AS double)) *
         |       sqrt(cast(${dot("c.qvec", "c.qvec")} AS double))) AS cosine
         |  FROM cand JOIN v q ON q.vec_id = cand.q_id
         |            JOIN v c ON c.vec_id = cand.c_id),
         |ranked AS (
         |  SELECT q_id, c_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, rank, c_id, cosine FROM ranked WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    "q39_embedding_dedup" ->
      s"""WITH $planesCteSql,
         |v AS (SELECT vec_id, $qv AS qvec FROM embeddings),
         |b AS (SELECT vec_id, qvec, $srpBucketSql AS bucket FROM v),
         |dropped AS (
         |  SELECT DISTINCT b2.vec_id AS vec_id
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |  WHERE cast(${dot("a.qvec", "b2.qvec")} AS double) /
         |      (sqrt(cast(${dot("a.qvec", "a.qvec")} AS double)) *
         |       sqrt(cast(${dot("b2.qvec", "b2.qvec")} AS double))) >= $Threshold)
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY e.vec_id""".stripMargin,
    "q82_semantic_dedup" ->
      s"""WITH RECURSIVE $kmTrainedCtes,
         |${kmAssignCte("af", "cb2")},
         |w AS (SELECT v.vec_id, v.qvec, af.cell
         |      FROM v JOIN af USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst
         |  FROM w a JOIN w b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE cast(${dot("a.qvec", "b.qvec")} AS double) /
         |      (sqrt(cast(${dot("a.qvec", "a.qvec")} AS double)) *
         |       sqrt(cast(${dot("b.qvec", "b.qvec")} AS double))) >= $SemThreshold),
         |sym AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
         |grp AS (SELECT a AS vec_id, least(a, min(b)) AS sem_group
         |        FROM reach GROUP BY a)
         |SELECT w.vec_id, w.cell,
         |  coalesce(grp.sem_group, w.vec_id) AS sem_group,
         |  (CASE WHEN coalesce(grp.sem_group, w.vec_id) = w.vec_id
         |        THEN 1 ELSE 0 END)::bigint AS keep
         |FROM w LEFT JOIN grp USING (vec_id) ORDER BY w.vec_id""".stripMargin,
    "q24_label_centroids" ->
      s"""WITH e AS (
         |  SELECT label, dim, sum(v) AS s, count(*) AS n FROM (
         |    SELECT vec_id, label, unnest($qv) AS v,
         |      generate_subscripts($qv, 1) - 1 AS dim
         |    FROM embeddings)
         |  GROUP BY label, dim)
         |SELECT label, sum(s::hugeint * s)::bigint AS sum_sq_sums,
         |  max(n) AS n_vectors
         |FROM e GROUP BY label ORDER BY label""".stripMargin)

  /** q73 shares q48's oracle verbatim: a probe over streamed postings
    * must hash-equal the batch trained-IVF probe.
    */
  val oracles: Map[String, String] =
    baseOracles +
      ("q73_stream_ann" -> baseOracles("q48_ivf_trained_ann")) +
      ("q106_stream_scatter" -> baseOracles("q104_pca_power"))

}
