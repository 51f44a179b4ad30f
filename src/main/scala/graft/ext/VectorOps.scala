package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType, StructField, StructType}

/** Embedding similarity-search operators.
  *
  * Exactness strategy: float vectors are quantized to int64 (×scale,
  * round) once; dot products and squared norms are then exact integer
  * sums (order-independent — 64 dims × |q|≤1000 keeps every partial sum
  * far below 2^53), and cosine is a single deterministic IEEE expression
  * `dot / (sqrt(n1)*sqrt(n2))`, so Spark and the DuckDB oracle agree
  * bit-for-bit.
  *
  * Scale strategy: brute-force top-k broadcasts the (small) query set and
  * streams the corpus — one narrow pass + a per-query top-k
  * (TakeOrdered-style via window over query partitions). The LSH variant
  * bucketizes by sign-random-projection so candidate generation is an
  * equi-join, not a cross product.
  */
object VectorOps {

  /** Quantize a float/double array column to bigint at `scale`. */
  def quantize(vec: Column, scale: Double = 1000.0): Column =
    transform(vec, x => round(x * scale).cast("long"))

  /** Exact integer dot product of two bigint array columns — a custom
    * codegen expression (the HOF formulation is interpreted-only and ~10×
    * slower on the pairwise queries).
    */
  def dotInt(a: Column, b: Column): Column = graft.functions.DotLong(a, b)

  /** Per-vector symmetric int8 quantization of an integer-scaled vector:
    * `q_i = round(v_i * 127 / max|v|)`, range [-127, 127] — the memory
    * lever for ANN at 100 TB (an int8 corpus is 8× smaller than the int64
    * working form, so 8× more of the index fits in executor memory or a
    * broadcast). Rounding is half-up on the magnitude, computed as
    * `(|v|*254 + m) div (2m)` so the oracle's integer `//` reproduces it
    * exactly; the engine's `floor(a/b)` on doubles is exact here because
    * consecutive candidate quotients differ by ≥ 1/(2m) ≫ the 1e-14
    * division ulp (a,b ≤ 2^31 ≪ 2^53). Zero vectors quantize to zeros.
    */
  def int8Quantize(vec: Column): Column = {
    val m = array_max(transform(vec, v => abs(v)))
    when(m === 0, transform(vec, _ => lit(0L)))
      .otherwise(transform(vec, v =>
        when(v < 0, -floor(((-v) * 254 + m) / (m * 2)))
          .otherwise(floor((v * 254 + m) / (m * 2))).cast("long")))
  }

  /** Cosine from quantized vectors: one deterministic IEEE expression. */
  def cosineInt(a: Column, b: Column): Column =
    dotInt(a, b).cast("double") /
      (sqrt(dotInt(a, a).cast("double")) * sqrt(dotInt(b, b).cast("double")))

  /** Euclidean norm of a quantized vector, precomputed once per row so
    * pairwise scoring does one dot product per pair instead of three.
    * `dot/(n1*n2)` is bit-identical to `cosineInt` (same IEEE ops).
    */
  def normInt(vec: Column): Column = sqrt(dotInt(vec, vec).cast("double"))

  private def cosinePre(v1: Column, n1: Column, v2: Column, n2: Column): Column =
    dotInt(v1, v2).cast("double") / (n1 * n2)

  /** Expand a per-group top-k array (from [[graft.functions.TopKAgg]])
    * into (group, rank, id, score) rows; tie-break (score desc, id asc)
    * matches a `row_number` window exactly.
    */
  private def explodeTopK(agged: DataFrame, groupCol: String, topCol: String,
      idName: String, scoreName: String): DataFrame =
    agged.select(col(groupCol), posexplode(col(topCol)).as(Seq("_r", "_s")))
      .select(col(groupCol), (col("_r") + 1).cast("int").as("rank"),
        col("_s.id").as(idName), col("_s.score").as(scoreName))

  /** Brute-force cosine top-k: broadcast the query side, join-free scan of
    * the corpus, per-query top-k via a bounded aggregate (map-side partial
    * top-k, shuffle carries ≤k entries per query per partition) — never a
    * one-partition-per-query window, which would put the whole scored
    * corpus into #queries partitions. Norms are computed once per side
    * before the join.
    *
    * The broadcast side is BOUNDED: the query set is counted up front and
    * the operator refuses query sets above `maxQueryRows` rather than
    * silently broadcasting an unbounded DataFrame into every executor —
    * flip the sides or use `lshTopK` when both sides are large. The
    * guard count is EAGER (one job at construction over the persisted
    * query side, which the subsequent join reuses): build the operator
    * only when you are about to execute it, inside a `Caches.scoped`
    * block that owns the cache lifecycle.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec",
      maxQueryRows: Long = 100000L): DataFrame = {
    val qSide = graft.Caches.persisted(queries)
    val nQueries = qSide.count()
    require(nQueries <= maxQueryRows,
      s"bruteForceTopK broadcasts the query side: $nQueries rows > bound $maxQueryRows; " +
        "swap sides or use lshTopK when both sides are large")
    val q = qSide.withColumn("q_nrm", normInt(col(qVec)))
    val c = corpus.withColumn("c_nrm", normInt(col(cVec)))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine", cosinePre(col(qVec), col("q_nrm"), col(cVec), col("c_nrm")))
    val topk = udaf(new graft.functions.TopKAgg(k))
    explodeTopK(
      scored.groupBy(col(qId)).agg(topk(col(cId), col("cosine")).as("top")),
      qId, "top", cId, "cosine")
  }

  /** Semi-hard negative mining — the triplet-mining operator a
    * contrastive-training data pipeline runs over its embedding corpus
    * (Schroff et al., "FaceNet: A Unified Embedding for Face Recognition
    * and Clustering", CVPR 2015, §3.2): for each anchor, (a) the cosine
    * of its nearest SAME-label neighbor (the positive), and (b) its k
    * highest-cosine DIFFERENT-label neighbors (the hard negatives), each
    * flagged `semi_hard` = 1 when its cosine sits strictly below the
    * positive's — the band the triplet loss trains on (closer than the
    * positive = "too hard", typically noise/label errors).
    *
    * Inputs: anchors (q_id, q_label, q_vec-quantized), corpus (c_id,
    * c_label, c_vec-quantized). Anchors with no same-label neighbor get
    * pos_cosine = −2.0 (below any real cosine), so every negative is
    * non-semi-hard — deterministic, null-free.
    *
    * Scale shape: the anchor side broadcasts (bounded by the same eager
    * guard as [[bruteForceTopK]]); the corpus is scanned twice — once for
    * the positives (a max aggregate: shuffle carries one double per
    * anchor per partition) and once for the negatives (the bounded top-k
    * aggregate: ≤k entries per anchor per partition) — and never
    * shuffles itself. The final join is anchor-sized.
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, k: Int,
      maxAnchorRows: Long = 100000L): DataFrame = {
    val aSide = graft.Caches.persisted(anchors)
    val nAnchors = aSide.count()
    require(nAnchors <= maxAnchorRows,
      s"hardNegatives broadcasts the anchor side: $nAnchors rows > bound $maxAnchorRows; " +
        "mine in anchor batches when the anchor set is corpus-sized")
    val q = aSide.withColumn("q_nrm", normInt(col("q_vec")))
    val c = corpus.withColumn("c_nrm", normInt(col("c_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosinePre(col("q_vec"), col("q_nrm"), col("c_vec"), col("c_nrm")))
    val pos = scored.filter(col("q_label") === col("c_label"))
      .groupBy(col("q_id")).agg(max(col("cosine")).as("pos_cosine"))
    val topk = udaf(new graft.functions.TopKAgg(k))
    val neg = explodeTopK(
      scored.filter(col("q_label") =!= col("c_label"))
        .groupBy(col("q_id")).agg(topk(col("c_id"), col("cosine")).as("top")),
      "q_id", "top", "c_id", "cosine")
    neg.join(pos, Seq("q_id"), "left")
      .withColumn("pos_cosine", coalesce(col("pos_cosine"), lit(-2.0)))
      .withColumn("semi_hard", (col("cosine") < col("pos_cosine")).cast("long"))
  }

  /** All pairs above a cosine threshold (near-duplicate detection).
    * Quadratic candidate set — intended for bounded corpora / within-
    * bucket refinement; `lshTopK` is the scale path. The bound is
    * ENFORCED: the (persisted) input is counted up front and the operator
    * refuses corpora above `maxRows` rather than silently planning a
    * BroadcastNestedLoopJoin cross product over an unbounded corpus.
    * `maxRows` is ALSO a driver-heap bound: the corpus is collected and
    * broadcast as primitive (id, vec, norm) tuples, ~n·(8·d + ~64) bytes
    * of driver memory at the default 100k rows — size it to the driver,
    * not just to the pair count. `idCol` must be a non-null-safe INTEGRAL
    * column (enforced with a named error); rows with a null id or null
    * vector never pair, exactly as the join form null-propagated them.
    */
  def thresholdPairs(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "qvec",
      maxRows: Long = 100000L): DataFrame = {
    val spark = vectors.sparkSession
    val idType = vectors.schema(idCol).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"thresholdPairs needs an integral $idCol (got ${idType.simpleString}): " +
        "a lossy cast would silently corrupt pair identities")
    val withNorm = graft.Caches.persisted(vectors.withColumn("nrm", normInt(col(vecCol))))
    val n = withNorm.count()
    require(n <= maxRows,
      s"thresholdPairs is O(n^2): corpus has $n rows > bound $maxRows; use lshTopK at scale")
    // One flat broadcast of the (guard-bounded) corpus, then a tight
    // per-pair loop — the former `a.join(b, id1 < id2)` planned as a
    // BroadcastNestedLoopJoin that shipped the SAME broadcast but
    // materialized two 8·d-byte array copies into an UnsafeRow per
    // candidate pair (n²/2 of them) before scoring; at 20k vectors
    // that row churn was ~25x the dot-product work (182 s vs 7 s at
    // the 10x fixture, 16 cores). Arithmetic is bit-identical to the
    // old cosinePre expression: exact long dot over min-length (the
    // DotLong contract), then dot.toDouble / (n1 * n2) in the same
    // IEEE op order; null ids and null vectors never pair (the old
    // join/expression null-propagated them out of the result). One
    // deliberate divergence: a ZERO vector scores 0.0/0.0 = NaN here
    // and never pairs (NaN >= threshold is false), where the join form
    // under ANSI mode (Spark 4 default) would ERROR the whole query
    // with DIVIDE_BY_ZERO — PropertySpec pins the NaN-drop.
    // RDD justification (brief): a triangular all-pairs scan resuming
    // per slice is genuine per-partition imperative logic. The collect
    // maps Rows to primitive tuples ON THE EXECUTORS, so the driver
    // holds one flat tuple per row, not Row/Seq wrappers.
    val corpus: Array[(Long, Array[Long], Double)] = withNorm
      .select(col(idCol).cast("long"), col(vecCol), col("nrm"))
      .where(col(vecCol).isNotNull && col(idCol).isNotNull)
      .rdd.map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getDouble(2)))
      .collect()
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    // residue-class slicing balances the triangular row costs (row i
    // scores n-1-i pairs; contiguous chunks would give the first task
    // ~2x the mean work)
    val slices = (0 until parts).map(p => (p until corpus.length by parts).toArray)
    val pairRows = spark.sparkContext.parallelize(slices, parts).flatMap { idxs =>
      val corp = bc.value
      idxs.iterator.flatMap { i1 =>
        val (id1, v1, n1) = corp(i1)
        Iterator.range(i1 + 1, corp.length).flatMap { i2 =>
          val (id2, v2, n2) = corp(i2)
          // id-sorted: i1 < i2 gives id1 <= id2; the strict check keeps
          // the old join's `id1 < id2` semantics under duplicate ids
          if (id2 == id1) None
          else {
            val d = math.min(v1.length, v2.length)
            var dot = 0L
            var i = 0
            while (i < d) { dot += v1(i) * v2(i); i += 1 }
            val cos = dot.toDouble / (n1 * n2)
            if (cos >= threshold) Some(Row(id1, id2, cos)) else None
          }
        }
      }
    }
    // id1/id2 go back to the INPUT id type — the join form's output
    // schema, not the kernel's internal widening
    spark.createDataFrame(pairRows, StructType(Seq(
        StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false),
        StructField("cosine", DoubleType, nullable = false))))
      .select(col("id1").cast(idType).as("id1"),
        col("id2").cast(idType).as("id2"), col("cosine"))
  }

  /** Sign-random-projection LSH bucket key: `planes` deterministic
    * hyperplanes with ±1 integer coefficients derived from md5 of
    * (plane, dim) — exact integer dot signs, reproducible anywhere.
    * Vectors sharing a bucket key are ANN candidates; candidate
    * generation becomes a shuffle on the key instead of a cross join.
    */
  def srpBucket(vec: Column, dims: Int, planes: Int = 12): Column = {
    val bits = (0 until planes).map { p =>
      val coeffs = (0 until dims).map { d =>
        // ±1 from one md5-derived bit per (plane, dim)
        val bit = conv(substring(md5(lit(s"srp-$p-$d")), 1, 8), 16, 10)
          .cast("long").bitwiseAND(lit(1L))
        (bit * 2 - 1) * element_at(vec, d + 1)
      }
      val dot = coeffs.reduce(_ + _)
      when(dot > 0, lit(1)).otherwise(lit(0))
    }
    concat_ws("", bits.map(_.cast("string")): _*)
  }

  /** IVF-style ANN: a coarse codebook partitions the corpus into cells;
    * queries probe their `nprobe` nearest centroids and re-rank exactly
    * only within the probed cells — the inverted-file shape where
    * candidate generation is an equi-join on cell id (shuffle bounded by
    * cell sizes), never a cross product, and the codebook is a broadcast.
    *
    * The codebook here is the per-label centroid (exact and
    * deterministic; [[kmeansCodebook]] is the REAL trainer — swap the
    * codebook construction, assign/probe/re-rank stay identical). All
    * centroid arithmetic is integer (truncating-divided sums at 1e-6
    * scale), so assignment and probing are bit-reproducible in SQL.
    *
    * @param vectors (idCol, labelCol, vecCol-quantized) corpus
    * @param queries predicate selecting the query subset by id
    */
  def ivfTopK(vectors: DataFrame, isQuery: Column => Column, k: Int, nprobe: Int,
      idCol: String = "vec_id", labelCol: String = "label",
      vecCol: String = "qvec"): DataFrame = {
    val vecs = graft.Caches.persisted(vectors.select(col(idCol), col(labelCol), col(vecCol),
      normInt(col(vecCol)).as("nrm")))

    // Codebook: per-cell, per-dim (sum·1000) div count — truncating
    // INTEGER division (matching DuckDB's `//`), so centroids are exact
    // and identical in both engines; tiny (cells × dims), broadcast.
    val byDim = vecs.select(col(labelCol).as("cell"), posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("s * 1000 div n"))
    val codebook = byDim.groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col("cell"), transform(col("dc"), e => e.getField("c")).as("cvec"))

    // Assignment: argmin over cells of the exact integer distance
    // (x·1000 − c)² summed — min(struct(dist2, cell)) gives the
    // deterministic (dist2 asc, cell asc) argmin without a window.
    val dist2 = graft.functions.Dist2Long(col(vecCol), col("cvec"), 1000L)
    val scoredCells = vecs.crossJoin(broadcast(codebook))
      .withColumn("dist2", dist2)
    val assigned = scoredCells.groupBy(col(idCol))
      .agg(min(struct(col("dist2"), col("cell"))).as("best"))
      .select(col(idCol).as("c_id"), col("best.cell").as("cell"))
      .join(vecs.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"), col("nrm").as("c_nrm")), "c_id")

    // Probes: nprobe nearest cells per query (cells-per-query is the
    // codebook size — a bounded window, no skew).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist2").asc, col("cell").asc)
    val probes = scoredCells.filter(isQuery(col(idCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col(idCol).as("q_id"), col("cell"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))

    // Candidates = probed cells' members; exact cosine re-rank, bounded
    // top-k aggregate (map-side partial).
    val candidates = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosinePre(col("q_vec"), col("q_nrm"), col("c_vec"), col("c_nrm")))
    val topk = udaf(new graft.functions.TopKAgg(k))
    explodeTopK(
      candidates.groupBy(col("q_id")).agg(topk(col("c_id"), col("cosine")).as("top")),
      "q_id", "top", "c_id", "cosine")
  }

  /** IVF probe against an EXTERNALLY TRAINED codebook — the second half
    * of the production "train index → assign → probe → re-rank" path
    * ([[kmeansCodebook]] is the first half; [[ivfTopK]] is the
    * label-centroid stand-in that fuses both for the legacy gate).
    * Identical physical shape: the codebook broadcasts, assignment is an
    * argmin over the broadcast (no shuffle beyond the per-id agg), probing
    * is a bounded window over codebook-sized groups, candidate generation
    * is an equi-join on cell id, and the re-rank is the bounded top-k
    * aggregate. Codebook schema: (cell: long, cvec: array<long>) at scale
    * 1000 — exactly what [[kmeansCodebook]] returns.
    */
  def ivfProbeTopK(vectors: DataFrame, codebook: DataFrame,
      isQuery: Column => Column, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val vecs = graft.Caches.persisted(vectors.select(col(idCol), col(vecCol),
      normInt(col(vecCol)).as("nrm")))
    probePostings(vecs.filter(isQuery(col(idCol))), codebook,
      postingsOf(vecs, codebook, idCol, vecCol), k, nprobe, idCol, vecCol)
  }

  /** IVF postings rows `(cell, c_id, c_vec, c_nrm)` for a vector set —
    * the INDEX side of the probe, split out so a streaming ingester
    * ([[graft.streaming.AnnStream]]) can maintain it incrementally: one
    * argmin over the broadcast codebook per vector, no shuffle beyond
    * the per-id aggregation. Input needs (idCol, vecCol, nrm).
    */
  def postingsOf(vecs: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val dist2 = graft.functions.Dist2Long(col(vecCol), col("cvec"), 1000L)
    vecs.crossJoin(broadcast(codebook))
      .withColumn("dist2", dist2)
      .groupBy(col(idCol))
      .agg(min(struct(col("dist2"), col("cell"))).as("best"))
      .select(col(idCol).as("c_id"), col("best.cell").as("cell"))
      .join(vecs.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        col("nrm").as("c_nrm")), "c_id")
      .select(col("cell"), col("c_id"), col("c_vec"), col("c_nrm"))
  }

  /** Probe an IVF postings table: each query scores the broadcast
    * codebook, keeps its `nprobe` closest cells (bounded per-query
    * window over codebook-sized groups), equi-joins the postings on
    * cell id, and re-ranks with the bounded top-k aggregate — the
    * SERVE side of the index, identical whether the postings came from
    * one batch pass or from streamed increments. Queries need
    * (idCol, vecCol, nrm).
    */
  def probePostings(queries: DataFrame, codebook: DataFrame, postings: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val dist2 = graft.functions.Dist2Long(col(vecCol), col("cvec"), 1000L)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist2").asc, col("cell").asc)
    val probes = queries.crossJoin(broadcast(codebook))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col(idCol).as("q_id"), col("cell"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    val candidates = probes.join(postings, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosinePre(col("q_vec"), col("q_nrm"), col("c_vec"), col("c_nrm")))
    val topk = udaf(new graft.functions.TopKAgg(k))
    explodeTopK(
      candidates.groupBy(col("q_id")).agg(topk(col("c_id"), col("cosine")).as("top")),
      "q_id", "top", "c_id", "cosine")
  }

  /** Deterministic integer k-means (Lloyd) codebook trainer — the real
    * replacement for ivfTopK's label-centroid stand-in. Everything is
    * exact int64 arithmetic so any SQL engine reproduces the training
    * bit-for-bit:
    *
    *   - seeds: bucket the ID RANGE into k spans (`(id−lo)·k div span`)
    *     and take the smallest id per span — spread over the actual id
    *     domain, no RNG, no dense-0-based assumption, no global sort
    *     (one min/max agg + one groupBy); sparse spans simply yield
    *     fewer cells, which Lloyd handles (×1000 to centroid scale);
    *   - assign: argmin over cells of Σ(x·1000 − c)², ties to the lower
    *     cell id (min over (dist2, cell) structs — no window);
    *   - update: c[d] = (Σx)·1000 div count — truncating integer
    *     division, matching DuckDB's `//`;
    *   - `iters` full Lloyd rounds, unrolled into the plan (k is small:
    *     the codebook is a broadcast at every step; the only shuffles
    *     are the k·dims-sized centroid aggregations).
    *
    * Empty cells drop out (both engines aggregate only assigned cells).
    * Returns (cell, cvec) at scale 1000, ready for [[ivfTopK]]-style
    * assign/probe/re-rank.
    */
  /** Process-wide memo of TRAINED codebooks, keyed by the canonicalized
    * input plan + training params + a CONTENT SNAPSHOT of every file
    * relation the plan reads. The trainer is fully deterministic,
    * so two calls over the same input produce the identical k×dims
    * table — re-running the unrolled Lloyd plan per query (q38, q48,
    * q82's assignment, q73's stream index, q94's four subspace slices
    * all train over the same corpus read) is pure re-computation.
    * Entries are k×dims longs (KBs); lookups compare plans with
    * `sameResult` (exact, collision-free — the same mechanism Spark's
    * own CacheManager uses), never a hash that could alias two inputs.
    * Hits return a LocalRelation, which downstream consumers broadcast
    * exactly as they broadcast the lazily-trained frame, so result
    * hashes are unchanged by construction.
    *
    * The snapshot closes the staleness hole plan comparison alone
    * leaves open: two scans of the same root path compare `sameResult`
    * even if the directory was REWRITTEN between them (file indexes
    * canonicalize by root path, not contents), so a fixture
    * regeneration within one JVM would otherwise return a codebook
    * trained on the old bytes. A plan+params match whose snapshot
    * differs EVICTS the stale entry and retrains, which also bounds
    * growth under rewrite loops.
    */
  private val codebookMemo = scala.collection.mutable.ArrayBuffer.empty[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int,
      String, String, String, Array[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType)]
  private val CodebookMemoMax = 64

  /** (path, length, mtime) fingerprint of every file-source relation in
    * `plan` — listed through each relation's own (memoized) file index,
    * so a memo probe costs no re-listing; a NEW scan of a rewritten dir
    * builds a new index and therefore a different snapshot.
    */
  private def contentSnapshot(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val sb = new StringBuilder
    plan.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.listFiles(Nil, Nil).foreach(_.files.foreach { f =>
              sb.append(f.getPath.toString).append(':').append(f.getLen)
                .append(':').append(f.getModificationTime).append(';')
            })
          case _ => ()
        }
      case _ => ()
    }
    sb.result()
  }

  def kmeansCodebook(vectors: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val spark = vectors.sparkSession
    val keyPlan = vectors.queryExecution.analyzed.canonicalized
    val snapshot = contentSnapshot(vectors.queryExecution.analyzed)
    def asLocal(rows: Array[org.apache.spark.sql.Row],
        schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val hit = codebookMemo.synchronized {
      // evict plan-equal entries whose underlying files changed — they
      // can never hit again and would mask the retrained entry
      val stale = codebookMemo.indices.filter { i =>
        val (p, k2, i2, id2, v2, snap2, _, _) = codebookMemo(i)
        k2 == k && i2 == iters && id2 == idCol && v2 == vecCol &&
          p.sameResult(keyPlan) && snap2 != snapshot
      }
      stale.reverseIterator.foreach(codebookMemo.remove(_))
      codebookMemo.find { case (p, k2, i2, id2, v2, snap2, _, _) =>
        k2 == k && i2 == iters && id2 == idCol && v2 == vecCol &&
          snap2 == snapshot && p.sameResult(keyPlan)
      }
    }
    hit match {
      case Some((_, _, _, _, _, _, rows, schema)) => return asLocal(rows, schema)
      case None                                   => ()
    }
    val vecs = graft.Caches.persisted(vectors.select(col(idCol), col(vecCol)))
    val Array(lo, hi) = vecs.agg(min(col(idCol)), max(col(idCol)))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val span = hi - lo + 1
    // cell = id-range bucket; smallest id per bucket is its seed. Works
    // for any id domain (offset, sparse); empty buckets drop out.
    // `div` (not `/`) keeps the arithmetic integral.
    val bucket = expr(s"(($idCol - ${lo}L) * $k) div ${span}L")
    var codebook = vecs
      .groupBy(bucket.cast("long").as("cell"))
      .agg(min(struct(col(idCol), col(vecCol))).as("seed"))
      .select(col("cell"), transform(col("seed").getField(vecCol), x => x * 1000L).as("cvec"))

    val dist2 = graft.functions.Dist2Long(col(vecCol), col("cvec"), 1000L)

    (0 until iters).foreach { _ =>
      val assigned = vecs.crossJoin(broadcast(codebook))
        .withColumn("dist2", dist2)
        .groupBy(col(idCol))
        .agg(min(struct(col("dist2"), col("cell"))).as("best"))
        .select(col(idCol), col("best.cell").as("cell"))
      val byDim = vecs.join(assigned, idCol)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
        .withColumn("c", expr("s * 1000 div cnt"))
      codebook = byDim.groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
        .select(col("cell"), transform(col("dc"), e => e.getField("c")).as("cvec"))
      // Each unrolled round nests the whole prior plan under a broadcast,
      // so analyzer/optimizer cost grows superlinearly with `iters`. The
      // codebook is k rows — an eager localCheckpoint (executor-memory
      // materialization, no checkpoint dir needed) costs one tiny job and
      // keeps plan size constant per round. Skipped at toy iteration
      // counts so the gated q38 plan (iters=2) is byte-identical to r3.
      if (iters > 2) codebook = codebook.localCheckpoint()
    }
    // Materialize the trained k×dims table once and memo it; every
    // caller (this one included) consumes the LocalRelation form.
    val rows = codebook.collect()
    val schema = codebook.schema
    codebookMemo.synchronized {
      if (codebookMemo.size < CodebookMemoMax)
        codebookMemo += ((keyPlan, k, iters, idCol, vecCol, snapshot, rows, schema))
    }
    asLocal(rows, schema)
  }

  /** Final cell assignment for a trained codebook (argmin of the exact
    * integer distance, ties to the lower cell id).
    */
  def assignToCodebook(vectors: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val dist2 = graft.functions.Dist2Long(col(vecCol), col("cvec"), 1000L)
    vectors.crossJoin(broadcast(codebook))
      .withColumn("dist2", dist2)
      .groupBy(col(idCol))
      .agg(min(struct(col("dist2"), col("cell"))).as("best"))
      .select(col(idCol), col("best.dist2").as("dist2"), col("best.cell").as("cell"))
  }

  /** Embedding-cosine near-duplicate DEDUP — the vector analog of the
    * text pipeline's LSH near-dup drop (TextPack corpus-clean): SRP-bucket
    * the corpus (plane count sized by the caller via [[planesForCorpus]]
    * so bucket occupancy stays ~constant as the corpus grows), form
    * candidate pairs ONLY within buckets (equi-join on the bucket key,
    * never a cross product), gate on exact integer-quantized cosine ≥
    * `threshold`, and drop every vector that has a smaller-id near-dup
    * (the same deterministic keep-first-by-id rule the exact-dedup path
    * uses). Returns the surviving rows of `vectors` unchanged.
    *
    * Single-band SRP: recall is approximate by design (same contract as
    * the ANN path); the exact quadratic [[thresholdPairs]] is the
    * bounded-corpus alternative.
    *
    * Hot buckets (a cluster of near-identical embeddings lands every
    * member in ONE bucket) have the same wired mitigation as the text
    * band joins: `salts > 1` routes the self-join through
    * [[graft.operators.Skew.saltedJoin]] — row-identical results, max
    * reducer input shrunk ~salts×. The gated query keeps salts = 1 (the
    * fixture corpus is not skewed).
    */
  def nearDupSurvivors(vectors: DataFrame, threshold: Double, dims: Int,
      planes: Int, idCol: String = "vec_id", vecCol: String = "qvec",
      salts: Int = 1): DataFrame = {
    val bucketed = graft.Caches.persisted(vectors
      .select(col(idCol), col(vecCol))
      .withColumn("bucket", srpBucket(col(vecCol), dims, planes))
      .withColumn("nrm", normInt(col(vecCol))))
    val a = bucketed.select(col("bucket"), col(idCol).as("id1"),
      col(vecCol).as("v1"), col("nrm").as("n1"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id2"),
      col(vecCol).as("v2"), col("nrm").as("n2"))
    val joined =
      if (salts <= 1) a.join(b, "bucket")
      else graft.operators.Skew.saltedJoin(a, b, Seq("bucket"), salts)
    val dropped = joined
      .filter(col("id1") < col("id2"))
      .filter(cosinePre(col("v1"), col("n1"), col("v2"), col("n2")) >= threshold)
      .select(col("id2").as(idCol))
      .distinct() // multi-collision pairs drop an id once
    vectors.join(dropped, Seq(idCol), "left_anti")
  }

  /** Product-quantization ANN with asymmetric distance computation
    * (Jégou, Douze & Schmid, "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011) — the third leg of the compression
    * triad beside int8 ([[int8Quantize]]) and IVF ([[ivfProbeTopK]]):
    * split the `m·subDim`-dim vector into `m` subspaces, train an
    * independent `ks`-cell integer Lloyd codebook per subspace
    * ([[kmeansCodebook]] on the sliced frame — identical trainer,
    * identical determinism), and store each vector as `m` small cell
    * codes (m·log2(ks) bits — 4×8 cells = 12 bits here vs 512 int8
    * bits: the index that fits 40× more corpus in executor memory).
    * Queries never decompress: ADC scores a candidate as
    * Σ_m table_m[code_m], where table_m is the query's EXACT integer
    * distance to each subspace centroid — all int64 arithmetic, so
    * the oracle reproduces every distance bit-for-bit.
    *
    * Returned rows: (q_id, rank, c_id, approx_dist2) by ascending
    * approximate distance, ties to the smaller c_id.
    *
    * Scale shape: codebooks are m·ks rows (broadcast); encoding is m
    * argmin-aggregations (the kmeans assign shape); the ADC tables are
    * (#queries · ks) rows per subspace (broadcast); candidate scoring
    * is m broadcast hash joins on the code columns + the bounded
    * top-k aggregate — the corpus streams through once and never
    * shuffles until the ≤k-per-group partial top-k.
    */
  def pqTopK(vectors: DataFrame, isQuery: Column => Column, k: Int,
      m: Int, subDim: Int, ks: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val vecs = graft.Caches.persisted(vectors.select(col(idCol), col(vecCol)))
    val dist2 = (i: Int) => graft.functions.Dist2Long(
      slice(col(vecCol), i * subDim + 1, subDim), col("cvec"), 1000L)
    // per-subspace codebook + code column, accumulated onto one frame
    var enc = vecs.select(col(idCol).as("c_id"))
    val codebooks = (0 until m).map { i =>
      val sub = vecs.select(col(idCol),
        slice(col(vecCol), i * subDim + 1, subDim).as(vecCol))
      val cb = kmeansCodebook(sub, ks, iters, idCol, vecCol)
      val codes = assignToCodebook(sub, cb, idCol, vecCol)
        .select(col(idCol).as("c_id"), col("cell").as(s"cell_$i"))
      enc = enc.join(codes, "c_id")
      cb
    }
    // ADC: query × codebook exact distance tables, broadcast-joined
    // onto the code columns
    val queries = vecs.filter(isQuery(col(idCol)))
    var cur = enc
    (0 until m).foreach { i =>
      val tab = queries.crossJoin(broadcast(codebooks(i)))
        .select(col(idCol).as("q_id"), col("cell").as(s"cell_$i"),
          dist2(i).as(s"d_$i"))
      val keys = if (i == 0) Seq(s"cell_$i") else Seq("q_id", s"cell_$i")
      cur = cur.join(broadcast(tab), keys)
    }
    val approx = cur.filter(col("q_id") =!= col("c_id"))
      .withColumn("approx_dist2", (0 until m).map(i => col(s"d_$i")).reduce(_ + _))
    // smallest-distance top-k via the bounded aggregate: score = −dist
    // (exact in double — quantized distances stay far below 2^53)
    val topk = udaf(new graft.functions.TopKAgg(k))
    explodeTopK(
      approx.groupBy(col("q_id"))
        .agg(topk(col("c_id"), -col("approx_dist2").cast("double")).as("top")),
      "q_id", "top", "c_id", "neg_dist")
      .select(col("q_id"), col("rank"), col("c_id"),
        (-col("neg_dist")).cast("long").as("approx_dist2"))
  }

  /** Exact squared-L2 top-k (ascending distance, ties to smaller id)
    * over integer-quantized vectors — the ground-truth side of the PQ
    * recall gate. Same broadcast-query/bounded-aggregate shape as
    * [[bruteForceTopK]]; the pair distance is |q|² + |c|² − 2·q·c from
    * three exact integer dot products (norms precomputed per side).
    */
  def bruteForceL2TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec",
      maxQueryRows: Long = 100000L): DataFrame = {
    val qSide = graft.Caches.persisted(queries)
    val nQueries = qSide.count()
    require(nQueries <= maxQueryRows,
      s"bruteForceL2TopK broadcasts the query side: $nQueries rows > bound $maxQueryRows")
    val q = qSide.withColumn("q_n2", dotInt(col(qVec), col(qVec)))
    val c = corpus.withColumn("c_n2", dotInt(col(cVec), col(cVec)))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(qId) =!= col(cId))
      .withColumn("dist2",
        col("q_n2") + col("c_n2") - lit(2L) * dotInt(col(qVec), col(cVec)))
    val topk = udaf(new graft.functions.TopKAgg(k))
    explodeTopK(
      scored.groupBy(col(qId))
        .agg(topk(col(cId), -col("dist2").cast("double")).as("top")),
      qId, "top", cId, "neg_dist")
      .select(col(qId), col("rank"), col(cId),
        (-col("neg_dist")).cast("long").as("dist2"))
  }

  /** k-center greedy coreset selection (farthest-first traversal —
    * Gonzalez, "Clustering to minimize the maximum intercluster
    * distance", TCS 1985; the 2-approximation behind coreset-based
    * data selection): seed with the smallest id, then k−1 times pick
    * the point FARTHEST from its nearest chosen center (ties to the
    * smaller id). Distances are exact integer squared-L2, so the
    * whole trajectory is reproducible in SQL.
    *
    * Returns (round, center_id, d2) — d2 = the selected point's
    * distance to the existing centers at selection time (0 for the
    * seed); the last row's d2 upper-bounds every point's distance to
    * the final coreset (the coverage radius, within the greedy
    * guarantee).
    *
    * Scale shape: the classic O(n·k) incremental form — per round ONE
    * broadcast of the single new center, one narrow `least` update of
    * the per-point min-distance frame (re-persisted so round r+1 does
    * not recompute rounds 1..r), and one 1-row argmax fold; the
    * corpus never shuffles and the selected center never routes
    * through the driver.
    */
  def kCenterCoreset(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    require(k >= 1, "kCenterCoreset needs k >= 1")
    val vecs = graft.Caches.persisted(vectors.select(col(idCol), col(vecCol),
      dotInt(col(vecCol), col(vecCol)).as("n2")))
    val d2New = col("n2") + col("c_n2") - lit(2L) * dotInt(col(vecCol), col("c_vec"))
    // seed: smallest id, d2 = 0
    var center = vecs
      .agg(min(struct(col(idCol), col(vecCol), col("n2"))).as("m"))
      .select(lit(1L).as("round"), col(s"m.$idCol").as("center_id"),
        col(s"m.$vecCol").as("c_vec"), col("m.n2").as("c_n2"), lit(0L).as("d2"))
    val rounds = scala.collection.mutable.ArrayBuffer(
      center.select(col("round"), col("center_id"), col("d2")))
    // per-point min distance to the chosen set, updated incrementally;
    // only the center's vector/norm join in (its round/d2 columns would
    // collide with the state frame's)
    def centerSide(c: DataFrame) = broadcast(c.select(col("c_vec"), col("c_n2")))
    var mind = vecs.crossJoin(centerSide(center))
      .select(col(idCol), col(vecCol), col("n2"), d2New.as("d2"))
    (2 to k).foreach { r =>
      mind = graft.Caches.persisted(mind)
      center = mind
        .agg(max(struct(col("d2"), (-col(idCol)).as("negid"),
          col(vecCol).as("v"), col("n2").as("vn2"))).as("m"))
        .select(lit(r.toLong).as("round"), (-col("m.negid")).as("center_id"),
          col("m.v").as("c_vec"), col("m.vn2").as("c_n2"), col("m.d2").as("d2"))
      rounds += center.select(col("round"), col("center_id"), col("d2"))
      mind = mind.crossJoin(centerSide(center))
        .select(col(idCol), col(vecCol), col("n2"),
          least(col("d2"), d2New).as("d2"))
    }
    rounds.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** Number of SRP hyperplanes sized to the corpus: 2^planes buckets,
    * targeting ~`targetBucketSize` vectors per bucket so within-bucket
    * candidate sets stay bounded as the corpus grows (a fixed plane count
    * would make bucket occupancy — and the quadratic within-bucket join —
    * grow linearly with corpus size).
    */
  def planesForCorpus(corpusSize: Long, targetBucketSize: Long = 1024L,
      minPlanes: Int = 4, maxPlanes: Int = 24): Int =
    // Integer-exact formulation (smallest p with 2^p·target ≥ n), so a SQL
    // oracle deriving the same count never disagrees on a log2 tie.
    (minPlanes to maxPlanes)
      .find(p => (1L << p) * targetBucketSize >= corpusSize)
      .getOrElse(maxPlanes)

  /** LSH-bucketed ANN: bucket both sides on the SRP key, equi-join within
    * buckets, then exact re-rank per query via the bounded top-k aggregate
    * (map-side partial, no per-vector window sort). Recall depends on
    * `planes` — size it with [[planesForCorpus]] so buckets stay ~constant
    * as the corpus grows; the scan is linear and the join shuffles only
    * bucket-sized groups.
    */
  def lshTopK(vectors: DataFrame, k: Int, dims: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "qvec"): DataFrame = {
    val bucketed = graft.Caches.persisted(vectors
      .withColumn("bucket", srpBucket(col(vecCol), dims, planes))
      .withColumn("nrm", normInt(col(vecCol))))
    val a = bucketed.select(col(idCol).as("id1"), col(vecCol).as("v1"), col("nrm").as("n1"), col("bucket"))
    val b = bucketed.select(col(idCol).as("id2"), col(vecCol).as("v2"), col("nrm").as("n2"), col("bucket"))
    val candidates = a.join(b, Seq("bucket")).filter(col("id1") =!= col("id2"))
      .withColumn("cosine", cosinePre(col("v1"), col("n1"), col("v2"), col("n2")))
    val topk = udaf(new graft.functions.TopKAgg(k))
    explodeTopK(
      candidates.groupBy(col("id1")).agg(topk(col("id2"), col("cosine")).as("top")),
      "id1", "top", "id2", "cosine")
  }

  /** Top principal direction of the exact centered scatter matrix
    * `c_ij = n·Σv[i]v[j] − (Σv[i])·(Σv[j])` (= n² × covariance, exact
    * int64 — no 1/n division, so no floats until normalization) by fixed-point power
    * iteration: v₀ = all-`vs`, then `rounds` times
    * `w = C·v` (exact int64 — C·v terms stay ≪ 2⁶³) and
    * `v ← floor(w·vs / max|w|)` — the floor of a correctly-rounded IEEE
    * double quotient, the repo's standard deterministic normalization
    * (JVM and DuckDB evaluate the identical double expression, so the
    * iterates agree bit-for-bit even where the doubles round). Sign is
    * pinned by the all-positive v₀. Returns one row per dimension:
    * (dim, c_diag, v) — the centered scatter diagonal (n² × per-dim
    * variance) and the direction component in [-vs, vs].
    *
    * Scale shape: the corpus-sized work is exactly one distributed pass
    * (the scatter aggregation); the iteration then runs DRIVER-LOCAL on
    * the collected d²-entry matrix — O(d²) = KBs of bounded metadata,
    * never corpus data, the same posture as Spark MLlib's
    * `RowMatrix.computePrincipalComponents` (distributed Gramian →
    * local eigensolve). A distributed formulation of the d-row matvec
    * loop was measured 8× slower at every SF: 32 rounds × per-round
    * job+broadcast scheduler overhead dwarfs the nanoseconds of d²
    * multiply-adds, and would STILL be pure fixed overhead on a
    * 1000-executor cluster.
    */
  def pcaPowerDirection(vectors: DataFrame, rounds: Int, vs: Long,
      vecCol: String = "qvec"): DataFrame =
    pcaFromState(scatterState(vectors, vecCol), rounds, vs)

  /** The ADDITIVE sufficient statistic of the centered scatter, as one
    * tagged frame: `(ord=2, di, dj, Σv[i]v[j])` second moments,
    * `(ord=1, -1, j, Σv[j])` first moments, `(ord=0, -1, -1, n)` count.
    * States from independent passes (micro-batches, partitions, days)
    * merge by PLAIN ADDITION — [[mergeScatterStates]] is one groupBy-sum
    * — and recompose the exact centered scatter, because every component
    * is a sum over rows. This is what makes the scatter a streaming /
    * incremental structure (the linear-algebra analog of the HLL
    * register-state merge).
    *
    * Scale shape: the d² accumulation is ONE narrow per-partition
    * kernel (mapPartitions over the vector column, a primitive
    * long[d²]+long[d] Gramian accumulator — O(d²) state per partition,
    * never per row) followed by a groupBy(ord,di,dj) sum whose shuffle
    * carries parts × (d²+d+1) partial rows, independent of n. This
    * replaced the nested-transform-explode form, which materialized
    * n·d² InternalRows into the hash aggregate just to add longs —
    * measured 26.2 → ~2 s on q104 at 20 000×64² (the explode row churn
    * was ~90 % of the operator; integer sums are order-invariant, so
    * the hashes are unchanged). mapPartitions is warranted here by the
    * repo's own rule for it: genuine per-partition imperative state
    * that no expression shape can carry. Magnitudes: |v|≤~10³ per dim,
    * so n·G − s·sᵀ entries ≤ 2·n²·10⁶ — int64-safe to n ≈ 2×10⁶, and
    * the envelope is ENFORCED by a `require` before the scan (a silent
    * wrap would corrupt hashes; out-of-envelope corpora must rescale
    * the quantization, not the shape).
    */
  def scatterState(vectors: DataFrame, vecCol: String = "qvec"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val cached = graft.Caches.persisted(
      vectors.select(col(vecCol).cast("array<bigint>").as(vecCol)))
    // Fail LOUDLY if the documented int64 envelope is exceeded, instead
    // of letting a silent wrap corrupt hashes at scale: every centered-
    // scatter entry is bounded by |n·G_ij − s_i·s_j| ≤ 2·n²·vmax²
    // (|G_ij| ≤ n·vmax², |s_i| ≤ n·vmax), so the pre-scan check is
    // one cheap (count, max|v|) aggregate over the already-persisted
    // frame, with the bound itself evaluated in BigInt so the guard
    // cannot overflow either. Out-of-envelope corpora rescale the
    // quantization (the vs in [[pcaPowerDirection]]), not the shape.
    val env = cached.agg(count(lit(1)).as("n"),
      max(expr(s"aggregate($vecCol, 0L, (a, x) -> greatest(a, abs(x)))")).as("vmax"))
      .head()
    val nRows = env.getLong(0)
    val vmax = if (env.isNullAt(1)) 0L else env.getLong(1)
    require(
      BigInt(2) * BigInt(nRows) * BigInt(nRows) * BigInt(vmax) * BigInt(vmax)
        <= BigInt(Long.MaxValue),
      s"scatterState int64 envelope exceeded: n=$nRows rows at max|v|=$vmax " +
        s"gives centered-scatter entries up to 2·n²·vmax² > 2⁶³−1; " +
        s"rescale the vector quantization before computing the scatter")
    val partials = cached.rdd.mapPartitions { rows =>
      var d = 0
      var g: Array[Long] = null
      var s: Array[Long] = null
      var n = 0L
      rows.foreach { row =>
        n += 1 // count EVERY row (a null vector counts, as count(1) did)
        if (!row.isNullAt(0)) {
          val seq = row.getSeq[Any](0)
          if (g == null) {
            d = seq.length; g = new Array[Long](d * d); s = new Array[Long](d)
          }
          require(seq.length == d,
            s"scatterState: mixed vector lengths (${seq.length} vs $d)")
          val v = new Array[Long](d)
          var i = 0
          while (i < d) {
            // reject (don't NPE, don't silently skip) a null ELEMENT —
            // a hole inside a fixed-width embedding is corrupt input
            // and skipping it would shift every moment it touches
            require(seq(i) != null,
              s"scatterState: null element at dim $i of a $d-dim vector")
            v(i) = seq(i).asInstanceOf[Long]; i += 1
          }
          var a = 0
          while (a < d) {
            val va = v(a)
            s(a) += va
            val base = a * d
            var b = 0
            while (b < d) { g(base + b) += va * v(b); b += 1 }
            a += 1
          }
        }
      }
      val count = if (n > 0) Iterator.single((0L, -1L, -1L, n)) else Iterator.empty
      if (g == null) count
      else Iterator.tabulate(d * d)(k => (2L, (k / d).toLong, (k % d).toLong, g(k))) ++
        Iterator.tabulate(d)(j => (1L, -1L, j.toLong, s(j))) ++ count
    }
    // Seed rows make the state self-describing for the MERGED path:
    // (ord=0, 0) guarantees the n row exists even for an empty corpus
    // (it sums away under any non-empty kernel output), and (ord=3,
    // vmax) carries the quantization bound so [[pcaFromState]] can
    // re-check the envelope on a merged n — three batches that each
    // pass their own 2·n²·vmax² check admit up to 9× the bound when
    // summed, so the per-call require above is NOT sufficient there.
    val seeds = spark.createDataFrame(Seq(
      (0L, -1L, -1L, 0L), (3L, -1L, -1L, vmax)))
      .toDF("ord", "di", "dj", "m")
    mergeScatterStates(Seq(partials.toDF("ord", "di", "dj", "m"), seeds))
  }

  /** Merge independently built [[scatterState]]s: one union + one
    * map-side-combinable groupBy over ≤ d²+d+2 keyed rows per state —
    * moments and counts are additive (sum); the carried vmax bound
    * (ord=3) merges by max.
    */
  def mergeScatterStates(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("ord"), col("di"), col("dj"))
      .agg(sum(col("m")).as("sm"), max(col("m")).as("mx"))
      .select(col("ord"), col("di"), col("dj"),
        when(col("ord") === 3L, col("mx")).otherwise(col("sm")).as("m"))

  /** Finish PCA from a (possibly merged) [[scatterState]]: recompose the
    * centered scatter `c_ij = n·G_ij − s_i·s_j` and power-iterate — both
    * driver-local on the collected O(d²) state (see
    * [[pcaPowerDirection]]'s scale note).
    */
  def pcaFromState(state: DataFrame, rounds: Int, vs: Long): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    val rows = state.collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3)))
    val dims = rows.iterator.collect { case (2L, i, _, _) => i }
    if (dims.isEmpty) // empty corpus: a (ord=0, n=0) state, no moments
      return Seq.empty[(Long, Long, Long)].toDF("dim", "c_diag", "v")
    val d = dims.max + 1
    val g = Array.ofDim[Long](d, d)
    val s = Array.ofDim[Long](d)
    var n = 0L
    var vmax = 0L
    rows.foreach {
      case (3L, _, _, m) => vmax = m
      case (2L, i, j, m) => g(i)(j) = m
      case (1L, _, j, m) => s(j) = m
      case (0L, _, _, m) => n = m
      case other => throw new IllegalStateException(s"bad state row $other")
    }
    // Re-check the int64 envelope on the MERGED totals: each input
    // state passed its own per-batch check, but k merged batches admit
    // up to k² × the centered-scatter bound (n sums across batches).
    // States written before the vmax row existed (ord=3 absent) skip
    // the check exactly as before this guard existed.
    if (vmax > 0L) require(
      BigInt(2) * BigInt(n) * BigInt(n) * BigInt(vmax) * BigInt(vmax)
        <= BigInt(Long.MaxValue),
      s"pcaFromState int64 envelope exceeded on merged state: n=$n rows " +
        s"at max|v|=$vmax gives centered-scatter entries up to " +
        s"2·n²·vmax² > 2⁶³−1; rescale the vector quantization")
    val c = Array.tabulate(d, d)((i, j) => n * g(i)(j) - s(i) * s(j))
    var v = Array.fill(d)(vs)
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d) { i =>
        var acc = 0L; var j = 0
        while (j < d) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.iterator.map(math.abs).max
      v = w.map(wi => math.floor(wi.toDouble * vs.toDouble / m.toDouble).toLong)
    }
    (0 until d).map(i => (i.toLong, c(i)(i), v(i))).toDF("dim", "c_diag", "v")
      .orderBy(col("dim"))
  }
}
