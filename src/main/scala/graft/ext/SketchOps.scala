package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch (HyperLogLog shape, Flajolet et al.
  * 2007) in EXACT integer register math — the "novel sketch as a custom
  * operator" slot from the build brief. An OLAP engine needs cardinality
  * under memory bounds (distinct users per segment over 100 TB of
  * events); `count(distinct)` shuffles every distinct value, while this
  * shuffles m=64 register rows per group, is mergeable across
  * partitions/days (max of registers), and — unlike library HLLs — is
  * reproducible bit-for-bit by any SQL engine, because every step is
  * integer arithmetic on an md5-derived hash:
  *
  *   - h = 60-bit hash ([[TextOps.hash60]] convention), bucket = h mod
  *     64, w = h div 64 (54 payload bits);
  *   - rho(w) = leading-zero count + 1, computed with STRING bit ops
  *     (`instr(lpad(bin(w)))`) so no engine-specific clz intrinsic is
  *     in the contract; w = 0 → 55;
  *   - register r_b = max rho per bucket; missing buckets are 0;
  *   - Z = Σ_b 2^(55 − r_b), an exact int64 (≤ 64·2^55 = 2^61): the
  *     harmonic denominator scaled by 2^55 so the sum is
  *     order-independent integer addition, never floating point.
  *
  * The estimate α·m²·2^55/Z is the only floating step and uses one
  * fixed literal-for-literal expression shape (correctly-rounded IEEE
  * ops on identical inputs are engine-independent). No small-range
  * linear-counting branch (it needs ln); `n_zero_buckets` is emitted so
  * a consumer can apply it — the gated fixtures sit in the raw-HLL
  * regime anyway.
  */
object SketchOps {

  val M = 64 // registers per group (b = 6 bucket bits)
  val WBits = 54 // payload bits: 60-bit hash minus 6 bucket bits
  val RhoEmpty = WBits + 1 // rho when the payload is all zeros
  // alpha_64 = 0.7213/(1 + 1.079/64) = 0.709341 — in ppm, times m^2;
  // kept as exact-in-double literals so the oracle repeats the same text
  val AlphaM2Num = 709341.0 * M * M // ppm * 4096 = 2905460736
  val Pow55 = (1L << 55).toDouble

  /** (groupCols*, bucket, r) — ALL m buckets per group, missing = 0. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = TextOps.hash60(concat(lit("hll:"), col(valueCol).cast("string")))
    val w = expr(s"h div $M")
    val rho = when(w === 0L, lit(RhoEmpty.toLong))
      .otherwise(instr(lpad(bin(w), WBits, "0"), "1").cast("long"))
    val observed = df.select(groupCols.map(col) :+ h.as("h"): _*)
      .withColumn("bucket", col("h") % M)
      .withColumn("rho", rho)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("r"))
    // every group with any row appears in `observed`, so derive the
    // all-buckets frame from the register-sized aggregate — NOT from a
    // second full scan of the input
    val frame = observed.select(groupCols.map(col): _*).distinct()
      .crossJoin(broadcast(df.sparkSession.range(M).select(col("id").as("bucket"))))
    frame.join(observed, groupCols :+ "bucket", "left")
      .withColumn("r", coalesce(col("r"), lit(0L)))
  }

  // ---------------------------------------------------------- count-min

  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-min sketch (Cormode & Muthukrishnan 2005) counters over a
    * value column: d×w integer counters, one per (row, hash bucket).
    * Fully mergeable (counters add) and deterministic (md5-derived row
    * hashes, pure integer sums) — the frequency-estimation sibling of
    * the HLL registers above: heavy-hitter tracking over 100 TB in
    * d·w = 1024 longs per group instead of a full frequency table.
    * Point estimates ([[cmsEstimate]]) take the min over the d rows and
    * are never below the true count; collisions only inflate.
    */
  def cmsCounters(df: DataFrame, valueCol: String): DataFrame = {
    val hashes = array((0 until CmsDepth).map { i =>
      TextOps.hash32(concat(lit(s"cms$i:"), col(valueCol).cast("string"))) % CmsWidth
    }: _*)
    df.select(posexplode(hashes).as(Seq("i", "j")))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
  }

  /** Point-query the sketch for each item: min over the d counters the
    * item hashes to. `items` must have `valueCol`; other columns pass
    * through.
    */
  def cmsEstimate(counters: DataFrame, items: DataFrame, valueCol: String): DataFrame = {
    val hashes = array((0 until CmsDepth).map { i =>
      TextOps.hash32(concat(lit(s"cms$i:"), col(valueCol).cast("string"))) % CmsWidth
    }: _*)
    // collision-safe internal names: a caller's items frame may already
    // carry i/j/c columns, and duplicate names would break the groupBy
    val probes = items.select(col("*"), posexplode(hashes).as(Seq("__cms_i", "__cms_j")))
    val ctr = counters.select(col("i").as("__cms_i"), col("j").as("__cms_j"),
      col("c").as("__cms_c"))
    // LEFT join + coalesce 0: a probe hashing to a never-incremented
    // cell must contribute counter 0 (CMS estimate of an unseen item is
    // 0), not silently drop out of the min
    probes.join(broadcast(ctr), Seq("__cms_i", "__cms_j"), "left")
      .withColumn("__cms_c", coalesce(col("__cms_c"), lit(0L)))
      .groupBy(items.columns.map(col).toSeq: _*)
      .agg(min(col("__cms_c")).as("cms_estimate"))
  }

  // ----------------------------------------------------------------- kmv

  val KmvK = 64 // kept minima per group — same memory bound as the HLL's m
  val KmvRange = 1L << 32 // hash32 value space

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al., "Counting
    * distinct elements in a data stream", RANDOM 2002) — the third
    * sketch in the family (HLL estimates cardinality from register
    * maxima, CMS estimates frequencies, KMV keeps the k smallest
    * distinct hash values): if the k-th smallest of n uniform hashes in
    * [0, R) sits at h_k, then n ≈ (k−1)·R/h_k. Unlike the HLL it also
    * yields a mergeable Jaccard/overlap estimator (bottom-k of a union
    * is the union of bottom-k sets), which is why curation pipelines
    * carry it next to the HLL.
    *
    * Exactness contract (same discipline as the HLL): 32-bit md5-derived
    * hashes keep (k−1)·R inside int64, so the estimate is ONE truncating
    * integer division — no floating point anywhere. Groups with fewer
    * than k distinct values are exact by construction (estimate =
    * distinct count).
    *
    * Scale shape: the hash-dedup is a map-side-combinable groupBy on
    * (group, hash) — the same shuffle `count(distinct)` pays — but the
    * per-group state afterwards is ≤k rows via the bounded top-k
    * aggregate (score = −hash), so the second aggregation's shuffle
    * carries ≤k entries per group per partition and the sketch, not the
    * value set, is what reaches the reducer. Columns: groupCols*,
    * n_kept, kth_hash, est_distinct.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = KmvK): DataFrame = {
    val h = TextOps.hash32(concat(lit("kmv:"), col(valueCol).cast("string")))
    val distinctHashes = df.select(groupCols.map(col) :+ h.as("h"): _*).distinct()
    val bottomK = udaf(new graft.functions.TopKAgg(k))
    distinctHashes
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("h"), -col("h").cast("double")).as("top"))
      .withColumn("n_kept", size(col("top")).cast("long"))
      .withColumn("kth_hash", element_at(col("top"), size(col("top"))).getField("id"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * $KmvRange) div greatest(kth_hash, 1L)")))
      .drop("top")
  }

  /** The KMV sketch's kept set, exploded to (groupCols*, h) rows — the
    * form [[kmvPairOverlap]] consumes. Same bottom-k construction as
    * [[kmvDistinct]].
    */
  def kmvKeptHashes(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = KmvK): DataFrame = {
    val h = TextOps.hash32(concat(lit("kmv:"), col(valueCol).cast("string")))
    val distinctHashes = df.select(groupCols.map(col) :+ h.as("h"): _*).distinct()
    val bottomK = udaf(new graft.functions.TopKAgg(k))
    distinctHashes
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("h"), -col("h").cast("double")).as("top"))
      .select(groupCols.map(col) :+ explode(col("top")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.id").as("h"): _*)
  }

  /** Finalize a (groupCols*, h) kept-hash frame into the [[kmvDistinct]]
    * output shape — the MERGE half of the KMV sketch: the bottom-k of a
    * union is computable from the per-part bottom-k sets alone (any
    * member of the global bottom-k is necessarily in its own part's
    * bottom-k), so unioning batch kept-sets and re-taking the bottom-k
    * reproduces the one-shot batch sketch state-for-state. The distinct
    * dedups hashes that survive in several batches' kept sets.
    *
    * Scale shape: input is sketch-sized (≤k rows per group per batch),
    * so everything here — distinct, bottom-k aggregate — shuffles
    * sketch rows, never corpus rows.
    */
  def kmvFinalizeKept(kept: DataFrame, groupCols: Seq[String],
      k: Int = KmvK): DataFrame = {
    val bottomK = udaf(new graft.functions.TopKAgg(k))
    kept.select(groupCols.map(col) :+ col("h"): _*).distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("h"), -col("h").cast("double")).as("top"))
      .withColumn("n_kept", size(col("top")).cast("long"))
      .withColumn("kth_hash", element_at(col("top"), size(col("top"))).getField("id"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * $KmvRange) div greatest(kth_hash, 1L)")))
      .drop("top")
  }

  /** Pairwise Jaccard estimation from KMV kept sets (Beyer et al., "On
    * synopses for distinct-value estimation under multiset operations",
    * SIGMOD 2007) — the sketch-union property that distinguishes KMV
    * from the HLL: the bottom-k of A∪B is computable from the two kept
    * sets alone, and the fraction of it present in BOTH sets estimates
    * J(A,B). Output per (s1 < s2) pair: k_used (≤k union-sketch size),
    * n_shared, est_jaccard_ppm — ppm via truncating integer division,
    * so the oracle agrees exactly.
    *
    * Scale shape: everything after the kept sets is sketch-sized —
    * each pair carries ≤2k hash rows through one groupBy and one
    * bottom-k aggregate; the quadratic term is the PAIR COUNT
    * (groups²), which is the operator's contract (group-level
    * similarity matrices are output-quadratic by definition) — not
    * the corpus. That contract is ENFORCED, not just documented: the
    * kept frame is persisted (it is read three times below anyway),
    * the group count is measured, and `maxGroups` fails fast — a
    * caller passing 10⁵ near-unique groups would otherwise silently
    * build a 10¹⁰-pair frame. Raise `maxGroups` explicitly when an
    * output-quadratic matrix over more groups is the intent (same
    * precedent as the PCA int64-envelope `require`).
    */
  def kmvPairOverlap(kept0: DataFrame, groupCol: String,
      k: Int = KmvK, maxGroups: Int = 4096): DataFrame = {
    val kept = graft.Caches.persisted(kept0)
    val s = kept.select(col(groupCol)).distinct()
    val nGroups = s.count()
    require(nGroups <= maxGroups,
      s"kmvPairOverlap is group-count-quadratic by contract: $nGroups " +
        s"groups would build ${nGroups * (nGroups - 1) / 2} pair rows, " +
        s"over the maxGroups=$maxGroups bound; pass a larger maxGroups " +
        "explicitly if an output-quadratic similarity matrix over this " +
        "many groups is intended")
    val pairs = s.select(col(groupCol).as("s1"))
      .crossJoin(s.select(col(groupCol).as("s2")))
      .filter(col("s1") < col("s2"))
    val k1 = kept.select(col(groupCol).as("s1"), col("h"))
    val k2 = kept.select(col(groupCol).as("s2"), col("h"))
    val u = pairs.join(k1, "s1")
      .select(col("s1"), col("s2"), col("h"))
      .unionByName(pairs.join(k2, "s2").select(col("s1"), col("s2"), col("h")))
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg((count(lit(1)) === 2).cast("long").as("in_both"))
    val bottomK = udaf(new graft.functions.TopKAgg(k))
    val ub = u
      .groupBy(col("s1"), col("s2"))
      .agg(bottomK(col("h"), -col("h").cast("double")).as("top"))
      .select(col("s1"), col("s2"), explode(col("top")).as("e"))
      .select(col("s1"), col("s2"), col("e.id").as("h"))
    ub.join(u, Seq("s1", "s2", "h"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("k_used"), sum(col("in_both")).as("n_shared"))
      .withColumn("est_jaccard_ppm", expr("(n_shared * 1000000L) div k_used"))
  }

  /** Merge register states from independent passes (micro-batches,
    * partitions, days): registers combine by MAX per (group, bucket) —
    * the HLL's defining property; a union of [[hllRegisters]] frames
    * collapses to one state with a single map-side-combinable
    * aggregation. All-bucket frames stay all-bucket under the merge
    * (every input carries all m buckets for its groups).
    */
  def hllMergeRegisters(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))

  /** The estimate over a register state: checksum columns + α·m²·2^55/Z.
    * Columns: groupCols*, n_nonzero_buckets, n_zero_buckets, z, estimate.
    */
  def hllFinalize(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("r") > 0, 1L).otherwise(0L)).as("n_nonzero_buckets"),
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("n_zero_buckets"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast(${RhoEmpty} - r as int))")).as("z"))
      .withColumn("estimate",
        floor(lit(AlphaM2Num) * lit(Pow55) / lit(1000000.0) / col("z").cast("double"))
          .cast("long"))

  /** Per group: register checksum + the cardinality estimate. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllFinalize(hllRegisters(df, groupCols, valueCol), groupCols)
}
