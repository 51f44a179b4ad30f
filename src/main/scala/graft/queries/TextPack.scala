package graft.queries

import graft.Tables
import graft.ext.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis / deduplication query pack over the `documents` table:
  * token stats + quality, fingerprint dedup, corpus token frequency,
  * n-gram Jaccard, MinHash signatures + LSH candidate pairs, SimHash.
  * Every query has a DuckDB oracle; all numerics are exact-integer
  * derived so hashes match bit-for-bit.
  */
object TextPack {

  private val K = 16 // minhash functions
  private[queries] val Bands = 4
  private[queries] val R = 4

  def textStats(spark: SparkSession, dir: String): DataFrame = {
    // Count once, derive everything from the materialized ints — the
    // regexp scans don't get re-inlined per derived column.
    val counted = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars2"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      TextOps.stopwordCount(col("text")).as("n_stopwords"))
    val avgWordLen = (col("n_chars2") - col("n_tokens") + 1).cast("double") /
      col("n_tokens").cast("double")
    val quality = least(lit(1.0),
      col("n_stopwords").cast("double") / col("n_tokens").cast("double") * 2.0 +
        when(avgWordLen >= 3.0 && avgWordLen <= 8.0, 0.5).otherwise(0.0))
    counted.select(col("doc_id"), col("lang"), col("n_tokens"), col("n_stopwords"),
      avgWordLen.as("avg_word_len"), quality.as("quality"))
      .orderBy(col("doc_id"))
  }

  def fingerprintDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("keep_doc_id"))
  }

  /** q119: duplication INFLATION census — the planning number a dedup
    * pass is sized from: per source, how many docs exist vs how many
    * distinct exact fingerprints ([[TextOps.fingerprint]], q14's md5),
    * the dup surplus, and `inflation_ppm = (10⁶·n_docs) div
    * n_distinct_fp` — "this crawl is 1.7× its deduped self". Run
    * BEFORE q14/q55 to decide where the dedup budget goes.
    *
    * Scale shape: one map-side fingerprint projection (text never
    * shuffles) into a (source, fp)-keyed count — the same shuffle
    * exact dedup pays — then a source-keyed rollup of the collapsed
    * fingerprint frame. Output is #sources rows.
    */
  def dupInflation(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("source"), col("fp"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_distinct_fp"),
        sum(col("c") - 1).as("n_dup_docs"))
      .withColumn("inflation_ppm",
        expr("(1000000 * n_docs) div n_distinct_fp"))
      .orderBy(col("source"))

  /** q126: power-of-two LENGTH histogram — the doc-length panel every
    * corpus card shows (and the input to packing/truncation budget
    * decisions), with the log-scale bucket computed WITHOUT floating
    * point: `bucket = length(bin(n_chars))` (= ⌊log₂⌋+1 for positive
    * ints — the binary-string length is integer-exact in any engine,
    * where `floor(log2(x))` is one ulp away from flipping at exact
    * powers). Per bucket: doc count, char mass, exact min/max, and
    * ppm share of docs. One map-side-combinable groupBy on a derived
    * key; output is ≤64 rows.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("n_chars"), length(bin(col("n_chars"))).cast("long").as("bucket"))
    val tot = d.agg(count(lit(1)).as("n_total"))
    d.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(1000000 * n_docs) div n_total"))
      .orderBy(col("bucket"))
  }

  /** q135: duplicate-CLUSTER size histogram — the dedup report's
    * headline table: for each exact-duplicate cluster size (q14's
    * per-fingerprint count), how many clusters exist, how many docs
    * they hold, and how many docs dedup would drop. Reads the
    * collapsed fingerprint frame (the q14 shuffle), then aggregates
    * the CLUSTER-cardinality frame by size — output is ≤ max-cluster-
    * size rows, and `sum(n_dropped)` over it is the corpus' dedup
    * savings (q119's number, itemized by cluster size).
    */
  def dupClusterHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("size")).as("n_docs"),
        (count(lit(1)) * (col("size") - 1)).as("n_dropped"))
      .orderBy(col("size"))

  private val TermsPerSource = 5

  /** q132: top terms PER SOURCE — the per-slice vocabulary panel (what
    * does each crawl actually talk about), q15's global top-20 made
    * group-wise. The rank window runs on the COLLAPSED (source, token,
    * freq) count frame — vocabulary × sources sized, corpus-
    * independent — never on token occurrence rows, and `rank <= 5`
    * plans as WindowGroupLimit (rank pushdown) rather than a full
    * per-group sort. Tie-break (freq desc, token asc) is total, so
    * both engines elect identical terms.
    */
  def topTermsPerSource(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("token"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TermsPerSource)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("token"), col("freq"))
      .orderBy(col("source"), col("rank"))
  }

  /** q146: INCREMENTAL vocabulary maintenance, oracle-gated — q142
    * through the merge seam: the first-sighting table `(token,
    * min(doc_id))` is a MIN-SEMILATTICE state (mins of mins merge
    * exactly, any split), so three doc-ranged batches each build
    * their own table, the tables merge by union + groupBy-min, and
    * the Heaps curve finalized from the merged table must hash-equal
    * the one-shot q142 via q142's own oracle. The min/max member of
    * the incremental family (sums: q116/q121; registers: q96/q99;
    * kept sets: q113; extrema: q118 and this).
    */
  def streamVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    val firstSeen = Seq(
      docs.filter(col("doc_id") <= mx / 3),
      docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
      docs.filter(col("doc_id") > 2 * mx / 3))
      .map(_.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc")))
      .reduce(_ unionByName _)
      .groupBy(col("token")).agg(min(col("first_doc")).as("first_doc"))
    val bounds = docs.agg(max(col("doc_id")).as("mx"))
    val pcts = (1 to 10).map(_ * 10L)
    firstSeen.crossJoin(broadcast(bounds))
      .join(broadcast(pcts.toDF("p")),
        col("first_doc") <= expr("(mx * p) div 100"))
      .groupBy(col("p"))
      .agg(max(expr("(mx * p) div 100")).as("cutoff_doc"),
        count(lit(1)).as("n_vocab"))
      .orderBy(col("p"))
  }

  /** q145: length↔quality CORRELATION — Pearson r between doc length
    * (n_chars) and the exact type-token quality score (q83's), the
    * selection-bias check a curation pipeline runs before gating on
    * either ("am I about to select for long docs when I think I'm
    * selecting for quality?"). The moments are EXACT: sums, squares
    * and cross-products ride in decimal(38,0)/hugeint (n·Σxy exceeds
    * int64 at corpus scale), and only the final
    * `floor(10⁶·cov / sqrt(varx·vary))` touches floating point —
    * +,−,×,/ and sqrt on identical doubles are correctly-rounded
    * IEEE, and both engines evaluate the identical expression shape,
    * so the fixed-point r matches bit-for-bit. One
    * map-side-combinable global aggregate; 1-row output.
    */
  def lengthQualityCorr(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val s = Tables.documents(spark, dir)
      .select(col("n_chars").as("x"),
        expr("""floor(1000000.0 * size(array_distinct(split(text, ' ')))
               |  / size(split(text, ' ')))""".stripMargin).cast("long").as("y"))
    s.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).cast(dec).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).cast(dec).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).cast(dec).as("sxy"))
      .select(col("n").cast("long").as("n"),
        col("sx").cast("long").as("sum_x"), col("sy").cast("long").as("sum_y"), {
          // Zero-variance guard (degenerate corpus: constant length or
          // constant score): the raw form divides by sqrt(0) — Spark
          // floors the resulting Inf/NaN to null while DuckDB errors
          // casting inf to bigint, so both engines instead get an
          // explicit null via nullif on the variance product.
          val vp = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
          floor(lit(1000000.0)
            * (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt(when(vp === lit(0.0), lit(null)).otherwise(vp)))
            .cast("long").as("pearson_fp")
        })
  }

  /** q142: VOCABULARY growth curve (Heaps' law, measured) — distinct
    * tokens seen within the first 10%, 20%, … 100% of the corpus (by
    * doc_id, the ingest proxy): the curve that budgets a tokenizer's
    * vocab size and shows whether a crawl still yields new words or
    * has saturated. Computed WITHOUT cumulative-distinct machinery:
    * one groupBy(token).min(doc_id) collapses the corpus to each
    * token's FIRST sighting (vocab-sized), and the curve is a 10-row
    * broadcast threshold join over that frame — vocab at checkpoint c
    * is simply the tokens first seen at or before c.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val firstSeen = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val bounds = Tables.documents(spark, dir).agg(max(col("doc_id")).as("mx"))
    val pcts = (1 to 10).map(_ * 10L)
    firstSeen.crossJoin(broadcast(bounds))
      .join(broadcast(pcts.toDF("p")),
        col("first_doc") <= expr("(mx * p) div 100"))
      .groupBy(col("p"))
      .agg(max(expr("(mx * p) div 100")).as("cutoff_doc"),
        count(lit(1)).as("n_vocab"))
      .orderBy(col("p"))
  }

  /** q140: MinHash ESTIMATOR-BIAS audit — for every banded candidate
    * pair, the minhash Jaccard estimate (matching signature positions
    * / K, in ppm) next to the true shingle Jaccard (ppm) and the
    * absolute error: the calibration of the estimator itself (q136
    * calibrates the BANDING's precision; this calibrates the
    * SIGNATURE's accuracy — K=16 gives a ±25% standard error, and this
    * table shows it measured, the input to choosing K). Candidate-pair
    * grain throughout, off the same persisted shingle pass.
    */
  def minhashBiasAudit(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh")))
    val hashRows = sh.select(col("doc_id"), explode(col("sh")).as("_s"))
      .select(col("doc_id"), TextOps.hash32(col("_s")).as("_h"))
    val sigs = graft.Caches.persisted(
      TextOps.minhashAggFromHashes(hashRows, "doc_id", "_h", K))
    val banded = sigs
      .select(col("doc_id"), posexplode(TextOps.lshBandKeys(col("sig"), Bands, R))
        .as(Seq("band", "key")))
      .select(col("doc_id"),
        concat(col("band").cast("string"), lit(":"), col("key")).as("band_key"))
    val pairs = banded.select(col("doc_id").as("doc1"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc2"), col("band_key")), "band_key")
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc1"), col("sig").as("sig1")), "doc1")
      .join(sigs.select(col("doc_id").as("doc2"), col("sig").as("sig2")), "doc2")
      .join(sh.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sh.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
      .select(col("doc1"), col("doc2"),
        expr(s"""(1000000 * aggregate(zip_with(sig1, sig2,
                 |  (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END),
                 |  0L, (a, x) -> a + x)) div $K""".stripMargin).as("est_ppm"),
        expr("(1000000 * size(array_intersect(sh1, sh2))) div " +
          "size(array_union(sh1, sh2))").as("jacc_ppm"))
      .withColumn("abs_err_ppm", abs(col("est_ppm") - col("jacc_ppm")))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** q136: LSH PRECISION calibration — for each shared-band count
    * (1..b), how many candidate pairs the banding emits and what
    * fraction verify at true Jaccard ≥ 0.5: the b/r tuning panel (more
    * shared bands ⇒ higher minhash agreement ⇒ higher precision) read
    * before re-banding a corpus. Composes q18's banded candidate join
    * with q47's exact-shingle verification and aggregates at the
    * CANDIDATE-PAIR grain — never all-pairs; the expensive subtrees
    * are exactly the already-gated q18/q47 shapes off one persisted
    * shingle pass.
    */
  def lshPrecisionPanel(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh")))
    val hashRows = sh.select(col("doc_id"), explode(col("sh")).as("_s"))
      .select(col("doc_id"), TextOps.hash32(col("_s")).as("_h"))
    val banded = TextOps.minhashAggFromHashes(hashRows, "doc_id", "_h", K)
      .select(col("doc_id"), posexplode(TextOps.lshBandKeys(col("sig"), Bands, R))
        .as(Seq("band", "key")))
      .select(col("doc_id"),
        concat(col("band").cast("string"), lit(":"), col("key")).as("band_key"))
    val pairs = banded.select(col("doc_id").as("doc1"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc2"), col("band_key")), "band_key")
      .filter(col("doc1") < col("doc2"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_shared_bands"))
    pairs
      .join(sh.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sh.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
      .withColumn("ok",
        (TextOps.jaccard(col("sh1"), col("sh2")) >= lit(VerifyJaccard)).cast("long"))
      .groupBy(col("n_shared_bands"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ok")).as("n_verified"))
      .withColumn("precision_ppm", expr("(1000000 * n_verified) div n_pairs"))
      .orderBy(col("n_shared_bands"))
  }

  def tokenFrequency(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)
  }

  /** Adjacent-id document pairs scored by word-3-gram Jaccard. The
    * shingle projection is persisted so the self-join reads it once
    * instead of re-running tokenize+shingle per join side.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh")))
    val a = d.select(col("doc_id").as("doc1"), col("sh").as("sh1"))
    val b = d.select((col("doc_id") - 1).as("doc1"), col("doc_id").as("doc2"), col("sh").as("sh2"))
    a.join(b, "doc1")
      .select(col("doc1"), col("doc2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("n_common"),
        size(array_union(col("sh1"), col("sh2"))).cast("long").as("n_union"),
        TextOps.jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .orderBy(col("doc1"))
  }

  /** Shingle-hash once per doc (md5 dominates); signatures are linear
    * arithmetic over the hashed array. The intermediate projection stays
    * un-collapsed (alias referenced k times, producer non-cheap), so md5
    * runs once per shingle, not once per hash function.
    */
  private def signaturesFrom(docs: DataFrame): DataFrame = {
    val rows = TextOps.shingleRows(docs, "doc_id", "text", 3)
      .select(col("doc_id"), TextOps.hash32(col("_s")).as("_h"))
    TextOps.minhashAggFromHashes(rows, "doc_id", "_h", K)
  }

  private def signatures(spark: SparkSession, dir: String): DataFrame =
    signaturesFrom(Tables.documents(spark, dir))

  /** MinHash signatures, exploded to scalar rows for exact comparison. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir)
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("j", "minhash")))
      .withColumn("j", col("j").cast("long"))
      .orderBy(col("doc_id"), col("j"))

  /** LSH banding over the MinHash signature: candidate near-dup pairs =
    * docs sharing ≥1 (band-index, band-key). Output is the per-pair
    * shared-band count — candidate generation is an equi-join on the band
    * key (shuffle), never a cross product.
    *
    * Skew note: near-duplicate CLUSTERS make band keys hot (a k-dup
    * cluster puts k rows on one key → k² join output through one
    * reducer's input). `salts > 1` routes the self-join through
    * [[graft.operators.Skew.saltedJoin]] — result-identical (SkewSpec
    * proves it on a hot fixture), probe-side reducer input shrinks
    * ~salts×; AQE's runtime skew-join split covers the sort-merge case
    * when salting isn't wired. The oracle-gated queries keep salts = 1
    * (the fixture corpora are not skewed); at 100 TB size `salts` to the
    * observed hot-cluster ratio.
    */
  def lshCandidatePairsFrom(docs: DataFrame, salts: Int = 1): DataFrame =
    pairsFromBanded(bandedKeys(docs), salts)

  /** The self-driving form: measure the hottest band key's multiplicity
    * (one column-pruned count over the already-persisted band rows),
    * derive the salt factor ([[graft.operators.Skew.autoSalts]]), and
    * run the salted join only when the data is actually hot — at 100 TB
    * nobody knows the dup-cluster ratio ahead of the scan, and a fixed
    * salt guess either under-splits the hot key or replicates the build
    * side for nothing. `targetPerKey` is the acceptable per-reducer
    * fan-in for one band key (k dup docs on a key → k² join rows).
    */
  def lshCandidatePairsAdaptive(docs: DataFrame,
      targetPerKey: Long = 100000L, maxSalts: Int = 32): DataFrame = {
    val banded = bandedKeys(docs)
    pairsFromBanded(banded,
      graft.operators.Skew.autoSalts(banded, Seq("band_key"), targetPerKey, maxSalts))
  }

  /** (doc_id, band_key) rows — the expensive md5-shingle + minhash
    * subtree, persisted so the band self-join (and any second consumer,
    * q50) reads the cache instead of recomputing.
    */
  private[graft] def bandedKeys(docs: DataFrame): DataFrame =
    graft.Caches.persisted(signaturesFrom(docs))
      .select(col("doc_id"), posexplode(TextOps.lshBandKeys(col("sig"), Bands, R))
        .as(Seq("band", "key")))
      .select(col("doc_id"), concat(col("band").cast("string"), lit(":"), col("key")).as("band_key"))

  private def pairsFromBanded(banded: DataFrame, salts: Int): DataFrame = {
    val a = banded.select(col("doc_id").as("doc1"), col("band_key"))
    val b = banded.select(col("doc_id").as("doc2"), col("band_key"))
    val joined =
      if (salts <= 1) a.join(b, "band_key")
      else graft.operators.Skew.saltedJoin(a, b, Seq("band_key"), salts)
    joined
      .filter(col("doc1") < col("doc2"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("doc1"), col("doc2"))
  }

  def lshCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    lshCandidatePairsFrom(Tables.documents(spark, dir))

  private val SamplePct = 60
  private val SampleQuota = 5

  /** q51: deterministic stratified corpus sampling (training-data
    * mixing) — 60% Bernoulli by salted hash bucket, then at most 5 docs
    * per (lang, source) stratum by hash order. Both mechanisms bind on
    * the fixture corpus (the largest strata have >5 survivors). See
    * [[TextOps.stratifiedSample]] for the no-RNG reproducibility
    * contract.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    TextOps.stratifiedSample(Tables.documents(spark, dir),
      Seq("lang", "source"), SamplePct, SampleQuota)
      .select(col("doc_id"), col("lang"), col("source"), col("h"),
        col("strat_rank"))
      .orderBy(col("doc_id"))

  private val PlantedClusterText =
    "salted skew cluster alpha beta gamma delta epsilon zeta eta theta"

  private val PlantedLeakText =
    "split leakage probe kappa lambda mu nu xi omicron pi rho sigma tau"

  /** q108: cross-split near-dup LEAKAGE audit — the check every
    * train/val/test pipeline must run AFTER splitting: a near-duplicate
    * pair straddling two splits silently leaks evaluation data into
    * training (dedup-before-split misses docs that only became dups
    * later; split-before-dedup guarantees nothing). Composition: q18's
    * banded candidate pairs (≥2 shared bands — the corpusClean near-dup
    * gate) joined with q80's hash-bucketed split assignment, keeping
    * only pairs whose endpoints land in DIFFERENT splits. Leakage is
    * planted (every 43rd doc shares one synthetic text; the split hash
    * is independent of doc content, so the planted cluster straddles
    * splits with certainty at fixture size) and the natural corpus
    * contributes whatever real cross-split dups exist.
    *
    * Scale: the expensive subtree is the banded join (already the q18
    * shape — equi-join, never all-pairs); the split frame is a narrow
    * per-doc hash projection, and the two doc-keyed joins attach splits
    * to PAIR-sized frames (post-gate survivors), not the corpus.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 43 === 0, lit(PlantedLeakText))
        .otherwise(col("text")).as("text"))
    val split = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.hash32(
          concat(lit("split:"), col("doc_id").cast("string"))).as("h"))
      .select(col("doc_id"),
        when(col("h") % 100 < 2, lit("test"))
          .when(col("h") % 100 < 4, lit("val"))
          .otherwise(lit("train")).as("split"))
    lshCandidatePairsFrom(docs)
      .filter(col("n_shared_bands") >= 2)
      .join(split.select(col("doc_id").as("doc1"), col("split").as("split1")), "doc1")
      .join(split.select(col("doc_id").as("doc2"), col("split").as("split2")), "doc2")
      .filter(col("split1") =!= col("split2"))
      .select(col("doc1"), col("doc2"), col("split1"), col("split2"),
        col("n_shared_bands"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** q50: the salted banded join gated END TO END on a corpus with real
    * skew. Every tenth doc becomes one exact-duplicate cluster (identical
    * signature → identical key in EVERY band: at sf0.1 that is a 500-dup
    * cluster putting 500 rows on each of 16 hot keys — the worst case
    * [[graft.operators.Skew.saltedJoin]] exists for). The query runs the
    * candidate join BOTH ways — salts=1 and salts=4 — and full-outer
    * joins the results, so one extra, missing, or differing pair on
    * either side breaks the row count or the hash. The oracle computes
    * the single ground truth and emits it as both columns.
    */
  def lshSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 10 === 0, lit(PlantedClusterText))
        .otherwise(col("text")).as("text"))
    // ONE banded-keys pass (the minhash subtree) feeds both join variants
    val banded = bandedKeys(docs)
    val s1 = pairsFromBanded(banded, salts = 1)
      .withColumnRenamed("n_shared_bands", "n_unsalted")
    val s4 = pairsFromBanded(banded, salts = 4)
      .withColumnRenamed("n_shared_bands", "n_salted")
    s1.join(s4, Seq("doc1", "doc2"), "full_outer")
      .select(col("doc1"), col("doc2"), col("n_unsalted"), col("n_salted"))
      .orderBy(col("doc1"), col("doc2"))
  }

  private val VerifyJaccard = 0.5

  /** The COMPLETE classic near-dup detection pipeline: LSH banding
    * proposes candidates (equi-join, never all-pairs), exact n-gram
    * Jaccard verifies them — the quadratic-exact step (q16's math) runs
    * only on the candidate set, which banding keeps ~linear in corpus
    * size. This is the composition production dedup actually ships
    * (candidates ≫ cheap, verification exact).
    */
  def lshJaccardVerify(spark: SparkSession, dir: String): DataFrame = {
    // ONE persisted shingle pass feeds both stages: signatures derive
    // from the exploded arrays (minhash is duplicate-invariant, so the
    // distinct arrays give the same minima as the row-stream form — and
    // no per-doc window is needed), verification intersects the same
    // arrays.
    val sh = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh")))
    val hashRows = sh.select(col("doc_id"), explode(col("sh")).as("_s"))
      .select(col("doc_id"), TextOps.hash32(col("_s")).as("_h"))
    val banded = TextOps.minhashAggFromHashes(hashRows, "doc_id", "_h", K)
      .select(col("doc_id"), posexplode(TextOps.lshBandKeys(col("sig"), Bands, R))
        .as(Seq("band", "key")))
      .select(col("doc_id"),
        concat(col("band").cast("string"), lit(":"), col("key")).as("band_key"))
    val cands = banded.select(col("doc_id").as("doc1"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc2"), col("band_key")), "band_key")
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
    cands
      .join(sh.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sh.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
      .select(col("doc1"), col("doc2"),
        TextOps.jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= VerifyJaccard)
      .orderBy(col("doc1"), col("doc2"))
  }

  private val VerifyContainment = 0.5
  private val RareShingleDf = 16
  private val MinRareShared = 2

  /** q149: containment-verified near-dup pairs — the ASYMMETRIC
    * complement of q47. Jaccard misses doc-in-doc near-supersets: a
    * short document fully embedded in a long one has |A∩B|/|A∪B| ≈
    * |A|/|B| → arbitrarily small, while containment c_A = |A∩B|/|A| is
    * ~1 regardless of the size gap — the quote/boilerplate/excerpt case
    * production dedup has to catch. Minhash banding recalls RESEMBLANCE,
    * not containment (the superset's signature is dominated by its extra
    * shingles), so candidates come from TWO generators, unioned:
    * (a) q47's LSH band equi-join (high-jaccard pairs — every q47 pair
    * reappears here, since jaccard ≥ 0.5 ⇒ both containments ≥ 0.5),
    * and (b) rare-shingle blocking: docs sharing ≥2 DISTINCT shingle
    * fingerprints of document frequency ≤ 16 pair up (containment ≥ θ
    * means the contained doc shares ≥ θ·|A| shingles, so only a doc
    * whose shared shingles are nearly all corpus-hot evades the block —
    * and such pairs are boilerplate, which the df cap deliberately
    * refuses to pair on). Requiring TWO independent rare agreements is
    * the winnowing-style fingerprint rule: one shared rare 3-gram is
    * collision-grade evidence, and measured at sf0.1 it is also the
    * noise floor — 1.04 M ≥1-shared pairs vs 96 k ≥2-shared, an 11×
    * cut in exact-verify work for a recall loss only on docs whose
    * entire shared set contains a single rare shingle. The df cap is
    * also the skew/scale bound: per rare shingle ≤ 16 docs →
    * ≤ C(16,2) pairs, so candidates stay linear in corpus size and no
    * bucket ever explodes — never all-pairs. Exact verification runs
    * only on the candidate union; doubles are a single int/int IEEE
    * division in both engines (q47's pattern), so hashes are bit-exact.
    */
  def lshContainmentVerify(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh")))
    val hashRows = graft.Caches.persisted(
      sh.select(col("doc_id"), explode(col("sh")).as("_s"))
        .select(col("doc_id"), TextOps.hash32(col("_s")).as("_h")))
    val banded = TextOps.minhashAggFromHashes(hashRows, "doc_id", "_h", K)
      .select(col("doc_id"), posexplode(TextOps.lshBandKeys(col("sig"), Bands, R))
        .as(Seq("band", "key")))
      .select(col("doc_id"),
        concat(col("band").cast("string"), lit(":"), col("key")).as("band_key"))
    val bandCands = banded.select(col("doc_id").as("doc1"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc2"), col("band_key")), "band_key")
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"))
    // Two-phase rare-pair generation, every aggregate bounded: (1) the
    // df count is a map-side-combinable long per shingle — NEVER a doc
    // list, which a corpus-hot shingle would grow without bound; (2) the
    // semi-join keeps only df≤16 occurrence rows, so the per-shingle
    // collect is ≤16 doc_ids (sorted for determinism) and the ordered
    // pairs (≤C(16,2) per shingle) generate inline — no self-join, and
    // the collect reuses the semi-join's hash partitioning on _h.
    val rareRows = hashRows.join(
      hashRows.groupBy(col("_h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= RareShingleDf).select(col("_h")), "_h")
    val rarePairs = rareRows
      .groupBy(col("_h")).agg(array_sort(collect_set(col("doc_id"))).as("_docs"))
      .filter(size(col("_docs")) >= 2)
      .select(explode(expr(
        """flatten(transform(_docs, (d1, i) ->
          |  transform(slice(_docs, i + 2, size(_docs)), d2 -> struct(d1, d2))))"""
          .stripMargin)).as("_p"))
      .select(col("_p.d1").as("doc1"), col("_p.d2").as("doc2"))
    val rareCands = rarePairs
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= MinRareShared)
      .select(col("doc1"), col("doc2"))
    val cands = bandCands.union(rareCands).distinct()
    // Exact verification intersects 64-BIT FINGERPRINT sets, not shingle
    // strings — the same fingerprint space the blocking index carries,
    // so at scale the strings never leave the scan (and a long-array
    // intersect is ~5× cheaper per pair than hashing 30-char strings:
    // measured 6.6 → 2.9 s at sf0.1 over the ~10⁵ candidate pairs). The
    // intersect is projected ONCE into `_i` in its own Project (both
    // containments and the filter reuse it; inlining it into each would
    // re-evaluate it per reference). Candidate sets have |A| ≥ 1 by
    // construction — no 0/0 guard needed.
    val hs = sh.select(col("doc_id"),
      array_distinct(transform(col("sh"), s => TextOps.hash32(s))).as("hs"))
    cands
      .join(hs.select(col("doc_id").as("doc1"), col("hs").as("hs1")), "doc1")
      .join(hs.select(col("doc_id").as("doc2"), col("hs").as("hs2")), "doc2")
      .select(col("doc1"), col("doc2"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("double").as("_i"),
        size(col("hs1")).cast("double").as("_n1"),
        size(col("hs2")).cast("double").as("_n2"))
      .select(col("doc1"), col("doc2"),
        (col("_i") / col("_n1")).as("containment1"),
        (col("_i") / col("_n2")).as("containment2"))
      .filter(greatest(col("containment1"), col("containment2")) >= VerifyContainment)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** q150: pairwise total-variation distance between per-source unigram
    * distributions, in exact ppm — the corpus-mixture drift panel (is
    * crawl A's vocabulary distribution actually different from crawl
    * B's, and by how much). TV(p,q) = 1 − Σ_t min(p(t), q(t)), computed
    * entirely in integers: Σ_t min(c1·T2, c2·T1) rides decimal(38,0)
    * (hugeint in the oracle) and the ppm is ONE integral floor-division
    * of identical 128-bit rationals, so both engines agree bit-for-bit.
    * Envelope: 10⁶·T1·T2 fits decimal(38,0)/hugeint through ~10¹³
    * tokens per source (≈40 TB of raw text per slice); past it both
    * engines error loudly (ANSI decimal overflow / checked hugeint).
    * Shuffle posture: one vocab×sources count frame (map-side
    * combinable groupBy); the pair join runs on the COLLAPSED counts
    * keyed by token, never on occurrence rows; the pair universe is
    * |sources|² — driver-tiny, broadcast.
    */
  def sourceTvDistance(spark: SparkSession, dir: String): DataFrame = {
    val cnt = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c")))
    val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val pairs = tot.select(col("source").as("source1"), col("t").as("t1"))
      .crossJoin(tot.select(col("source").as("source2"), col("t").as("t2")))
      .filter(col("source1") < col("source2"))
    val joined = cnt.select(col("source").as("source1"), col("tok"), col("c").as("c1"))
      .join(cnt.select(col("source").as("source2"), col("tok"), col("c").as("c2")), "tok")
      .filter(col("source1") < col("source2"))
      .join(broadcast(pairs), Seq("source1", "source2"))
    val sharedAgg = joined.groupBy(col("source1"), col("source2"))
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(least(col("c1").cast("decimal(38,0)") * col("t2"),
          col("c2").cast("decimal(38,0)") * col("t1"))).as("smin"))
    pairs.join(sharedAgg, Seq("source1", "source2"), "left")
      .select(col("source1"), col("source2"),
        coalesce(col("n_shared_terms"), lit(0L)).as("n_shared_terms"),
        (lit(1000000L) - expr(
          """(cast(1000000 as decimal(38,0)) * coalesce(smin, cast(0 as decimal(38,0))))
            | div (cast(t1 as decimal(38,0)) * t2)""".stripMargin))
          .as("tv_ppm"))
      .orderBy(col("source1"), col("source2"))
  }

  /** q151: per-doc shingle NOVELTY — the fraction of each document's
    * distinct 3-gram fingerprints whose global first occurrence (taking
    * doc_id as ingest order) is this document. This is the marginal-
    * value curve a dedup-ordered corpus build reads to decide when a
    * crawl stops contributing new content (distinct from q142's vocab
    * growth: that is corpus-level token counts per bucket; this is
    * per-document and shingle-level). Shuffle posture: everything past
    * the explode carries (hash, doc_id) longs — never text; one
    * groupBy-min over the shingle-fingerprint space and one doc-keyed
    * aggregate — no occurrence-grain join (see [[noveltyPanel]]); ppm
    * is an exact integral floor-division.
    */
  def shingleNovelty(spark: SparkSession, dir: String): DataFrame =
    noveltyPanel(spark, dir).orderBy(col("doc_id"))

  /** [[shingleNovelty]] without the presentation sort — the form other
    * operators compose on (q153 semi-joins it under the corpus build's
    * gates; a sort below a join is wasted work at any scale).
    *
    * No occurrence-grain join: the round-18 30x slope measurement
    * caught the original ex⋈firsts-on-h + double-countDistinct shape
    * going SUPER-linear (q153 2.4x per 10x, then 4.5x per 3x — the
    * occurrence rows were persisted AND re-shuffled twice). The panel
    * needs neither:
    *
    *   - n_shingles is per-document — `size(array_distinct(hashes))`
    *     computed PER ROW over the shingle array (exactly the oracle's
    *     per-doc `count(DISTINCT h)`), no explode, no exchange;
    *   - n_novel: `firsts` carries one row per distinct fingerprint
    *     with its min carrier, so per-doc novel counts are just
    *     `firsts` grouped by first_doc — every fingerprint is novel
    *     for exactly its first carrier, the oracle's
    *     `count(DISTINCT CASE WHEN doc = first_doc THEN h END)`.
    *
    * The corpus-wide shuffle budget is the ONE fingerprint-grain
    * groupBy-min (plus a doc-keyed aggregate three orders of magnitude
    * smaller); nothing occurrence-grain is persisted or joined.
    * [[graft.streaming.NoveltyStream.ingestLazy]] is the same plan
    * against a first-occurrence registry.
    */
  private[queries] def noveltyPanel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val novel = docs
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 3)).as("_s"))
      .select(col("doc_id"), TextOps.hash32(col("_s")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    docs
      .select(col("doc_id"),
        size(array_distinct(transform(TextOps.wordShingles(col("text"), 3),
          s => TextOps.hash32(s)))).cast("long").as("n_shingles"))
      // a doc too short for any 3-shingle has no fingerprint rows —
      // the oracle's inner-join grouping emits no row for it
      .filter(col("n_shingles") > 0L)
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 1000000) div n_shingles").as("novelty_ppm"))
  }

  def simhashes(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    TextOps.simhash(toks, "doc_id", "tok", bits = 60)
      .orderBy(col("doc_id"))
  }

  /** Char-trigram language-ID heuristic: per-language trigram-count
    * scores (exact ints divided by gram length), argmax with profile-order
    * tie-break — all plain length/replace arithmetic, so the DuckDB
    * oracle reproduces every score and the argmax exactly.
    */
  def languageId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextOps.languageId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))

  /** End-to-end training-corpus cleaning — the composition every 100 TB
    * text pipeline runs, as ONE declarative plan: exact dedup (full-md5
    * keep-first), LSH near-dup removal (drop the later doc of any pair
    * sharing ≥2 bands), then quality gating — all over the same cached
    * signature subtree, with per-doc stats on the survivors. Shapes:
    * dedup = groupBy + semi join, near-dup = the banded equi-join, drops
    * = anti join; nothing quadratic, nothing driver-side.
    */
  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val keepFirst = d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val nearDupDrops = lshCandidatePairs(spark, dir)
      .filter(col("n_shared_bands") >= 2)
      .select(col("doc2").as("doc_id")).distinct()
    val stats = textStats(spark, dir)
    stats.join(keepFirst, "doc_id")
      .join(nearDupDrops, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= 0.5)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  private val SimBands = 4
  private val SimBandBits = 15
  private val MaxHamming = 20

  /** SimHash near-dup pairs: band the 60-bit simhash into 4×15-bit keys,
    * equi-join on (band, key) — docs within hamming distance d collide on
    * ≥1 band whenever d < #bands (pigeonhole), so candidate generation is
    * a shuffle join, never all-pairs — then exact hamming gate.
    */
  def simhashNearDupFrom(docs: DataFrame, salts: Int = 1): DataFrame = {
    val sims = graft.Caches.persisted {
      val toks = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      TextOps.simhash(toks, "doc_id", "tok", bits = 60)
    }
    val bandKeys = array((0 until SimBands).map(b =>
      shiftright(col("simhash"), b * SimBandBits).bitwiseAND(lit((1L << SimBandBits) - 1))): _*)
    val banded = sims.select(col("doc_id"), col("simhash"),
      posexplode(bandKeys).as(Seq("band", "key")))
    val a = banded.select(col("doc_id").as("doc1"), col("simhash").as("s1"),
      col("band"), col("key"))
    val b = banded.select(col("doc_id").as("doc2"), col("simhash").as("s2"),
      col("band"), col("key"))
    val joined =
      if (salts <= 1) a.join(b, Seq("band", "key"))
      else graft.operators.Skew.saltedJoin(a, b, Seq("band", "key"), salts)
    joined
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= MaxHamming)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** q138: SimHash DISTANCE histogram — the q32 banded candidate pairs
    * WITHOUT the ≤20 cut, aggregated by hamming distance: the
    * threshold-tuning table (where does the distance mass sit; what
    * would a cut at 15 or 25 keep) read before pinning MaxHamming on
    * a new corpus — q136's calibration sibling for the SimHash rung.
    * Same candidate-pair-grain scale posture as q32; output is ≤61
    * rows (distances representable in 60 bits).
    */
  def simhashDistanceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sims = graft.Caches.persisted {
      val toks = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      TextOps.simhash(toks, "doc_id", "tok", bits = 60)
    }
    val bandKeys = array((0 until SimBands).map(b =>
      shiftright(col("simhash"), b * SimBandBits).bitwiseAND(lit((1L << SimBandBits) - 1))): _*)
    val banded = sims.select(col("doc_id"), col("simhash"),
      posexplode(bandKeys).as(Seq("band", "key")))
    banded.select(col("doc_id").as("doc1"), col("simhash").as("s1"),
        col("band"), col("key"))
      .join(banded.select(col("doc_id").as("doc2"), col("simhash").as("s2"),
        col("band"), col("key")), Seq("band", "key"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long").as("hamming"))
      .distinct()
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))
  }

  /** See [[lshCandidatePairsFrom]] for the hot-band salting contract. */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame =
    simhashNearDupFrom(Tables.documents(spark, dir))

  /** BPE-ish vs whitespace token counts per doc (tokenizer cost model). */
  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  private val FertScale = 1000000L

  /** q112: tokenizer FERTILITY audit — per (lang, source) corpus slice,
    * the tokens-per-word and chars-per-token ratios a multilingual
    * pipeline tracks before fixing a token budget: a language whose
    * fertility (BPE tokens per whitespace word) runs high is
    * under-served by the tokenizer and silently gets fewer effective
    * documents per training token. Ratios are exact fixed point over
    * exact int64 sums of the SAME two counters q33 emits per-doc
    * ([[TextOps.tokenCount]] / [[TextOps.bpeTokenCount]], both codegen
    * expressions) — `(10⁶·Σbpe) div Σws` and `(10⁶·Σchars) div Σbpe`.
    *
    * Scale shape: one narrow scan (two codegen counters per row, text
    * never shuffled) into a map-side-combinable groupBy on the
    * low-cardinality (lang, source) key. int64 headroom: 10⁶·Σtokens
    * caps at ~9·10¹² corpus tokens — promote to decimal(38,0) beyond.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        TextOps.tokenCount(col("text")).as("ws"),
        TextOps.bpeTokenCount(col("text")).as("bpe"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("ws")).as("sum_ws_tokens"),
        sum(col("bpe")).as("sum_bpe_tokens"))
      .withColumn("bpe_per_ws_fp",
        expr(s"($FertScale * sum_bpe_tokens) div sum_ws_tokens"))
      .withColumn("chars_per_bpe_fp",
        expr(s"($FertScale * sum_chars) div sum_bpe_tokens"))
      .orderBy(col("lang"), col("source"))

  /** Rolling-hash (Rabin-Karp) winnowing fingerprints + collision groups:
    * the engine's O(n)-per-doc typed path vs the oracle's per-window
    * Horner recomputation — value-identical exact int64 arithmetic.
    */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fps = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, TextOps.rollingFingerprintJvm(text, 16))
      })
      .toDF("doc_id", "roll_fp")
    fps.select(col("doc_id"), col("roll_fp")).orderBy(col("doc_id"))
  }

  private[graft] val PackBudget = 512L
  private val PackParts = 8

  /** Sequence packing for LLM training shards: every document's start
    * offset in the global concatenated BPE-token stream (doc_id order),
    * its bin (`offset div budget`) and position within the bin. Computed
    * with the two-pass distributed prefix sum ([[TextOps.packOffsets]]) —
    * NOT the single-partition global window the oracle uses; the spec
    * (SeqPackSpec) proves the two formulations identical and that this
    * one keeps multi-partition parallelism.
    */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.bpeTokenCount(col("text")).as("n_tokens"))
    TextOps.packOffsets(counts, "doc_id", "n_tokens", PackParts)
      .select(col("id").as("doc_id"), col("n").as("n_tokens"),
        col("start_offset"),
        expr(s"start_offset div $PackBudget").as("bin"),
        expr(s"start_offset % $PackBudget").as("bin_offset"))
      .orderBy(col("doc_id"))
  }

  /** q74: [[graft.streaming.NearDupStream]]'s pair-emission contract,
    * oracle-gated — ingest the corpus in three id-ordered micro-batches
    * and union the per-batch emissions; the accumulated pair set (with
    * per-pair shared-band counts) must hash-equal the batch q18 join.
    * The exactly-once/completeness claim StreamingSpec proves on small
    * fixtures is here checked bitwise against DuckDB on the full
    * fixture corpus.
    */
  def streamPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))
    val nd = new graft.streaming.NearDupStream(spark)
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    val emitted = Seq(
      nd.ingest(docs.filter(col("doc_id") <= mx / 3), 0L),
      nd.ingest(docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3), 1L),
      nd.ingest(docs.filter(col("doc_id") > 2 * mx / 3), 2L))
    nd.close() // emitted rows are independent checkpoints — safe to free
    emitted.reduce(_ unionByName _)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** q152: the incremental novelty stream driven over doc_id-ordered
    * batches — [[graft.streaming.NoveltyStream]]'s stream ≡ batch
    * contract gated end-to-end on q151's own oracle (the streamed rows
    * union to exactly the batch panel; q74's drive pattern).
    */
  def streamNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))
    val nv = new graft.streaming.NoveltyStream(spark)
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    val emitted = Seq(
      nv.ingest(docs.filter(col("doc_id") <= mx / 3), 0L),
      nv.ingest(docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3), 1L),
      nv.ingest(docs.filter(col("doc_id") > 2 * mx / 3), 2L))
    nv.close() // emitted rows are independent checkpoints — safe to free
    emitted.reduce(_ unionByName _).orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_stream_pairs" -> streamPairs _,
    "q152_stream_novelty" -> streamNovelty _,
    "q52_sequence_pack" -> sequencePack _,
    "q31_corpus_clean" -> corpusClean _,
    "q32_simhash_neardup" -> simhashNearDup _,
    "q33_bpe_token_count" -> bpeTokenCounts _,
    "q112_tokenizer_fertility" -> tokenizerFertility _,
    "q119_dup_inflation" -> dupInflation _,
    "q126_length_histogram" -> lengthHistogram _,
    "q132_top_terms_per_source" -> topTermsPerSource _,
    "q135_dup_cluster_histogram" -> dupClusterHistogram _,
    "q136_lsh_precision" -> lshPrecisionPanel _,
    "q138_simhash_distances" -> simhashDistanceHistogram _,
    "q140_minhash_bias" -> minhashBiasAudit _,
    "q142_vocab_growth" -> vocabGrowth _,
    "q145_length_quality_corr" -> lengthQualityCorr _,
    "q146_stream_vocab" -> streamVocab _,
    "q34_rolling_fingerprint" -> rollingFingerprints _,
    "q13_text_stats" -> textStats _,
    "q14_fingerprint_dedup" -> fingerprintDedup _,
    "q15_token_frequency" -> tokenFrequency _,
    "q16_ngram_jaccard" -> ngramJaccard _,
    "q17_minhash_signatures" -> minhashSignatures _,
    "q18_lsh_candidate_pairs" -> lshCandidatePairs _,
    "q108_split_leakage" -> splitLeakage _,
    "q50_salted_banded_join" -> lshSaltedSkew _,
    "q51_stratified_sample" -> stratifiedSample _,
    "q19_simhash" -> simhashes _,
    "q20_language_id" -> languageId _,
    "q47_lsh_jaccard_verify" -> lshJaccardVerify _,
    "q149_containment_verify" -> lshContainmentVerify _,
    "q150_source_tv_distance" -> sourceTvDistance _,
    "q151_shingle_novelty" -> shingleNovelty _)

  private val stopList = TextOps.Stopwords.map(s => s"'$s'").mkString(", ")
  private val (aList, bList) = {
    val params = TextOps.minhashParams(K)
    (params.map(_._1).mkString("[", ", ", "]"), params.map(_._2).mkString("[", ", ", "]"))
  }
  private val P = TextOps.MinhashP

  // Shared oracle fragments
  private val nTokensSql = "len(text) - len(replace(text, ' ', '')) + 1"
  private val nStopSql =
    s"len(list_filter(string_split(text, ' '), t -> t IN ($stopList)))"
  private val avgWordSql =
    s"cast(len(text) - ($nTokensSql) + 1 AS double) / cast($nTokensSql AS double)"
  private val qualitySql =
    s"""least(1.0,
       |    cast($nStopSql AS double) / cast($nTokensSql AS double) * 2.0
       |    + CASE WHEN ($avgWordSql) BETWEEN 3.0 AND 8.0
       |           THEN 0.5 ELSE 0.0 END)""".stripMargin
  private[queries] val shinglesSql =
    """list_distinct([array_to_string(toks[i:i+2], ' ')
      |               for i in range(1, len(toks) - 1)])""".stripMargin
  private[queries] val sigSql =
    s"""[list_min(list_transform(sh, s ->
       |    ((('0x' || substr(md5(s), 1, 8))::bigint * ($aList)[j+1] + ($bList)[j+1]) % $P)))
       |  for j in range($K)]""".stripMargin

  private val simhashCte =
    """h AS (
      |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::bigint AS h
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |bits AS (
      |  SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
      |  FROM h CROSS JOIN (SELECT unnest(range(60)) AS j)
      |  GROUP BY doc_id, j),
      |sims AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN s > 0 THEN (1::bigint << j) ELSE 0 END)::bigint AS simhash
      |  FROM bits GROUP BY doc_id)""".stripMargin

  private val baseOracles: Map[String, String] = Map(
    // The oracle uses the very global window the engine refuses to run
    // (fine in DuckDB at sf0.01; fatal as a Spark plan at 100 TB) — a
    // deliberately different formulation of the same prefix sum.
    "q52_sequence_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, cast(len(regexp_extract_all(text,
         |    '${TextOps.BpePattern.replace("'", "''")}')) AS bigint) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
         |      AS start_offset
         |  FROM t)
         |SELECT doc_id, n_tokens, start_offset,
         |  start_offset // $PackBudget AS bin,
         |  start_offset % $PackBudget AS bin_offset
         |FROM o ORDER BY doc_id""".stripMargin,
    "q135_dup_cluster_histogram" ->
      """WITH f AS (
        |  SELECT md5(text) AS fp, count(*)::bigint AS size
        |  FROM documents GROUP BY 1)
        |SELECT size, count(*)::bigint AS n_clusters,
        |  (count(*) * size)::bigint AS n_docs,
        |  (count(*) * (size - 1))::bigint AS n_dropped
        |FROM f GROUP BY size ORDER BY size""".stripMargin,
    "q132_top_terms_per_source" ->
      """WITH c AS (
        |  SELECT source, token, count(*)::bigint AS freq FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT source, token, freq,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY freq DESC, token)::bigint AS rank
        |  FROM c)
        |SELECT source, rank, token, freq FROM r
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "q126_length_histogram" ->
      """WITH d AS (
        |  SELECT n_chars, length(bin(n_chars))::bigint AS bucket
        |  FROM documents),
        |t AS (SELECT count(*)::bigint AS n_total FROM d)
        |SELECT bucket, count(*)::bigint AS n_docs,
        |  sum(n_chars)::bigint AS sum_chars,
        |  min(n_chars)::bigint AS min_chars, max(n_chars)::bigint AS max_chars,
        |  t.n_total, ((1000000 * count(*)) // t.n_total)::bigint AS share_ppm
        |FROM d, t GROUP BY bucket, t.n_total ORDER BY bucket""".stripMargin,
    "q119_dup_inflation" ->
      """WITH f AS (
        |  SELECT source, md5(text) AS fp, count(*)::bigint AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, sum(c)::bigint AS n_docs,
        |  count(*)::bigint AS n_distinct_fp,
        |  sum(c - 1)::bigint AS n_dup_docs,
        |  ((1000000 * sum(c)) // count(*))::bigint AS inflation_ppm
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q112_tokenizer_fertility" ->
      s"""WITH d AS (
         |  SELECT lang, source, n_chars,
         |    (len(text) - len(replace(text, ' ', '')) + 1)::bigint AS ws,
         |    cast(len(regexp_extract_all(text,
         |      '${TextOps.BpePattern.replace("'", "''")}')) AS bigint) AS bpe
         |  FROM documents)
         |SELECT lang, source, count(*)::bigint AS n_docs,
         |  sum(n_chars)::bigint AS sum_chars,
         |  sum(ws)::bigint AS sum_ws_tokens,
         |  sum(bpe)::bigint AS sum_bpe_tokens,
         |  (($FertScale * sum(bpe)) // sum(ws))::bigint AS bpe_per_ws_fp,
         |  (($FertScale * sum(n_chars)) // sum(bpe))::bigint AS chars_per_bpe_fp
         |FROM d GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q33_bpe_token_count" ->
      s"""SELECT doc_id,
         |  len(text) - len(replace(text, ' ', '')) + 1 AS n_ws_tokens,
         |  cast(len(regexp_extract_all(text,
         |    '${TextOps.BpePattern.replace("'", "''")}')) AS bigint) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_rolling_fingerprint" ->
      s"""SELECT doc_id,
         |  CASE WHEN len(text) >= 16 THEN
         |    list_min(list_transform(range(len(text) - 16 + 1), i ->
         |      list_reduce(
         |        list_prepend(0::bigint, list_transform(range(16), j ->
         |          ascii(text[cast(i + j + 1 AS int):cast(i + j + 1 AS int)])::bigint)),
         |        (a, b) -> (a * ${TextOps.RollB} + b) % ${TextOps.RollP})))
         |  END AS roll_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q138_simhash_distances" ->
      s"""WITH $simhashCte,
         |banded AS (
         |  SELECT doc_id, simhash, b,
         |    (simhash >> (b * $SimBandBits)) & ${(1L << SimBandBits) - 1} AS key
         |  FROM sims CROSS JOIN (SELECT unnest(range($SimBands)) AS b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc1, b2.doc_id AS doc2,
         |    cast(bit_count(xor(a.simhash, b2.simhash)) AS bigint) AS hamming
         |  FROM banded a JOIN banded b2
         |    ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id)
         |SELECT hamming, count(*)::bigint AS n_pairs
         |FROM cand GROUP BY hamming ORDER BY hamming""".stripMargin,
    "q140_minhash_bias" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |x AS (
         |  SELECT p.doc1, p.doc2,
         |    ((1000000 * len([j for j in range($K)
         |       if g1.sig[j+1] = g2.sig[j+1]])) // $K)::bigint AS est_ppm,
         |    ((1000000 * len(list_intersect(s1.sh, s2.sh)))
         |       // len(list_distinct(list_concat(s1.sh, s2.sh))))::bigint AS jacc_ppm
         |  FROM pairs p
         |  JOIN sig g1 ON g1.doc_id = p.doc1
         |  JOIN sig g2 ON g2.doc_id = p.doc2
         |  JOIN sh s1 ON s1.doc_id = p.doc1
         |  JOIN sh s2 ON s2.doc_id = p.doc2)
         |SELECT doc1, doc2, est_ppm, jacc_ppm,
         |  abs(est_ppm - jacc_ppm)::bigint AS abs_err_ppm
         |FROM x ORDER BY doc1, doc2""".stripMargin,
    "q142_vocab_growth" ->
      """WITH fs AS (
        |  SELECT token, min(doc_id)::bigint AS first_doc FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  GROUP BY 1),
        |m AS (SELECT max(doc_id)::bigint AS mx FROM documents),
        |pc AS (SELECT (unnest(range(1, 11)) * 10)::bigint AS p)
        |SELECT pc.p, ((m.mx * pc.p) // 100)::bigint AS cutoff_doc,
        |  count(*)::bigint AS n_vocab
        |FROM pc CROSS JOIN m
        |JOIN fs ON fs.first_doc <= (m.mx * pc.p) // 100
        |GROUP BY 1, 2 ORDER BY pc.p""".stripMargin,
    "q145_length_quality_corr" ->
      """WITH s AS (
        |  SELECT n_chars::hugeint AS x,
        |    floor(1000000.0 * len(list_distinct(string_split(text, ' ')))
        |      / len(string_split(text, ' ')))::hugeint AS y
        |  FROM documents),
        |m AS (
        |  SELECT count(*)::hugeint AS n, sum(x)::hugeint AS sx,
        |    sum(y)::hugeint AS sy, sum(x * x)::hugeint AS sxx,
        |    sum(y * y)::hugeint AS syy, sum(x * y)::hugeint AS sxy
        |  FROM s)
        |SELECT n::bigint AS n, sx::bigint AS sum_x, sy::bigint AS sum_y,
        |  floor(1000000.0 * cast(n * sxy - sx * sy AS double)
        |    / sqrt(nullif(cast(n * sxx - sx * sx AS double)
        |      * cast(n * syy - sy * sy AS double), 0.0)))::bigint AS pearson_fp
        |FROM m""".stripMargin,
    "q32_simhash_neardup" ->
      s"""WITH $simhashCte,
         |banded AS (
         |  SELECT doc_id, simhash, b,
         |    (simhash >> (b * $SimBandBits)) & ${(1L << SimBandBits) - 1} AS key
         |  FROM sims CROSS JOIN (SELECT unnest(range($SimBands)) AS b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc1, b2.doc_id AS doc2,
         |    cast(bit_count(xor(a.simhash, b2.simhash)) AS bigint) AS hamming
         |  FROM banded a JOIN banded b2
         |    ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id)
         |SELECT doc1, doc2, hamming FROM cand WHERE hamming <= $MaxHamming
         |ORDER BY doc1, doc2""".stripMargin,
    "q31_corpus_clean" ->
      s"""WITH stats AS (
         |  SELECT doc_id, lang, $nTokensSql AS n_tokens, $qualitySql AS quality
         |  FROM documents),
         |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |pairs AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n
         |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |drops AS (SELECT DISTINCT doc2 AS doc_id FROM pairs WHERE n >= 2)
         |SELECT s.doc_id, s.lang, s.n_tokens, s.quality
         |FROM stats s JOIN keep k ON k.doc_id = s.doc_id
         |WHERE s.doc_id NOT IN (SELECT doc_id FROM drops) AND s.quality >= 0.5
         |ORDER BY s.doc_id""".stripMargin,
    "q13_text_stats" ->
      s"""SELECT doc_id, lang,
         |  len(text) - len(replace(text, ' ', '')) + 1 AS n_tokens,
         |  len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS n_stopwords,
         |  cast(len(text) - (len(text) - len(replace(text, ' ', '')) + 1) + 1 AS double)
         |    / cast(len(text) - len(replace(text, ' ', '')) + 1 AS double) AS avg_word_len,
         |  least(1.0,
         |    cast(len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS double)
         |      / cast(len(text) - len(replace(text, ' ', '')) + 1 AS double) * 2.0
         |    + CASE WHEN (cast(len(text) - (len(text) - len(replace(text, ' ', '')) + 1) + 1 AS double)
         |                  / cast(len(text) - len(replace(text, ' ', '')) + 1 AS double)) BETWEEN 3.0 AND 8.0
         |           THEN 0.5 ELSE 0.0 END) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q14_fingerprint_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,
    "q15_token_frequency" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin,
    "q16_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS s
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
         |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |  len(list_intersect(a.s, b.s)) AS n_common,
         |  len(list_distinct(list_concat(a.s, b.s))) AS n_union,
         |  cast(len(list_intersect(a.s, b.s)) AS double)
         |    / cast(len(list_distinct(list_concat(a.s, b.s))) AS double) AS jaccard
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
         |ORDER BY doc1""".stripMargin,
    "q17_minhash_signatures" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh)
         |SELECT doc_id, j, sig[j+1] AS minhash
         |FROM sig CROSS JOIN (SELECT unnest(range($K)) AS j)
         |ORDER BY doc_id, j""".stripMargin,
    "q136_lsh_precision" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |pairs AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |    count(*)::bigint AS n_shared_bands
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT p.n_shared_bands,
         |    CASE WHEN cast(len(list_intersect(s1.sh, s2.sh)) AS double)
         |           / cast(len(list_distinct(list_concat(s1.sh, s2.sh))) AS double)
         |           >= $VerifyJaccard
         |         THEN 1 ELSE 0 END AS ok
         |  FROM pairs p
         |  JOIN sh s1 ON s1.doc_id = p.doc1
         |  JOIN sh s2 ON s2.doc_id = p.doc2)
         |SELECT n_shared_bands, count(*)::bigint AS n_pairs,
         |  sum(ok)::bigint AS n_verified,
         |  ((1000000 * sum(ok)) // count(*))::bigint AS precision_ppm
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_lsh_candidate_pairs" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b))
         |SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_shared_bands
         |FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY doc1, doc2""".stripMargin,
    "q108_split_leakage" ->
      s"""WITH pdocs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 43 = 0 THEN '$PlantedLeakText'
         |         ELSE text END AS text
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pdocs)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |pairs AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::bigint
         |              % 100 < 2 THEN 'test'
         |         WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::bigint
         |              % 100 < 4 THEN 'val'
         |         ELSE 'train' END AS split
         |  FROM documents)
         |SELECT p.doc1, p.doc2, s1.split AS split1, s2.split AS split2,
         |  p.n AS n_shared_bands
         |FROM pairs p
         |JOIN sp s1 ON s1.doc_id = p.doc1
         |JOIN sp s2 ON s2.doc_id = p.doc2
         |WHERE p.n >= 2 AND s1.split != s2.split
         |ORDER BY doc1, doc2""".stripMargin,
    "q51_stratified_sample" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang, source,
         |    ('0x' || substr(md5('sample:' || doc_id), 1, 8))::bigint AS h
         |  FROM documents),
         |k AS (SELECT * FROM s WHERE h % 100 < $SamplePct),
         |r AS (
         |  SELECT *, row_number()
         |    OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS strat_rank
         |  FROM k)
         |SELECT doc_id, lang, source, h, strat_rank
         |FROM r WHERE strat_rank <= $SampleQuota ORDER BY doc_id""".stripMargin,
    "q50_salted_banded_join" ->
      s"""WITH pdocs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 = 0 THEN '$PlantedClusterText'
         |         ELSE text END AS text
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pdocs)),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |pairs AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc1, doc2, n AS n_unsalted, n AS n_salted
         |FROM pairs ORDER BY doc1, doc2""".stripMargin,
    "q149_containment_verify" ->
      s"""WITH shtok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS sh FROM shtok),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |ex AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::bigint AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
         |rare AS (SELECT h FROM ex GROUP BY h HAVING count(*) <= $RareShingleDf),
         |cand AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  UNION
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2
         |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
         |  JOIN rare r ON r.h = a.h
         |  -- DISTINCT shared rare fingerprints, matching the Spark
         |  -- side's collect_set semantics: count(*) counts occurrence-
         |  -- multiplied join rows, so a within-doc md5-prefix collision
         |  -- landing on a shared rare shingle would promote a one-
         |  -- shingle pair into a DuckDB-only candidate at scale
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.h) >= $MinRareShared),
         |hset AS (
         |  SELECT doc_id, list_distinct(list_transform(sh,
         |    s -> ('0x' || substr(md5(s), 1, 8))::bigint)) AS hs
         |  FROM sh),
         |cv AS (
         |  SELECT c.doc1, c.doc2,
         |    cast(len(list_intersect(h1.hs, h2.hs)) AS double)
         |      / cast(len(h1.hs) AS double) AS containment1,
         |    cast(len(list_intersect(h1.hs, h2.hs)) AS double)
         |      / cast(len(h2.hs) AS double) AS containment2
         |  FROM cand c
         |  JOIN hset h1 ON h1.doc_id = c.doc1
         |  JOIN hset h2 ON h2.doc_id = c.doc2)
         |SELECT doc1, doc2, containment1, containment2 FROM cv
         |WHERE greatest(containment1, containment2) >= $VerifyContainment
         |ORDER BY doc1, doc2""".stripMargin,
    "q150_source_tv_distance" ->
      """WITH tk AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        |tot AS (SELECT source, sum(c) AS t FROM cnt GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS source1, a.t AS t1, b.source AS source2, b.t AS t2
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |shared AS (
        |  SELECT a.source AS source1, b.source AS source2,
        |    count(*) AS n_shared_terms,
        |    sum(least(a.c::hugeint * tb.t, b.c::hugeint * ta.t)) AS smin
        |  FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.source < b.source
        |  JOIN tot ta ON ta.source = a.source
        |  JOIN tot tb ON tb.source = b.source
        |  GROUP BY 1, 2)
        |SELECT p.source1, p.source2,
        |  coalesce(s.n_shared_terms, 0) AS n_shared_terms,
        |  cast(1000000 - (1000000::hugeint * coalesce(s.smin, 0))
        |         // (p.t1::hugeint * p.t2) AS bigint) AS tv_ppm
        |FROM pairs p
        |LEFT JOIN shared s ON s.source1 = p.source1 AND s.source2 = p.source2
        |ORDER BY p.source1, p.source2""".stripMargin,
    "q151_shingle_novelty" ->
      s"""WITH shtok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS sh FROM shtok),
         |ex AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::bigint AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
         |firsts AS (SELECT h, min(doc_id) AS first_doc FROM ex GROUP BY 1)
         |SELECT e.doc_id,
         |  count(DISTINCT e.h) AS n_shingles,
         |  count(DISTINCT CASE WHEN e.doc_id = f.first_doc THEN e.h END) AS n_novel,
         |  cast((count(DISTINCT CASE WHEN e.doc_id = f.first_doc THEN e.h END)
         |          * 1000000) // count(DISTINCT e.h) AS bigint) AS novelty_ppm
         |FROM ex e JOIN firsts f ON f.h = e.h
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    "q47_lsh_jaccard_verify" ->
      s"""WITH shtok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS sh FROM shtok),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*$R+1:b*$R+$R], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range($Bands)) AS b)),
         |cand AS (
         |  SELECT a.doc_id AS doc1, b.doc_id AS doc2
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT c.doc1, c.doc2,
         |    cast(len(list_intersect(s1.sh, s2.sh)) AS double)
         |      / cast(len(list_distinct(list_concat(s1.sh, s2.sh))) AS double) AS jaccard
         |  FROM cand c
         |  JOIN sh s1 ON s1.doc_id = c.doc1
         |  JOIN sh s2 ON s2.doc_id = c.doc2)
         |SELECT doc1, doc2, jaccard FROM j
         |WHERE jaccard >= $VerifyJaccard
         |ORDER BY doc1, doc2""".stripMargin,
    "q20_language_id" -> {
      // Mirrors TextOps.languageId: per-language score = sum over grams of
      // (len - len(replace))/len(gram) (int/int → double in both engines,
      // left-assoc addition), argmax via greatest + CASE in profile order.
      val langs = TextOps.LangProfiles.map(_._1)
      val scoreCols = TextOps.LangProfiles.map { case (lang, grams) =>
        val expr = grams.map(g =>
          s"(len(text) - len(replace(text, '$g', ''))) / ${g.length}").mkString(" + ")
        s"$expr AS s_$lang"
      }
      val bestExpr = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseArms = langs.map(l =>
        s"WHEN s_$l = $bestExpr AND s_$l > 0 THEN '$l'").mkString("\n    ")
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    ${scoreCols.mkString(",\n    ")}
         |  FROM documents),
         |p AS (
         |  SELECT lang, CASE
         |    $caseArms
         |    ELSE 'und' END AS predicted
         |  FROM s)
         |SELECT lang, predicted, count(*) AS n
         |FROM p GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
    },
    "q19_simhash" ->
      """WITH h AS (
        |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::bigint AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |bits AS (
        |  SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
        |  FROM h CROSS JOIN (SELECT unnest(range(60)) AS j)
        |  GROUP BY doc_id, j)
        |SELECT doc_id,
        |  sum(CASE WHEN s > 0 THEN (1::bigint << j) ELSE 0 END)::bigint AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** q74 shares q18's oracle verbatim: streamed pair emissions union to
    * exactly the batch candidate-pair join.
    */
  val oracles: Map[String, String] =
    baseOracles +
      ("q74_stream_pairs" -> baseOracles("q18_lsh_candidate_pairs")) +
      ("q146_stream_vocab" -> baseOracles("q142_vocab_growth")) +
      ("q152_stream_novelty" -> baseOracles("q151_shingle_novelty"))

}
