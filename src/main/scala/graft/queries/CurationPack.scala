package graft.queries

import graft.Tables
import graft.ext.{GraphOps, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation pack — the pipeline stages that sit BETWEEN
  * the near-dup primitives (TextPack) and an actual 100 TB pretraining
  * corpus build: pair→group component collapse (q55), repetition
  * quality gates (q56), lexical retrieval over an inverted-postings
  * layout (q57), sublinear domain rebalancing (q58), a PII redaction
  * pass (q59), snapshot CDC diff (q64), count-min heavy hitters (q65),
  * LM-likelihood quality scoring (q66), benchmark decontamination
  * (q67), and the whole thing composed as ONE gated corpus build
  * (q68). The reference scrapes and formats market rows
  * (`/root/reference/dexscraper/dexscraper/scraper.py`); none of these
  * stages exist there — they are the brief's "operations a large-scale
  * training-data pipeline would need", built Spark-first.
  *
  * Every numeric is exact-integer fixed point (floor of a double
  * division of exact int64s — IEEE division is correctly rounded, so
  * any engine reproduces the value bit-for-bit) and every query has a
  * DuckDB oracle that derives the same integers independently.
  */
object CurationPack {

  // ---------------------------------------------------------------- q55

  private val CliqueText =
    "planted duplicate cluster alpha beta gamma delta epsilon zeta eta"

  /** q55: near-dup GROUPS, not pairs — connected components over the
    * union of (a) banded LSH candidate pairs on a corpus with a planted
    * exact-dup clique (`doc_id % 25 == 0`, a diameter-1 near-complete
    * component: 200 docs / 19 900 pairs at sf0.1) and (b) an explicit
    * link table forming bounded CHAINS (`doc_id % 10 == 3` links to
    * `doc_id + 10`, broken every 8th hop so chain diameter stays ≤ 7 at
    * EVERY scale factor — the multi-round propagation case a clique
    * never exercises). Output is the full (node, component) labeling;
    * the oracle computes the identical graph and resolves components
    * with a recursive-CTE transitive closure — a formulation that is
    * fine at sf0.01 and would be quadratic suicide at 100 TB, which is
    * exactly why the engine side iterates min-label rounds instead
    * ([[graft.ext.GraphOps.connectedComponents]]).
    */
  /** q55/q70 shared fixture: the corpus with the planted exact-dup
    * clique (`doc_id % 25 == 0`).
    */
  private def plantedCliqueDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 25 === 0, lit(CliqueText))
        .otherwise(col("text")).as("text"))

  def dedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = plantedCliqueDocs(spark, dir)
    val lshEdges = TextPack.lshCandidatePairsFrom(docs)
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val ids = docs.select(col("doc_id"))
    // d % 10 == 3 chains to d+10; the % 80 == 73 hop is cut so chains
    // never exceed 8 nodes however large the corpus grows.
    val chain = ids
      .filter(col("doc_id") % 10 === 3 && col("doc_id") % 80 =!= 73)
      .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
      .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    GraphOps.connectedComponents(lshEdges.union(chain), "src", "dst")
      .orderBy(col("node"))
  }

  // ---------------------------------------------------------------- q70

  /** q70: the DEEP-diameter component path, oracle-gated — exercises
    * [[graft.ext.GraphOps.starComponents]] (alternating large-star/
    * small-star contraction, O(log² n) rounds on any topology), the
    * documented fallback for exactly the graphs where the q55
    * propagation loop `require`-fails. Fixture: the same planted
    * exact-dup clique as q55 (dense component) PLUS deep chains —
    * `doc_id % 10 == 7` links to `doc_id + 10`, broken every 64th hop
    * (`(doc_id div 10) % 64 == 63`), so chain diameter grows to 64 with
    * the corpus (49 at sf0.01): already past `connectedComponents`'
    * default 20-round bound, while the contraction closes it in a
    * handful of rounds. The oracle is the same recursive-CTE transitive
    * closure as q55 — an independent formulation that never iterates
    * per-hop on the engine side.
    */
  def starDedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = plantedCliqueDocs(spark, dir)
    val lshEdges = TextPack.lshCandidatePairsFrom(docs)
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val ids = docs.select(col("doc_id"))
    val deep = ids
      .filter(col("doc_id") % 10 === 7 && expr("(doc_id div 10) % 64") =!= 63)
      .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
      .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    GraphOps.starComponents(lshEdges.union(deep), "src", "dst")
      .orderBy(col("node"))
  }

  // ---------------------------------------------------------------- q56

  private val FracScale = 1000000L
  private val MaxDupWordFp = 300000L // drop if >30% of words are repeats
  private val MaxTopBigramFp = 200000L // drop if top bigram covers >20%

  /** q56: Gopher-style repetition gates (Rae et al. 2021 §A1.1 use
    * duplicate-line and top-n-gram fractions; the synthetic corpus has
    * no newlines, so the word-level analogues bind instead): duplicate
    * -word fraction and most-frequent-bigram coverage, both as exact
    * ppm fixed point, plus the keep/drop decision. Tie-break for the
    * top bigram is (count desc, bigram asc) via a single min(struct)
    * aggregate — no window over the bigram counts.
    */
  /** Bigram OCCURRENCE rows (NOT distinct — a repetition score must
    * count repeats): explode of the codegen'd per-row
    * [[graft.functions.Shingles.WordShinglesExpr]] 2-gram array, with
    * `w1` (the leading unigram, the q66 conditional's denominator key)
    * recovered by `substring_index` — every step codegen'd; the
    * historical `transform(sequence, slice)` struct build was
    * interpreted. A 0/1-token doc yields no rows (empty shingle array).
    */
  private[graft] def bigramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(TextOps.shingleArray(col("text"), 2)).as("bg"))
      .select(col("doc_id"), substring_index(col("bg"), " ", 1).as("w1"), col("bg"))

  def repetitionFilter(spark: SparkSession, dir: String): DataFrame =
    repetitionFilterFrom(Tables.documents(spark, dir))

  private[graft] def repetitionFilterFrom(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    repetitionFilterOn(t, bigramRows(docs))
  }

  /** The q56 gate over a pre-tokenized (doc_id, toks) frame and its
    * bigram rows — q68 persists both ONCE and feeds the q56 and q66
    * gates the same frames, so the corpus build explodes bigrams a
    * single time instead of once per gate.
    */
  private[graft] def repetitionFilterOn(t: DataFrame, bigrams: DataFrame): DataFrame = {
    val base = t.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_words"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct_words"))
    val top = bigrams.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("n")).as("neg"), col("bg"))).as("m"))
      .select(col("doc_id"), (-col("m.neg")).as("top_bigram_n"),
        col("m.bg").as("top_bigram"))
    val dupFp = floor(lit(FracScale) * (col("n_words") - col("n_distinct_words"))
      / col("n_words")).cast("long")
    val topFp = floor(lit(FracScale) * lit(2L) * col("top_bigram_n")
      / col("n_words")).cast("long")
    base.join(top, "doc_id")
      .withColumn("dup_word_frac_fp", dupFp)
      .withColumn("top_bigram_frac_fp", topFp)
      .withColumn("keep",
        when(col("dup_word_frac_fp") < MaxDupWordFp &&
          col("top_bigram_frac_fp") < MaxTopBigramFp, lit(1L)).otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q57

  private val Bm25TopK = 10
  // k1 = 1.2, b = 0.75 at fixed-point scale 1000; (k1+1) at 2200.
  private val K1Fp = 1200L
  private val BFp = 750L

  /** q57: lexical retrieval over the distributed inverted-index layout —
    * postings (term, doc, tf) from one explode+groupBy, df per term,
    * doc length + corpus stats, then a BM25-family score and a bounded
    * per-query top-k window. Query set: every `doc_id % 100 == 0` doc,
    * terms at token positions 1/3/5 — i.e. the query set scales WITH
    * the corpus (~1% of docs), so it must NOT carry a broadcast hint: a
    * corpus-proportional relation broadcast to every executor is a
    * driver/executor OOM at 100 TB. The query↔postings join is keyed on
    * term, so it plans as a shuffle join at scale; AQE is free to
    * broadcast when the runtime size happens to fit (as at fixture
    * scale). Only the genuinely bounded sides broadcast by contract:
    * the 1-row corpus stats and the per-source quota tables.
    *
    * The scalar is BM25 with an exact-integer idf surrogate:
    * `idf_fp = floor(1e6·(2N−2df+1)/(2df+1))` — the Robertson–Sparck
    * Jones odds WITHOUT the log, so every value stays reproducible
    * integer math across engines (the established pack-wide contract;
    * swapping `ln` in is a one-line change where approximate-replay
    * oracles are acceptable). tf normalization is standard BM25:
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`, all at fixed point.
    * Numeric contract: `idf_fp·tf·2200` is exact in INT64 (wrap-free
    * while `N·tf·2.2e9 < 2^63`); with df=1 and large N it can exceed
    * 2^53, where the final floor(x/denom) divides the SAME int64
    * converted to double in both engines — correctly-rounded IEEE on
    * identical inputs — so cross-engine parity holds even past 2^53.
    * Past the int64 bound Spark's non-ANSI long multiply would wrap
    * silently while DuckDB errors; that range is out of contract.
    * Scale shape: the
    * postings/df join shuffles on term (both sides partition by term),
    * doc-length join on doc_id, corpus stats is a 1-row broadcast, and
    * the top-k is a per-query window over candidate rows only.
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks")))
    val postings = t.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val dfPerTerm = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = t.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val queries = t.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"),
        explode(array(element_at(col("toks"), 1), element_at(col("toks"), 3),
          element_at(col("toks"), 5))).as("term"))
      .distinct()
    val idfFp = floor(lit(FracScale) * (lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L)
      / (lit(2L) * col("df") + 1L)).cast("long")
    val normFp = (lit(250L) +
      floor(lit(BFp) * col("dl") * col("n_docs") / col("sum_dl")).cast("long"))
    val denomFp = col("tf") * 1000L +
      floor(lit(K1Fp) * normFp / lit(1000L)).cast("long")
    val termScoreFp = floor(idfFp * col("tf") * lit(K1Fp + 1000L) / denomFp).cast("long")
    val scored = queries.join(postings, "term")
      .join(dfPerTerm, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s", termScoreFp)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("s")).as("score_fp"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_fp").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Bm25TopK)
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_fp"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q115

  private val SysSampleTarget = 200L

  /** q115: SYSTEMATIC weighted sampling — select ~S docs with inclusion
    * probability proportional to weight (n_chars: "sample documents
    * proportional to their token mass"), the deterministic alternative
    * to A-Res priority sampling: lay every doc's weight end-to-end on
    * the integer line (inclusive prefix sum in doc_id order), cut the
    * line into S equal strides, and keep each doc whose weight span
    * crosses a stride boundary — `(cum_w·S) div W > ((cum_w−w)·S) div W`,
    * all exact int64, reproducible on any engine, any partitioning.
    * A doc heavier than one stride is kept once (never duplicated);
    * the last doc always closes stride S.
    *
    * Scale shape: the prefix sum is [[graft.ext.PrefixOps
    * .groupedRunningAgg]] over a single group — the range-partitioned
    * two-pass, NOT a global window (no single-task sort); the total W
    * is a 1-row broadcast; selection is a narrow codegen predicate.
    * int64 headroom: cum_w·S caps at ~4.6·10¹⁶ corpus chars at S=200.
    */
  def systematicSample(spark: SparkSession, dir: String): DataFrame =
    systematicSampleFrom(Tables.documents(spark, dir))

  private[graft] def systematicSampleFrom(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("n_chars"), lit(1).as("g"))
    val cum = graft.ext.PrefixOps.groupedRunningAgg(
      d, Seq("g"), Seq("doc_id"), Some("n_chars"), sumName = "cum_w")
    val tot = d.agg(sum(col("n_chars")).as("w_total"))
    cum.crossJoin(broadcast(tot))
      .filter(expr(s"(cum_w * $SysSampleTarget) div w_total > " +
        s"((cum_w - n_chars) * $SysSampleTarget) div w_total"))
      .select(col("doc_id"), col("n_chars"), col("cum_w"), col("w_total"),
        expr(s"(cum_w * $SysSampleTarget) div w_total").as("stride"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q58

  /** q58: sublinear domain rebalancing — the CCNet/RefinedWeb-style cap
    * that stops a handful of giant domains dominating the corpus: each
    * `source` keeps only its first `floor(sqrt(n_source))` docs in
    * deterministic salted-hash order (sqrt of an exact int64 is
    * correctly rounded IEEE, so the quota reproduces everywhere). One
    * count agg + one per-source window; the hash order makes the kept
    * subset stable under re-runs and independent of input order —
    * [[graft.ext.TextOps.stratifiedSample]]'s contract, with a
    * per-group DERIVED quota instead of q51's fixed one.
    */
  /** sqrt-quota cap, the ONE definition q58 and q68 share: input needs
    * (doc_id, source); adds h, n_source, quota, cap_rank and keeps only
    * rows with cap_rank <= quota.
    *
    * The rank comes from [[graft.ext.PrefixOps.groupedRunningAgg]] (the
    * range-partitioned two-pass prefix shape), NOT a per-source window:
    * a window would hash every row of a source to ONE task, and a real
    * corpus has a dominant source (a web crawl at 60-80% of rows) —
    * tens of TB through one core at 100 TB. The quota join stays a
    * broadcast (the quota table has one row per source).
    */
  private[graft] def sqrtQuotaCap(docs: DataFrame): DataFrame = {
    // persisted: three downstream passes read this projection (the quota
    // groupBy, the range-partitioner's sampling pass, and the sorted
    // materialization inside groupedRunningAgg) — without the cache the
    // caller's gated subtree recomputes once per pass, a 2-extra-scan
    // cost that scales with the corpus (round 19, guide §1.2)
    val hashed = graft.Caches.persisted(docs.withColumn("h",
      TextOps.hash32(concat(lit("cap:"), col("doc_id").cast("string")))))
    val quotas = hashed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
      .withColumn("quota", floor(sqrt(col("n_source"))).cast("long"))
    graft.ext.PrefixOps
      .groupedRunningAgg(hashed, Seq("source"), Seq("h", "doc_id"),
        rankName = "cap_rank")
      .join(broadcast(quotas), "source")
      .filter(col("cap_rank") <= col("quota"))
  }

  def domainRebalance(spark: SparkSession, dir: String): DataFrame =
    sqrtQuotaCap(Tables.documents(spark, dir).select(col("doc_id"), col("source")))
      .select(col("doc_id"), col("source"), col("n_source"), col("quota"),
        col("h"), col("cap_rank"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q59

  private[queries] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[queries] val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"

  /** q59: PII redaction pass — the scrub stage every web-scale corpus
    * runs before training. The synthetic corpus contains no PII, so the
    * query PLANTS deterministic emails (`doc_id % 7 == 0`) and phone
    * numbers (`doc_id % 11 == 0`) the same way in both engines, then
    * counts and redacts with RE2-compatible patterns (no backrefs, no
    * lookaround — portable across Java regex / RE2 / DuckDB). Gated on
    * match counts, redacted length AND the md5 of the redacted text, so
    * a single byte of divergence in either engine's regex engine breaks
    * the hash.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today"))).otherwise(lit(""))).as("text"))
    val redacted = regexp_replace(
      regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))
    planted.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      length(redacted).cast("long").as("n_chars_redacted"),
      md5(redacted).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q64

  /** q64: incremental corpus refresh — diff two snapshots and emit only
    * moved keys ([[graft.ext.DiffOps.snapshotDiff]]). The second
    * snapshot is a deterministic evolution of the first, planted the
    * same way in both engines: every 13th doc edited, every 17th
    * dropped, every 19th doc spawning a new id — so all three status
    * branches (and the removed-beats-changed precedence on ids
    * divisible by both 13 and 17) are exercised and hash-gated.
    * New ids sit at a DERIVED offset `1000000·(1 + max(doc_id) div 1e6)`
    * — always above every real doc_id, so a fixture past 1M docs can
    * never collide planted ids with real ones (it equals the historic
    * constant 1000000 at every current fixture, keeping hashes stable).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
    val off = base.agg(max(col("doc_id")).as("mx"))
      .select((lit(1000000L) * (lit(1L) + expr("mx div 1000000"))).as("off"))
    val v1 = base.select(col("doc_id"), md5(col("text")).as("fp"))
    val v2 = base.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text"))).as("fp"))
      .union(base.filter(col("doc_id") % 19 === 0).crossJoin(broadcast(off))
        .select((col("doc_id") + col("off")).as("doc_id"),
          md5(concat(lit("new:"), col("text"))).as("fp")))
    graft.ext.DiffOps.snapshotDiff(v1, v2, "doc_id", "fp")
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q65

  /** q65: count-min heavy hitters — the frequency sketch
    * ([[graft.ext.SketchOps.cmsCounters]]) point-queried for the
    * corpus's 20 most frequent tokens, alongside their exact counts.
    * The oracle rebuilds the identical d×w counter matrix in SQL, so
    * the gate pins the full sketch state (any counter diverging shifts
    * some min), the estimate math, and the ≥-exact overestimate
    * property on real data.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token")))
    val counters = graft.ext.SketchOps.cmsCounters(toks, "token")
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(20)
    graft.ext.SketchOps.cmsEstimate(counters, top, "token")
      .orderBy(col("freq").desc, col("token"))
  }

  /** q99: INCREMENTAL count-min maintenance, oracle-gated — the CMS
    * sibling of q96's HLL gate: three doc-ranged batches each build
    * their own d×w counter grid, grids merge by per-cell SUM (the
    * linearity that makes the CMS a streaming/cross-day structure),
    * and heavy-hitter estimates over the merged grid must hash-equal
    * the one-shot batch sketch via q65's own oracle.
    */
  def streamCms(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.SketchOps
    val docs = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    def toks(df: DataFrame) =
      df.select(explode(split(col("text"), " ")).as("token"))
    val merged = Seq(
      docs.filter(col("doc_id") <= mx / 3),
      docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
      docs.filter(col("doc_id") > 2 * mx / 3))
      .map(b => SketchOps.cmsCounters(toks(b), "token"))
      .reduce(_ unionByName _)
      .groupBy(col("i"), col("j")).agg(sum(col("c")).as("c"))
    val top = toks(docs).groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(20)
    SketchOps.cmsEstimate(merged, top, "token")
      .orderBy(col("freq").desc, col("token"))
  }

  // ---------------------------------------------------------------- q66

  private val LmThresholdFp = 30000L // keep docs averaging >= 3% transition prob

  /** q66: language-model quality scoring, the perplexity-filter analog
    * (CCNet/RefinedWeb gate docs on a KenLM score): train corpus
    * bigram/unigram counts, then score each doc by its mean transition
    * probability Σ floor(1e6·c(w1 w2)/c(w1)) / n_bigrams — the
    * log-free exact-integer surrogate (same monotone-scoring contract
    * as q57's idf). Two corpus-count shuffles (unigram, bigram) + one
    * join of per-doc bigram occurrences against the bigram table;
    * at 100 TB the count tables are vocabulary-sized, far below
    * corpus-sized, and combine map-side.
    */
  def bigramLikelihood(spark: SparkSession, dir: String): DataFrame =
    bigramLikelihoodFrom(Tables.documents(spark, dir))

  private[graft] def bigramLikelihoodFrom(docs: DataFrame): DataFrame = {
    val t = graft.Caches.persisted(docs
      .select(col("doc_id"), split(col("text"), " ").as("toks")))
    bigramLikelihoodOn(t, graft.Caches.persisted(bigramRows(docs)))
  }

  /** Corpus LM stats: per-unigram count `(w1, cu)` and per-bigram count
    * `(bg, cb)` — the "model" the q66 gate scores against. Exposed so
    * [[graft.streaming.CurationStream]] can FREEZE a snapshot of them
    * and score incoming micro-batches against fixed counts (the
    * standard shape of a streaming perplexity filter: the reference
    * model is batch-trained, scoring is per-row).
    */
  private[graft] def lmStats(t: DataFrame, bigrams: DataFrame): (DataFrame, DataFrame) = (
    t.select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu")),
    bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cb")))

  /** The q66 scoring formula over arbitrary (uni, bi) count tables.
    * Bigrams absent from the stats contribute p_fp = 0 (left join +
    * coalesce): impossible when the stats come from the scored corpus
    * itself (the q66/q68 path — so oracle parity is untouched), the
    * pessimistic-but-deterministic choice when a frozen snapshot scores
    * later-arriving text.
    */
  private[graft] def bigramLikelihoodScored(bigrams: DataFrame,
      uni: DataFrame, bi: DataFrame): DataFrame = {
    val scored = bigrams.join(bi, Seq("bg"), "left").join(uni, Seq("w1"), "left")
      .withColumn("p_fp",
        coalesce(floor(lit(FracScale) * col("cb") / col("cu")).cast("long"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("sum_p_fp"))
    scored
      .withColumn("score_fp",
        floor(col("sum_p_fp") / col("n_bigrams")).cast("long"))
      .withColumn("keep",
        when(col("score_fp") >= LmThresholdFp, lit(1L)).otherwise(lit(0L)))
      .select(col("doc_id"), col("n_bigrams"), col("sum_p_fp"),
        col("score_fp"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** The q66 gate over pre-tokenized/pre-exploded frames (see
    * [[repetitionFilterOn]]) — both inputs should be persisted by the
    * caller: each is read twice (unigram + bigram counts, then the
    * per-doc score join).
    */
  private def bigramLikelihoodOn(t: DataFrame, bigrams: DataFrame): DataFrame = {
    val (uni, bi) = lmStats(t, bigrams)
    bigramLikelihoodScored(bigrams, uni, bi)
  }

  // ---------------------------------------------------------------- q111

  private val PmiScale = 1000000L
  private val PmiDiscount = 5L  // Mikolov phrase-score count discount
  private val PmiMinCount = 6L  // must exceed the discount
  private val PmiTopK = 50

  /** q111: collocation mining by pointwise mutual information — the
    * phrase-detection pass (Mikolov et al. 2013 §4, word2phrase) every
    * tokenizer-training / embedding pipeline runs to promote "new york"
    * -style bigrams to single units. Log-free exact-integer surrogate
    * of PMI (same monotone-ranking contract as q57's idf and q66's
    * conditional): `pmi_fp = ((cb − δ)·N·10⁶) div (cu1·cu2)` over the
    * exact corpus counts, δ=5 discounting rare accidental pairs, min
    * count 6 (> δ, so the numerator stays positive). Top-50 by
    * (pmi_fp desc, bg asc) — a deterministic total order.
    *
    * Scale shape: unigram and bigram count tables are VOCABULARY-sized
    * (corpus-independent), built by map-side-combinable groupBys over
    * one [[bigramRows]] explode; the scoring joins are count-table ×
    * count-table equi-joins (never corpus-sized; AQE broadcasts them
    * when the vocab fits), the global N is a 1-row broadcast, and the
    * top-K is a TakeOrderedAndProject. The numerator cb·N·10⁶ exceeds
    * int64 long before trillion-token scale (a hot bigram with
    * cb ≈ N/100 wraps around N ≈ 10⁸ tokens), and the denominator
    * cu1·cu2 wraps for hot unigram pairs (~5×10¹⁰ occurrences each at
    * trillion-token scale), so BOTH ride in decimal(38,0) (Spark) /
    * hugeint (DuckDB) unconditionally — the `div` result is back in
    * int64 because PMI itself is bounded.
    */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame =
    pmiCollocationsFrom(Tables.documents(spark, dir))

  private[graft] def pmiCollocationsFrom(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val uni = graft.Caches.persisted(
      t.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu")))
    val nUni = uni.agg(sum(col("cu")).as("n_uni"))
    val bi = bigramRows(docs).groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= PmiMinCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    bi.join(uni.select(col("w").as("w1"), col("cu").as("cu1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), "w2")
      .crossJoin(broadcast(nUni))
      .withColumn("pmi_fp",
        // the DIVISOR rides wide too: hot unigrams at trillion-token
        // scale give cu1·cu2 ≈ (5×10¹⁰)² > 2⁶³ — int64 would wrap
        // silently in Spark (ANSI off) while DuckDB errors
        expr(s"(cast(cb - $PmiDiscount as decimal(38,0)) * n_uni * $PmiScale)" +
          s" div (cast(cu1 as decimal(38,0)) * cu2)"))
      .select(col("bg"), col("w1"), col("w2"), col("cb"), col("cu1"),
        col("cu2"), col("n_uni"), col("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("bg")).limit(PmiTopK)
  }

  // ---------------------------------------------------------------- q67

  private val LeakPhrase = "leak alpha bravo charlie delta echo foxtrot golf"

  /** q67: test-set decontamination — the curation stage that keeps
    * benchmark text out of the training corpus: take the 8-gram shingle
    * set of a benchmark subset (`doc_id % 101 == 0`) and flag every
    * other doc sharing ANY 8-gram. Contamination is planted
    * deterministically (an 8-token phrase appended to benchmark docs
    * AND to `doc_id % 11` docs) so the gate has guaranteed hits; the
    * natural corpus contributes whatever real overlaps exist,
    * identically in both engines. Shape: distinct shingles both sides,
    * one equi-join on the shingle, per-doc count — the benchmark side
    * is vocabulary-sized and semi-join-shaped, never a broadcast of
    * raw text.
    */
  /** (doc_id, sh) OCCURRENCE rows of candidate 8-grams overlapping the
    * `doc_id % 101 == 0` benchmark split — shared by q67 and q68 so the
    * shingle width and bench predicate have one definition. Shingles
    * come from [[TextOps.shingleRows]] (posexplode + window lead,
    * codegen'd — 3× the array-HOF route, which is interpreted and
    * breaks the whole-stage span), so a doc repeating a leaked phrase
    * emits it once per occurrence; consumers that need set semantics
    * dedup on their own grain (q67 `count_distinct`, q68 `distinct`
    * doc ids). The bench side stays a global-distinct shingle set —
    * benchmarks are finite, so at 100 TB it is the bounded build side
    * of the join while the corpus side never re-shuffles its raw text.
    */
  private[graft] def benchOverlaps(docs: DataFrame): DataFrame = {
    val shingled = TextOps.shingleRows(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("_s").as("sh"))
    val bench = shingled.filter(col("doc_id") % 101 === 0)
      .select(col("sh")).distinct()
    shingled.filter(col("doc_id") % 101 =!= 0).join(bench, "sh")
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val planted = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 101 === 0 || col("doc_id") % 11 === 0,
          concat(col("text"), lit(" " + LeakPhrase)))
          .otherwise(col("text")).as("text")))
    benchOverlaps(planted)
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("sh")).as("n_overlapping_shingles"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------- q107

  private val BloomK = 3 // hash functions
  private val BloomBitsPerKey = 16L // m sizing target → FP ≈ 0.5 % at k=3
  private val BloomMinP = 12 // 4096-bit floor
  private val BloomMaxP = 26 // 64 Mbit cap (8 MB — broadcast-sized)

  /** The q107 filter-size rule, shared with the oracle's CTE: the
    * smallest power of two with ≥ [[BloomBitsPerKey]] bits per benchmark
    * shingle (clamped to [2^12, 2^26]) — derived from the DATA like
    * [[graft.ext.VectorOps.planesForCorpus]] sizes SRP buckets, so the
    * filter never saturates as the benchmark grows (a fixed m drifts to
    * FP ≈ 1 and the gate degrades to q67's plain join). Powers of two
    * also make `hash32 % m` exactly uniform.
    */
  private def bloomBits(nKeys: Long): Long =
    1L << (BloomMinP to BloomMaxP)
      .find(p => (1L << p) >= BloomBitsPerKey * nKeys).getOrElse(BloomMaxP)

  /** q107: BLOOM-GATED decontamination — q67's scale path: the benchmark
    * shingle set compiles into a Bloom filter (k=3 md5-derived hashes,
    * [[bloomBits]] bits sized to the benchmark's cardinality, 32-bit
    * words OR-aggregated — benchmark-sized work), the corpus side probes
    * it with k broadcast joins against the SET words only, and only
    * shingles passing all k bit probes reach the exact join. Output per
    * surviving doc: distinct shingles passing the Bloom, distinct exact
    * hits, and the doc-level false-positive flag. The gate proves the
    * filter admits every exact hit (no false negatives — by
    * construction, and the oracle rebuilds the identical bits) and
    * MEASURES the false-positive rate the sizing buys (~0.5 % at 16
    * bits/key).
    *
    * Scale: at 100 TB the q67 equi-join shuffles the corpus's whole
    * shingle stream to meet the bench set; here the probes are narrow
    * broadcast-hash lookups evaluated before any exchange, so the exact
    * join's shuffle carries only Bloom survivors (~FP-rate × corpus +
    * true hits). The broadcast is bounded by the benchmark (≤
    * min(m/32, k·n) set words), exactly the broadcast-a-sketch posture
    * of the IVF codebook and CMS rows.
    */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 101 === 0 || col("doc_id") % 11 === 0,
          concat(col("text"), lit(" " + LeakPhrase)))
          .otherwise(col("text")).as("text"))
    val shingled = graft.Caches.persisted(
      TextOps.shingleRows(planted, "doc_id", "text", 8)
        .select(col("doc_id"), col("_s").as("sh")).distinct())
    val bench = graft.Caches.persisted(
      shingled.filter(col("doc_id") % 101 === 0).select(col("sh")).distinct())
    val m = bloomBits(bench.count())
    def bloomIdx(h: Int): Column =
      pmod(TextOps.hash32(concat(lit(s"bloom$h:"), col("sh"))), lit(m))
    val bw = bench
      .select(explode(array((1 to BloomK).map(bloomIdx): _*)).as("idx"))
      .groupBy(expr("idx div 32").as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(idx % 32 as int)))").as("bits"))
    val probe = (1 to BloomK).foldLeft(
        shingled.filter(col("doc_id") % 101 =!= 0)) { (df, h) =>
      df.withColumn(s"idx$h", bloomIdx(h))
        .join(broadcast(bw.select(col("w").as(s"w$h"), col("bits").as(s"bits$h"))),
          expr(s"w$h = idx$h div 32"), "left")
        .filter(expr(s"(shiftright(coalesce(bits$h, 0L), cast(idx$h % 32 as int)) & 1) = 1"))
    }
    probe.select(col("doc_id"), col("sh"))
      .join(bench.withColumn("hit", lit(1L)), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bloom"),
        sum(coalesce(col("hit"), lit(0L))).as("n_exact"))
      .withColumn("is_fp", (col("n_exact") === 0L).cast("long"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q68

  /** q68: the corpus BUILD — every curation stage composed into one
    * plan over the natural corpus (no planting): exact dedup keeps the
    * min doc per md5; near-dup components over the banded LSH pairs
    * keep only each component's min member (pair→group, q55's operator
    * on real data); the repetition (q56) and LM-likelihood (q66) gates
    * apply; docs `% 101 == 0` are held out as the eval split and every
    * training doc sharing an 8-gram with them is decontaminated away
    * (q67); finally each source keeps its floor(sqrt(n)) hash-ranked
    * quota (q58) — counted AFTER the content gates so caps reflect the
    * surviving distribution. One pass per stage, every join keyed —
    * the plan a 100 TB corpus build would actually run, and the single
    * hash gate that proves all the stage interfaces line up.
    */
  def corpusBuild(spark: SparkSession, dir: String): DataFrame =
    sqrtQuotaCap(corpusGated(spark, dir))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cap_rank"),
        col("quota"))
      .orderBy(col("doc_id"))

  /** The q68 build's gated set BEFORE the quota cap — shared by
    * [[corpusBuild]] and the novelty-composed [[corpusBuildNovelty]]
    * (the cap must count whatever distribution survives the gates, so
    * composition inserts gates here, never after the cap).
    */
  private def corpusGated(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Caches.persisted(Tables.documents(spark, dir))

    // exact + near-dup survivors (keep = my id is the group/component min)
    val exactKeep = docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val comps = GraphOps.connectedComponents(
      TextPack.lshCandidatePairsFrom(docs)
        .select(col("doc1").as("src"), col("doc2").as("dst")),
      "src", "dst")
    val nearDupDrop = comps.filter(col("node") =!= col("comp"))
      .select(col("node").as("doc_id"))

    // content gates: the SAME code paths the individual q56/q66 gates
    // verify, fed ONE persisted tokenization + bigram explode (each
    // gate alone re-derives them; composed, sharing halves the two
    // heaviest scans of the build)
    val t = graft.Caches.persisted(docs
      .select(col("doc_id"), split(col("text"), " ").as("toks")))
    val bigrams = graft.Caches.persisted(bigramRows(docs))
    val repKeep = repetitionFilterOn(t, bigrams)
      .filter(col("keep") === 1L).select(col("doc_id"))
    val lmKeep = bigramLikelihoodOn(t, bigrams)
      .filter(col("keep") === 1L).select(col("doc_id"))

    // eval holdout + decontamination (natural 8-gram overlap only)
    val contaminated = benchOverlaps(docs).select(col("doc_id")).distinct()

    docs
      .filter(col("doc_id") % 101 =!= 0)
      .join(exactKeep, "doc_id", "left_semi")
      .join(nearDupDrop, Seq("doc_id"), "left_anti")
      .join(repKeep, "doc_id", "left_semi")
      .join(lmKeep, "doc_id", "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
  }

  /** Novelty floor for the composed q153/q154 builds: keep a doc iff at
    * least half its distinct 3-gram fingerprints are globally first
    * seen in it (q151's curve read as a stopping criterion). Fixture-
    * independent; binds — drops some docs, keeps some — at every SF.
    */
  private[graft] val NoveltyFloorPpm = 500000L

  /** q153: the corpus build with the NOVELTY FLOOR as a fifth content
    * gate — q68's exact/near-dup/repetition/LM/decontamination plan ∧
    * q151's per-doc shingle novelty ≥ [[NoveltyFloorPpm]], quota-capped
    * AFTER all gates. This is the marginal-content stopping criterion a
    * crawl-ordered corpus build actually applies: a document that
    * mostly re-covers already-ingested shingles without being a
    * near-dup of any single earlier doc passes every q68 gate yet adds
    * almost nothing new — the novelty floor is the only gate that sees
    * it. Composition is one more doc-keyed semi-join over the SAME
    * tested operators (q68's gates, q151's panel) — no new shuffle
    * shape; at 100 TB the novelty panel's groupBy-min on 64-bit
    * fingerprints is the same population the span-dedup log already
    * carries. Reference analog: none — brief-mandated training-data
    * machinery.
    */
  def corpusBuildNovelty(spark: SparkSession, dir: String): DataFrame = {
    val novKeep = TextPack.noveltyPanel(spark, dir)
      .filter(col("novelty_ppm") >= NoveltyFloorPpm)
      .select(col("doc_id"))
    sqrtQuotaCap(corpusGated(spark, dir).join(novKeep, Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cap_rank"),
        col("quota"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q69

  private val MixBudgetTokens = 20000L

  /** q69: the mixture DRAW — the step after q58's cap decides
    * proportions: a global token budget B is split across sources
    * proportionally to their sqrt share
    * (`budget_s = floor(B · sqrt_s / Σ sqrt_t)`, all exact integers),
    * then each source admits docs in deterministic salted-hash order
    * while its running token total stays within budget. This is how a
    * pretraining mixture is actually materialized: budgets in TOKENS
    * (the unit training consumes), not doc counts, and a draw that is
    * reproducible and order-independent. The running token sum is
    * [[graft.ext.PrefixOps.groupedRunningAgg]] (range-partitioned
    * two-pass prefix sum — a per-source window would serialize the
    * dominant source onto one task; see [[sqrtQuotaCap]]) plus one
    * broadcast of the per-source budget table; B is fixture-independent
    * so the gate binds at every SF.
    */
  def mixtureDraw(spark: SparkSession, dir: String): DataFrame = {
    // persisted for the same three-pass reason as [[sqrtQuotaCap]]
    val docs = graft.Caches.persisted(
      Tables.documents(spark, dir).select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.hash32(concat(lit("mix:"), col("doc_id").cast("string"))).as("h")))
    val sqrts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
      .withColumn("s", floor(sqrt(col("n_source"))).cast("long"))
    val totalS = sqrts.agg(sum(col("s")).as("sum_s"))
    val budgets = sqrts.crossJoin(broadcast(totalS))
      .withColumn("budget_tokens",
        floor(lit(MixBudgetTokens) * col("s") / col("sum_s")).cast("long"))
      .select(col("source"), col("budget_tokens"))
    graft.ext.PrefixOps
      .groupedRunningAgg(docs, Seq("source"), Seq("h", "doc_id"),
        sumCol = Some("n_tokens"), sumName = "cum_tokens")
      .join(broadcast(budgets), "source")
      .filter(col("cum_tokens") <= col("budget_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("budget_tokens"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q72

  /** Shared q72/q77 harness: split a corpus into three doc_id-ranged
    * micro-batches and feed them to a stream's ingest in order,
    * returning the per-batch results.
    */
  private[graft] def ingestInThirds[A](docs: DataFrame)(
      ingest: (DataFrame, Long) => A): Seq[A] = {
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    Seq(
      ingest(docs.filter(col("doc_id") <= mx / 3), 0L),
      ingest(docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3), 1L),
      ingest(docs.filter(col("doc_id") > 2 * mx / 3), 2L))
  }

  /** q72: the STREAMING corpus build, oracle-gated — the corpus ingested
    * in three id-ordered micro-batches through
    * [[graft.streaming.CurationStream]] (frozen LM stats and benchmark
    * shingle set snapshotted from the same corpus), then reconciled from
    * the accumulated logs. Hash-gated against the IDENTICAL DuckDB
    * oracle as q68: the incremental fingerprint/band/pair/gate state
    * machinery must land on exactly the batch build's rows — the
    * strongest driver-visible contract the streaming layer has.
    */
  def streamReconcile(spark: SparkSession, dir: String): DataFrame =
    driveCurationStream(spark, dir, noveltyFloor = None)

  /** q154: the STREAMING five-gate corpus build — [[streamReconcile]]'s
    * drive with [[graft.streaming.CurationStream]]'s novelty floor on,
    * hash-gated against the IDENTICAL composed DuckDB oracle as q153:
    * the incremental novelty registry + verdict log must land the
    * reconciled corpus on exactly the batch composition's rows.
    */
  def streamReconcileNovelty(spark: SparkSession, dir: String): DataFrame =
    driveCurationStream(spark, dir, noveltyFloor = Some(NoveltyFloorPpm))

  private def driveCurationStream(spark: SparkSession, dir: String,
      noveltyFloor: Option[Long]): DataFrame = {
    val docs = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")))
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val (uni0, bi0) = lmStats(t, bigramRows(docs))
    val uni = graft.Caches.persisted(uni0)
    val bi = graft.Caches.persisted(bi0)
    val benchSh = TextOps.shingleRows(
        docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
      .select(col("_s").as("sh"))
    val cs = new graft.streaming.CurationStream(spark, uni, bi, benchSh,
      noveltyFloorPpm = noveltyFloor)
    // Micro-batch posture: AQE stays ON. The ProfileQ72 matrix
    // (SCALE.md, round 13) measured the alternatives — AQE off cuts
    // jobs 2.7x but leaves wall flat-to-worse (9.1 vs 11.0 s here),
    // because without runtime coalescing each fixed-shape per-batch
    // stage launches 32 near-empty tasks; job-scheduling overhead is
    // NOT the per-batch constant, stage/exchange materialization is.
    ingestInThirds(docs)(cs.ingest)
    // reconcile() reads the logs LAZILY — materialize it, then release
    // the stream's state blocks deterministically (without close() the
    // logs' final generation waits on weak-reference GC every execution)
    val out = cs.reconcile().localCheckpoint(eager = true)
    cs.close()
    out
  }

  // ---------------------------------------------------------------- q75

  private val SpanHead =
    "begin mirrored license preamble block shared across corpus entries verbatim here"
  private val SpanTail =
    "end shared canonical boilerplate footer sequence appears verbatim across documents"

  private[graft] val SpanW = 8

  /** The q75 fixture corpus: documents with the span-planting applied
    * (shared by the batch operator and [[graft.streaming.SpanDedupStream]]'s
    * q77 harness so both engines and both execution modes shingle the
    * same bytes).
    */
  private[graft] def spanPlantedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 41 === 0,
          concat(lit(SpanHead + " "), col("text"), lit(" " + SpanTail)))
        .when(col("doc_id") % 37 === 0, concat(col("text"), lit(" " + SpanTail)))
        .otherwise(col("text")).as("text"))

  /** Position-keyed shingle occurrences: (doc_id, pos, sh=md5). */
  private[graft] def spanOccurrences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(TextOps.shingleArray(col("text"), SpanW)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), md5(col("s")).as("sh"))

  /** Gaps-and-islands merge of duplicated positions into maximal spans. */
  private[graft] def spansFromHits(hits: DataFrame): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("brk",
        when(col("pos") <= lag(col("pos"), 1).over(byPos) + SpanW, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("g", sum(col("brk")).over(byPos))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (SpanW - 1)).cast("long").as("span_end"),
        (max(col("pos")) - min(col("pos")) + SpanW).cast("long").as("span_tokens"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("span_tokens"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** q75: cross-document EXACT-SUBSTRING span dedup — the span-grain
    * member of the dedup family (q14 = whole-doc md5, q55 = near-dup
    * groups, q56 = intra-doc repetition, q67 = holdout contamination):
    * every maximal run of tokens appearing verbatim in ≥2 distinct
    * documents, the "remove duplicated spans" pass of suffix-array
    * corpus dedup. Single-node implementations build a corpus-wide
    * suffix array; the distributed formulation is shingle-join-shaped
    * and needs no global order:
    *
    *   1. every W=8-token shingle OCCURRENCE, position-keyed
    *      (posexplode over the codegen'd
    *      [[graft.functions.Shingles.WordShinglesExpr]]);
    *   2. a shingle is duplicated when `min(doc_id) != max(doc_id)`
    *      over its occurrences — the ≥2-distinct-docs test as two
    *      map-side-combinable partial aggs (no count_distinct
    *      expansion, no per-shingle doc list);
    *   3. per doc, duplicated positions merge into maximal spans via
    *      gaps-and-islands (break when `pos > prev + W`: token
    *      coverage no longer overlaps or touches).
    *
    * Planted fixtures force every path: `% 41` docs are WRAPPED
    * head+tail (two islands per doc), `% 37` docs get the tail phrase
    * only (a mid/tail span), and the natural corpus contributes its
    * shared-prefix near-dups (spans at 0).
    *
    * Scale: the only corpus-wide shuffle carries (md5(shingle),
    * doc_id, pos) — fixed-width keys, never raw text; the islands
    * window is per-doc (bounded by document length — the safe kind of
    * window, unlike the per-source shapes this pack replaced); the dup
    * set comes back as a keyed equi-join on the hash. Reference
    * analog: none — brief-mandated training-data machinery.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    val shing = graft.Caches.persisted(
      spanOccurrences(spanPlantedDocs(spark, dir)))
    val dup = shing.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("_mn"), max(col("doc_id")).as("_mx"))
      .filter(col("_mn") =!= col("_mx"))
      .select(col("sh"))
    val hits = shing.join(dup, "sh").select(col("doc_id"), col("pos"))
    spansFromHits(hits)
  }

  // ---------------------------------------------------------------- q78

  /** q78: span REMOVAL — the actionable half of q75 (flag→act, the
    * same pairing as PII detect→redact): cut every duplicated span
    * from every doc EXCEPT the canonical copy, where a duplicated
    * shingle's canonical owner is the min doc_id among its
    * occurrences — the "keep one occurrence" policy at SHINGLE grain:
    * each duplicated 8-gram survives exactly in its owner. (Ownership
    * is per-shingle, so a multi-shingle region whose shingles have
    * DIFFERENT owners — one of its 8-grams also occurs in some third,
    * smaller doc — can be cut in every doc that holds the full region;
    * the policy trades that edge for a pure two-pass keyed plan.)
    * Output per affected doc: tokens removed and the md5 of the
    * rewritten text (fully-duplicated non-owner docs collapse to the
    * empty string — the whole-doc-dup degenerate case).
    *
    * Shape: ownership rides the SAME min/max aggregate as q75's
    * duplicate test; non-owner occurrences expand to their ≤8 covered
    * token positions (bounded explode); tokens leave via an equi
    * anti-join on (doc_id, position) — never a non-equi/NLJ plan —
    * and the rebuild is a per-doc sort_array over (position, token)
    * structs, deterministic and doc-bounded.
    */
  def spanRemoval(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Caches.persisted(spanPlantedDocs(spark, dir))
    val occ = graft.Caches.persisted(spanOccurrences(docs))
    val own = occ.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("owner"), max(col("doc_id")).as("_mx"))
      .filter(col("owner") =!= col("_mx"))
      .select(col("sh"), col("owner"))
    val covered = graft.Caches.persisted(occ.join(own, "sh")
      .filter(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SpanW - 1))).as("ti"))
      .distinct())
    // only AFFECTED docs re-materialize: the rebuild below explodes,
    // anti-joins and re-sorts tokens, and at corpus scale most docs
    // hold no duplicated span — semi-join first, rebuild second
    val tokrows = docs
      .join(covered.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("ti", "tok")))
    val rebuilt = tokrows.join(covered, Seq("doc_id", "ti"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("ti"), col("tok")))),
          x => x.getField("tok")), " ").as("ntext"))
    covered.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens_removed"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens_removed"),
        md5(coalesce(col("ntext"), lit(""))).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q77

  /** q77: [[graft.streaming.SpanDedupStream]]'s hit-emission contract
    * gated end-to-end: three doc_id-ranged micro-batches ingest the
    * SAME planted corpus as q75, the per-batch hit emissions union
    * raw (no dedup — exactly-once is load-bearing and separately
    * spec-pinned), and reconciliation merges them into spans that
    * must hash-equal the batch operator's own oracle. Cross-batch
    * retroactivity is exercised by construction: the planted tail
    * phrase appears in all three ranges, so batch-0 occurrences are
    * emitted retroactively when later batches prove duplication.
    */
  def streamSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Caches.persisted(spanPlantedDocs(spark, dir))
    val st = new graft.streaming.SpanDedupStream(spark)
    // the emitted hits are independent checkpoints and reconcileSpans
    // reads only those — the occurrence log can be released here rather
    // than leak its final generation to weak-reference GC
    val spans = st.reconcileSpans(ingestInThirds(docs)(st.ingest).reduce(_ union _))
    st.close()
    spans
  }

  // ---------------------------------------------------------------- q79

  /** q79: CROSS-MODAL curation gate — text and embedding quality
    * signals joined into one verdict per document (doc_id ≡ vec_id in
    * the fixture corpus, the multimodal-alignment convention): a doc
    * is kept when it passes the q56 repetition gate AND its embedding
    * sits inside the exact Tukey norm fence
    * ([[VectorPack.normFence]], natural corpus — no planting). This is
    * the composition a multimodal corpus build runs: modality gates
    * computed independently on their own tables (each with its own
    * scale shape), combined by ONE doc-keyed equi-join at the end —
    * never a fused pass that would couple the text shuffle to the
    * vector shuffle.
    */
  def crossModalGate(spark: SparkSession, dir: String): DataFrame = {
    val rep = repetitionFilterFrom(Tables.documents(spark, dir))
      .select(col("doc_id"), col("keep").as("keep_text"))
    val emb = VectorPack.normFence(spark, dir, plant = false)
      .select(col("vec_id").as("doc_id"),
        when(col("low") || col("high"), lit(0L)).otherwise(lit(1L))
          .as("keep_emb"))
    rep.join(emb, "doc_id")
      .select(col("doc_id"), col("keep_text"), col("keep_emb"),
        (col("keep_text") * col("keep_emb")).as("keep"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q80

  /** q80: deterministic corpus split — the train/val/test partition
    * every pretraining run needs, as a PURE FUNCTION of the data (no
    * RNG, no `df.sample`): bucket = 32-bit md5 of the salted doc_id,
    * mod 100; buckets 0–1 → test, 2–3 → val, rest → train (2/2/96).
    * Membership is reproducible across runs, engines and
    * partitionings, and ingesting MORE documents never reassigns an
    * existing one — the stability property a random split cannot give
    * (same posture as [[TextOps.stratifiedSample]], different
    * contract: exhaustive disjoint partition vs per-stratum quota).
    * Output is the split MANIFEST (split × source: doc/token counts,
    * id range, hash checksum) — `h_sum` is sensitive to every single
    * assignment, so one doc in the wrong split breaks the gate.
    * Scale: the assignment is a map-side pure function (no shuffle on
    * the corpus); the manifest is one fixed-cardinality aggregate.
    */
  def corpusSplit(spark: SparkSession, dir: String): DataFrame = {
    val assigned = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.hash32(concat(lit("split:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("split",
        when(col("h") % 100 < 2, lit("test"))
          .when(col("h") % 100 < 4, lit("val"))
          .otherwise(lit("train")))
    assigned.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("h")).as("h_sum"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"), col("source"))
  }

  // ---------------------------------------------------------------- q81

  private val DsirBuckets = 1024L
  private val DsirScale = 10000.0
  private val DsirTopK = 100

  /** q81: hashed n-gram importance scoring — the DSIR shape (Xie et
    * al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): estimate target-vs-raw unigram/bigram
    * distributions over a FIXED set of hashed feature buckets, weight
    * each bucket by its smoothed target/raw frequency ratio, score
    * every document by the sum of its occurrences' bucket weights,
    * keep the top-K. Target here is the English subset (`lang='en'`);
    * raw is the whole corpus. Arithmetic is exact-integer counts plus
    * ONE correctly-rounded double division per bucket, floor'ed to
    * fixed point — both engines land identical int64 scores.
    *
    * Scale shape: the bucket space is fixed (1024), so the raw/target
    * count tables and the weight table are tiny → broadcast; scoring
    * is a map-side broadcast join over the bigram stream plus one
    * doc-keyed aggregate; selection is TakeOrderedAndProject (never a
    * global window sort). At 100 TB the only corpus-sized shuffle is
    * the per-doc score aggregate — the DSIR paper's own one-pass
    * design.
    */
  def importanceResample(spark: SparkSession, dir: String): DataFrame = {
    val bk = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(TextOps.shingleArray(col("text"), 2)).as("g"))
      .select(col("doc_id"), col("lang"),
        pmod(TextOps.hash32(concat(lit("dsir:"), col("g"))),
          lit(DsirBuckets)).as("b")))
    val raw = bk.groupBy(col("b")).agg(count(lit(1)).as("cnt_r"))
    val tgt = bk.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("cnt_t"))
    val w = raw.join(tgt, Seq("b"), "left").select(col("b"),
      floor(lit(DsirScale) * (coalesce(col("cnt_t"), lit(0L)) + lit(1L)).cast("double") /
        (col("cnt_r") + lit(1L)).cast("double")).cast("long").as("w"))
    bk.join(broadcast(w), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("score_fp"), count(lit(1)).as("n_bigrams"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(DsirTopK)
  }

  // ---------------------------------------------------------------- q83

  /** q83: quality-decile binning — the curriculum/quality-bucketing
    * stage (FineWeb-style quality tiers, Ask-LLM bucket sampling):
    * score every document (type-token ratio in exact fixed point),
    * find the corpus's EXACT decile boundaries with the distributed
    * prefix-sum quantile operator ([[graft.ext.StatOps.exactQuantiles]]
    * — no approx_percentile drift between engines), and label each doc
    * with its bin (count of boundaries ≤ score, deterministic under
    * ties). Output is the per-bin census.
    *
    * Scale: scoring is map-side; boundaries are 9 rows → broadcast;
    * binning is a 9-row broadcast theta-join + one aggregate. The only
    * corpus shuffles are the quantile operator's value-histogram
    * groupBy and the final fixed-cardinality census.
    */
  // ---------------------------------------------------------------- q91

  /** q91: INVERTED-INDEX build stats — the index layer q57's BM25
    * retrieval reads, materialized as a first-class output: per term
    * its document frequency, collection frequency, and the champion
    * document (max tf, ties to the smaller doc_id — the "champion
    * list" head a WAND/impact-ordered index keeps per posting list).
    *
    * Scale shape: two map-side-combinable aggregations — (term,
    * doc_id)→tf then term→(df, cf, argmax) with the argmax as a
    * min-struct fold (no per-term window, no collect); both shuffles
    * key on the term, so the second reuses the first's partitioning.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val postings = t.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        min(struct((-col("tf")).as("neg"), col("doc_id"))).as("m"))
      .select(col("term"), col("df"), col("cf"),
        (-col("m.neg")).as("top_tf"), col("m.doc_id").as("top_doc_id"))
      .orderBy(col("term"))
  }

  // ---------------------------------------------------------------- q98

  /** q98: pairwise SOURCE similarity via KMV sketch overlap
    * ([[graft.ext.SketchOps.kmvPairOverlap]]) — "which crawls/feeds
    * overlap?" over the bigram profile of each source, the question a
    * curation pipeline answers before weighting a mixture (near-
    * identical sources double-count). Each source's ~700-bigram
    * profile compresses to a 64-hash kept set; every pair's Jaccard
    * is estimated from the sketches alone and gated BESIDE the exact
    * bigram-set Jaccard (inter/union/ppm), so the artifact records
    * estimate AND ground truth for all 190 pairs.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.{SketchOps, TextOps}
    val bg = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextOps.shingleArray(col("text"), 2)).as("bg"))
      .distinct())
    val est = SketchOps.kmvPairOverlap(
      SketchOps.kmvKeptHashes(bg, Seq("source"), "bg"), "source")
    val sizes = bg.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = bg.select(col("source").as("s1"), col("bg"))
      .join(bg.select(col("source").as("s2"), col("bg")), "bg")
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("exact_inter"))
    est
      .join(inter, Seq("s1", "s2"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .join(sizes.select(col("source").as("s1"), col("n").as("_n1")), "s1")
      .join(sizes.select(col("source").as("s2"), col("n").as("_n2")), "s2")
      .withColumn("exact_union", col("_n1") + col("_n2") - col("exact_inter"))
      .withColumn("exact_jaccard_ppm",
        expr("(exact_inter * 1000000L) div exact_union"))
      .select(col("s1"), col("s2"), col("k_used"), col("n_shared"),
        col("est_jaccard_ppm"), col("exact_inter"), col("exact_union"),
        col("exact_jaccard_ppm"))
      .orderBy(col("s1"), col("s2"))
  }

  // ---------------------------------------------------------------- q97

  private val BpeRounds = 5
  private val Sep1 = "\u0001" // merge glue (replaces the pair's space)
  private val Sep2 = "\u0002" // token start marker
  private val Sep3 = "\u0003" // token end marker

  /** q97: BPE-style vocabulary induction (Sennrich, Haddow & Birch,
    * "Neural Machine Translation of Rare Words with Subword Units",
    * ACL 2016, at word granularity) — the merge-table trainer of the
    * tokenizer the token-count ops (q33) consume: each round counts
    * adjacent-token pairs across the corpus, elects the most frequent
    * (ties to the lexicographically smaller pair), and applies the
    * merge corpus-wide; the output is the learned merge table
    * (round, w1, w2, merged, n).
    *
    * Boundary safety: every token is wrapped ␂token␃ before training,
    * so the merge's string replace can only match WHOLE adjacent
    * tokens (a pair pattern "␂w1␃ ␂w2␃" cannot match inside a longer
    * token, a prefix, or a suffix); both engines' `replace` scan
    * left-to-right non-overlapping, which IS greedy BPE application.
    *
    * Scale shape: per round ONE codegen shingle explode + count
    * aggregate, ONE 1-row argmin fold, and ONE broadcast of that row
    * back onto the corpus for a narrow map — the elected pair never
    * routes through the driver, and the corpus re-persists per round
    * so round r+1 does not recompute rounds 1..r.
    */
  /** The shared BPE training loop: wraps every word ␂w␃, runs
    * [[BpeRounds]] elect-and-apply rounds, and returns both the per-round
    * merge rows and the final merged corpus — [[bpeTrain]] (q97) keeps
    * the merge table, [[bpeEncode]] (q103) keeps the corpus.
    */
  private def bpeRun(spark: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    var txt: DataFrame = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit(Sep2),
        org.apache.spark.sql.functions.replace(
          col("text"), lit(" "), lit(s"$Sep3 $Sep2")),
        lit(Sep3)).as("t"))
    val merges = (1 to BpeRounds).map { r =>
      val cur = graft.Caches.persisted(txt)
      val best = cur
        .select(explode(TextOps.shingleArray(col("t"), 2)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("n"))
        .agg(min(struct((-col("n")).as("neg"), col("bg"))).as("m"))
        .select(lit(r.toLong).as("round"),
          col("m.bg").as("bg"), (-col("m.neg")).as("n"))
      txt = cur.crossJoin(broadcast(best))
        .select(col("doc_id"),
          org.apache.spark.sql.functions.replace(col("t"), col("bg"),
            org.apache.spark.sql.functions.replace(
              col("bg"), lit(" "), lit(Sep1))).as("t"))
      best
    }
    (merges, txt)
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val (merges, _) = bpeRun(spark, dir)
    val strip = (c: org.apache.spark.sql.Column) =>
      translate(c, Sep1 + Sep2 + Sep3, "")
    merges.reduce(_ unionByName _)
      .select(col("round"),
        strip(substring_index(col("bg"), " ", 1)).as("w1"),
        strip(substring_index(col("bg"), " ", -1)).as("w2"),
        strip(org.apache.spark.sql.functions.replace(
          col("bg"), lit(" "), lit(""))).as("merged"),
        col("n"))
      .orderBy(col("round"))
  }

  // --------------------------------------------------------------- q103

  /** q103: BPE ENCODE — apply the q97-trained merge table corpus-wide
    * and report each document's tokenization: words in (whitespace
    * units), tokens out (after all [[BpeRounds]] greedy merges), merges
    * applied, and the exact compression in ppm. This is the trainer →
    * tokenizer link every LLM-data pipeline runs (train the vocab once,
    * then encode 100 TB with it); q33's static-regex token count is the
    * heuristic stand-in, this is the learned tokenizer itself.
    *
    * Both counts come from ONE pass over the merged corpus: every
    * original word was wrapped ␂w␃ before training and merges only fuse
    * the inter-word ["␃ ␂" → "␃␁␂"] seam, so word count = ␂ occurrences
    * and token count = space-separated units — no re-join with the raw
    * table, no second tokenize.
    *
    * Scale shape: [[bpeRun]]'s per-round cost (one codegen bigram
    * explode + count, one 1-row argmin, one broadcast-map) plus a single
    * narrow per-doc projection — nothing new shuffles; the output is one
    * row per document.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, corpus) = bpeRun(spark, dir)
    corpus
      .withColumn("n_words",
        (length(col("t")) - length(org.apache.spark.sql.functions.replace(
          col("t"), lit(Sep2), lit("")))).cast("long"))
      .withColumn("n_tokens", size(split(col("t"), " ", -1)).cast("long"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        (col("n_words") - col("n_tokens")).as("n_merges"),
        expr("(n_words - n_tokens) * 1000000 div n_words").as("merged_ppm"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q95

  private val CdcModulus = 16

  /** q95: chunk-grain dedup over content-defined segments
    * ([[graft.ext.TextOps.contentChunks]]) — the edit-robust middle
    * ground between document-grain fingerprints (q14) and
    * fixed-window span dedup (q75): chunks shared by ≥2 documents,
    * with occurrence/document counts and the canonical owner (min
    * doc_id). A storage- or curation-layer dedup keeps the owner's
    * copy and references it elsewhere.
    *
    * Scale shape: the chunker's only per-doc work is a doc-partitioned
    * cumsum window; the dedup itself is ONE fingerprint-keyed
    * aggregation (map-side combinable) — the same shuffle posture as
    * exact dedup, at chunk grain.
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextOps.contentChunks(
        Tables.documents(spark, dir), "doc_id", "text", CdcModulus)
      .groupBy(col("fp"), col("n_tokens"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("owner_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("fp"))

  // ---------------------------------------------------------------- q90

  private val TextRankIters = 3
  private val TextRankTopK = 50

  /** q90: TextRank keyword extraction (Mihalcea & Tarau, "TextRank:
    * Bringing Order into Text", EMNLP 2004) — corpus-level salient
    * terms as the stationary weights of a damped random walk on the
    * word co-occurrence graph: nodes = tokens, undirected edges =
    * adjacent-token bigrams weighted by corpus count (self-loops from
    * immediate repeats dropped), ranked by [[graft.ext.GraphOps
    * .weightedPageRank]] in exact integer fixed point (3 unrolled
    * power-iteration rounds, damping 85/100) — no floating point, so
    * the oracle re-derives every iterate bit-for-bit. Output: the top
    * 50 tokens by (rank desc, token asc).
    *
    * Scale shape: the graph build reuses the codegen'd bigram explode
    * ([[bigramRows]]) + two count aggregates; each PageRank round is
    * one rank-frame equi-join + one groupBy-sum (the Pregel shape —
    * see weightedPageRank's scaladoc); the final top-k is a
    * TakeOrdered over the vocabulary-sized rank frame, never a window.
    */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    val dir1 = bigramRows(Tables.documents(spark, dir))
      .select(col("w1").as("src"),
        substring_index(col("bg"), " ", -1).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val sym = dir1.unionByName(
        dir1.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    graft.ext.GraphOps.weightedPageRank(sym, TextRankIters)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(TextRankTopK)
      .select(col("node").as("token"), col("rank").as("rank_scaled"))
  }

  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val s = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        floor(lit(1000000.0) * size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).cast("long").as("score_fp")))
    val qs = graft.ext.StatOps.exactQuantiles(s, "score_fp", 10 to 90 by 10)
      .select(col("value").as("qv"))
    s.join(broadcast(qs), col("qv") <= col("score_fp"), "left")
      .groupBy(col("doc_id"), col("score_fp"))
      .agg(count(col("qv")).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_fp")).as("min_score"),
        max(col("score_fp")).as("max_score"))
      .orderBy(col("bin"))
  }

  private val LorenzPcts = Seq(1L, 10L, 50L)

  /** q133: corpus CONCENTRATION curve — Lorenz points: what share of
    * the corpus' character mass do the heaviest 1% / 10% / 50% of
    * documents hold? The inequality number behind mixture planning
    * ("half the tokens come from 2% of docs — cap or split them") and
    * behind q58's sqrt rebalancing decision. Docs rank by
    * (n_chars desc, doc_id) through [[graft.ext.PrefixOps
    * .groupedRunningAgg]] (single group, range-partitioned two-pass —
    * no global window) carrying the inclusive char running sum; the
    * Lorenz point p keeps the row at rank `(n·p) div 100` (the
    * heaviest p%), emitting exact `(10⁶·cum_chars) div total_chars`.
    */
  def concentrationCurve(spark: SparkSession, dir: String): DataFrame = {
    // persisted for the same three-pass reason as [[sqrtQuotaCap]]
    val d = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        (-col("n_chars")).as("neg_chars"), lit(1).as("g")))
    val ranked = graft.ext.PrefixOps.groupedRunningAgg(
      d, Seq("g"), Seq("neg_chars", "doc_id"), Some("n_chars"),
      rankName = "rank", sumName = "cum_chars")
    val tot = d.agg(count(lit(1)).as("n_total"),
      sum(col("n_chars")).as("total_chars"))
    ranked.crossJoin(broadcast(tot))
      .join(broadcast(spark.createDataFrame(
          LorenzPcts.map(p => (p, p))).toDF("p", "p2")).drop("p2"),
        col("rank") === expr("(n_total * p) div 100"))
      .select(col("p"), col("rank").as("n_docs_top"),
        col("cum_chars"), col("total_chars"),
        // decimal/hugeint: 10⁶·cum_chars is corpus-total-chars scale,
        // which wraps int64 at ~9 TB of text — far below target scale
        expr("(cast(1000000 as decimal(38,0)) * cum_chars) div total_chars")
          .as("char_share_ppm"))
      .orderBy(col("p"))
  }

  /** q130: PERCENTILE-RANK normalization — every doc's corpus-relative
    * quality standing in ppm (`(10⁶·(rank−1)) div (n−1)` over the
    * total order (score_fp, doc_id)), the normalization a curriculum
    * or mixture-weighting stage consumes instead of raw scores (raw
    * fixed-point scores aren't comparable across corpora; percentile
    * ranks are). Score is q83's exact type-token ratio; the global
    * rank comes from [[graft.ext.PrefixOps.groupedRunningAgg]] over a
    * single group — the range-partitioned two-pass, NOT a global
    * row_number window (which would serialize the corpus through one
    * task); the 1-row total broadcasts.
    */
  def percentileRanks(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the type-token score splits every document's text — the
    // dominant scan — and is read by three passes (total count, range
    // sampling, sorted materialization); cache the 16-byte projection so
    // the text is tokenized once (round 19)
    val s = graft.Caches.persisted(Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        floor(lit(1000000.0) * size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).cast("long").as("score_fp"),
        lit(1).as("g")))
    val ranked = graft.ext.PrefixOps.groupedRunningAgg(
      s, Seq("g"), Seq("score_fp", "doc_id"), None, rankName = "rank")
    val tot = s.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("pct_ppm",
        expr("(1000000 * (rank - 1)) div greatest(n_total - 1, 1L)"))
      .select(col("doc_id"), col("score_fp"), col("rank"), col("pct_ppm"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_dedup_components" -> dedupComponents _,
    "q56_repetition_filter" -> repetitionFilter _,
    "q57_bm25_topk" -> bm25TopK _,
    "q58_domain_rebalance" -> domainRebalance _,
    "q59_pii_redact" -> piiRedact _,
    "q64_snapshot_diff" -> snapshotDiff _,
    "q65_cms_heavy_hitters" -> cmsHeavyHitters _,
    "q66_bigram_likelihood" -> bigramLikelihood _,
    "q111_pmi_collocations" -> pmiCollocations _,
    "q115_systematic_sample" -> systematicSample _,
    "q67_decontaminate" -> decontaminate _,
    "q107_bloom_decontaminate" -> bloomDecontaminate _,
    "q68_corpus_build" -> corpusBuild _,
    "q153_corpus_build_novelty" -> corpusBuildNovelty _,
    "q154_stream_reconcile_novelty" -> streamReconcileNovelty _,
    "q69_mixture_draw" -> mixtureDraw _,
    "q70_star_components" -> starDedupComponents _,
    "q72_stream_reconcile" -> streamReconcile _,
    "q75_span_dedup" -> spanDedup _,
    "q77_stream_spans" -> streamSpans _,
    "q78_span_removal" -> spanRemoval _,
    "q79_crossmodal_gate" -> crossModalGate _,
    "q80_corpus_split" -> corpusSplit _,
    "q81_importance_resample" -> importanceResample _,
    "q83_quality_deciles" -> qualityDeciles _,
    "q130_percentile_ranks" -> percentileRanks _,
    "q133_concentration_curve" -> concentrationCurve _,
    "q90_textrank_keywords" -> textrankKeywords _,
    "q91_inverted_index" -> invertedIndex _,
    "q95_chunk_dedup" -> chunkDedup _,
    "q97_bpe_train" -> bpeTrain _,
    "q103_bpe_encode" -> bpeEncode _,
    "q98_source_overlap" -> sourceOverlap _,
    "q99_stream_cms" -> streamCms _)

  /** One unrolled PageRank round for the q90 oracle: the identical
    * integer update as [[graft.ext.GraphOps.weightedPageRank]]
    * ((base·15 + 85·Σ(rank·w // wout)) // 100).
    */
  private def textrankIterCte(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT no.node,
       |    (((SELECT base FROM bb) * 15 + 85 * coalesce(c.sumc, 0)) // 100)::bigint AS rank
       |  FROM nodes no LEFT JOIN (
       |    SELECT e.dst AS node, sum((r.rank * e.w) // wo.wout)::bigint AS sumc
       |    FROM e JOIN $prev r ON r.node = e.src JOIN wout wo ON wo.src = e.src
       |    GROUP BY e.dst) c ON c.node = no.node)""".stripMargin

  /** One unrolled BPE round for the q97 oracle: count wrapped-token
    * pairs, elect (n desc, bg asc), apply the merge with the same
    * left-to-right non-overlapping `replace`.
    */
  private def bpeRoundCtes(r: Int): String =
    s"""p$r AS (
       |  SELECT bg, count(*)::bigint AS n FROM (
       |    SELECT unnest([toks[i] || ' ' || toks[i+1]
       |                   for i in range(1, len(toks))]) AS bg
       |    FROM (SELECT string_split(t, ' ') AS toks FROM t${r - 1}))
       |  GROUP BY 1),
       |b$r AS (SELECT bg, n FROM p$r ORDER BY n DESC, bg ASC LIMIT 1),
       |t$r AS (SELECT doc_id, replace(t, (SELECT bg FROM b$r),
       |          replace((SELECT bg FROM b$r), ' ', chr(1))) AS t
       |        FROM t${r - 1})""".stripMargin

  private def bpeRoundSelect(r: Int): String =
    s"""SELECT $r::bigint AS round,
       |  translate(split_part(bg, ' ', 1), chr(1)||chr(2)||chr(3), '') AS w1,
       |  translate(split_part(bg, ' ', 2), chr(1)||chr(2)||chr(3), '') AS w2,
       |  translate(replace(bg, ' ', ''), chr(1)||chr(2)||chr(3), '') AS merged,
       |  n FROM b$r""".stripMargin


  /** The q68 corpus-build oracle, optionally composed with the q151
    * novelty floor (q153/q154): `noveltyFloor` adds novelty CTEs over
    * the SAME 3-gram `sh` CTE the LSH stage shingles from (q151's
    * exact md5-prefix fingerprints and distinct-count ppm) and one
    * more `gated` predicate — mirroring the Spark side's composition
    * point, BEFORE the quota cap counts the surviving distribution.
    */
  private def corpusBuildSql(noveltyFloor: Option[Long]): String = {
    val novCtes = noveltyFloor.fold("") { f =>
      s"""novex AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::bigint AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
         |novfirsts AS (SELECT h, min(doc_id) AS first_doc FROM novex GROUP BY 1),
         |novkeep AS (
         |  SELECT e.doc_id FROM novex e JOIN novfirsts f ON f.h = e.h
         |  GROUP BY e.doc_id
         |  HAVING (count(DISTINCT CASE WHEN e.doc_id = f.first_doc THEN e.h END)
         |            * 1000000) // count(DISTINCT e.h) >= $f),
         |""".stripMargin
    }
    val novPred = noveltyFloor.fold("")(_ =>
      "\n    AND d.doc_id IN (SELECT doc_id FROM novkeep)")
    s"""WITH RECURSIVE
       |sh AS (
       |  SELECT doc_id, ${TextPack.shinglesSql} AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |${novCtes}sig AS (SELECT doc_id, ${TextPack.sigSql} AS sig FROM sh),
       |bands AS (
       |  SELECT doc_id, b,
       |    b || ':' || array_to_string(sig[b*${TextPack.R}+1:b*${TextPack.R}+${TextPack.R}], ',') AS band_key
       |  FROM sig CROSS JOIN (SELECT unnest(range(${TextPack.Bands})) AS b)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS src, b2.doc_id AS dst
       |  FROM bands a JOIN bands b2
       |    ON a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
       |sym AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       |reach(a, b) AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
       |neardrop AS (
       |  SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) < a),
       |exactkeep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |base AS (
       |  SELECT doc_id, len(toks)::bigint AS n_words,
       |    len(list_distinct(toks))::bigint AS n_distinct_words
       |  FROM t),
       |bgr AS (
       |  SELECT doc_id,
       |    unnest([toks[i] for i in range(1, len(toks))]) AS w1,
       |    unnest([array_to_string(toks[i:i+1], ' ')
       |            for i in range(1, len(toks))]) AS bg
       |  FROM t WHERE len(toks) >= 2),
       |topb AS (
       |  SELECT doc_id, max(n) AS top_n
       |  FROM (SELECT doc_id, bg, count(*)::bigint AS n FROM bgr GROUP BY 1, 2)
       |  GROUP BY 1),
       |repkeep AS (
       |  SELECT base.doc_id FROM base JOIN topb ON topb.doc_id = base.doc_id
       |  WHERE floor($FracScale * (n_words - n_distinct_words) / n_words)::bigint
       |          < $MaxDupWordFp
       |    AND floor($FracScale * 2 * top_n / n_words)::bigint < $MaxTopBigramFp),
       |uni AS (
       |  SELECT w1, count(*)::bigint AS cu
       |  FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
       |bi AS (SELECT bg, count(*)::bigint AS cb FROM bgr GROUP BY 1),
       |lm AS (
       |  SELECT doc_id, count(*)::bigint AS nb,
       |    sum(floor($FracScale * cb / cu))::bigint AS sp
       |  FROM bgr JOIN bi USING (bg) JOIN uni USING (w1) GROUP BY 1),
       |lmkeep AS (SELECT doc_id FROM lm WHERE floor(sp / nb)::bigint >= $LmThresholdFp),
       |sh8 AS (
       |  SELECT doc_id,
       |    unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
       |                          for i in range(1, len(toks) - 6)])) AS s8
       |  FROM t),
       |bench AS (SELECT DISTINCT s8 FROM sh8 WHERE doc_id % 101 = 0),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM sh8 JOIN bench USING (s8)
       |  WHERE doc_id % 101 != 0),
       |gated AS (
       |  SELECT d.doc_id, d.source,
       |    len(d.text) - len(replace(d.text, ' ', '')) + 1 AS n_tokens,
       |    ('0x' || substr(md5('cap:' || d.doc_id), 1, 8))::bigint AS h
       |  FROM documents d
       |  WHERE d.doc_id % 101 != 0
       |    AND d.doc_id IN (SELECT doc_id FROM exactkeep)
       |    AND d.doc_id NOT IN (SELECT doc_id FROM neardrop)
       |    AND d.doc_id IN (SELECT doc_id FROM repkeep)
       |    AND d.doc_id IN (SELECT doc_id FROM lmkeep)
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)$novPred),
       |quotas AS (
       |  SELECT source, count(*)::bigint AS n_source,
       |    floor(sqrt(count(*)))::bigint AS quota
       |  FROM gated GROUP BY 1),
       |ranked AS (
       |  SELECT doc_id, source, n_tokens, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)::bigint
       |      AS cap_rank
       |  FROM gated)
       |SELECT r.doc_id, r.source, r.n_tokens, cap_rank, quota
       |FROM ranked r JOIN quotas q ON q.source = r.source
       |WHERE cap_rank <= q.quota ORDER BY r.doc_id""".stripMargin
  }

  private val baseOracles: Map[String, String] = Map(
    "q98_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |bg AS (
        |  SELECT DISTINCT source,
        |    unnest([toks[i] || ' ' || toks[i+1]
        |            for i in range(1, len(toks))]) AS bg
        |  FROM t),
        |h AS (SELECT DISTINCT source,
        |        ('0x' || substr(md5('kmv:' || bg), 1, 8))::bigint AS h
        |      FROM bg),
        |kept AS (SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |    FROM h) WHERE rn <= 64),
        |p AS (SELECT a.source AS s1, b.source AS s2
        |      FROM (SELECT DISTINCT source FROM bg) a
        |      JOIN (SELECT DISTINCT source FROM bg) b ON a.source < b.source),
        |u AS (SELECT s1, s2, h, count(*)::bigint AS c FROM (
        |        SELECT p.s1, p.s2, k.h FROM p JOIN kept k ON k.source = p.s1
        |        UNION ALL
        |        SELECT p.s1, p.s2, k.h FROM p JOIN kept k ON k.source = p.s2)
        |      GROUP BY 1, 2, 3),
        |ub AS (SELECT s1, s2, h,
        |         CASE WHEN c = 2 THEN 1 ELSE 0 END AS in_both,
        |         row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
        |       FROM u),
        |est AS (SELECT s1, s2, count(*)::bigint AS k_used,
        |          sum(in_both)::bigint AS n_shared
        |        FROM ub WHERE rn <= 64 GROUP BY 1, 2),
        |sz AS (SELECT source, count(*)::bigint AS n FROM bg GROUP BY 1),
        |ix AS (SELECT a.source AS s1, b.source AS s2,
        |         count(*)::bigint AS exact_inter
        |       FROM bg a JOIN bg b ON a.bg = b.bg AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT est.s1, est.s2, est.k_used, est.n_shared,
        |  ((est.n_shared * 1000000) // est.k_used)::bigint AS est_jaccard_ppm,
        |  coalesce(ix.exact_inter, 0)::bigint AS exact_inter,
        |  (z1.n + z2.n - coalesce(ix.exact_inter, 0))::bigint AS exact_union,
        |  ((coalesce(ix.exact_inter, 0) * 1000000)
        |    // (z1.n + z2.n - coalesce(ix.exact_inter, 0)))::bigint
        |    AS exact_jaccard_ppm
        |FROM est
        |JOIN sz z1 ON z1.source = est.s1
        |JOIN sz z2 ON z2.source = est.s2
        |LEFT JOIN ix ON ix.s1 = est.s1 AND ix.s2 = est.s2
        |ORDER BY est.s1, est.s2""".stripMargin,
    "q97_bpe_train" ->
      s"""WITH t0 AS (
         |  SELECT doc_id,
         |    chr(2) || replace(text, ' ', chr(3) || ' ' || chr(2)) || chr(3) AS t
         |  FROM documents),
         |${(1 to BpeRounds).map(bpeRoundCtes).mkString(",\n")}
         |${(1 to BpeRounds).map(bpeRoundSelect).mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin,
    "q103_bpe_encode" ->
      s"""WITH t0 AS (
         |  SELECT doc_id,
         |    chr(2) || replace(text, ' ', chr(3) || ' ' || chr(2)) || chr(3) AS t
         |  FROM documents),
         |${(1 to BpeRounds).map(bpeRoundCtes).mkString(",\n")}
         |SELECT doc_id,
         |  (length(t) - length(replace(t, chr(2), '')))::bigint AS n_words,
         |  len(string_split(t, ' '))::bigint AS n_tokens,
         |  ((length(t) - length(replace(t, chr(2), '')))
         |    - len(string_split(t, ' ')))::bigint AS n_merges,
         |  (((length(t) - length(replace(t, chr(2), '')))
         |     - len(string_split(t, ' '))) * 1000000
         |    // (length(t) - length(replace(t, chr(2), ''))))::bigint
         |    AS merged_ppm
         |FROM t$BpeRounds ORDER BY doc_id""".stripMargin,
    "q95_chunk_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
         |  FROM documents),
         |a AS (
         |  SELECT doc_id, pos, tok,
         |    CASE WHEN ('0x' || substr(md5('cdc:' || tok), 1, 8))::bigint
         |           % $CdcModulus = 0
         |         THEN 1 ELSE 0 END AS is_anchor
         |  FROM t),
         |c AS (
         |  SELECT doc_id, pos, tok,
         |    sum(is_anchor) OVER (PARTITION BY doc_id ORDER BY pos)::bigint
         |      AS chunk_id
         |  FROM a),
         |ch AS (
         |  SELECT doc_id, chunk_id, min(pos)::bigint AS start_pos,
         |    count(*)::bigint AS n_tokens,
         |    md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
         |  FROM c GROUP BY 1, 2)
         |SELECT fp, n_tokens, count(*)::bigint AS n_occurrences,
         |  count(DISTINCT doc_id)::bigint AS n_docs,
         |  min(doc_id)::bigint AS owner_doc
         |FROM ch GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY fp""".stripMargin,
    "q91_inverted_index" ->
      """WITH p AS (
        |  SELECT term, doc_id, count(*)::bigint AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT term, count(*)::bigint AS df, sum(tf)::bigint AS cf
        |  FROM p GROUP BY 1),
        |champ AS (
        |  SELECT term, tf AS top_tf, doc_id AS top_doc_id FROM (
        |    SELECT term, doc_id, tf,
        |      row_number() OVER (PARTITION BY term
        |        ORDER BY tf DESC, doc_id ASC) AS rn
        |    FROM p) WHERE rn = 1)
        |SELECT agg.term, agg.df, agg.cf, champ.top_tf, champ.top_doc_id
        |FROM agg JOIN champ USING (term)
        |ORDER BY agg.term""".stripMargin,
    "q90_textrank_keywords" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |bgd AS (
         |  SELECT unnest([toks[i] for i in range(1, len(toks))]) AS src,
         |         unnest([toks[i+1] for i in range(1, len(toks))]) AS dst
         |  FROM t),
         |ed AS (SELECT src, dst, count(*)::bigint AS w
         |       FROM bgd WHERE src <> dst GROUP BY 1, 2),
         |e AS (SELECT src, dst, sum(w)::bigint AS w FROM (
         |        SELECT src, dst, w FROM ed
         |        UNION ALL
         |        SELECT dst AS src, src AS dst, w FROM ed)
         |      GROUP BY 1, 2),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |bb AS (SELECT (1000000000000 // count(*))::bigint AS base FROM nodes),
         |wout AS (SELECT src, sum(w)::bigint AS wout FROM e GROUP BY 1),
         |r0 AS (SELECT node, (SELECT base FROM bb) AS rank FROM nodes),
         |${textrankIterCte("r0", "r1")},
         |${textrankIterCte("r1", "r2")},
         |${textrankIterCte("r2", "r3")}
         |SELECT node AS token, rank AS rank_scaled FROM r3
         |ORDER BY rank_scaled DESC, token ASC LIMIT $TextRankTopK""".stripMargin,
    "q79_crossmodal_gate" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |base AS (
         |  SELECT doc_id, len(toks)::bigint AS n_words,
         |    len(list_distinct(toks))::bigint AS n_distinct_words
         |  FROM t),
         |bg AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(toks[i:i+1], ' ')
         |            for i in range(1, len(toks))]) AS bg
         |  FROM t WHERE len(toks) >= 2),
         |bgc AS (SELECT doc_id, bg, count(*)::bigint AS n FROM bg GROUP BY 1, 2),
         |top AS (
         |  SELECT doc_id, n AS top_bigram_n
         |  FROM (SELECT doc_id, n,
         |          row_number() OVER (PARTITION BY doc_id
         |            ORDER BY n DESC, bg ASC) AS rk
         |        FROM bgc) WHERE rk = 1),
         |rep AS (
         |  SELECT base.doc_id,
         |    CASE WHEN floor($FracScale * (n_words - n_distinct_words) / n_words)::bigint < $MaxDupWordFp
         |          AND floor($FracScale * 2 * top_bigram_n / n_words)::bigint < $MaxTopBigramFp
         |         THEN 1::bigint ELSE 0::bigint END AS keep_text
         |  FROM base JOIN top ON top.doc_id = base.doc_id),
         |n AS (
         |  SELECT vec_id,
         |    list_sum([ (cast(round(cast(x AS double) * 1000.0) AS bigint)
         |                * cast(round(cast(x AS double) * 1000.0) AS bigint))
         |               for x in embedding ])::bigint AS norm2
         |  FROM embeddings),
         |qs AS (SELECT quantile_disc(norm2, 0.25)::bigint AS q1,
         |              quantile_disc(norm2, 0.75)::bigint AS q3 FROM n),
         |emb AS (
         |  SELECT vec_id AS doc_id,
         |    CASE WHEN 2*norm2 < 5*q1 - 3*q3 OR 2*norm2 > 5*q3 - 3*q1
         |         THEN 0::bigint ELSE 1::bigint END AS keep_emb
         |  FROM n, qs)
         |SELECT rep.doc_id, keep_text, keep_emb,
         |  (keep_text * keep_emb)::bigint AS keep
         |FROM rep JOIN emb ON emb.doc_id = rep.doc_id
         |ORDER BY rep.doc_id""".stripMargin,
    "q78_span_removal" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 41 = 0
         |      THEN '$SpanHead' || ' ' || text || ' ' || '$SpanTail'
         |    WHEN doc_id % 37 = 0 THEN text || ' ' || '$SpanTail'
         |    ELSE text END AS text
         |  FROM documents),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM planted),
         |shing AS (
         |  SELECT doc_id,
         |    unnest(range(1, len(toks) - 6)) - 1 AS pos,
         |    unnest([md5(array_to_string(toks[i:i+7], ' '))
         |            for i in range(1, len(toks) - 6)]) AS sh
         |  FROM toks),
         |own AS (SELECT sh, min(doc_id) AS owner FROM shing
         |        GROUP BY sh HAVING min(doc_id) != max(doc_id)),
         |covered AS (
         |  SELECT DISTINCT s.doc_id, s.pos + d AS ti
         |  FROM shing s JOIN own o ON s.sh = o.sh
         |  CROSS JOIN (SELECT unnest(range(8)) AS d)
         |  WHERE s.doc_id != o.owner),
         |tokrows AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1)) - 1 AS ti,
         |         unnest(toks) AS tok
         |  FROM toks),
         |kept AS (
         |  SELECT t.doc_id, t.ti, t.tok FROM tokrows t
         |  ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.ti = c.ti),
         |rebuilt AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS ntext
         |  FROM kept GROUP BY doc_id),
         |aff AS (SELECT doc_id, count(*)::bigint AS n_tokens_removed
         |        FROM covered GROUP BY doc_id)
         |SELECT a.doc_id, a.n_tokens_removed,
         |  md5(coalesce(r.ntext, '')) AS clean_fp
         |FROM aff a LEFT JOIN rebuilt r ON a.doc_id = r.doc_id
         |ORDER BY a.doc_id""".stripMargin,
    "q75_span_dedup" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 41 = 0
         |      THEN '$SpanHead' || ' ' || text || ' ' || '$SpanTail'
         |    WHEN doc_id % 37 = 0 THEN text || ' ' || '$SpanTail'
         |    ELSE text END AS text
         |  FROM documents),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM planted),
         |shing AS (
         |  SELECT doc_id,
         |    unnest(range(1, len(toks) - 6)) - 1 AS pos,
         |    unnest([md5(array_to_string(toks[i:i+7], ' '))
         |            for i in range(1, len(toks) - 6)]) AS sh
         |  FROM toks),
         |dup AS (SELECT sh FROM shing GROUP BY sh HAVING min(doc_id) != max(doc_id)),
         |hits AS (SELECT doc_id, pos FROM shing JOIN dup USING (sh)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
         |         THEN 0 ELSE 1 END AS brk
         |  FROM hits),
         |grp AS (
         |  SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM isl)
         |SELECT doc_id, min(pos)::bigint AS span_start,
         |  (max(pos) + 7)::bigint AS span_end,
         |  (max(pos) - min(pos) + 8)::bigint AS span_tokens
         |FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin,
    "q70_star_components" ->
      s"""WITH RECURSIVE pdocs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 25 = 0 THEN '$CliqueText' ELSE text END AS text
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, ${TextPack.shinglesSql} AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pdocs)),
         |sig AS (SELECT doc_id, ${TextPack.sigSql} AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*${TextPack.R}+1:b*${TextPack.R}+${TextPack.R}], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range(${TextPack.Bands})) AS b)),
         |lsh AS (
         |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |deep AS (
         |  SELECT a.doc_id AS src, a.doc_id + 10 AS dst
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 10
         |  WHERE a.doc_id % 10 = 7 AND (a.doc_id // 10) % 64 != 63),
         |edges AS (SELECT src, dst FROM lsh UNION SELECT src, dst FROM deep),
         |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
         |reach(a, b) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b)
         |SELECT a AS node, least(a, min(b)) AS comp
         |FROM reach GROUP BY a ORDER BY node""".stripMargin,
    "q69_mixture_draw" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    len(text) - len(replace(text, ' ', '')) + 1 AS n_tokens,
         |    ('0x' || substr(md5('mix:' || doc_id), 1, 8))::bigint AS h
         |  FROM documents),
         |sq AS (
         |  SELECT source, count(*)::bigint AS n_source,
         |    floor(sqrt(count(*)))::bigint AS s
         |  FROM d GROUP BY 1),
         |ts AS (SELECT sum(s)::bigint AS sum_s FROM sq),
         |budgets AS (
         |  SELECT source,
         |    floor($MixBudgetTokens * s / ts.sum_s)::bigint AS budget_tokens
         |  FROM sq CROSS JOIN ts),
         |r AS (
         |  SELECT doc_id, source, n_tokens, h,
         |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)::bigint
         |      AS cum_tokens
         |  FROM d)
         |SELECT doc_id, r.source, n_tokens, cum_tokens, budget_tokens
         |FROM r JOIN budgets ON budgets.source = r.source
         |WHERE cum_tokens <= budget_tokens ORDER BY doc_id""".stripMargin,
    "q68_corpus_build" -> corpusBuildSql(noveltyFloor = None),
    "q153_corpus_build_novelty" ->
      corpusBuildSql(noveltyFloor = Some(NoveltyFloorPpm)),
    "q115_systematic_sample" ->
      s"""WITH c AS (
         |  SELECT doc_id, n_chars,
         |    sum(n_chars) OVER (ORDER BY doc_id) AS cum_w
         |  FROM documents),
         |t AS (SELECT sum(n_chars)::bigint AS w_total FROM documents)
         |SELECT doc_id, n_chars, cum_w::bigint AS cum_w, t.w_total,
         |  ((cum_w * $SysSampleTarget) // t.w_total)::bigint AS stride
         |FROM c, t
         |WHERE (cum_w * $SysSampleTarget) // t.w_total
         |    > ((cum_w - n_chars) * $SysSampleTarget) // t.w_total
         |ORDER BY doc_id""".stripMargin,
    "q133_concentration_curve" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id)::bigint AS rank,
        |    sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum_chars
        |  FROM documents),
        |t AS (SELECT count(*)::bigint AS n_total,
        |        sum(n_chars)::bigint AS total_chars FROM documents)
        |SELECT p.p, r.rank AS n_docs_top, r.cum_chars, t.total_chars,
        |  ((1000000::hugeint * r.cum_chars) // t.total_chars)::bigint AS char_share_ppm
        |FROM (SELECT unnest([1, 10, 50])::bigint AS p) p, t
        |JOIN r ON r.rank = (t.n_total * p.p) // 100
        |ORDER BY p.p""".stripMargin,
    "q130_percentile_ranks" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    floor(1000000.0 * len(list_distinct(string_split(text, ' ')))
        |          / len(string_split(text, ' ')))::bigint AS score_fp
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, score_fp,
        |    row_number() OVER (ORDER BY score_fp, doc_id)::bigint AS rank
        |  FROM s),
        |t AS (SELECT count(*)::bigint AS n_total FROM s)
        |SELECT r.doc_id, r.score_fp, r.rank,
        |  ((1000000 * (r.rank - 1)) // greatest(t.n_total - 1, 1))::bigint AS pct_ppm
        |FROM r, t ORDER BY r.doc_id""".stripMargin,
    "q111_pmi_collocations" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |bgx AS (
         |  SELECT unnest([array_to_string(toks[i:i+1], ' ')
         |                 for i in range(1, len(toks))]) AS bg
         |  FROM t WHERE len(toks) >= 2),
         |uni AS (
         |  SELECT w, count(*)::bigint AS cu
         |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
         |n AS (SELECT sum(cu)::bigint AS n_uni FROM uni),
         |bi AS (
         |  SELECT bg, count(*)::bigint AS cb FROM bgx GROUP BY 1
         |  HAVING count(*) >= $PmiMinCount),
         |s AS (
         |  SELECT bg, string_split(bg, ' ')[1] AS w1,
         |    string_split(bg, ' ')[2] AS w2, cb FROM bi)
         |SELECT s.bg, s.w1, s.w2, s.cb, u1.cu AS cu1, u2.cu AS cu2,
         |  n.n_uni,
         |  (((s.cb - $PmiDiscount)::hugeint * n.n_uni * $PmiScale)
         |    // (u1.cu::hugeint * u2.cu))::bigint AS pmi_fp
         |FROM s JOIN uni u1 ON u1.w = s.w1 JOIN uni u2 ON u2.w = s.w2, n
         |ORDER BY pmi_fp DESC, bg LIMIT $PmiTopK""".stripMargin,
    "q66_bigram_likelihood" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest([toks[i] for i in range(1, len(toks))]) AS w1,
         |    unnest([array_to_string(toks[i:i+1], ' ')
         |            for i in range(1, len(toks))]) AS bg
         |  FROM t WHERE len(toks) >= 2),
         |uni AS (
         |  SELECT w1, count(*)::bigint AS cu
         |  FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
         |bi AS (SELECT bg, count(*)::bigint AS cb FROM bg GROUP BY 1),
         |sc AS (
         |  SELECT doc_id, count(*)::bigint AS n_bigrams,
         |    sum(floor($FracScale * cb / cu))::bigint AS sum_p_fp
         |  FROM bg JOIN bi USING (bg) JOIN uni USING (w1)
         |  GROUP BY 1)
         |SELECT doc_id, n_bigrams, sum_p_fp,
         |  floor(sum_p_fp / n_bigrams)::bigint AS score_fp,
         |  CASE WHEN floor(sum_p_fp / n_bigrams)::bigint >= $LmThresholdFp
         |       THEN 1::bigint ELSE 0::bigint END AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q67_decontaminate" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 101 = 0 OR doc_id % 11 = 0
         |         THEN text || ' $LeakPhrase' ELSE text END AS text
         |  FROM documents),
         |shing AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
         |                          for i in range(1, len(toks) - 6)])) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM planted)),
         |bench AS (SELECT DISTINCT sh FROM shing WHERE doc_id % 101 = 0),
         |cand AS (SELECT doc_id, sh FROM shing WHERE doc_id % 101 != 0)
         |SELECT doc_id, count(*)::bigint AS n_overlapping_shingles
         |FROM cand JOIN bench USING (sh)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q107_bloom_decontaminate" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 101 = 0 OR doc_id % 11 = 0
         |         THEN text || ' $LeakPhrase' ELSE text END AS text
         |  FROM documents),
         |shing AS (
         |  SELECT DISTINCT doc_id,
         |    unnest([array_to_string(toks[i:i+7], ' ')
         |            for i in range(1, len(toks) - 6)]) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM planted)),
         |bench AS (SELECT DISTINCT sh FROM shing WHERE doc_id % 101 = 0),
         |mm AS (
         |  SELECT (1::bigint << coalesce(min(p), $BloomMaxP)) AS m
         |  FROM range($BloomMinP, ${BloomMaxP + 1}) t(p)
         |  WHERE (1::bigint << p) >= $BloomBitsPerKey * (SELECT count(*) FROM bench)),
         |bidx AS (
         |  SELECT ('0x' || substr(md5('bloom' || h || ':' || sh), 1, 8))::bigint
         |           % mm.m AS idx
         |  FROM bench CROSS JOIN (SELECT unnest(range(1, ${BloomK + 1})) AS h)
         |  CROSS JOIN mm),
         |bw AS (SELECT idx // 32 AS w,
         |         bit_or(1::bigint << (idx % 32)::int)::bigint AS bits
         |       FROM bidx GROUP BY 1),
         |p AS (
         |  SELECT s.doc_id, s.sh, h.h,
         |    ('0x' || substr(md5('bloom' || h.h || ':' || s.sh), 1, 8))::bigint
         |      % mm.m AS idx
         |  FROM (SELECT doc_id, sh FROM shing WHERE doc_id % 101 != 0) s
         |  CROSS JOIN (SELECT unnest(range(1, ${BloomK + 1})) AS h) h
         |  CROSS JOIN mm),
         |pass AS (
         |  SELECT p.doc_id, p.sh, count(*)::bigint AS k_set
         |  FROM p JOIN bw ON bw.w = p.idx // 32
         |    AND ((bw.bits >> (p.idx % 32)::int) & 1) = 1
         |  GROUP BY 1, 2 HAVING count(*) = $BloomK)
         |SELECT pass.doc_id,
         |  count(*)::bigint AS n_bloom,
         |  sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)::bigint AS n_exact,
         |  (CASE WHEN sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) = 0
         |        THEN 1 ELSE 0 END)::bigint AS is_fp
         |FROM pass LEFT JOIN bench b ON b.sh = pass.sh
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q65_cms_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |h AS (
        |  SELECT token, i,
        |    ('0x' || substr(md5('cms' || i || ':' || token), 1, 8))::bigint % 256 AS j
        |  FROM tok CROSS JOIN (SELECT unnest(range(4)) AS i)),
        |counters AS (SELECT i, j, count(*)::bigint AS c FROM h GROUP BY 1, 2),
        |top AS (
        |  SELECT token, count(*)::bigint AS freq FROM tok
        |  GROUP BY 1 ORDER BY freq DESC, token LIMIT 20),
        |probes AS (
        |  SELECT t.token, t.freq, i2 AS i,
        |    ('0x' || substr(md5('cms' || i2 || ':' || t.token), 1, 8))::bigint % 256 AS j
        |  FROM top t CROSS JOIN (SELECT unnest(range(4)) AS i2))
        |SELECT p.token, p.freq, min(coalesce(c.c, 0)) AS cms_estimate
        |FROM probes p LEFT JOIN counters c ON c.i = p.i AND c.j = p.j
        |GROUP BY 1, 2 ORDER BY freq DESC, token""".stripMargin,
    "q64_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]'
        |             ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 17 != 0
        |  UNION ALL
        |  SELECT doc_id + (SELECT 1000000 * (1 + max(doc_id) // 1000000)
        |                   FROM documents) AS doc_id,
        |    md5('new:' || text) AS fp
        |  FROM documents WHERE doc_id % 19 = 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.fp IS NULL THEN 'added'
        |       WHEN v2.fp IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
        |WHERE v1.fp IS NULL OR v2.fp IS NULL OR v1.fp != v2.fp
        |ORDER BY doc_id""".stripMargin,
    "q55_dedup_components" ->
      s"""WITH RECURSIVE pdocs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 25 = 0 THEN '$CliqueText' ELSE text END AS text
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, ${TextPack.shinglesSql} AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pdocs)),
         |sig AS (SELECT doc_id, ${TextPack.sigSql} AS sig FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    b || ':' || array_to_string(sig[b*${TextPack.R}+1:b*${TextPack.R}+${TextPack.R}], ',') AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(range(${TextPack.Bands})) AS b)),
         |lsh AS (
         |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
         |  FROM bands a JOIN bands b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |chain AS (
         |  SELECT a.doc_id AS src, a.doc_id + 10 AS dst
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 10
         |  WHERE a.doc_id % 10 = 3 AND a.doc_id % 80 != 73),
         |edges AS (SELECT src, dst FROM lsh UNION SELECT src, dst FROM chain),
         |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
         |reach(a, b) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b)
         |SELECT a AS node, least(a, min(b)) AS comp
         |FROM reach GROUP BY a ORDER BY node""".stripMargin,
    "q56_repetition_filter" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |base AS (
         |  SELECT doc_id, len(toks)::bigint AS n_words,
         |    len(list_distinct(toks))::bigint AS n_distinct_words
         |  FROM t),
         |bg AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(toks[i:i+1], ' ')
         |            for i in range(1, len(toks))]) AS bg
         |  FROM t WHERE len(toks) >= 2),
         |bgc AS (SELECT doc_id, bg, count(*)::bigint AS n FROM bg GROUP BY 1, 2),
         |top AS (
         |  SELECT doc_id, n AS top_bigram_n, bg AS top_bigram
         |  FROM (SELECT doc_id, bg, n,
         |          row_number() OVER (PARTITION BY doc_id
         |            ORDER BY n DESC, bg ASC) AS rk
         |        FROM bgc) WHERE rk = 1)
         |SELECT base.doc_id, n_words, n_distinct_words, top_bigram_n, top_bigram,
         |  floor($FracScale * (n_words - n_distinct_words) / n_words)::bigint
         |    AS dup_word_frac_fp,
         |  floor($FracScale * 2 * top_bigram_n / n_words)::bigint
         |    AS top_bigram_frac_fp,
         |  CASE WHEN floor($FracScale * (n_words - n_distinct_words) / n_words)::bigint < $MaxDupWordFp
         |        AND floor($FracScale * 2 * top_bigram_n / n_words)::bigint < $MaxTopBigramFp
         |       THEN 1::bigint ELSE 0::bigint END AS keep
         |FROM base JOIN top ON top.doc_id = base.doc_id
         |ORDER BY base.doc_id""".stripMargin,
    "q57_bm25_topk" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |post AS (
         |  SELECT term, doc_id, count(*)::bigint AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
         |dfv AS (SELECT term, count(*)::bigint AS df FROM post GROUP BY 1),
         |dl AS (SELECT doc_id, len(toks)::bigint AS dl FROM t),
         |st AS (SELECT count(*)::bigint AS n_docs, sum(dl)::bigint AS sum_dl FROM dl),
         |q AS (
         |  SELECT DISTINCT doc_id AS q_id, term
         |  FROM (SELECT doc_id, unnest([toks[1], toks[3], toks[5]]) AS term
         |        FROM t WHERE doc_id % 100 = 0)),
         |scored AS (
         |  SELECT q.q_id, post.doc_id,
         |    floor(floor($FracScale * (2 * st.n_docs - 2 * dfv.df + 1)
         |                / (2 * dfv.df + 1))
         |          * post.tf * ${K1Fp + 1000L}
         |          / (post.tf * 1000
         |             + floor($K1Fp * (250 + floor($BFp * dl.dl * st.n_docs
         |                                          / st.sum_dl)) / 1000)))::bigint AS s
         |  FROM q JOIN post USING (term) JOIN dfv USING (term)
         |    JOIN dl ON dl.doc_id = post.doc_id CROSS JOIN st),
         |totals AS (
         |  SELECT q_id, doc_id, sum(s)::bigint AS score_fp
         |  FROM scored GROUP BY 1, 2),
         |ranked AS (
         |  SELECT q_id, doc_id, score_fp,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score_fp DESC, doc_id ASC)::bigint AS rank
         |  FROM totals)
         |SELECT q_id, rank, doc_id, score_fp FROM ranked
         |WHERE rank <= $Bm25TopK ORDER BY q_id, rank""".stripMargin,
    "q58_domain_rebalance" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('cap:' || doc_id), 1, 8))::bigint AS h
        |  FROM documents),
        |quotas AS (
        |  SELECT source, count(*)::bigint AS n_source,
        |    floor(sqrt(count(*)))::bigint AS quota
        |  FROM d GROUP BY source),
        |ranked AS (
        |  SELECT doc_id, source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)::bigint
        |      AS cap_rank
        |  FROM d)
        |SELECT doc_id, ranked.source, n_source, quota, h, cap_rank
        |FROM ranked JOIN quotas ON quotas.source = ranked.source
        |WHERE cap_rank <= quota ORDER BY doc_id""".stripMargin,
    "q59_pii_redact" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0
         |         THEN ' contact user' || doc_id || '@mail.example.com now'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |         THEN ' call +1-555-' || lpad((doc_id % 10000)::varchar, 4, '0')
         |              || ' today'
         |         ELSE '' END AS text
         |  FROM documents),
         |red AS (
         |  SELECT doc_id, text,
         |    regexp_replace(regexp_replace(text,
         |      '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g') AS redacted
         |  FROM planted)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$EmailRe'))::bigint AS n_emails,
         |  len(regexp_extract_all(text, '$PhoneRe'))::bigint AS n_phones,
         |  len(redacted)::bigint AS n_chars_redacted,
         |  md5(redacted) AS redacted_fp
         |FROM red ORDER BY doc_id""".stripMargin,
    "q80_corpus_split" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' '))::bigint AS n_tokens,
        |    ('0x' || substr(md5('split:' || doc_id), 1, 8))::bigint AS h
        |  FROM documents),
        |a AS (
        |  SELECT doc_id, source, n_tokens, h,
        |    CASE WHEN h % 100 < 2 THEN 'test'
        |         WHEN h % 100 < 4 THEN 'val'
        |         ELSE 'train' END AS split
        |  FROM d)
        |SELECT split, source, count(*)::bigint AS n_docs,
        |  sum(n_tokens)::bigint AS n_tokens, sum(h)::bigint AS h_sum,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM a GROUP BY 1, 2 ORDER BY split, source""".stripMargin,
    "q81_importance_resample" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
         |           FROM documents),
         |g AS (
         |  SELECT doc_id, lang,
         |    unnest([array_to_string(toks[i:i+1], ' ')
         |            for i in range(1, len(toks))]) AS g
         |  FROM d WHERE len(toks) >= 2),
         |bk AS (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5('dsir:' || g), 1, 8))::bigint % $DsirBuckets AS b
         |  FROM g),
         |raw AS (SELECT b, count(*)::bigint AS cnt_r FROM bk GROUP BY 1),
         |tgt AS (SELECT b, count(*)::bigint AS cnt_t FROM bk
         |        WHERE lang = 'en' GROUP BY 1),
         |w AS (
         |  SELECT raw.b,
         |    floor($DsirScale::double * (coalesce(cnt_t, 0) + 1)::double
         |          / (cnt_r + 1)::double)::bigint AS w
         |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b),
         |s AS (SELECT doc_id, sum(w)::bigint AS score_fp,
         |        count(*)::bigint AS n_bigrams
         |      FROM bk JOIN w ON w.b = bk.b GROUP BY 1)
         |SELECT doc_id, score_fp, n_bigrams FROM s
         |ORDER BY score_fp DESC, doc_id LIMIT $DsirTopK""".stripMargin,
    "q83_quality_deciles" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    floor(1000000.0::double * len(list_distinct(toks))::double
        |          / len(toks)::double)::bigint AS score_fp
        |  FROM t),
        |c AS (SELECT score_fp AS v, count(*)::bigint AS c FROM s GROUP BY 1),
        |o AS (SELECT v, c, sum(c) OVER (ORDER BY v)::bigint AS cum_end FROM c),
        |n AS (SELECT sum(c)::bigint AS n FROM c),
        |r AS (
        |  SELECT p::bigint AS p,
        |    (floor((n.n - 1) * p / 100) + 1)::bigint AS target_rank
        |  FROM (SELECT unnest([10,20,30,40,50,60,70,80,90]) AS p)
        |    CROSS JOIN n),
        |q AS (
        |  SELECT r.p, min(o.v) AS qv FROM r JOIN o
        |    ON o.cum_end >= r.target_rank AND o.cum_end - o.c < r.target_rank
        |  GROUP BY 1),
        |b AS (
        |  SELECT s.doc_id, s.score_fp,
        |    (SELECT count(*) FROM q WHERE q.qv <= s.score_fp)::bigint AS bin
        |  FROM s)
        |SELECT bin, count(*)::bigint AS n_docs,
        |  min(score_fp) AS min_score, max(score_fp) AS max_score
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin)

  /** q72 shares q68's oracle verbatim (streaming reconcile ≡ batch
    * corpus build), and q77 shares q75's (streamed span hits ≡ batch
    * span dedup).
    */
  val oracles: Map[String, String] =
    baseOracles +
      ("q72_stream_reconcile" -> baseOracles("q68_corpus_build")) +
      ("q154_stream_reconcile_novelty" ->
        baseOracles("q153_corpus_build_novelty")) +
      ("q77_stream_spans" -> baseOracles("q75_span_dedup")) +
      ("q99_stream_cms" -> baseOracles("q65_cms_heavy_hitters"))
}
