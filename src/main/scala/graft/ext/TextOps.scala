package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, fingerprinting, shingling, MinHash,
  * SimHash, and n-gram Jaccard — all as codegen-friendly column
  * expressions (no UDFs), so they scale as narrow map stages; the only
  * shuffles are the final aggregations/joins of each query.
  *
  * Determinism: every hash is derived from md5 hex prefixes so the DuckDB
  * oracle can reproduce values exactly; MinHash/SimHash arithmetic stays
  * in exact int64 ranges (no float accumulation).
  */
object TextOps {

  /** Whitespace tokenization (single-space corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count without materializing the array: len - len(no-spaces) + 1. */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** English-ish stopword count over the token array. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  def stopwordCount(text: Column): Column = {
    val stopArr = array(Stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stopArr, t))).cast("long")
  }

  /** Quality-score heuristics (reference-style length/punct/stopword
    * ratios): exact int counts composed with single IEEE divisions so the
    * oracle reproduces the double bit-for-bit.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val stopRatio = stopwordCount(text).cast("double") / nTok.cast("double")
    val avgWordLen = (length(text) - nTok + 1).cast("double") / nTok.cast("double")
    // Prefer mid-length words and a moderate stopword share.
    least(lit(1.0),
      stopRatio * 2.0 + when(avgWordLen >= 3.0 && avgWordLen <= 8.0, 0.5).otherwise(0.0))
  }

  /** Document fingerprint for exact dedup: the FULL 128-bit md5 digest.
    * A truncated prefix is not a dedup key — a 32-bit prefix hits
    * birthday collisions from ~77k docs, silently merging distinct
    * documents at corpus scale. The 8-hex prefix form exists only for
    * reference `generate_token_id` parity (P6, utils.py:361-371) — use
    * `Functions.generateTokenId` for that, never for dedup.
    */
  def fingerprint(text: Column): Column = md5(text)

  /** Distinct word n-gram shingles: sequence + slice + concat_ws, no UDF. */
  /** DISTINCT shingle set per doc (array_distinct keeps first
    * occurrence, same as the historical HOF formulation). The shingling
    * itself is [[graft.functions.Shingles.WordShinglesExpr]] — one
    * codegen'd per-row expression over zero-copy byte slices; the HOF
    * route (`transform(sequence, slice)`) is interpreted and ~3× slower.
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    array_distinct(shingleArray(text, n))

  /** Shingle OCCURRENCE array (non-distinct), codegen'd and per-row. */
  def shingleArray(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(
      graft.functions.Shingles.WordShinglesExpr(graftbridge.expression(text), n))
  }

  /** 32-bit deterministic string hash from the md5 hex prefix —
    * ≡ `('0x'||substr(md5(s),1,8))::bigint` in DuckDB. One codegen
    * expression over the digest bytes ([[graft.functions.Md5PrefixLong]]);
    * the historical `conv(substring(md5(s),1,8),16,10)` composition
    * allocated and re-parsed a 32-char hex string per row in every text
    * operator's hottest map stage (values bit-identical — FunctionsSpec
    * pins the equivalence, every hash-gated oracle re-proves it).
    */
  def hash32(s: Column): Column = graft.functions.Md5PrefixLong(s, 8)

  /** 60-bit variant for SimHash bit sampling. */
  def hash60(s: Column): Column = graft.functions.Md5PrefixLong(s, 15)

  /** Deterministic stratified sampling for training-data curation
    * (corpus mixing: "p% of each (lang, source), at most `quota` docs
    * per stratum"). No RNG anywhere — membership is a pure function of
    * the data, so the sample is reproducible across runs, engines, and
    * partitionings (the property `df.sample()` cannot give):
    *
    *   1. Bernoulli cut: keep a doc when its salted md5 bucket
    *      (`hash32("sample:"+id) % 100`) falls below `pct` — uniform
    *      regardless of id clustering.
    *   2. Stratum quota: of the survivors, take the `quota`
    *      hash-smallest per stratum (row_number over (hash, id)) — a
    *      uniform fixed-size reservoir per stratum.
    *
    * Scale shape: the rank runs only AFTER the Bernoulli cut and comes
    * from [[PrefixOps.groupedRunningAgg]] (range-partitioned two-pass
    * prefix rank), NOT a per-stratum window — stratum survivors scale
    * WITH the corpus (pct% of the stratum), so a window would hash a
    * dominant stratum's tens of TB onto one task; the prefix shape
    * keeps parallelism at numParts however skewed the strata are. The
    * prefix pass crosses an RDD boundary (no column pruning through
    * it), so it ranks a NARROW (strata, id, h) projection only and the
    * quota-bounded survivors join back to restore the caller's
    * passthrough columns — the wide doc payload (text, media) never
    * enters the range shuffle, and the docs-side scan still prunes to
    * whatever the caller selects (AgreementSpec pins text out of the
    * ReadSchema).
    */
  def stratifiedSample(docs: DataFrame, strata: Seq[String], pct: Int,
      quota: Int, idCol: String = "doc_id"): DataFrame = {
    val h = hash32(concat(lit("sample:"), col(idCol).cast("string")))
    val cut = docs.select((strata.map(col) :+ col(idCol)): _*)
      .withColumn("h", h)
      .filter(col("h") % 100 < pct)
    val survivors = PrefixOps.groupedRunningAgg(cut, strata, Seq("h", idCol),
        rankName = "strat_rank")
      .filter(col("strat_rank") <= quota)
      .select(col(idCol), col("h"), col("strat_rank"))
    // survivors are quota-bounded (<= #strata * quota rows) for any
    // real quota; no broadcast HINT so an unbounded-quota caller still
    // plans a keyed join (AQE broadcasts when the runtime size fits)
    docs.join(survivors, Seq(idCol))
  }

  /** MinHash parameters: k universal-hash functions (a*h+b) mod p with
    * odd multipliers below 2^31 (products stay inside int64).
    */
  val MinhashP: Long = 2147483647L
  /** Content-defined CHUNKING at token granularity — the anchor-point
    * segmentation storage dedup systems run on bytes (LBFS/Gear CDC),
    * lifted to tokens so it is exactly reproducible in SQL: a token
    * whose 32-bit hash ≡ 0 (mod `modulus`) STARTS a new chunk, so
    * chunk boundaries are a pure function of local content — insert a
    * sentence into a document and every chunk outside it keeps its
    * fingerprint, which is what makes chunk-grain dedup robust to
    * edits where fixed-width windows (q34's rolling fingerprints)
    * reshingle the whole tail. Expected chunk length ≈ `modulus`
    * tokens.
    *
    * Returns (idCol, chunk_id, start_pos, n_tokens, fp) — fp = md5 of
    * the space-joined chunk tokens. The only per-doc work is one
    * cumulative-sum window PARTITIONED BY the doc (bounded by doc
    * length, the q75-islands posture) and one ordered fold per chunk
    * (array_sort of the collected (pos, tok) structs — deterministic
    * regardless of collect order).
    */
  def contentChunks(docs: DataFrame, idCol: String, textCol: String,
      modulus: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val anchored = toks.withColumn("is_anchor",
      (hash32(concat(lit("cdc:"), col("tok"))) % modulus === 0).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    anchored.withColumn("chunk_id", sum(col("is_anchor")).over(w))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(min(col("pos")).as("start_pos"),
        count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("fp"))
  }

  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { j =>
      val a = ((j + 1) * 2654435761L % MinhashP) | 1L
      val b = (j * 40503L + 2531011L) % MinhashP
      (a, b)
    }

  /** MinHash signature over a shingle array: array of k min-hash values.
    * Pure expression, no shuffle. Shingles are hashed ONCE (md5 is the
    * expensive part), then each of the k universal hashes is linear
    * arithmetic over the hashed array.
    */
  def minhashSignature(shingles: Column, k: Int = 16): Column =
    minhashFromHashes(transform(shingles, s => hash32(s)), k)

  def minhashFromHashes(hashes: Column, k: Int): Column =
    array(minhashParams(k).map { case (a, b) =>
      array_min(transform(hashes, h => (h * lit(a) + lit(b)) % lit(MinhashP)))
    }: _*)

  /** MinHash as a groupBy aggregation — the 100 TB shape: one hashed
    * shingle row in, k plain `min` aggregates out (codegen'd, map-side
    * partial aggregation; the shuffle carries k longs per doc). Duplicate
    * shingles are harmless — min over a multiset equals min over its set —
    * so no dedup pass is needed. Values are identical to
    * `minhashSignature`.
    */
  def minhashAggFromHashes(df: DataFrame, idCol: String, hashCol: String,
      k: Int): DataFrame = {
    val aggs = minhashParams(k).zipWithIndex.map { case ((a, b), j) =>
      min((col(hashCol) * lit(a) + lit(b)) % lit(MinhashP)).as(s"_m$j")
    }
    df.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"_m$j")): _*).as("sig"))
  }

  def minhashSignatureAgg(df: DataFrame, idCol: String, shingleCol: String,
      k: Int = 16): DataFrame =
    minhashAggFromHashes(
      df.select(col(idCol), explode(col(shingleCol)).as("_s"))
        .select(col(idCol), hash32(col("_s")).as("_h")),
      idCol, "_h", k)

  /** Word n-gram shingle rows, one per occurrence (not distinct) —
    * explode of the codegen'd per-row [[shingleArray]]. The historical
    * posexplode + window `lead` formulation shuffled the tokenized
    * corpus on doc id (a full-data exchange at 100 TB for a per-row
    * computation); this one has NO exchange below the Generate and
    * stays inside the whole-stage span (PlanContractSpec pins both).
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol), explode(shingleArray(col(textCol), n)).as("_s"))

  /** LSH band keys from a MinHash signature: bands of `r` rows, each band
    * keyed by its joined values — join candidates share ≥1 band key.
    */
  def lshBandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      concat_ws(",", (0 until r).map(i => element_at(sig, b * r + i + 1).cast("string")): _*)
    }: _*)

  /** SimHash-64 (60 usable bits) over exploded tokens: returns a
    * (doc-grouped) aggregation plan. Input: df with `idCol` and a token
    * column; output: idCol, simhash bigint.
    */
  def simhash(df: DataFrame, idCol: String, tokenCol: String, bits: Int = 60): DataFrame = {
    // One hash per token row, then `bits` plain sum aggregates (codegen'd,
    // map-side combined) — no per-bit explosion; the shuffle carries
    // `bits` longs per doc.
    val hashed = df.select(col(idCol), hash60(col(tokenCol)).as("_h"))
    val aggs = (0 until bits).map(j =>
      sum(shiftright(col("_h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"_b$j"))
    val sim = (0 until bits).map(j =>
      when(col(s"_b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    hashed.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), sim.as("simhash"))
  }

  /** Hamming distance between two simhash values (for near-dup grading). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard between two shingle-set columns: exact int sizes, one
    * division.
    */
  def jaccard(s1: Column, s2: Column): Column =
    size(array_intersect(s1, s2)).cast("double") /
      size(array_union(s1, s2)).cast("double")

  /** BPE-ish subword tokenization count: a GPT-2-style pre-tokenizer
    * regex (contraction suffixes, space-prefixed letter/digit runs,
    * punctuation runs, whitespace runs) — RE2-safe (no lookaheads), so
    * Java regex and the oracle engine count identically on ASCII corpora.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast("long")

  /** Rabin-Karp rolling-hash document fingerprint: the minimum of the
    * polynomial hashes of every `k`-char window (winnowing-style). The
    * engine computes it in O(n) per document with a true rolling update;
    * the oracle recomputes each window by Horner's rule — identical
    * values, since all arithmetic is exact int64 mod a Mersenne prime.
    * Returns null for documents shorter than `k`.
    */
  val RollB = 257L
  val RollP: Long = (1L << 31) - 1
  def rollingFingerprintJvm(text: String, k: Int = 16): Option[Long] = {
    if (text == null || text.length < k) return None
    var h = 0L
    var i = 0
    while (i < k) { h = (h * RollB + text.charAt(i)) % RollP; i += 1 }
    var minH = h
    // B^(k-1) mod P for the outgoing char
    var bk = 1L
    i = 0
    while (i < k - 1) { bk = bk * RollB % RollP; i += 1 }
    i = k
    while (i < text.length) {
      h = (h - text.charAt(i - k) * bk % RollP + RollP) % RollP
      h = (h * RollB + text.charAt(i)) % RollP
      if (h < minH) minH = h
      i += 1
    }
    Some(minH)
  }

  /** Character-trigram language-ID heuristic: scores text against small
    * per-language trigram profiles, argmax with deterministic tie-break
    * (profile order). A real deployment would broadcast learned profiles;
    * the operator shape (pure expression scoring, no shuffle) is what
    * matters at scale.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", " th", "ing", "ion", " a ", "ed ", " of"),
    "de" -> Seq("der", "ein", "sch", "ich", "und", "en ", "ie ", " de"),
    "fr" -> Seq("les", "ent", "de ", " le", "que", "ion", "eur", " la"),
    "es" -> Seq("de ", " de", "la ", "os ", " la", "ión", "ent", "es "),
    "zh" -> Seq("de ", "shi", "zhe", "ng ", "ian", "ong", "eng", "ang"))

  def languageId(text: Column): Column = {
    val scores = LangProfiles.map { case (lang, grams) =>
      val s = grams.map(g =>
        (length(text) - length(replace(text, lit(g), lit("")))) / g.length).reduce(_ + _)
      (lang, s)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** GPT-style sequence packing: assign every document its starting
    * offset in the global concatenated token stream (ordered by `idCol`),
    * from which the training-shard bin (`offset div budget`) and the
    * position inside that bin follow arithmetically.
    *
    * Scale shape: the textbook formulation — `sum(n) OVER (ORDER BY id)`
    * — collapses to a SINGLE partition in Spark (empty window partition
    * spec ⇒ one task sorts the whole corpus), the exact plan that dies at
    * 100 TB. This operator computes the same prefix sum in two passes
    * over a range-partitioned sort: (1) reduce each partition to ONE
    * `(partitionId, tokenSum)` pair — `numParts` longs on the driver, not
    * data; (2) broadcast the cumulative per-partition offsets back and
    * stream each partition once, adding its base offset to a running
    * local sum. Parallelism stays `numParts` end to end and the only
    * shuffle is the range repartition.
    *
    * Determinism: range-partition boundaries come from sampling and can
    * vary run to run, but any boundary split of a sorted sequence yields
    * identical global prefix sums — output is independent of the split.
    *
    * RDD justification (brief: "RDDs only for genuine per-partition
    * imperative logic"): a running sum that must resume from a
    * per-partition base is exactly that; no Catalyst expression or
    * non-degenerate window can express it.
    */
  def packOffsets(docs: DataFrame, idCol: String, nCol: String,
      numParts: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = docs.sparkSession
    val sorted = graft.Caches.persisted(
      docs.select(col(idCol).cast("long").as("id"), col(nCol).cast("long").as("n"))
        .repartitionByRange(numParts, col("id"))
        .sortWithinPartitions("id"))
    val perPart = sorted.rdd
      .mapPartitionsWithIndex((pid, it) =>
        Iterator((pid, it.foldLeft(0L)(_ + _.getLong(1)))))
      .collect()
      .sortBy(_._1)
    val bases = perPart.map(_._2).scanLeft(0L)(_ + _) // bases(pid) = tokens before pid
    val bBases = spark.sparkContext.broadcast(bases)
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bBases.value(pid)
      it.map { r =>
        val start = running
        running += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), start)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("start_offset", LongType, nullable = false))))
  }
}
