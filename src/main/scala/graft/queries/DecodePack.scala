package graft.queries

import graft.decode.{Decode, TokenExtractor, Wire}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Decode-pipeline queries. The roundtrip query proves the binary wire
  * decoder (D1-D3) end-to-end against a SQL oracle: lineitem rows are
  * serialized into the reference's frame format (6 length-prefixed
  * strings + aligned 8×float64 block, 512-byte chunk layout), decoded by
  * the engine, and must reproduce the source columns exactly — doubles
  * bit-for-bit (IEEE-754 survives the wire), strings byte-for-byte.
  */
object DecodePack {

  final case class Li(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String)

  /** Frames of ≤100 records each, built per input partition — a narrow
    * mapPartitions, no shuffle. Frame membership is irrelevant to the
    * roundtrip: the chunk decoder recovers every record regardless of
    * which frame carries it, and the query's final ORDER BY fixes the
    * output order, so the result is partitioning-independent.
    */
  private[graft] def lineitemFrames(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[Decode.Frame] = {
    import spark.implicits._
    implicit val frameEnc: Encoder[Decode.Frame] = Encoders.product[Decode.Frame]
    graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
      .as[Li]
      // spread the encode across cores (a single parquet split would
      // otherwise serialize the whole harness encode onto one task)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.grouped(100).zipWithIndex.map { case (group, i) =>
          val records = group.map { r =>
            Wire.WireRecord(
              Seq(s"c${r.l_returnflag}${r.l_linestatus}",
                s"dex${r.l_orderkey % 10}",
                s"pairaddr${r.l_orderkey}",
                s"name${r.l_partkey}",
                s"SYM${r.l_suppkey}",
                s"addr${r.l_orderkey}x${r.l_linenumber}"),
              // +1 keeps the volume/fdv metrics away from the wire format's
              // zero-dropping (keys start at 0 in the fixtures)
              Array(r.l_quantity, r.l_extendedprice, r.l_discount, r.l_tax,
                (r.l_partkey + 1).toDouble, (r.l_suppkey + 1).toDouble, 1700000000.0, 0.0))
          }
          Decode.Frame(i.toLong, Wire.encodeFrame(records), 1700000000L)
        }
      }
  }

  /** Wire roundtrip: encode → legacy chunk decode → original columns.
    *
    * Stays on the TYPED decode deliberately: the encode harness is an
    * object-producing mapPartitions, and Catalyst pipelines it into the
    * typed flatMap with no serialization between them — one encoder
    * boundary total, on the SMALL pair rows. The codegen-expression form
    * ([[Decode.pairsLegacyOnlyDF]], q12's path) would first serialize
    * every ~50 KB frame blob into a row just to hand it to the
    * expression — measured 2.0 s (typed) vs 2.4 s (expression) at sf0.1
    * on the same decode kernel. When frames arrive as a COLUMN (the DSv2
    * source, q36) the expression form has no such boundary and is the
    * right one; DecodeSpec pins the two forms row-identical.
    */
  def decodeRoundtrip(spark: SparkSession, dir: String): DataFrame =
    // localCheckpoint before the global sort: a range-partitioned
    // orderBy SAMPLES its child to pick boundaries, re-executing it —
    // here the child is the whole CPU-bound encode+decode chain, so the
    // roundtrip ran twice (r13 profile: the decode jobs appear twice in
    // the job log; ~3.1 s at sf0.1). Materializing the decoded pairs
    // once costs one copy of the SMALL output rows; the sort then
    // samples and sorts materialized data. Same discipline as the PCA
    // scatter: never hand a global sort an expensive child.
    Decode.pairsLegacyOnly(lineitemFrames(spark, dir)).toDF()
      .drop("frame_id")
      .localCheckpoint(eager = true)
      .orderBy(col("pair_address"), col("base_token_address"))

  /** Deep token-extraction pipeline (D8/D10/D13-lite + J1-J3,
    * scraper.py:307-674), hash-gated: one frame per customer row whose
    * expected TokenProfile is closed-form in the row key.
    *
    * The D8 scanners read at stride 1, so the fixture is built from a
    * byte-level analysis of every possible read:
    *   - planted values are float32s with zero low-mantissa bytes and
    *     significands k∈[128,159] (plus one uint32 < 2560 for txns), at
    *     12-byte spacing in a 72-byte block — every misaligned
    *     double/float/uint32 read over the block decodes outside all
    *     classification ranges;
    *   - the chosen exponent bytes {0x3D,0x44,0x47,0x48,0x4A} avoid the
    *     only accidental-double danger exponents (0x3F/0x41/0xBF/0xC1);
    *   - text chars '?','@','A' are the only ASCII bytes whose misaligned
    *     8-byte reads land in a classification range, so the text tail
    *     (symbol, protocol, age, addresses, URLs) excludes them — all six
    *     numeric categories are therefore first-matched by planted values;
    *   - every text read AFTER the planted block is harmless because
    *     first-match-wins has already bound every category.
    * Enrichment (J1-J3) is exercised with known distances: protocol at
    * distance 5 (≤220 gate), age at 13 (≤180 gate), SOL mint → quote,
    * second address → token_address (greedy role order).
    */
  /** The customer key column spread across all cores, RANGE-partitioned:
    * the synthetic frame generators downstream are CPU-bound per ROW,
    * but the customer parquet is a few hundred KB — one split — so
    * without an explicit repartition the whole generate+decode chain
    * runs on ONE task. Shuffling the bare keys costs ~8 bytes/row; the
    * decode then parallelizes N-ways (q12 1.70 → 0.50 s, q25
    * 1.96 → 0.49 s at sf0.1/16 cores).
    *
    * Range (not round-robin) since r13: every consumer's final order is
    * c_custkey-first, so range boundaries sampled on the CHEAP key scan
    * let the queries finish with `sortWithinPartitions` — total order
    * without a post-decode global sort, whose boundary sampling
    * re-executed the whole CPU-bound decode a second time.
    */
  private def customerKeys(spark: SparkSession, dir: String) = {
    import spark.implicits._
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("c_custkey"))
  }

  def tokenPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val frameEnc: Encoder[Decode.Frame] = Encoders.product[Decode.Frame]
    val frames = customerKeys(spark, dir)
      .map(c => Decode.Frame(c, deepFrame(c), 1700000000L))
    Decode.tokens(spark, frames)
      .withColumnRenamed("frame_id", "c_custkey")
      .select(col("c_custkey"), col("symbol"), col("token_name"), col("chain"),
        col("protocol"), col("age"), col("price"), col("volume_24h"),
        col("txns_24h").cast("long").as("txns_24h"),
        col("makers").cast("long").as("makers"),
        col("liquidity"), col("market_cap"), col("confidence_score"),
        col("field_count").cast("long").as("field_count"),
        col("record_position").cast("long").as("record_position"),
        col("quote_address"), col("token_address"), col("pair_address"),
        col("twitter"), col("telegram"), col("website"))
      // keys are range-partitioned upstream (customerKeys), so a
      // within-partition sort yields total order — decode runs ONCE
      .sortWithinPartitions(col("c_custkey"))
  }

  /** 44-char base58 encoding of 32 bytes — no 'A', no age substrings. */
  private val Addr2 = "6X1wMdxXKo8ejGDuKGiZ3fFneVdiepvkJvUrURS9zXpR"

  private[graft] def deepFrame(c: Long): Array[Byte] = {
    val block = java.nio.ByteBuffer.allocate(72)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    block.putInt(0, (1000 + c % 1500).toInt) // txns uint32 ∈ [1000, 2559)
    def pf(off: Int, v: Double): Unit = block.putFloat(off, v.toFloat)
    pf(12, ((128 + c % 32) * 4).toDouble) // makers ∈ [512, 636]
    pf(24, (128 + c % 32) / 2048.0) // price ∈ [0.0625, 0.0776]
    pf(36, ((128 + c % 32) * 1024).toDouble) // volume ∈ [131072, 162816]
    pf(48, ((128 + c % 32) * 256).toDouble) // liquidity ∈ [32768, 40704]
    pf(60, ((128 + c % 32) * 16384).toDouble) // market cap ∈ [2.1M, 2.6M]

    val sym = s"TK${('B' + (c % 25).toInt).toChar}${('B' + ((c / 25) % 25).toInt).toChar}"
    val text = new StringBuilder()
      .append(sym).append(' ') // data offset 72, abs position 100
      .append("pumpfun ") // offset 77, abs 105: distance 5 ≤ 220
      .append("24h ") // offset 85, abs 113: distance 13 ≤ 180
      .append(SolMint).append(' ') // abs 117: nearest address → quote
      .append(Addr2).append(' ') // next address → token_address
      .append("https://x.com/p https://t.me/p https://ex.io/p")
    while (text.length < 428) text.append(' ')
    val t = text.toString
    require(!t.exists(ch => ch == '?' || ch == '@' || ch == 'A'), "unsafe text char")

    Wire.Preamble ++ Wire.PairsMarker ++
      new Array[Byte](Wire.DeepHeaderSkip - Wire.PairsMarker.length) ++
      block.array() ++ t.getBytes("UTF-8")
  }

  /** Cluster-path pipeline (D6-deep + D13/D14 + A5; scraper.py:676-1481),
    * hash-gated: one synthetic frame per customer row, built so the
    * 500-byte cluster window contains EXACTLY the planted IEEE values and
    * nothing else. Every candidate read the scanner can make was checked
    * against the validity ranges:
    *   - planted float32s have mantissa-low-16-bits = 0 and k∈[128,159]
    *     significands, so every overlapping double/float/uint32 read
    *     decodes to NaN/denormal/out-of-range (invalid);
    *   - value bytes can never form two adjacent ASCII uppercase chars,
    *     so no accidental symbol candidates arise from the window;
    *   - text (symbols/addresses/urls) lives in the 200-byte tail after
    *     the single window, inside the ±1000 metadata band but outside
    *     every numeric scan.
    * The expected profile is then closed-form in the row key, so DuckDB
    * reproduces the full output — symbol election, field folds, the A5
    * percentage sequence, completeness, and address/URL role assignment —
    * bit-for-bit.
    */
  def clusterPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val frameEnc: Encoder[Decode.Frame] = Encoders.product[Decode.Frame]
    val frames = customerKeys(spark, dir)
      .map(c => Decode.Frame(c, clusterFrame(c), 1700000000L))
    implicit val enc: Encoder[(Long, graft.model.TokenProfile)] =
      Encoders.product[(Long, graft.model.TokenProfile)]
    frames.flatMap(f => graft.decode.ClusterExtractor
        .extractTokensViaClusters(f.frame, f.extraction_ts)
        .map(t => (f.frame_id, t)))
      .toDF("c_custkey", "token")
      .select(col("c_custkey"), col("token.*"))
      .select(col("c_custkey"), col("symbol"), col("price"), col("volume_24h"),
        col("txns_24h").cast("long").as("txns_24h"),
        col("makers").cast("long").as("makers"),
        col("liquidity"), col("market_cap"),
        col("change_5m"), col("change_1h"), col("change_6h"), col("change_24h"),
        col("quote_address"), col("pair_address"),
        col("twitter"), col("telegram"), col("website"),
        col("record_position").cast("long").as("record_position"),
        col("record_span").cast("long").as("record_span"),
        col("field_count").cast("long").as("field_count"),
        col("confidence_score"))
      // range-partitioned keys upstream: within-partition sort suffices
      .sortWithinPartitions(col("c_custkey"))
  }

  private val SolMint = "So11111111111111111111111111111111111111112"
  private val PairAddr = "DjDzLNonA1XcWpzTBZhNZUqHCvq6SeLfT3otPYdVSMH"
  private val WhitelistSyms = Seq("PEPE", "DOGE", "SHIB", "BONK")

  /** Build one 728-byte frame: preamble + `pairs` + 15 filler bytes (so
    * data starts at marker+20), a 500-byte numeric window (floats with
    * 8-significant-bit values at 12-byte spacing — see clusterPipeline
    * scaladoc for why no accidental scan hit can occur), and a 200-byte
    * text tail carrying a whitelisted symbol (twice → frequency bonus),
    * the SOL mint, a pair address, and one URL per type.
    */
  private[queries] def clusterFrame(c: Long): Array[Byte] = {
    val window = java.nio.ByteBuffer.allocate(500)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def putF(off: Int, v: Double): Unit = window.putFloat(off, v.toFloat)
    putF(0, (128 + c % 32) / 2048.0) // price ∈ [0.0625, 0.0776]
    // txns uint32 ∈ [1000, 2499]: MUST stay < 2560 — a larger value puts
    // a non-zero byte at offset 13, and the stride-2 float read at offset
    // 10 (00 00 <lo> <hi>) then lands just above the 1e-10 validity
    // floor, consuming the position before the uint32 pass reads it
    window.putInt(12, (1000 + c % 1500).toInt)
    if (c % 3 != 0) putF(24, ((128 + c % 32) * 4).toDouble) // makers ∈ [512, 636]
    putF(36, ((128 + c % 25) * 65536).toDouble) // volume ∈ [8.39M, 9.96M]
    putF(48, ((128 + c % 32) * 256).toDouble) // liquidity ∈ [32768, 40704]
    putF(60, ((128 + c % 32) * 131072).toDouble) // market cap ∈ [16.8M, 20.8M]
    putF(72, -((128 + (c + 1) % 32) / 2.0)) // change_5m ∈ [-79.5, -64]
    putF(84, -((128 + (c + 2) % 32) / 2.0)) // change_1h
    putF(96, -((128 + (c + 3) % 32) / 2.0)) // change_6h
    if (c % 5 != 0) putF(108, -((128 + (c + 4) % 32) / 2.0)) // change_24h

    val sym = WhitelistSyms((c % 4).toInt)
    val text = new StringBuilder()
      .append(sym).append(' ').append(sym).append(' ')
      .append(SolMint).append(' ')
    if (c % 7 != 0) text.append(PairAddr).append(' ')
    text.append("https://x.com/p https://t.me/p https://ex.io/p")
    while (text.length < 200) text.append(' ')
    require(text.length == 200, s"text tail ${text.length}B")

    Wire.Preamble ++ Wire.PairsMarker ++
      new Array[Byte](Wire.DeepHeaderSkip - Wire.PairsMarker.length) ++
      window.array() ++ text.toString.getBytes("UTF-8")
  }

  /** Text-mode pair extraction (D4, protocol.py:203-281), hash-gated
    * through the `decodePair` routing (the "solana" marker sends the
    * chunk to the text parser). Exercises: protocol containment match,
    * first/second 32-44-char alnum words → token/pair address, first
    * all-uppercase word → symbol, longest qualifying word → name, and
    * the "sol" stop-list dropping the "solana" word itself.
    */
  def textDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = customerKeys(spark, dir)
      .flatMap { c =>
        val l1 = ('b' + (c % 25).toInt).toChar
        val l2 = ('b' + ((c / 25) % 25).toInt).toChar
        val proto = Seq("pumpswap", "raydium", "meteora", "jupiter", "orca")((c % 5).toInt)
        val addr1 = "tok" + ("%029d".format(c))
        val addr2 = "pr" + ("%030d".format(c))
        val sym = if (c % 7 == 0) "" else s"TK${l1.toUpper}${l2.toUpper}"
        val words = Seq("solana", proto, addr1) ++
          (if (c % 3 == 0) Seq.empty else Seq(addr2)) ++
          (if (sym.isEmpty) Seq.empty else Seq(sym)) ++
          Seq(s"Nm$l1$l2", s"Nmlong$l1$l2")
        graft.decode.LegacyDecoder.decodePair(words.mkString(" ").getBytes("UTF-8"))
          .map(p => (c, p.chain, p.protocol, p.pair_address, p.base_token_name,
            p.base_token_symbol, p.base_token_address))
      }
      .toDF("c_custkey", "chain", "protocol", "pair_address", "base_token_name",
        "base_token_symbol", "base_token_address")
    rows.sortWithinPartitions(col("c_custkey"))
  }

  /** Enhanced sliding-window cluster decode (D6+D7,
    * enhanced_protocol.py:22-264), hash-gated. One 480-byte section per
    * customer row: three planted dyadic doubles (price/volume/count — all
    * mantissa bytes below the top two are zero, so every misaligned
    * stride-4/stride-2 read is denormal or lands in the harmless
    * percentage bucket) form exactly one cluster in window 0; the text
    * tail at offset 128+ (outside every qualifying window — text bytes
    * can't form a price+volume+count triple without '?'/'@'/'A', which
    * are excluded) feeds the cluster's ±(200/300) text mining. Verifies
    * the window gate, first-value-per-category folds, the
    * volumes-shadow-liquidity elif quirk (liquidity_usd is always null),
    * and chain/protocol/symbol/name word classification.
    */
  def enhancedClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = customerKeys(spark, dir)
      .flatMap { c =>
        graft.decode.EnhancedDecoder.parseMessage(enhancedFrame(c), 1700000000L)
          .map(p => (c, p.chain, p.protocol, p.base_token_name, p.base_token_symbol,
            p.price_data.flatMap(_.current), p.price_data.flatMap(_.usd),
            p.price_data.flatMap(_.change_24h),
            p.volume_data.flatMap(_.h24),
            p.liquidity_data.flatMap(_.usd),
            p.created_at))
      }
      .toDF("c_custkey", "chain", "protocol", "base_token_name", "base_token_symbol",
        "price", "price_usd", "change_24h", "volume_h24", "liquidity_usd", "created_at")
    rows.sortWithinPartitions(col("c_custkey"))
  }

  private[queries] def enhancedFrame(c: Long): Array[Byte] = {
    val section = java.nio.ByteBuffer.allocate(480)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // Significands 128 + 4·(c%8): the ×4 step keeps mantissa byte 5
    // (((k-128)&7)<<5) out of {0x40 '@', 0x60 '`'}, so the numeric region
    // can never emit a ≥3-char printable word that would win the
    // first-match name mining over the real text tail.
    section.putDouble(0, (128 + (c % 8) * 4) / 262144.0) // price ∈ [0.000488, 0.000595]
    section.putDouble(16, ((128 + (c % 8) * 4) * 64).toDouble) // volume ∈ [8192, 9984]
    section.putDouble(32, (10 + c % 30).toDouble) // count ∈ [10, 39]
    val l1 = ('B' + (c % 25).toInt).toChar
    val l2 = ('B' + ((c / 25) % 25).toInt).toChar
    val chain = Seq("solana", "ethereum", "base")((c % 3).toInt)
    val proto = Seq("orca", "raydium", "meteora", "pumpswap")((c % 4).toInt)
    val text = new StringBuilder()
      .append(s"Nm$l1$l2 ").append(chain).append(' ').append(proto)
      .append(s" TK$l1$l2")
    while (text.length < 352) text.append(' ')
    val t = text.toString
    require(!t.exists(ch => ch == '?' || ch == '@' || ch == 'A'), "unsafe text char")
    section.position(128)
    section.put(t.getBytes("UTF-8"))
    Wire.Preamble ++ Wire.PairsMarker ++
      new Array[Byte](Wire.EnhancedHeaderSkip - Wire.PairsMarker.length) ++
      section.array()
  }

  /** Variable-length split parse (D5, protocol.py:284-359), hash-gated:
    * two "solana"-separated sections per frame. Exercises the per-section
    * word classification — protocol containment (no "orca" in this
    * family), token/pair address fill order, the LAST-wins symbol
    * assignment (unlike D4's first-wins), and longest-wins name with no
    * stop-list — plus the ≥10-char section and ≥3-char word gates.
    */
  def variableLength(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = customerKeys(spark, dir)
      .flatMap { c =>
        val l1 = ('b' + (c % 25).toInt).toChar
        val l2 = ('b' + ((c / 25) % 25).toInt).toChar
        val proto = Seq("pump", "raydium", "meteora", "jupiter")((c % 4).toInt)
        val addr1 = "tok" + ("%029d".format(c))
        val text = s"solana $proto $addr1 Nm$l1$l2 Nmlong$l1$l2 TK${l1.toUpper} ZZ${l2.toUpper} " +
          s"solana short${l1}" // 2nd section: <10 chars stripped? no — gate on words
        graft.decode.LegacyDecoder.parseVariableLength(text.getBytes("UTF-8"))
          .zipWithIndex.map { case (p, i) =>
            (c, i, p.chain, p.protocol, p.pair_address, p.base_token_name,
              p.base_token_symbol, p.base_token_address)
          }
      }
      .toDF("c_custkey", "section", "chain", "protocol", "pair_address",
        "base_token_name", "base_token_symbol", "base_token_address")
      .withColumn("section", col("section").cast("long"))
    rows.sortWithinPartitions(col("c_custkey"), col("section"))
  }

  /** A2 market-stats panel (cli.py:458-471) + A1/F4 batch counters over
    * the deep-pipeline tokens — the exact-decimal aggregate formulation
    * ([[graft.Tables.exactSum]]) so the float sums are bit-reproducible
    * in the oracle.
    */
  def marketStats(spark: SparkSession, dir: String): DataFrame = {
    val tokens = tokenPipeline(spark, dir)
    tokens.agg(
      graft.Tables.exactSum(col("volume_24h"), 1).as("total_volume"),
      graft.Tables.exactAvg(col("confidence_score"), 2).as("avg_confidence"),
      count(lit(1)).as("n_tokens"),
      count_if(col("confidence_score") >= 0.7).as("high_confidence_count"),
      count_if(graft.operators.Tokens.isComplete()).as("complete_profiles_count"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_decode_roundtrip" -> decodeRoundtrip _,
    "q12_token_pipeline" -> tokenPipeline _,
    "q25_cluster_pipeline" -> clusterPipeline _,
    "q26_text_decode" -> textDecode _,
    "q27_enhanced_clusters" -> enhancedClusters _,
    "q28_variable_length" -> variableLength _,
    "q42_market_stats" -> marketStats _)

  val oracles: Map[String, String] = Map(
    "q42_market_stats" ->
      s"""SELECT
         |  ${graft.Tables.sqlExactSum("(128 + c_custkey % 32) * 1024.0", 1)} AS total_volume,
         |  ${graft.Tables.sqlExactAvg("0.95", 2)} AS avg_confidence,
         |  count(*) AS n_tokens,
         |  count(*) AS high_confidence_count,
         |  count(*) AS complete_profiles_count
         |FROM customer""".stripMargin,
    "q11_decode_roundtrip" ->
      """SELECT 'c' || l_returnflag || l_linestatus AS chain,
        |  'dex' || (l_orderkey % 10) AS protocol,
        |  'pairaddr' || l_orderkey AS pair_address,
        |  'name' || l_partkey AS base_token_name,
        |  'SYM' || l_suppkey AS base_token_symbol,
        |  'addr' || l_orderkey || 'x' || l_linenumber AS base_token_address,
        |  l_quantity AS price,
        |  l_extendedprice AS price_usd,
        |  nullif(l_discount, 0.0) AS change_24h,
        |  nullif(l_tax, 0.0) AS liquidity_usd,
        |  cast(l_partkey + 1 AS double) AS volume_h24,
        |  cast(l_suppkey + 1 AS double) AS fdv,
        |  cast(1700000000 AS bigint) AS created_at
        |FROM lineitem
        |ORDER BY pair_address, base_token_address""".stripMargin,
    "q12_token_pipeline" ->
      s"""SELECT c_custkey,
         |  'TK' || chr(cast(66 + c_custkey % 25 AS int)) || chr(cast(66 + (c_custkey // 25) % 25 AS int)) AS symbol,
         |  'TK' || chr(cast(66 + c_custkey % 25 AS int)) || chr(cast(66 + (c_custkey // 25) % 25 AS int)) AS token_name,
         |  'solana' AS chain,
         |  'pumpfun' AS protocol,
         |  '24h' AS age,
         |  (128 + c_custkey % 32) / 2048.0 AS price,
         |  (128 + c_custkey % 32) * 1024.0 AS volume_24h,
         |  cast(1000 + c_custkey % 1500 AS bigint) AS txns_24h,
         |  cast((128 + c_custkey % 32) * 4 AS bigint) AS makers,
         |  (128 + c_custkey % 32) * 256.0 AS liquidity,
         |  (128 + c_custkey % 32) * 16384.0 AS market_cap,
         |  0.95 AS confidence_score,
         |  cast(6 AS bigint) AS field_count,
         |  cast(100 AS bigint) AS record_position,
         |  '$SolMint' AS quote_address,
         |  '$Addr2' AS token_address,
         |  cast(NULL AS varchar) AS pair_address,
         |  'https://x.com/p' AS twitter,
         |  'https://t.me/p' AS telegram,
         |  'https://ex.io/p' AS website
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "q25_cluster_pipeline" ->
      s"""SELECT c_custkey,
         |  CASE c_custkey % 4 WHEN 0 THEN 'PEPE' WHEN 1 THEN 'DOGE'
         |    WHEN 2 THEN 'SHIB' ELSE 'BONK' END AS symbol,
         |  (128 + c_custkey % 32) / 2048.0 AS price,
         |  (128 + c_custkey % 25) * 65536.0 AS volume_24h,
         |  cast(1000 + c_custkey % 1500 AS bigint) AS txns_24h,
         |  CASE WHEN c_custkey % 3 <> 0
         |    THEN cast((128 + c_custkey % 32) * 4 AS bigint) END AS makers,
         |  (128 + c_custkey % 32) * 256.0 AS liquidity,
         |  (128 + c_custkey % 32) * 131072.0 AS market_cap,
         |  -((128 + (c_custkey + 1) % 32) / 2.0) AS change_5m,
         |  -((128 + (c_custkey + 2) % 32) / 2.0) AS change_1h,
         |  -((128 + (c_custkey + 3) % 32) / 2.0) AS change_6h,
         |  CASE WHEN c_custkey % 5 <> 0
         |    THEN -((128 + (c_custkey + 4) % 32) / 2.0) END AS change_24h,
         |  '$SolMint' AS quote_address,
         |  CASE WHEN c_custkey % 7 <> 0 THEN '$PairAddr' END AS pair_address,
         |  'https://x.com/p' AS twitter,
         |  'https://t.me/p' AS telegram,
         |  'https://ex.io/p' AS website,
         |  cast(28 AS bigint) AS record_position,
         |  cast(500 AS bigint) AS record_span,
         |  cast(6 + CASE WHEN c_custkey % 3 <> 0 THEN 1 ELSE 0 END
         |         + CASE WHEN c_custkey % 7 <> 0 THEN 1 ELSE 0 END AS bigint) AS field_count,
         |  0.8 AS confidence_score
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "q26_text_decode" ->
      """SELECT c_custkey,
        |  'solana' AS chain,
        |  CASE c_custkey % 5 WHEN 0 THEN 'pumpswap' WHEN 1 THEN 'raydium'
        |    WHEN 2 THEN 'meteora' WHEN 3 THEN 'jupiter' ELSE 'orca' END AS protocol,
        |  CASE WHEN c_custkey % 3 = 0 THEN ''
        |    ELSE 'pr' || lpad(cast(c_custkey AS varchar), 30, '0') END AS pair_address,
        |  'Nmlong' || chr(cast(98 + c_custkey % 25 AS int))
        |    || chr(cast(98 + (c_custkey // 25) % 25 AS int)) AS base_token_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN ''
        |    ELSE 'TK' || chr(cast(66 + c_custkey % 25 AS int))
        |      || chr(cast(66 + (c_custkey // 25) % 25 AS int)) END AS base_token_symbol,
        |  'tok' || lpad(cast(c_custkey AS varchar), 29, '0') AS base_token_address
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q27_enhanced_clusters" ->
      """SELECT c_custkey,
        |  CASE c_custkey % 3 WHEN 0 THEN 'solana' WHEN 1 THEN 'ethereum'
        |    ELSE 'base' END AS chain,
        |  CASE c_custkey % 4 WHEN 0 THEN 'orca' WHEN 1 THEN 'raydium'
        |    WHEN 2 THEN 'meteora' ELSE 'pumpswap' END AS protocol,
        |  'Nm' || chr(cast(66 + c_custkey % 25 AS int))
        |    || chr(cast(66 + (c_custkey // 25) % 25 AS int)) AS base_token_name,
        |  'TK' || chr(cast(66 + c_custkey % 25 AS int))
        |    || chr(cast(66 + (c_custkey // 25) % 25 AS int)) AS base_token_symbol,
        |  (128 + (c_custkey % 8) * 4) / 262144.0 AS price,
        |  (128 + (c_custkey % 8) * 4) / 262144.0 AS price_usd,
        |  cast(0.0 AS double) AS change_24h,
        |  (128 + (c_custkey % 8) * 4) * 64.0 AS volume_h24,
        |  cast(NULL AS double) AS liquidity_usd,
        |  cast(1700000000 AS bigint) AS created_at
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q28_variable_length" ->
      """SELECT c_custkey,
        |  cast(0 AS bigint) AS section,
        |  'solana' AS chain,
        |  CASE c_custkey % 4 WHEN 0 THEN 'pump' WHEN 1 THEN 'raydium'
        |    WHEN 2 THEN 'meteora' ELSE 'jupiter' END AS protocol,
        |  '' AS pair_address,
        |  'Nmlong' || chr(cast(98 + c_custkey % 25 AS int))
        |    || chr(cast(98 + (c_custkey // 25) % 25 AS int)) AS base_token_name,
        |  'ZZ' || chr(cast(66 + (c_custkey // 25) % 25 AS int)) AS base_token_symbol,
        |  'tok' || lpad(cast(c_custkey AS varchar), 29, '0') AS base_token_address
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
