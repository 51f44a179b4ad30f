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

  /** Frames of ≤100 records each, bucketed by orderkey (deterministic
    * grouping + deterministic in-frame order).
    */
  private def lineitemFrames(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[Decode.Frame] = {
    import spark.implicits._
    implicit val frameEnc: Encoder[Decode.Frame] = Encoders.product[Decode.Frame]
    graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
      .as[Li]
      .groupByKey(r => r.l_orderkey / 100)
      .mapGroups { (bucket, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r.l_orderkey, r.l_linenumber))
        val records = sorted.map { r =>
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
        Decode.Frame(bucket, Wire.encodeFrame(records), 1700000000L)
      }
  }

  /** Wire roundtrip: encode → legacy chunk decode → original columns. */
  def decodeRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Decode.pairsLegacyOnly(lineitemFrames(spark, dir))
      .drop("frame_id")
      .orderBy(col("pair_address"), col("base_token_address"))

  /** Deep token-extraction pipeline smoke (D8-D14 + J1-J3): synthetic
    * text frames mined for symbols/metadata. Not SQL-expressible (regex
    * mining + positional enrichment) → rows-only check; exact semantics
    * are covered by unit goldens in DecodeSpec.
    */
  def tokenPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val frameEnc: Encoder[Decode.Frame] = Encoders.product[Decode.Frame]
    val frames = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .as[(Long, String, Double)]
      .groupByKey(_._1 / 50)
      .mapGroups { (bucket, rows) =>
        val sorted = rows.toSeq.sortBy(_._1)
        // numeric record block up front so the first occurrence of each
        // symbol sits within the ±500-byte record window: a price, a
        // volume, and a makers-range value → ≥3 fields.
        val nums = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        nums.putDouble(0.004).putDouble(250000.0).putDouble(500.0)
        val sb = new StringBuilder
        sorted.foreach { case (key, _, _) =>
          val letter = ('A' + (key % 5).toInt).toChar
          sb.append(s"$$TOK$letter pumpfun 24h ")
          sb.append("So11111111111111111111111111111111111111112 ")
        }
        val text = sb.toString.getBytes("UTF-8")
        val frame = Wire.Preamble ++ Wire.PairsMarker ++
          new Array[Byte](Wire.DeepHeaderSkip - Wire.PairsMarker.length) ++
          nums.array() ++ text
        Decode.Frame(bucket, frame, 1700000000L)
      }
    Decode.tokens(spark, frames)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"), max(col("confidence_score")).as("max_conf"))
      .orderBy(col("symbol"))
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
    val frames = graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
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
      .orderBy(col("c_custkey"))
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
    window.putInt(12, (1000 + c % 11000).toInt) // txns uint32 ∈ [1000, 11999]
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_decode_roundtrip" -> decodeRoundtrip _,
    "q12_token_pipeline" -> tokenPipeline _,
    "q25_cluster_pipeline" -> clusterPipeline _)

  val oracles: Map[String, String] = Map(
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
    "q25_cluster_pipeline" ->
      s"""SELECT c_custkey,
         |  CASE c_custkey % 4 WHEN 0 THEN 'PEPE' WHEN 1 THEN 'DOGE'
         |    WHEN 2 THEN 'SHIB' ELSE 'BONK' END AS symbol,
         |  (128 + c_custkey % 32) / 2048.0 AS price,
         |  (128 + c_custkey % 25) * 65536.0 AS volume_24h,
         |  cast(1000 + c_custkey % 11000 AS bigint) AS txns_24h,
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
         |FROM customer ORDER BY c_custkey""".stripMargin)
}
