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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_decode_roundtrip" -> decodeRoundtrip _,
    "q12_token_pipeline" -> tokenPipeline _)

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
        |ORDER BY pair_address, base_token_address""".stripMargin)
}
