package graft.decode

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-level decode API: binary frames in, typed rows out.
  *
  * Scale shape: one input row = one WebSocket frame (~100 KB bounded);
  * decode is a narrow `flatMap` — no shuffle, no driver involvement,
  * embarrassingly parallel across frames. At 100 TB the only knobs that
  * matter are input split sizing (`spark.sql.files.maxPartitionBytes`)
  * and that per-frame output is bounded by the reference's own caps
  * (≤50 pairs / ≤20 tokens per frame).
  */
object Decode {

  final case class Frame(frame_id: Long, frame: Array[Byte], extraction_ts: Long)
  final case class PairRow(
      frame_id: Long, chain: String, protocol: String, pair_address: String,
      base_token_name: String, base_token_symbol: String, base_token_address: String,
      price: Option[Double], price_usd: Option[Double], change_24h: Option[Double],
      liquidity_usd: Option[Double], volume_h24: Option[Double], fdv: Option[Double],
      created_at: Option[Long])
  final case class TokenRow(frame_id: Long, token: TokenProfile)

  implicit private val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit private val pairEnc: Encoder[PairRow] = Encoders.product[PairRow]

  private def toPairRow(frameId: Long, p: TradingPair): PairRow = PairRow(
    frameId, p.chain, p.protocol, p.pair_address, p.base_token_name,
    p.base_token_symbol, p.base_token_address,
    p.price_data.flatMap(_.current), p.price_data.flatMap(_.usd),
    p.price_data.flatMap(_.change_24h), p.liquidity_data.flatMap(_.usd),
    p.volume_data.flatMap(_.h24), p.fdv, p.created_at)

  /** Full parse cascade (enhanced → legacy chunks → variable-length). */
  def pairs(frames: Dataset[Frame]): Dataset[PairRow] =
    frames.flatMap(f => LegacyDecoder.parseMessage(f.frame).map(toPairRow(f.frame_id, _)))

  /** Legacy chunk-scan only (D1-D3) — deterministic wire-format decode,
    * used by the oracle-checked roundtrip. Typed reference form; the
    * benched pipeline uses [[pairsLegacyOnlyDF]] (same per-frame body,
    * promoted to a codegen expression — DecodeSpec pins equivalence).
    */
  def pairsLegacyOnly(frames: Dataset[Frame]): Dataset[PairRow] =
    frames.flatMap { f =>
      val pairsStart = Wire.indexOf(f.frame, Wire.PairsMarker)
      if (pairsStart < 0 || f.frame.length < Wire.Preamble.length ||
        !f.frame.take(Wire.Preamble.length).sameElements(Wire.Preamble)) Iterator.empty
      else {
        val pos = pairsStart + Wire.LegacyHeaderSkip
        Iterator.range(pos, math.max(pos, f.frame.length - 512), 512).flatMap { p =>
          LegacyDecoder.decodePairSlice(f.frame, p, p + 512)
            .map(toPairRow(f.frame_id, _))
        }
      }
    }

  /** Columnar form of [[pairsLegacyOnly]]: the frame column decodes
    * inside whole-stage codegen via
    * [[graft.functions.DecodePairs.decodeLegacyChunks]] — no
    * object-encoder round trip around the decode.
    */
  def pairsLegacyOnlyDF(frames: Dataset[Frame]): DataFrame =
    frames.toDF()
      .select(col("frame_id"),
        explode(graft.functions.DecodePairs.decodeLegacyChunks(col("frame"))).as("p"))
      .select(col("frame_id"), col("p.*"))

  /** Deep token-extraction path (EP1): one row per TokenProfile, flattened
    * with its frame id. Decodes inside whole-stage codegen via
    * [[graft.functions.DecodePairs.decodeTokens]] (DecodeSpec pins
    * equivalence with the typed flatMap form).
    */
  def tokens(spark: SparkSession, frames: Dataset[Frame]): DataFrame =
    frames.toDF()
      .select(col("frame_id"),
        explode(graft.functions.DecodePairs.decodeTokens(
          col("frame"), col("extraction_ts"))).as("token"))
      .select(col("frame_id"), col("token.*"))
}
