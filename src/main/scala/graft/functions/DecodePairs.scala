package graft.functions

import graft.decode.{LegacyDecoder, TokenExtractor, Wire}
import graft.model.{TokenProfile, TradingPair}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-frame decode as codegen'd Catalyst expressions — SURVEY §2.12's
  * "promote to an Expression if needed" escape hatch, exercised.
  *
  * The typed-Dataset form (`Dataset[Frame].flatMap(...)`) pays two
  * encoder boundaries per frame on the hot path: DeserializeToObject on
  * the frame row, then SerializeFromObject on every emitted pair/token
  * row — and the object boundary splits whole-stage codegen around the
  * decode. These expressions take the `frame` binary column directly
  * from Tungsten row memory and emit the output rows as InternalRows
  * inside the generated plan, so the scan → decode → project → sort
  * pipeline stays one codegen span with no Scala-object round trip.
  * The byte-level decode logic is NOT duplicated: both expressions call
  * the same [[LegacyDecoder]]/[[TokenExtractor]] routines the typed API
  * and the specs pin (reference: dexscraper/protocol.py:42-428,
  * scraper.py:307-674).
  */
object DecodePairs {

  /** Output element schema — matches `Decode.PairRow` minus frame_id. */
  val pairStruct: StructType = StructType(Seq(
    StructField("chain", StringType, nullable = true),
    StructField("protocol", StringType, nullable = true),
    StructField("pair_address", StringType, nullable = true),
    StructField("base_token_name", StringType, nullable = true),
    StructField("base_token_symbol", StringType, nullable = true),
    StructField("base_token_address", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("price_usd", DoubleType, nullable = true),
    StructField("change_24h", DoubleType, nullable = true),
    StructField("liquidity_usd", DoubleType, nullable = true),
    StructField("volume_h24", DoubleType, nullable = true),
    StructField("fdv", DoubleType, nullable = true),
    StructField("created_at", LongType, nullable = true)))

  private def utf8(s: String): AnyRef =
    if (s == null) null else UTF8String.fromString(s)
  private def boxD(o: Option[Double]): AnyRef =
    o.map(java.lang.Double.valueOf).orNull
  private def boxL(o: Option[Long]): AnyRef =
    o.map(java.lang.Long.valueOf).orNull
  private def boxI(o: Option[Int]): AnyRef =
    o.map(i => java.lang.Long.valueOf(i.toLong)).orNull

  private def pairRow(p: TradingPair): InternalRow =
    new GenericInternalRow(Array[Any](
      utf8(p.chain), utf8(p.protocol), utf8(p.pair_address),
      utf8(p.base_token_name), utf8(p.base_token_symbol),
      utf8(p.base_token_address),
      boxD(p.price_data.flatMap(_.current)), boxD(p.price_data.flatMap(_.usd)),
      boxD(p.price_data.flatMap(_.change_24h)),
      boxD(p.liquidity_data.flatMap(_.usd)), boxD(p.volume_data.flatMap(_.h24)),
      boxD(p.fdv), boxL(p.created_at)))

  /** The legacy 512-stride chunk scan over one frame
    * (`Decode.pairsLegacyOnly`'s per-frame body), emitted as rows.
    */
  def legacyChunks(frame: Array[Byte]): ArrayData = {
    if (frame == null) return new GenericArrayData(Array.empty[Any])
    val pairsStart = Wire.indexOf(frame, Wire.PairsMarker)
    if (pairsStart < 0 || frame.length < Wire.Preamble.length)
      return new GenericArrayData(Array.empty[Any])
    var i = 0
    while (i < Wire.Preamble.length) {
      if (frame(i) != Wire.Preamble(i)) return new GenericArrayData(Array.empty[Any])
      i += 1
    }
    val pos = pairsStart + Wire.LegacyHeaderSkip
    val out = Seq.newBuilder[Any]
    var p = pos
    val end = math.max(pos, frame.length - 512)
    while (p < end) {
      LegacyDecoder.decodePairSlice(frame, p, p + 512).foreach(out += pairRow(_))
      p += 512
    }
    new GenericArrayData(out.result().toArray)
  }

  /** `array<struct>` of the legacy chunk decode of a binary frame column. */
  case class DecodeLegacyChunks(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(pairStruct, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      legacyChunks(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.DecodePairs.legacyChunks($c)")
    override protected def withNewChildInternal(newChild: Expression): DecodeLegacyChunks =
      copy(child = newChild)
  }

  def decodeLegacyChunks(frame: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(DecodeLegacyChunks(graftbridge.expression(frame)))
  }

  /** Output element schema of the deep token extraction — matches the
    * flattened [[TokenProfile]] column order the typed path produces
    * (ints surfaced as int, as `Encoders.product` does).
    */
  val tokenStruct: StructType = StructType(Seq(
    StructField("price", DoubleType, nullable = true),
    StructField("volume_24h", DoubleType, nullable = true),
    StructField("txns_24h", IntegerType, nullable = true),
    StructField("makers", IntegerType, nullable = true),
    StructField("liquidity", DoubleType, nullable = true),
    StructField("market_cap", DoubleType, nullable = true),
    StructField("symbol", StringType, nullable = true),
    StructField("token_name", StringType, nullable = true),
    StructField("chain", StringType, nullable = true),
    StructField("protocol", StringType, nullable = true),
    StructField("age", StringType, nullable = true),
    StructField("boost", IntegerType, nullable = true),
    StructField("pair_address", StringType, nullable = true),
    StructField("creator_address", StringType, nullable = true),
    StructField("token_address", StringType, nullable = true),
    StructField("quote_address", StringType, nullable = true),
    StructField("website", StringType, nullable = true),
    StructField("twitter", StringType, nullable = true),
    StructField("telegram", StringType, nullable = true),
    StructField("change_5m", DoubleType, nullable = true),
    StructField("change_1h", DoubleType, nullable = true),
    StructField("change_6h", DoubleType, nullable = true),
    StructField("change_24h", DoubleType, nullable = true),
    // nullable like the typed form's `token.*` flatten (struct access
    // makes even the non-Option fields nullable) so the two paths'
    // schemas are indistinguishable downstream
    StructField("confidence_score", DoubleType, nullable = true),
    StructField("field_count", IntegerType, nullable = true),
    StructField("record_position", IntegerType, nullable = true),
    StructField("record_span", IntegerType, nullable = true),
    StructField("timestamp", LongType, nullable = true)))

  private def boxInt(o: Option[Int]): AnyRef =
    o.map(java.lang.Integer.valueOf).orNull
  private def utf8o(o: Option[String]): AnyRef = o.map(utf8).orNull

  private def tokenRow(t: TokenProfile): InternalRow =
    new GenericInternalRow(Array[Any](
      boxD(t.price), boxD(t.volume_24h), boxInt(t.txns_24h), boxInt(t.makers),
      boxD(t.liquidity), boxD(t.market_cap),
      utf8o(t.symbol), utf8o(t.token_name), utf8o(t.chain), utf8o(t.protocol),
      utf8o(t.age), boxInt(t.boost),
      utf8o(t.pair_address), utf8o(t.creator_address), utf8o(t.token_address),
      utf8o(t.quote_address),
      utf8o(t.website), utf8o(t.twitter), utf8o(t.telegram),
      boxD(t.change_5m), boxD(t.change_1h), boxD(t.change_6h), boxD(t.change_24h),
      t.confidence_score, t.field_count,
      boxInt(t.record_position), boxInt(t.record_span), boxL(t.timestamp)))

  def extractTokens(frame: Array[Byte], ts: Long): ArrayData = {
    if (frame == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(
      TokenExtractor.extractTokens(frame, ts).map(tokenRow).toArray[Any])
  }

  /** `array<struct>` of the deep token extraction (D8/D10/D13 + J1-J3)
    * of a binary frame column at a given extraction timestamp.
    */
  case class DecodeTokens(frame: Expression, ts: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def left: Expression = frame
    override def right: Expression = ts
    override def dataType: DataType = ArrayType(tokenStruct, containsNull = false)
    override def nullSafeEval(f: Any, t: Any): Any =
      extractTokens(f.asInstanceOf[Array[Byte]], t.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (f, t) => s"graft.functions.DecodePairs.extractTokens($f, $t)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DecodeTokens =
      copy(frame = newLeft, ts = newRight)
  }

  def decodeTokens(frame: Column, ts: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(DecodeTokens(
      graftbridge.expression(frame), graftbridge.expression(ts)))
  }
}
