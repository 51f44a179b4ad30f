package graft.decode

import graft.model._
import scala.collection.mutable

/** Legacy binary/text pair decoders (SURVEY §2.2 D1-D5; reference:
  * dexscraper/protocol.py:42-428). Total functions — malformed input
  * yields None/empty, never throws (the reference's decoder contract,
  * tests/test_decode_pair.py).
  */
object LegacyDecoder {

  private val FieldCount = 6

  /** D2: 8-byte-aligned block of 8 LE doubles; zero/NaN/Inf values are
    * dropped (protocol.py:42-72).
    */
  def decodeMetrics(data: Array[Byte], startPos: Int): Map[String, Double] = {
    if (startPos < 0 || startPos + 64 > data.length) return Map.empty
    val names = Seq("price", "priceUsd", "priceChangeH24", "liquidityUsd",
      "volumeH24", "fdv", "timestamp")
    val out = Map.newBuilder[String, Double]
    var i = 0
    while (i < names.length) {
      val v = Wire.handleDouble(Wire.readDoubleLE(data, startPos + i * 8))
      if (v != 0) out += names(i) -> v
      i += 1
    }
    out.result()
  }

  /** D1+D2: one chunk → one pair (protocol.py:75-200). Routes to the text
    * parser when the chunk contains text markers; requires ≥3 string
    * fields and non-empty metrics; validity gate = any of price/volume/
    * liquidity non-zero.
    */
  def decodePair(data: Array[Byte]): Option[TradingPair] =
    decodePairSlice(data, 0, data.length)

  /** [[decodePair]] over `[from, until)` of a shared buffer — the chunk
    * scans call this at stride 512/256/128, so the hot loop must not
    * copy 512 bytes per probe. Byte-for-byte the same semantics as the
    * copying form (DecodeSpec pins agreement on random buffers):
    * alignment is relative to the slice start, and the printable-
    * projection marker scan is [[Wire.hasTextMarker]] — one byte pass,
    * no 2×512-char string churn per chunk.
    */
  def decodePairSlice(data: Array[Byte], from: Int, until: Int): Option[TradingPair] = {
    var pos = from
    while (pos < until && pos - from < 10 && (data(pos) == 0x00 || data(pos) == 0x0a)) pos += 1

    if (Wire.hasTextMarker(data, from, until))
      return decodePairFromText(java.util.Arrays.copyOfRange(data, from, until))

    val fields = new Array[String](FieldCount)
    var nFields = 0
    var fieldIdx = 0
    var break = false
    while (fieldIdx < FieldCount && !break) {
      if (pos >= until) break = true
      else {
        val strLen = data(pos) & 0xff
        pos += 1
        if (strLen > math.min(200, until - pos)) break = true
        else if (strLen == 0) fieldIdx += 1
        else {
          if (pos + strLen <= until) {
            val value = Wire.cleanString(new String(data, pos, strLen, "UTF-8"))
            if (value.nonEmpty && value.length >= 2) { fields(fieldIdx) = value; nFields += 1 }
          }
          pos += strLen
          fieldIdx += 1
        }
      }
    }

    // 8-align relative to the slice start (the chunk's own offset 0)
    pos = from + (((pos - from) + 7) & ~7)
    // inline decodeMetrics: 7 named slots, zero ⇔ absent (zero/NaN/Inf
    // dropped), no per-chunk Map
    if (pos < from || pos + 64 > until) return None
    val price = Wire.handleDouble(Wire.readDoubleLE(data, pos))
    val priceUsd = Wire.handleDouble(Wire.readDoubleLE(data, pos + 8))
    val chg24 = Wire.handleDouble(Wire.readDoubleLE(data, pos + 16))
    val liq = Wire.handleDouble(Wire.readDoubleLE(data, pos + 24))
    val vol = Wire.handleDouble(Wire.readDoubleLE(data, pos + 32))
    val fdv = Wire.handleDouble(Wire.readDoubleLE(data, pos + 40))
    val ts = Wire.handleDouble(Wire.readDoubleLE(data, pos + 48))
    val metricsEmpty = price == 0 && priceUsd == 0 && chg24 == 0 && liq == 0 &&
      vol == 0 && fdv == 0 && ts == 0
    if (metricsEmpty || nFields < 3) return None

    val priceData =
      if (price != 0 && priceUsd != 0)
        Some(PriceData(Some(price), Some(priceUsd),
          if (chg24 != 0) Some(chg24) else None))
      else None
    val liquidityData = if (liq != 0) Some(LiquidityData(Some(liq), None, None)) else None
    val volumeData = if (vol != 0) Some(VolumeData(Some(vol), None, None)) else None
    val createdAt = if (ts != 0 && ts >= 0 && ts < 4102444800.0) Some(ts.toLong) else None

    def f(i: Int): String = { val s = fields(i); if (s == null) "" else s }
    val pair = TradingPair(
      chain = f(0), protocol = f(1), pair_address = f(2),
      base_token_name = f(3), base_token_symbol = f(4), base_token_address = f(5),
      price_data = priceData,
      liquidity_data = liquidityData,
      volume_data = volumeData,
      fdv = if (fdv != 0) Some(fdv) else None,
      created_at = createdAt)

    val meaningful = priceData.isDefined || volumeData.isDefined || liquidityData.isDefined
    if (meaningful) Some(pair) else None
  }

  private val TextProtocols = Seq("pumpswap", "raydium", "meteora", "jupiter", "orca")
  private val NameStopList = Seq("twitter", "telegram", "website", "pump", "sol")

  /** D4: text-mode extraction (protocol.py:203-281). */
  def decodePairFromText(data: Array[Byte]): Option[TradingPair] = {
    val printable = Wire.printable(data)
    val words = printable.split("\\s+").iterator.map(_.strip()).filter(_.length >= 2).toSeq
    if (words.length < 3) return None

    var protocol = ""; var pairAddress = ""; var tokenName = ""
    var tokenSymbol = ""; var tokenAddress = ""

    words.foreach { word =>
      val w = Wire.cleanString(word)
      if (w.nonEmpty && w.length >= 2) {
        val wl = w.toLowerCase
        if (TextProtocols.exists(wl.contains)) protocol = w
        else if (w.length >= 32 && w.length <= 44 && isAlnum(w.replace("1", ""))) {
          if (tokenAddress.isEmpty) tokenAddress = w
          else if (pairAddress.isEmpty) pairAddress = w
        } else if (isUpperAlpha(w) && w.length >= 2 && w.length <= 10) {
          if (tokenSymbol.isEmpty) tokenSymbol = w
        } else if (w.length >= 3 && w.length <= 50 && !isNumeric(w) && !w.startsWith("http")) {
          if ((tokenName.isEmpty || w.length > tokenName.length) &&
            !NameStopList.exists(wl.contains)) tokenName = w
        }
      }
    }

    if (tokenName.nonEmpty || tokenSymbol.nonEmpty || tokenAddress.length >= 32)
      Some(TradingPair("solana", if (protocol.isEmpty) "unknown" else protocol,
        pairAddress, tokenName, tokenSymbol, tokenAddress))
    else None
  }

  /** D5: variable-length split on the "solana" separator
    * (protocol.py:284-359); caps at 50 pairs.
    */
  def parseVariableLength(data: Array[Byte]): Seq[TradingPair] = {
    val printable = Wire.printable(data)
    val sections = printable.split("solana", -1)
    val pairs = Seq.newBuilder[TradingPair]
    var count = 0
    var i = 1
    while (i < sections.length && count < 50) {
      val section = sections(i)
      if (section.strip().length >= 10) {
        val words = section.split("\\s+").iterator.map(_.strip()).filter(_.length >= 3).toSeq
        if (words.length >= 3) {
          var protocol = ""; var pairAddress = ""; var tokenName = ""
          var tokenSymbol = ""; var tokenAddress = ""
          words.foreach { word =>
            val wl = word.toLowerCase
            if (Seq("pump", "raydium", "meteora", "jupiter").exists(wl.contains)) protocol = word
            else if (word.length >= 32 && word.length <= 44 && isAlnum(word.replace("1", ""))) {
              if (tokenAddress.isEmpty) tokenAddress = word
              else if (pairAddress.isEmpty) pairAddress = word
            } else if (isUpperAlpha(word) && word.length >= 2 && word.length <= 10)
              tokenSymbol = word
            else if (word.length >= 3 && word.length <= 50 && !isNumeric(word)) {
              if (tokenName.isEmpty || word.length > tokenName.length) tokenName = word
            }
          }
          if (tokenName.nonEmpty || tokenSymbol.nonEmpty || tokenAddress.nonEmpty) {
            pairs += TradingPair("solana", if (protocol.isEmpty) "unknown" else protocol,
              pairAddress, Wire.cleanString(tokenName), Wire.cleanString(tokenSymbol),
              Wire.cleanString(tokenAddress))
            count += 1
          }
        }
      }
      i += 1
    }
    pairs.result()
  }

  /** D3 + cascade (protocol.py:362-428): enhanced parser first, then the
    * legacy chunk scan trying 512/256/128 and keeping the best, then the
    * variable-length text fallback.
    */
  def parseMessage(message: Array[Byte]): Seq[TradingPair] = {
    val enhanced = EnhancedDecoder.parseMessage(message)
    if (enhanced.nonEmpty) return enhanced

    if (message.length < Wire.Preamble.length ||
      !message.take(Wire.Preamble.length).sameElements(Wire.Preamble)) return Seq.empty
    val pairsStart = Wire.indexOf(message, Wire.PairsMarker)
    if (pairsStart == -1) return Seq.empty
    val pos = pairsStart + Wire.LegacyHeaderSkip

    var best = Seq.empty[TradingPair]
    Seq(512, 256, 128).foreach { chunkSize =>
      val attempt = Seq.newBuilder[TradingPair]
      var n = 0
      var p = pos
      var break = false
      while (!break && p < message.length - chunkSize) {
        decodePairSlice(message, p, p + chunkSize) match {
          case Some(pair) => attempt += pair; n += 1
          case None =>
        }
        p += chunkSize
        if (n == 0 && p > pos + chunkSize * 10) break = true
      }
      val result = attempt.result()
      if (result.length > best.length) best = result
    }

    if (best.isEmpty) parseVariableLength(java.util.Arrays.copyOfRange(message, pos, message.length))
    else best
  }

  private def isUpperAlpha(s: String): Boolean =
    s.nonEmpty && s.forall(c => c >= 'A' && c <= 'Z')
  private def isAlnum(s: String): Boolean =
    s.nonEmpty && s.forall(_.isLetterOrDigit)
  private def isNumeric(s: String): Boolean =
    s.nonEmpty && s.forall(_.isDigit)
}
