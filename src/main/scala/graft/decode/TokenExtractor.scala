package graft.decode

import graft.functions.Base58
import graft.model._
import scala.collection.mutable
import scala.util.matching.Regex

/** The deep token-extraction path (SURVEY §2.2 D8/D10/D13/D14 + §2.3
  * J1-J3; reference: dexscraper/scraper.py:307-946): symbol mining over
  * the printable projection, positional metadata extraction, per-symbol
  * ±500-byte numeric record decode with first-match-wins classification,
  * and proximity enrichment. All per-frame structures are bounded by the
  * reference's own caps (top-20 symbols, 100 hits/kind), so one frame's
  * extraction is O(frame bytes) and frames parallelize embarrassingly.
  */
object TokenExtractor {

  // D13 pattern families (scraper.py:459-466), case-insensitive.
  private val PatternFamilies: Seq[Regex] = Seq(
    "(?i)\"symbol\"\\s*:\\s*\"([^\"]+)\"".r,
    "(?i)symbol\\s*:\\s*([A-Z0-9]{2,10})".r,
    "(?i)\\$([A-Z]{2,10})\\b".r,
    "(?i)\"name\"\\s*:\\s*\"([^\"]+)\"".r,
    "(?i)token\\s*:\\s*([A-Z0-9]{2,10})".r)

  private val UppercaseToken: Regex = "\\b([A-Z]{2,10})\\b".r
  private val MixedCaseToken: Regex = "\\b([A-Z][a-z]{2,15})\\b".r

  // scraper.py:479-521
  private val Blacklist: Set[String] = Set(
    "HTTP", "HTTPS", "GET", "POST", "PUT", "DELETE", "JSON", "XML", "HTML",
    "CSS", "JS", "API", "URL", "URI", "TCP", "UDP", "DNS", "SSL", "TLS",
    "UTF", "ASCII", "BASE", "TRUE", "FALSE", "NULL", "VOID", "INT", "FLOAT", "DOUBLE")

  // scraper.py:528-561
  private val EnglishWords: Set[String] = Set(
    "The", "And", "For", "Are", "But", "Not", "You", "All", "Can", "Had",
    "Her", "Was", "One", "Our", "Out", "Day", "Get", "Has", "Him", "His",
    "How", "Its", "May", "New", "Now", "Old", "See", "Two", "Way", "Who",
    "Boy", "Did", "Http", "Https", "Json", "Server", "Client", "Request",
    "Response", "Error", "Success", "Failed", "Retry")

  private val AddressPattern: Regex = "\\b[1-9A-HJ-NP-Za-km-z]{32,44}\\b".r
  private val UrlPattern: Regex = "https?://[^\\s<>\"]{2,}".r
  private val Protocols = Seq("pumpfun", "pumpswap")
  private val AgeIndicators = Seq("1h", "24h", "6h", "5m")

  /** D13+D14 (scraper.py:452-585): pattern-family mining → frequency count
    * keyed by UPPER (insertion-ordered for stable tie-breaks) → top-20 by
    * frequency → first-occurrence position of the uppercased symbol.
    */
  def extractRealTokenNames(printable: String, dataStart: Int): Map[Int, String] = {
    val all = mutable.ArrayBuffer.empty[String]
    PatternFamilies.foreach { p =>
      p.findAllMatchIn(printable).foreach { m =>
        val s = m.group(1)
        if (s != null && s.length >= 2) all += s
      }
    }
    UppercaseToken.findAllMatchIn(printable).foreach { m =>
      val s = m.group(1)
      if (!Blacklist.contains(s)) all += s
    }
    MixedCaseToken.findAllMatchIn(printable).foreach { m =>
      val s = m.group(1)
      if (!EnglishWords.contains(s)) all += s
    }

    val counts = mutable.LinkedHashMap.empty[String, Int]
    all.foreach { s =>
      val u = s.toUpperCase
      counts(u) = counts.getOrElse(u, 0) + 1
    }
    // Stable sort by count desc preserves insertion order on ties,
    // matching Python's sorted(..., key=count, reverse=True).
    val top = counts.toSeq.sortBy(-_._2).take(20)

    val result = mutable.LinkedHashMap.empty[Int, String]
    top.foreach { case (symbol, _) =>
      val pos = printable.indexOf(symbol)
      if (pos >= 0) result(dataStart + pos) = symbol
    }
    result.toMap
  }

  /** D10 (scraper.py:830-914): positional metadata mining. Addresses get
    * every occurrence (deduped by (addr,pos)); URLs get their first
    * occurrence per regex hit; protocol/age markers get every occurrence
    * capped at 100 entries per kind.
    */
  def extractMetadataPatterns(data: Array[Byte], dataStart: Int): Metadata = {
    val printable = Wire.printable(data)
    val lower = printable.toLowerCase

    val addresses = Vector.newBuilder[AddressHit]
    val seen = mutable.HashSet.empty[(String, Int)]
    AddressPattern.findAllMatchIn(printable).map(_.group(0)).toSeq.foreach { addr =>
      if (Base58.isProbableSolanaAddress(addr)) {
        var start = 0
        var pos = printable.indexOf(addr, start)
        while (pos >= 0) {
          if (seen.add((addr, pos)))
            addresses += AddressHit(addr, dataStart + pos, classifyAddress(addr))
          start = pos + 1
          pos = printable.indexOf(addr, start)
        }
      }
    }

    val urls = Vector.newBuilder[UrlHit]
    UrlPattern.findAllMatchIn(printable).map(_.group(0)).foreach { url =>
      val pos = printable.indexOf(url)
      if (pos >= 0) urls += UrlHit(url, dataStart + pos, classifyUrl(url))
    }

    val protocols = Vector.newBuilder[PosHit]
    var protoCount = 0
    Protocols.foreach { proto =>
      var start = 0
      var continue = true
      while (continue) {
        val pos = lower.indexOf(proto, start)
        if (pos == -1) continue = false
        else {
          protocols += PosHit(proto, dataStart + pos)
          protoCount += 1
          start = pos + 1
          if (protoCount >= 100) continue = false
        }
      }
    }

    val ages = Vector.newBuilder[PosHit]
    var ageCount = 0
    AgeIndicators.foreach { ind =>
      var start = 0
      var continue = true
      while (continue) {
        val pos = lower.indexOf(ind, start)
        if (pos == -1) continue = false
        else {
          ages += PosHit(ind, dataStart + pos)
          ageCount += 1
          start = pos + 1
          if (ageCount >= 100) continue = false
        }
      }
    }

    Metadata(addresses.result(), urls.result(), protocols.result(), ages.result())
  }

  /** scraper.py:916-923 */
  def classifyAddress(addr: String): String =
    if (addr == "So11111111111111111111111111111111111111112") "SOL_token"
    else if (addr.length >= 40) "potential_contract"
    else "unknown"

  /** scraper.py:948-958 */
  def classifyUrl(url: String): String = {
    val u = url.toLowerCase
    if (u.contains("twitter.com") || u.contains("x.com")) "twitter"
    else if (u.contains("t.me") || u.contains("telegram")) "telegram"
    else if (Seq(".com", ".io", ".xyz", ".org").exists(u.contains)) "website"
    else "unknown"
  }

  /** D8 (scraper.py:587-674): three ordered scans (doubles stride 1,
    * floats stride 1, uint32 stride 1) with first-match-wins assignment
    * per field — scan order IS the semantics (SURVEY §7.4.1).
    * Copying reference form; the hot path is [[extractValidatedTokenRecordSlice]].
    */
  def extractValidatedTokenRecord(tokenName: String, recordData: Array[Byte],
      position: Int): Option[TokenProfile] =
    extractValidatedTokenRecordSlice(tokenName, recordData, 0, recordData.length, position)

  // Faithful elif-chain transcription (scraper.py:599-614): note the
  // 1000..10M branch shadows 1000..50000, so the counts bucket only ever
  // sees 10..999 here (txns ≥1000 arrive via the uint32 pass alone), and
  // a 1000..99999 value falls through to liquidity. Returns the slot the
  // value binds under first-match-wins (0 = none) — primitives in/out so
  // the JIT inlines it into the stride-1 scan loops with no boxing.
  private val SlotNone = 0
  private val SlotPrice = 1; private val SlotMarketCap = 2
  private val SlotVolume = 3; private val SlotLiquidity = 4
  private val SlotTxns = 5; private val SlotMakers = 6
  @inline private def classifySlot(v: Double, hasPrice: Boolean, hasMc: Boolean,
      hasVol: Boolean, hasLiq: Boolean, hasTx: Boolean, hasMk: Boolean): Int =
    if (v >= 0.000001 && v <= 0.1) { if (!hasPrice) SlotPrice else SlotNone }
    else if (v >= 1000 && v <= 10000000) {
      if (v >= 1000000 && !hasMc) SlotMarketCap
      else if (v >= 100000 && !hasVol) SlotVolume
      else if (!hasLiq) SlotLiquidity
      else SlotNone
    } else if (v >= 10 && v <= 50000) {
      if (v >= 1000 && !hasTx) SlotTxns
      else if (!hasMk) SlotMakers
      else SlotNone
    } else SlotNone

  /** [[extractValidatedTokenRecord]] over `[from, until)` of the SHARED
    * frame buffer — the per-symbol window scans call this, so the hot
    * loop must not copy ~1 KB per symbol nor allocate per probe.
    * De-allocated kernel (the same promotion as the D3 chunk scan,
    * [[LegacyDecoder.decodePairSlice]]): primitive found-flags instead
    * of captured `Option` refs, the elif chain as the primitive
    * [[classifySlot]], and an early exit once all six fields are bound
    * (first-match-wins means no later read can change anything —
    * byte-identical results, DecodeSpec pins agreement with the
    * copying form on random buffers).
    */
  def extractValidatedTokenRecordSlice(tokenName: String, data: Array[Byte],
      from: Int, until: Int, position: Int): Option[TokenProfile] = {
    var price = 0.0; var hasPrice = false
    var volume = 0.0; var hasVol = false
    var txns = 0; var hasTx = false
    var makers = 0; var hasMk = false
    var liquidity = 0.0; var hasLiq = false
    var marketCap = 0.0; var hasMc = false

    @inline def complete: Boolean = hasPrice && hasVol && hasTx && hasMk && hasLiq && hasMc
    @inline def bind(slot: Int, v: Double): Unit = slot match {
      case SlotPrice     => price = v; hasPrice = true
      case SlotMarketCap => marketCap = v; hasMc = true
      case SlotVolume    => volume = v; hasVol = true
      case SlotLiquidity => liquidity = v; hasLiq = true
      case SlotTxns      => txns = v.toInt; hasTx = true
      case SlotMakers    => makers = v.toInt; hasMk = true
      case _             =>
    }

    val len = until - from
    var off = 0
    while (off < len - 8 && !complete) {
      val slot = classifySlot(Wire.readDoubleLE(data, from + off),
        hasPrice, hasMc, hasVol, hasLiq, hasTx, hasMk)
      if (slot != SlotNone) bind(slot, Wire.readDoubleLE(data, from + off))
      off += 1
    }
    off = 0
    while (off < len - 4 && !complete) {
      val v = Wire.readFloatLE(data, from + off).toDouble
      val slot = classifySlot(v, hasPrice, hasMc, hasVol, hasLiq, hasTx, hasMk)
      if (slot != SlotNone) bind(slot, v)
      off += 1
    }
    off = 0
    while (off < len - 4 && !(hasTx && hasMk)) {
      val v = Wire.readUInt32LE(data, from + off)
      if (v >= 1000 && v <= 50000 && !hasTx) { txns = v.toInt; hasTx = true }
      else if (v >= 10 && v <= 1000 && !hasMk) { makers = v.toInt; hasMk = true }
      off += 1
    }

    val fieldCount = (if (hasPrice) 1 else 0) + (if (hasVol) 1 else 0) +
      (if (hasTx) 1 else 0) + (if (hasMk) 1 else 0) +
      (if (hasLiq) 1 else 0) + (if (hasMc) 1 else 0)
    if (fieldCount >= 3)
      Some(TokenProfile(
        symbol = Some(tokenName),
        price = if (hasPrice) Some(price) else None,
        volume_24h = if (hasVol) Some(volume) else None,
        txns_24h = if (hasTx) Some(txns) else None,
        makers = if (hasMk) Some(makers) else None,
        liquidity = if (hasLiq) Some(liquidity) else None,
        market_cap = if (hasMc) Some(marketCap) else None,
        confidence_score = math.min(0.7 + fieldCount * 0.05, 0.95),
        field_count = fieldCount,
        record_position = Some(position)))
    else None
  }

  /** J1-J3 (scraper.py:345-450): ±1000-byte proximity join, nearest-first
    * greedy address role assignment, first-match URL picks by type,
    * distance-gated protocol (≤220) and age (≤180).
    */
  def enrichTokenProfile(profile: TokenProfile, tokenName: String, tokenPosition: Int,
      metadata: Metadata): TokenProfile = {
    val maxDistance = 1000

    var p = profile.copy(
      token_name = profile.token_name.orElse(Some(tokenName)),
      chain = profile.chain.orElse(Some("solana")),
      protocol = profile.protocol.orElse(Some("unknown")))

    val nearbyAddresses = metadata.addresses
      .filter(a => math.abs(a.position - tokenPosition) <= maxDistance)
      .sortBy(a => math.abs(a.position - tokenPosition)) // stable
    nearbyAddresses.foreach { a =>
      if (Base58.isProbableSolanaAddress(a.address)) {
        if (a.hitType == "SOL_token") {
          if (p.quote_address.isEmpty) p = p.copy(quote_address = Some(a.address))
        } else {
          val assigned = Set(p.token_address, p.pair_address, p.creator_address,
            p.quote_address).flatten
          if (!assigned.contains(a.address)) {
            if (p.token_address.isEmpty) p = p.copy(token_address = Some(a.address))
            else if (p.pair_address.isEmpty) p = p.copy(pair_address = Some(a.address))
            else if (p.creator_address.isEmpty) p = p.copy(creator_address = Some(a.address))
          }
        }
      }
    }

    val nearbyUrls = metadata.urls
      .filter(u => math.abs(u.position - tokenPosition) <= maxDistance)
      .sortBy(u => math.abs(u.position - tokenPosition))
    nearbyUrls.foreach { u =>
      u.hitType match {
        case "twitter" if p.twitter.isEmpty => p = p.copy(twitter = Some(u.url))
        case "telegram" if p.telegram.isEmpty => p = p.copy(telegram = Some(u.url))
        case "website" if p.website.isEmpty => p = p.copy(website = Some(u.url))
        case _ =>
      }
    }

    val protoCandidates = metadata.protocols
      .filter(h => math.abs(h.position - tokenPosition) <= maxDistance)
      .map(h => (math.abs(h.position - tokenPosition), h.value))
      .sortBy(_._1)
    protoCandidates.headOption.foreach { case (dist, proto) =>
      if (dist <= 220) p = p.copy(protocol = Some(proto))
    }

    val ageCandidates = metadata.ageIndicators
      .filter(h => math.abs(h.position - tokenPosition) <= maxDistance)
      .map(h => (math.abs(h.position - tokenPosition), h.value))
      .sortBy(_._1)
    ageCandidates.headOption.foreach { case (dist, age) =>
      if (dist <= 180) p = p.copy(age = Some(age))
    }

    p
  }

  /** EP1 steps 5-6 (scraper.py:248-343): locate `pairs`+20, mine symbols
    * and metadata, extract a ±500-byte numeric record per symbol position,
    * enrich. `extractionTs` is injected for determinism (SURVEY §7.4.5).
    */
  def extractTokens(message: Array[Byte], extractionTs: Long): Seq[TokenProfile] = {
    val pairsPos = Wire.indexOf(message, Wire.PairsMarker)
    if (pairsPos < 0) return Seq.empty
    val dataStart = pairsPos + Wire.DeepHeaderSkip
    if (dataStart >= message.length) return Seq.empty
    val data = java.util.Arrays.copyOfRange(message, dataStart, message.length)

    val printable = Wire.printable(data)
    val tokenNames = extractRealTokenNames(printable, dataStart)
    val metadata = extractMetadataPatterns(data, dataStart)

    tokenNames.keys.toSeq.sorted.flatMap { pos =>
      val tokenName = tokenNames(pos)
      val recordStart = math.max(0, pos - dataStart - 500)
      val recordEnd = math.min(data.length, pos - dataStart + 500)
      extractValidatedTokenRecordSlice(tokenName, data, recordStart, recordEnd, pos)
        .map { rec =>
          enrichTokenProfile(rec, tokenName, pos, metadata)
            .copy(timestamp = Some(extractionTs))
        }
    }
  }

  final case class AddressHit(address: String, position: Int, hitType: String)
  final case class UrlHit(url: String, position: Int, hitType: String)
  final case class PosHit(value: String, position: Int)
  final case class Metadata(
      addresses: Vector[AddressHit],
      urls: Vector[UrlHit],
      protocols: Vector[PosHit],
      ageIndicators: Vector[PosHit])
}
