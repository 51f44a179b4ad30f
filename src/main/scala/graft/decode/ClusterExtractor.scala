package graft.decode

import graft.model.TokenProfile
import scala.collection.mutable

/** The cluster→token deep-extraction path: sliding 500-byte windows are
  * scanned for IEEE-754 values, classified into field buckets, grouped
  * with proximity metadata, and elected a symbol via the scored D13/D14
  * machinery. Reference: dexscraper/scraper.py:676-828 (cluster scan +
  * classification), :960-1316 (symbol mining + election), :1318-1481
  * (grouping, completeness, profile build incl. A5 percentages →
  * change_5m/1h/6h/24h).
  *
  * Everything here is per-frame and bounded (≤20 clusters, ≤20 symbols,
  * ≤100 metadata hits/kind), so the operator is a narrow flatMap over
  * frames — embarrassingly parallel, no shuffle, no driver state.
  *
  * Determinism notes (SURVEY §7.4.4): the reference iterates Python sets
  * for the dollar/context/mixed-case symbol families, whose order is
  * hash-seed-dependent — an ill-defined tie-break. We canonicalize to
  * first-occurrence (position-ascending) order, which is what a fixed
  * PYTHONHASHSEED run typically observes and the only reproducible
  * choice. Dict-based family 1 is insertion-ordered in Python and is
  * reproduced exactly.
  */
object ClusterExtractor {

  final case class NumVal(pos: Int, value: Double, dtype: String)
  final case class Classified(
      prices: Vector[NumVal], txns: Vector[NumVal], makers: Vector[NumVal],
      volumes: Vector[NumVal], liquidity: Vector[NumVal],
      marketCaps: Vector[NumVal], percentages: Vector[NumVal]) {
    def buckets: Seq[Vector[NumVal]] =
      Seq(prices, txns, makers, volumes, liquidity, marketCaps, percentages)
    def fieldTypes: Int = buckets.count(_.nonEmpty)
  }
  final case class Cluster(startPos: Int, endPos: Int, values: Vector[NumVal],
      classified: Classified)
  final case class SymbolHit(symbol: String, position: Int, symType: String,
      confidence: Double, frequency: Int)
  final case class TokenRecord(cluster: Cluster,
      addresses: Vector[TokenExtractor.AddressHit],
      urls: Vector[TokenExtractor.UrlHit],
      tokens: Vector[SymbolHit],
      completeness: Double)

  private val WindowSize = 500 // scraper.py:679
  private val StepSize = 200 // scraper.py:680

  /** scraper.py:756-764 */
  def isValidNumeric(v: Double): Boolean =
    !v.isNaN && !v.isInfinite && math.abs(v) > 1e-10 && math.abs(v) < 1e12

  /** scraper.py:707-754: doubles at stride 4, floats at stride 2 skipping
    * positions within <4 of any already-recorded value, uint32 at stride 4
    * with the same skip; result sorted by position.
    */
  def extractNumericsFromWindow(window: Array[Byte], baseOffset: Int): Vector[NumVal] = {
    val values = mutable.ArrayBuffer.empty[NumVal]
    // The reference's `any(abs(p - pos) < 4 for pos in values)` is an
    // O(values) scan per read; a coverage bitmap over window offsets is
    // semantically identical (|p-x|<4 ⇔ x marks [x-3, x+3]) and O(1) per
    // read — this scan is the per-frame hot loop at scale.
    val covered = new Array[Boolean](window.length + 8)
    def mark(off: Int): Unit = {
      var j = math.max(0, off - 3)
      val end = math.min(covered.length - 1, off + 3)
      while (j <= end) { covered(j) = true; j += 1 }
    }
    def record(off: Int, v: Double, dtype: String): Unit = {
      values += NumVal(baseOffset + off, v, dtype)
      mark(off)
    }

    var i = 0
    while (i < window.length - 8) {
      val v = Wire.readDoubleLE(window, i)
      if (isValidNumeric(v)) record(i, v, "double")
      i += 4
    }
    i = 0
    while (i < window.length - 4) {
      if (!covered(i)) {
        val v = Wire.readFloatLE(window, i).toDouble
        if (isValidNumeric(v)) record(i, v, "float")
      }
      i += 2
    }
    i = 0
    while (i < window.length - 4) {
      if (!covered(i)) {
        val v = Wire.readUInt32LE(window, i)
        if (v >= 10 && v <= 15000) record(i, v.toDouble, "uint32")
      }
      i += 4
    }
    values.sortBy(_.pos).toVector // stable: scan order preserved on equal pos
  }

  /** scraper.py:766-828 — the exact elif chain, shadows included: volumes
    * (1e5..1e7) swallow the low half of market_caps (1e5..5e7), so only
    * (1e7, 5e7] reaches the market-cap bucket; makers accept only
    * float/uint32 in [10, 15000), but every uint32 in [10, 50000] is
    * already taken by txns, so makers effectively get floats only.
    */
  def classifyNumericValues(values: Vector[NumVal]): Classified = {
    val prices, txns, makers, volumes, liquidity, mcaps, pcts =
      Vector.newBuilder[NumVal]
    values.foreach { nv =>
      val v = nv.value
      if (v >= 0.000001 && v <= 0.1) prices += nv
      else if (nv.dtype == "uint32" && v >= 10 && v <= 50000) txns += nv
      else if ((nv.dtype == "uint32" || nv.dtype == "float") &&
        v >= 10 && v <= 15000 && v < 20000) makers += nv
      else if (v >= 100000 && v <= 10000000) volumes += nv
      else if (v >= 10000 && v <= 1000000) liquidity += nv
      else if (v >= 100000 && v <= 50000000) mcaps += nv
      else if (v >= -100 && v <= 1000 && math.abs(v) > 0.01) pcts += nv
    }
    Classified(prices.result(), txns.result(), makers.result(),
      volumes.result(), liquidity.result(), mcaps.result(), pcts.result())
  }

  /** scraper.py:676-705: overlapping 500-byte windows at step 200; keep
    * windows with ≥5 valid values and ≥3 populated field buckets.
    */
  def extractNumericClusters(data: Array[Byte], dataStart: Int): Vector[Cluster] = {
    val out = Vector.newBuilder[Cluster]
    var offset = 0
    while (offset < data.length - WindowSize) {
      val window = java.util.Arrays.copyOfRange(data, offset, offset + WindowSize)
      val values = extractNumericsFromWindow(window, dataStart + offset)
      if (values.length >= 5) {
        val classified = classifyNumericValues(values)
        if (classified.fieldTypes >= 3)
          out += Cluster(dataStart + offset, dataStart + offset + WindowSize,
            values, classified)
      }
      offset += StepSize
    }
    out.result()
  }

  // ---- D13: scored symbol mining (scraper.py:960-1252) ----

  private val CryptoPattern = "\\b[A-Z]{2,10}\\b".r
  private val DollarPattern = "\\$[A-Z]{2,10}\\b".r
  private val ContextPattern = "(?i)(?:symbol|name|token)[:\\s]*([A-Za-z0-9]{2,10})".r
  private val MixedCasePattern = "\\b[A-Z][a-z]{2,15}\\b".r

  /** scraper.py:978-1034 */
  val Blacklist: Set[String] = Set(
    "HTTP", "HTTPS", "API", "GET", "POST", "PUT", "DELETE", "JSON", "XML",
    "HTML", "CSS", "JS", "PNG", "JPG", "GIF", "TRUE", "FALSE", "NULL",
    "VOID", "INT", "CHAR", "BOOL", "STRING", "AND", "OR", "NOT", "IF",
    "ELSE", "FOR", "WHILE", "DO", "RETURN", "CONST", "VAR", "LET", "NEW",
    "THIS", "SUPER", "TRY", "CATCH", "URL", "URI", "TCP", "UDP", "DNS",
    "SSL", "TLS", "UTF", "ASCII", "BASE", "ERROR", "INFO", "WARN", "DEBUG",
    "TRACE")

  /** scraper.py:1037-1058 */
  val Whitelist: Set[String] = Set(
    "SOL", "USDC", "USD", "WLFI", "COIN", "MROCKS", "OTC", "KAIROS",
    "EMULITES", "LYN", "FINANCE", "SHOT", "HOPE", "AA", "EA", "FA",
    "PEPE", "DOGE", "SHIB", "BONK")

  /** scraper.py:1133-1236 (lowercase entries; the three capitalized
    * entries "Http"/"Https"/"Json" are dead — the reference compares
    * match.lower() against them, which can never be equal).
    */
  private val MixedCaseStopWords: Set[String] = Set(
    "the", "and", "for", "are", "but", "not", "you", "all", "can", "had",
    "her", "was", "one", "our", "out", "day", "get", "has", "him", "his",
    "how", "its", "may", "new", "now", "old", "see", "two", "way", "who",
    "boy", "did", "does", "each", "find", "here", "just", "like", "long",
    "make", "many", "over", "part", "some", "time", "very", "what", "with",
    "have", "from", "they", "know", "want", "been", "good", "much", "when",
    "come", "could", "state", "there", "think", "where", "will", "would",
    "about", "after", "again", "below", "being", "both", "every", "first",
    "found", "great", "group", "large", "last", "left", "life", "little",
    "never", "next", "often", "other", "own", "right", "small", "still",
    "such", "take", "than", "them", "well", "were")

  /** Dedup preserving first occurrence (canonical stand-in for the
    * reference's hash-seed-dependent `set(...)` iteration).
    */
  private def distinctInOrder(xs: Iterator[String]): Vector[String] = {
    val seen = mutable.LinkedHashSet.empty[String]
    xs.foreach(seen += _)
    seen.toVector
  }

  /** scraper.py:960-1252: four scored pattern families over the printable
    * text — uppercase (with frequency-scaled confidence, whitelist 0.95 /
    * blacklist drop), $-prefixed (0.9), keyword-context (0.8), MixedCase
    * minus stop-words (0.5, original casing kept). Positions are always
    * the FIRST occurrence of the matched text (`text.find`). Sorted by
    * confidence desc (stable), capped at 20.
    */
  def extractTokenSymbols(text: String, dataStart: Int): Vector[SymbolHit] = {
    val out = mutable.ArrayBuffer.empty[SymbolHit]

    val counts = mutable.LinkedHashMap.empty[String, Int]
    CryptoPattern.findAllIn(text).foreach(m => counts(m) = counts.getOrElse(m, 0) + 1)
    counts.foreach { case (m, c) =>
      if (Whitelist.contains(m)) {
        val pos = text.indexOf(m)
        if (pos >= 0) out += SymbolHit(m, dataStart + pos, "whitelisted", 0.95, c)
      } else if (!Blacklist.contains(m)) {
        val conf = if (c == 1) 0.7 else math.min(0.7 + c * 0.05, 0.9)
        val pos = text.indexOf(m)
        if (pos >= 0) out += SymbolHit(m, dataStart + pos, "crypto_symbol", conf, c)
      }
    }

    distinctInOrder(DollarPattern.findAllIn(text)).foreach { m =>
      val pos = text.indexOf(m)
      if (pos >= 0) out += SymbolHit(m.substring(1), dataStart + pos, "dollar_prefixed", 0.9, 1)
    }

    distinctInOrder(ContextPattern.findAllMatchIn(text).map(_.group(1))).foreach { m =>
      if (m.length >= 2 && !Set("SYMBOL", "NAME", "TOKEN").contains(m.toUpperCase)) {
        val pos = text.indexOf(m)
        if (pos >= 0) out += SymbolHit(m.toUpperCase, dataStart + pos, "context_based", 0.8, 1)
      }
    }

    distinctInOrder(MixedCasePattern.findAllIn(text)).foreach { m =>
      if (!MixedCaseStopWords.contains(m.toLowerCase)) {
        val pos = text.indexOf(m)
        if (pos >= 0) out += SymbolHit(m, dataStart + pos, "mixed_case", 0.5, 1)
      }
    }

    out.sortBy(-_.confidence).take(20).toVector // stable on ties
  }

  // ---- D14: best-symbol election (scraper.py:1254-1316) ----

  /** scraper.py:1264-1287 */
  def symbolScore(t: SymbolHit): Double = {
    var score = t.confidence
    if (t.frequency > 1) score += math.min(t.frequency * 0.02, 0.2)
    score += (t.symType match {
      case "whitelisted" => 0.5
      case "dollar_prefixed" => 0.3
      case "context_based" => 0.2
      case "crypto_symbol" => 0.1
      case _ => 0.0
    })
    score
  }

  /** scraper.py:1254-1316: score-ordered scan; single letters skipped
    * unless whitelisted; accept 2-10 chars alphanumeric-after-removing-_-
    * (uppercased); else first candidate uppercased; else UNKNOWN_{i:02d}.
    */
  def extractBestTokenSymbol(tokens: Vector[SymbolHit], index: Int): String = {
    if (tokens.isEmpty) return f"UNKNOWN_$index%02d"
    val sorted = tokens.sortBy(t => -symbolScore(t)) // stable on ties
    sorted.foreach { t =>
      val sym = t.symbol
      val singleLetterSkip = sym.length == 1 && t.symType != "whitelisted"
      if (!singleLetterSkip && sym.length >= 2 && sym.length <= 10) {
        val core = sym.replace("_", "").replace("-", "")
        // Python str.isalnum: non-empty and all alphanumeric
        if (core.nonEmpty && core.forall(_.isLetterOrDigit)) return sym.toUpperCase
      }
    }
    sorted.head.symbol.toUpperCase
  }

  // ---- grouping + profile build (scraper.py:1318-1481) ----

  /** scraper.py:1371-1392. Note the reference computes this over the
    * per-cluster `relevant_metadata`, which never receives protocols or
    * age indicators (scraper.py:1330-1351 only copies addresses, urls,
    * tokens) — so those two +10 bonuses are unreachable and the maximum
    * score is 0.8. Reproduced faithfully.
    */
  def completenessScore(cluster: Cluster, addresses: Vector[_], urls: Vector[_]): Double = {
    var score = math.min(cluster.classified.fieldTypes * 10, 60).toDouble
    if (addresses.nonEmpty) score += 10
    if (urls.nonEmpty) score += 10
    score / 100.0
  }

  /** scraper.py:1318-1369: top-20 clusters by field-type count, ±1000-byte
    * metadata band per cluster, ordered by completeness desc.
    */
  def groupClustersToTokens(clusters: Vector[Cluster],
      metadata: TokenExtractor.Metadata,
      tokens: Vector[SymbolHit]): Vector[TokenRecord] = {
    val byFields = clusters.sortBy(-_.classified.fieldTypes).take(20) // stable
    val records = byFields.map { c =>
      val addrs = metadata.addresses.filter(a => math.abs(a.position - c.startPos) <= 1000)
      val urls = metadata.urls.filter(u => math.abs(u.position - c.startPos) <= 1000)
      val toks = tokens.filter(t => math.abs(t.position - c.startPos) <= 1000)
      TokenRecord(c, addrs, urls, toks, completenessScore(c, addrs, urls))
    }
    records.sortBy(-_.completeness) // stable
  }

  /** scraper.py:1394-1481: A5 percentages → change_5m/1h/6h/24h in
    * position order; txns/volume take the max-valued hit (first max on
    * ties), price/makers/liquidity/market-cap the first by position;
    * addresses fill quote (SOL mint, last hit wins — the reference has no
    * guard there) then pair then creator; URLs first-match per type.
    * Protocols are never populated (see [[completenessScore]]), so
    * protocol/chain stay null on this path.
    */
  def buildTokenProfile(r: TokenRecord, index: Int): TokenProfile = {
    val cl = r.cluster.classified
    var p = TokenProfile(
      symbol = Some(extractBestTokenSymbol(r.tokens, index)),
      record_position = Some(r.cluster.startPos),
      record_span = Some(r.cluster.endPos - r.cluster.startPos))

    if (cl.prices.nonEmpty) p = p.copy(price = Some(cl.prices.head.value))
    if (cl.txns.nonEmpty) p = p.copy(txns_24h = Some(cl.txns.maxBy(_.value).value.toInt))
    if (cl.makers.nonEmpty) p = p.copy(makers = Some(cl.makers.head.value.toInt))
    if (cl.volumes.nonEmpty) p = p.copy(volume_24h = Some(cl.volumes.maxBy(_.value).value))
    if (cl.liquidity.nonEmpty) p = p.copy(liquidity = Some(cl.liquidity.head.value))
    if (cl.marketCaps.nonEmpty) p = p.copy(market_cap = Some(cl.marketCaps.head.value))

    val pct = cl.percentages
    if (pct.length >= 1) p = p.copy(change_5m = Some(pct(0).value))
    if (pct.length >= 2) p = p.copy(change_1h = Some(pct(1).value))
    if (pct.length >= 3) p = p.copy(change_6h = Some(pct(2).value))
    if (pct.length >= 4) p = p.copy(change_24h = Some(pct(3).value))

    r.addresses.foreach { a =>
      if (a.hitType == "SOL_token") p = p.copy(quote_address = Some(a.address))
      else if (p.pair_address.isEmpty) p = p.copy(pair_address = Some(a.address))
      else if (p.creator_address.isEmpty) p = p.copy(creator_address = Some(a.address))
    }

    r.urls.foreach { u =>
      u.hitType match {
        case "twitter" if p.twitter.isEmpty => p = p.copy(twitter = Some(u.url))
        case "website" if p.website.isEmpty => p = p.copy(website = Some(u.url))
        case "telegram" if p.telegram.isEmpty => p = p.copy(telegram = Some(u.url))
        case _ =>
      }
    }

    val fields = Seq(p.price, p.volume_24h, p.txns_24h, p.makers, p.liquidity,
      p.market_cap, p.pair_address, p.protocol, p.website)
    p.copy(field_count = fields.count(_.nonEmpty), confidence_score = r.completeness)
  }

  /** Full cluster-path extraction over one frame (same framing as the deep
    * path: `pairs` marker + 20-byte header skip, scraper.py:257-273).
    */
  def extractTokensViaClusters(message: Array[Byte], extractionTs: Long): Seq[TokenProfile] = {
    val pairsPos = Wire.indexOf(message, Wire.PairsMarker)
    if (pairsPos < 0) return Seq.empty
    val dataStart = pairsPos + Wire.DeepHeaderSkip
    if (dataStart >= message.length) return Seq.empty
    val data = java.util.Arrays.copyOfRange(message, dataStart, message.length)

    val printable = Wire.printable(data)
    val clusters = extractNumericClusters(data, dataStart)
    val metadata = TokenExtractor.extractMetadataPatterns(data, dataStart)
    val tokens = extractTokenSymbols(printable, dataStart)
    val records = groupClustersToTokens(clusters, metadata, tokens)
    records.zipWithIndex.map { case (r, i) =>
      buildTokenProfile(r, i).copy(timestamp = Some(extractionTs))
    }
  }
}
