package graft.decode

import graft.model._
import scala.collection.mutable

/** Sliding-window numeric-cluster decoder (SURVEY §2.2 D6/D7; reference:
  * dexscraper/enhanced_protocol.py). Scans 128-byte windows (step 64) for
  * IEEE-754 values in plausibility ranges, groups them into clusters,
  * greedily dedups overlaps by richness, and materializes a pair per
  * cluster from the first value of each category.
  */
object EnhancedDecoder {

  final case class Series(offset: Int, value: Double)
  final case class ClusterData(
      prices: Vector[Series], volumes: Vector[Series], counts: Vector[Series],
      liquidity: Vector[Series], percentages: Vector[Series]) {
    def total: Int = prices.length + volumes.length + counts.length +
      liquidity.length + percentages.length
  }

  /** enhanced_protocol.py:104-156: doubles at stride 4, floats at stride 2
    * over one window; categorize by value range (volumes take precedence
    * over counts on overlap; the float pass has no counts category).
    */
  def extractNumericFromWindow(window: Array[Byte]): ClusterData = {
    val prices = Vector.newBuilder[Series]; val volumes = Vector.newBuilder[Series]
    val counts = Vector.newBuilder[Series]; val liquidity = Vector.newBuilder[Series]
    val percentages = Vector.newBuilder[Series]

    var i = 0
    while (i < window.length - 8) {
      val v = Wire.readDoubleLE(window, i)
      if (!v.isNaN && math.abs(v) > 0.000001 && math.abs(v) < 1000000000.0) {
        if (v >= 0.0001 && v <= 0.001) prices += Series(i, v)
        else if (v >= 1000 && v <= 10000000) volumes += Series(i, v)
        else if (v >= 10 && v <= 50000) counts += Series(i, v)
        else if (v >= 40000 && v <= 500000) liquidity += Series(i, v)
        else if (v >= -100 && v <= 500 && math.abs(v) > 0.01) percentages += Series(i, v)
      }
      i += 4
    }
    i = 0
    while (i < window.length - 4) {
      val v = Wire.readFloatLE(window, i).toDouble
      if (!v.isNaN && math.abs(v) > 0.000001 && math.abs(v) < 1000000000.0) {
        if (v >= 0.0001 && v <= 0.001) prices += Series(i, v)
        else if (v >= 1000 && v <= 10000000) volumes += Series(i, v)
        else if (v >= 40000 && v <= 500000) liquidity += Series(i, v)
        else if (v >= -100 && v <= 500 && math.abs(v) > 0.01) percentages += Series(i, v)
      }
      i += 2
    }
    ClusterData(prices.result(), volumes.result(), counts.result(),
      liquidity.result(), percentages.result())
  }

  /** D6+D7 (enhanced_protocol.py:78-187): window scan + stable
    * richness-sorted greedy overlap elimination, capped at 20.
    */
  def findNumericClusters(data: Array[Byte]): Seq[(Int, ClusterData)] = {
    val clusters = Vector.newBuilder[(Int, ClusterData)]
    var offset = 0
    while (offset < data.length - 128) {
      val cd = extractNumericFromWindow(java.util.Arrays.copyOfRange(data, offset, offset + 128))
      if (cd.prices.nonEmpty && cd.volumes.nonEmpty && cd.counts.nonEmpty)
        clusters += offset -> cd
      offset += 64
    }
    val sorted = clusters.result().sortBy { case (_, cd) => -cd.total } // stable
    val unique = Vector.newBuilder[(Int, ClusterData)]
    val used = mutable.ArrayBuffer.empty[(Int, Int)]
    sorted.foreach { case (off, cd) =>
      val overlaps = used.exists { case (s, e) => !(off + 128 <= s || off >= e) }
      if (!overlaps) {
        unique += off -> cd
        used += ((off, off + 128))
      }
    }
    unique.result().take(20)
  }

  private val ChainWords = Set("solana", "ethereum", "base")
  private val ProtocolWords = Set("pumpswap", "raydium", "orca", "meteora")

  /** enhanced_protocol.py:189-264: one pair per cluster; token identity
    * mined from the ±(200/300)-byte text window; numeric fields take the
    * first value of each category.
    */
  def parsePairFromCluster(fullData: Array[Byte], clusterStart: Int, cd: ClusterData,
      extractionTs: Long): Option[TradingPair] = {
    val windowStart = math.max(0, clusterStart - 200)
    val windowEnd = math.min(fullData.length, clusterStart + 300)
    val printable = Wire.printable(java.util.Arrays.copyOfRange(fullData, windowStart, windowEnd))
    val words = printable.split("\\s+").iterator.map(_.strip()).filter(_.length >= 2).toSeq

    var chain = "solana"; var protocol = "unknown"
    words.foreach { w =>
      val wl = w.toLowerCase
      if (ChainWords.contains(wl)) chain = wl
      else if (ProtocolWords.contains(wl)) protocol = wl
    }
    var tokenSymbol = ""; var tokenName = ""
    words.foreach { w =>
      if (w.length >= 2 && w.length <= 10 && w.forall(c => c >= 'A' && c <= 'Z')) {
        if (tokenSymbol.isEmpty) tokenSymbol = w
      } else if (w.length >= 3 && w.length <= 30 && !w.startsWith("http")) {
        if (tokenName.isEmpty) tokenName = w
      }
    }

    val priceData = cd.prices.headOption.map(p =>
      PriceData(Some(p.value), Some(p.value), Some(0.0)))
    val volumeData = cd.volumes.headOption.map(v => VolumeData(Some(v.value), None, None))
    val liquidityData = cd.liquidity.headOption.map(l => LiquidityData(Some(l.value), None, None))

    Some(TradingPair(chain, protocol, "",
      if (tokenName.isEmpty) "Unknown Token" else tokenName,
      tokenSymbol, "",
      price_data = priceData, liquidity_data = liquidityData,
      volume_data = volumeData, created_at = Some(extractionTs)))
  }

  /** enhanced_protocol.py:22-77: locate `pairs`+17, cluster-scan, fall back
    * to marker-gated text chunks, cap at 50.
    */
  def parseMessage(data: Array[Byte], extractionTs: Long = 0L): Seq[TradingPair] = {
    val pairsPos = Wire.indexOf(data, Wire.PairsMarker)
    if (pairsPos < 0) return Seq.empty
    val section = java.util.Arrays.copyOfRange(data,
      math.min(pairsPos + Wire.EnhancedHeaderSkip, data.length), data.length)
    if (section.length < 100) return Seq.empty

    val pairs = findNumericClusters(section).flatMap { case (start, cd) =>
      parsePairFromCluster(section, start, cd, extractionTs)
    }
    val result = if (pairs.nonEmpty) pairs else fallbackTextParsing(section)
    result.take(50)
  }

  /** enhanced_protocol.py:270-288: 512-byte chunks gated on text markers. */
  def fallbackTextParsing(data: Array[Byte]): Seq[TradingPair] = {
    val out = Seq.newBuilder[TradingPair]
    var i = 0
    while (i < data.length) {
      val chunk = java.util.Arrays.copyOfRange(data, i, math.min(i + 512, data.length))
      val p = Wire.printable(chunk)
      if (p.contains("solana") || p.contains("pump") || p.contains("raydium"))
        LegacyDecoder.decodePairFromText(chunk).foreach(out += _)
      i += 512
    }
    out.result()
  }
}
