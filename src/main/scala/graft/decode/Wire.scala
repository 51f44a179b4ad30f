package graft.decode

import java.nio.{ByteBuffer, ByteOrder}

/** Wire-format helpers shared by the decoders and the test-fixture encoder
  * (reference frame structure: dexscraper/protocol.py:362-390,
  * scraper.py:257-273 and FIXTURES.md §A4).
  *
  * Frame = preamble `\x00\n1.3.0\n` + `pairs` marker + 4 header bytes +
  * records. A record = 6 length-prefixed UTF-8 strings + zero padding to
  * an 8-byte boundary + 8 little-endian float64 metrics.
  */
object Wire {
  val Preamble: Array[Byte] = Array[Byte](0x00, '\n') ++ "1.3.0\n".getBytes("UTF-8")
  val PairsMarker: Array[Byte] = "pairs".getBytes("UTF-8")
  /** Legacy parser skips marker + 4 header bytes (protocol.py:381-390). */
  val LegacyHeaderSkip = 9
  /** Enhanced parser skips 17 (enhanced_protocol.py:31). */
  val EnhancedHeaderSkip = 17
  /** Token extractor skips 20 (scraper.py:271). */
  val DeepHeaderSkip = 20

  /** One record in the reference's binary pair layout. */
  final case class WireRecord(strings: Seq[String], metrics: Array[Double]) {
    require(strings.length == 6, "6 length-prefixed strings")
    require(metrics.length == 8, "8 float64 metrics")
  }

  /** Serialize one record (strings + alignment padding + 8 doubles). */
  def encodeRecord(r: WireRecord): Array[Byte] = {
    val strBytes = r.strings.map(_.getBytes("UTF-8"))
    val strLen = strBytes.map(_.length + 1).sum
    val aligned = (strLen + 7) & ~7
    val buf = ByteBuffer.allocate(aligned + 64).order(ByteOrder.LITTLE_ENDIAN)
    strBytes.foreach { b =>
      require(b.length <= 200, "field max 200 bytes")
      buf.put(b.length.toByte)
      buf.put(b)
    }
    buf.position(aligned)
    r.metrics.foreach(buf.putDouble)
    buf.array()
  }

  /** Build a frame with each record padded into a fixed `chunkSize` slot
    * starting right after the header (the layout the adaptive chunk scan
    * D3 discovers), plus a zero tail so the final slot is scanned.
    */
  def encodeFrame(records: Seq[WireRecord], chunkSize: Int = 512): Array[Byte] = {
    // One preallocated frame buffer, records written in place. The old
    // `Preamble ++ ... ++ body.flatten ++ ...` built the body as a
    // Seq[Byte] — boxing every payload byte and copying the frame twice;
    // at 600 k records that churned ~10^8 boxed bytes in the q11 encode
    // harness. Bytes are identical: the slot tail past each record and
    // the final slot stay zero exactly as Arrays.copyOf left them.
    val headerPad = Array[Byte](0x01, 0x02, 0x03, 0x04)
    val headLen = Preamble.length + PairsMarker.length + headerPad.length
    val out = new Array[Byte](headLen + (records.length + 1) * chunkSize)
    System.arraycopy(Preamble, 0, out, 0, Preamble.length)
    System.arraycopy(PairsMarker, 0, out, Preamble.length, PairsMarker.length)
    System.arraycopy(headerPad, 0, out,
      Preamble.length + PairsMarker.length, headerPad.length)
    var slot = 0
    records.foreach { r =>
      val enc = encodeRecord(r)
      require(enc.length <= chunkSize, s"record ${enc.length}B > chunk $chunkSize")
      System.arraycopy(enc, 0, out, headLen + slot * chunkSize, enc.length)
      slot += 1
    }
    out
  }

  /** The reference's printable projection (scraper.py:316 etc.):
    * bytes in [32,126] keep their char, everything else becomes a space.
    */
  def printable(data: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(data.length)
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      sb.append(if (b >= 32 && b <= 126) b.toChar else ' ')
      i += 1
    }
    sb.toString
  }

  /** One-pass byte-scan equivalent of the decode router's marker test
    * `printable(chunk).contains("solana") || lower.contains("pump") ||
    * lower.contains("raydium")` (protocol.py:84-90). The patterns are
    * pure ASCII letters: the printable projection keeps those bytes
    * verbatim and maps every other byte to ' ' (which can never match a
    * letter), and `|0x20` ASCII case-folding maps exactly {letter,
    * LETTER} onto the lowercase pattern bytes — high-bit bytes stay
    * negative and match nothing. So scanning the raw bytes is exact,
    * with none of the 2×chunk-length string allocation per probe.
    */
  def hasTextMarker(data: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val b = data(i)
      if (b == 's' && i + 6 <= until &&
        data(i + 1) == 'o' && data(i + 2) == 'l' && data(i + 3) == 'a' &&
        data(i + 4) == 'n' && data(i + 5) == 'a') return true
      val lb = b | 0x20
      if (lb == 'p' && i + 4 <= until &&
        (data(i + 1) | 0x20) == 'u' && (data(i + 2) | 0x20) == 'm' &&
        (data(i + 3) | 0x20) == 'p') return true
      if (lb == 'r' && i + 7 <= until &&
        (data(i + 1) | 0x20) == 'a' && (data(i + 2) | 0x20) == 'y' &&
        (data(i + 3) | 0x20) == 'd' && (data(i + 4) | 0x20) == 'i' &&
        (data(i + 5) | 0x20) == 'u' && (data(i + 6) | 0x20) == 'm') return true
      i += 1
    }
    false
  }

  /** JVM mirror of the `clean_string` column function (protocol.py:23-39). */
  def cleanString(s: String): String = {
    if (s == null || s.isEmpty) return ""
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 32 && c < 127) || c == 9) sb.append(c)
      i += 1
    }
    val cleaned = sb.toString
    if (cleaned.contains("@") || cleaned.contains("\\"))
      cleaned.split("@", -1)(0).split("\\\\", -1)(0)
    else cleaned.strip()
  }

  /** `handle_double` (protocol.py:13-20): NaN/Inf → 0.0. */
  def handleDouble(v: Double): Double =
    if (v.isNaN || v.isInfinite) 0.0 else v

  // Manual little-endian assembly: the decode hot loops read at stride 1
  // (millions of reads per frame batch), so a ByteBuffer wrapper per read
  // would dominate allocation. Bit-identical to the ByteBuffer forms.
  private def readIntLE(data: Array[Byte], pos: Int): Int =
    (data(pos) & 0xff) | ((data(pos + 1) & 0xff) << 8) |
      ((data(pos + 2) & 0xff) << 16) | ((data(pos + 3) & 0xff) << 24)

  def readDoubleLE(data: Array[Byte], pos: Int): Double =
    java.lang.Double.longBitsToDouble(
      (readIntLE(data, pos) & 0xffffffffL) | (readIntLE(data, pos + 4).toLong << 32))

  def readFloatLE(data: Array[Byte], pos: Int): Float =
    java.lang.Float.intBitsToFloat(readIntLE(data, pos))

  def readUInt32LE(data: Array[Byte], pos: Int): Long =
    readIntLE(data, pos).toLong & 0xffffffffL

  def indexOf(haystack: Array[Byte], needle: Array[Byte]): Int = {
    if (needle.isEmpty) return 0
    var i = 0
    while (i <= haystack.length - needle.length) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
