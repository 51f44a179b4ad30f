package graft.ext

/** Minimal REAL image codecs for the multimodal column operators: BMP
  * (BITMAPINFOHEADER, 24-bit uncompressed — the simplest widely-written
  * public raster format) and PPM P6 (the classic portable pixmap). These
  * replace the round-2 pixel stub for actual image payloads — the decode
  * path (headers, bottom-up rows, 4-byte row padding, BGR order, integer
  * luma) is genuinely exercised by the oracle-gated perceptual-hash
  * query: any misread byte changes the hash and fails the gate.
  *
  * Everything is exact integer arithmetic (luma, nearest resize, mean,
  * bit thresholds), so a SQL oracle reproduces every value bit-for-bit.
  */
object ImageCodec {

  /** Decoded raster: grayscale plane, row-major top-down. */
  final case class Image(width: Int, height: Int, gray: Array[Int])

  /** Integer luma (ITU-R 601 coefficients ×1000, truncating division) —
    * for r=g=b the result is exactly the channel value.
    */
  def luma(r: Int, g: Int, b: Int): Int = (r * 299 + g * 587 + b * 114) / 1000

  // ---- BMP (24bpp, BITMAPINFOHEADER, no compression) -----------------

  private def u16(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
  private def i32(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) | ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)

  /** Encode a 24-bit BMP: rows bottom-up, BGR, each row padded to 4 B. */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel data offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, no palette
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Total-function BMP decode → grayscale (None on anything that is not
    * an uncompressed 24-bit BITMAPINFOHEADER file).
    */
  def decodeBmp(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = i32(bytes, 10)
    if (i32(bytes, 14) != 40) return None // header size
    val width = i32(bytes, 18)
    val height = i32(bytes, 22)
    if (width <= 0 || height <= 0 || u16(bytes, 28) != 24 || i32(bytes, 30) != 0)
      return None
    val rowBytes = (width * 3 + 3) / 4 * 4
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * height > bytes.length)
      return None
    val gray = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowStart = dataOffset + (height - 1 - y) * rowBytes // stored bottom-up
      var x = 0
      while (x < width) {
        val o = rowStart + x * 3
        gray(y * width + x) =
          luma(bytes(o + 2) & 0xff, bytes(o + 1) & 0xff, bytes(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Image(width, height, gray))
  }

  // ---- PPM P6 ---------------------------------------------------------

  def encodePpm(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val data = new Array[Byte](width * height * 3)
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        data(i) = r.toByte; data(i + 1) = g.toByte; data(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    header ++ data
  }

  /** P6 decode (maxval 255, single-whitespace separators as written by
    * [[encodePpm]] and most tools; comments unsupported → None).
    */
  def decodePpm(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 9) return None
    if (bytes(0) != 'P' || bytes(1) != '6') return None
    // parse up to 3 whitespace-separated ints after the magic
    var pos = 2
    val fields = new Array[Int](3)
    var fi = 0
    while (fi < 3) {
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (!any) return None
      fields(fi) = v.toInt
      fi += 1
    }
    val Array(width, height, maxval) = fields
    if (width <= 0 || height <= 0 || maxval != 255) return None
    pos += 1 // single whitespace after maxval
    if (pos.toLong + width.toLong * height * 3 > bytes.length) return None
    val gray = new Array[Int](width * height)
    var p = 0
    while (p < width * height) {
      val o = pos + p * 3
      gray(p) = luma(bytes(o) & 0xff, bytes(o + 1) & 0xff, bytes(o + 2) & 0xff)
      p += 1
    }
    Some(Image(width, height, gray))
  }

  /** Sniff magic bytes and decode whichever public format matches. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else None
  }

  // ---- Perceptual hashes ----------------------------------------------

  /** aHash: nearest-resize to 8×8 (same integer index map as
    * MultimodalOps.resizeNearest), integer mean, bit (y·8+x) set when the
    * pixel EXCEEDS the mean. Shift-tolerant near-duplicate signature.
    */
  def aHash(img: Image): Long = {
    val px = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val srcY = y * img.height / 8
      var x = 0
      while (x < 8) {
        val srcX = x * img.width / 8
        px(y * 8 + x) = img.gray(srcY * img.width + srcX)
        x += 1
      }
      y += 1
    }
    var sum = 0L
    px.foreach(sum += _)
    val mean = sum / 64
    var h = 0L
    var i = 0
    while (i < 64) { if (px(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** dHash: 9×8 nearest-resize, bit set when the right neighbour exceeds
    * the left — gradient-based, robust to global brightness shifts.
    */
  def dHash(img: Image): Long = {
    val px = Array.tabulate(8, 9) { (y, x) =>
      img.gray((y * img.height / 8) * img.width + (x * img.width / 9))
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (px(y)(x + 1) > px(y)(x)) h |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    h
  }
}
