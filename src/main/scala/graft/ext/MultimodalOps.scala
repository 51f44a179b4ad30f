package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column operators for training-data
  * pipelines: opaque `binary` payload columns carrying a typed metadata
  * header, processed with two complementary mechanisms —
  *
  *   - **offset plumbing as column expressions** (`substring` on binary is
  *     codegen'd): header slicing, frame sampling, payload extraction stay
  *     inside whole-stage codegen and shuffle nothing;
  *   - **byte-level tensor work as typed `mapPartitions` batches** (the
  *     JVM analog of Arrow-batch UDFs): one iterator pass per partition,
  *     bounded per-row state, no driver involvement — the shape that
  *     scales to 100 TB of media because each executor touches only its
  *     own partitions' bytes.
  *
  * Codec note: [[decodePixels]] carries REAL decoders for the public
  * raster formats ([[ImageCodec]]: 24-bit BMP and PPM P6 → integer-luma
  * grayscale, oracle-gated through the q37 perceptual-hash query). For
  * payloads in no recognized format (e.g. the GRFM synthetic cells) it
  * falls back to [[decodePixelsStub]], the round-2 identity-over-bytes
  * fake — a production deployment adds further codecs (JPEG/PNG via JNI)
  * behind the same sniffing dispatch.
  */
object MultimodalOps {

  /** 16-byte media header: magic "GRFM", version, kind code, then
    * width/height/channels as unsigned LE shorts + 4 reserved bytes.
    */
  val Magic: Array[Byte] = "GRFM".getBytes("UTF-8")
  val HeaderLen = 16
  val Kinds: Seq[String] = Seq("image", "audio", "video")

  final case class MediaMeta(kind: String, width: Int, height: Int, channels: Int)
  final case class MediaCell(key: Long, media: Array[Byte])
  final case class MediaStats(key: Long, kind: String, width: Int, height: Int,
      channels: Int, n_bytes: Int, byte_sum: Long, count_a: Long)

  /** [[MediaStats]] plus the raw payload, for single-pass pipelines that
    * need stats AND downstream column-expression work on the same bytes
    * without a key self-join (a self-join assumes key uniqueness the
    * input never promised, and at scale costs a full shuffle of the
    * media bytes on both sides).
    */
  final case class MediaStatsCell(key: Long, kind: String, width: Int,
      height: Int, channels: Int, n_bytes: Int, byte_sum: Long,
      count_a: Long, media: Array[Byte])

  def encodeHeader(meta: MediaMeta): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(HeaderLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(Kinds.indexOf(meta.kind).toByte)
      .putShort(meta.width.toShort).putShort(meta.height.toShort)
      .putShort(meta.channels.toShort)
    buf.array()
  }

  /** Total-function header parse (None on short/garbled input). */
  def parseHeader(media: Array[Byte]): Option[MediaMeta] = {
    if (media == null || media.length < HeaderLen) return None
    if (!media.take(4).sameElements(Magic)) return None
    val buf = java.nio.ByteBuffer.wrap(media, 4, 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.get() // version
    val kindCode = buf.get().toInt
    if (kindCode < 0 || kindCode >= Kinds.length) return None
    Some(MediaMeta(Kinds(kindCode),
      buf.getShort() & 0xffff, buf.getShort() & 0xffff, buf.getShort() & 0xffff))
  }

  /** Payload (codec bytes) after the header — codegen'd binary slice. */
  def payload(media: Column): Column =
    substring(media, HeaderLen + 1, Int.MaxValue)

  /** Sample every `step`-th frame of `frameSize` bytes from the payload —
    * pure column arithmetic (sequence + transform + substring), no UDF:
    * the sampling plan is a narrow projection at any scale.
    */
  def frameSamples(media: Column, nBytes: Int, frameSize: Int, step: Int): Column = {
    val nFrames = (nBytes - HeaderLen) / frameSize
    val idx = sequence(lit(0), lit(math.max(0, nFrames - 1)), lit(step))
    transform(idx, i => substring(media, i * frameSize + (HeaderLen + 1), lit(frameSize)))
  }

  /** Codec dispatch: recognized public raster formats decode for real
    * (BMP/PPM → grayscale); anything else falls back to the byte stub so
    * the operator stays total. The sniff runs on the PAYLOAD — a media
    * value is [GRFM header][codec bytes], so the magic bytes live after
    * [[HeaderLen]], never at offset 0. Everything downstream (histogram,
    * resize, hashing) is codec-agnostic.
    */
  def decodePixels(media: Array[Byte]): Array[Int] = {
    if (media == null || media.length <= HeaderLen) return Array.empty
    val codecBytes = java.util.Arrays.copyOfRange(media, HeaderLen, media.length)
    ImageCodec.decode(codecBytes).map(_.gray).getOrElse(decodePixelsStub(media))
  }

  /** DETERMINISTIC-FAKE fallback for unrecognized codecs: "pixels" are
    * the raw payload bytes (unsigned) after the GRFM header.
    */
  def decodePixelsStub(media: Array[Byte]): Array[Int] = {
    if (media == null || media.length <= HeaderLen) return Array.empty
    val out = new Array[Int](media.length - HeaderLen)
    var i = HeaderLen
    while (i < media.length) { out(i - HeaderLen) = media(i) & 0xff; i += 1 }
    out
  }

  /** Nearest-neighbor resize index mapping over a row-major (h, w) plane:
    * real arithmetic over the stub pixels — swap the pixel source, keep
    * the math.
    */
  def resizeNearest(pixels: Array[Int], w: Int, h: Int, newW: Int, newH: Int): Array[Int] = {
    if (w <= 0 || h <= 0 || newW <= 0 || newH <= 0) return Array.empty
    val out = new Array[Int](newW * newH)
    var y = 0
    while (y < newH) {
      val srcY = y * h / newH
      var x = 0
      while (x < newW) {
        val srcX = x * w / newW
        val idx = srcY * w + srcX
        out(y * newW + x) = if (idx < pixels.length) pixels(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-cell byte statistics via a typed `mapPartitions` batch pass —
    * the Arrow-batch shape: one sequential scan per partition, O(1) state
    * per row, exact integer outputs (bit-reproducible anywhere).
    */
  def mediaStats(cells: Dataset[MediaCell]): Dataset[MediaStats] = {
    implicit val enc: Encoder[MediaStats] = Encoders.product[MediaStats]
    cells.mapPartitions(_.map(statsOf))
  }

  /** The one per-cell stats kernel both batch passes share — a second
    * copy of this loop drifting from the first was the risk class the
    * q29 rewrite introduced. */
  private def statsOf(cell: MediaCell): MediaStats = {
    val meta = parseHeader(cell.media).getOrElse(MediaMeta("unknown", 0, 0, 0))
    var sum = 0L
    var countA = 0L
    var i = HeaderLen
    while (i < cell.media.length) {
      val b = cell.media(i) & 0xff
      sum += b
      if (b == 'a'.toInt) countA += 1
      i += 1
    }
    MediaStats(cell.key, meta.kind, meta.width, meta.height, meta.channels,
      cell.media.length, sum, countA)
  }

  /** Row-wise stats with the media bytes carried through, so callers can
    * apply column expressions (frame slicing, header fields) on the same
    * row without re-joining on `key`. Exactly one output row per input
    * row regardless of key duplication — the divergence class behind the
    * round-12 q29 10x-oracle failure (a `stats.join(frames, "key")`
    * squares duplicate keys while a row-wise oracle does not).
    */
  def mediaStatsWithMedia(cells: Dataset[MediaCell]): Dataset[MediaStatsCell] = {
    implicit val enc: Encoder[MediaStatsCell] = Encoders.product[MediaStatsCell]
    cells.mapPartitions(_.map { cell =>
      val s = statsOf(cell)
      MediaStatsCell(s.key, s.kind, s.width, s.height, s.channels,
        s.n_bytes, s.byte_sum, s.count_a, cell.media)
    })
  }

  /** Full 256-bin byte histogram per cell (exact ints), same batch shape. */
  def byteHistogram(cells: Dataset[MediaCell]): Dataset[(Long, Array[Long])] = {
    implicit val enc: Encoder[(Long, Array[Long])] =
      Encoders.tuple(Encoders.scalaLong, ExprEnc.longArray)
    cells.mapPartitions { it =>
      it.map { cell =>
        val bins = new Array[Long](256)
        var i = HeaderLen
        while (i < cell.media.length) { bins(cell.media(i) & 0xff) += 1; i += 1 }
        (cell.key, bins)
      }
    }
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
