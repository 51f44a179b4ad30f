package graft.ext

/** Minimal REAL audio codec for the multimodal column operators: RIFF
  * WAVE, PCM 16-bit mono little-endian — the simplest widely-written
  * public audio container. Companion to [[ImageCodec]]: the decode path
  * (RIFF framing, chunk walk, fmt validation, LE sample extraction) is
  * genuinely exercised by the oracle-gated audio-features query — any
  * misread byte shifts a sample and fails the hash gate.
  *
  * Feature extraction downstream is exact integer arithmetic (energy as
  * Σx², zero-crossing counts, peak |x|), so a SQL oracle reproduces
  * every value bit-for-bit.
  */
object AudioCodec {

  /** Decoded clip: PCM16 mono samples at `sampleRate` Hz. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode PCM16 mono as canonical RIFF/WAVE (44-byte header). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def i32(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) | ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
  private def u16(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
  private def tag(a: Array[Byte], o: Int): String =
    new String(a, o, 4, "US-ASCII")

  /** Total-function WAVE decode (None on anything that is not PCM16
    * mono). Walks the chunk list properly — fmt and data may be separated
    * by LIST/fact/etc. chunks, and odd-sized chunks carry a pad byte
    * (RIFF rule) — so files from real encoders decode too, not just
    * [[encodeWav]] output.
    */
  def decodeWav(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = tag(bytes, pos)
      val size = i32(bytes, pos + 4)
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmt = u16(bytes, pos + 8)
          val channels = u16(bytes, pos + 10)
          val bits = u16(bytes, pos + 22)
          if (fmt != 1 || channels != 1 || bits != 16) return None
          sampleRate = i32(bytes, pos + 12)
          if (sampleRate <= 0) return None
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = u16(bytes, pos + 8 + i * 2).toShort
            i += 1
          }
          samples = out
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // odd chunks are padded
    }
    if (sampleRate > 0 && samples != null) Some(Audio(sampleRate, samples))
    else None
  }
}
