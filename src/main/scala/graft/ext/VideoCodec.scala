package graft.ext

/** Minimal REAL video codec for the multimodal column operators: Y4M
  * (YUV4MPEG2), the classic uncompressed public interchange format —
  * an ASCII stream header (`YUV4MPEG2 W… H… F… …\n`) followed by
  * `FRAME\n`-delimited raw planes. The `Cmono` colorspace (luma-only
  * planes) keeps the oracle arithmetic exact without chroma subsampling.
  *
  * Completes the modality triple next to [[ImageCodec]] (BMP/PPM) and
  * [[AudioCodec]] (RIFF/WAVE): the decode path (header token parse,
  * frame marker walk, per-frame parameter skip, plane extraction) is
  * genuinely exercised by the oracle-gated scene-detection query.
  */
object VideoCodec {

  /** Decoded clip: luma planes (0..255, row-major top-down) per frame. */
  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Array[Array[Int]])

  /** Encode luma-only Y4M (`Cmono`): stream header then FRAME + plane. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val header = s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
      .getBytes("US-ASCII")
    val frameMarker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (frameMarker.length + width * height))
    out.write(header)
    frames.foreach { luma =>
      out.write(frameMarker)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out.write(luma(x, y) & 0xff); x += 1 }
        y += 1
      }
    }
    out.toByteArray
  }

  /** Total-function Y4M decode (luma-only `Cmono` streams; None on
    * anything else). Header tokens beyond W/H/F/C are skipped; per-frame
    * parameters after `FRAME` (allowed by the format) are skipped to the
    * newline.
    */
  def decodeY4m(bytes: Array[Byte]): Option[Video] = {
    if (bytes == null || bytes.length < 10) return None
    val magic = "YUV4MPEG2"
    if (!magic.getBytes("US-ASCII").indices.forall(i => bytes(i) == magic(i).toByte))
      return None
    var pos = magic.length
    var width = -1
    var height = -1
    var fpsNum = 25
    var fpsDen = 1
    var mono = false
    // stream header: space-separated tagged tokens up to the newline
    while (pos < bytes.length && bytes(pos) != '\n') {
      if (bytes(pos) == ' ') { pos += 1 }
      else {
        val start = pos
        while (pos < bytes.length && bytes(pos) != ' ' && bytes(pos) != '\n') pos += 1
        val tok = new String(bytes, start, pos - start, "US-ASCII")
        tok.charAt(0) match {
          case 'W' => width = tok.drop(1).toIntOption.getOrElse(return None)
          case 'H' => height = tok.drop(1).toIntOption.getOrElse(return None)
          case 'F' => tok.drop(1).split(':') match {
            case Array(n, d) =>
              fpsNum = n.toIntOption.getOrElse(return None)
              fpsDen = d.toIntOption.getOrElse(return None)
            case _ => return None
          }
          case 'C' => mono = tok == "Cmono"
          case _ => () // Ip/A../X.. metadata: skipped
        }
      }
    }
    if (pos >= bytes.length || width <= 0 || height <= 0 || !mono) return None
    pos += 1 // consume header newline
    val planeSize = width * height
    val frames = Array.newBuilder[Array[Int]]
    val marker = "FRAME"
    while (pos < bytes.length) {
      if (pos + marker.length > bytes.length ||
          !marker.indices.forall(i => bytes(pos + i) == marker(i).toByte)) return None
      pos += marker.length
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1 // frame params
      if (pos >= bytes.length) return None
      pos += 1
      if (pos + planeSize > bytes.length) return None
      val plane = new Array[Int](planeSize)
      var i = 0
      while (i < planeSize) { plane(i) = bytes(pos + i) & 0xff; i += 1 }
      frames += plane
      pos += planeSize
    }
    Some(Video(width, height, fpsNum, fpsDen, frames.result()))
  }
}
