package graft

import graft.ext.VideoCodec
import org.scalatest.funsuite.AnyFunSuite

/** Y4M codec: encode/decode identity, header/frame-parameter tolerance,
  * and total-function rejection of malformed streams.
  */
class VideoSpec extends AnyFunSuite {

  private def gen(f: Int)(x: Int, y: Int): Int = (f * 31 + x * 7 + y * 11) % 256

  test("encodeY4m/decodeY4m roundtrip luma planes and stream parameters") {
    val y4m = VideoCodec.encodeY4m(16, 8, 30, 1, (0 until 4).map(f => gen(f) _))
    val v = VideoCodec.decodeY4m(y4m).getOrElse(fail("decode failed"))
    assert(v.width == 16 && v.height == 8 && v.fpsNum == 30 && v.fpsDen == 1)
    assert(v.frames.length == 4)
    for (f <- 0 until 4; y <- 0 until 8; x <- 0 until 16)
      assert(v.frames(f)(y * 16 + x) == gen(f)(x, y), s"f=$f x=$x y=$y")
  }

  test("decodeY4m skips unknown header tokens and per-frame parameters") {
    val base = VideoCodec.encodeY4m(4, 2, 25, 1, Seq(gen(0) _))
    val s = new String(base, "ISO-8859-1")
    // extension token in the stream header + parameters after FRAME
    val tweaked = s
      .replace(" Cmono\n", " Cmono Xcustom=1\n")
      .replace("FRAME\n", "FRAME Ipt\n")
      .getBytes("ISO-8859-1")
    val v = VideoCodec.decodeY4m(tweaked).getOrElse(fail("tolerant parse failed"))
    assert(v.frames.length == 1 && v.frames(0).toSeq ==
      (for (y <- 0 until 2; x <- 0 until 4) yield gen(0)(x, y)))
  }

  test("decodeY4m is total: rejects malformed streams") {
    val good = VideoCodec.encodeY4m(4, 2, 25, 1, Seq(gen(0) _))
    assert(VideoCodec.decodeY4m(null).isEmpty)
    assert(VideoCodec.decodeY4m("MPEG2 not really".getBytes).isEmpty)
    assert(VideoCodec.decodeY4m(good.slice(0, good.length - 3)).isEmpty) // short plane
    val chroma = new String(good, "ISO-8859-1").replace("Cmono", "C420").getBytes("ISO-8859-1")
    assert(VideoCodec.decodeY4m(chroma).isEmpty) // subsampled chroma unsupported
    val badMarker = good.clone()
    val frameAt = new String(good, "ISO-8859-1").indexOf("FRAME")
    badMarker(frameAt) = 'X'
    assert(VideoCodec.decodeY4m(badMarker).isEmpty)
  }

  test("q41 fixture: the planted cut produces exactly one large-SAD transition per clip") {
    val c = 42L
    val cut = (2 + c % 5).toInt
    val frames = (0 until 8).map(f =>
      (for (y <- 0 until 8; x <- 0 until 16)
        yield graft.queries.MediaPack.videoPixel(c, f, x, y).toLong).toArray)
    val sads = (1 until 8).map(f =>
      frames(f).zip(frames(f - 1)).map { case (a, b) => math.abs(a - b) }.sum)
    val big = sads.zipWithIndex.collect { case (s, i) if s > 6000 => i + 1 }
    assert(big == Seq(cut), s"sads=$sads cut=$cut")
  }
}
