package graft

import graft.ext.ImageCodec
import graft.ext.ImageCodec.Image
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec goldens: BMP/PPM roundtrips (incl. the 4-byte row-padding
  * width), luma arithmetic, perceptual hashes, totality on garbage.
  */
class ImageSpec extends AnyFunSuite {

  private def gradient(x: Int, y: Int): (Int, Int, Int) =
    ((x * 40) % 256, (y * 60) % 256, (x + y) % 256)

  test("BMP encode/decode roundtrip recovers integer luma (padded width)") {
    for ((w, h) <- Seq((15, 10), (16, 16), (1, 1), (3, 5))) {
      val bytes = ImageCodec.encodeBmp(w, h, gradient)
      // 24bpp rows pad to 4 bytes: total size must reflect it
      assert(bytes.length == 54 + (w * 3 + 3) / 4 * 4 * h)
      val img = ImageCodec.decodeBmp(bytes).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = gradient(x, y)
        assert(img.gray(y * w + x) == ImageCodec.luma(r, g, b), s"($x,$y) of ${w}x$h")
      }
    }
  }

  test("PPM P6 roundtrip matches BMP decode of the same image") {
    val ppm = ImageCodec.decodePpm(ImageCodec.encodePpm(15, 10, gradient)).get
    val bmp = ImageCodec.decodeBmp(ImageCodec.encodeBmp(15, 10, gradient)).get
    assert(ppm.gray.toSeq == bmp.gray.toSeq)
    // sniffing dispatch picks the right codec
    assert(ImageCodec.decode(ImageCodec.encodePpm(4, 4, gradient)).isDefined)
  }

  test("decoders are total on garbage and wrong variants") {
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.decodeBmp("BMxxxx".getBytes).isEmpty)
    assert(ImageCodec.decodePpm("P6\n4 4\n65535\n".getBytes).isEmpty) // 16-bit maxval
    val truncated = ImageCodec.encodeBmp(8, 8, gradient).take(80)
    assert(ImageCodec.decodeBmp(truncated).isEmpty)
    // 8bpp header variant rejected (only 24bpp supported)
    val bmp = ImageCodec.encodeBmp(4, 4, gradient)
    bmp(28) = 8
    assert(ImageCodec.decodeBmp(bmp).isEmpty)
  }

  test("luma of equal channels is the channel; BGR order is observable") {
    assert(ImageCodec.luma(200, 200, 200) == 200)
    assert(ImageCodec.luma(0, 0, 0) == 0)
    // swapped r/b changes luma (different weights) — decode-order bugs show
    assert(ImageCodec.luma(255, 0, 0) != ImageCodec.luma(0, 0, 255))
    assert(ImageCodec.luma(255, 0, 0) == 76 && ImageCodec.luma(0, 0, 255) == 29)
  }

  test("aHash: flat image hashes 0, half-bright sets exactly the bright half") {
    val flat = Image(8, 8, Array.fill(64)(100))
    assert(ImageCodec.aHash(flat) == 0L) // nothing exceeds the mean
    val half = Image(8, 8, Array.tabulate(64)(i => if (i < 32) 0 else 200))
    val h = ImageCodec.aHash(half) // mean=100 → top half set
    assert(java.lang.Long.bitCount(h) == 32 && (h >>> 32) == 0xffffffffL)
  }

  test("aHash near-dup tolerance and dHash brightness invariance") {
    def img(perturb: Boolean) = {
      val bmp = ImageCodec.encodeBmp(15, 10, (x, y) =>
        if (perturb && x == 1 && y == 1) ((x * 40 + 96) % 256, (y * 60) % 256, (x + y) % 256)
        else gradient(x, y))
      ImageCodec.decodeBmp(bmp).get
    }
    val d = java.lang.Long.bitCount(ImageCodec.aHash(img(false)) ^ ImageCodec.aHash(img(true)))
    assert(d <= 8, s"perturbed pair at hamming $d")
    // dHash ignores a global brightness shift entirely
    val base = Image(8, 8, Array.tabulate(64)(i => i * 3))
    val brighter = Image(8, 8, base.gray.map(_ + 40))
    assert(ImageCodec.dHash(base) == ImageCodec.dHash(brighter))
    assert(ImageCodec.dHash(base) != 0L)
  }
}
