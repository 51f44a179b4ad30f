package graft

import graft.ext.AudioCodec
import org.scalatest.funsuite.AnyFunSuite

/** WAV codec: encode/decode identity, RIFF chunk-walk robustness, and
  * total-function rejection of non-PCM16-mono input.
  */
class AudioSpec extends AnyFunSuite {

  private val tone: Array[Short] =
    Array.tabulate(300)(i => ((i * i * 7 + i * 13) % 4096 - 2048).toShort)

  test("encodeWav/decodeWav roundtrip PCM16 mono, including extremes") {
    val samples = tone ++ Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1)
    val audio = AudioCodec.decodeWav(AudioCodec.encodeWav(44100, samples))
      .getOrElse(fail("decode failed"))
    assert(audio.sampleRate == 44100)
    assert(audio.samples.toSeq == samples.toSeq)
  }

  test("decodeWav walks unknown chunks (LIST before data, odd size padded)") {
    val wav = AudioCodec.encodeWav(8000, tone)
    // splice an odd-sized junk chunk between fmt (ends at 36) and data
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "abcde".getBytes("US-ASCII") ++ Array[Byte](0) // pad
    val spliced = wav.slice(0, 36) ++ junk ++ wav.slice(36, wav.length)
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val audio = AudioCodec.decodeWav(spliced).getOrElse(fail("chunk walk failed"))
    assert(audio.sampleRate == 8000)
    assert(audio.samples.toSeq == tone.toSeq)
  }

  test("decodeWav is total: rejects malformed input") {
    val good = AudioCodec.encodeWav(8000, tone)
    assert(AudioCodec.decodeWav(null).isEmpty)
    assert(AudioCodec.decodeWav(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.decodeWav("not a wav at all, nope".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(AudioCodec.decodeWav(good.slice(0, 30)).isEmpty) // truncated header
    val stereo = good.clone(); stereo(22) = 2 // channels field
    assert(AudioCodec.decodeWav(stereo).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8 // bits per sample
    assert(AudioCodec.decodeWav(eightBit).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3 // format tag (IEEE float)
    assert(AudioCodec.decodeWav(nonPcm).isEmpty)
    val lying = good.clone(); lying(42) = 0x7f // data size beyond EOF
    assert(AudioCodec.decodeWav(lying).isEmpty)
  }

  test("q40 fixture samples roundtrip through the codec bit-exact") {
    val samples = Array.tabulate(256)(i => graft.queries.MediaPack.audioSample(7L, i))
    val audio = AudioCodec.decodeWav(AudioCodec.encodeWav(8000, samples)).get
    assert(audio.samples.toSeq == samples.toSeq)
    // the waveform actually crosses zero (the ZCR feature is non-trivial)
    assert(samples.sliding(2).exists { case Array(a, b) => (a < 0) != (b < 0) })
  }
}
