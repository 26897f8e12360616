package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaCodec, Multimodal}

/** Real pure-JVM decode: BMP through javax.imageio, WAV through the
  * RIFF/PCM parser, resize through the raster pipeline. */
class MediaCodecSpec extends AnyFunSuite {

  test("solid BMP decodes to exact channel means via javax.imageio") {
    val bytes = MediaCodec.solidBmp(8, 6, 200, 50, 17)
    assert(MediaCodec.sniff(bytes) == "bmp")
    val s = MediaCodec.decodeImage(bytes).get
    assert(s.width == 8 && s.height == 6)
    assert(s.meanR == 200.0 && s.meanG == 50.0 && s.meanB == 17.0)
  }

  test("WAV sine decodes to expected rms/peak/zcr") {
    val sr = 8000
    val n = 8000
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 440 * i / sr) * 16384).toShort)
    val bytes = MediaCodec.pcm16Wav(sr, samples)
    assert(MediaCodec.sniff(bytes) == "wav")
    val s = MediaCodec.decodeWav(bytes).get
    assert(s.sampleRate == sr && s.channels == 1 && s.nSamples == n)
    // sine: rms = A/sqrt(2), A = 0.5
    assert(math.abs(s.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${s.rms}")
    assert(math.abs(s.peak - 0.5) < 0.01)
    // 440 Hz over 1 s → 880 crossings
    assert(math.abs(s.zeroCrossRate * (n - 1) - 880) < 4)
  }

  test("decodeFeatures tags formats and falls back on unknown bytes") {
    val img = Multimodal.decodeFeatures(MediaCodec.solidBmp(4, 4, 1, 2, 3))
    assert(img(0) == 1f && img(1) == 4f && img(2) == 4f)
    val wav = Multimodal.decodeFeatures(
      MediaCodec.pcm16Wav(44100, Array.fill(100)(0.toShort)))
    assert(wav(0) == 2f && wav(1) == 44100f)
    val txt = Multimodal.decodeFeatures("hello world".getBytes)
    assert(txt.length == 8 && txt(0) != 1f && txt(0) != 2f)
  }

  test("dHash: brightness-invariant, resize-robust, pattern-sensitive") {
    import graft.operators.{MediaCodec, Multimodal}
    val base = Multimodal.patternBmp(7, 0)
    val bright = Multimodal.patternBmp(7, 24)
    val other = Multimodal.patternBmp(8, 0)
    val h0 = MediaCodec.dHash(base).get
    assert(MediaCodec.dHash(bright).get == h0,
      "uniform un-clipped brightness shift preserves the hash exactly")
    val resized = MediaCodec.resizeImage(base, 64, 64).get
    val hr = MediaCodec.dHash(resized).get
    assert(java.lang.Long.bitCount(h0 ^ hr) <= 12,
      s"resize keeps the hash close (got ${java.lang.Long.bitCount(h0 ^ hr)})")
    val ho = MediaCodec.dHash(other).get
    assert(java.lang.Long.bitCount(h0 ^ ho) > 12,
      "different patterns land far apart")
  }

  test("audioFingerprint: gain-invariant, waveform-sensitive") {
    import graft.operators.{MediaCodec, Multimodal}
    val h1 = MediaCodec.audioFingerprint(Multimodal.patternWav(3, 1)).get
    val h5 = MediaCodec.audioFingerprint(Multimodal.patternWav(3, 5)).get
    assert(h1 == h5, "integer gain preserves energy-difference signs")
    val other = MediaCodec.audioFingerprint(Multimodal.patternWav(4, 1)).get
    assert(java.lang.Long.bitCount(h1 ^ other) > 12)
  }

  test("resizeImage really rescales through the raster pipeline") {
    val src = MediaCodec.solidBmp(16, 16, 10, 200, 30)
    val out = MediaCodec.resizeImage(src, 4, 4).get
    assert(MediaCodec.sniff(out) == "png")
    val s = MediaCodec.decodeImage(out).get
    assert(s.width == 4 && s.height == 4)
    // solid color survives bilinear resampling exactly
    assert(s.meanR == 10.0 && s.meanG == 200.0 && s.meanB == 30.0)
  }
}
