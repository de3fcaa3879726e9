package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Real image decode/resize through JDK ImageIO: fixtures are generated
  * in-test (deterministic gradient), encoded as PNG/BMP/JPEG, and run
  * through the full Dataset plumbing. */
class MultimodalImageSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Deterministic RGB gradient image encoded with the given ImageIO format. */
  private def fixture(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / math.max(w - 1, 1)) << 16) | ((y * 255 / math.max(h - 1, 1)) << 8) | 0x40)
    val baos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, baos), s"JDK cannot encode $format")
    baos.toByteArray
  }

  test("decode reports true dimensions for PNG, BMP and JPEG bytes") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", fixture(64, 48, "png"), "fx"),
      MediaRow(2L, "image", fixture(31, 77, "bmp"), "fx"),
      MediaRow(3L, "image", fixture(128, 16, "jpg"), "fx"),
      MediaRow(4L, "image", "not an image".getBytes("UTF-8"), "fx"), // stub fallback
      MediaRow(5L, "audio", fixture(8, 8, "png"), "fx")).toDS()     // kind gates decode
    val d = Multimodal.decode(media).collect().map(r => r.media_id -> r).toMap
    assert((d(1L).width, d(1L).height) == (64, 48))
    assert((d(2L).width, d(2L).height) == (31, 77))
    assert((d(3L).width, d(3L).height) == (128, 16))
    // feature is a normalized luminance histogram over real pixels
    assert(d(1L).feature.length == 8 && math.abs(d(1L).feature.sum - 1.0f) < 1e-3)
    // non-image bytes under kind=image fall back to the stub (no crash)
    assert(d(4L).width == 16 + ('n'.toInt & 0x3f))
    // audio rows never enter the image decoder
    assert(d(5L).n_frames > 1)
  }

  test("audio decode reports true sample rate / channels / frames for WAV bytes") {
    import spark.implicits._
    import javax.sound.sampled._
    // 440-sample deterministic 16-bit mono WAV at 8kHz, generated in-test
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](440 * 2)
    for (i <- 0 until 440) {
      val v = (math.sin(i * 0.2) * 1000).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 440), AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, "fx"),
      Multimodal.MediaRow(2L, "audio", "not audio".getBytes("UTF-8"), "fx"), // stub fallback
      Multimodal.MediaRow(3L, "image", wav, "fx")).toDS() // kind gates the decoder
    val d = Multimodal.decode(media).collect().map(r => r.media_id -> r).toMap
    assert(d(1L).width == 8000, "sample rate")     // width carries Hz
    assert(d(1L).height == 1, "channels")
    assert(d(1L).n_frames == 440, "PCM frames")
    assert(math.abs(d(1L).feature.sum - 1.0f) < 1e-3)
    assert(d(2L).n_frames == 1 + "not audio".getBytes("UTF-8").length / 16) // stub formula
    assert(d(3L).width == 16 + (wav(0) & 0x3f))     // image decode fails -> stub
  }

  test("resize scales to fit, preserves aspect, output decodes to claimed size") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", fixture(64, 48, "png"), "fx"),
      MediaRow(2L, "image", fixture(20, 10, "png"), "fx"),  // smaller than target: no upscale
      MediaRow(3L, "video", fixture(64, 48, "png"), "fx")). // non-image passes through
      toDS()
    val out = Multimodal.resize(media, 32, 32).collect().map(r => r.media_id -> r).toMap
    // 64x48 → fit in 32x32 → 32x24
    assert((out(1L).width, out(1L).height) == (32, 24))
    val redecoded = ImageIO.read(new java.io.ByteArrayInputStream(out(1L).content))
    assert((redecoded.getWidth, redecoded.getHeight) == (32, 24))
    // already fits: dimensions unchanged
    assert((out(2L).width, out(2L).height) == (20, 10))
    // non-image content bit-identical
    assert(out(3L).content.sameElements(fixture(64, 48, "png")))
    // deterministic re-encode
    val again = Multimodal.resize(media, 32, 32).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).content.sameElements(again(1L).content))
  }

  test("dHash: brightness shift stays perceptually near; a different pattern is far") {
    def pattern(w: Int, h: Int, shift: Int, invert: Boolean): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val base = if (invert) 255 - x * 255 / (w - 1) else x * 255 / (w - 1)
        val v = math.min(255, math.max(0, base + shift))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", baos))
      baos.toByteArray
    }
    def hamming(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val orig = Multimodal.dHashBands(pattern(96, 64, 0, invert = false)).get
    val bright = Multimodal.dHashBands(pattern(96, 64, 30, invert = false)).get
    val other = Multimodal.dHashBands(pattern(96, 64, 0, invert = true)).get
    // dHash is a difference hash: a uniform brightness shift preserves
    // the adjacent-pixel ordering, so the shifted copy stays within the
    // m07 near-dup threshold while the inverted gradient flips ~all bits
    assert(hamming(orig, bright) <= 6, s"shifted copy drifted: ${hamming(orig, bright)}")
    assert(hamming(orig, other) >= 32, s"inverted pattern too close: ${hamming(orig, other)}")
    // non-image bytes take the stub path (None here — the SQL branch owns it)
    assert(Multimodal.dHashBands("plain text".getBytes("UTF-8")).isEmpty)
  }
}
