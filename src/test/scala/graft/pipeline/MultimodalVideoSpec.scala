package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, VideoContainers}
import graft.zeek.SharedSpark

/** Real video CONTAINER parsing against hand-assembled fixtures: a
  * minimal-but-valid MP4 (ftyp + moov with mvhd/tkhd/hdlr/stbl sample
  * tables + mdat) and a RIFF/AVI (hdrl avih + movi frame chunks), built
  * byte-by-byte in-test so the asserted dims/durations/frame bytes are
  * known ground truth rather than decoder echo. */
class MultimodalVideoSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // ---- byte builders ---------------------------------------------------
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ cc(typ) ++ body
  }

  /** 64x48, movie timescale 1000 / duration 2500 (2.5 s), 3 samples of
    * sizes 5/7/3 in one chunk starting right after the mdat header. */
  private def buildMp4(): (Array[Byte], Array[Array[Byte]]) = {
    val frames = Array(
      Array.fill(5)(0xa1.toByte), Array.fill(7)(0xb2.toByte), Array.fill(3)(0xc3.toByte))
    val ftyp = box("ftyp", cc("isom"), be32(512), cc("isomiso2"))
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0),    // creation, modification
      be32(1000),          // timescale
      be32(2500),          // duration → 2500 ms
      new Array[Byte](80)) // rate/volume/reserved/matrix/predefined/next_track
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 0),
      be32(0), be32(0), be32(1), be32(0), be32(2500),
      new Array[Byte](8),            // reserved
      be16(0), be16(0), be16(0), be16(0), // layer, alt_group, volume, reserved
      new Array[Byte](36),           // matrix
      be16(64), be16(0),             // width 64.0 (16.16)
      be16(48), be16(0))             // height 48.0
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0), cc("vide"),
      new Array[Byte](12), Array[Byte](0))
    // sample tables: 3 samples, sizes 5/7/3, one chunk
    val stsz = box("stsz", Array[Byte](0, 0, 0, 0), be32(0), be32(3),
      be32(5), be32(7), be32(3))
    val stsc = box("stsc", Array[Byte](0, 0, 0, 0), be32(1), be32(1), be32(3), be32(1))
    // chunk offset = after everything before mdat payload; computed below
    def assemble(chunkOff: Long): Array[Byte] = {
      val stco = box("stco", Array[Byte](0, 0, 0, 0), be32(1), be32(chunkOff))
      val stbl = box("stbl", stsz, stsc, stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov = box("moov", mvhd, trak)
      val mdat = box("mdat", frames.flatten)
      ftyp ++ moov ++ mdat
    }
    // two-pass: sizes are fixed, so assemble once to find the mdat payload
    // offset, then assemble again with the real chunk offset
    val probe = assemble(0)
    val mdatPayload = probe.length - frames.map(_.length).sum
    (assemble(mdatPayload.toLong), frames)
  }

  /** 320x240 AVI, 4 frames of 6 bytes each, 40000 us/frame (25 fps). */
  private def buildAvi(): (Array[Byte], Array[Array[Byte]]) = {
    val frames = Array.tabulate(4)(i => Array.fill(6)((0xd0 + i).toByte))
    val avih = cc("avih") ++ le32(56) ++ (
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ // usPerFrame..flags
      le32(4) ++ le32(0) ++ le32(1) ++ le32(0) ++     // totalFrames..bufSize
      le32(320) ++ le32(240) ++ new Array[Byte](16))  // width, height, reserved
    val hdrl = cc("LIST") ++ le32(4 + avih.length) ++ cc("hdrl") ++ avih
    val movi = {
      val chunks = frames.flatMap(f => cc("00dc") ++ le32(f.length) ++ f)
      cc("LIST") ++ le32(4 + chunks.length) ++ cc("movi") ++ chunks
    }
    val body = cc("AVI ") ++ hdrl ++ movi
    (cc("RIFF") ++ le32(body.length) ++ body, frames)
  }

  test("mp4: dims, duration, frame count, and frame bytes from the box tree") {
    val (bytes, frames) = buildMp4()
    assert(VideoContainers.looksLikeMp4(bytes))
    val (meta, samples) = VideoContainers.parse(bytes).get
    assert(meta.container == "mp4")
    assert(meta.width == 64 && meta.height == 48)
    assert(meta.durationMs == 2500L)
    assert(meta.nFrames == 3)
    assert(samples.length == 3)
    val got = samples.map { case (off, len) =>
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len) }
    assert(got.zip(frames).forall { case (a, b) => a.sameElements(b) },
      "demuxed sample bytes must equal the mdat payload slices")
  }

  test("avi: avih metadata and movi frame chunks") {
    val (bytes, frames) = buildAvi()
    assert(VideoContainers.looksLikeAvi(bytes))
    val (meta, chunks) = VideoContainers.parse(bytes).get
    assert(meta.container == "avi")
    assert(meta.width == 320 && meta.height == 240)
    assert(meta.nFrames == 4)
    assert(meta.durationMs == 160L) // 4 × 40000 us
    val got = chunks.map { case (off, len) =>
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len) }
    assert(got.length == 4 && got.zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  /** A real MJPEG AVI: each movi frame chunk is an actual JPEG encoded
    * in-test with ImageIO (solid-color 16×12 frames at distinct gray
    * levels), so the asserted pixel statistics are ground truth. */
  /** Assemble an MJPEG AVI container around the given JPEG frames. */
  private def mjpegAviOf(frames: Array[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val avih = cc("avih") ++ le32(56) ++ (
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ new Array[Byte](16))
    val hdrl = cc("LIST") ++ le32(4 + avih.length) ++ cc("hdrl") ++ avih
    val movi = {
      val chunks = frames.flatMap(f =>
        cc("00dc") ++ le32(f.length) ++ f ++ (if (f.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]))
      cc("LIST") ++ le32(4 + chunks.length) ++ cc("movi") ++ chunks
    }
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  private def jpegOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private def buildMjpegAvi(): (Array[Byte], Array[Array[Byte]]) = {
    val frames = Array.tabulate(4) { i =>
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(40 + 60 * i, 40 + 60 * i, 40 + 60 * i))
        g.fillRect(0, 0, 16, 12)
      } finally g.dispose()
      jpegOf(img)
    }
    (mjpegAviOf(frames, 16, 12), frames)
  }

  test("mjpeg avi: demuxed frame bytes are the exact in-test JPEGs (pixel digests)") {
    val (bytes, frames) = buildMjpegAvi()
    val (meta, chunks) = VideoContainers.parse(bytes).get
    assert(meta.nFrames == 4 && meta.width == 16 && meta.height == 12)
    val got = chunks.map { case (off, len) =>
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len) }
    assert(got.length == 4)
    def md5(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    assert(got.zip(frames).forall { case (a, b) => md5(a) == md5(b) },
      "demuxed frame digests must equal the encoded JPEG digests")
    // and every demuxed frame really decodes to the 16×12 solid image
    got.zip(frames).foreach { case (fb, _) =>
      val d = Multimodal.decodeImageBytes(fb).get
      assert(d.width == 16 && d.height == 12)
    }
  }

  test("mjpeg avi: decodeMedia computes REAL pixel statistics, not the byte stub") {
    val (bytes, frames) = buildMjpegAvi()
    val row = Multimodal.decodeMedia(Multimodal.MediaRow(7L, "video", bytes, "t"))
    assert(row.width == 16 && row.height == 12 && row.n_frames == 4)
    // expected = average of the per-frame ImageIO luminance histograms
    val per = frames.map(f => Multimodal.decodeImageBytes(f).get.feature)
    val want = Array.tabulate(8)(j => per.map(_(j)).sum / per.length)
    assert(row.feature.zip(want).forall { case (a, b) => math.abs(a - b) < 1e-6f },
      s"got ${row.feature.toSeq}, want ${want.toSeq}")
    // the stub's byte histogram would differ: solid-gray JPEG pixels land
    // in one-two luminance bins, JPEG container bytes spread across all 8
    val stub = Multimodal.decodeStub(Multimodal.MediaRow(7L, "video", bytes, "t"))
    assert(!row.feature.sameElements(stub.feature))
  }

  test("non-jpeg frame payloads (codecs the JDK lacks) keep the stub feature") {
    val (bytes, _) = buildAvi() // 0xd0.. filler frames: not JPEGs
    val row = Multimodal.decodeMedia(Multimodal.MediaRow(8L, "video", bytes, "t"))
    val stub = Multimodal.decodeStub(Multimodal.MediaRow(8L, "video", bytes, "t"))
    assert(row.width == 320 && row.height == 240 && row.n_frames == 4)
    assert(row.feature.sameElements(stub.feature),
      "undecodable frames must keep the deterministic stub feature")
  }

  /** A horizontal-gradient frame: luminance rises (or falls, reversed)
    * left→right, so the 9×8 dHash grid compares are all decided the same
    * way — a stable fingerprint that survives JPEG re-encoding. */
  private def gradientFrame(w: Int, h: Int, reverse: Boolean, shift: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      val base = (if (reverse) (w - 1 - x) else x) * 200 / w + shift
      val v = math.max(0, math.min(255, base))
      var y = 0
      while (y < h) { img.setRGB(x, y, (v << 16) | (v << 8) | v); y += 1 }
      x += 1
    }
    img
  }

  private def gradientVideo(n: Int, reverse: Boolean, shift: Int): Array[Byte] =
    mjpegAviOf(Array.tabulate(n)(i => jpegOf(gradientFrame(90, 80, reverse, shift + i))), 90, 80)

  test("videoDHashBands: majority-vote keyframe hash — 4 bands, near-dup within Hamming 6, junk None") {
    def ham(x: Seq[Int], y: Seq[Int]) =
      x.zip(y).map { case (p, q) => Integer.bitCount(p ^ q) }.sum
    val a = Multimodal.videoDHashBands(gradientVideo(6, reverse = false, shift = 0)).get
    assert(a.length == 4 && a.forall(b => b >= 0 && b <= 0xffff))
    // a trimmed (one frame fewer), brightness-shifted re-encode: per-frame
    // dHashes may flip a few bits, the per-bit majority vote stays close
    val b = Multimodal.videoDHashBands(gradientVideo(5, reverse = false, shift = 6)).get
    assert(ham(a, b) <= 6, s"near-dup hamming ${ham(a, b)}")
    // the reversed gradient inverts (almost) every luminance compare
    val c = Multimodal.videoDHashBands(gradientVideo(6, reverse = true, shift = 0)).get
    assert(ham(a, c) >= 32, s"reversed-gradient hamming ${ham(a, c)}")
    // non-parseable bytes → None; parseable container whose frames the
    // JDK can't decode (non-MJPEG codec) → None (caller keeps the stub)
    assert(Multimodal.videoDHashBands("definitely not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.videoDHashBands(buildAvi()._1).isEmpty)
  }

  test("m08 pipeline: real MJPEG videos flow through bandedHammingNearDups via the real-kernel branch") {
    import spark.implicits._
    val rows = Seq(
      (10L, gradientVideo(6, reverse = false, shift = 0)),
      (11L, gradientVideo(5, reverse = false, shift = 6)), // near-dup of 10
      (12L, gradientVideo(6, reverse = true, shift = 0))) // far from both
    val media = rows.toDF("media_id", "content")
    val realBands = org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      Multimodal.videoDHashBands(b).map(_.toArray).orNull)
    val got = graft.queries.PipelineQueries.bandedHammingNearDups(media, realBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 11L)), s"got $got")
    // and these rows really took the real branch, not the byte stub:
    // the stub over container bytes differs from the decoded-frame hash
    val stubOnly = graft.queries.PipelineQueries.bandedHammingNearDups(media,
      org.apache.spark.sql.functions.udf((_: Array[Byte]) => null: Array[Int]))
    val aReal = Multimodal.videoDHashBands(rows.head._2).get
    assert(stubOnly.collect() != null) // stub path executes without error
    assert(Multimodal.dHashBands(rows.head._2).isEmpty,
      "container bytes are not an image — only videoDHashBands can hash them")
    assert(aReal.length == 4)
  }

  test("resize: mjpeg video rows get a real resized keyframe") {
    import spark.implicits._
    val (bytes, frames) = buildMjpegAvi()
    val ds = Seq(Multimodal.MediaRow(1L, "video", bytes, "t")).toDS()
    val out = Multimodal.resize(ds, 8, 8).collect().head
    assert(out.width == 8 && out.height == 6, s"got ${out.width}x${out.height}")
    // the emitted bytes are a decodable PNG of the resized keyframe
    val dec = Multimodal.decodeImageBytes(out.content).get
    assert(dec.width == 8 && dec.height == 6)
    // ...whose pixels come from frame 0 (dark gray), not the stub's byte
    // sampling: a solid image keeps one dominant luminance bin
    assert(dec.feature.max > 0.99f)
  }

  test("decodeMedia: video rows with a real container get true metadata") {
    val (mp4, _) = buildMp4()
    val real = Multimodal.decodeMedia(Multimodal.MediaRow(1L, "video", mp4, "t"))
    assert(real.width == 64 && real.height == 48 && real.n_frames == 3)
    // non-container bytes keep the deterministic stub
    val junk = "not a video at all".getBytes("UTF-8")
    val stub = Multimodal.decodeMedia(Multimodal.MediaRow(2L, "video", junk, "t"))
    val want = Multimodal.decodeStub(Multimodal.MediaRow(2L, "video", junk, "t"))
    assert(stub.width == want.width && stub.height == want.height &&
      stub.n_frames == want.n_frames && stub.feature.sameElements(want.feature))
  }

  test("frameSample: real containers demux actual frame bytes through Spark") {
    import spark.implicits._
    val (mp4, frames) = buildMp4()
    val (avi, aframes) = buildAvi()
    val ds = Seq(
      Multimodal.MediaRow(1L, "video", mp4, "t"),
      Multimodal.MediaRow(2L, "video", avi, "t"),
      Multimodal.MediaRow(3L, "video", "plain text bytes".getBytes("UTF-8"), "t"),
      Multimodal.MediaRow(4L, "image", Array[Byte](1, 2, 3), "t")).toDS()
    val got = Multimodal.frameSample(ds, stride = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
      .groupBy(_._1)
    assert(got(1L).length == 3 &&
      got(1L).sortBy(_._2).map(_._3).zip(frames).forall { case (a, b) => a.sameElements(b) })
    assert(got(2L).length == 4 &&
      got(2L).sortBy(_._2).map(_._3).zip(aframes).forall { case (a, b) => a.sameElements(b) })
    assert(got(3L).length == 1 + "plain text bytes".length / 64) // stub windows
    assert(got(4L).length == 1) // non-video passthrough
  }

  test("avi: pathological LIST nesting parses without stack overflow") {
    // 60k nested LISTs cost only ~720KB of input but would be 60k stack
    // frames under a recursive walk — the iterative worklist must still
    // find the avih buried at the innermost level
    val depth = 60000
    val avih = cc("avih") ++ le32(56) ++ (
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(4) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(320) ++ le32(240) ++ new Array[Byte](16))
    val out = new java.io.ByteArrayOutputStream(12 * depth + avih.length + 12)
    // nested(d) length = 12*d + avih.length; wrapper at remaining-depth d
    // carries size = 4 (list type) + nested(d-1) length
    out.write(cc("RIFF")); out.write(le32(4L + 12L * depth + avih.length)); out.write(cc("AVI "))
    var d = depth
    while (d >= 1) {
      out.write(cc("LIST")); out.write(le32(4L + 12L * (d - 1) + avih.length)); out.write(cc("nest"))
      d -= 1
    }
    out.write(avih)
    val bytes = out.toByteArray
    assert(VideoContainers.looksLikeAvi(bytes))
    val (meta, _) = VideoContainers.parse(bytes).get
    assert(meta.width == 320 && meta.height == 240 && meta.nFrames == 4)
  }

  test("mp4 with a moov but no decodable video trak falls back to the stub") {
    // readable moov + mvhd, but no trak at all: all-zero dims/frames must
    // not leak into decodeMedia output — the deterministic stub applies,
    // same as any other undecodable row
    val ftyp = box("ftyp", cc("isom"), be32(512), cc("isomiso2"))
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0),
      be32(0), be32(0), be32(1000), be32(2500), new Array[Byte](80))
    val bytes = ftyp ++ box("moov", mvhd)
    assert(VideoContainers.looksLikeMp4(bytes))
    assert(VideoContainers.parse(bytes).isEmpty,
      "degenerate container metadata must parse to None")
    val got = Multimodal.decodeMedia(Multimodal.MediaRow(9L, "video", bytes, "t"))
    val want = Multimodal.decodeStub(Multimodal.MediaRow(9L, "video", bytes, "t"))
    assert(got.width == want.width && got.height == want.height &&
      got.n_frames == want.n_frames && got.feature.sameElements(want.feature))
  }

  test("corrupt containers never throw: truncated/oversized boxes clamp") {
    val (mp4, _) = buildMp4()
    // truncations at every prefix length must parse-or-None, never throw
    (0 until mp4.length by 7).foreach { n =>
      VideoContainers.parse(java.util.Arrays.copyOf(mp4, n))
    }
    // a box claiming a size beyond the buffer
    val lying = mp4.clone()
    lying(0) = 0x7f.toByte // ftyp size becomes huge
    VideoContainers.parse(lying)
    val (avi, _) = buildAvi()
    (0 until avi.length by 7).foreach { n =>
      VideoContainers.parse(java.util.Arrays.copyOf(avi, n))
    }
  }
}
