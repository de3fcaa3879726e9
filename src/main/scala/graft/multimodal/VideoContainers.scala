package graft.multimodal

/** Pure-JVM video CONTAINER parsing (no codec): true dimensions,
  * duration, frame count, and per-frame byte ranges from MP4 (ISO BMFF)
  * and AVI (RIFF) headers. Frame PIXEL decode genuinely needs codecs the
  * JDK lacks; the container's sample tables, however, are plain
  * big/little-endian byte structures — enough to demux real frame bytes
  * and real metadata without any native dependency.
  *
  * MP4: walks the box tree (`moov/trak/mdia/minf/stbl`), reads `mvhd`
  * (timescale + duration), the video trak's `tkhd` (16.16 fixed-point
  * width/height, track selected via `hdlr` = 'vide'), and demuxes the
  * sample table — `stsz` (sizes) + `stsc` (sample→chunk) + `stco`/`co64`
  * (chunk offsets) — into per-sample (offset, size) ranges.
  *
  * AVI: reads `avih` (frame period, total frames, dims) out of the
  * `hdrl` LIST and collects `..dc`/`..db` frame chunks from the `movi`
  * LIST.
  *
  * Every size/count read from the bytes is bounds-checked against the
  * buffer, and materialized sample tables are capped — a corrupt header
  * cannot drive an allocation. */
object VideoContainers {

  final case class VideoMeta(width: Int, height: Int, nFrames: Int,
      durationMs: Long, container: String)

  /** Hard bound on materialized sample-table entries per file. */
  private val MaxSamples = 1 << 20

  def looksLikeMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      (b(4) & 0xff) == 'f' && (b(5) & 0xff) == 't' &&
      (b(6) & 0xff) == 'y' && (b(7) & 0xff) == 'p'

  def looksLikeAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      (b(0) & 0xff) == 'R' && (b(1) & 0xff) == 'I' &&
      (b(2) & 0xff) == 'F' && (b(3) & 0xff) == 'F' &&
      (b(8) & 0xff) == 'A' && (b(9) & 0xff) == 'V' &&
      (b(10) & 0xff) == 'I' && (b(11) & 0xff) == ' '

  def looksLikeVideo(b: Array[Byte]): Boolean = looksLikeMp4(b) || looksLikeAvi(b)

  /** Parse metadata + frame byte ranges from a real container; None for
    * anything that isn't (or is too corrupt to read). A container that
    * parses but yields no signal at all (no dims, no frames — e.g. an
    * MP4 whose moov carries no decodable video trak) is treated as
    * unparseable so callers fall back to their deterministic stub
    * instead of emitting all-zero metadata. The guard catches Throwable
    * (not just NonFatal) because a corrupt header must never kill a
    * Spark task. */
  def parse(b: Array[Byte]): Option[(VideoMeta, Array[(Long, Int)])] =
    try {
      val parsed =
        if (looksLikeMp4(b)) parseMp4(b)
        else if (looksLikeAvi(b)) parseAvi(b)
        else None
      parsed.filter { case (m, samples) =>
        m.width != 0 || m.height != 0 || m.nFrames != 0 || samples.nonEmpty
      }
    } catch { case _: Throwable => None }

  // ---- byte readers ----------------------------------------------------
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    (((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL))
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    (((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL))
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  // ---- MP4 -------------------------------------------------------------

  /** (type, payloadStart, boxEnd) for each box in [start, end). Corrupt
    * sizes clamp to the window so iteration always terminates. */
  private def mp4Boxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = start
    while (pos + 8 <= end) {
      val size = be32(b, pos)
      val typ = fourcc(b, pos + 4)
      var payload = pos + 8
      var boxEnd =
        if (size == 0) end // "to end of file"
        else if (size == 1 && pos + 16 <= end) { // 64-bit largesize
          payload = pos + 16
          val ls = be64(b, pos + 8)
          if (ls < 16 || pos + ls > end) end else (pos + ls).toInt
        } else (pos + size).toInt
      if (boxEnd <= pos + 7 || boxEnd > end) boxEnd = end
      out += ((typ, payload, boxEnd))
      pos = boxEnd
    }
    out.result()
  }

  private def findMp4(b: Array[Byte], start: Int, end: Int, typ: String): Option[(Int, Int)] =
    mp4Boxes(b, start, end).collectFirst { case (`typ`, p, e) => (p, e) }

  private def parseMp4(b: Array[Byte]): Option[(VideoMeta, Array[(Long, Int)])] = {
    val moov = findMp4(b, 0, b.length, "moov").getOrElse(return None)

    // mvhd: duration in movie-timescale units
    var durationMs = 0L
    findMp4(b, moov._1, moov._2, "mvhd").foreach { case (p, e) =>
      if (p + 1 <= e) {
        val v = b(p) & 0xff
        val (tsOff, durLen) = if (v == 1) (p + 20, 8) else (p + 12, 4)
        if (tsOff + 4 + durLen <= e) {
          val timescale = be32(b, tsOff)
          val duration = if (durLen == 8) be64(b, tsOff + 4) else be32(b, tsOff + 4)
          if (timescale > 0) durationMs = duration * 1000L / timescale
        }
      }
    }

    // first video trak: hdlr handler_type == 'vide'
    var width = 0
    var height = 0
    var samples = Array.empty[(Long, Int)]
    var nFrames = 0
    val traks = mp4Boxes(b, moov._1, moov._2).filter(_._1 == "trak")
    val videoTrak = traks.find { case (_, p, e) =>
      findMp4(b, p, e, "mdia").exists { case (mp, me) =>
        findMp4(b, mp, me, "hdlr").exists { case (hp, he) =>
          hp + 12 <= he && fourcc(b, hp + 8) == "vide"
        }
      }
    }.orElse(traks.headOption)

    videoTrak.foreach { case (_, tp, te) =>
      findMp4(b, tp, te, "tkhd").foreach { case (p, e) =>
        if (p + 1 <= e) {
          val v = b(p) & 0xff
          val whOff = if (v == 1) p + 88 else p + 76
          if (whOff + 8 <= e) {
            width = be16(b, whOff) // 16.16 fixed point → integer part
            height = be16(b, whOff + 4)
          }
        }
      }
      for {
        (mp, me) <- findMp4(b, tp, te, "mdia")
        (fp, fe) <- findMp4(b, mp, me, "minf")
        (sp, se) <- findMp4(b, fp, fe, "stbl")
      } {
        // stsz: per-sample sizes (or a uniform size)
        var sizes = Array.empty[Int]
        var uniform = 0
        findMp4(b, sp, se, "stsz").foreach { case (p, e) =>
          if (p + 12 <= e) {
            uniform = be32(b, p + 4).toInt
            val declared = be32(b, p + 8)
            val avail = if (uniform == 0) (e - p - 12) / 4 else declared
            val n = math.min(math.min(declared, avail), MaxSamples).toInt
            nFrames = math.min(declared, Int.MaxValue).toInt
            if (uniform == 0)
              sizes = Array.tabulate(n)(i => be32(b, p + 12 + 4 * i).toInt)
            else sizes = Array.fill(n)(uniform)
          }
        }
        // stco/co64 chunk offsets
        var chunkOffsets = Array.empty[Long]
        findMp4(b, sp, se, "stco").foreach { case (p, e) =>
          if (p + 8 <= e) {
            val n = math.min(math.min(be32(b, p + 4), (e - p - 8) / 4), MaxSamples).toInt
            chunkOffsets = Array.tabulate(n)(i => be32(b, p + 8 + 4 * i))
          }
        }
        if (chunkOffsets.isEmpty)
          findMp4(b, sp, se, "co64").foreach { case (p, e) =>
            if (p + 8 <= e) {
              val n = math.min(math.min(be32(b, p + 4), (e - p - 8) / 8), MaxSamples).toInt
              chunkOffsets = Array.tabulate(n)(i => be64(b, p + 8 + 8 * i))
            }
          }
        // stsc sample→chunk runs: (first_chunk, samples_per_chunk)
        var stsc = Array.empty[(Int, Int)]
        findMp4(b, sp, se, "stsc").foreach { case (p, e) =>
          if (p + 8 <= e) {
            val n = math.min(math.min(be32(b, p + 4), (e - p - 8) / 12), MaxSamples).toInt
            stsc = Array.tabulate(n)(i =>
              (be32(b, p + 8 + 12 * i).toInt, be32(b, p + 12 + 12 * i).toInt))
          }
        }
        if (sizes.nonEmpty && chunkOffsets.nonEmpty) {
          if (stsc.isEmpty) stsc = Array((1, 1))
          val out = Array.newBuilder[(Long, Int)]
          var si = 0 // sample index
          var ci = 0 // chunk index
          while (ci < chunkOffsets.length && si < sizes.length) {
            // samples-per-chunk for chunk ci+1 = value of the last stsc
            // run whose first_chunk <= ci+1
            var spc = 1
            var k = 0
            while (k < stsc.length && stsc(k)._1 <= ci + 1) { spc = stsc(k)._2; k += 1 }
            var off = chunkOffsets(ci)
            var j = 0
            while (j < spc && si < sizes.length) {
              val sz = sizes(si)
              if (sz >= 0 && off >= 0 && off + sz <= b.length)
                out += ((off, sz))
              off += sz
              si += 1
              j += 1
            }
            ci += 1
          }
          samples = out.result()
          if (nFrames == 0) nFrames = samples.length
        }
      }
    }

    Some((VideoMeta(width, height, nFrames, durationMs, "mp4"), samples))
  }

  // ---- AVI -------------------------------------------------------------

  private def parseAvi(b: Array[Byte]): Option[(VideoMeta, Array[(Long, Int)])] = {
    var width = 0
    var height = 0
    var nFrames = 0
    var usPerFrame = 0L
    val frames = Array.newBuilder[(Long, Int)]
    var frameCount = 0

    // RIFF chunks: [fourcc][size LE][data][pad-to-even]; LIST carries a
    // 4-byte list type then sub-chunks. Iterative with an explicit
    // worklist: nesting depth is bounded only by input bytes (each LIST
    // level costs 12 bytes), so recursion would let a ~100KB file of
    // nested LISTs overflow the JVM stack. On LIST we push the current
    // level's continuation, then the list body — same depth-first chunk
    // order as recursion.
    var work = List((12, b.length))
    while (work.nonEmpty) {
      var (pos, end) = work.head
      work = work.tail
      var descended = false
      while (!descended && pos + 8 <= end) {
        val id = fourcc(b, pos)
        val size = le32(b, pos + 4).toInt
        val dataStart = pos + 8
        var dataEnd = dataStart + size
        if (size < 0 || dataEnd > end) dataEnd = end
        val next = dataEnd + (size & 1) // chunks pad to even byte boundaries
        id match {
          case "LIST" if dataStart + 4 <= dataEnd =>
            work = (dataStart + 4, dataEnd) :: (next, end) :: work
            descended = true // skip the list-type fourcc, walk its chunks
          case "avih" if dataStart + 40 <= dataEnd =>
            usPerFrame = le32(b, dataStart)
            nFrames = le32(b, dataStart + 16).toInt
            width = le32(b, dataStart + 32).toInt
            height = le32(b, dataStart + 36).toInt
          case _ =>
            // frame chunks: '??dc' (compressed) / '??db' (uncompressed)
            val suffix = id.substring(2)
            if ((suffix == "dc" || suffix == "db") && frameCount < MaxSamples) {
              frames += ((dataStart.toLong, dataEnd - dataStart))
              frameCount += 1
            }
        }
        if (!descended) pos = next
      }
    }

    val fs = frames.result()
    if (nFrames == 0) nFrames = fs.length
    val durationMs = usPerFrame * nFrames / 1000L
    Some((VideoMeta(width, height, nFrames, durationMs, "avi"), fs))
  }
}
