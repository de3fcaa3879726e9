package graft.zeek

import java.io.{BufferedInputStream, InputStream}
import java.util.zip.GZIPInputStream

import com.github.luben.zstd.ZstdInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** File access + compression auto-detection for Zeek logs.
  *
  * The reference opens files with content-based AUTO_DETECT
  * (src/zeek_scanner.cpp:261-262; gzip + zstd per README.md:48-52). We
  * sniff magic bytes — so a mis-named plain file still reads, and a fake
  * `.gz` full of garbage falls through to the header parser, which rejects
  * it (matching the reference's error path for data/error_test/fake_gzip).
  */
object ZeekIO {

  /** Open a (possibly compressed) file as a decompressed stream. */
  def open(path: String, conf: Configuration): InputStream =
    openWithInfo(path, conf)._1

  /** Open + report whether the content was compressed (compressed streams
    * have no meaningful byte offsets, so they are never range-split). */
  def openWithInfo(path: String, conf: Configuration): (InputStream, Boolean) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val buffered = new BufferedInputStream(fs.open(p), 64 * 1024)
    val wrapped = sniffAndWrap(buffered)
    (wrapped, wrapped ne buffered)
  }

  /** Raw positioned stream + compression sniff for ranged reads. */
  def openRaw(path: String, conf: Configuration): (org.apache.hadoop.fs.FSDataInputStream, Boolean) = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val m = new Array[Byte](4)
    var n = 0
    var eof = false
    while (n < 4 && !eof) {
      val r = in.read(m, n, 4 - n)
      if (r < 0) eof = true else n += r
    }
    val compressed =
      (n >= 2 && (m(0) & 0xff) == 0x1f && (m(1) & 0xff) == 0x8b) ||
      (n >= 4 && (m(0) & 0xff) == 0x28 && (m(1) & 0xff) == 0xb5 &&
        (m(2) & 0xff) == 0x2f && (m(3) & 0xff) == 0xfd)
    (in, compressed)
  }

  /** Detect gzip (1f 8b) / zstd (28 b5 2f fd) magic and wrap accordingly. */
  def sniffAndWrap(in: BufferedInputStream): InputStream = {
    in.mark(4)
    val m = new Array[Int](4)
    var n = 0
    var eof = false
    while (n < 4 && !eof) {
      val b = in.read()
      if (b < 0) eof = true else { m(n) = b; n += 1 }
    }
    in.reset()
    if (n >= 2 && m(0) == 0x1f && m(1) == 0x8b) new GZIPInputStream(in, 64 * 1024)
    else if (n >= 4 && m(0) == 0x28 && m(1) == 0xb5 && m(2) == 0x2f && m(3) == 0xfd)
      new ZstdInputStream(in)
    else in
  }

  /** Glob-expansion result: one listed file with the metadata the rest of
    * the source needs, captured from the SAME `FileStatus` the listing
    * already holds — planning must never re-stat files (one RPC per file
    * per query is seconds of sequential driver time at the reference's
    * files=threads scale model). */
  final case class GlobFile(path: String, mtime: Long, length: Long)

  /** Like [[expandGlob]] but returns full [[GlobFile]] metadata — the
    * streaming source's watermark bookkeeping needs mtimes, and the batch
    * planner needs lengths (split planning + size statistics).
    * Paths are fully-qualified URIs: `.getPath.toString` keeps scheme +
    * authority, where `.toUri.getPath` would strip "s3a://bucket" and
    * make later opens resolve against the default filesystem. */
  def expandGlobMeta(pattern: String, conf: Configuration): Seq[GlobFile] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = statuses.filterNot(_.isDirectory)
      .map(s => GlobFile(s.getPath.toString, s.getModificationTime, s.getLen))
    // a non-glob path to a directory: list its files
    val expanded =
      if (files.isEmpty && statuses.exists(_.isDirectory))
        statuses.filter(_.isDirectory).flatMap(d => fs.listStatus(d.getPath))
          .filterNot(_.isDirectory)
          .map(s => GlobFile(s.getPath.toString, s.getModificationTime, s.getLen))
      else files
    expanded.sortBy(_.path).toSeq
  }

  /** (path, modificationTime) pairs — see [[expandGlobMeta]]. */
  def expandGlobWithTimes(pattern: String, conf: Configuration): Seq[(String, Long)] =
    expandGlobMeta(pattern, conf).map(f => (f.path, f.mtime))

  /** The `filename` virtual column's display form: local `file:` URIs
    * render as plain paths — matching the reference scanner's filename
    * output for local logs — while other schemes (s3a://bucket/…) keep
    * the full URI so files on different stores stay distinguishable.
    * Internal opens always use the fully-qualified path. */
  def displayPath(path: String): String =
    if (path.startsWith("file:"))
      try new Path(path).toUri.getPath catch { case _: Exception => path }
    else path

  /** Expand a glob (or plain path) into lexicographically sorted file
    * paths. Empty result is an error (reference: src/zeek_scanner.cpp:
    * 446-453; sort at :453 keeps "first file" deterministic). */
  def expandGlob(pattern: String, conf: Configuration): Seq[String] =
    expandGlobWithTimes(pattern, conf).map(_._1)
}
