package graft.zeek.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.zeek._

/** Streaming offset for the growing-directory source, compacted to a
  * modification-time watermark plus a recent-files window (the same
  * regime as Spark's FileStreamSource with a compacted log + maxAge).
  *
  * A file is "processed under offset o" iff `mtime < o.watermark -
  * o.slack` (below the window), or its path is in `o.boundary` (the
  * files listed within the window when the offset was taken). Inside
  * the slack window files are tracked BY PATH IDENTITY, so
  *  - a late-arriving file whose preserved mtime lands behind the
  *    watermark (rsync/copy with old mtimes, multi-writer clock skew)
  *    is still picked up, as long as it lands within the window, and
  *  - a file whose mtime is touched after ingestion (a glob matching
  *    the live, still-appended log) is NOT re-ingested while it stays
  *    in the window.
  * The offset carries only the window's files — bounded by rotation
  * rate × slack, not stream age (the round-1 full-list format broke
  * down past ~10^5 files).
  *
  * Remaining documented invariant: a file that first appears with an
  * mtime below the WINDOW is assumed already processed and skipped —
  * the stream logs a warning when it sees that happen.
  *
  * Legacy offsets still deserialize: round-1 bare path arrays use exact
  * set-difference semantics, round-2 `{wm, boundary}` objects are the
  * `slack = 0` case of the window semantics.
  */
case class ZeekOffset(watermark: Long, boundary: Seq[String],
    slack: Long = 0L, legacySeen: Option[Seq[String]] = None) extends Offset {

  @transient private lazy val boundarySet: Set[String] = boundary.toSet
  // Round-1 offsets stored scheme-stripped paths (the old expandGlob used
  // .toUri.getPath) while current listings are fully-qualified URIs —
  // match on both forms so a legacy checkpoint doesn't re-ingest the
  // whole directory after upgrade. Sets, not Seq.contains: the legacy
  // transition batch is O(listed × seen) otherwise.
  @transient private lazy val legacySet: Option[Set[String]] =
    legacySeen.map(seen => seen.toSet ++ seen.map(stripScheme))

  // hadoop Path tolerates characters that java.net.URI rejects (space,
  // '%'): a legacy checkpoint containing one must not crash planning
  private def stripScheme(p: String): String =
    try new org.apache.hadoop.fs.Path(p).toUri.getPath
    catch { case _: Exception => p }

  /** Has `path` (with mtime `t`) already been processed under this offset? */
  def processed(path: String, t: Long): Boolean = legacySet match {
    case Some(seen) => seen.contains(path) || seen.contains(stripScheme(path))
    case None =>
      (watermark != Long.MinValue && t < watermark - slack) ||
        boundarySet.contains(path)
  }

  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    legacySeen match {
      case Some(seen) => mapper.writeValueAsString(seen.toArray)
      case None =>
        val node = mapper.createObjectNode()
        node.put("wm", watermark)
        if (slack != 0L) node.put("slack", slack)
        val arr = node.putArray("boundary")
        boundary.foreach(arr.add)
        mapper.writeValueAsString(node)
    }
  }
}

object ZeekOffset {
  val Empty: ZeekOffset = ZeekOffset(Long.MinValue, Seq.empty)

  def fromJson(json: String): ZeekOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    if (node.isArray) {
      // legacy round-1 format: full seen-file list
      val files = (0 until node.size).map(node.get(_).asText())
      ZeekOffset(Long.MinValue, Seq.empty, legacySeen = Some(files))
    } else {
      val arr = node.get("boundary")
      val boundary = (0 until arr.size).map(arr.get(_).asText())
      val slack = Option(node.get("slack")).map(_.asLong()).getOrElse(0L)
      ZeekOffset(node.get("wm").asLong(), boundary, slack)
    }
  }
}

/** Micro-batch streaming over a Zeek log directory: each trigger lists
  * the pattern (through a dir-mtime-keyed cache — see `currentFiles`)
  * and plans one partition per newly-appeared file. Schema is fixed at
  * stream start (the bind); new files are validated against it
  * per-partition exactly like the batch path (strict) or mapped by name
  * (union_by_name). */
class ZeekMicroBatchStream(
    bind: ZeekBind,
    patterns: Seq[String],
    required: StructType,
    pushed: Array[Filter],
    conf: Configuration) extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[ZeekMicroBatchStream])

  // paths this stream instance has already seen in a listing — used only
  // to warn (once) when a file FIRST appears already below the window;
  // bounded by the directory's listing size, driver-side only
  @transient private val listedBefore = scala.collection.mutable.HashSet.empty[String]
  @transient private var firstPlan = true

  // ---- per-trigger listing cache --------------------------------------
  // Each trigger needs the listing twice (latestOffset + plan); without a
  // cache that is 2 full globs per trigger over what the reference's
  // rotation model makes thousands of files. While every watched
  // directory's own mtime is unchanged, the previous listing is reused —
  // one getFileStatus per directory instead of a full glob. POSIX/HDFS
  // dir mtimes change on child add/remove/rename, which is exactly the
  // membership the glob discovers; appends to existing files don't
  // refresh the cache, which is fine because ingestion is per-file
  // appearance (see ZeekOffset). Guards:
  //  - dirs modified within MtimeGranularityMs of the cached listing are
  //    never trusted (a file created in the same mtime tick as the glob
  //    would otherwise hide until the next membership change);
  //  - glob characters in directory components, or filesystems whose
  //    scheme isn't known to maintain dir mtimes (object stores), disable
  //    the cache entirely unless stream_listing_cache=true forces it.
  private val MtimeGranularityMs = 2000L
  /** Filesystems whose directory mtime tracks child membership. Extend
    * via hadoop conf `graft.zeek.stream.cache.schemes` (comma-separated)
    * for custom FileSystem impls with POSIX-style dir mtimes. */
  private val dirMtimeSchemes: Set[String] =
    Set("file", "hdfs", "viewfs") ++
      conf.getTrimmedStrings("graft.zeek.stream.cache.schemes").toSet
  @transient private var cachedListing: Seq[ZeekIO.GlobFile] = _
  @transient private var cachedDirState: Seq[Long] = _
  @transient private var cachedAtMs: Long = 0L

  private def hasGlob(s: String): Boolean = s.exists("*?[]{}\\".contains(_))

  /** The scheme of the filesystem the path actually resolves to. A
    * scheme-less pattern resolves against fs.defaultFS — which on a
    * cluster may be an object store — so the URI's own (null) scheme
    * must not default to "file": ask the resolved FileSystem instead
    * (getScheme, or its canonical URI for impls that don't override
    * getScheme, e.g. RawLocalFileSystem). An unresolvable path yields
    * "" = not allowlisted = no cache (safe). */
  private def fsScheme(p: org.apache.hadoop.fs.Path): String =
    try {
      val fs = p.getFileSystem(conf)
      try fs.getScheme
      catch {
        case _: UnsupportedOperationException =>
          Option(fs.getUri.getScheme).getOrElse("")
      }
    } catch { case scala.util.control.NonFatal(_) => "" }

  // The watched-dir resolution is cached, but must be re-evaluated when
  // a plain pattern that was MISSING at resolution time (and therefore
  // fell back to watching its parent) later appears: if it was created
  // as a directory, files landing inside it never bump the parent's
  // mtime, so the stale fallback would hide new files forever.
  @transient private var resolvedWatch: Option[Option[Seq[org.apache.hadoop.fs.Path]]] = None
  @transient private var missingPlain: Seq[org.apache.hadoop.fs.Path] = Seq.empty

  private def resolveWatchDirs(): Option[Seq[org.apache.hadoop.fs.Path]] = {
    val enabled = bind.opts.streamListingCache
    if (enabled.contains(false)) None
    else {
      val missing = Seq.newBuilder[org.apache.hadoop.fs.Path]
      val dirs = patterns.map { pat =>
        val p = new org.apache.hadoop.fs.Path(pat)
        val parent = if (p.getParent == null) p else p.getParent
        if (hasGlob(p.getName)) parent // glob in the filename only
        else {
          // plain path: a directory pattern watches itself, a file
          // watches its parent; a not-yet-existing path watches the
          // parent provisionally and is re-resolved when it appears
          try if (p.getFileSystem(conf).getFileStatus(p).isDirectory) p else parent
          catch { case scala.util.control.NonFatal(_) => missing += p; parent }
        }
      }
      missingPlain = missing.result()
      val ok = dirs.forall(p => !hasGlob(p.toString)) &&
        (enabled.contains(true) || dirs.forall(p => dirMtimeSchemes.contains(fsScheme(p))))
      if (ok) Some(dirs.distinct) else None
    }
  }

  /** The directories whose mtimes key the cache, or None when caching is
    * unsafe for these patterns/filesystem. */
  private def watchDirs: Option[Seq[org.apache.hadoop.fs.Path]] = {
    val reResolve = resolvedWatch.isEmpty ||
      (missingPlain.nonEmpty && missingPlain.exists(pathExists))
    if (reResolve) {
      resolvedWatch = Some(resolveWatchDirs())
      cachedListing = null // watched set changed: old dir mtimes don't apply
    }
    resolvedWatch.get
  }

  private def pathExists(p: org.apache.hadoop.fs.Path): Boolean =
    try { p.getFileSystem(conf).getFileStatus(p); true }
    catch { case scala.util.control.NonFatal(_) => false }

  private def dirMtimes(dirs: Seq[org.apache.hadoop.fs.Path]): Seq[Long] =
    dirs.map { d =>
      try d.getFileSystem(conf).getFileStatus(d).getModificationTime
      catch { case _: java.io.IOException => -1L } // missing dir: state -1
    }

  // expandGlobMeta returns empty for an empty glob (no throw) — "no
  // files yet" is a normal streaming state
  private def listNow(): Seq[ZeekIO.GlobFile] =
    patterns.flatMap(ZeekIO.expandGlobMeta(_, conf)).distinct.sortBy(_.path)

  private def currentFiles(): Seq[ZeekIO.GlobFile] = watchDirs match {
    case None => listNow()
    case Some(dirs) =>
      val state = dirMtimes(dirs)
      val fresh = cachedListing != null && state == cachedDirState &&
        state.forall(m => cachedAtMs > m + MtimeGranularityMs)
      if (fresh) cachedListing
      else {
        val listing = listNow()
        cachedDirState = state
        cachedAtMs = System.currentTimeMillis()
        cachedListing = listing
        listing
      }
  }

  override def initialOffset(): Offset = ZeekOffset.Empty

  override def latestOffset(): Offset = offsetFor(listingForOffsets())

  /** Watermark + window offset covering exactly `files`. Kept separate
    * from the listing so callers that already hold a listing (the
    * caught-up compaction in the rate-limited path) can compact WITHOUT
    * re-listing — a second listing could see a file that appeared in
    * between with an mtime below the new watermark minus slack, marking
    * it processed though it was never planned. */
  private def offsetFor(files: Seq[ZeekIO.GlobFile]): Offset =
    if (files.isEmpty) ZeekOffset.Empty
    else {
      val slack = bind.opts.streamMtimeSlackMs
      val wm = files.map(_.mtime).max
      ZeekOffset(wm, files.collect { case f if f.mtime >= wm - slack => f.path }, slack)
    }

  // ---- admission control ----------------------------------------------
  // At the reference's rotation model a restart (or a first run against
  // an existing directory) finds a large backlog; without a cap that is
  // ONE batch holding every file — no early commits, no incremental
  // progress, and a failure replays everything. A capped batch admits
  // the K oldest unprocessed files (mtime, then path — deterministic)
  // under an offset that leaves the watermark untouched, so the
  // remaining backlog stays "unprocessed" and drains over subsequent
  // triggers; the first uncapped batch re-compacts the offset back to
  // watermark + window form.

  override def getDefaultReadLimit: ReadLimit = {
    val limits = bind.opts.maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      bind.opts.maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case many   => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  /** Trigger.AvailableNow: snapshot the listing once; every subsequent
    * (rate-limited) batch of the run admits only snapshot files, so the
    * query drains exactly the start-time backlog and stops. */
  @transient private var availableNowSnapshot: Option[Seq[ZeekIO.GlobFile]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(listNow())

  private def listingForOffsets(): Seq[ZeekIO.GlobFile] =
    availableNowSnapshot.getOrElse(currentFiles())

  /** Most restrictive (files, bytes) caps in `limit`; None = uncapped.
    * Row-based limits are not satisfiable before parsing and are
    * ignored, matching Spark's own file source. */
  private def caps(limit: ReadLimit): (Option[Int], Option[Long]) = limit match {
    case _: ReadAllAvailable => (None, None)
    case f: ReadMaxFiles     => (Some(f.maxFiles), None)
    case b: ReadMaxBytes     => (None, Some(b.maxBytes))
    case c: CompositeReadLimit =>
      c.getReadLimits.map(caps).foldLeft((Option.empty[Int], Option.empty[Long])) {
        case ((fa, ba), (fb, bb)) =>
          ((fa.toSeq ++ fb.toSeq).minOption, (ba.toSeq ++ bb.toSeq).minOption)
      }
    case _ => (None, None)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ZeekOffset]
    val (maxFiles, maxBytes) = caps(limit)
    if (maxFiles.isEmpty && maxBytes.isEmpty) return latestOffset()

    val listed = listingForOffsets()
    val backlog = listed.filterNot(f => s.processed(f.path, f.mtime))
      .sortBy(f => (f.mtime, f.path))
    val admitted = {
      var bytes = 0L
      var n = 0
      backlog.takeWhile { f =>
        bytes += math.max(f.length, 0); n += 1
        // always admit the first file, else a file larger than the byte
        // cap would wedge the stream
        n == 1 || (maxFiles.forall(n <= _) && maxBytes.forall(bytes <= _))
      }
    }
    if (admitted.isEmpty) start // no new data: engine sees offset unchanged
    else if (admitted.length == backlog.length) offsetFor(listed) // caught up: compact from THIS listing
    else s.legacySeen match {
      // Capped batch: the watermark must NOT advance — every un-admitted
      // backlog file has to stay unprocessed — so the end offset keeps
      // the start's below-window line and carries the admitted paths
      // (plus the start's still-relevant window files) in the boundary.
      // The boundary grows with the backlog while rate-limited and
      // re-compacts on the first uncapped batch.
      case None =>
        ZeekOffset(s.watermark, (s.boundary ++ admitted.map(_.path)).distinct, s.slack)
      // a legacy (round-1 full-list) start offset tracks processed files
      // ONLY through its seen-set — append to it rather than building a
      // watermark offset that would forget the legacy files
      case Some(seen) =>
        ZeekOffset(Long.MinValue, Seq.empty,
          legacySeen = Some((seen ++ admitted.map(_.path)).distinct))
    }
  }

  override def deserializeOffset(json: String): Offset = ZeekOffset.fromJson(json)

  /** The batch for (start, end] is derived by re-listing the directory
    * and keeping files processed under `end` but not under `start`.
    * Replay determinism therefore also rests on the immutability
    * invariant above: a file DELETED between offset commit and a
    * checkpoint replay cannot be resurrected (same regime as Spark's
    * FileStreamSource with a maxAge/compacted log — log retention must
    * exceed the checkpoint-recovery window). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ZeekOffset]
    val e = end.asInstanceOf[ZeekOffset]
    val listed = currentFiles()
    // a file FIRST listed with an mtime already below the start window is
    // assumed processed and skipped — surface the silent skip (not on the
    // first batch after (re)start, where every old file is legitimately
    // "already processed" per the recovered offset)
    if (!firstPlan) listed.foreach { f =>
      if (!listedBefore.contains(f.path) && s.processed(f.path, f.mtime))
        log.warn(s"zeek stream: newly listed file '${f.path}' (mtime ${f.mtime}) falls below " +
          s"the committed watermark window (wm=${s.watermark}, slack=${s.slack}) — " +
          "treating as already processed; back-dated files outside the " +
          "stream_mtime_slack_ms window are skipped")
    }
    firstPlan = false
    // keep only the CURRENT listing: rotated-out files drop from the set,
    // so it stays bounded by directory size, not stream age (a file that
    // vanishes and reappears below the window merely re-warns)
    listedBefore.clear()
    listedBefore ++= listed.map(_.path)
    listed
      .filter(f => e.processed(f.path, f.mtime) && !s.processed(f.path, f.mtime))
      .map(f => ZeekInputPartition(ZeekFileSpec(f.path, None, length = f.length)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZeekPartitionReaderFactory(bind.header, bind.dataSchema, bind.opts, required, pushed,
      new SerializableConf(conf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
