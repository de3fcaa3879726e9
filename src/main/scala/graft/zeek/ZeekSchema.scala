package graft.zeek

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

/** Options of the Zeek source, mirroring the reference's named parameters
  * (reference: src/zeek_scanner.cpp:455-479, README.md:66-99). */
final case class ZeekOptions(
    filename: Boolean = false,
    replacePeriods: Boolean = true,
    inet: Boolean = true,
    unionByName: Boolean = false,
    ignoreFileErrors: Boolean = false,
    /** byte-range split size for large UNCOMPRESSED files (compressed
      * files are never split); ≤0 disables splitting */
    splitSize: Long = 128L * 1024 * 1024,
    /** streaming only: mtime slack window (ms) behind the watermark in
      * which files are tracked by path identity — absorbs preserved-mtime
      * copies and clock skew between writers; see ZeekOffset */
    streamMtimeSlackMs: Long = 5L * 60 * 1000,
    /** streaming only: reuse the previous trigger's directory listing
      * while the watched directories' own mtimes are unchanged (one
      * getFileStatus per directory per trigger instead of a full glob of
      * thousands of rotated logs). None = auto: enabled on filesystems
      * whose directory mtime tracks child membership (local/HDFS),
      * disabled elsewhere (object-store "directories" don't update, so a
      * cache there would go permanently stale). */
    streamListingCache: Option[Boolean] = None,
    /** streaming only: admission control — cap each micro-batch at this
      * many newly-appeared files (oldest first). A restart against a
      * large rotated-log backlog otherwise plans one giant batch. */
    maxFilesPerTrigger: Option[Int] = None,
    /** streaming only: cap each micro-batch at this many bytes of new
      * files (always admits at least one file so progress is made). */
    maxBytesPerTrigger: Option[Long] = None) extends Serializable

object ZeekOptions {
  def fromMap(m: java.util.Map[String, String]): ZeekOptions = {
    def b(k: String, dflt: Boolean): Boolean =
      Option(m.get(k)).map(_.trim.toLowerCase == "true").getOrElse(dflt)
    ZeekOptions(
      filename = b("filename", dflt = false),
      replacePeriods = b("replace_periods", dflt = true),
      inet = b("inet", dflt = true),
      unionByName = b("union_by_name", dflt = false),
      ignoreFileErrors = b("ignore_file_errors", dflt = false),
      splitSize = Option(m.get("split_size")).map(_.trim.toLong)
        .getOrElse(128L * 1024 * 1024),
      streamMtimeSlackMs = Option(m.get("stream_mtime_slack_ms")).map(_.trim.toLong)
        .getOrElse(5L * 60 * 1000),
      streamListingCache = Option(m.get("stream_listing_cache"))
        .map(_.trim.toLowerCase == "true"),
      maxFilesPerTrigger = Option(m.get("max_files_per_trigger")).map(_.trim.toInt),
      maxBytesPerTrigger = Option(m.get("max_bytes_per_trigger")).map(_.trim.toLong))
  }
}

/** Per-file (or per-byte-range) scan spec produced at planning time.
  *
  * @param colMap union mode only: for each union column, the source field
  *               index in this file, or -1 if absent (→ NULL fill);
  *               reference: src/zeek_scanner.cpp:580-589.
  * @param start  byte-range start for splittable (uncompressed) files;
  *               0 = the split that also owns header parsing/validation
  * @param end    exclusive range end; -1 = to EOF. A line belongs to the
  *               split containing its first byte.
  * @param length on-disk byte length captured at bind from the glob's own
  *               FileStatus (-1 = unknown, e.g. streaming specs) — split
  *               planning and size statistics read this instead of
  *               issuing one getFileStatus RPC per file per query
  */
final case class ZeekFileSpec(path: String, colMap: Option[Array[Int]],
    start: Long = 0L, end: Long = -1L, length: Long = -1L) extends Serializable

/** Bind result: resolved files + canonical header + Spark schema. */
final case class ZeekBind(
    files: Seq[ZeekFileSpec],
    header: ZeekHeader,
    /** data columns only — excludes the filename virtual column */
    dataSchema: StructType,
    /** full output schema (incl. filename column when enabled) */
    schema: StructType,
    opts: ZeekOptions,
    /** original path patterns (streaming re-globs them per trigger) */
    patterns: Seq[String]) extends Serializable {
  def filenameIndex: Int = if (opts.filename) schema.length - 1 else -1
}

/** Bind-time schema resolution (reference: ZeekScanBind,
  * src/zeek_scanner.cpp:439-609): glob expansion + lexicographic sort,
  * strict first-valid-file schema or union_by_name over all files,
  * `.`→`_` renaming, optional `filename` virtual column.
  */
object ZeekSchema {

  def bind(paths: Seq[String], opts: ZeekOptions, conf: Configuration): ZeekBind = {
    val metas = paths.flatMap(p => ZeekIO.expandGlobMeta(p, conf))
    val lengths = metas.map(m => m.path -> m.length).toMap
    val files = metas.map(_.path).distinct.sorted
    if (files.isEmpty)
      throw new ZeekFormatException(
        s"No files found that match the pattern \"${paths.mkString(", ")}\"")
    val b = if (opts.unionByName) bindUnion(files, lengths, opts, conf)
            else bindStrict(files, lengths, opts, conf)
    b.copy(patterns = paths)
  }

  private def parseHeader(path: String, conf: Configuration): ZeekHeader = {
    val in = ZeekIO.open(path, conf)
    try ZeekHeader.parseHeaderOnly(in)
    finally in.close()
  }

  /** Headers of ALL files, read on a bounded thread pool, results in
    * file order. union_by_name must open every file at PLAN time
    * (reference: src/zeek_scanner.cpp:506-589 — which does it serially,
    * as this repo also did through round 10); at the 100-TB shape that
    * is tens of thousands of hourly rotated logs on an object store,
    * i.e. tens of thousands of SEQUENTIAL driver-side open+read round
    * trips, each dominated by latency, not the ~KB of header bytes.
    * Parallel reads change only wall-clock: results are reassembled in
    * the lexicographic file order, so first-seen field order and the
    * choice of reported error (the first failing file in sort order)
    * are identical to the serial loop. Pool size 16 bounds driver FD /
    * memory pressure; single-file binds skip the pool entirely. */
  private def parseHeaders(files: Seq[String],
      conf: Configuration): Seq[Either[Exception, ZeekHeader]] = {
    def one(f: String): Either[Exception, ZeekHeader] =
      try Right(parseHeader(f, conf))
      catch { case e: Exception => Left(e) }
    if (files.lengthCompare(2) < 0) files.map(one)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(files.length, 16),
        (r: Runnable) => {
          val t = new Thread(r, "zeek-header-read")
          t.setDaemon(true)
          t
        })
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[Either[Exception, ZeekHeader]]] =
          files.map(f => () => one(f))
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      } finally { pool.shutdown(): Unit }
    }
  }

  /** Strict mode: the first valid file's header is the schema; other files
    * are validated per-partition at scan time (src/zeek_scanner.cpp:481-505). */
  private def bindStrict(files: Seq[String], lengths: Map[String, Long],
      opts: ZeekOptions, conf: Configuration): ZeekBind = {
    var header: ZeekHeader = null
    var err: Throwable = null
    val it = files.iterator
    while (header == null && it.hasNext) {
      val f = it.next()
      try header = parseHeader(f, conf)
      catch {
        case e: Exception if opts.ignoreFileErrors => if (err == null) err = e
        case e: Exception =>
          throw new ZeekFormatException(s"Failed to read Zeek log '$f': ${e.getMessage}")
      }
    }
    if (header == null)
      throw new ZeekFormatException(
        s"No valid Zeek log files found matching the pattern (last error: ${Option(err).map(_.getMessage).getOrElse("none")})")
    val specs = files.map(f => ZeekFileSpec(f, None, length = lengths.getOrElse(f, -1L)))
    build(specs, header, header.fields, header.types, opts)
  }

  /** union_by_name: open every file, union fields by name in first-seen
    * order; identical lexical syntax required; same name ⇒ same Zeek type
    * or bind error; absent fields → NULL (src/zeek_scanner.cpp:506-589). */
  private def bindUnion(files: Seq[String], lengths: Map[String, Long],
      opts: ZeekOptions, conf: Configuration): ZeekBind = {
    val headers = files.zip(parseHeaders(files, conf)).map {
      case (_, Right(h)) => Some(h)
      case (_, Left(_)) if opts.ignoreFileErrors => None
      case (f, Left(e)) =>
        // first failing file in sort order — same file and message the
        // serial loop reported (it just stopped reading there)
        throw new ZeekFormatException(s"Failed to read Zeek log '$f': ${e.getMessage}")
    }
    val valid = files.zip(headers).collect { case (f, Some(h)) => (f, h) }
    if (valid.isEmpty)
      throw new ZeekFormatException("No valid Zeek log files found matching the pattern")

    val first = valid.head._2
    // lexical syntax must agree across files (src/zeek_scanner.cpp:536-545)
    valid.foreach { case (f, h) =>
      if (h.separator != first.separator || h.setSeparator != first.setSeparator ||
        h.emptyField != first.emptyField || h.unsetField != first.unsetField)
        throw new ZeekFormatException(
          s"union_by_name requires identical separators and NULL markers: '${valid.head._1}' vs '$f'")
    }

    val unionFields = scala.collection.mutable.LinkedHashMap.empty[String, String] // name → zeek type
    val firstSeenIn = scala.collection.mutable.HashMap.empty[String, String]       // name → file
    valid.foreach { case (f, h) =>
      h.fields.indices.foreach { i =>
        val (name, tpe) = (h.fields(i), h.types(i))
        unionFields.get(name) match {
          case None =>
            unionFields(name) = tpe
            firstSeenIn(name) = f
          case Some(prev) if prev != tpe =>
            throw new ZeekFormatException(
              s"union_by_name type conflict: field '$name' has type '$prev' in file '${firstSeenIn(name)}' but type '$tpe' in file '$f'")
          case _ =>
        }
      }
    }
    val names = unionFields.keys.toVector
    val types = names.map(unionFields)

    val specs = files.zip(headers).map {
      case (f, Some(h)) =>
        val idx = h.fields.zipWithIndex.toMap
        ZeekFileSpec(f, Some(names.map(n => idx.getOrElse(n, -1)).toArray),
          length = lengths.getOrElse(f, -1L))
      case (f, None) =>
        // tombstone: claimed at scan, yields zero rows (src/zeek_scanner.cpp:519-526)
        ZeekFileSpec(f, Some(Array.fill(names.length)(-1)),
          length = lengths.getOrElse(f, -1L))
    }
    val canonical = first.copy(fields = names, types = types)
    build(specs, canonical, names, types, opts)
  }

  private def build(specs: Seq[ZeekFileSpec], header: ZeekHeader,
      names: Seq[String], types: Seq[String], opts: ZeekOptions): ZeekBind = {
    val dataFields = names.zip(types).map { case (orig, t) =>
      val n = if (opts.replacePeriods) orig.replace('.', '_') else orig
      val mb = new MetadataBuilder().putString(ZeekTypes.ZeekTypeMeta, t)
      if (n != orig) mb.putString(ZeekTypes.ZeekNameMeta, orig)
      StructField(n, ZeekTypes.toSpark(t), nullable = true, mb.build())
    }
    val dataSchema = StructType(dataFields)
    val full =
      if (opts.filename) StructType(dataFields :+ StructField("filename", StringType, nullable = true))
      else dataSchema
    ZeekBind(specs, header, dataSchema, full, opts, Seq.empty)
  }
}
