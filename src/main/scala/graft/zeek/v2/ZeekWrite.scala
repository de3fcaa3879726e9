package graft.zeek.v2

import java.io.OutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.zeek._

/** Zeek TSV sink — `df.write.format("zeek").mode("append"|"overwrite")
  * .save(dir)`. The reference has no writer; this closes the loop so a
  * pipeline can land results as rotated zeek logs that this source (and
  * zeek tooling) reads straight back. Rendering is the exact inverse of
  * the scanner (see [[graft.zeek.ZeekWriteCore]]).
  *
  * Layout and scale model mirror the read side: ONE log file per input
  * partition (`part-NNNNN-<task>-<epoch>.log[.gz]`), written through the
  * Hadoop FileSystem API (works on HDFS/object stores), no driver-side
  * data movement. Tasks write to a dot-prefixed temp name and rename on
  * task commit, so concurrent readers and task retries never observe a
  * half-written log; speculative duplicates are impossible to commit
  * twice under distinct names + rename-if-absent semantics.
  *
  * Options: `compression` = gzip|zstd|none (default none; both match the
  * reader's magic-byte sniffing), `zeek_path` = the `#path` directive
  * value (default: target directory's base name).
  * Appending to a directory that already holds zeek logs validates
  * field/type compatibility up front (the strict reader would otherwise
  * reject the mix at read time).
  */
class ZeekWriteBuilder(info: LogicalWriteInfo, dir: String,
    props: CaseInsensitiveStringMap) extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  private def codec: String =
    Option(props.get("compression")).map(_.trim.toLowerCase) match {
      case None | Some("none") | Some("uncompressed") => "none"
      case Some("gzip") | Some("gz")                  => "gzip"
      case Some("zstd") | Some("zst")                 => "zstd"
      case Some(other) =>
        throw new ZeekFormatException(s"zeek sink: unsupported compression '$other' (gzip|zstd|none)")
    }

  private def pathName: String = Option(props.get("zeek_path")).getOrElse {
    val base = new Path(dir).getName
    val dot = base.indexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  private def maxRowsPerFile: Long =
    Option(props.get("max_rows_per_file")).map(_.trim.toLong) match {
      case Some(n) if n <= 0 =>
        throw new ZeekFormatException("zeek sink: max_rows_per_file must be positive")
      case Some(n) => n
      case None    => Long.MaxValue
    }

  private def conf = new SerializableConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ZeekBatchWrite(info.schema(), dir, pathName, codec, truncateFirst, maxRowsPerFile, conf)

    /** Streaming: one log per epoch per partition, named
      * `part-q<qid>-e<epoch>-p<partition>.log[.gz]` — the rotation model
      * zeek itself uses, and exactly what the zeek SOURCE ingests per
      * trigger. `qid` is derived from the STREAMING QUERY ID (stable
      * across checkpoint restarts, distinct across queries), so each
      * query owns a private namespace in the directory: a fresh
      * checkpoint or a concurrent relay can never collide with — or be
      * cleaned up against — another run's rotations. Within a query,
      * final names are DETERMINISTIC in (epoch, partition): a replayed
      * epoch re-renders the same batch and overwrites the same files; a
      * speculative twin loses the rename race but leaves identical
      * content. Replays that produce FEWER files (changed partition
      * count, different roll points) are handled at driver commit, which
      * deletes any file of the SAME query+epoch the attempt did not
      * re-commit — exactly-once without a manifest even when upstream
      * partitioning is nondeterministic. */
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      if (truncateFirst)
        throw new ZeekFormatException(
          "zeek streaming sink supports append output mode only (logs are rotations, not snapshots)")
      val qid = java.util.UUID.nameUUIDFromBytes(
        info.queryId().getBytes(StandardCharsets.UTF_8)).toString.substring(0, 8)
      new ZeekStreamingWrite(info.schema(), dir, pathName, codec, maxRowsPerFile, qid, conf)
    }
  }
}

class ZeekStreamingWrite(schema: StructType, dir: String, pathName: String,
    codec: String, maxRowsPerFile: Long, qid: String, conf: SerializableConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    ZeekWriteCore.columns(schema) // validate on the driver
    val dirPath = new Path(dir)
    dirPath.getFileSystem(conf.value).mkdirs(dirPath)
    ZeekStreamingWriterFactory(schema, dir, pathName, codec, maxRowsPerFile, qid, conf)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // Epoch replay idempotence does NOT get to assume deterministic
    // partitioning: a restart with a different shuffle-partition count (or
    // a round-robin repartition upstream) can replay this epoch with fewer
    // partitions or fewer -rN rolls than the first attempt committed,
    // which would leave the first attempt's extra files visible as
    // duplicates. The task commit messages are the complete manifest of
    // THIS attempt — drop any other final file of the same QUERY + epoch.
    // The qid namespace makes this safe (another run's rotations can never
    // match the prefix), and the glob is scoped to the one epoch's prefix
    // so the cost is O(this epoch's files), not O(directory).
    val committed = messages.iterator.collect {
      case ZeekTaskCommit(paths) if paths.nonEmpty =>
        paths.split(',').iterator.map(p => new Path(p).getName)
    }.flatten.toSet
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    val epochPrefix = f"part-q$qid-e$epochId%05d-"
    val stale = fs.globStatus(new Path(dirPath, epochPrefix + "*"))
    if (stale != null)
      stale.filter(s => !committed.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    ZeekDataSource.clearBindCache()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // clear only THIS query's + epoch's temps — a concurrent writer's
    // in-progress files (or a racing restart's) must not be clobbered
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    val epochPrefix = f".zeek-part-q$qid-e$epochId%05d-"
    val temps = fs.globStatus(new Path(dirPath, epochPrefix + "*"))
    if (temps != null) temps.foreach(s => fs.delete(s.getPath, false))
  }
}

final case class ZeekStreamingWriterFactory(schema: StructType, dir: String,
    pathName: String, codec: String, maxRowsPerFile: Long, qid: String,
    conf: SerializableConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new ZeekDataWriter(schema, dir, pathName, codec, partitionId, taskId, conf,
      epoch = Some(epochId), streamTag = qid, maxRowsPerFile = maxRowsPerFile)
}

class ZeekBatchWrite(schema: StructType, dir: String, pathName: String,
    codec: String, truncateFirst: Boolean, maxRowsPerFile: Long,
    conf: SerializableConf) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    ZeekWriteCore.columns(schema) // validate renderability on the driver, not mid-task
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    if (truncateFirst && fs.exists(dirPath)) {
      // overwrite: drop previous log part-files (ours or not), keep the dir
      fs.listStatus(dirPath).filterNot(_.isDirectory)
        .filter { s =>
          val n = s.getPath.getName
          n.endsWith(".log") || n.endsWith(".log.gz") || n.endsWith(".log.zst") ||
            n.startsWith(".zeek-")
        }
        .foreach(s => fs.delete(s.getPath, false))
    }
    fs.mkdirs(dirPath)
    if (!truncateFirst) validateAppendCompatible(fs, dirPath)
    ZeekWriterFactory(schema, dir, pathName, codec, jobTag, maxRowsPerFile, conf)
  }

  /** Disambiguates part names across CONCURRENT applications appending
    * to the same directory (task ids restart per application), and
    * scopes this job's abort cleanup to its own temps. */
  private val jobTag = java.util.UUID.randomUUID().toString.substring(0, 8)

  /** Appending mismatched columns would poison the directory for the
    * strict reader — fail fast against the existing canonical header. */
  private def validateAppendCompatible(fs: org.apache.hadoop.fs.FileSystem,
      dirPath: Path): Unit = {
    val existing = if (!fs.exists(dirPath)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(dirPath).filterNot(_.isDirectory)
        .filter { s =>
          val n = s.getPath.getName
          n.endsWith(".log") || n.endsWith(".log.gz") || n.endsWith(".log.zst")
        }
    existing.headOption.foreach { s =>
      val in = ZeekIO.open(s.getPath.toString, conf.value)
      val header = try ZeekHeader.parseHeaderOnly(in) finally in.close()
      val cols = ZeekWriteCore.columns(schema)
      if (header.fields != cols.map(_.name).toSeq || header.types != cols.map(_.zeekType).toSeq)
        throw new ZeekFormatException(
          s"zeek sink: append schema (${cols.map(c => s"${c.name}:${c.zeekType}").mkString(", ")}) " +
            s"does not match existing log '${s.getPath.getName}' " +
            s"(${header.fields.zip(header.types).map { case (f, t) => s"$f:$t" }.mkString(", ")}); " +
            "use mode(\"overwrite\") or a fresh directory")
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    ZeekDataSource.clearBindCache() // a same-TTL read must see the new parts

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // best effort: clear THIS job's in-progress temps (batch temp names
    // embed the job tag) — never a concurrent job's
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    if (fs.exists(dirPath))
      fs.listStatus(dirPath).filter { s =>
        val n = s.getPath.getName
        n.startsWith(".zeek-") && n.contains(s"-$jobTag")
      }.foreach(s => fs.delete(s.getPath, false))
  }
}

final case class ZeekTaskCommit(path: String) extends WriterCommitMessage

final case class ZeekWriterFactory(schema: StructType, dir: String,
    pathName: String, codec: String, jobTag: String, maxRowsPerFile: Long,
    conf: SerializableConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ZeekDataWriter(schema, dir, pathName, codec, partitionId, taskId, conf,
      jobTag = jobTag, maxRowsPerFile = maxRowsPerFile)
}

class ZeekDataWriter(schema: StructType, dir: String, pathName: String,
    codec: String, partitionId: Int, taskId: Long,
    conf: SerializableConf, epoch: Option[Long] = None,
    jobTag: String = "", streamTag: String = "",
    maxRowsPerFile: Long = Long.MaxValue)
    extends DataWriter[InternalRow] {

  private val cols = ZeekWriteCore.columns(schema)
  private val ext = codec match {
    case "gzip" => ".log.gz"
    case "zstd" => ".log.zst"
    case _      => ".log"
  }

  /** Batch names carry the task id + a per-job tag (several appends —
    * even from concurrent applications — must not collide); streaming
    * names carry the query id and are deterministic in (epoch,
    * partition) within it, so epoch replays overwrite instead of
    * duplicating while other queries' rotations stay untouchable. With
    * `max_rows_per_file` a task rolls through `-rN` suffixed files (the
    * size axis of zeek's own rotation model) — roll points are
    * data-deterministic, so streaming names stay replay-stable. */
  private def finalName(roll: Int): String = {
    val suffix = if (maxRowsPerFile == Long.MaxValue) "" else s"-r$roll"
    epoch match {
      case Some(e) => f"part-q$streamTag-e$e%05d-p$partitionId%05d$suffix$ext"
      case None    => f"part-$partitionId%05d-$taskId-$jobTag$suffix$ext"
    }
  }

  private val fs = new Path(dir).getFileSystem(conf.value)

  private var out: OutputStream = _
  private var roll = 0
  private var fileRows = 0L
  private var anyRows = false
  // closed rolls stay TEMPS until task commit — a task that dies after
  // rolling must leave nothing visible, and its retry must not duplicate
  private val closed = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
  private var currentTmp: Path = _

  private def ensureOpen(): Unit = if (out == null) {
    currentTmp = new Path(dir, s".zeek-${finalName(roll)}.$taskId.inprogress")
    val raw = fs.create(currentTmp, true)
    out = codec match {
      case "gzip" => new GZIPOutputStream(raw, 64 * 1024)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
      case _      => raw
    }
    write(ZeekWriteCore.header(cols, pathName, System.currentTimeMillis()))
    fileRows = 0L
  }

  private def closeCurrentFile(): Unit = if (out != null) {
    write(ZeekWriteCore.footer(System.currentTimeMillis()))
    out.close()
    out = null
    closed += ((currentTmp, new Path(dir, finalName(roll))))
    roll += 1
  }

  private def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))

  override def write(record: InternalRow): Unit = {
    ensureOpen()
    write(ZeekWriteCore.renderRow(cols, record))
    fileRows += 1
    anyRows = true
    if (fileRows >= maxRowsPerFile) closeCurrentFile()
  }

  override def commit(): WriterCommitMessage = {
    // batch partition 0 always emits a file (a header-only log is valid —
    // an empty frame round-trips to an empty table with schema); all
    // other empty partitions — and every empty streaming epoch partition
    // — emit nothing
    if (!anyRows && partitionId == 0 && epoch.isEmpty) ensureOpen()
    closeCurrentFile()
    closed.foreach { case (tmp, fin) =>
      // streaming epoch replay: the deterministic name already exists —
      // replace it (same data re-rendered), keeping recovery idempotent
      if (epoch.isDefined && fs.exists(fin)) fs.delete(fin, false)
      if (!fs.rename(tmp, fin))
        throw new ZeekFormatException(s"zeek sink: could not commit '$fin'")
    }
    ZeekTaskCommit(closed.map(_._2.toString).mkString(","))
  }

  override def abort(): Unit = {
    if (out != null) { try out.close() catch { case _: Exception => () }; out = null }
    if (currentTmp != null) fs.delete(currentTmp, false)
    closed.foreach { case (tmp, _) => fs.delete(tmp, false) }
  }

  override def close(): Unit =
    if (out != null) { try out.close() catch { case _: Exception => () }; out = null }
}
