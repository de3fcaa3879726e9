package graft.zeek.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.zeek._

/** Streaming offset for the growing-directory source, compacted to a
  * modification-time watermark.
  *
  * A file is "processed under offset o" iff `mtime < o.watermark`, or
  * `mtime == o.watermark && o.boundary contains it`. The offset therefore
  * carries only the files AT the watermark tick (bounded by files per
  * mtime granule — typically one rotation's worth), not every file ever
  * seen: checkpoints stay O(1)-ish forever instead of growing with
  * stream age (the round-1 full-list format broke down past ~10^5
  * files).
  *
  * Correctness invariant (documented, same as Spark's FileStreamSource
  * maxAge regime): rotated log files are immutable once created and
  * appear with monotonically non-decreasing mtimes. A file back-dated
  * below the watermark after the fact would be skipped.
  *
  * Legacy round-1 offsets (a bare JSON array of paths) still
  * deserialize; the first batch planned from one uses exact
  * set-difference semantics and subsequent offsets are written in the
  * compact format.
  */
case class ZeekOffset(watermark: Long, boundary: Seq[String],
    legacySeen: Option[Seq[String]] = None) extends Offset {

  @transient private lazy val boundarySet: Set[String] = boundary.toSet
  // Round-1 offsets stored scheme-stripped paths (the old expandGlob used
  // .toUri.getPath) while current listings are fully-qualified URIs —
  // match on both forms so a legacy checkpoint doesn't re-ingest the
  // whole directory after upgrade. Sets, not Seq.contains: the legacy
  // transition batch is O(listed × seen) otherwise.
  @transient private lazy val legacySet: Option[Set[String]] =
    legacySeen.map(seen => seen.toSet ++ seen.map(stripScheme))

  private def stripScheme(p: String): String = {
    val u = new java.net.URI(p)
    if (u.getScheme == null) p else u.getPath
  }

  /** Has `path` (with mtime `t`) already been processed under this offset? */
  def processed(path: String, t: Long): Boolean = legacySet match {
    case Some(seen) => seen.contains(path) || seen.contains(stripScheme(path))
    case None => t < watermark || (t == watermark && boundarySet.contains(path))
  }

  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    legacySeen match {
      case Some(seen) => mapper.writeValueAsString(seen.toArray)
      case None =>
        val node = mapper.createObjectNode()
        node.put("wm", watermark)
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
      ZeekOffset(node.get("wm").asLong(), boundary)
    }
  }
}

/** Micro-batch streaming over a Zeek log directory: each trigger re-globs
  * the pattern and plans one partition per newly-appeared file. Schema is
  * fixed at stream start (the bind); new files are validated against it
  * per-partition exactly like the batch path (strict) or mapped by name
  * (union_by_name). */
class ZeekMicroBatchStream(
    bind: ZeekBind,
    patterns: Seq[String],
    required: StructType,
    pushed: Array[Filter],
    conf: Configuration) extends MicroBatchStream {

  // expandGlobWithTimes returns empty for an empty glob (no throw) —
  // "no files yet" is a normal streaming state
  private def currentFiles(): Seq[(String, Long)] =
    patterns.flatMap(ZeekIO.expandGlobWithTimes(_, conf)).distinct.sortBy(_._1)

  override def initialOffset(): Offset = ZeekOffset.Empty

  override def latestOffset(): Offset = {
    val files = currentFiles()
    if (files.isEmpty) ZeekOffset.Empty
    else {
      val wm = files.map(_._2).max
      ZeekOffset(wm, files.collect { case (p, t) if t == wm => p })
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
    val newFiles = currentFiles()
      .filter { case (p, t) => e.processed(p, t) && !s.processed(p, t) }
      .map(_._1)
    newFiles.map(f => ZeekInputPartition(ZeekFileSpec(f, None)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZeekPartitionReaderFactory(bind.header, bind.dataSchema, bind.opts, required, pushed,
      new SerializableConf(conf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
