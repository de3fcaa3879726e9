package graft.zeek.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.zeek._

/** Streaming offset = the set of files already processed. Zeek rotates
  * logs hourly, so a stream over a glob sees a slowly-growing file set;
  * each micro-batch processes exactly the newly-appeared files.
  *
  * Scale note: the offset JSON carries the full seen-file list, which is
  * fine up to ~10^5 files per checkpoint; beyond that a production
  * source would switch to a compacted seen-files log (the approach of
  * Spark's own FileStreamSource) — same read path, different bookkeeping.
  */
case class ZeekOffset(files: Seq[String]) extends Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(files.toArray)
  }
}

object ZeekOffset {
  def fromJson(json: String): ZeekOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    ZeekOffset(mapper.readValue(json, classOf[Array[String]]).toSeq)
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

  private def currentFiles(): Seq[String] =
    patterns.flatMap(p =>
      try ZeekIO.expandGlob(p, conf)
      catch { case _: ZeekFormatException => Seq.empty } // empty glob: no files yet
    ).distinct.sorted

  override def initialOffset(): Offset = ZeekOffset(Seq.empty)

  override def latestOffset(): Offset = ZeekOffset(currentFiles())

  override def deserializeOffset(json: String): Offset = ZeekOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[ZeekOffset].files.toSet
    val newFiles = end.asInstanceOf[ZeekOffset].files.filterNot(seen)
    newFiles.map(f => ZeekInputPartition(ZeekFileSpec(f, None)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZeekPartitionReaderFactory(bind.header, bind.dataSchema, bind.opts, required, pushed,
      new SerializableConf(conf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
