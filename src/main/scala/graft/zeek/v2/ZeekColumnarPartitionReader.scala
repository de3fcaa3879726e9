package graft.zeek.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.zeek._

/** Columnar per-file reader: identical scan semantics to
  * [[ZeekPartitionReader]] (same [[ZeekLineScanner]] + [[ZeekProjection]]),
  * but rows are parsed straight into reused `OnHeapColumnVector`s and
  * handed to Spark as [[ColumnarBatch]]es of up to 4096 rows.
  *
  * Why: Spark's row-based DSv2 path costs two virtual calls plus an
  * UnsafeRow copy per row; at Zeek-scan rates (millions of rows/s/core)
  * that overhead rivals the parse itself. Batching amortizes it 4096×,
  * and Spark's whole-stage codegen consumes the vectors directly.
  * COUNT(*) degenerates to zero-column batches that only carry a row
  * count.
  *
  * Gating (see [[ZeekPartitionReaderFactory.supportColumnarReads]]):
  * no array column projected and no reader-evaluable pushed filter —
  * filtered scans keep the row path's parse-filter-cols-first shortcut.
  */
final class ZeekColumnarPartitionReader(
    spec: ZeekFileSpec,
    boundHeader: ZeekHeader,
    dataSchema: StructType,
    opts: ZeekOptions,
    required: StructType,
    conf: Configuration,
    limit: Int = -1) extends PartitionReader[ColumnarBatch] {

  private val BatchSize = 4096

  private val scanner = new ZeekLineScanner(spec, opts, conf)
  private var proj: ZeekProjection = _
  private var initialized = false
  private var finished = false
  private var emitted = 0L

  private val nReq = required.length
  private val prim = new ZeekTypes.PrimParsers

  private var vectors: Array[OnHeapColumnVector] = _
  private var batch: ColumnarBatch = _
  private var filenameBytes: Array[Byte] = _

  private def init(): Unit = {
    if (!scanner.init()) { finished = true; return }
    proj = new ZeekProjection(spec, boundHeader, dataSchema, opts, required,
      scanner.fileHeader)
    vectors = required.fields.map(f => new OnHeapColumnVector(BatchSize, f.dataType))
    batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
    filenameBytes = proj.filenameValue.getBytes
  }

  override def next(): Boolean = {
    if (finished) return false
    if (!initialized) {
      initialized = true
      try init()
      catch {
        case e: Exception if opts.ignoreFileErrors =>
          finished = true
          close()
          return false
        case e: ZeekFormatException => throw e
        case e: Exception =>
          throw new ZeekFormatException(s"Failed to read Zeek log '${spec.path}': ${e.getMessage}")
      }
      if (finished) return false
    }
    if (limit >= 0 && emitted >= limit) { finished = true; close(); return false }
    if (nReq > 0) {
      var i = 0
      while (i < nReq) { vectors(i).reset(); i += 1 }
    }
    var n = 0
    while (n < BatchSize && (limit < 0 || emitted < limit) && scanner.nextDataLine()) {
      if (nReq > 0) writeRow(n)
      n += 1
      emitted += 1
    }
    if (n == 0) { finished = true; close(); false }
    else { batch.setNumRows(n); true }
  }

  /** Parse the scanner's current line into row slot `rowId` of every
    * projected vector — same per-cell semantics as the row reader's
    * direct path (marker check, then the typed primitive parser). */
  private def writeRow(rowId: Int): Unit = {
    val buf = scanner.buf
    val nTok = proj.tokenize(buf, scanner.lineStart, scanner.lineEnd)
    val srcIdx = proj.srcIdx
    val tokStart = proj.tokStart
    val tokEnd = proj.tokEnd
    val typeCodes = proj.typeCodes
    var c = 0
    while (c < nReq) {
      val v = vectors(c)
      val si = srcIdx(c)
      if (si == -2) v.putByteArray(rowId, filenameBytes, 0, filenameBytes.length)
      else if (si < 0 || si >= nTok) v.putNull(rowId)
      else {
        val s = tokStart(si)
        val e = tokEnd(si)
        if (ZeekTypes.sliceEquals(buf, s, e, proj.unsetBytes) ||
            ZeekTypes.sliceEquals(buf, s, e, proj.emptyBytes)) v.putNull(rowId)
        else typeCodes(c) match {
          case ZeekTypes.TcString => v.putByteArray(rowId, buf, s, e - s)
          case ZeekTypes.TcCount =>
            val x = prim.longIn(buf, s, e, 0L, Long.MaxValue)
            if (prim.lastNull) v.putNull(rowId) else v.putLong(rowId, x)
          case ZeekTypes.TcInt =>
            val x = prim.longIn(buf, s, e, Long.MinValue, Long.MaxValue)
            if (prim.lastNull) v.putNull(rowId) else v.putLong(rowId, x)
          case ZeekTypes.TcPort =>
            val x = prim.longIn(buf, s, e, 0L, 65535L)
            if (prim.lastNull) v.putNull(rowId) else v.putInt(rowId, x.toInt)
          case ZeekTypes.TcTime =>
            val x = prim.timeMicros(buf, s, e)
            if (prim.lastNull) v.putNull(rowId) else v.putLong(rowId, x)
          case ZeekTypes.TcBool => v.putBoolean(rowId, prim.bool(buf, s, e))
          case ZeekTypes.TcDouble =>
            val x = prim.dbl(buf, s, e)
            if (prim.lastNull) v.putNull(rowId) else v.putDouble(rowId, x)
        }
      }
      c += 1
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    scanner.close()
    if (batch != null) { batch.close(); batch = null }
  }
}
