package graft.zeek.v2

import java.io.InputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.zeek._

/** Per-file reader: open (+ decompress), parse + validate header, then a
  * single-pass tokenize / filter / emit loop (reference: ZeekScanExecute,
  * src/zeek_scanner.cpp:670-900).
  *
  * Hot-path design: reused token-offset arrays, byte-slice parsers, pushed
  * filters evaluated on their columns BEFORE the remaining columns are
  * parsed (src/zeek_scanner.cpp:718-771), COUNT(*) path skips
  * tokenization entirely (src/zeek_scanner.cpp:707-711).
  */
final class ZeekPartitionReader(
    spec: ZeekFileSpec,
    boundHeader: ZeekHeader,
    dataSchema: StructType,
    opts: ZeekOptions,
    required: StructType,
    pushed: Array[Filter],
    conf: Configuration,
    limit: Int = -1) extends PartitionReader[InternalRow] {

  private var emitted = 0L

  private var in: InputStream = _
  private var lines: ByteLineReader = _
  private var pendingBytes: Array[Byte] = _
  private var pendingOffset: Long = 0L
  private var initialized = false
  private var finished = false
  private var currentRow: InternalRow = _

  // ---- projection plan (built at init) --------------------------------
  private val nReq = required.length
  private val countOnly = nReq == 0
  private var sepByte: Byte = '\t'
  private var unsetBytes: Array[Byte] = _
  private var emptyBytes: Array[Byte] = _
  private var nFileFields = 0
  // per required column:
  private var srcIdx: Array[Int] = _              // file field index, -1 = NULL, -2 = filename
  private var scalarParsers: Array[ZeekTypes.SliceParser] = _
  private var listParsers: Array[ZeekTypes.ListParser] = _
  private var filenameValue: UTF8String = _
  // reused token buffers:
  private var tokStart: Array[Int] = _
  private var tokEnd: Array[Int] = _
  // filter plan:
  private var filterCols: Array[Int] = _          // required indices parsed before predicate eval
  private var postCols: Array[Int] = _            // remaining required indices
  private var predicate: ZeekFilterEval.RowPred = _

  private val emptyRow = new GenericInternalRow(Array.empty[Any])

  // UnsafeRow fast path when no array column is projected: one reused
  // value buffer + writer, zero per-row allocation (the writer's buffer
  // is copied by downstream operators that retain rows, so reuse is the
  // standard source pattern)
  private val useUnsafe: Boolean =
    required.fields.forall(f => !f.dataType.isInstanceOf[ArrayType])
  private val unsafeWriter =
    if (useUnsafe && nReq > 0)
      new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(nReq)
    else null
  private val reusedValues = if (useUnsafe) new Array[Any](nReq) else null

  private var rangeEnd: Long = -1L // exclusive; -1 = unbounded

  private def init(): Unit = {
    if (spec.start > 0) {
      // ranged split of an uncompressed file: parse + validate the header
      // from offset 0 first (cheap — a few KB) so an invalid or
      // schema-mismatched file behaves exactly like the whole-file path
      // (error, or zero rows under ignore_file_errors) instead of
      // data-parsing garbage with the bound header; then seek to start-1
      // and discard the first (partial) line — a line belongs to the
      // split containing its first byte.
      val (raw, compressed) = ZeekIO.openRaw(spec.path, conf)
      in = raw
      if (compressed) {
        // extension lied (plain name, compressed content): the start-0
        // split reads the whole file; this split contributes nothing
        finished = true
        close()
        return
      }
      raw.seek(0)
      val headReader = new ByteLineReader(new java.io.BufferedInputStream(raw, 16 * 1024))
      val hb = new ZeekHeader.Builder
      var headerDone = false
      while (!headerDone && headReader.next()) {
        if (!hb.offer(headReader.lineString)) headerDone = true
      }
      val fileHeader = hb.build() // throws on non-zeek content
      raw.seek(spec.start - 1)
      lines = new ByteLineReader(new java.io.BufferedInputStream(raw, 64 * 1024),
        baseOffset = spec.start - 1)
      if (!lines.next()) { finished = true; close(); return } // empty tail
      rangeEnd = spec.end
      setupProjection(fileHeader)
      return
    }

    val (stream, compressed) = ZeekIO.openWithInfo(spec.path, conf)
    in = stream
    if (!compressed) rangeEnd = spec.end // compressed files are never range-bounded
    lines = new ByteLineReader(in)
    // incremental header parse: no look-ahead, so the first data line is
    // captured as bytes and the reader stays positioned at the second
    val hb = new ZeekHeader.Builder
    var headerDone = false
    while (!headerDone && lines.next()) {
      if (!hb.offer(lines.lineString)) {
        pendingBytes = java.util.Arrays.copyOfRange(lines.buf, lines.lineStart, lines.lineEnd)
        pendingOffset = lines.lineOffset
        headerDone = true
      }
    }
    val fileHeader = hb.build()
    setupProjection(fileHeader)
  }

  /** Build the per-column projection/filter plan from the (validated)
    * file header — or from the bound header for ranged splits. */
  private def setupProjection(fileHeader: ZeekHeader): Unit = {
    // strict-mode per-file validation (src/zeek_scanner.cpp:295-303);
    // union-mode files without a bind-time map (streaming arrivals) get a
    // by-name mapping with type checking instead
    val colMap: Option[Array[Int]] = spec.colMap.orElse {
      if (opts.unionByName) Some(unionMapByName(fileHeader))
      else {
        boundHeader.diff(fileHeader).foreach { d =>
          throw new ZeekFormatException(
            s"Zeek log schema mismatch: file '${spec.path}' does not match the bound schema: $d")
        }
        None
      }
    }

    sepByte = fileHeader.separator.toByte
    unsetBytes = fileHeader.unsetField.getBytes(StandardCharsets.UTF_8)
    emptyBytes = fileHeader.emptyField.getBytes(StandardCharsets.UTF_8)
    nFileFields = fileHeader.fields.length
    tokStart = new Array[Int](nFileFields + 1)
    tokEnd = new Array[Int](nFileFields + 1)

    val dataIndex = dataSchema.fieldNames.zipWithIndex.toMap
    srcIdx = new Array[Int](nReq)
    scalarParsers = new Array[ZeekTypes.SliceParser](nReq)
    listParsers = new Array[ZeekTypes.ListParser](nReq)
    filenameValue = UTF8String.fromString(ZeekIO.displayPath(spec.path))

    var i = 0
    while (i < nReq) {
      val f = required.fields(i)
      if (opts.filename && f.name == "filename" && !dataIndex.contains("filename")) {
        srcIdx(i) = -2
      } else {
        val di = dataIndex(f.name)
        srcIdx(i) = colMap.map(m => m(di)).getOrElse(di)
        val zt = f.metadata match {
          case m if m.contains(ZeekTypes.ZeekTypeMeta) => m.getString(ZeekTypes.ZeekTypeMeta)
          case _ => dataSchema.fields(di).metadata.getString(ZeekTypes.ZeekTypeMeta)
        }
        f.dataType match {
          case ArrayType(_, _) =>
            listParsers(i) = new ZeekTypes.ListParser(
              ZeekTypes.parserFor(ZeekTypes.innerType(zt)),
              fileHeader.setSeparator.getBytes(StandardCharsets.UTF_8),
              unsetBytes, emptyBytes)
          case _ =>
            scalarParsers(i) = ZeekTypes.parserFor(zt)
        }
      }
      i += 1
    }

    // filter plan: evaluate pushed filters after parsing only their columns
    val reqIndex = required.fieldNames.zipWithIndex.toMap
    val dts = required.fields.map(f => f.name -> f.dataType).toMap
    val supported = pushed.filter(f => ZeekFilterEval.referencedIfSupported(f).isDefined)
    if (supported.nonEmpty) {
      val preds = supported.map(ZeekFilterEval.compile(_, reqIndex, dts))
      predicate = row => preds.forall(p => p(row))
      val names = supported.flatMap(f => ZeekFilterEval.referencedIfSupported(f).get).distinct
      filterCols = names.flatMap(reqIndex.get).toArray
      postCols = (0 until nReq).filterNot(filterCols.contains).toArray
    } else {
      predicate = null
      filterCols = Array.empty
      postCols = (0 until nReq).toArray
    }
  }

  override def next(): Boolean = {
    if (finished) return false
    if (limit >= 0 && emitted >= limit) { // pushed LocalLimit: stop reading early
      finished = true
      close()
      return false
    }
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
      if (finished) return false // init decided this split has no data
    }
    while (true) {
      var buf: Array[Byte] = null
      var ls = 0
      var le = 0
      if (pendingBytes != null) {
        buf = pendingBytes
        ls = 0
        le = pendingBytes.length
        pendingBytes = null
        if (rangeEnd >= 0 && pendingOffset >= rangeEnd) {
          // first data line starts beyond this split (split ends inside
          // the header region) — it belongs to a later split
          finished = true
          close()
          return false
        }
      } else {
        val ok =
          try lines.next()
          catch {
            case e: Exception if opts.ignoreFileErrors => finished = true; close(); return false
            case e: Exception =>
              throw new ZeekFormatException(s"Failed to read Zeek log '${spec.path}': ${e.getMessage}")
          }
        if (!ok) { finished = true; close(); return false }
        if (rangeEnd >= 0 && lines.lineOffset >= rangeEnd) {
          // next line starts in a later split — this range is done
          finished = true
          close()
          return false
        }
        buf = lines.buf
        ls = lines.lineStart
        le = lines.lineEnd
      }
      // skip blank lines and mid/trailing directives like #close
      if (le > ls && buf(ls) != '#') {
        if (countOnly) { currentRow = emptyRow; emitted += 1; return true }
        if (emitRow(buf, ls, le)) { emitted += 1; return true }
      }
    }
    false // unreachable
  }

  /** Tokenize + filter + build the output row. Returns false if the row
    * was dropped by a pushed filter. */
  private def emitRow(buf: Array[Byte], ls: Int, le: Int): Boolean = {
    // tokenize: offsets of up to nFileFields separator-delimited slices
    var nTok = 0
    var start = ls
    var i = ls
    while (i <= le && nTok < nFileFields) {
      if (i == le || buf(i) == sepByte) {
        tokStart(nTok) = start
        tokEnd(nTok) = i
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    val values = if (useUnsafe) {
      java.util.Arrays.fill(reusedValues.asInstanceOf[Array[AnyRef]], 0, nReq, null)
      reusedValues
    } else new Array[Any](nReq)
    var k = 0
    while (k < filterCols.length) {
      val c = filterCols(k)
      values(c) = parseCol(c, buf, nTok)
      k += 1
    }
    if (predicate != null && !predicate(values)) return false
    k = 0
    while (k < postCols.length) {
      val c = postCols(k)
      values(c) = parseCol(c, buf, nTok)
      k += 1
    }
    if (useUnsafe) {
      val w = unsafeWriter
      w.reset()
      w.zeroOutNullBytes()
      var i = 0
      while (i < nReq) {
        values(i) match {
          case null                      => w.setNullAt(i)
          case u: UTF8String             => w.write(i, u)
          case l: java.lang.Long         => w.write(i, l.longValue)
          case n: java.lang.Integer      => w.write(i, n.intValue)
          case d: java.lang.Double       => w.write(i, d.doubleValue)
          case b: java.lang.Boolean      => w.write(i, b.booleanValue)
          case other                     => throw new IllegalStateException(s"unexpected value $other")
        }
        i += 1
      }
      currentRow = w.getRow
    } else {
      currentRow = new GenericInternalRow(values)
    }
    true
  }

  /** Union-mode mapping for a file not seen at bind time: match fields by
    * (renamed) name; a shared name must carry the same Zeek type as the
    * bound schema; unknown extra fields are ignored, absent → NULL. */
  private def unionMapByName(fileHeader: ZeekHeader): Array[Int] = {
    def rename(n: String) = if (opts.replacePeriods) n.replace('.', '_') else n
    val filePos = fileHeader.fields.indices.map(i => rename(fileHeader.fields(i)) -> i).toMap
    dataSchema.fields.map { f =>
      filePos.get(f.name) match {
        case Some(i) =>
          val boundType = f.metadata.getString(ZeekTypes.ZeekTypeMeta)
          val fileType = fileHeader.types(i)
          if (boundType != fileType)
            throw new ZeekFormatException(
              s"union_by_name type conflict: field '${f.name}' has type '$boundType' in the bound schema but type '$fileType' in file '${spec.path}'")
          i
        case None => -1
      }
    }
  }

  private def parseCol(c: Int, buf: Array[Byte], nTok: Int): Any = {
    val si = srcIdx(c)
    if (si == -2) return filenameValue
    if (si < 0 || si >= nTok) return null // absent in this file (union mode) → NULL
    val s = tokStart(si)
    val e = tokEnd(si)
    val lp = listParsers(c)
    if (lp != null) return lp.parse(buf, s, e)
    if (ZeekTypes.sliceEquals(buf, s, e, unsetBytes) ||
        ZeekTypes.sliceEquals(buf, s, e, emptyBytes)) null
    else scalarParsers(c)(buf, s, e)
  }

  override def get(): InternalRow = currentRow

  override def close(): Unit = {
    if (in != null) {
      try in.close() catch { case _: Exception => }
      in = null
    }
  }
}
